package graft

/** Partition-invariance gate for registry queries: the driver's
  * correctness check hashes VALUES IN ROW ORDER, so a query whose
  * output depends on shuffle partitioning (float fold order, an
  * unordered limit, RangePartitioner sampling) would pass locally and
  * flake under the driver's parallelism — the r4 q62/q67 episode.
  * Each covered query runs under 3 and then 29 shuffle partitions in
  * the same session (prime vs default-ish, so every exchange
  * re-buckets) and must collect bit-identical row sequences.
  *
  * Coverage: the packing path (the historical flake surface) plus
  * every query whose output carries raw doubles or rank cuts —
  * q70's BM25 score doubles are the newest such surface. sf0.001
  * keeps the whole gate in seconds.
  */
class QueryDeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val covered = Seq(
    "q62_sequence_pack", "q67_pipeline_e2e", // historical flakes
    "q68_dtdl_catalog", "q69_lm_surprisal", "q70_bm25_topk",
    "q71_semantic_dedup", "q72_mixture_flatten",
    // round-7 additions: q74/q76/q79 carry raw doubles (interp,
    // lean_frac, windowed mean); the rest are cheap to pin
    "q73_funnel", "q74_resample", "q75_zorder_layout",
    "q76_dsir_relevance", "q77_cdc_merge", "q79_moving_aggregate",
    "q80_quality_audit", "q82_pivot", "q83_mixture_schedule",
    "q84_kmeans_assign", "q85_grouping_sets", "q86_window_zoo",
    "q87_edit_distance", "q89_mmr_rerank", "q90_compaction",
    "q91_incremental_agg", "q92_sliding_window", "q93_mp3_headers",
    "q94_subqueries", "q95_moment_stats",
    // session-2 additions: q98/q101 are iterative loops, q100 rides
    // RangePartitioner sampling, q104 folds doubles over a
    // collect_list (ordered only via sort_array) — all prime flake
    // surfaces; the rest are cheap to pin
    "q96_bloom_join", "q97_heavy_hitters", "q98_lloyd_kmeans",
    "q99_canonical_select", "q100_histogram", "q101_pagerank",
    "q102_orc_roundtrip", "q103_join_ivm", "q104_ewma",
    "q105_zone_map",
    // session-3 additions: q107's BFS is an iterative loop, q110
    // rides sequencePack's RangePartitioner; the rest are cheap to pin
    "q106_triangles", "q107_bfs_hops", "q108_interval_merge",
    "q109_skyline", "q110_weighted_sample", "q111_phrase_search",
    "q112_streaming_heavy", "q113_scd2", "q114_chunking",
    // q116 carries raw doubles (slope/intercept divisions) — prime
    // flake surface; q115/q117 are cheap to pin
    "q115_retention", "q116_grouped_ols", "q117_zscore_outliers",
    "q118_time_weighted_avg", "q119_gini", "q120_scd2_probe",
    "q121_personalized_pagerank", "q122_pca_projection",
    "q123_streaming_dedup", "q124_corpus_overlap",
    // session-4 additions: q125's propagation is an iterative loop,
    // q126 has a df-ranked LIMIT vocab cut (ties broken by token);
    // the rest are cheap to pin
    "q125_label_propagation", "q126_pmi_cooccur", "q127_snapshot_diff",
    "q128_rolling_mad", "q129_hash_split", "q130_encoding_quality",
    // q134 rides sequencePack's RangePartitioner (the historical
    // flake surface), q131 has a ranked window cut; rest cheap to pin
    "q131_copurchase_topk", "q132_transition_matrix",
    "q133_integrity_checksum", "q134_negative_sampling",
    "q135_record_linkage", "q136_attribution",
    "q137_grouped_quantile_bins", "q138_fk_audit",
    "q139_streaming_enrich", "q140_running_distinct", "q141_ohlc_bars",
    "q142_burst_detection", "q143_coverage_gaps",
    // round-11 codec decodes: per-row fixture decodes ordered by a
    // unique id — no partition-sensitive state, cheap to pin
    "q144_flac_decode", "q145_mp4_moov", "q146_gif_frames",
    "q147_avi_frames", "q148_flac_pcm", "q149_flac_lpc",
    "q150_flac_stereo", "q151_adpcm_wav", "q152_g711_wav",
    "q153_url_normalize", "q154_audio_catalog")

  covered.foreach { name =>
    test(s"$name: output invariant to shuffle partitioning") {
      val fn = SparkEntry.queries(name)
      def run(parts: Int): Seq[Seq[Any]] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        try fn(spark, sfDir).collect().toSeq.map(_.toSeq)
        finally spark.conf.unset("spark.sql.shuffle.partitions")
      }
      val a = run(3)
      val b = run(29)
      assert(a.size == b.size, s"row counts differ: ${a.size} vs ${b.size}")
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        assert(ra == rb, s"row $i differs:\n  3 parts: $ra\n  29 parts: $rb")
      }
    }
  }
}
