package graft

/** Physical-plan audits: the properties that make these queries hold
  * up at 100 TB — column pruning and predicate pushdown reaching the
  * parquet scan, broadcast joins where a side is dimension-sized,
  * top-k as TakeOrderedAndProject (per-partition heaps, no global
  * sort), and NO shuffle cartesian product anywhere. Asserting them
  * here turns "the plan we'd want" into a regression gate. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: projection prunes the lineitem scan to the used columns") {
    val p = plan("q01_project_rename")
    assert(p.contains("l_extendedprice") && p.contains("l_discount"))
    assert(!p.contains("l_shipdate") && !p.contains("l_comment"),
      s"unused columns reached the scan:\n$p")
  }

  test("q04: dimension filter is pushed into the parquet scan") {
    val p = plan("q04_semi_join")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), s"plan:\n$p")
  }

  test("q09: dimension broadcast + hash joins, no nested loop") {
    val p = plan("q09_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q12: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan("q12_topk")
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("q18: range join keeps its equi key (hash/SMJ, not cross)") {
    val p = plan("q18_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$p")
  }

  test("q27: text is tokenized exactly once (staged projections survive optimization)") {
    val p = plan("q27_langid")
    val splits = "split\\(lower\\(".r.findAllIn(p).length
    assert(splits == 1, s"expected 1 tokenization, found $splits:\n$p")
  }

  test("q54: stratified sample is a pure filter — no shuffle") {
    // orderBy adds the final presentation exchange; everything below
    // it must be scan→filter (Exchange count == the one for the sort)
    val p = plan("q54_stratified_sample")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"sampling should not shuffle:\n$p")
  }

  test("q57: BPE replay runs exactly once per row (staged projection survives optimization)") {
    // bpe_tokens and max_word_pieces both read __bp; if CollapseProject
    // folded the stage away, the merge-table replay would run twice
    val p = plan("q57_bpe_tokens")
    val evals = "bpe_piece_counts\\(".r.findAllIn(p).length
    assert(evals == 1, s"expected 1 BPE evaluation, found $evals:\n$p")
  }

  test("q62: packing plans NO global window — offsets come from the two-pass prefix sum") {
    val p = plan("q62_sequence_pack")
    assert(!p.contains("Window"), s"global window would single-partition the corpus:\n$p")
  }

  test("q96: bloom prefilter sits at the fact scan; dim side broadcasts") {
    val p = plan("q96_bloom_join")
    assert(p.contains("might_contain"), s"bloom filter folded away:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim side should broadcast:\n$p")
  }

  test("q97: cms_estimate prefilter survives into the physical plan") {
    val p = plan("q97_heavy_hitters")
    assert(p.contains("cms_estimate"), s"CMS prefilter folded away:\n$p")
  }

  test("q74: resample is one window pass over one pinned dedup scan") {
    // the bracketing (t, v) pairs ride per-direction structs so both
    // frames land in ONE Window operator; the deduped event series is
    // eagerly pinned so the raw events scan + aggregate runs once —
    // the pre-r12 shape planned three Window nodes and scanned the
    // events parquet twice
    val p = plan("q74_resample")
    val windows = "Window \\[".r.findAllIn(p).length
    assert(windows == 1, s"both frames must share one Window operator:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 0, s"events must come from the pinned dedup, not re-scans:\n$p")
  }

  test("q100: histogram plans NO global window — NTILE comes from the prefix sum") {
    val p = plan("q100_histogram")
    assert(!p.contains("Window"), s"global window would single-partition the table:\n$p")
  }

  test("q106: triangle counting plans hash joins only — no window, no cartesian") {
    // default path is now the driver CSR kernel (trivially clean);
    // the plans under audit are the DISTRIBUTED small + checkpoint
    // paths, forced the same way as the q101/q121 audit below
    def audit(): Unit = {
      val p = plan("q106_triangles")
      assert(!p.contains("Window"),
        s"orientation scheme needs no window:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"wedge/closure must be equi-joins:\n$p")
    }
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      audit()
      spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
      audit()
    } finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
  }

  test("q162: robots rules broadcast to the URL frontier — no cartesian") {
    val p = plan("q162_robots_policy")
    assert(p.contains("BroadcastHashJoin"), s"rules side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q110: weighted sampling plans NO global window — offsets from the prefix sum") {
    val p = plan("q110_weighted_sample")
    assert(!p.contains("Window"),
      s"global window would single-partition the corpus:\n$p")
  }

  test("q111: phrase postings are filtered to the phrase terms before any join") {
    // the isin(term) filter must sit under the generate, not after
    // the join — the index-lookup shape is the whole point
    val p = plan("q111_phrase_search")
    assert(p.contains("table") && p.contains("hash"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"plan:\n$p")
  }

  test("q114: chunking is shuffle-free — one Generate inside the scan stage") {
    // orderBy adds the final presentation exchange; everything below
    // must be scan→project→generate
    val p = plan("q114_chunking")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"chunking should not shuffle:\n$p")
    assert(p.contains("Generate"), s"plan:\n$p")
  }

  test("q127: snapshot diff is one join — classification adds no exchange") {
    // full-outer join (2 exchanges) + the presentation sort; the
    // I/U/D classification and changed-list must stay map-side
    val p = plan("q127_snapshot_diff")
    val joins = "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(p).length
    assert(joins == 1, s"expected exactly the full-outer join:\n$p")
    assert(!p.contains("Window"), s"classification must not window:\n$p")
  }

  test("q128: rolling median/MAD is one exchange + one window sort") {
    // one hash exchange on user_id; med2/mad4/outlier all ride the
    // SAME window sort (plus the presentation orderBy exchange)
    val p = plan("q128_rolling_mad")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 2, s"med2/mad4 must share the window scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no join belongs here:\n$p")
  }

  test("q131: basket pairs come from the grouped explode, not a corpus self-join") {
    val p = plan("q131_copurchase_topk")
    assert(p.contains("Generate"), s"pair generation should explode baskets:\n$p")
    // the only shuffled join is the per-part totals attach; the pair
    // table itself must never come from joining po with po
    val joins = "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(p).length
    assert(joins <= 1, s"baskets must not self-join:\n$p")
  }

  test("q132: transition matrix is the lead window + tiny normalize — no join") {
    val p = plan("q132_transition_matrix")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 2, s"lead + normalize only:\n$p")
  }

  test("q133: checksum is a pure aggregate — no window, no join, ≤2 exchanges") {
    val p = plan("q133_integrity_checksum")
    assert(!p.contains("Window") && !p.contains("Join"), s"plan:\n$p")
    // one hash exchange for the groupBy + the presentation sort; the
    // commutative rowhash sum must combine map-side, never collect
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"checksum should be one agg exchange:\n$p")
  }

  test("q135: linkage verifies with the threshold-BANDED levenshtein inside equi-joined blocks") {
    val p = plan("q135_record_linkage")
    // 3-arg form prints as levenshtein(a, b, Some(2)) — O(k·n) band,
    // -1 past the bound; the full-DP 2-arg form would be the scale bug
    assert("levenshtein\\([^)]*Some\\(2\\)".r.findFirstIn(p).isDefined,
      s"banded levenshtein missing:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must ride the (nation, segment) equi key:\n$p")
  }

  test("q137: quantile bins ride group-partitioned windows — no join") {
    val p = plan("q137_grouped_quantile_bins")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 2, s"rank + group-count only:\n$p")
  }

  test("q138: FK audit is exactly three key-only joins, no window") {
    val p = plan("q138_fk_audit")
    assert(!p.contains("Window"), s"plan:\n$p")
    val joins =
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findAllIn(p).length
    assert(joins == 3, s"expected the three FK joins, got $joins:\n$p")
  }

  // q139_streaming_enrich: the interesting plan is the STREAMING one
  // (stream-static broadcast enrich), asserted in StreamingSpec; the
  // registry frame is the post-run sink read, which the registry-wide
  // cartesian sweep below still covers.

  test("q140: running distinct is two group windows — no set-valued window state, no join") {
    val p = plan("q140_running_distinct")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    assert(!p.contains("collect_set"),
      s"O(n) per-row set state in a window is the naive-translation trap:\n$p")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 2, s"first-seen flag + cumsum only:\n$p")
  }

  test("q141: OHLC open/close share ONE (user,bucket) window — no join") {
    val p = plan("q141_ohlc_bars")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 1, s"first/last must share the window sort:\n$p")
  }

  test("q142: burst windows ride the AGGREGATED hourly series — no join") {
    val p = plan("q142_burst_detection")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 2, s"med2/mad4 share the rolling window:\n$p")
  }

  test("q143: gap audit is one lag window + one aggregate — no join") {
    val p = plan("q143_coverage_gaps")
    assert(!p.contains("Join"), s"no join belongs here:\n$p")
    val windows = "Window".r.findAllIn(p).length
    assert(windows <= 1, s"one lag window only:\n$p")
  }

  test("q144-q164: codec + web + archive decodes run per-partition — no shuffle beyond the presentation sort") {
    // FLAC / MP4 / GIF decode are mapPartitions over the binary
    // column; the only exchange allowed is the final orderBy — a
    // second one would mean blob bytes moved between executors
    Seq("q144_flac_decode", "q145_mp4_moov", "q146_gif_frames",
        "q147_avi_frames", "q148_flac_pcm", "q149_flac_lpc",
        "q150_flac_stereo", "q151_adpcm_wav", "q152_g711_wav",
        "q154_audio_catalog", "q155_mp1_decode",
        "q156_mp2_decode", "q157_warc_extract",
        "q159_web_pipeline", "q161_charset_sniff",
        "q164_zip_extract", "q165_tar_extract",
        "q166_eml_extract", "q167_subtitle_extract",
        "q168_sitemap_extract", "q169_feed_extract",
        "q170_tfrecord_extract", "q171_epub_extract",
        "q172_wiki_extract", "q173_ipynb_extract",
        "q174_pdf_extract", "q175_markdown_extract",
        "q176_diff_extract", "q177_latex_extract",
        "q178_id3_catalog", "q179_docx_extract",
        "q180_xlsx_extract", "q181_bio_extract",
        "q182_access_log", "q183_po_extract",
        "q184_tmx_extract", "q185_ics_extract",
        "q186_doc_catalog", "q187_sqldump_extract",
        "q188_mp3_decode", "q189_rle8_video",
        "q194_compressed_shards", "q195_jsonl_shards",
        "q197_mp3_short_blocks", "q198_mp3_esc_tables",
        "q199_mp3_ms_stereo", "q200_mp3_transition_blocks",
        "q201_mp3_mixed_blocks", "q202_mp3_id3_wrapped",
        "q204_npy_extract", "q205_gguf_extract",
        "q206_avro_extract", "q207_sqlite_extract",
        "q208_torch_checkpoint", "q209_msgpack_extract",
        "q210_midi_extract", "q211_bmp_decode",
        "q213_rtf_extract", "q214_proto_census",
        "q216_toml_extract", "q217_onnx_extract",
        "q218_webp_decode", "q219_mp3_intensity_stereo",
        "q220_mp1_intensity_stereo",
        "q221_mp2_intensity_stereo",
        "q222_tiff_decode", "q224_parquet_meta",
        "q225_ogg_catalog", "q226_ebml_catalog",
        "q227_ogg_tags", "q228_arrow_ipc",
        "q229_media_catalog", "q230_csv_sniff",
        "q231_yaml_extract", "q232_front_matter",
        "q233_csv_extract", "q234_opus_toc",
        "q235_arrow_dict", "q236_parquet_pages",
        "q237_arrow_stream", "q238_block_scalars",
        "q239_tiff_multipage", "q240_flow_mappings",
        "q242_seq_mappings", "q243_yaml_stream",
        "q244_model_cards", "q245_prompt_lists",
        "q246_pyproject_toml", "q247_hugo_front_matter",
        "q248_dockerfile_census",
        "q249_docker_stage_graph",
        "q250_yaml_anchors").foreach { q =>
      val p = plan(q)
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 1, s"$q: codec decode should not shuffle:\n$p")
      assert(!p.contains("Join") && !p.contains("Window"), s"$q plan:\n$p")
    }
  }

  test("q241: page dedup — one signature-partitioned window, no join") {
    // the decoded pages shuffle ONCE on (dims, signature) for the
    // duplicate-group window; the only other exchange is the
    // presentation sort — grouping never all-pairs-joins
    val p = plan("q241_page_dedup")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"q241: window + sort only:\n$p")
    assert(!p.contains("Join"), s"q241 plan:\n$p")
  }

  test("q203: safetensors — one id-partitioned window shuffle, no join") {
    // the tiling validation needs per-blob window functions; the data
    // BYTES never shuffle (the digest substr happens before the
    // exchange only if Catalyst keeps it with the scan — the gate is
    // the exchange COUNT: one for the window, one presentation sort)
    val p = plan("q203_safetensors_extract")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"q203: window + sort only:\n$p")
    assert(!p.contains("Join"), s"q203 plan:\n$p")
  }

  test("q215: tensor catalog — routed union, no join; only q203's window shuffle") {
    // four per-partition extractor branches unioned; the only
    // exchanges are the safetensors branch's window + the
    // presentation sort — routing itself is a scan-level CASE
    val p = plan("q215_tensor_catalog")
    assert(!p.contains("Join"), s"q215 plan:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"q215: window + union sort only:\n$p")
  }

  test("q134: negative sampling plans NO global window — ranks from the prefix sum") {
    val p = plan("q134_negative_sampling")
    assert(!p.contains("Window"),
      s"global row_number would single-partition the corpus:\n$p")
  }

  test("q136: attribution joins stay equi-keyed on user — no cross, no window") {
    val p = plan("q136_attribution")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"range band must ride the user_id equi key:\n$p")
  }

  test("q22/q51/q64: ssjoin candidates come from the prefix-filtered index — no global exchange") {
    // r11 VERDICT #3: the ssjoin family's scale behavior was gated
    // only empirically (SCALE.md). Structural asserts: (a) equi-joins
    // only; (b) no single-partition exchange anywhere — a global
    // window/sort over the posting table would serialize the corpus
    // through one task; (c) the prefix-rank filter (rk <= sz - ceil(
    // t*sz) + 1) survives into the physical plan, i.e. the candidate
    // join is fed by the PREFIX-FILTERED index, not the full posting
    // table (the q64 class of regression); (d) the prefix window is
    // partitioned per doc id, never global.
    Seq("q22_jaccard_join", "q51_cross_jaccard", "q64_containment_cross")
      .foreach { name =>
        val p = plan(name)
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"$name: candidate generation must stay equi-join:\n$p")
        assert(!p.contains("SinglePartition"),
          s"$name: single-partition exchange — something went global:\n$p")
        assert("rk#\\d+ <= ".r.findFirstIn(p).isDefined,
          s"$name: prefix-rank filter folded away — full posting table " +
            s"would feed the candidate join:\n$p")
        assert(p.contains("windowspecdefinition(id#"),
          s"$name: prefix window must partition by doc id:\n$p")
      }
  }

  test("no shuffle cartesian product in any registry query") {
    // BroadcastNestedLoopJoin is legitimate where a side is tiny or
    // broadcast-by-design: the pure theta join (q37), the broadcast
    // brute-force baselines (q25 feeds q26's oracle shape), and
    // q69/q70's 1-row corpus-stats frames riding a broadcast cross
    // join back onto the scan.
    val bnljOk = Set("q37_theta_join", "q25_cosine_topk",
      "q69_lm_surprisal", "q70_bm25_topk",
      "q76_dsir_relevance") // 1-row model-totals frame on a broadcast cross
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      if (!bnljOk(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested loop join:\n$p")
    }
  }

  test("q101/q121/q125/q107: iterative-graph supersteps plan clean on every path") {
    // r10 VERDICT #7: the superstep loops need the same gate q106
    // has. Default path for ALL four is now the driver kernel
    // (parallelize + sort — trivially clean); force the DISTRIBUTED
    // superstep paths and assert no cartesian / nested-loop join and
    // no window sneaks into any round's plan.
    def audit(name: String): Unit = {
      val p = plan(name)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$name: superstep must stay equi-join:\n$p")
      assert(!p.contains("Window"), s"$name: no window belongs here:\n$p")
    }
    val qs = Seq("q101_pagerank", "q121_personalized_pagerank",
      "q125_label_propagation", "q107_bfs_hops")
    // distributed small (cache) path, then checkpoint (large) path
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      qs.foreach(audit)
      spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
      qs.foreach(audit)
    } finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
  }
}
