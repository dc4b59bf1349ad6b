package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Empirical scale evidence for the COVERAGE.md "scale shape" claims:
  * blow the similarity-family inputs up 10× and show the heavy dedup /
  * ANN queries scale sub-quadratically with no stragglers.
  *
  * The corpus grows by deterministic copies whose texts are PERTURBED
  * per copy — every 2nd word, phase-shifted by copy index, gets a
  * copy-specific suffix — so every w-gram shingle of every copy
  * contains a copy-specific word and copies share NO shingles:
  * corpus growth, not a duplicate explosion. (The round-10 harness
  * perturbed every 8TH word, which still left ~37% of each copy's
  * shingles shared across the whole copy family; at 100× that made
  * every base document a 100-member near-family whose ssjoin
  * candidate pairs grow QUADRATICALLY in the duplication factor —
  * 50M candidate pairs carrying their shingle arrays through the
  * verify join, >77 GB of spill. That is the designed ssjoin response
  * to duplication density, not to corpus size; the every-2nd-word
  * perturbation makes the blow-up measure corpus SCALE instead.)
  * Embedding copies get a small per-copy, per-dimension offset for
  * the same reason.
  *
  * Run: SPARK_GRAFT_SCALE=10 sbt -batch "runMain graft.tools.ScaleProof"
  * Emits one JSON line per query: wall seconds, task count, median /
  * max task ms (straggler check: max ≤ 4× median). Results land in
  * SCALE.md (hand-curated from this output).
  */
object ScaleProof {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_scale_x$k"
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    // ---- generate the blown-up corpus once ----
    if (!new java.io.File(s"$out/_done").exists()) {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val maxDoc = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
      (0 until k).map { i =>
        if (i == 0) docs
        else docs.select(
          (col("doc_id") + lit(i * maxDoc)).as("doc_id"),
          array_join(
            transform(split(col("text"), " "),
              (w, idx) => when((idx + lit(i)) % 2 === 0,
                concat(w, lit(s"v$i"))).otherwise(w)),
            " ").as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .select("doc_id", "text", "lang", "source", "n_chars")
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val maxVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
      (0 until k).map { i =>
        if (i == 0) emb
        else emb.select(
          (col("vec_id") + lit(i * maxVec)).as("vec_id"),
          transform(col("embedding"),
            (x, j) => (x + ((j + lit(i * 31)) % 7 - 3).cast("float") *
              lit(0.003f)).cast("float")).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      new java.io.File(s"$out/_done").createNewFile()
    }

    // ---- task-duration listener for the straggler check ----
    // skew is judged WITHIN the heaviest stage (by summed task time):
    // a query's global max-task / global median-task mixes trivial
    // bookkeeping stages into the median and reads as fake skew
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) durations.add((e.stageId, e.taskInfo.duration))
    })

    def run(label: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      durations.clear()
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val byStage = durations.toArray(Array.empty[(Int, Long)])
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val nTasks = byStage.valuesIterator.map(_.length).sum
      val heavy = if (byStage.isEmpty) Array.empty[Long]
        else byStage.values.maxBy(_.sum)
      val med = if (heavy.isEmpty) 0L else heavy(heavy.length / 2)
      val mx = if (heavy.isEmpty) 0L else heavy.last
      println(f"""{"scale_query":"$label","k":$k,"wall_sec":$wall%.2f,"n_tasks":$nTasks,"heavy_stage_tasks":${heavy.length},"heavy_stage_median_ms":$med,"heavy_stage_max_ms":$mx,"max_over_median":${if (med > 0) mx.toDouble / med else 0.0}%.2f}""")
      graft.Sessions.release(spark)
    }

    // SPARK_GRAFT_SCALE_ONLY=<substring> reruns a subset in a fresh
    // JVM — the Bench --isolate discipline for attributing an
    // in-sequence failure/regression to the query vs session state
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
    def wanted(q: String): Boolean = only.forall(q.contains)
    val registry = Seq("q22_jaccard_join", "q36_dedup_clusters",
      "q49_decontaminate", "q64_containment_cross", "q66_ivfpq_ann")
    registry.filter(wanted).foreach { q =>
      run(q)(graft.SparkEntry.queries(q)(spark, out))
    }
    // q66's registry parameterization (nLists=16) is the sf0.1
    // operating point; the IVF discipline at N·k vectors is
    // nLists ∝ √N — the sub-quadratic scale path COVERAGE.md claims.
    val nLists = math.max(16, (16 * math.sqrt(k)).toInt)
    if (wanted("q66_ivfpq_scaled")) run(s"q66_ivfpq_scaled_lists_$nLists") {
      graft.operators.Similarity.ivfpqTopK(
        graft.queries.Tables.load(spark, out, "embeddings"),
        "vec_id", "embedding", 5,
        nLists = nLists, nprobe = 16, m = 16, rerank = 40)
        .select(col("q"), col("rank"), col("n"))
    }
    spark.stop()
  }
}
