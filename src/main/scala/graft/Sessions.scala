package graft

import org.apache.spark.sql.SparkSession

/** Shared session construction so Verify/Bench/tests agree on the
  * semantics-critical configs. */
object Sessions {

  /** Configs every engine session needs:
    *  - UTC so time extraction matches the oracle;
    *  - nanosAsLong so parquet TIMESTAMP(NANOS) reads as LongType
    *    epoch-ns instead of erroring (Spark 4 has no ns timestamps);
    *    with UTC this lets queries.Tables expose events.ts as BIGINT
    *    ns for either physical type the driver has shipped;
    *  - AQE on: runtime shuffle coalescing + skew-join splitting —
    *    the 100 TB posture, harmless locally.
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      // suite-mode hygiene (both are heap-growth caps, harmless for a
      // real cluster session):
      //  - the live status store retains 1000 jobs/stages + 1000 SQL
      //    executions WITH per-task metric rollups by default — across
      //    a 146-query benchmark that is hundreds of MB of driver heap
      //    and per-event bookkeeping; cap it low (nothing reads the
      //    store with the UI off)
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutions", "10")
      //  - the whole-stage codegen class cache holds 100 entries
      //    JVM-wide (STATIC conf — first session pins it); a 146-query
      //    suite compiles far more than 100 distinct stages, so by
      //    late suite every query re-pays janino compilation that the
      //    isolated baseline (warm cache, few predecessors) does not.
      //    2000 entries keeps every suite stage resident (~MBs of
      //    class metadata, nothing at a 128 GiB heap)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // AQE post-shuffle coalescing (parallelismFirst, the default)
      // targets max(totalBytes/defaultParallelism, minPartitionSize):
      // BYTES pick the task count. That starves CPU-dense stages whose
      // per-byte work is extreme — a similarity-verify stage reads
      // ~4 MB of candidate metadata carrying ~10 s of kernel CPU
      // (merge-walk intersect / banded levenshtein per pair), and the
      // 1 MiB default floor coalesces it to 3 tasks on 32 cores (wall
      // = cpu/3; measured r19, OPTIMIZATION_r19.md Finding 1). 64 KiB
      // keeps the parallelism-first target (total/defaultParallelism)
      // in charge down to 64 KiB × cores of shuffle bytes. A/B/A
      // full-bench evidence (r19, one box window, q106 controls
      // 2.06/1.93/1.98 s): 151.5 / 132.7 / 149.1 s — the floor is
      // worth ~17 s at sf0.1 (q87 8.6→2.2, q22 8.4→2.8, q51 5.5→1.3,
      // q99 4.8→2.3). At production scale post-shuffle partitions are
      // orders of magnitude above either floor, so this only governs
      // small-bytes/heavy-CPU stages; env-parameterised for cluster
      // tuning rather than hard-coded.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Inter-query hygiene for the suite harnesses (Verify/Bench): drop
    * whatever the finished query left pinned in the block manager —
    * eager localCheckpoints, persists, cached relations. Queries are
    * self-contained by contract, so nothing reaches across; without
    * this, 60+ queries of checkpoint blocks accumulate (the
    * ContextCleaner only reaps them on driver GC, rare under a 128 GiB
    * heap), storage squeezes execution memory, and late-alphabet
    * queries (q6x) inflate and wobble in full-suite runs only. */
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    // SYNCHRONOUS shuffle + broadcast teardown. Through round 10 this
    // was only a System.gc() nudge at the ContextCleaner, which (a)
    // returns before the cleaner thread drains its queue and (b)
    // removes shuffles NON-blocking by default — so 60+ queries of
    // shuffle spill stacked up on local disk and late-alphabet
    // queries inflated in FULL-suite runs only (q66 3.05 s isolated,
    // 6.1 s after 65 predecessors; up to 14 s through r9). The shim
    // blocks until the block manager confirms every registered
    // shuffle and broadcast block is gone.
    org.apache.spark.graftshim.SessionJanitor
      .drainRuntimeState(spark.sparkContext)
    // one untimed collection keeps driver-heap pressure flat across
    // the suite (weakly-referenced accumulators, dropped plan trees)
    System.gc()
  }
}
