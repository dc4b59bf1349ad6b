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
      .foreach(_.unpersist(blocking = false))
    // nudge the ContextCleaner: shuffle files, broadcast blocks and
    // checkpoint data are reaped when their driver references are
    // GC'd, and a 128 GiB heap may not GC for the whole suite —
    // 60+ queries of shuffle spill then stack up on local disk and
    // late-alphabet queries wobble in FULL-suite runs only (q66
    // 3.7 s in any subset, up to 14 s after 65 predecessors). A
    // single collection between queries is untimed and keeps the
    // per-query runtime state flat.
    System.gc()
  }
}
