package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: small-file compaction and incremental
  * (delta-based) aggregate maintenance — the two jobs that keep a
  * 100 TB warehouse queryable as data keeps landing.
  */
object Maintenance {

  /** Rewrite a fragmented parquet directory into ≈`targetFileBytes`
    * files: one listing for the total size, then a single
    * `repartition(ceil(bytes/target))` rewrite to a fresh directory
    * (rewrite-and-swap beats in-place: readers never see a half
    * -compacted table, and a failed compaction leaves the source
    * untouched). Returns the file count written.
    *
    * Scale shape: the only data movement is one round-robin exchange
    * sized by actual bytes — no collect, no per-file driver work
    * beyond the listing. Compression ratios vary by content; the
    * target is a layout goal, not a guarantee.
    */
  def compactFiles(spark: SparkSession, srcDir: String, dstDir: String,
                   targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "compactFiles: target must be positive")
    val hadoop = new org.apache.hadoop.fs.Path(srcDir)
    val fs = hadoop.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(hadoop).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(srcDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(dstDir)
    val out = new org.apache.hadoop.fs.Path(dstDir)
    fs.listStatus(out).count(s => s.getPath.getName.endsWith(".parquet"))
  }

  /** Incremental aggregate maintenance: merge a maintained aggregate
    * with the aggregate of a new delta batch, for associative
    * aggregates (counts and decimal-exact sums). `agg(base ∪ delta) ≡
    * combine(agg(base), agg(delta))` — the delta path touches only
    * |delta| + |affected groups| rows instead of re-scanning the
    * base table.
    *
    * Both inputs carry `keys`, a count column `n`, and the decimal
    * sum columns in `sums`. Decimal sums make the combine
    * order-independent and overflow-safe under ANSI.
    */
  def combineAggregates(oldAgg: DataFrame, deltaAgg: DataFrame,
                        keys: Seq[String], sums: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      sum(col("n")).as("n") +: sums.map(c => sum(col(c)).as(c))
    oldAgg.unionByName(deltaAgg)
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The DELTA of an inner equi-join under insertions to both sides —
    * the distributive delta-join rule of incremental view
    * maintenance:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * (A, B are the PRE-delta states). Feeding the result through the
    * view's aggregation and [[combineAggregates]] maintains an
    * aggregated-join view while touching only |Δ|-proportional join
    * work — the base⋈base join, the expensive term at warehouse
    * scale, is never recomputed. Insert-only (the CDC upsert path
    * handles updates/deletes upstream — [[Upsert]]).
    *
    * Scale shape: three joins whose smaller side is delta-sized;
    * Catalyst broadcasts them when small, and each term's exchange
    * carries at most |Δ|·(join fanout) rows.
    */
  def deltaJoin(baseA: DataFrame, deltaA: DataFrame,
                baseB: DataFrame, deltaB: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "deltaJoin: at least one join key")
    deltaA.join(baseB, keys)
      .unionByName(baseA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
  }
}
