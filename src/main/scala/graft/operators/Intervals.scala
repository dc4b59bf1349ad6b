package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed integer intervals — the gaps-and-
  * islands family every sessionization / uptime / coverage pipeline
  * needs. All arithmetic is integer (the engine's µs time axis), so
  * results are exact cross-engine by construction.
  */
object Intervals {

  /** Coalesce overlapping-or-touching intervals per key: rows carry
    * [startCol, endCol) half-open integer intervals; output is the
    * minimal set of disjoint islands covering them, with per-island
    * row count and covered length. Two intervals belong to one island
    * iff they overlap or abut after CHAINING (the classic cumulative-
    * max formulation: an island break is a row whose start exceeds
    * the running max end of all earlier rows of its key).
    *
    * Scale shape: one hash exchange on the key, then two in-partition
    * window scans (running max, running flag sum) and a final
    * partial-aggregated groupBy — per-key data never crosses
    * partitions twice, and there is no global window (keys
    * distribute; a single key's series is window-scanned serially,
    * which is inherent to the chaining recurrence). Ordering within a
    * key is pinned to (start, end, tieCol) so duplicate starts are
    * deterministic. */
  def coalesce(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(startCol), col(endCol), col(tieCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = df
      .withColumn("_pmax", max(col(endCol)).over(wPrev))
      .withColumn("_brk",
        when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
      .withColumn("covered", col("island_end") - col("island_start"))
  }
}
