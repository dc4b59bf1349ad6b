package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-feed generator that turns
  * two keyed snapshots of a table into an insert/update/delete row
  * feed. The inverse of [[graft.queries.ExtQueries2]]'s CDC MERGE
  * (q77): MERGE applies a change feed to a snapshot; this derives the
  * feed FROM two snapshots, which is how pipelines without a
  * transactional source bootstrap incremental processing (nightly
  * full exports → daily deltas).
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * exchange once on `keyCol` and every downstream classification is a
  * per-row Column expression (no second pass, no window). Unchanged
  * rows are dropped before anything downstream sees them, so the
  * output is delta-sized, not snapshot-sized. At 100 TB the join is
  * the unavoidable cost; everything else is map-side.
  */
object ChangeCapture {

  /** Diff `oldDf` → `newDf` on unique key `keyCol`, comparing
    * `compareCols` (must exist in both frames; equality is null-safe).
    * Output: one row per changed key —
    *   (key, op, old_<c>..., new_<c>..., changed)
    * where op ∈ 'I' (key only in new), 'D' (key only in old),
    * 'U' (both, some compared column differs); `changed` is the
    * comma-joined list of differing column names in `compareCols`
    * order ('' for I/D). Identical rows are filtered out. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff: no compare columns")
    val o = oldDf.select(col(keyCol).as("k") +:
      compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select(col(keyCol).as("k") +:
      compareCols.map(c => col(c).as(s"new_$c")): _*)
    // presence flags: compared columns may legitimately hold nulls, so
    // "row existed on this side" is carried by a dedicated non-null
    // marker column rather than inferred from compared values
    val oMark = o.withColumn("_old_present", lit(1))
    val nMark = n.withColumn("_new_present", lit(1))
    val jm = oMark.join(nMark, Seq("k"), "full_outer")
    val diff: Column = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    val changed: Column = concat_ws(",", compareCols.map(c =>
      when(!(col(s"old_$c") <=> col(s"new_$c")), lit(c))): _*)
    jm.withColumn("op",
        when(col("_old_present").isNull, lit("I"))
          .when(col("_new_present").isNull, lit("D"))
          .when(diff, lit("U")))
      .where(col("op").isNotNull)
      .select(col("k").as(keyCol) +: col("op") +:
        compareCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))) :+
        when(col("op") === "U", changed).otherwise(lit("")).as("changed"): _*)
  }
}
