package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance. [[Upsert]] covers CDC
  * merge (type 1 — overwrite); this builds the TYPE 2 history: an
  * attribute's raw observation stream becomes versioned rows with
  * [valid_from, valid_to] intervals, new version exactly when the
  * attribute VALUE changes (consecutive equal observations collapse
  * into one version — the warehouse "track changes, not readings"
  * rule).
  */
object Scd {

  /** Type-2 intervalization: per key, order observations by
    * (tsCol, tieCol), open a new version at every value change, and
    * close it at the next version's open minus one tick (the closed-
    * interval convention; the live version keeps valid_to NULL).
    * Output per version: key, version (1-based), the attribute value,
    * valid_from, valid_to, n_obs (observations collapsed into it).
    *
    * Scale shape: one hash exchange on the key, then in-partition
    * window scans sharing ONE sort order (change flag via lag,
    * version id via running sum, valid_to via lead after the
    * groupBy), and a partial-aggregated groupBy — the gaps-and-
    * islands discipline ([[Intervals]]); no global window anywhere.
    * All comparisons exact: the attribute equality is on raw values,
    * the time axis is integer. NULL attribute values are legitimate
    * observations — the change test is null-safe (<=>), so
    * null→value and value→null transitions open versions too. */
  def scd2Build(
      df: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col(tieCol))
    val flagged = df
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .withColumn("_first",
        row_number().over(w) === 1)
      .withColumn("_brk",
        when(col("_first") || !(col(attrCol) <=> col("_prev")), 1L)
          .otherwise(0L))
      .withColumn("version",
        sum(col("_brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val versions = flagged.groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as("attr"), // constant within a version
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val wv = Window.partitionBy(keyCol).orderBy(col("version"))
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv) - 1L)
      .select(col(keyCol), col("version"), col("attr"),
        col("valid_from"), col("valid_to"), col("n_obs"))
  }

  /** Point-in-time (bitemporal) probe of a type-2 dimension: each
    * probe row (key, t) picks up the version active at t —
    * valid_from ≤ t ≤ valid_to, with the live version's NULL
    * valid_to treated as +∞. Because [[scd2Build]]'s intervals tile
    * each key's history, a probe matches AT MOST one version (before
    * the first version: no match → inner-join drop, the warehouse
    * convention). Plan: one equi hash join on the key with the
    * interval predicate as a join residual — per-key version chains
    * are change-counts, orders of magnitude smaller than the probe
    * stream, so the join is dimension⋈fact shaped (broadcast when
    * small, hash-partitioned otherwise — Catalyst/AQE decides from
    * stats). Integer time axis throughout. */
  def pointInTime(
      versions: DataFrame,
      probes: DataFrame,
      keyCol: String,
      probeTsCol: String): DataFrame = {
    // keep every dimension payload column (n_obs, future attrs…) —
    // only the key is renamed to avoid the ambiguous self-reference
    val v = versions.withColumnRenamed(keyCol, "_vk")
    probes.join(v,
        probes(keyCol) === col("_vk") &&
          col(probeTsCol) >= col("valid_from") &&
          (col("valid_to").isNull || col(probeTsCol) <= col("valid_to")))
      .drop("_vk", "valid_from", "valid_to")
  }
}
