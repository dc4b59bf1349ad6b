package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CmsEstimate

/** Heavy-hitter detection with a Count-Min-sketch prefilter (Cormode
  * & Muthukrishnan 2005) — EXACT output, sketch-bounded shuffle.
  *
  * The naive exact plan `groupBy(key).count.having(n ≥ T)` shuffles
  * EVERY distinct key; at corpus scale the long tail of once-seen
  * tokens dominates that exchange while contributing nothing to the
  * answer. Instead:
  *
  *  1. one narrow pass builds a distributed Count-Min sketch of
  *     `xxhash64(key)` (`count_min_sketch` aggregate — partial
  *     sketches merge cell-wise; the result is a bounded
  *     depth×width table, ~KBs, NOT data-sized);
  *  2. the sketch embeds in a [[CmsEstimate]] predicate that drops
  *     rows whose key estimate is < T **before** the aggregation —
  *     sound because CMS error is one-sided (estimate ≥ true count,
  *     and an xxhash64 collision only MERGES two keys, raising the
  *     estimate further), so a pruned key provably cannot be heavy;
  *  3. the exact `groupBy.count` runs on the surviving candidate
  *     rows only, and `count ≥ T` kills the sketch's false
  *     positives. Output = exactly the naive plan's.
  *
  * `eps` bounds the estimate inflation at ~eps·N over-count with
  * probability `confidence` — size it so T ≫ eps·N or the prefilter
  * stops pruning (it never stops being CORRECT). Seeded: the sketch
  * hash family derives from `seed`, so re-runs are stable.
  */
object HeavyHitters {

  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(threshold >= 1, s"heavyHitters: threshold >= 1, got $threshold")
    val keyed = df.select(col(keyCol).as("k"),
      xxhash64(col(keyCol)).as("kh"))
    // empty input yields an all-zero sketch (not null): every
    // estimate is 0 < T, the prefilter drops all rows, and the empty
    // result is CORRECT — no guard needed
    val sketch = keyed.select(
      count_min_sketch(col("kh"), lit(eps), lit(confidence), lit(seed))
        .as("cms")).head().getAs[Array[Byte]](0)
    keyed
      .where(CmsEstimate(sketch, col("kh")) >= threshold)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }
}
