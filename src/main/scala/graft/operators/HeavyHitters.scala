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

  /** The sketch-build half: one narrow aggregate pass → serialized
    * CMS of xxhash64(key). Empty input yields an all-zero sketch
    * (not null) — every estimate is then 0, which downstream
    * prefilters handle correctly. */
  def sketchOf(
      df: DataFrame,
      keyCol: String,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42): Array[Byte] =
    df.select(
      count_min_sketch(xxhash64(col(keyCol)), lit(eps), lit(confidence),
        lit(seed)).as("cms")).head().getAs[Array[Byte]](0)

  /** Cell-wise merge of partial sketches (same eps/confidence/seed by
    * construction — callers derive them all from one config). CMS
    * merge is commutative + associative integer addition, so ANY
    * merge order yields the identical sketch — the property that lets
    * partials come from executors, micro-batches, or days of history
    * interchangeably. */
  def mergeSketches(sketches: Seq[Array[Byte]]): Array[Byte] = {
    require(sketches.nonEmpty, "mergeSketches: no partial sketches")
    import org.apache.spark.util.sketch.CountMinSketch
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    val acc = CountMinSketch.readFrom(new ByteArrayInputStream(sketches.head))
    sketches.tail.foreach { b =>
      acc.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(b)))
    }
    val out = new ByteArrayOutputStream()
    acc.writeTo(out)
    out.toByteArray
  }

  /** The exact-verify half: CMS prefilter (sound — one-sided error)
    * + exact groupBy over the survivors; `count ≥ T` kills the
    * sketch's false positives. Output = exactly the naive
    * `groupBy.count.having` plan's. */
  def verifyWithSketch(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      sketch: Array[Byte]): DataFrame = {
    require(threshold >= 1,
      s"verifyWithSketch: threshold >= 1, got $threshold")
    df.select(col(keyCol).as("k"), xxhash64(col(keyCol)).as("kh"))
      .where(CmsEstimate(sketch, col("kh")) >= threshold)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }

  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      threshold: Long,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    verifyWithSketch(df, keyCol, threshold,
      sketchOf(df, keyCol, eps, confidence, seed))
}
