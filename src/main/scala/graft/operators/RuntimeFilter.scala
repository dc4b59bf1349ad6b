package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.ColumnShim

/** Explicit Bloom-filter runtime join pruning (SURVEY.md §4.2 / the
  * 100 TB posture). Catalyst's own `InjectRuntimeFilter` fires only
  * when its heuristics line up (creation-side size thresholds, a
  * selective filter it can see, no DPP overlap); this operator is the
  * deliberate version — the caller KNOWS the dim side is selective
  * and wants fact rows that cannot join dropped at the SCAN, before
  * they pay the shuffle.
  *
  * Mechanics: one pass over the dim side builds a Bloom sketch of
  * `xxhash64(key)` via Spark's distributed [[BloomFilterAggregate]]
  * (partial sketches OR-merge — one narrow aggregate, no extra
  * shuffle of the dim data). The serialized sketch — bounded by
  * construction at `numBits/8` bytes (default ≈ 1 MiB), NOT by data
  * volume — collects to the driver and embeds as a literal in a
  * `might_contain` predicate on the fact side, so the filter sits
  * adjacent to the parquet scan inside whole-stage codegen and prunes
  * BEFORE the join's exchange. The exact join then runs on the
  * survivors.
  *
  * EXACT output: a Bloom filter has false positives only — a fact row
  * whose key joins is never dropped (same hash function on both
  * sides); spurious survivors die in the join itself. False-positive
  * rate only costs efficiency, so `numBits` is sized by the caller's
  * expected distinct-key count (Spark's sketch places optimal k for
  * the implied m/n).
  *
  * At 1000 executors the sketch is one ~1 MiB task-result + one
  * broadcast — the same bounded-contract driver hop as a broadcast
  * join's build side, paid once to avoid shuffling the non-joining
  * fraction of 100 TB.
  */
object RuntimeFilter {

  /** Build the serialized Bloom sketch of `xxhash64(keys)` over `dim`.
    * Returns the sketch bytes (≈ numBits/8, independent of row count).
    */
  private[graft] def bloomSketch(
      dim: DataFrame, keys: Seq[String], expectedItems: Long,
      numBits: Long): Array[Byte] = {
    val keyHash = ColumnShim.expression(xxhash64(keys.map(col): _*))
    val agg = new BloomFilterAggregate(keyHash,
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
    val sketchRow = dim
      .select(ColumnShim.column(agg.toAggregateExpression()).as("bf"))
      .head()
    require(!sketchRow.isNullAt(0),
      "bloomPrunedJoin: empty dim side — the join result is empty; " +
        "short-circuit upstream instead of building a filter from it")
    sketchRow.getAs[Array[Byte]](0)
  }

  /** `might_contain(sketch, xxhash64(keys))` as a Column — the fact-
    * side pruning predicate. */
  private[graft] def mightContain(
      sketch: Array[Byte], keys: Seq[String]): Column =
    ColumnShim.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(sketch),
      ColumnShim.expression(xxhash64(keys.map(col): _*))))

  /** Inner equi-join of `fact` ⋈ `dim` on `keys`, with the fact side
    * Bloom-pruned before the exchange. Result is EXACTLY
    * `fact.join(dim, keys)` — the sketch only removes rows that
    * cannot match.
    *
    * `expectedItems` sizes the sketch for the dim side's distinct key
    * count (overestimating is safe — it only lowers the FP rate for
    * the same numBits).
    */
  def bloomPrunedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    require(keys.nonEmpty, "bloomPrunedJoin: at least one join key")
    require(expectedItems > 0 && numBits > 0,
      "bloomPrunedJoin: expectedItems and numBits must be positive")
    val sketch = bloomSketch(dim, keys, expectedItems, numBits)
    fact.where(mightContain(sketch, keys)).join(dim, keys)
  }
}
