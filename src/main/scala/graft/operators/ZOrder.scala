package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional data layout: interleave the
  * bits of two integer dimensions into one sort key so that sorting /
  * range-partitioning by it co-locates rows that are close in BOTH
  * dimensions. At 100 TB this is the difference between parquet
  * min/max stats pruning on one column and pruning on two — a scan
  * with predicates on either dimension skips most files, which a
  * single-column sort only gives you for that one column.
  *
  * Everything here is a pure, statically-unrolled `Column` bit
  * expression (shift/and/or) — whole-stage-codegen friendly, no UDF,
  * no lookup table — so computing the key adds no shuffle and
  * negligible CPU to the write path.
  *
  * Reference scope: the reference sink writes one acquisition per
  * file (`main.py:124-131`) and never co-locates across dimensions;
  * this operator is part of the warehouse-layout extension suite.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of `a` and `b`:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Inputs are masked to `bits` bits first, so the result is a
    * non-negative long below 4^bits (bits ≤ 31). */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "mortonCode: bits in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.bitwiseAND(lit(mask))
    val bm = b.bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[mortonCode]]: extract dimension 0 (even bits) or
    * dimension 1 (odd bits) back out of a code. */
  def mortonExtract(code: Column, dim: Int, bits: Int): Column = {
    require(dim == 0 || dim == 1, "mortonExtract: dim is 0 or 1")
    (0 until bits).map { i =>
      shiftleft(shiftright(code, 2 * i + dim).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)
  }

  /** Attach the z-order key and its coarse bucket (top `bucketBits`
    * of the code — i.e. the quadtree cell at that depth). The bucket
    * is what a writer range-partitions on; rows in one bucket form an
    * axis-aligned cell in (a, b) space, so every output file carries
    * tight min/max stats on BOTH source columns. */
  def withZOrder(df: DataFrame, colA: Column, colB: Column,
                 bits: Int, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      "withZOrder: bucketBits in [1, 2*bits]")
    df.withColumn("zcode", mortonCode(colA, colB, bits))
      .withColumn("zbucket",
        shiftright(col("zcode"), 2 * bits - bucketBits))
  }

  /** Cluster the frame for writing: range-partition on the z-key and
    * sort within partitions, so downstream parquet files carry
    * non-overlapping z-ranges (⇒ bounded rectangles in (a, b)).
    * `numPartitions` sizes the files, not the correctness. */
  def layout(df: DataFrame, colA: Column, colB: Column, bits: Int,
             numPartitions: Int): DataFrame =
    df.withColumn("zcode", mortonCode(colA, colB, bits))
      .repartitionByRange(numPartitions, col("zcode"))
      .sortWithinPartitions("zcode")
}
