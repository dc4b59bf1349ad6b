package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rolling order statistics over bounded row windows — the
  * robust-statistics kin of the moving aggregates in q79: a rolling
  * MEDIAN and MAD (median absolute deviation) that stay integer-exact
  * cross-engine by reporting DOUBLED and QUADRUPLED values instead of
  * ever dividing:
  *
  *   med2 = s[(n+1) div 2] + s[n div 2 + 1]        (= 2·median)
  *   mad4 = d[(n+1) div 2] + d[n div 2 + 1]        (= 4·MAD)
  *     where s = sorted window values, d = sorted |2·x − med2|
  *
  * — the two picked indices coincide for odd n and straddle the
  * middle for even n, so the sum is 2·median for BOTH parities with
  * no float division anywhere. The robust outlier test
  * |x − median| > k·MAD becomes the integer inequality
  * 2·|2·x − med2| > k·mad4.
  *
  * Scale shape: one hash exchange on the partition key, then a single
  * in-partition window scan; each row's window array is ≤ `window`
  * elements, sorted per row (n log n on a handful of values inside
  * codegen — no second exchange, no self-join). Rolling medians over
  * UNBOUNDED frames would need a different algorithm (two-heap or
  * indexable skiplist per group); bounded frames are the streaming-
  * sensor use case and keep the per-row cost O(window log window).
  */
object Rolling {

  /** Append rolling med2/mad4/outlier columns for integer column
    * `valueCol` over the last `window` rows per `partCol`, ordered by
    * `orderCols` (must be a unique total order within the partition).
    * Outlier: 2·|2·x − med2| > `k`·mad4 (k=3 ≈ the classic 3-MAD
    * fence), emitted as 1/0. */
  def medianMad(
      df: DataFrame,
      partCol: String,
      orderCols: Seq[String],
      valueCol: String,
      window: Int,
      k: Int = 3): DataFrame = {
    require(window >= 2 && window <= 1024,
      s"medianMad: window in [2, 1024], got $window")
    require(k >= 1, s"medianMad: k >= 1, got $k")
    val w = Window.partitionBy(partCol)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val x = col(valueCol)
    // `div` (not `/`): Column `/` on integers promotes to double;
    // both picked indices must stay integer for element_at
    def mid2(sortedCol: String): String =
      s"element_at($sortedCol, int((_n + 1) div 2)) + " +
        s"element_at($sortedCol, int(_n div 2 + 1))"
    df.withColumn("_arr", sort_array(collect_list(x).over(w)))
      .withColumn("_n", size(col("_arr")))
      .withColumn("med2", expr(mid2("_arr")))
      .withColumn("_devs", array_sort(transform(col("_arr"),
        v => abs(v * 2 - col("med2")))))
      .withColumn("mad4", expr(mid2("_devs")))
      .withColumn("outlier",
        when(abs(x * 2 - col("med2")) * 2 > col("mad4") * k, lit(1L))
          .otherwise(lit(0L)))
      .drop("_arr", "_n", "_devs")
  }
}
