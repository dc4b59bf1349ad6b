package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join (the "most recent right row at or
  * before the left row's time, per key" operator).
  *
  * The reference pipeline has no as-of join, but its completeness-gated
  * retry model (reference `main.py:43-47`) and time-series data model
  * make it the canonical missing operator class (SURVEY.md §2.B). Spark
  * has no built-in as-of join, so this composes built-ins the way a
  * distributed merge_asof is classically built:
  *
  *   union(left tagged 1, right tagged 0)
  *     -> single hash exchange on key
  *     -> per-partition sort by (time, tag)   [right sorts first on ties
  *        => inclusive <= semantics]
  *     -> running `last(value, ignoreNulls)` window, unbounded preceding
  *     -> keep left rows, now carrying the latest right values
  *
  * One shuffle total, no per-row join explosion, skew bounded by key
  * cardinality — this holds at 100 TB where a naive
  * `join + filter + groupBy-max + rejoin` would shuffle twice and blow
  * up on range overlap.
  *
  * @param leftKey/rightKey  equi-key columns
  * @param leftTime/rightTime  numeric (long-comparable) event-time cols
  * @param rightVals  right columns to carry to the output
  */
object AsOfJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rightSchema = right.schema

    val lTagged = left.select(
      (Seq(
        col(leftKey).as("__k"), // any equi-comparable key type
        col(leftTime).cast("long").as("__t"),
        lit(1).as("__side")) ++
        leftCols.map(c => col(c).as(s"__l_$c")) ++
        rightVals.map(c =>
          lit(null).cast(rightSchema(c).dataType).as(s"__r_$c"))): _*)

    val rTagged = right.select(
      (Seq(
        col(rightKey).as("__k"),
        col(rightTime).cast("long").as("__t"),
        lit(0).as("__side")) ++
        leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        rightVals.map(c => col(c).as(s"__r_$c"))): _*)

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .select(
        (Seq(col("__side")) ++
          leftCols.map(c => col(s"__l_$c")) ++
          rightVals.map(c =>
            last(col(s"__r_$c"), ignoreNulls = true).over(w)
              .as(s"__r_$c"))): _*)

    filled
      .where(col("__side") === 1)
      .select(
        (leftCols.map(c => col(s"__l_$c").as(c)) ++
          rightVals.map(c => col(s"__r_$c").as(c))): _*)
  }

  /** Forward as-of join: the EARLIEST right row at or after the left
    * row's time, per key. Same single-shuffle construction with the
    * time axis negated (right still sorts first on ties ⇒ inclusive
    * `>=` semantics). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val negL = left.withColumn(leftTime, col(leftTime).cast("long") * -1L)
    val negR = right.withColumn(rightTime, col(rightTime).cast("long") * -1L)
    asofBackward(negL, negR, leftKey, rightKey, leftTime, rightTime, rightVals)
      .withColumn(leftTime, col(leftTime).cast("long") * -1L)
  }
}
