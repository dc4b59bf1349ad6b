package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join pattern (SURVEY.md
  * §4.2 / the 100 TB posture): writing both sides of a hot join
  * bucketed by the join key lets Spark plan a SortMergeJoin with NO
  * exchange on either side; the shuffle is paid once at write time
  * and amortized over every subsequent join.
  *
  * Bucketed writes go through the session catalog (`saveAsTable`) —
  * bucket metadata lives in the metastore, which is also what makes
  * the bucketing visible to the planner on re-read.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val located = path.fold(w)(p => w.option("path", p)) // external table
    (if (sortCols.nonEmpty) located.sortBy(sortCols.head, sortCols.tail: _*)
     else located)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts the planner emits a SortMergeJoin whose children
    * read pre-bucketed files — zero Exchange operators. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
