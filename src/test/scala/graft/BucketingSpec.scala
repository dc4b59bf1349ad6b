package graft

import org.apache.spark.sql.functions._

import graft.sink.Bucketing

/** Bucketed co-located join: the write-once-shuffle-never pattern.
  * Asserts the planner sees the bucketing (no Exchange in the join
  * plan) and results match the unbucketed join. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without any Exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 8,
      sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("o_orderkey"), 8,
      sortCols = Seq("o_orderkey"))

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan should read bucketed:\n$plan")

      // results identical to the plain join
      val expected = orders.join(lineitem, Seq("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
