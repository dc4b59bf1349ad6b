package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeCapture

class ChangeCaptureSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies I/U/D, lists changed columns, drops no-ops") {
    val oldDf = Seq(
      (1L, 100L, "A"), // unchanged
      (2L, 200L, "B"), // price changes
      (3L, 300L, "C"), // status changes
      (4L, 400L, "D"), // both change
      (5L, 500L, "E")  // deleted
    ).toDF("k", "cents", "status")
    val newDf = Seq(
      (1L, 100L, "A"),
      (2L, 250L, "B"),
      (3L, 300L, "X"),
      (4L, 444L, "Y"),
      (6L, 600L, "F")  // inserted
    ).toDF("k", "cents", "status")
    val got = ChangeCapture.snapshotDiff(oldDf, newDf, "k",
        Seq("cents", "status"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(6)))
    assert(got.toSeq == Seq(
      (2L, "U", "cents"),
      (3L, "U", "status"),
      (4L, "U", "cents,status"),
      (5L, "D", ""),
      (6L, "I", "")))
  }

  test("snapshotDiff: null compared values are not spurious changes") {
    val oldDf = Seq((1L, Option.empty[Long]), (2L, Some(5L)), (3L, Some(7L)))
      .toDF("k", "v")
    val newDf = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]),
      (3L, Some(7L))).toDF("k", "v")
    val got = ChangeCapture.snapshotDiff(oldDf, newDf, "k", Seq("v"))
      .orderBy("k").collect()
    // null <=> null is equal → key 1 and 3 are no-ops; 2 is a real U
    assert(got.map(_.getLong(0)).toSeq == Seq(2L))
    assert(got.head.getString(1) == "U" && got.head.getString(4) == "v")
  }

  test("snapshotDiff single-exchange plan: exactly one shuffle join") {
    val oldDf = spark.range(1000).select(col("id").as("k"),
      (col("id") * 3).as("v"))
    val newDf = spark.range(1100).select(col("id").as("k"),
      (col("id") * 3 + col("id") % 7).as("v"))
    val plan = ChangeCapture.snapshotDiff(oldDf, newDf, "k", Seq("v"))
      .queryExecution.executedPlan.toString
    // one full-outer SMJ/shuffle-hash join and nothing else exchanging
    val joins = "(SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected 1 shuffle join, plan:\n$plan")
  }
}
