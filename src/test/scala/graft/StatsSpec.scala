package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  // 103 rows (not divisible by 16) with duplicate values → exercises
  // the uneven-bucket split and the (v, id) total-order tiebreak
  private def fixture = (0 until 103).map { i =>
    (i.toLong, ((i * 37) % 10).toDouble)
  }.toDF("id", "v")

  test("matches the global-window NTILE formulation") {
    val got = Stats.equiDepthHistogram(fixture, "v", "id", 16)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val want = fixture
      .withColumn("bucket",
        ntile(16).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("bucket sizes differ by at most one, larger first, and sum to N") {
    val rows = Stats.equiDepthHistogram(fixture, "v", "id", 16)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == (1L to 16L))
    val sizes = rows.map(_._2)
    assert(sizes.sum == 103L)
    assert(sizes.max - sizes.min <= 1)
    // NTILE: the larger buckets come first
    assert(sizes.toSeq == sizes.sortBy(-_).toSeq)
  }

  test("partition-count invariant; nulls excluded; more buckets than rows") {
    val base = Stats.equiDepthHistogram(fixture, "v", "id", 16)
      .orderBy("bucket").collect().toSeq
    val repart = Stats.equiDepthHistogram(fixture.repartition(13), "v",
        "id", 16).orderBy("bucket").collect().toSeq
    assert(base == repart)
    val withNulls = fixture.union(
      Seq((1000L, Double.NaN)).toDF("id", "v")
        .select(col("id"), lit(null).cast("double").as("v")))
    val noNull = Stats.equiDepthHistogram(withNulls, "v", "id", 16)
      .agg(sum("n")).head().getLong(0)
    assert(noNull == 103L)
    // B > N: one row per bucket, buckets 1..N
    val tiny = Stats.equiDepthHistogram(fixture.limit(3), "v", "id", 16)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(tiny.toSeq.map(_._2).forall(_ == 1L) && tiny.length == 3)
    intercept[IllegalArgumentException] {
      Stats.equiDepthHistogram(fixture.where(lit(false)), "v", "id", 4)
    }
  }
}
