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

  // zones of 10 consecutive values: zone z holds val in [10z, 10z+9]
  private def zoned = (0 until 400).map { i =>
    val v = (i * 7) % 100
    (i.toLong, (v / 10).toLong, v.toLong)
  }.toDF("id", "zone_id", "val")

  test("zoneMap: per-zone count and min/max match closed form") {
    val zm = Stats.zoneMap(zoned, "zone_id", Seq("val"))
      .orderBy("zone").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(zm.length == 10)
    zm.foreach { case (z, n, lo, hi) =>
      assert(n == 40, s"zone $z count $n")
      assert(lo >= 10 * z && hi <= 10 * z + 9 && lo <= hi)
    }
  }

  test("pruneByZoneMap ≡ direct range filter; non-matching zones are cut") {
    val zm = Stats.zoneMap(zoned, "zone_id", Seq("val"))
    // aligned, straddling, single-point and empty ranges must all be
    // exact — the zone cut is a superset, the residual filter exact
    for ((lo, hi) <- Seq((20L, 39L), (25L, 44L), (63L, 63L), (200L, 300L))) {
      val got = Stats.pruneByZoneMap(zoned, zm, "zone_id", "val", lo, hi)
        .orderBy("id").collect().toSeq
      val want = zoned.where(col("val") >= lo && col("val") <= hi)
        .orderBy("id").collect().toSeq
      assert(got == want, s"range [$lo,$hi]")
    }
    // the cut really skips zones: a 2-zone range selects 2 of 10
    val zonesHit = zm.where(col("val_min") <= 39L && col("val_max") >= 20L)
      .count()
    assert(zonesHit == 2, s"expected 2 zones, got $zonesHit")
  }
}
