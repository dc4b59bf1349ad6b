package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.CmsEstimate
import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: key i appears ~ floor(600/(i+1)) times → a few heavy
  // keys over a long tail
  private def skewed = {
    val rows = (0 until 200).flatMap(i => Seq.fill(600 / (i + 1))(i.toLong))
    rows.toDF("key")
  }

  private def naive(threshold: Long) = skewed.groupBy(col("key").as("k"))
    .agg(count(lit(1)).as("n")).where(col("n") >= threshold)
    .orderBy("k").collect().toSeq

  test("heavyHitters == exact groupBy/having") {
    val got = HeavyHitters.heavyHitters(skewed, "key", threshold = 50L)
      .orderBy("k").collect().toSeq
    assert(got == naive(50L))
    assert(got.nonEmpty)
  }

  test("exact even with a coarse sketch (huge eps → everything passes)") {
    val got = HeavyHitters
      .heavyHitters(skewed, "key", threshold = 50L, eps = 0.5)
      .orderBy("k").collect().toSeq
    assert(got == naive(50L))
  }

  test("driver-side estimate upper-bounds every true count (hash paths agree)") {
    // validates that CountMinSketchAgg's update hashing and
    // CountMinSketch.estimateCount agree for BIGINT keys — a mismatch
    // would silently break the prefilter's one-sided guarantee
    val keyed = skewed.select(xxhash64(col("key")).as("kh"))
    val bytes = keyed.select(
      count_min_sketch(col("kh"), lit(0.001), lit(0.99), lit(7)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    val truth = keyed.groupBy("kh").agg(count(lit(1)).as("n")).collect()
    truth.foreach { r =>
      val est = cms.estimateCount(java.lang.Long.valueOf(r.getLong(0)))
      assert(est >= r.getLong(1),
        s"estimate $est < true ${r.getLong(1)} for key ${r.getLong(0)}")
    }
  }

  test("CmsEstimate expression matches the driver-side lookup") {
    val keyed = skewed.select(xxhash64(col("key")).as("kh"))
    val bytes = keyed.select(
      count_min_sketch(col("kh"), lit(0.001), lit(0.99), lit(7)).as("s"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    val rows = keyed.distinct()
      .select(col("kh"), CmsEstimate(bytes, col("kh")).as("est")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) ==
        cms.estimateCount(java.lang.Long.valueOf(r.getLong(0))))
    }
  }

  test("prefilter prunes the tail when the sketch is well-sized") {
    val keyed = skewed.select(col("key"), xxhash64(col("key")).as("kh"))
    val bytes = keyed.select(
      count_min_sketch(col("kh"), lit(0.0001), lit(0.99), lit(42)).as("s"))
      .head().getAs[Array[Byte]](0)
    val kept = keyed.where(CmsEstimate(bytes, col("kh")) >= 50L)
      .select("key").distinct().count()
    val heavy = naive(50L).size.toLong
    assert(kept >= heavy, "a heavy key was pruned (one-sided bound broken)")
    assert(kept < 200 / 2,
      s"prefilter pruned nothing: $kept of 200 distinct keys survive")
  }

  test("streamed per-batch partials merge to the single-pass sketch, byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft_hh_stream")
      .toString
    // three uneven "micro-batches" of the same rows, landed through
    // the streaming batch writer (incl. a REPLAY of batch 1 — the
    // dynamic-overwrite discipline must keep it idempotent)
    val parts = Seq(skewed.where(col("key") % 3 === 0),
      skewed.where(col("key") % 3 === 1),
      skewed.where(col("key") % 3 === 2))
    parts.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamingIngest.sketchBatch(
        b, "key", 0.01, 0.99, 42, s"$base/sketches", i.toLong)
    }
    graft.streaming.StreamingIngest.sketchBatch( // at-least-once replay
      parts(1), "key", 0.01, 0.99, 42, s"$base/sketches", 1L)
    val partials = spark.read.parquet(s"$base/sketches")
      .select("cms").collect().map(_.getAs[Array[Byte]](0)).toSeq
    assert(partials.size == 3, "replayed batch must overwrite, not append")
    val merged = HeavyHitters.mergeSketches(partials)
    val single = HeavyHitters.sketchOf(skewed, "key", eps = 0.01,
      confidence = 0.99, seed = 42)
    assert(java.util.Arrays.equals(merged, single),
      "batch-split must be invisible in the accumulated sketch")
    // and the exact-verify read side returns the naive answer
    skewed.write.mode("overwrite").parquet(s"$base/landing")
    val got = graft.streaming.StreamingIngest.finishHeavyHitters(
        spark, s"$base/landing", s"$base/sketches", "key", 50L)
      .orderBy("k").collect().toSeq
    assert(got == naive(50L))
    graft.queries.IngestQueries.deleteTree(java.nio.file.Paths.get(base))
  }

  test("same seed → identical sketch; empty input → empty result") {
    def sketchOf(seed: Int) = skewed
      .select(count_min_sketch(xxhash64(col("key")), lit(0.01), lit(0.99),
        lit(seed)).as("s")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketchOf(5), sketchOf(5)))
    // empty input produces an all-zero sketch → every row prunes →
    // empty output, which IS the exact answer
    assert(HeavyHitters.heavyHitters(
      skewed.where(lit(false)), "key", 10L).count() == 0L)
  }
}
