package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Sess

/** Custom-state streaming sessionization: merge-logic unit checks and
  * a multi-micro-batch end-to-end run compared against the batch
  * session_window result. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSessions: fold, bridge, and interior cases") {
    val gap = 10L
    // plain fold over sorted instants
    assert(Sessionize.mergeSessions(Nil, Seq(1L, 5L, 30L, 35L), gap) ==
      List(Sess(1L, 5L, 2L), Sess(30L, 35L, 2L)))
    // a late instant bridging two existing sessions merges them
    val bridged = Sessionize.mergeSessions(
      List(Sess(1L, 5L, 2L), Sess(20L, 25L, 3L)), Seq(12L), gap)
    assert(bridged == List(Sess(1L, 25L, 6L)))
    // an instant inside an existing span only increments the count
    assert(Sessionize.mergeSessions(List(Sess(1L, 20L, 4L)), Seq(10L), gap) ==
      List(Sess(1L, 20L, 5L)))
    // strictness: delta == gap starts a NEW session (q32 semantics)
    assert(Sessionize.mergeSessions(Nil, Seq(0L, 10L), gap) ==
      List(Sess(0L, 0L, 1L), Sess(10L, 10L, 1L)))
  }

  test("streamed sessions over several micro-batches ≡ batch session_window") {
    val base = tmpDir("graft_sess_spec")
    val landing = s"$base/landing"
    // 3 users × interleaved events over ~2 hours, gap 10 min; split
    // into three CHRONOLOGICAL files (watermark delay is 0, so only
    // time-ordered batches keep every row on the non-late path).
    val gapUs = 600000000L
    // +1h base: an instant at exactly epoch 0 ties the INITIAL
    // watermark and is dropped as late — an artifact no real (2024
    // epoch) event time can hit
    val evs = for {
      u <- 0L until 3L
      i <- 0L until 40L
    } yield (u, 3600000000L + i * 137000000L + u * 31000000L) // ~2.3 min apart + skew
    val df = evs.toDF("k", "tus")
    val cut1 = 3600000000L + 2000000000L
    val cut2 = 3600000000L + 4000000000L
    df.where(col("tus") < cut1).repartition(1).write.parquet(landing)
    val seen1 = graft.queries.ExtQueries2.listDir(Paths.get(landing))
      .map(_.getFileName.toString).toSet
    df.where(col("tus") >= cut1 && col("tus") < cut2)
      .repartition(1).write.mode("append").parquet(landing)
    val seen2 = graft.queries.ExtQueries2.listDir(Paths.get(landing))
      .map(_.getFileName.toString).toSet
    df.where(col("tus") >= cut2)
      .repartition(1).write.mode("append").parquet(landing)
    // sentinel to flush the final sessions
    Seq((-1L, 4102444800000000L)).toDF("k", "tus")
      .write.mode("append").parquet(landing)
    // stagger mtimes: batch order = file order
    val now = System.currentTimeMillis()
    graft.queries.ExtQueries2.listDir(Paths.get(landing)).foreach { p =>
      val name = p.getFileName.toString
      val slot =
        if (seen1(name)) 0
        else if (seen2(name)) 1
        else if (name.startsWith("part-")) 2 // sentinel part arrives last below
        else 3
      Files.setLastModifiedTime(p, FileTime.fromMillis(now + slot * 60000L))
    }
    // the sentinel's part file is indistinguishable by name from batch
    // 3's — re-bump: any part file NOT in seen2 that carries key −1
    graft.queries.ExtQueries2.listDir(Paths.get(landing)).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("part-") && !seen1(name) && !seen2(name)) {
        val hasSentinel = spark.read.parquet(p.toString)
          .where(col("k") === -1L).count() > 0
        if (hasSentinel)
          Files.setLastModifiedTime(p, FileTime.fromMillis(now + 180000L))
      }
    }
    Sessionize.runSessionize(spark, landing, s"$base/out", s"$base/ckpt",
      gapUs, maxFilesPerTrigger = Some(1))
    val streamed = spark.read.parquet(s"$base/out")
      .where(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = df
      .withColumn("tsm", timestamp_micros(col("tus")))
      .groupBy(col("k"), session_window(col("tsm"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"),
        unix_micros(col("session_window.start")).as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
