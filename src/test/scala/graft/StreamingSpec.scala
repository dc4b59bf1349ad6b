package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.fixtures.AcquisitionFixture
import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.FileEvent

class StreamingSpec extends SparkSpec {

  test("completeness gate: emits a dir once, only when required set present") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FileEvent]
    val gated = StreamingIngest.completenessGate(input.toDS())
    val q = gated.writeStream.format("memory")
      .queryName("gate_out").outputMode("append").start()
    try {
      // batch 1: partial uploads for two acquisitions
      input.addData(
        FileEvent("/l/a1", "acquisition_info.json"),
        FileEvent("/l/a1", "iis3dwb_acc.dat"),
        FileEvent("/l/a2", "acquisition_info.json"))
      q.processAllAvailable()
      assert(spark.table("gate_out").count() == 0, "nothing complete yet")

      // batch 2: a1 completes (case-insensitive match like main.py:25)
      input.addData(FileEvent("/l/a1", "Device_Config.JSON"))
      q.processAllAvailable()
      assert(spark.table("gate_out").as[String].collect().toSeq == Seq("/l/a1"))

      // batch 3: duplicate event for a1 (the reference gets re-fired
      // per object) must NOT re-emit; a2 completes
      input.addData(
        FileEvent("/l/a1", "iis3dwb_acc.dat"),
        FileEvent("/l/a2", "device_config.json"),
        FileEvent("/l/a2", "iis3dwb_acc.dat"))
      q.processAllAvailable()
      assert(spark.table("gate_out").as[String].collect().sorted.toSeq ==
        Seq("/l/a1", "/l/a2"))
    } finally q.stop()
  }

  test("streaming E2E: files land incrementally, pipeline fires on completion") {
    val landing = tmpDir("stream_landing")
    val out = tmpDir("stream_out")
    val ckpt = tmpDir("stream_ckpt")
    val acq = s"$landing/acq1"
    Files.createDirectories(Paths.get(acq))

    // phase 1: only the .dat + info — incomplete
    val spec = AcquisitionFixture.Spec()
    AcquisitionFixture.writeIncomplete(acq, spec)
    StreamingIngest.run(spark, landing, out, ckpt, Trigger.AvailableNow())
    assert(!new java.io.File(s"$out/data_parquet").exists(),
      "incomplete acquisition must not produce output")

    // phase 2: device_config arrives — the next run completes the set
    AcquisitionFixture.write(acq, spec) // writes all three (two exist)
    StreamingIngest.run(spark, landing, out, ckpt, Trigger.AvailableNow())
    val enriched = spark.read.parquet(s"$out/data_parquet")
    assert(enriched.count() > 0)
    assert(enriched.columns.contains("alias"))
    val rms = spark.read.parquet(s"$out/data_parquet_rms")
    assert(rms.count() == 3)
  }

  test("streaming decontamination: batch write is idempotent under replay") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_decontam_idem").toString + "/out"
    val contam = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .contamFingerprints(contam, "doc_id", "text", 3)
      .localCheckpoint(eager = true)
    val b0 = Seq(
      (1L, "clean one two three"),
      (2L, "alpha beta gamma delta leak")).toDF("doc_id", "text")
    StreamingIngest.decontamBatch(b0, fps, "doc_id", "text", 3, out, 0L)
    // foreachBatch is at-least-once: a crash-before-checkpoint replays
    // the SAME batch id — the write must overwrite, not duplicate
    StreamingIngest.decontamBatch(b0, fps, "doc_id", "text", 3, out, 0L)
    val after = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == Seq(1L), s"replayed batch must not duplicate: $after")
    // a NEW batch id accumulates next to the old one
    val b1 = Seq((3L, "four five six seven")).toDF("doc_id", "text")
    StreamingIngest.decontamBatch(b1, fps, "doc_id", "text", 3, out, 1L)
    val all = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all == Seq(1L, 3L))
  }

  test("streaming dedup: repeats within the watermark horizon dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val df = input.toDF().toDF("k", "ts")
    val deduped = StreamingIngest.streamingDedup(df, Seq("k"), "ts", "1 minute")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      input.addData(("a", ts(0)), ("a", ts(5)), ("b", ts(10)))
      q.processAllAvailable()
      input.addData(("a", ts(20)), ("b", ts(30))) // still within horizon
      q.processAllAvailable()
      val keys = spark.table("dedup_out").collect().map(_.getString(0)).sorted
      assert(keys.toSeq == Seq("a", "b"), s"got ${keys.toSeq}")
    } finally q.stop()
  }

  test("streaming RMS: watermarked tumbling windows close correctly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (ts seconds, x, y) samples: window [0,1) has x=3,4; [1,2) x=5
    val input = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val df = input.toDF().toDF("ts", "x", "y")
    val rms = StreamingIngest.streamingRms(df, "ts", Seq("x", "y"))
    val q = rms.writeStream.format("memory")
      .queryName("rms_out").outputMode("append").start()
    try {
      def ts(s: Double) = new java.sql.Timestamp((s * 1000).toLong)
      input.addData((ts(0.2), 3.0, 0.0), (ts(0.7), 4.0, 0.0), (ts(1.2), 5.0, 12.0))
      q.processAllAvailable()
      // advance watermark far enough to close both windows
      input.addData((ts(30.0), 0.0, 0.0))
      q.processAllAvailable()
      val rows = spark.table("rms_out").orderBy("Time").collect()
      assert(rows.length >= 2)
      // window 0: rms_x = sqrt((9+16)/2); window 1: rms_x = 5, rms_y = 12, mod = 13
      assert(math.abs(rows(0).getAs[Double]("rms_x") - math.sqrt(12.5)) < 1e-12)
      assert(math.abs(rows(1).getAs[Double]("rms_x") - 5.0) < 1e-12)
      assert(math.abs(rows(1).getAs[Double]("rms_mod") - 13.0) < 1e-12)
    } finally q.stop()
  }
}
