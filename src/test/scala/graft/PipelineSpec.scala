package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.fixtures.AcquisitionFixture
import graft.ingest.{Ingest, Pipeline}

/** E2E ingest: synthetic acquisition folder → gate → distributed
  * decode → enrich → partitioned sinks → RMS, asserted against the
  * fixture's closed-form expectations (FIXTURES.md §1.3) and the
  * reference CI's output contract (`test-conversion.yml:127`). */
class PipelineSpec extends SparkSpec {

  private val spec = AcquisitionFixture.Spec() // 3.5 s, A=1 g, 50 Hz sine

  test("completeness gate accepts complete, rejects incomplete (main.py:43-47)") {
    val okDir = tmpDir("acq_ok")
    val badDir = tmpDir("acq_bad")
    AcquisitionFixture.write(s"$okDir/a1", spec)
    AcquisitionFixture.writeIncomplete(s"$badDir/a2", spec)
    assert(Ingest.isComplete(spark, s"$okDir/a1"))
    assert(!Ingest.isComplete(spark, s"$badDir/a2"))
    assert(Pipeline.processAcquisition(spark, s"$badDir/a2", tmpDir("out")).isEmpty)
    assert(Ingest.completeAcquisitions(spark, okDir) == Seq(s"file:$okDir/a1"))
  }

  test("pipeline E2E: enriched output honors the CI contract + closed-form RMS") {
    val acq = tmpDir("acq_e2e")
    val out = tmpDir("out_e2e")
    val nBlocks = AcquisitionFixture.write(s"$acq/LAF1_fixture", spec)
    val res = Pipeline.processAcquisition(spark, s"$acq/LAF1_fixture", out).get

    // --- enriched table, re-read from the partitioned sink ---
    val enriched = spark.read.parquet(s"$out/data_parquet")
    // CI contract: alias present, Time int64, rows > 0
    assert(enriched.columns.contains("alias"))
    assert(enriched.schema("Time").dataType == LongType)
    val n = enriched.count()
    assert(n == nBlocks * spec.samplesPerTs) // partial trailing block dropped
    assert(enriched.select("alias").distinct().collect().map(_.getString(0)).toSeq == Seq("LAF1"))
    // Hive partition layout alias=/year=/month=/day= (main.py:124-131)
    assert(new java.io.File(
      s"$out/data_parquet/alias=LAF1/year=2025/month=7/day=11").isDirectory)
    // absolute time: first sample at start + 1/odr (ns, half-even round)
    val startNs = 1752250937000000000L
    val tMin = enriched.agg(min("Time")).collect()(0).getLong(0)
    assert(tMin == startNs + math.rint(1e9 / spec.odr).toLong)

    // --- RMS table: closed-form expectations ---
    val rms = spark.read.parquet(s"$out/data_parquet_rms")
      .orderBy("Time").collect()
    // 3.487 s of data → exactly 3 complete 1-s windows
    assert(rms.length == 3)
    val aQ = AcquisitionFixture.quantize(spec.amplitudeG) * AcquisitionFixture.Sensitivity
    rms.foreach { r =>
      // 1e-7, not 1e-9: the decimal(30,8) exact-sum path quantizes
      // each squared sample at 5e-9, shifting RMS by ≲1e-8 relative
      assert(math.abs(r.getAs[Double]("rms_x") - aQ) < 1e-7, "constant axis: RMS = A")
      assert(math.abs(r.getAs[Double]("rms_y") - aQ / math.sqrt(2)) < 2e-3,
        "sine axis: RMS = A/sqrt(2)")
      assert(r.getAs[Double]("rms_z") == 0.0, "zero axis")
      val expMod = math.sqrt(
        math.pow(r.getAs[Double]("rms_x"), 2) +
          math.pow(r.getAs[Double]("rms_y"), 2) +
          math.pow(r.getAs[Double]("rms_z"), 2))
      assert(math.abs(r.getAs[Double]("rms_mod") - expMod) < 1e-12)
      assert(r.getAs[String]("alias") == "LAF1")
      assert(r.getAs[Long]("Time") % 1000000000L == 0L, "window-start time")
    }

    // --- idempotency: re-running overwrites the same partitions ---
    Pipeline.processAcquisition(spark, s"$acq/LAF1_fixture", out)
    assert(spark.read.parquet(s"$out/data_parquet").count() == n)

    res.rms.foreach(df => assert(df.columns.toSeq ==
      Seq("rms_x", "rms_y", "rms_z", "rms_mod", "Time", "alias")))
  }

  test("pipeline: tagged acquisition exports per-label boolean columns") {
    val d = tmpDir("acq_tagged")
    AcquisitionFixture.write(s"$d/acq", AcquisitionFixture.Spec(seconds = 2.5))
    // splice the public HSDatalog tags shape into acquisition_info:
    // walk enabled on [start+1s, start+2s)
    val infoPath = java.nio.file.Paths.get(s"$d/acq/acquisition_info.json")
    val info = java.nio.file.Files.readString(infoPath).trim
    java.nio.file.Files.writeString(infoPath, info.dropRight(1) +
      ""","tags":[{"l":"walk","e":true,"ta":"2025-07-11T16:22:18.000Z"},
          {"l":"walk","e":false,"ta":"2025-07-11T16:22:19.000Z"}]}""")
    val out = tmpDir("acq_tagged_out")
    val res = Pipeline.processAcquisition(spark, s"$d/acq", out)
    assert(res.nonEmpty)
    val enriched = spark.read.parquet(s"$out/data_parquet")
    assert(enriched.columns.contains("tag_walk"))
    // 2.5 s · 26667 → 66 blocks → 66000 samples; tag true exactly for
    // sample times in [start+1s, start+2s) = samples 26667..53333
    val n = enriched.where(org.apache.spark.sql.functions.col("tag_walk")).count()
    assert(n == 26667L, s"tagged sample count $n")
  }

  test("empty-result guard: no complete window → no RMS sink (main.py:154-156)") {
    val acq = tmpDir("acq_short")
    val out = tmpDir("out_short")
    AcquisitionFixture.write(s"$acq/short", spec.copy(seconds = 0.5))
    val res = Pipeline.processAcquisition(spark, s"$acq/short", out).get
    assert(res.rms.isEmpty)
    assert(!new java.io.File(s"$out/data_parquet_rms").exists())
  }

  test("processLanding: concurrent pipelines over multiple acquisitions") {
    val landing = tmpDir("landing_multi")
    val out = tmpDir("out_multi")
    AcquisitionFixture.write(s"$landing/a1", spec)
    AcquisitionFixture.write(s"$landing/a2", spec.copy(alias = "LAF2"))
    AcquisitionFixture.writeIncomplete(s"$landing/a3", spec)
    assert(Pipeline.processLanding(spark, landing, out) == 2)
    val enriched = spark.read.parquet(s"$out/data_parquet")
    assert(enriched.select("alias").distinct().count() == 2)
    // each acquisition's RMS must equal a SOLO run's — a read-back
    // that scanned the sibling alias would double the window energy
    val solo = tmpDir("out_solo")
    val landingSolo = tmpDir("landing_solo")
    AcquisitionFixture.write(s"$landingSolo/a1", spec)
    assert(Pipeline.processLanding(spark, landingSolo, solo) == 1)
    val multiRms = spark.read.parquet(s"$out/data_parquet_rms")
      .where(col("alias") === spec.alias)
      .select("Time", "rms_x", "rms_y", "rms_z", "rms_mod")
    val soloRms = spark.read.parquet(s"$solo/data_parquet_rms")
      .select("Time", "rms_x", "rms_y", "rms_z", "rms_mod")
    assert(multiRms.count() > 0)
    assert(multiRms.exceptAll(soloRms).isEmpty &&
      soloRms.exceptAll(multiRms).isEmpty,
      "concurrent-run RMS drifted from the solo run")
  }

  test("splittable decode: multi-split == single-split (anchor chain)") {
    val acq = tmpDir("acq_split")
    AcquisitionFixture.write(s"$acq/a", spec)
    val meta = Ingest.readMeta(spark, s"$acq/a")
    val cfg = meta.device.components("iis3dwb_acc")
    val one = Ingest.decodeDat(spark, s"$acq/a/iis3dwb_acc.dat", cfg,
      blocksPerSplit = 1000000)
    val many = Ingest.decodeDat(spark, s"$acq/a/iis3dwb_acc.dat", cfg,
      blocksPerSplit = 7)
    assert(one.count() == many.count())
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
  }

  test("Rms long-sum fast path is bit-identical to the decimal path") {
    // bounded sensor-like doubles + NaN holes; 27 windows; the two
    // paths must agree on EVERY output bit (Quantize8's per-row
    // values equal the decimal cast's, and sums of scale-8 decimals
    // are the same integers either way)
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 50000).map { i =>
      val t = 1700000000000000000L + i.toLong * 37000000L
      val v = if (i % 997 == 0) Double.NaN else (rnd.nextDouble() - 0.5) * 32.0
      (t, v, -v, v * 0.5)
    }
    val df = rows.toDF("Time", "A_x_g", "A_y_g", "A_z_g")
    val axes = Seq("A_x_g", "A_y_g", "A_z_g")
    val slow = graft.analytics.Rms.compute(df, axes, alias = "t")
      .orderBy("Time").collect().toSeq
    val fast = graft.analytics.Rms.compute(df, axes, alias = "t",
        maxAbs = Some(16.0))
      .orderBy("Time").collect().toSeq
    assert(slow.nonEmpty)
    assert(fast == slow)
    // an unusable bound (too large for the long headroom) must keep
    // the decimal path and still agree
    val wide = graft.analytics.Rms.compute(df, axes, alias = "t",
        maxAbs = Some(1e6))
      .orderBy("Time").collect().toSeq
    assert(wide == slow)
  }
}
