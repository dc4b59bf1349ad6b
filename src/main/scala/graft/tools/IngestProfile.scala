package graft.tools

import graft.fixtures.AcquisitionFixture

/** Scratch phase profiler for the ingest pipeline: times gate/meta,
  * decode+enrich+sink, and the RMS read-back+sink separately, twice
  * (cold JVM then warm), so BenchIngest regressions can be attributed
  * to a phase instead of guessed at. Not part of the bench surface. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32)
    val landing = java.nio.file.Files.createTempDirectory("graft_ingest_prof").toString
    AcquisitionFixture.write(s"$landing/acq",
      AcquisitionFixture.Spec(seconds = 600.0))
    (1 to 2).foreach { round =>
      val out = java.nio.file.Files.createTempDirectory("graft_ingest_prof_out").toString
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[phase $round] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val acqDir = s"$landing/acq"
      val complete = t("gate")(graft.ingest.Ingest.isComplete(spark, acqDir))
      require(complete)
      val meta = t("meta")(graft.ingest.Ingest.readMeta(spark, acqDir))
      val cfg = meta.device.components("iis3dwb_acc")
      val decoded = t("decode-plan")(
        graft.ingest.Ingest.decodeDat(spark, s"$acqDir/iis3dwb_acc.dat", cfg))
      t("decode-count")(println("  rows=" + decoded.count()))
      val enriched = graft.ingest.Ingest.enrich(
        decoded, meta.info.startTime, meta.device.alias)
      t("sink-enriched")(graft.sink.PartitionedSink.write(
        enriched, s"$out/data_parquet",
        filePrefix = Some("prof"), renameScope = Seq(meta.device.alias),
        inputPartitions = Some(graft.ingest.Ingest.decodeSplitCount(
          spark, s"$acqDir/iis3dwb_acc.dat", cfg))))
      val axes = decoded.columns.filter(_ != "Time")
        .map(graft.model.Sanitize.column).toSeq
      val onDisk = spark.read
        .option("basePath", s"$out/data_parquet")
        .parquet(s"$out/data_parquet/alias=${meta.device.alias}")
      // mirror Pipeline.processAcquisition's fast-path declaration
      val maxAbs: Option[Double] = cfg.dataType match {
        case "int16" => Some(32768.0 * cfg.sensitivity.abs)
        case _ => None
      }
      val rms = t("rms-compute")(
        graft.analytics.Rms.compute(onDisk, axes, 1000000000L, 0.999,
          alias = meta.device.alias, maxAbs = maxAbs).persist())
      t("rms-guard")(println("  rmsEmpty=" + rms.isEmpty))
      t("sink-rms")(graft.sink.PartitionedSink.write(rms,
        s"$out/data_parquet_rms",
        filePrefix = Some("prof_rms"), renameScope = Seq(meta.device.alias)))
      rms.unpersist()
    }
    spark.stop()
  }
}

/** Micro-attribution for the RMS read-back job: scan-only vs
  * double-sum vs decimal-sum over the same written parquet. */
object RmsCostProfile {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.Sessions.local(32)
    val landing = java.nio.file.Files.createTempDirectory("graft_rmscost").toString
    AcquisitionFixture.write(s"$landing/acq",
      AcquisitionFixture.Spec(seconds = 600.0))
    val out = java.nio.file.Files.createTempDirectory("graft_rmscost_out").toString
    graft.ingest.Pipeline.processAcquisition(spark, s"$landing/acq", out)
    val df = spark.read.parquet(s"$out/data_parquet")
    df.count()
    def t(label: String)(f: => Any): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[rmscost] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val bucket = expr("CAST(`Time` AS BIGINT) div 1000000000")
    t("scan-count")(df.select("A_x_g").agg(count(col("A_x_g"))).collect())
    t("double-sum-grouped") {
      df.groupBy(bucket.as("b"))
        .agg(sum(col("A_x_g") * col("A_x_g")), sum(col("A_y_g") * col("A_y_g")),
          sum(col("A_z_g") * col("A_z_g")), min("Time"), max("Time")).collect()
    }
    t("decimal30-sum-grouped") {
      df.groupBy(bucket.as("b"))
        .agg(sum((col("A_x_g") * col("A_x_g")).cast("decimal(30,8)")),
          sum((col("A_y_g") * col("A_y_g")).cast("decimal(30,8)")),
          sum((col("A_z_g") * col("A_z_g")).cast("decimal(30,8)")),
          min("Time"), max("Time")).collect()
    }
    t("decimal18-sum-grouped") {
      df.groupBy(bucket.as("b"))
        .agg(sum((col("A_x_g") * col("A_x_g")).cast("decimal(18,8)")),
          sum((col("A_y_g") * col("A_y_g")).cast("decimal(18,8)")),
          sum((col("A_z_g") * col("A_z_g")).cast("decimal(18,8)")),
          min("Time"), max("Time")).collect()
    }
    t("long-scaled-sum-grouped") {
      df.groupBy(bucket.as("b"))
        .agg(sum(expr("CAST(round(A_x_g * A_x_g * 100000000) AS BIGINT)")),
          sum(expr("CAST(round(A_y_g * A_y_g * 100000000) AS BIGINT)")),
          sum(expr("CAST(round(A_z_g * A_z_g * 100000000) AS BIGINT)")),
          min("Time"), max("Time")).collect()
    }
    spark.stop()
  }
}
