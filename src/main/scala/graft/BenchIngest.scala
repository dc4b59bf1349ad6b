package graft

import graft.fixtures.AcquisitionFixture

/** Ingest throughput bench (BASELINE.md: decode+enrich+write one hour
  * of IIS3DWB data, ~576 MB raw / 96M samples, inside the reference's
  * 600 s per-acquisition ceiling). Duration configurable:
  * SPARK_GRAFT_INGEST_SECONDS (default 600 = 10 min of sensor time).
  */
object BenchIngest {
  def main(args: Array[String]): Unit = {
    val seconds = sys.env.getOrElse("SPARK_GRAFT_INGEST_SECONDS", "600").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus.toInt)
    val landing = java.nio.file.Files.createTempDirectory("graft_ingest_bench").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_out").toString
    val t0 = System.nanoTime()
    AcquisitionFixture.write(s"$landing/bench_acq",
      AcquisitionFixture.Spec(seconds = seconds))
    val tGen = (System.nanoTime() - t0) / 1e9
    val rawBytes = new java.io.File(s"$landing/bench_acq/iis3dwb_acc.dat").length()
    val t1 = System.nanoTime()
    val res = ingest.Pipeline.processAcquisition(spark, s"$landing/bench_acq", out).get
    val dt = (System.nanoTime() - t1) / 1e9
    val nRows = spark.read.parquet(s"$out/data_parquet").count()
    val nRms = res.rms.map(_ => spark.read.parquet(s"$out/data_parquet_rms").count()).getOrElse(0L)
    println(s"""{"metric":"ingest","value":$dt,"unit":"sec","sensor_seconds":$seconds,""" +
      s""""raw_mb":${rawBytes / 1e6},"rows":$nRows,"rms_rows":$nRms,""" +
      s""""gen_sec":$tGen,"mb_per_sec":${rawBytes / 1e6 / dt}}""")
    spark.stop()
  }
}
