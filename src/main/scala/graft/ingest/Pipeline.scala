package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.Rms
import graft.model.Sanitize
import graft.sink.PartitionedSink

/** The reference's full event→tables pipeline as one batch call
  * (EP1+EP2+EP3, SURVEY.md §3): gate → decode → enrich → partitioned
  * enriched sink → fused RMS aggregate → partitioned RMS sink.
  *
  * Layout under `outDir` mirrors the reference (`main.py:124-131,
  * 197-204`): `data_parquet/alias=…/year=…/month=…/day=…` and
  * `data_parquet_rms/…`.
  */
object Pipeline {

  final case class Result(enriched: DataFrame, rms: Option[DataFrame])

  def processAcquisition(
      spark: SparkSession,
      acqDir: String,
      outDir: String,
      sensorName: String = "iis3dwb_acc",
      windowNs: Long = 1000000000L,
      completeness: Double = 0.999): Option[Result] = {
    // completeness gate — soft exit like the reference (`main.py:43-47`)
    if (!Ingest.isComplete(spark, acqDir)) return None
    val meta = Ingest.readMeta(spark, acqDir)
    val cfg = meta.device.components(sensorName)
    val decoded = Ingest.decodeDat(spark, s"$acqDir/$sensorName.dat", cfg)
    val enriched = Ingest.enrich(decoded, meta.info.startTime, meta.device.alias)
    PartitionedSink.write(enriched, s"$outDir/data_parquet")

    val axes = decoded.columns.filter(_ != "Time").map(Sanitize.column).toSeq
    val rms = Rms.compute(enriched, axes, windowNs, completeness,
      alias = meta.device.alias)
    // empty-result guard (reference `main.py:154-156`)
    val rmsOut =
      if (rms.isEmpty) {
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"no complete ${windowNs / 1e9}s windows in $acqDir; skipping RMS sink")
        None
      } else {
        PartitionedSink.write(rms, s"$outDir/data_parquet_rms")
        Some(rms)
      }
    Some(Result(enriched, rmsOut))
  }

  /** Process every complete acquisition under a landing prefix —
    * the reference's per-event fan-out (≤6 function instances)
    * becomes cluster-parallel decode within each acquisition. */
  def processLanding(spark: SparkSession, landingDir: String, outDir: String): Int =
    Ingest.completeAcquisitions(spark, landingDir)
      .flatMap(processAcquisition(spark, _, outDir))
      .size
}
