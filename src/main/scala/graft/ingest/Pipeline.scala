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
    val bare = Ingest.enrich(decoded, meta.info.startTime, meta.device.alias)
    // labeled export (reference `labeled=` surface): acquisitions
    // carrying tag toggles in acquisition_info.json get one boolean
    // column per label — a pure projection, so the sink write is
    // otherwise unchanged
    val enriched =
      if (meta.info.tags.isEmpty) bare
      else graft.operators.Tagging.labelSamples(bare, meta.info.tags)
    // deterministic object names mirroring the reference
    // (`iis3dwb_acc_${yyyymmdd_HHMMSS}.parquet`, main.py:124-131):
    // sensor name + the acquisition's start timestamp (UTC)
    val prefix = sensorName + "_" +
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
        .withZone(java.time.ZoneOffset.UTC).format(meta.info.startTime)
    // declare the decode split count to the sink's shuffle-skip gate
    // (enrich/labelSamples are narrow, so the count survives to the
    // write) — avoids the df.rdd plan-finalization probe (ADVICE r11)
    PartitionedSink.write(enriched, s"$outDir/data_parquet",
      filePrefix = Some(prefix),
      renameScope = Seq(meta.device.alias),
      inputPartitions = Some(Ingest.decodeSplitCount(
        spark, s"$acqDir/$sensorName.dat", cfg)))

    // compute RMS from the parquet just written — decode runs ONCE;
    // the aggregate then reads the columnar sink (vectorized scan)
    // instead of re-decoding the .dat
    val axes = decoded.columns.filter(_ != "Time").map(Sanitize.column).toSeq
    // Scope to THIS acquisition's alias DIRECTORY, not the table root:
    // the root accumulates every device's acquisitions, and a
    // root-level read would (a) mix another device's same-window
    // samples into this RMS — wrong values whenever two devices
    // record concurrently — and (b) LIST and footer-read a sibling
    // pipeline's partition mid-rename (a post-filter partition-prunes
    // the scan but not schema-inference listing — observed as a
    // FileNotFoundException under concurrent processLanding). Reading
    // the alias subdirectory keeps sibling files out of the listing
    // entirely; basePath re-derives the alias partition column. At
    // table scale this also turns a whole-root listing per
    // acquisition into a single-partition one.
    val enrichedOnDisk = spark.read
      .option("basePath", s"$outDir/data_parquet")
      .parquet(s"$outDir/data_parquet/alias=${meta.device.alias}")
    // sensor physics bounds |v| at max raw code × sensitivity for
    // integer payloads — unlocks Rms.compute's long-sum fast path
    // (float payloads are unbounded → None keeps the decimal path)
    val maxAbs: Option[Double] = cfg.dataType match {
      case "int8" => Some(128.0 * cfg.sensitivity.abs)
      case "uint8" => Some(255.0 * cfg.sensitivity.abs)
      case "int16" => Some(32768.0 * cfg.sensitivity.abs)
      case "uint16" => Some(65535.0 * cfg.sensitivity.abs)
      case "int32" => Some(2147483648.0 * cfg.sensitivity.abs)
      case "uint32" => Some(4294967295.0 * cfg.sensitivity.abs)
      case _ => None
    }
    val rms = Rms.compute(enrichedOnDisk, axes, windowNs, completeness,
        alias = meta.device.alias, maxAbs = maxAbs)
      .persist() // 1 row/s/device — tiny; reused by the guard + sink
    // empty-result guard (reference `main.py:154-156`)
    val rmsOut =
      try {
        if (rms.isEmpty) {
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"no complete ${windowNs / 1e9}s windows in $acqDir; skipping RMS sink")
          None
        } else {
          PartitionedSink.write(rms, s"$outDir/data_parquet_rms",
            filePrefix = Some(prefix + "_rms"),
            renameScope = Seq(meta.device.alias))
          Some(rms)
        }
      } finally rms.unpersist()
    Some(Result(enriched, rmsOut))
  }

  /** Process every complete acquisition under a landing prefix.
    * Each acquisition's decode is cluster-parallel on its own; on top
    * of that, `parallelism` pipelines run concurrently (the
    * reference's ≤6 function instances, but sharing one cluster's
    * scheduler). Concurrent jobs in one SparkSession interleave
    * safely; two acquisitions landing in the SAME output partition
    * race on dynamic overwrite exactly like concurrent reference
    * instances did — last commit wins, idempotently. */
  def processLanding(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      parallelism: Int = 4): Int = {
    val dirs = Ingest.completeAcquisitions(spark, landingDir)
    if (dirs.isEmpty) return 0
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, dirs.size))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val done = Future.sequence(
        dirs.map(d => Future(processAcquisition(spark, d, outDir))))
      Await.result(done, Duration.Inf).flatten.size
    } finally pool.shutdown()
  }
}
