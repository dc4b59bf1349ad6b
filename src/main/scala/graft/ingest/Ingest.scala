package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}


import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.decode.Hsd2
import graft.model.{AcquisitionInfo, ComponentConfig, DeviceConfig, Sanitize}

/** Batch acquisition ingest: completeness gate → distributed decode →
  * enrichment (reference EP1+EP2, SURVEY.md §3).
  *
  * Scale design: the reference decodes one whole `.dat` in RAM per
  * 2 GB function instance (`main.py:50-85`). Here a `.dat` is split
  * into block-aligned byte ranges decoded in parallel across
  * executors — each task seeks into the file, reads the 8-byte
  * timestamp just before its range as the interpolation anchor, and
  * decodes only its slice. A 100 GB file becomes ~800 independent
  * 128 MB tasks with no driver materialization and no shuffle.
  */
object Ingest {

  val RequiredFiles: Set[String] =
    Set("acquisition_info.json", "device_config.json", "iis3dwb_acc.dat")

  /** Set-containment completeness gate (reference `main.py:16-26,
    * 43-47`): an acquisition dir qualifies iff every required basename
    * (lowercased) is present. Listing is driver-side control flow —
    * one RPC per dir, exactly like the reference's `list_blobs`. */
  def isComplete(spark: SparkSession, acqDir: String): Boolean = {
    val p = new Path(acqDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val names = fs.listStatus(p).map(_.getPath.getName.toLowerCase).toSet
    RequiredFiles.subsetOf(names)
  }

  /** All complete acquisition dirs under a landing prefix. */
  def completeAcquisitions(spark: SparkSession, landingDir: String): Seq[String] = {
    val p = new Path(landingDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.toString).toSeq
      .filter(isComplete(spark, _)).sorted
  }

  private def readSmallFile(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  final case class AcquisitionMeta(
      info: AcquisitionInfo,
      device: DeviceConfig,
      dir: String)

  def readMeta(spark: SparkSession, acqDir: String): AcquisitionMeta = {
    val p = new Path(acqDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AcquisitionMeta(
      AcquisitionInfo.fromJson(readSmallFile(fs, new Path(p, "acquisition_info.json"))),
      DeviceConfig.fromJson(readSmallFile(fs, new Path(p, "device_config.json"))),
      acqDir)
  }

  /** Distributed, splittable decode of one `.dat` file.
    *
    * Emits the reference decode's raw shape (FIXTURES.md §1.4):
    * `Time: double (relative s)` + one double column per axis with
    * the un-sanitized names (`A_x [g]`…).
    *
    * @param blocksPerSplit packets per task; default ≈3 MB of int16
    *   3-axis data per task at samples_per_ts=1000. The r10 default
    *   (1000 blocks ≈ 6 MB) yielded only 16 tasks on the 96 MB
    *   benchmark fixture — half a 32-core box idle through decode AND
    *   the parquet write that pipelines behind it, the largest single
    *   cost of the ingest path. 500 blocks ⇒ 32 tasks there, ~33k
    *   tasks for a 100 GB file (well inside scheduler comfort).
    */
  /** Number of decode tasks [[decodeDat]] creates for this file —
    * derived from the file length alone, so sink callers can declare
    * their input's partition count driver-side
    * (`PartitionedSink.write(inputPartitions = …)`) instead of
    * forcing physical-plan finalization via `df.rdd`. */
  def decodeSplitCount(
      spark: SparkSession,
      datPath: String,
      cfg: ComponentConfig,
      blocksPerSplit: Int = 500): Int = {
    val p = new Path(datPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBlocks = Hsd2.completeBlocks(fs.getFileStatus(p).getLen, cfg)
    math.max(1L,
      (totalBlocks + blocksPerSplit - 1) / blocksPerSplit).toInt
  }

  def decodeDat(
      spark: SparkSession,
      datPath: String,
      cfg: ComponentConfig,
      blocksPerSplit: Int = 500): DataFrame = {
    val p = new Path(datPath)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(hconf)
    val len = fs.getFileStatus(p).getLen
    val totalBlocks = Hsd2.completeBlocks(len, cfg)
    val splits: Seq[(Long, Int)] = // (firstBlock, nBlocks)
      (0L until totalBlocks by blocksPerSplit.toLong)
        .map(s => (s, math.min(blocksPerSplit.toLong, totalBlocks - s).toInt))

    val schema = StructType(
      StructField("Time", DoubleType, nullable = false) +:
        Hsd2.rawColumnNames(cfg).map(StructField(_, DoubleType, nullable = false)))

    val blockBytes = cfg.blockBytes
    val ioffset = cfg.ioffset
    // serializable copies for the task closure (Hadoop conf is not)
    val serConf = new org.apache.spark.util.SerializableConfiguration(hconf)
    val pathStr = datPath
    val cfgB = spark.sparkContext.broadcast(cfg)

    val nFields = 1 + cfg.dim
    val rows = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .mapPartitions { it =>
        val path = new Path(pathStr)
        val fsx = path.getFileSystem(serConf.value)
        val c = cfgB.value
        // UnsafeRow emitted directly (the fast path every built-in
        // source uses): no per-field Row→Catalyst conversion.
        // Downstream operators that buffer rows copy them — standard
        // source contract, so the writer/row is safely reused.
        val writer = new org.apache.spark.sql.catalyst.expressions.codegen
          .UnsafeRowWriter(nFields)
        writer.resetRowWriter()
        it.flatMap { case (firstBlock, nBlocks) =>
          val start = firstBlock * blockBytes
          val in = fsx.open(path)
          try {
            // anchor: ioffset for the file head, else the previous
            // block's embedded timestamp (8 bytes before our range)
            val anchor =
              if (firstBlock == 0L) ioffset
              else {
                val tsBuf = new Array[Byte](8)
                in.readFully(start - 8, tsBuf, 0, 8)
                ByteBuffer.wrap(tsBuf).order(ByteOrder.LITTLE_ENDIAN).getDouble
              }
            val buf = new Array[Byte](nBlocks * blockBytes)
            in.readFully(start, buf, 0, buf.length)
            // lazy row stream — never materializes the split's rows
            Hsd2.decodeBlocks(buf, c, nBlocks, anchor).map { s =>
              writer.reset()
              writer.write(0, s.time)
              var d = 0
              while (d < s.values.length) {
                writer.write(d + 1, s.values(d))
                d += 1
              }
              writer.getRow: org.apache.spark.sql.catalyst.InternalRow
            }
          } finally in.close()
        }
      }
    org.apache.spark.sql.graftshim.ColumnShim.internalCreateDataFrame(spark, rows, schema)
  }

  /** Enrichment (reference EP2, `main.py:87-103`): sanitize column
    * names, relative-seconds → absolute epoch-ns with HALF_EVEN
    * rounding (numpy `.round()` parity ⇒ `bround`, not `round`), and
    * the constant `alias` column. Narrow-only — no shuffle. */
  def enrich(decoded: DataFrame, startTime: java.time.Instant, alias: String): DataFrame = {
    val renamed = decoded.columns.foldLeft(decoded) { (df, c) =>
      val s = Sanitize.column(c)
      if (s == c) df else df.withColumnRenamed(c, s)
    }
    val startNs = AcquisitionInfo.epochNanos(startTime)
    renamed
      .withColumn("Time",
        bround(col("Time") * lit(1e9)).cast(LongType) + lit(startNs))
      .withColumn("alias", lit(alias))
  }

  /** Full single-acquisition conversion (gate → decode → enrich),
    * returning the enriched frame; the reference's EP1+EP2 minus the
    * sink. Returns None when the gate rejects (the reference's soft
    * exit, `main.py:43-47`). */
  def convertAcquisition(
      spark: SparkSession,
      acqDir: String,
      sensorName: String = "iis3dwb_acc"): Option[DataFrame] = {
    if (!isComplete(spark, acqDir)) return None
    val meta = readMeta(spark, acqDir)
    val cfg = meta.device.components.getOrElse(sensorName,
      throw new IllegalArgumentException(s"component $sensorName not in device_config"))
    val decoded = decodeDat(spark, s"$acqDir/$sensorName.dat", cfg)
    Some(enrich(decoded, meta.info.startTime, meta.device.alias))
  }
}
