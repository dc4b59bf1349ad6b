package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.decode.Hsd2
import graft.ingest.Ingest
import graft.model.ComponentConfig

/** DataSource V2 `hsd` format: `spark.read.format("hsd").load(acqDir)`
  * scans an HSDatalog2 acquisition folder as a DataFrame.
  *
  * The scan is a first-class Spark source (SURVEY.md §4.1's optional
  * DSv2 path) rather than the mapPartitions decode in `Ingest`:
  *
  *  - **schema from config, not data**: planning parses
  *    device_config.json (the reference's config-driven decode,
  *    `main.py:74-81`);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *    projection of `Time` alone skips the int16→double work for
  *    every axis — the per-sample loop touches only requested fields;
  *  - **Time-range filter pushdown** (`SupportsPushDownFilters`):
  *    block timestamps are monotone, so whole block ranges are
  *    skipped BEFORE sample decode; filters are also kept as
  *    residuals so Spark re-applies them exactly at sample
  *    granularity;
  *  - **block-aligned splits** with the same anchor-chaining as
  *    `Ingest.decodeDat`; rows emitted as reused `UnsafeRow`s.
  *
  * Options: `sensor` (default iis3dwb_acc), `blocksPerSplit`
  * (default 1000).
  */
class HsdDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "hsd"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, cfg) = HsdDataSource.resolve(options)
    HsdDataSource.fullSchema(cfg)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (dir, cfg) = HsdDataSource.resolve(options)
    HsdTable(dir, cfg, schema)
  }
}

object HsdDataSource {

  def fullSchema(cfg: ComponentConfig): StructType = StructType(
    StructField("Time", DoubleType, nullable = false) +:
      Hsd2.rawColumnNames(cfg).map(StructField(_, DoubleType, nullable = false)))

  /** Resolve (acquisition dir, component config) at planning time. */
  def resolve(options: CaseInsensitiveStringMap): (String, ComponentConfig) = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("hsd source requires a path"))
    val sensor = Option(options.get("sensor")).getOrElse("iis3dwb_acc")
    val spark = SparkSession.active
    val meta = Ingest.readMeta(spark, dir)
    val cfg = meta.device.components.getOrElse(sensor,
      throw new IllegalArgumentException(s"component $sensor not in device_config"))
    Hsd2.rawReader(cfg.dataType) // fail fast at planning on unknown dtypes
    (dir, cfg)
  }
}

case class HsdTable(dir: String, cfg: ComponentConfig, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"hsd:$dir"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    HsdScanBuilder(dir, cfg,
      Option(options.get("blocksPerSplit")).map(_.toInt).getOrElse(1000))
}

case class HsdScanBuilder(dir: String, cfg: ComponentConfig, blocksPerSplit: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {

  private var requiredSchema: StructType = HsdDataSource.fullSchema(cfg)
  private var timeRange: (Double, Double) = (Double.NegativeInfinity, Double.PositiveInfinity)
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = Int.MaxValue

  override def pushLimit(l: Int): Boolean = {
    // per-partition cap; Spark still applies the global limit above
    limit = l
    true
  }

  override def pruneColumns(required: StructType): Unit = {
    // preserve source column order; empty projection (count(*)) keeps
    // zero fields and the reader emits empty rows
    val keep = required.fieldNames.toSet
    requiredSchema = StructType(
      HsdDataSource.fullSchema(cfg).fields.filter(f => keep.contains(f.name)))
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def tighten(f: Filter): Boolean = f match {
      case GreaterThan("Time", v: Number) =>
        timeRange = (math.max(timeRange._1, v.doubleValue()), timeRange._2); true
      case GreaterThanOrEqual("Time", v: Number) =>
        timeRange = (math.max(timeRange._1, v.doubleValue()), timeRange._2); true
      case LessThan("Time", v: Number) =>
        timeRange = (timeRange._1, math.min(timeRange._2, v.doubleValue())); true
      case LessThanOrEqual("Time", v: Number) =>
        timeRange = (timeRange._1, math.min(timeRange._2, v.doubleValue())); true
      case And(l, r) => tighten(l) & tighten(r)
      case _ => false
    }
    pushed = filters.filter(tighten)
    // everything stays a residual: the block skip is coarse (block
    // granularity); Spark re-applies the exact per-sample predicate
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = HsdScan(dir, cfg, requiredSchema, timeRange, blocksPerSplit, limit)
}

case class HsdScan(
    dir: String,
    cfg: ComponentConfig,
    projectedSchema: StructType,
    timeRange: (Double, Double),
    blocksPerSplit: Int,
    limit: Int = Int.MaxValue) extends Scan with Batch {

  override def readSchema(): StructType = projectedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"HsdScan sensor=${cfg.name} ReadSchema=${projectedSchema.fieldNames.mkString(",")}" +
      (if (timeRange._1.isNegInfinity && timeRange._2.isPosInfinity) ""
       else s" PushedTimeRange=[${timeRange._1},${timeRange._2}]")

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val path = new Path(s"$dir/${cfg.name}.dat")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(path).getLen
    val totalBlocks = Hsd2.completeBlocks(len, cfg)
    (0L until totalBlocks by blocksPerSplit.toLong).map { s =>
      HsdInputPartition(s, math.min(blocksPerSplit.toLong, totalBlocks - s).toInt)
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    HsdReaderFactory(
      s"$dir/${cfg.name}.dat", cfg,
      projectedSchema.fieldNames,
      timeRange,
      limit,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
  }
}

case class HsdInputPartition(firstBlock: Long, nBlocks: Int) extends InputPartition

case class HsdReaderFactory(
    datPath: String,
    cfg: ComponentConfig,
    columns: Array[String],
    timeRange: (Double, Double),
    limit: Int,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HsdInputPartition]
    new HsdPartitionReader(datPath, cfg, columns, timeRange, limit, conf,
      p.firstBlock, p.nBlocks)
  }

  /** Vectorized path: the scan emits ColumnarBatch (like the built-in
    * parquet reader), so downstream whole-stage codegen consumes
    * column vectors instead of one row at a time. */
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[HsdInputPartition]
    new HsdColumnarReader(datPath, cfg, columns, timeRange, limit, conf,
      p.firstBlock, p.nBlocks)
  }
}

/** Columnar reader: decodes straight into OnHeapColumnVectors in
  * batches of up to 4096 samples. Reuses the row reader's cursor
  * logic (anchor chain, block skip, projection). */
class HsdColumnarReader(
    datPath: String,
    cfg: ComponentConfig,
    columns: Array[String],
    timeRange: (Double, Double),
    limit: Int,
    conf: SerializableConfiguration,
    firstBlock: Long,
    nBlocks: Int)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val BatchSize = 4096
  private val rows = new HsdPartitionReader(
    datPath, cfg, columns, timeRange, limit, conf, firstBlock, nBlocks)
  private val schema = StructType(columns.map(StructField(_, DoubleType, nullable = false)))
  private val vectors = OnHeapColumnVector.allocateColumns(BatchSize, schema)
  private val batch = new ColumnarBatch(vectors.map(v =>
    v: org.apache.spark.sql.vectorized.ColumnVector))

  override def next(): Boolean = {
    var n = 0
    vectors.foreach(_.reset())
    while (n < BatchSize && rows.next()) {
      val row = rows.get()
      var f = 0
      while (f < columns.length) {
        vectors(f).putDouble(n, row.getDouble(f))
        f += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    rows.close()
    batch.close()
  }
}

/** Per-partition reader: seeks to its block range, chains the
  * interpolation anchor, skips blocks outside the pushed Time range,
  * and writes only the projected columns into a reused UnsafeRow. */
class HsdPartitionReader(
    datPath: String,
    cfg: ComponentConfig,
    columns: Array[String],
    timeRange: (Double, Double),
    limit: Int,
    conf: SerializableConfiguration,
    firstBlock: Long,
    nBlocks: Int) extends PartitionReader[InternalRow] {

  private var emitted = 0

  private val allNames = "Time" +: Hsd2.rawColumnNames(cfg)
  // projected field -> source index (0 = Time, 1.. = axes)
  private val proj: Array[Int] = columns.map(allNames.indexOf)
  private val writer = new UnsafeRowWriter(proj.length)
  // dtype dispatch resolved once per task (same table as the batch
  // decode — Hsd2.rawReader — so the DSv2 path supports every dtype)
  private val readRaw = Hsd2.rawReader(cfg.dataType)

  private val blockBytes = cfg.blockBytes
  private val spts = cfg.samplesPerTs
  private val dim = cfg.dim

  private var bb: ByteBuffer = _
  private var block = 0
  private var i = 0
  private var t0 = 0.0
  private var t1 = 0.0
  private var current: InternalRow = _

  private def open(): Unit = {
    val path = new Path(datPath)
    val fs = path.getFileSystem(conf.value)
    val in = fs.open(path)
    try {
      val start = firstBlock * blockBytes
      t0 =
        if (firstBlock == 0L) cfg.ioffset
        else {
          val tsBuf = new Array[Byte](8)
          in.readFully(start - 8, tsBuf, 0, 8)
          ByteBuffer.wrap(tsBuf).order(ByteOrder.LITTLE_ENDIAN).getDouble
        }
      val buf = new Array[Byte](nBlocks * blockBytes)
      in.readFully(start, buf, 0, buf.length)
      bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    } finally in.close()
    loadBlockTs()
  }

  private def loadBlockTs(): Unit =
    if (block < nBlocks)
      t1 = bb.getDouble(block * blockBytes + spts * dim * cfg.bytesPerSample)

  /** Skip whole blocks that cannot intersect the pushed range:
    * block samples lie in (t0, t1]. */
  private def skipNonMatchingBlocks(): Unit = {
    while (block < nBlocks && (t1 < timeRange._1 || t0 > timeRange._2)) {
      t0 = t1
      block += 1
      i = 0
      loadBlockTs()
    }
  }

  override def next(): Boolean = {
    if (emitted >= limit) return false
    if (bb == null) open()
    skipNonMatchingBlocks()
    if (block >= nBlocks) return false
    emitted += 1
    val base = block * blockBytes + (i * dim) * cfg.bytesPerSample
    // same convention as Hsd2.decodeBlocks: final sample exactly on t1
    val t =
      if (i == spts - 1) t1
      else t0 + (i + 1).toDouble * (t1 - t0) / spts.toDouble
    writer.reset()
    var f = 0
    while (f < proj.length) {
      val src = proj(f)
      if (src == 0) writer.write(f, t)
      else writer.write(f,
        readRaw(bb, base + (src - 1) * cfg.bytesPerSample) * cfg.sensitivity)
      f += 1
    }
    current = writer.getRow
    i += 1
    if (i == spts) { t0 = t1; i = 0; block += 1; loadBlockTs() }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = { bb = null }
}
