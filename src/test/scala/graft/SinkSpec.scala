package graft

import org.apache.spark.sql.functions._

import graft.fixtures.AcquisitionFixture
import graft.ingest.Pipeline

/** Physical-layer contract of the partitioned sink (reference O11/O12):
  * partition pruning reaches the scan, and the parquet encodings match
  * the reference's pins. */
class SinkSpec extends SparkSpec {

  private lazy val (acqDir: String, out: String) = {
    val acq = tmpDir("sink_acq")
    val o = tmpDir("sink_out")
    AcquisitionFixture.write(s"$acq/a", AcquisitionFixture.Spec())
    Pipeline.processAcquisition(spark, s"$acq/a", o)
    (s"$acq/a", o)
  }

  test("partition pruning: alias/year/month/day filters prune at planning time") {
    val df = spark.read.parquet(s"$out/data_parquet")
      .where(col("alias") === "LAF1" && col("year") === 2025 &&
        col("month") === 7 && col("day") === 11)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters"),
      s"expected partition filters in scan:\n$physical")
    // a non-matching partition predicate must read zero files/rows
    val none = spark.read.parquet(s"$out/data_parquet")
      .where(col("year") === 1999)
    assert(none.count() == 0)
    assert(df.count() > 0)
  }

  test("filesPerDir bound holds on both sink paths: shuffle-free under it, salted above it") {
    import graft.sink.PartitionedSink
    import spark.implicits._
    val base = java.time.Instant.parse("2025-07-11T10:00:00Z")
      .getEpochSecond * 1000000000L
    def fixture(nPart: Int) = (0 until 40000).map { i =>
      (base + i.toLong * 1000000L, i.toDouble)
    }.toDF("Time", "v").withColumn("alias", lit("LAF1")).repartition(nPart)
    def filesIn(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
    }
    // 8 input partitions, cap 32: bound holds WITHOUT the salt
    // shuffle — at most one file per task per directory
    val o1 = tmpDir("sink_direct")
    val small = fixture(8)
    PartitionedSink.write(small, s"$o1/t", filesPerDir = 32)
    assert(filesIn(s"$o1/t").length <= 8)
    assert(spark.read.parquet(s"$o1/t").count() == 40000)
    // 64 input partitions, cap 32: the salt repartition engages and
    // pins the per-directory file count at the cap
    val o2 = tmpDir("sink_salted")
    PartitionedSink.write(fixture(64), s"$o2/t", filesPerDir = 32)
    assert(filesIn(s"$o2/t").length <= 32)
    assert(spark.read.parquet(s"$o2/t").count() == 40000)
  }

  test("parquet physical format: delta-packed Time, no data-column dictionary") {
    import scala.jdk.CollectionConverters._
    val file = new java.io.File(s"$out/data_parquet/alias=LAF1/year=2025/month=7/day=11")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val time = cols.find(_.getPath.toDotString == "Time").get
      assert(time.getEncodings.asScala.exists(_.name == "DELTA_BINARY_PACKED"),
        s"Time encodings: ${time.getEncodings}")
      assert(time.getCodec.name == "SNAPPY")
      // dictionary disabled for data columns (reference pins dict only
      // on alias, which is a partition key here — not a data column)
      cols.foreach { c =>
        assert(!c.getEncodings.asScala.exists(_.name.contains("DICTIONARY")),
          s"${c.getPath}: ${c.getEncodings}")
      }
    } finally reader.close()
  }

  test("deterministic file names: reference-style prefix, stable across re-runs") {
    def names(sub: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$out/$sub"))
        .map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val first = names("data_parquet")
    // reference naming (main.py:124-131): sensor + acquisition start
    // (fixture Spec starts 2025-07-11T16:22:17Z), zero-padded index
    assert(first.nonEmpty)
    assert(first.forall(_.matches("iis3dwb_acc_20250711_162217_\\d{5}\\.parquet")),
      s"unexpected names: $first")
    val rms = names("data_parquet_rms")
    assert(rms.nonEmpty &&
      rms.forall(_.matches("iis3dwb_acc_20250711_162217_rms_\\d{5}\\.parquet")),
      s"unexpected rms names: $rms")
    // idempotent re-run (dynamic overwrite + rename): same name sets
    Pipeline.processAcquisition(spark, acqDir, out)
    assert(names("data_parquet") == first)
    assert(names("data_parquet_rms") == rms)
  }

  test("xsv export mode: CSV/TSV partitioned writes round-trip with deterministic names") {
    // the reference's convert_dat_to_xsv name promises a CSV/TSV
    // export surface (main.py:75-81 only ever invokes PARQUET);
    // format="CSV"/"TSV" closes it with the same layout/idempotency
    import graft.sink.PartitionedSink
    import spark.implicits._
    val base = java.time.Instant.parse("2025-07-11T16:22:17Z")
      .getEpochSecond * 1000000000L
    val df = (0 until 100).map { i =>
      (base + i.toLong * 1000000000L, i.toDouble / 8, i.toLong)
    }.toDF("Time", "A_x", "seq").withColumn("alias", lit("LAF1"))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val o = tmpDir("sink_xsv")
    PartitionedSink.write(df, s"$o/csv", filesPerDir = 4,
      filePrefix = Some("exp"), format = "csv")
    // hive layout + deterministic names carry the .csv extension
    val cfiles = walk(new java.io.File(s"$o/csv"))
      .filter(_.getName.endsWith(".csv"))
    assert(cfiles.nonEmpty &&
      cfiles.forall(_.getName.matches("exp_\\d{5}\\.csv")),
      s"names: ${cfiles.map(_.getName)}")
    assert(cfiles.exists(_.getPath.contains(
      "alias=LAF1/year=2025/month=7/day=11")))
    // values round-trip (header on, partition columns from the dirs)
    val back = spark.read.option("header", "true").csv(s"$o/csv")
    assert(back.count() == 100)
    val r7 = back.where(col("seq") === "7").collect()(0)
    assert(r7.getAs[String]("A_x") == "0.875" &&
      r7.getAs[String]("alias") == "LAF1")
    // idempotent re-run: same name set (dynamic overwrite + rename)
    val first = cfiles.map(_.getName).toSet
    PartitionedSink.write(df, s"$o/csv", filesPerDir = 4,
      filePrefix = Some("exp"), format = "csv")
    assert(walk(new java.io.File(s"$o/csv"))
      .map(_.getName).filter(_.endsWith(".csv")).toSet == first)
    // TSV: tab separator on disk, .tsv extension after the rename
    PartitionedSink.write(df, s"$o/tsv", filesPerDir = 4,
      filePrefix = Some("exp"), format = "TSV")
    val tfiles = walk(new java.io.File(s"$o/tsv"))
      .filter(_.getName.endsWith(".tsv"))
    assert(tfiles.nonEmpty && tfiles.forall(_.getName.matches("exp_\\d{5}\\.tsv")))
    val header = scala.io.Source.fromFile(tfiles.head).getLines().next()
    assert(header.split("\t").contains("Time"), s"header: $header")
    assert(spark.read.option("header", "true").option("sep", "\t")
      .csv(s"$o/tsv").count() == 100)
    // unknown formats reject
    intercept[IllegalArgumentException] {
      PartitionedSink.write(df, s"$o/x", format = "ORC")
    }
  }

  test("RMS sink honors the same physical format pins") {
    import scala.jdk.CollectionConverters._
    val file = new java.io.File(s"$out/data_parquet_rms/alias=LAF1/year=2025/month=7/day=11")
      .listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val time = cols.find(_.getPath.toDotString == "Time").get
      assert(time.getEncodings.asScala.exists(_.name == "DELTA_BINARY_PACKED"),
        s"Time encodings: ${time.getEncodings}")
      assert(time.getCodec.name == "SNAPPY")
      cols.foreach { c =>
        assert(!c.getEncodings.asScala.exists(_.name.contains("DICTIONARY")),
          s"${c.getPath}: ${c.getEncodings}")
      }
    } finally reader.close()
  }
}
