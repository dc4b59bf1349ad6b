package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTTP access-log parsing (Combined Log Format — the Apache/nginx
  * default; the format every ops corpus and web-analytics pipeline
  * starts from). Like [[NotebookLake]], deliberately PURE Catalyst:
  * split + posexplode + regexp_extract + try_to_timestamp, all
  * codegen built-ins, no custom parser — a line-oriented textual
  * format is exactly what the engine's native string machinery is
  * for, and the whole extraction stays inside one WholeStageCodegen
  * span per partition.
  *
  * Malformed lines yield valid=false rows with NULL fields (the
  * census a log-QA stage wants), never an error: the regexp gate
  * runs first and every downstream cast rides `nullif`/`try_` forms
  * so ANSI mode cannot throw on garbage. Timestamps are strict
  * `dd/MMM/yyyy:HH:mm:ss +ZZZZ` (English month names, RFC 822
  * offsets — both ends of the offset grammar exercised by the
  * fixture).
  */
object AccessLog {

  private val LineRe =
    "^(\\S+) \\S+ (\\S+) \\[([^\\]]+)\\] \"([A-Z]+) (\\S+) HTTP/[0-9.]+\" " +
      "(\\d{3}) (\\d+) \"([^\"]*)\" \"([^\"]*)\"$"

  /** Explode a log-media table into per-line rows. */
  def extractLogs(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    def grp(line: Column, g: Int): Column =
      nullif(regexp_extract(line, LineRe, g), lit(""))
    df.select(col(idCol).cast(LongType).as("id"),
        posexplode(split(col(binCol).cast(StringType), "\n")))
      .select(col("id"), col("pos").cast(IntegerType).as("line"),
        col("col").as("raw"))
      .select(col("id"), col("line"),
        grp(col("raw"), 1).as("ip"),
        try_to_timestamp(grp(col("raw"), 3),
          lit("dd/MMM/yyyy:HH:mm:ss Z")).cast(LongType).as("epoch"),
        grp(col("raw"), 4).as("method"),
        grp(col("raw"), 5).as("path"),
        grp(col("raw"), 6).cast(IntegerType).as("status"),
        grp(col("raw"), 7).cast(LongType).as("bytes"),
        grp(col("raw"), 9).as("ua"),
        col("raw").rlike(LineRe).as("matched"))
      .select(col("id"), col("line"), col("ip"), col("epoch"),
        col("method"), col("path"), col("status"), col("bytes"), col("ua"),
        (col("matched") && col("epoch").isNotNull).as("valid"))
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: blob i carries 4 + i%4 lines; every line with
    * (i+j) % 7 == 6 is planted junk (the valid=false path flows to
    * the oracle); timestamps render through the JDK's own formatter
    * over three offsets (+0000 / +0130 / -0800). */
  def logFixture(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("dd/MMM/yyyy:HH:mm:ss Z", java.util.Locale.US)
    val offsets = Seq(java.time.ZoneOffset.UTC,
      java.time.ZoneOffset.ofHoursMinutes(1, 30),
      java.time.ZoneOffset.ofHours(-8))
    val rows = (0 until n).map { i =>
      val nl = 4 + i % 4
      val lines = (0 until nl).map { j =>
        if ((i + j) % 7 == 6) s"### broken $i $j"
        else {
          val epoch = 1704067200L + i * 3600L + j * 60L + (i * 7 + j) % 50
          val ts = java.time.Instant.ofEpochSecond(epoch)
            .atOffset(offsets((i + j) % 3)).format(fmt)
          val m = Seq("GET", "POST", "HEAD")((i + j) % 3)
          val st = Seq(200, 301, 404, 500)((i + j) % 4)
          s"10.${i % 256}.$j.${(i * 7 + j) % 250} - - [$ts] " +
            s""""$m /p/$i/$j HTTP/1.1" $st ${(i * 97 + j * 13) % 5000} """ +
            s""""-" "ua/${i % 5}""""
        }
      }
      org.apache.spark.sql.Row(i.toLong, lines.mkString("\n").getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
