package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hive-partitioned Parquet sink with the reference's physical-format
  * choices (reference O11+O12, `main.py:107-131`):
  *
  *  - layout `alias=…/year=…/month=…/day=…` — identical to the
  *    reference's hand-built path string, so downstream partition
  *    pruning on any of the four keys is free;
  *  - Snappy compression, Parquet data-page v2, dictionary encoding
  *    enabled only for `alias` (`main.py:112-118`: the reference pins
  *    DELTA_BINARY_PACKED on Time and dictionary only on alias; with
  *    page v2 + dictionary off, parquet-mr picks DELTA_BINARY_PACKED
  *    for int64 Time automatically — same bytes-on-disk encoding
  *    family without a custom OutputWriter);
  *  - idempotent re-runs via dynamic partition overwrite (the
  *    reference's deterministic object names, `main.py:124-131`).
  *
  * Partition values derive from the epoch-ns `Time` column in UTC.
  */
object PartitionedSink {

  def write(df: DataFrame, outDir: String, timeCol: String = "Time"): Unit = {
    val ts = timestamp_micros((col(timeCol) / lit(1000L)).cast("long"))
    df.withColumn("year", year(ts))
      .withColumn("month", month(ts))
      .withColumn("day", dayofmonth(ts))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .option("parquet.writer.version", "v2")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.enable.dictionary#alias", "true")
      .partitionBy("alias", "year", "month", "day")
      .parquet(outDir)
  }
}
