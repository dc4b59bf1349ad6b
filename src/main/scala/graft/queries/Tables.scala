package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared testdata loader for every query file, owning the time-axis
  * contract: `events.ts` is exposed to the engine as BIGINT
  * epoch-nanoseconds — the reference's native time representation
  * (`main.py:100-102`) — REGARDLESS of how the parquet stores it.
  *
  * The driver has shipped the column as both parquet TIMESTAMP(NANOS)
  * (which Spark 4 reads as LongType ns under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP_MICROS
  * NTZ (plain `timestamp[us]`). Each query hard-codes ns arithmetic
  * (`ts div 3600000000000`, `ts div 1000`), so adapting once at load
  * time — instead of per consumption site — keeps all 40+ time-series
  * queries schema-agnostic. The DuckDB oracles use `epoch_ns(ts)` /
  * `epoch_us(ts)`, which DuckDB resolves for any timestamp precision,
  * so only this side needs the shim.
  *
  * Overflow note (ANSI mode): epoch-µs × 1000 stays far below 2⁶³
  * for any date before year ~2262, the same bound the ns axis itself
  * imposes.
  */
object Tables {

  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") withTsAsEpochNs(df) else df
  }

  /** Rewrites a `ts` column to BIGINT epoch-ns whatever its physical
    * type. NTZ wall time is interpreted as UTC — the sessions pin
    * `spark.sql.session.timeZone=UTC` (graft.Sessions), making the
    * NTZ→instant cast value-preserving.
    *
    * An unrecognized `ts` type FAILS FAST: every downstream query
    * hard-codes ns arithmetic, so silently passing through (say) an
    * INT96 or string column would produce wrong results instead of an
    * error the next time the driver flips the physical format. */
  def withTsAsEpochNs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType)         => df // TIMESTAMP(NANOS) via nanosAsLong
      case Some(TimestampNTZType) =>
        df.withColumn("ts", microsToNs(unix_micros(col("ts").cast(TimestampType))))
      case Some(TimestampType)    =>
        df.withColumn("ts", microsToNs(unix_micros(col("ts"))))
      case Some(other)            =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — extend " +
            "Tables.withTsAsEpochNs for the new format (queries assume " +
            "BIGINT epoch-ns)")
      case None                   => df // no ts column: nothing to adapt
    }

  private def microsToNs(us: Column): Column = us * lit(1000L)
}
