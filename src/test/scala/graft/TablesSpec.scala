package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables

/** Locks the events.ts time-axis contract (Tables.withTsAsEpochNs):
  * every physical type the driver has shipped — and every one it
  * could plausibly flip to next — must surface as the SAME BIGINT
  * epoch-ns values, and an unknown type must fail fast instead of
  * feeding non-ns numbers into the queries' hard-coded ns arithmetic.
  * This is the regression net for the round-8 breakage (driver
  * switched TIMESTAMP(NANOS) → timestamp[us] NTZ and 26 queries went
  * red before the shim existed). */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one instant, exactly representable at µs precision so ns/µs/NTZ
  // encodings agree: 2024-03-05T06:07:08.123456Z
  private val micros = 1709618828123456L
  private val nanos = micros * 1000L

  private def writeAndLoad(write: String => Unit): Long = {
    val dir = Files.createTempDirectory("graft_tables_spec").toString + "/events.parquet"
    write(dir)
    val out = Tables.withTsAsEpochNs(spark.read.parquet(dir))
    assert(out.schema("ts").dataType == LongType,
      s"expected BIGINT ts, got ${out.schema("ts").dataType}")
    out.select(col("ts")).head().getLong(0)
  }

  test("long ns (TIMESTAMP(NANOS) read via nanosAsLong) passes through") {
    val got = writeAndLoad { dir =>
      Seq(nanos).toDF("ts").write.parquet(dir)
    }
    assert(got == nanos)
  }

  test("timestamp[us] NTZ converts to the identical epoch-ns") {
    val got = writeAndLoad { dir =>
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.parquet(dir)
    }
    assert(got == nanos)
  }

  test("timestamp[us] TZ converts to the identical epoch-ns") {
    val got = writeAndLoad { dir =>
      Seq(micros).toDF("us")
        .select(timestamp_micros(col("us")).as("ts"))
        .write.parquet(dir)
    }
    assert(got == nanos)
  }

  test("unsupported ts type fails fast with a clear message") {
    val ex = intercept[IllegalStateException] {
      Tables.withTsAsEpochNs(Seq("2024-01-01").toDF("ts"))
    }
    assert(ex.getMessage.contains("events.ts"))
    assert(ex.getMessage.contains("StringType"))
  }

  test("frame without a ts column is untouched") {
    val df = Seq((1L, "x")).toDF("id", "payload")
    assert(Tables.withTsAsEpochNs(df).collect().toSeq ==
      df.collect().toSeq)
  }
}
