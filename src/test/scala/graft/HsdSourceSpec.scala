package graft

import org.apache.spark.sql.functions._

import graft.fixtures.AcquisitionFixture
import graft.ingest.Ingest

/** DataSource V2 `hsd` format: correctness vs the mapPartitions
  * decode, column pruning, and Time-range pushdown. */
class HsdSourceSpec extends SparkSpec {

  private lazy val acq: String = {
    val d = tmpDir("hsd_src")
    AcquisitionFixture.write(s"$d/a", AcquisitionFixture.Spec())
    s"$d/a"
  }

  test("format(hsd) equals Ingest.decodeDat") {
    val viaSource = spark.read.format("hsd").load(acq)
    val meta = Ingest.readMeta(spark, acq)
    val viaMap = Ingest.decodeDat(spark, s"$acq/iis3dwb_acc.dat",
      meta.device.components("iis3dwb_acc"))
    assert(viaSource.schema == viaMap.schema)
    assert(viaSource.count() == viaMap.count())
    assert(viaSource.exceptAll(viaMap).isEmpty && viaMap.exceptAll(viaSource).isEmpty)
  }

  test("column pruning reaches the scan (ReadSchema shrinks)") {
    val df = spark.read.format("hsd").load(acq).select("Time")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("ReadSchema=Time"), s"plan:\n$scanDesc")
    // values still correct under pruning
    val n = df.where(col("Time") > 0).count()
    assert(n == df.count())
  }

  test("Time-range pushdown: block skip + exact residual") {
    val full = spark.read.format("hsd").load(acq)
    val lo = 1.0
    val hi = 2.0
    val ranged = full.where(col("Time") >= lo && col("Time") < hi)
    val desc = ranged.queryExecution.executedPlan.toString
    assert(desc.contains("PushedTimeRange"), s"plan:\n$desc")
    // equality against the unpushed computation
    val expect = full.collect().map(_.getDouble(0)).count(t => t >= lo && t < hi)
    assert(ranged.count() == expect)
    // boundary exactness: residual filter keeps sample granularity
    assert(ranged.agg(min("Time")).head().getDouble(0) >= lo)
    assert(ranged.agg(max("Time")).head().getDouble(0) < hi)
  }

  test("limit pushdown caps per-partition decode") {
    val df = spark.read.format("hsd").load(acq).limit(7)
    assert(df.count() == 7)
    assert(df.collect().length == 7)
  }

  test("float32 sensor decodes through format(hsd) with pruning+pushdown") {
    val d = tmpDir("hsd_f32")
    AcquisitionFixture.write(s"$d/a",
      AcquisitionFixture.Spec(seconds = 1.5, dataType = "float32"))
    val src = spark.read.format("hsd").load(s"$d/a")
    val meta = Ingest.readMeta(spark, s"$d/a")
    assert(meta.device.components("iis3dwb_acc").dataType == "float32")
    val viaMap = Ingest.decodeDat(spark, s"$d/a/iis3dwb_acc.dat",
      meta.device.components("iis3dwb_acc"))
    assert(src.schema == viaMap.schema)
    assert(src.exceptAll(viaMap).isEmpty && viaMap.exceptAll(src).isEmpty)
    // x axis round-trips to ~1 g through float32 raw + sensitivity
    val x = src.select("A_x [g]").head().getDouble(0)
    assert(math.abs(x - 1.0) < 1e-4, s"x=$x")
    // pruning + pushdown still engage on the non-int16 path
    val ranged = src.where(col("Time") >= 0.5 && col("Time") < 1.0).select("Time")
    val desc = ranged.queryExecution.executedPlan.toString
    assert(desc.contains("PushedTimeRange") && desc.contains("ReadSchema=Time"))
    val expect = src.collect().map(_.getDouble(0)).count(t => t >= 0.5 && t < 1.0)
    assert(ranged.count() == expect)
  }

  test("sensor option + missing component fails fast at planning") {
    val e = intercept[Exception] {
      spark.read.format("hsd").option("sensor", "nope").load(acq).schema
    }
    assert(e.getMessage.contains("nope"))
  }
}
