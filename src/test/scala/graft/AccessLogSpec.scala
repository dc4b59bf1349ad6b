package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.AccessLog

/** CLF parsing through pure Catalyst: fixture-law equality (incl.
  * the offset-parse law), malformed-line census, no-throw on
  * garbage bytes, pure-built-ins plan. */
class AccessLogSpec extends SparkSpec {

  private def mediaDf(blobs: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map { case (i, b) => Row(i, b) }, 2),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))

  test("fixture laws: extract output matches the closed forms") {
    val out = AccessLog.extractLogs(
      AccessLog.logFixture(spark, 14), "id", "media")
      .orderBy("id", "line").collect()
    assert(out.length == (0 until 14).map(i => 4 + i % 4).sum)
    out.foreach { r =>
      val (i, j) = (r.getLong(0), r.getInt(1))
      if ((i + j) % 7 == 6) {
        assert(!r.getBoolean(9) && r.isNullAt(2) && r.isNullAt(3), s"junk ($i,$j)")
      } else {
        assert(r.getBoolean(9), s"valid ($i,$j)")
        assert(r.getString(2) == s"10.${i % 256}.$j.${(i * 7 + j) % 250}")
        // the engine PARSED the offset-rendered timestamp back
        assert(r.getLong(3) ==
          1704067200L + i * 3600L + j * 60L + (i * 7 + j) % 50,
          s"epoch ($i,$j)")
        assert(r.getString(4) == Seq("GET", "POST", "HEAD")(((i + j) % 3).toInt))
        assert(r.getInt(6) == Seq(200, 301, 404, 500)(((i + j) % 4).toInt))
        assert(r.getLong(7) == (i * 97 + j * 13) % 5000)
        assert(r.getString(8) == s"ua/${i % 5}")
      }
    }
  }

  test("malformed variants census as invalid, never throw") {
    val lines = Seq(
      "not a log line at all",
      "1.2.3.4 - - [31/Feb/2024:10:00:00 +0000] \"GET /x HTTP/1.1\" 200 1 \"-\" \"u\"",
      "1.2.3.4 - - [01/Okt/2024:10:00:00 +0000] \"GET /x HTTP/1.1\" 200 1 \"-\" \"u\"",
      "1.2.3.4 - - [01/Jan/2024:10:00:00 +0000] \"GET /x HTTP/1.1\" 20 1 \"-\" \"u\"",
      "1.2.3.4 - - [01/Jan/2024:10:00:00 +0000] \"GET /x HTTP/1.1\" 200 - \"-\" \"u\"",
      "1.2.3.4 - - [01/Jan/2024:10:00:00 +0000] \"GET /x HTTP/1.1\" 200 1 \"-\" \"u\"")
    val rows = AccessLog.extractLogs(
      mediaDf(Seq((1L, lines.mkString("\n").getBytes("UTF-8")))),
      "id", "media").orderBy("line").collect()
    assert(rows.map(_.getBoolean(9)).toSeq ==
      Seq(false, false, false, false, false, true))
    // invalid UTF-8 bytes must not throw either
    val junk = AccessLog.extractLogs(
      mediaDf(Seq((2L, Array(0xc3.toByte, 0x28.toByte)))), "id", "media")
      .collect()
    assert(junk.forall(!_.getBoolean(9)))
  }

  test("plan is pure built-ins: no mapPartitions/UDF in the DAG") {
    val plan = AccessLog.extractLogs(
      AccessLog.logFixture(spark, 2), "id", "media")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("MapPartitions"), plan)
  }
}
