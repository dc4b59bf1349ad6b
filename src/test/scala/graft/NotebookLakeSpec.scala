package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.NotebookLake

/** nbformat-4 extraction through pure Catalyst: fixture-law
  * equality, invalid-blob and per-cell validity laws, forward-compat
  * unknown fields, JSON-escape round-trip. */
class NotebookLakeSpec extends SparkSpec {

  private def mediaDf(blobs: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map { case (i, b) => Row(i, b) }, 2),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))

  test("fixture laws: extract output matches the closed forms") {
    val out = NotebookLake.extractNotebooks(
      NotebookLake.notebookFixture(spark, 12), "id", "media")
      .orderBy("id", "cell").collect()
    assert(out.forall(_.getBoolean(7)))
    assert(out.length == (0 until 12).map(i => 3 + i % 4).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      val tpe = Seq("code", "markdown", "raw")(((i + k) % 3).toInt)
      assert(r.getString(2) == tpe)
      if (tpe == "code" && (i + k) % 4 != 1) assert(r.getInt(3) == k + 1)
      else assert(r.isNullAt(3), s"exec_count null ($i,$k)")
      val nl = 1 + (i + k) % 3
      assert(r.getInt(4) == nl)
      val src = (0L until nl)
        .map(j => s"c${i}_${k}_$j v${(i * 5 + k * 3 + j) % 10}")
        .mkString("\n")
      assert(r.getString(5) == src, s"source ($i,$k)")
      assert(r.getLong(6) == src.length)
    }
  }

  test("invalid blobs yield one valid=false row; bad kernel/nbformat too") {
    val good = NotebookLake.notebookFixture(spark, 1).collect()
      .head.getAs[Array[Byte]](1)
    val goodStr = new String(good, "UTF-8")
    val cases = Seq(
      "not JSON" -> "{ truncated".getBytes("UTF-8"),
      "nbformat 3" -> goodStr.replace("\"nbformat\": 4", "\"nbformat\": 3")
        .getBytes("UTF-8"),
      "no cells" -> goodStr.replace("\"cells\":", "\"cellz\":")
        .getBytes("UTF-8"),
      "r kernel" -> goodStr.replace("\"python3\"", "\"ir\"").getBytes("UTF-8"),
      "invalid utf8" -> Array(0xc3.toByte, 0x28.toByte))
    cases.foreach { case (name, blob) =>
      val rows = NotebookLake.extractNotebooks(
        mediaDf(Seq((7L, blob))), "id", "media").collect()
      assert(rows.length == 1, name)
      val r = rows.head
      assert(!r.getBoolean(7) && r.isNullAt(1) && r.isNullAt(2) &&
        r.isNullAt(4) && r.isNullAt(5), name)
    }
  }

  test("a cell of unknown type flags only its own row") {
    val json =
      """{"nbformat": 4, "nbformat_minor": 5,
        | "metadata": {"kernelspec": {"name": "python3"}},
        | "cells": [
        |  {"cell_type": "code", "execution_count": 1, "source": ["x = 1"]},
        |  {"cell_type": "magic", "source": ["?"]},
        |  {"cell_type": "raw", "source": ["ok"]}]}""".stripMargin
    val rows = NotebookLake.extractNotebooks(
      mediaDf(Seq((3L, json.getBytes("UTF-8")))), "id", "media")
      .orderBy("cell").collect()
    assert(rows.map(_.getBoolean(7)).toSeq == Seq(true, false, true))
    assert(rows(1).getString(2) == "magic") // data kept, row flagged
  }

  test("unknown JSON fields are forward-compatible noise") {
    val json =
      """{"nbformat": 4, "nbformat_minor": 5, "future_field": {"a": [1]},
        | "metadata": {"kernelspec": {"name": "python3"}, "authors": ["x"]},
        | "cells": [{"cell_type": "markdown", "source": ["# t"],
        |            "attachments": {"img": {"base64": "AA=="}}}]}"""
        .stripMargin
    val rows = NotebookLake.extractNotebooks(
      mediaDf(Seq((1L, json.getBytes("UTF-8")))), "id", "media").collect()
    assert(rows.length == 1 && rows.head.getBoolean(7))
    assert(rows.head.getString(5) == "# t")
  }

  test("plan is pure built-ins: no mapPartitions/UDF in the DAG") {
    val plan = NotebookLake.extractNotebooks(
      NotebookLake.notebookFixture(spark, 2), "id", "media")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("UDF") && !plan.contains("MapPartitions"), plan)
  }
}
