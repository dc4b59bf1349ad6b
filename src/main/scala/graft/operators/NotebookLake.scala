package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Jupyter notebook (.ipynb, nbformat 4) extraction — the code side
  * of a pretraining corpus. Deliberately the OPPOSITE architecture
  * from the byte-walk lakes: the format is JSON, so the extraction
  * is pure Catalyst — `from_json` with a typed schema, struct-field
  * projection and `posexplode_outer`, all whole-stage-codegen
  * built-ins with NO custom parser, no mapPartitions, no UDF. The
  * schema subset is the published nbformat 4 contract
  * (nbformat.readthedocs.io): top-level nbformat/metadata/cells,
  * cells with cell_type / execution_count / source-as-line-list.
  *
  * Validity is declarative too: a blob that fails JSON parse, has
  * nbformat ≠ 4, lacks a cells array, or names a non-python3 kernel
  * yields one valid=false row (posexplode_outer over a NULLed array);
  * a cell whose type is outside {code, markdown, raw} flags just its
  * own row. Unknown JSON fields are ignored by from_json — the
  * nbformat contract explicitly allows forward-compatible extras.
  */
object NotebookLake {

  private val cellSchema = StructType(Seq(
    StructField("cell_type", StringType, true),
    StructField("execution_count", IntegerType, true),
    StructField("source", ArrayType(StringType, true), true)))

  private val nbSchema = StructType(Seq(
    StructField("nbformat", IntegerType, true),
    StructField("nbformat_minor", IntegerType, true),
    StructField("metadata", StructType(Seq(
      StructField("kernelspec", StructType(Seq(
        StructField("name", StringType, true))), true))), true),
    StructField("cells", ArrayType(cellSchema, true), true)))

  /** Explode a notebook-media table into per-cell rows — pure
    * Catalyst, no custom code in the hot path. */
  def extractNotebooks(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    // binary→string CAST, not decode(): under ANSI mode decode()
    // throws on malformed UTF-8; the cast wraps bytes unvalidated and
    // from_json then rejects garbage to NULL → valid=false, the
    // codec-family no-throw law
    val nb: Column = from_json(col(binCol).cast(StringType), nbSchema)
    df.select(col(idCol).cast(LongType).as("id"), nb.as("nb"))
      .select(col("id"),
        (col("nb").isNotNull && col("nb.nbformat") === 4 &&
          col("nb.cells").isNotNull &&
          col("nb.metadata.kernelspec.name") === "python3").as("ok"),
        col("nb.cells").as("cells"))
      .select(col("id"), col("ok"),
        posexplode_outer(when(col("ok"), col("cells"))))
      .select(
        col("id"),
        col("pos").cast(IntegerType).as("cell"),
        col("col.cell_type").as("cell_type"),
        col("col.execution_count").as("exec_count"),
        size(col("col.source")).cast(IntegerType).as("n_lines"),
        array_join(col("col.source"), "").as("source"),
        length(array_join(col("col.source"), ""))
          .cast(LongType).as("n_chars"),
        (col("ok") && col("col.cell_type")
          .isin("code", "markdown", "raw")).as("valid"))
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Fixture: notebook i carries 3 + i%4 cells cycling code/markdown/
    * raw; code cells carry execution_count except every fourth
    * (null-int coverage); sources are 1-3 lines with the line-list
    * `\n` convention (trailing newline on all but the last). */
  def notebookFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nc = 3 + i % 4
      val cells = (0 until nc).map { k =>
        val tpe = Seq("code", "markdown", "raw")((i + k) % 3)
        val nl = 1 + (i + k) % 3
        val lines = (0 until nl).map { j =>
          val body = s"c${i}_${k}_$j v${(i * 5 + k * 3 + j) % 10}"
          if (j < nl - 1) body + "\n" else body
        }
        val src = lines.map(jstr).mkString("[", ", ", "]")
        val exec =
          if (tpe == "code")
            s""", "execution_count": ${
              if ((i + k) % 4 == 1) "null" else (k + 1).toString
            }, "outputs": []"""
          else ""
        s"""{"cell_type": ${jstr(tpe)}, "metadata": {}, "source": $src$exec}"""
      }.mkString("[", ", ", "]")
      val json =
        s"""{"nbformat": 4, "nbformat_minor": 5,
           | "metadata": {"kernelspec": {"name": "python3",
           |   "display_name": "Python 3"},
           |  "language_info": {"name": "python", "version": "3.11.0"}},
           | "cells": $cells}""".stripMargin
      Row(i.toLong, json.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
