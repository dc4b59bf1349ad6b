package graft

import org.apache.spark.sql.functions._

import graft.functions.ShingleSet

class ShingleSetSpec extends SparkSpec {
  import spark.implicits._

  /** The HOF chain the kernel replaced — kept here as the reference
    * semantics (sorted distinct n-gram shingles of the single-space
    * word split). */
  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val words = split(text, " ")
    sort_array(when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>")))
  }

  test("kernel equals the HOF chain on edge-case strings") {
    val rows = Seq(
      "a b c d e",
      "a b",                        // fewer than n words
      "",                           // one empty word
      " ",                          // two empty words
      "a  b c",                     // empty middle word
      " leading and trailing ",
      "dup dup dup dup",            // duplicate shingles
      "a b c a b c a b c",
      "Ünïcödé wörds ünd mörę tökens",
      "tab\tis one word",
      "x " * 200 + "y"              // long input
    ).toDF("t")
    val got = rows.select(ShingleSet.shingleSet(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    val want = rows.select(hofShingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: kernel $g vs HOF $w")
    }
  }

  test("kernel equals the HOF chain on the documents table, n=2..4") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- 2 to 4) {
      val diff = docs.select(
          ShingleSet.shingleSet(col("text"), n).as("k"),
          hofShingles(col("text"), n).as("h"))
        .where(not(col("k") <=> col("h")))
        .count()
      assert(diff == 0, s"n=$n: $diff documents disagree")
    }
  }

  test("kernel stays inside whole-stage codegen") {
    val p = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(ShingleSet.shingleSet(col("text"), 3).as("s"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen stage marker in the compact
    // plan string — the kernel's Project must carry it
    assert(p.contains("*(1) Project [shingle_set"), s"plan:\n$p")
  }
}
