package graft

import graft.functions.UnicodeNorm.{nfc, normalizeStr}
import org.apache.spark.sql.functions._

/** UnicodeNorm kernels: form semantics, idempotence, dedup-key
  * convergence of equivalent spellings, and the codegen path. */
class UnicodeNormSpec extends SparkSpec {

  test("nfc composes; nfkc folds compatibility forms; strip drops marks only") {
    assert(normalizeStr("café", "nfc") == "café")
    assert(normalizeStr("café", "nfc") == "café") // idempotent input
    assert(normalizeStr("Å", "nfc") == "Å")
    assert(normalizeStr("ﬁne ①", "nfc") == "ﬁne ①") // NFC keeps ligatures
    assert(normalizeStr("ﬁne ①", "nfkc") == "fine 1")
    assert(normalizeStr("Ｆｗ　５", "nfkc") == "Fw 5")
    assert(normalizeStr("naïve Ñ", "strip") == "naive N")
    assert(normalizeStr("café", "strip") == "cafe")
    // ø ß æ have no combining marks — strip must NOT lump them
    assert(normalizeStr("ø ß æ 中", "strip") ==
      "ø ß æ 中")
    assert(normalizeStr("", "nfc") == "")
  }

  test("all three forms are idempotent") {
    val samples = Seq("café x", "ﬁ ① Ｆ", "Å",
      "naïve ø", "plain ascii")
    for (f <- Seq("nfc", "nfkc", "strip"); s <- samples) {
      val once = normalizeStr(s, f)
      assert(normalizeStr(once, f) == once, s"$f not idempotent on $s")
    }
  }

  test("equivalent spellings converge to one dedup key") {
    import spark.implicits._
    // the same word in decomposed and precomposed form must land in
    // ONE group after nfc — the operator's whole purpose
    val df = Seq((0L, "cafe\u0301"), (1L, "caf\u00e9"), (2L, "cafe"))
      .toDF("id", "w")
    val groups = df.groupBy(nfc($"w").as("k")).count()
      .orderBy("k").collect()
    assert(groups.length == 2)
    assert(groups.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("cafe", 1L), ("caf\u00e9", 2L)))
  }

  test("kernel runs inside whole-stage codegen; bad form rejects at analysis") {
    import spark.implicits._
    val df = spark.range(2).select($"id",
      concat(lit("cafe\u0301 "), $"id").as("s"))
    val out = df.select(nfc($"s").as("t"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("unicode_norm_nfc"), s"plan:\n$plan")
    assert(plan.contains("*(1) Project"), s"fell out of codegen:\n$plan")
    assert(out.orderBy("t").collect()(0).getString(0) == "caf\u00e9 0")
    val bad = intercept[Exception] {
      org.apache.spark.sql.graftshim.ColumnShim.column(
        graft.functions.UnicodeNorm(
          org.apache.spark.sql.graftshim.ColumnShim.expression($"s"),
          "nfq"))
      df.select(org.apache.spark.sql.graftshim.ColumnShim.column(
        graft.functions.UnicodeNorm(
          org.apache.spark.sql.graftshim.ColumnShim.expression($"s"),
          "nfq"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("nfq") ||
      bad.getMessage.toLowerCase.contains("unicode_norm"))
  }
}
