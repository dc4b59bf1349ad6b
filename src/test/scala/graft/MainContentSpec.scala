package graft

import graft.functions.MainContent.{extractStr, mainContent}
import org.apache.spark.sql.functions._

/** MainContent link-density boilerplate removal: keep-rule edge
  * cases, structural robustness, codegen path. */
class MainContentSpec extends SparkSpec {

  test("navigation drops, content survives, footer drops") {
    val html =
      """<body><div><a href="/">home</a> <a href="/x">about</a> """ +
        """<a href="/y">contact us</a></div>""" +
        """<p>real content with a <a href="/r">reference</a> inside</p>""" +
        """<div>(c) 2024</div></body>"""
    assert(extractStr(html) == "real content with a reference inside")
  }

  test("word floor: 3 words keep, 2 words drop") {
    assert(extractStr("<p>one two three</p>") == "one two three")
    assert(extractStr("<p>one two</p>") == "")
    assert(extractStr("<p>one two three</p><p>a b</p>") == "one two three")
  }

  test("density boundary: 2*link == text keeps (<=), one more drops") {
    // "link text" inside <a>: 8 link chars of 16 total → 2*8 == 16 keep
    assert(extractStr("<p><a>linktext</a> also text</p>") ==
      "linktext also text")
    // 9 of 17 → 18 > 17 drop
    assert(extractStr("<p><a>linktexts</a> also text</p>") == "")
  }

  test("per-block accounting is independent; link lists die block by block") {
    val html = "<ul><li><a>s0</a></li><li><a>s1</a></li></ul>" +
      "<p>surviving paragraph text</p>"
    assert(extractStr(html) == "surviving paragraph text")
  }

  test("unbalanced and self-closed anchors never corrupt the counter") {
    assert(extractStr("</a><p>plain words here</p>") == "plain words here")
    assert(extractStr("<a/><p>plain words here</p>") == "plain words here")
    // unclosed <a> makes everything link text → nav-like drop
    assert(extractStr("<p><a>all of this is link</a text</p>") == "")
    // whitespace inside the anchor doesn't count as link chars
    assert(extractStr("<p><a>a b</a> c d e f g h</p>") == "a b c d e f g h")
  }

  test("inherits HtmlToText element semantics (script/entities/comments)") {
    val html = """<script>nav("<a>")</script><p>alpha &amp; beta gamma</p>""" +
      """<!-- <p>x</p> -->"""
    assert(extractStr(html) == "alpha & beta gamma")
  }

  test("kernel runs inside whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(2).select($"id",
      when($"id" === 0, "<p>alpha beta gamma</p>")
        .otherwise("<div><a>x</a> <a>y</a> <a>z q</a></div>").as("html"))
    val out = df.select($"id", mainContent($"html").as("t"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("main_content"), s"plan:\n$plan")
    assert(plan.contains("*(1) Project"), s"kernel fell out of codegen:\n$plan")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "alpha beta gamma")
    assert(rows(1).getString(1) == "")
  }
}
