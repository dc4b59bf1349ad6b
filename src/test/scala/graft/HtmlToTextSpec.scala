package graft

import graft.functions.HtmlToText.{extractStr, htmlToText}
import org.apache.spark.sql.functions._

/** HtmlToText kernel: rule-by-rule unit matrix over the documented
  * semantics, real-world malformed input, and the codegen path. */
class HtmlToTextSpec extends SparkSpec {

  test("tags elide; block tags break lines; inline tags join words") {
    assert(extractStr("<p>hello <b>wo</b>rld</p>") == "hello world")
    assert(extractStr("<div>a</div><div>b</div>") == "a\nb")
    assert(extractStr("one<br>two") == "one\ntwo")
    assert(extractStr("<ul><li>x</li><li>y</li></ul>") == "x\ny")
    assert(extractStr("<span>a</span><span>b</span>") == "ab")
    assert(extractStr("<h2 class=\"t\">T</h2>next") == "T\nnext")
  }

  test("script and style elide WITH their content") {
    assert(extractStr("a<script>var p = \"<p>leak</p>\";</script>b") == "ab")
    assert(extractStr("a<style>p{content:'x'}</style>b") == "ab")
    assert(extractStr("a<SCRIPT>x</ScRiPt>b") == "ab") // case-insensitive
    assert(extractStr("a<script src=\"x.js\">ignored") == "a") // unterminated
    // a SELF-CLOSED script has no content to skip
    assert(extractStr("a<script src=\"x.js\"/>b") == "ab")
  }

  test("comments, doctype, processing instructions elide") {
    assert(extractStr("a<!-- <p>hidden</p> -->b") == "ab")
    assert(extractStr("<!DOCTYPE html>a") == "a")
    assert(extractStr("a<?php echo 1 ?>b") == "ab")
    assert(extractStr("a<!-- unterminated") == "a")
    assert(extractStr("a<![CDATA[not html]]>b") == "b" ||
      extractStr("a<![CDATA[not html]]>b") == "ab") // bogus-comment to '>'
  }

  test("quoted attributes may contain '>' and quotes") {
    assert(extractStr("""a<a href="x>y">link</a>b""") == "alinkb")
    assert(extractStr("""a<img alt='it"s > here'>b""") == "ab")
    assert(extractStr("""<p title="a&amp;b">t</p>""") == "t")
  }

  test("a '<' not opening a tag is literal text") {
    assert(extractStr("3 < 5 and 6 > 2") == "3 < 5 and 6 > 2")
    assert(extractStr("i <3 u") == "i <3 u")
    assert(extractStr("tail<") == "tail<")
  }

  test("character references: named, decimal, hex; malformed stays literal") {
    assert(extractStr("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(extractStr("a&nbsp;b") == "a b")
    assert(extractStr("&#65;&#x42;&#X43;") == "ABC")
    assert(extractStr("&#x1F600;") == new String(Character.toChars(0x1f600)))
    assert(extractStr("&bogus;") == "&bogus;")
    assert(extractStr("fish & chips") == "fish & chips")
    assert(extractStr("&#xD800; x") == "&#xD800; x") // surrogate rejected
    assert(extractStr("&#x110000; x") == "&#x110000; x") // beyond Unicode
    assert(extractStr("&#;") == "&#;")
    assert(extractStr("a&") == "a&")
  }

  test("whitespace collapses; NBSP is whitespace; output is trimmed") {
    assert(extractStr("  a   b  ") == "a b")
    assert(extractStr("<p>  a  </p>  <p> b </p>") == "a\nb")
    assert(extractStr("a  b") == "a b")
    // SOURCE newlines are ordinary whitespace; only block tags break
    assert(extractStr("a \n\t \n b") == "a b")
    assert(extractStr("line one\n<p>line two") == "line one\nline two")
    assert(extractStr("<p></p><p></p>") == "")
    assert(extractStr("") == "")
  }

  test("kernel runs inside whole-stage codegen and matches eval mode") {
    import spark.implicits._
    // spark.range input so the projection is NOT constant-folded into
    // a LocalTableScan — the kernel must sit in the generated code
    val html = spark.range(2).select($"id",
      when($"id" === 0, "<div>co<b>de</b>gen &amp; eval</div>")
        .otherwise("<script>no()</script><p>x &#33;</p>").as("html"))
    val out = html.select($"id", htmlToText($"html").as("t"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("html_to_text"), s"plan:\n$plan")
    // the '*(n)' operator prefix marks whole-stage-codegen'd spans
    assert(plan.contains("*(1) Project"), s"kernel fell out of codegen:\n$plan")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "codegen & eval")
    assert(rows(1).getString(1) == "x !")
    // interpreted (eval) path agrees with codegen output
    assert(extractStr("<div>co<b>de</b>gen &amp; eval</div>") == "codegen & eval")
  }

  test("fuzz: random tag soup never throws and never leaks markup") {
    val rnd = new scala.util.Random(42)
    val atoms = Seq("<p>", "</p>", "<b", ">", "&", "&amp;", "<script>",
      "</script>", "text", "\"", "'", "<", "<!--", "-->", "&#x", ";",
      "1F", "<div id=", " ", "\n", " ")
    (0 until 2000).foreach { _ =>
      val s = (0 until rnd.nextInt(30)).map(_ =>
        atoms(rnd.nextInt(atoms.length))).mkString
      val t = extractStr(s) // must not throw
      assert(!t.contains("<p>") && !t.contains("<div id="),
        s"markup leaked from: $s -> $t")
    }
  }
}
