package graft

import graft.operators.MarkdownLake

/** Markdown kernel laws: construct residues, front-matter grammar,
  * code/prose split, strictness matrix, fixture-law equality,
  * byte-flip sweep. */
class MarkdownLakeSpec extends SparkSpec {

  private def parse(s: String) = MarkdownLake.parseMd(s.getBytes("UTF-8"))
  private def text(s: String): Option[String] = parse(s).map(_.text)

  test("kernel: construct residues") {
    assert(text("plain words").contains("plain words"))
    assert(text("# H1\nbody").contains("H1 body"))
    assert(text("###### deep\nx").contains("deep x"))
    assert(text("**b** *i* `c*[de]`").contains("b i c*[de]"),
      "inline code is verbatim")
    assert(text("[label](http://e/x) tail").contains("label tail"))
    assert(text("![alt text](img.png)").contains("alt text"))
    assert(text("- li\n* li2\n3. li3\n> quoted").contains("li li2 li3 quoted"))
    assert(text("```\nhidden()\n```\nafter").contains("after"))
    val d = parse("---\ntitle: T\ndate: 2024-02-29\ntags: [a, b, c]\n" +
      "extra: ok\n---\n# H\n[l](u)\n```\nxy\n```\n").get
    assert(d.title.contains("T"))
    assert(d.dateEpoch.contains(19782L * 86400L)) // leap day
    assert(d.nTags.contains(3))
    assert((d.nHeadings, d.nLinks, d.nCodeBlocks, d.codeChars) == (1, 1, 1, 2L))
    val nofm = parse("just text").get
    assert(nofm.title.isEmpty && nofm.dateEpoch.isEmpty && nofm.nTags.isEmpty)
  }

  test("strictness matrix: every violation rejects") {
    val rejects = Seq(
      "unterminated front matter" -> "---\ntitle: T\nbody",
      "bad front-matter key" -> "---\nTitle: T\n---\nx",
      "duplicate front-matter key" -> "---\ntitle: a\ntitle: b\n---\nx",
      "bad date" -> "---\ndate: 2023-02-29\n---\nx",
      "date with time" -> "---\ndate: 2024-01-01T00:00:00\n---\nx",
      "tags not a flow list" -> "---\ntags: a, b\n---\nx",
      "empty tag" -> "---\ntags: [a, , b]\n---\nx",
      "unclosed fence" -> "```\ncode",
      "heading without space" -> "#title",
      "heading level 7" -> "####### t",
      "unclosed bold" -> "a **b",
      "unclosed italic" -> "a *b",
      "unclosed code span" -> "a `b",
      "link without url" -> "[label] tail",
      "link unclosed url" -> "[label](http://e",
      "stray close bracket" -> "a ] b",
      "invalid utf8" -> null)
    rejects.foreach {
      case (name, null) =>
        assert(MarkdownLake.parseMd(
          Array(0xc3.toByte, 0x28.toByte)).isEmpty, name)
      case (name, doc) => assert(parse(doc).isEmpty, name)
    }
    assert(MarkdownLake.parseMd(null).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = MarkdownLake.extractMarkdown(
      MarkdownLake.markdownFixture(spark, 12), "id", "media")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(11)))
    assert(out.length == 12)
    out.foreach { r =>
      val i = r.getLong(0)
      val ns = 1 + i % 3
      if (i % 4 != 3) {
        assert(r.getString(1) == s"Post $i and co")
        assert(r.getInt(3) == 2)
        val epoch = java.time.LocalDate
          .of(2024, (1 + i % 12).toInt, (1 + (i * 3) % 28).toInt)
          .toEpochDay * 86400L
        assert(r.getLong(2) == epoch)
      } else assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
      val want = (0L until ns).map { s =>
        def b(j: Long) = (i * 7 + s * 3 + j) % 10
        s"H$s k${(i + s) % 10} p${b(0)} p${b(1)} p${b(2)} p${b(3)} " +
          s"lk${(i + s) % 8} li${(i + s) % 10} q${(i + s) % 6}"
      }.mkString(" ")
      assert(r.getString(4) == want, s"text $i")
      assert(r.getLong(5) == ns * 9)
      assert(r.getInt(7) == ns && r.getInt(8) == ns)
      assert(r.getInt(9) == ((ns + 1) / 2).toInt)
      val wantCode = (0L until ns).filter(_ % 2 == 0)
        .map(s => s"code_${i}_$s()\nx = $i".length.toLong).sum
      assert(r.getLong(10) == wantCode, s"code_chars $i")
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = MarkdownLake.markdownFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      MarkdownLake.parseMd(c) // must not throw
    }
  }
}
