package graft

import graft.operators.WikiLake

/** Wikitext kernel laws (construct-by-construct residues, nesting,
  * namespace drops, strict rejects), dump-schema strictness,
  * fixture-law equality, byte-flip sweep. */
class WikiLakeSpec extends SparkSpec {

  private def plain(s: String): Option[String] =
    WikiLake.wikiPlain(s).map(_._1)

  test("kernel: construct residues") {
    assert(plain("plain words here").contains("plain words here"))
    assert(plain("[[Target]]").contains("Target"))
    assert(plain("[[Target|label text]]").contains("label text"))
    assert(plain("a [[X|'''bold label''']] b").contains("a bold label b"))
    assert(plain("[[Category:Hidden]]x").contains("x"))
    assert(plain("[[File:pic.png|thumb|cap]]x").contains("x"))
    assert(plain("[[A|b:c]]").contains("b:c"), "colon after pipe is no namespace")
    assert(plain("{{tmpl|a=1}}x").contains("x"))
    assert(plain("{{outer|{{inner|y}}}}x").contains("x"), "nested templates")
    assert(plain("a<ref>dropped</ref>b").contains("ab"))
    assert(plain("a<ref name=\"n\"/>b").contains("ab"))
    assert(plain("a<!-- hidden -->b").contains("ab"))
    assert(plain("'''b''' ''i''").contains("b i"))
    assert(plain("[http://e.org/x label]").contains("label"))
    assert(plain("[http://e.org/x]").contains(""), "bare ext link drops")
    assert(plain("== Head ==\nbody").contains("Head body"))
    assert(plain("=== Sub ===\nx").contains("Sub x"))
    assert(plain("* item\n# num\n: ind\n; def").contains("item num ind def"))
    assert(plain("** deep\n*# mixed").contains("deep mixed"))
    val full = WikiLake.wikiPlain(
      "== A ==\n[[L1]] [[L2|x]] {{t}} [[Category:C]]\n== B ==\n{{u}}")
    assert(full.contains(("A L1 x B", 3, 2, 2)))
  }

  test("kernel strictness: unaccountable markup rejects") {
    val rejects = Seq(
      "unclosed template" -> "{{tmpl|a",
      "unclosed link" -> "[[Target",
      "unclosed ref" -> "<ref>never closed",
      "unclosed comment" -> "<!-- never",
      "unclosed ext link" -> "[http://e.org/x label",
      "stray close brace" -> "a }} b",
      "stray close bracket" -> "a ]] b",
      "stray single bracket" -> "a [ b",
      "foreign html" -> "a <div>b</div>",
      "empty link label" -> "[[T|]]",
      "heading level 7" -> "======= H =======",
      "asymmetric heading" -> "== H ===",
      "heading missing spaces" -> "==H==",
      "empty heading" -> "==  ==",
      "list prefix without space" -> "*item",
      "heading with equals inside" -> "== a = b ==")
    rejects.foreach { case (name, w) =>
      assert(WikiLake.wikiPlain(w).isEmpty, name)
    }
  }

  test("dump-schema strictness") {
    val ns = "http://www.mediawiki.org/xml/export-0.11/"
    def dump(page: String) =
      s"""<mediawiki xmlns="$ns"><siteinfo><x>1</x></siteinfo>$page</mediawiki>"""
        .getBytes("UTF-8")
    val goodPage = "<page><title>T</title><ns>0</ns><id>1</id>" +
      "<revision><id>2</id><timestamp>2024-01-01T00:00:00Z</timestamp>" +
      "<model>wikitext</model><format>text/x-wiki</format>" +
      "<text>hello world</text></revision></page>"
    val ok = WikiLake.parseDump(dump(goodPage)).get
    assert(ok.size == 1 && ok.head.text == "hello world" &&
      ok.head.revTs == 19723L * 86400L)

    val rejects = Seq(
      "wrong namespace" -> new String(dump(goodPage), "UTF-8")
        .replace(ns, "http://other/").getBytes("UTF-8"),
      "missing title" -> dump(goodPage.replace("<title>T</title>", "")),
      "two revisions" -> dump(goodPage.replace("</page>",
        "</page>").replace("<revision>",
        "<revision><id>9</id><timestamp>2024-01-01T00:00:00Z</timestamp>" +
          "<model>wikitext</model><format>text/x-wiki</format>" +
          "<text>x</text></revision><revision>")),
      "non-integer ns" -> dump(goodPage.replace("<ns>0</ns>", "<ns>a</ns>")),
      "offset timestamp" -> dump(goodPage.replace(
        "2024-01-01T00:00:00Z", "2024-01-01T00:00:00+01:00")),
      "model flow" -> dump(goodPage.replace(
        "<model>wikitext</model>", "<model>flow-board</model>")),
      "unknown page child" -> dump(goodPage.replace("</page>",
        "<redirect/></page>")),
      "markup reject bubbles" -> dump(goodPage.replace(
        "hello world", "hello {{world")))
    rejects.foreach { case (name, d) =>
      assert(WikiLake.parseDump(d).isEmpty, name)
    }
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = WikiLake.extractWiki(
      WikiLake.wikiFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(12)))
    assert(out.length == (0 until 12).map(i => 2 + i % 3).sum)
    out.foreach { r =>
      val (i, p) = (r.getLong(0), r.getInt(1))
      val nsec = 1 + (i + p) % 2
      assert(r.getString(2) == s"Page $i.$p & co")
      assert(r.getLong(5) == 1704067200L + i * 86400L + p * 3600L)
      val want = (0L until nsec).map { s =>
        def m(j: Long) = s"m${(i * 3 + p * 5 + s * 7 + j) % 10}"
        s"Sec $s ${m(0)} ${m(1)} ${m(2)} L${(i + p + s) % 7} " +
          s"b${(i + s) % 5} ${m(3)} x${(p + s) % 9} ${m(4)}"
      }.mkString(" ")
      assert(r.getString(6) == want, s"text ($i,$p)")
      assert(r.getLong(7) == nsec * 10)
      assert(r.getInt(9) == nsec + 1 && r.getInt(10) == nsec &&
        r.getInt(11) == nsec)
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = WikiLake.wikiFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 7; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      WikiLake.parseDump(c) // must not throw
    }
  }
}
