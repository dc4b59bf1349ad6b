package graft

import graft.operators.XmlLake
import graft.operators.XmlLake.XElem

/** Strict XML subset + sitemap/feed walks: well-formedness matrix
  * (incl. the DOCTYPE/PI = XXE reject), entity/CDATA decode, dialect
  * strictness, date profiles, flip sweep. */
class XmlLakeSpec extends SparkSpec {

  private def b(s: String) = s.getBytes("UTF-8")

  // ----------------------------------------------------------------
  // parser core

  test("parse: nesting, attributes, entities, CDATA, comments") {
    val doc = b("""<?xml version="1.0" encoding="UTF-8"?>
      |<root a="1" b='x&amp;y'>
      |  <child>pre &lt;tag&gt; &#65;&#x42; post</child>
      |  <!-- a comment -->
      |  <data><![CDATA[raw <&> bytes]]> tail</data>
      |  <empty/>
      |</root>""".stripMargin)
    val root = XmlLake.parseXml(doc).get
    assert(root.name == "root")
    assert(root.attr("a").contains("1") && root.attr("b").contains("x&y"))
    assert(root.elems.map(_.name) == Vector("child", "data", "empty"))
    assert(root.elems(0).leafText.contains("pre <tag> AB post"))
    assert(root.elems(1).leafText.contains("raw <&> bytes tail"))
    assert(root.elems(2).kids.isEmpty)
  }

  test("well-formedness matrix: every violation rejects, none throws") {
    val cases: Seq[(String, String)] = Seq(
      "DOCTYPE (XXE surface)" ->
        """<!DOCTYPE foo [<!ENTITY x SYSTEM "file:///etc/passwd">]><r>&x;</r>""",
      "processing instruction" -> "<?php echo 1 ?><r/>",
      "PI inside content" -> "<r><?pi data?></r>",
      "mismatched end tag" -> "<r><a>x</b></r>",
      "unclosed root" -> "<r><a>x</a>",
      "duplicate attribute" -> """<r a="1" a="2"/>""",
      "raw ampersand" -> "<r>a & b</r>",
      "unknown entity" -> "<r>&nbsp;</r>",
      "numeric ref zero" -> "<r>&#0;</r>",
      "numeric ref surrogate" -> "<r>&#xD800;</r>",
      "raw < in attribute" -> """<r a="x<y"/>""",
      "double hyphen in comment" -> "<r><!-- a -- b --></r>",
      "]]> in char data" -> "<r>a ]]> b</r>",
      "trailing content" -> "<r/><r2/>",
      "text after root" -> "<r/>junk",
      "control char" -> "<r>a\u0001b</r>",
      "bad xml decl version" -> """<?xml version="1.1"?><r/>""",
      "whitespace-only" -> "   ")
    cases.foreach { case (name, doc) =>
      assert(XmlLake.parseXml(b(doc)).isEmpty, name)
    }
    assert(XmlLake.parseXml(null).isEmpty)
    assert(XmlLake.parseXml(Array[Byte]()).isEmpty)
    // invalid UTF-8
    assert(XmlLake.parseXml(Array(0x3c, 0x72, 0xc3, 0x28).map(_.toByte)).isEmpty)
  }

  test("BOM accepted; attributes single-quoted; empty-element tags") {
    val doc = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      b("<r x='1'><a/></r>")
    val root = XmlLake.parseXml(doc).get
    assert(root == XElem("r", Vector(("x", "1")),
      Vector(XElem("a", Vector(), Vector()))))
  }

  // ----------------------------------------------------------------
  // sitemap walk

  private val ns = "http://www.sitemaps.org/schemas/sitemap/0.9"

  test("sitemap: date profiles, priority grammar, enum; strictness") {
    val ok = b(s"""<urlset xmlns="$ns"><url><loc>https://a.org/x</loc>
      |<lastmod>2024-02-29</lastmod><changefreq>daily</changefreq>
      |<priority>0.85</priority></url></urlset>""".stripMargin)
    val (kind, urls) = XmlLake.parseSitemap(ok).get
    assert(kind == "urlset" && urls.size == 1)
    assert(urls.head.lastmod.contains(19782L * 86400L)) // 2024-02-29, leap day
    assert(urls.head.priority.contains(850000L))
    assert(urls.head.changefreq.contains("daily"))

    val rejects: Seq[(String, String)] = Seq(
      "missing namespace" -> "<urlset><url><loc>https://a.org/</loc></url></urlset>",
      "wrong namespace" -> s"""<urlset xmlns="http://other">
        |<url><loc>https://a.org/</loc></url></urlset>""".stripMargin,
      "missing loc" -> s"""<urlset xmlns="$ns"><url>
        |<lastmod>2024-01-01</lastmod></url></urlset>""".stripMargin,
      "duplicate loc" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><loc>https://b.org/</loc></url></urlset>""".stripMargin,
      "ftp loc" -> s"""<urlset xmlns="$ns"><url>
        |<loc>ftp://a.org/</loc></url></urlset>""".stripMargin,
      "bad date 2023-02-29" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><lastmod>2023-02-29</lastmod></url></urlset>""".stripMargin,
      "offset datetime (non-UTC profile)" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><lastmod>2024-01-01T00:00:00+01:00</lastmod></url></urlset>""".stripMargin,
      "priority > 1" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><priority>1.5</priority></url></urlset>""".stripMargin,
      "priority 4 decimals" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><priority>0.1234</priority></url></urlset>""".stripMargin,
      "bad changefreq" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><changefreq>sometimes</changefreq></url></urlset>""".stripMargin,
      "priority in index" -> s"""<sitemapindex xmlns="$ns"><sitemap>
        |<loc>https://a.org/s.xml</loc><priority>0.5</priority></sitemap></sitemapindex>""".stripMargin,
      "unknown child" -> s"""<urlset xmlns="$ns"><url>
        |<loc>https://a.org/</loc><video>x</video></url></urlset>""".stripMargin,
      "stray text in url" -> s"""<urlset xmlns="$ns"><url>stray
        |<loc>https://a.org/</loc></url></urlset>""".stripMargin)
    rejects.foreach { case (name, doc) =>
      assert(XmlLake.parseSitemap(b(doc.replace("\n", ""))).isEmpty, name)
    }
  }

  test("sitemap: the 50 000-entry protocol cap") {
    val urls = (0 until 50001)
      .map(i => s"<url><loc>https://a.org/$i</loc></url>").mkString
    assert(XmlLake.parseSitemap(
      b(s"""<urlset xmlns="$ns">$urls</urlset>""")).isEmpty)
  }

  // ----------------------------------------------------------------
  // feed walk

  test("feed strictness: dialect laws reject, day-of-week verified") {
    val atomNs = "http://www.w3.org/2005/Atom"
    def rss(item: String) =
      s"""<rss version="2.0"><channel><title>t</title>
        |<link>https://f.org/</link><description>d</description>
        |$item</channel></rss>""".stripMargin.replace("\n", "")
    val goodItem = "<item><title>a</title><link>https://f.org/1</link>" +
      "<description>x 1</description>" +
      "<pubDate>Mon, 1 Jan 2024 10:00:00 +0000</pubDate></item>"
    assert(XmlLake.parseFeed(b(rss(goodItem))).exists(_._2.size == 1))

    val rejects: Seq[(String, Array[Byte])] = Seq(
      "rss version 0.91" -> b(rss(goodItem).replace("2.0", "0.91")),
      "lying day-of-week" -> b(rss(goodItem.replace("Mon,", "Tue,"))),
      "missing channel description" ->
        b(rss(goodItem).replace("<description>d</description>", "")),
      "duplicate item title" -> b(rss(goodItem.replace("<title>a</title>",
        "<title>a</title><title>b</title>"))),
      "unknown item child" ->
        b(rss(goodItem.replace("</item>", "<enclosure>x</enclosure></item>"))),
      "atom wrong ns" -> b(s"""<feed xmlns="http://purl.org/atom/ns#">
        |<title>t</title><id>u</id>
        |<updated>2024-01-01T00:00:00Z</updated></feed>""".stripMargin.replace("\n", "")),
      "atom link with body" -> b(s"""<feed xmlns="$atomNs"><title>t</title>
        |<id>u</id><updated>2024-01-01T00:00:00Z</updated>
        |<entry><title>e</title><id>u1</id>
        |<updated>2024-01-01T00:00:00Z</updated>
        |<link>https://x</link></entry></feed>""".stripMargin.replace("\n", "")),
      "atom offset date" -> b(s"""<feed xmlns="$atomNs"><title>t</title>
        |<id>u</id><updated>2024-01-01T00:00:00+01:00</updated></feed>"""
        .stripMargin.replace("\n", "")))
    rejects.foreach { case (name, doc) =>
      assert(XmlLake.parseFeed(doc).isEmpty, name)
    }
  }

  test("fixture laws: sitemap + feed outputs match the closed forms") {
    val sm = XmlLake.extractSitemap(
      XmlLake.sitemapFixture(spark, 10), "id", "media").collect()
    assert(sm.forall(_.getBoolean(7)))
    assert(sm.length == (0 until 10).map(i => 4 + i % 5).sum)
    sm.foreach { r =>
      val (id, k) = (r.getLong(0), r.getInt(1))
      val idx = id % 5 == 4
      assert(r.getString(2) == (if (idx) "index" else "urlset"))
      if (!idx && k % 3 == 2) {
        val want = if ((id + k) % 9 == 0) 1000000L else ((id + k) % 10) * 100000L
        assert(r.getLong(6) == want, s"priority ($id,$k)")
      } else assert(r.isNullAt(6), s"priority null ($id,$k)")
    }

    val fd = XmlLake.extractFeed(
      XmlLake.feedFixture(spark, 10), "id", "media").collect()
    assert(fd.forall(_.getBoolean(8)))
    assert(fd.length == (0 until 10).map(i => 3 + i % 4).sum)
    fd.foreach { r =>
      val (id, k) = (r.getLong(0), r.getInt(1))
      assert(r.getString(3) == s"Item $id & $k") // entity decoded
      assert(r.getLong(5) ==
        1704067200L + id * 86400L + k * 3600L + (id * 7 + k * 13) % 60)
      assert(r.getLong(6) == 8 + (id + k) % 5)
    }
  }

  test("byte-flip sweep never throws on either dialect") {
    val seeds = Seq(
      XmlLake.sitemapFixture(spark, 2), XmlLake.feedFixture(spark, 2))
      .flatMap(_.collect().map(_.getAs[Array[Byte]](1)))
    for (src <- seeds; i <- src.indices by 7; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      XmlLake.parseSitemap(c) // must not throw
      XmlLake.parseFeed(c)
    }
  }
}
