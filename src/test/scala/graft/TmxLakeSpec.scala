package graft

import graft.operators.TmxLake

/** TMX walk: alignment law, header requirements, inline-markup
  * reject, fixture-law equality, byte-flip sweep. */
class TmxLakeSpec extends SparkSpec {

  private def doc(header: String, body: String): Array[Byte] =
    (s"""<tmx version="1.4">$header<body>$body</body></tmx>""")
      .getBytes("UTF-8")
  private val goodHeader =
    """<header creationtool="t" segtype="sentence" adminlang="en" """ +
      """srclang="en" datatype="plaintext"/>"""
  private def tu(src: String, tgtLang: String, tgt: String): String =
    s"""<tu><tuv xml:lang="en"><seg>$src</seg></tuv>""" +
      s"""<tuv xml:lang="$tgtLang"><seg>$tgt</seg></tuv></tu>"""

  test("a hand-written memory parses; entities and CDATA decode") {
    val (src, tus) = TmxLake.parseTmx(doc(goodHeader,
      tu("a &amp; b", "de", "<![CDATA[x <&> y]]>"))).get
    assert(src == "en" && tus.size == 1)
    assert(tus.head.srcText == "a & b" && tus.head.tgtText == "x <&> y")
  }

  test("strictness matrix: every violation rejects") {
    val rejects: Seq[(String, Array[Byte])] = Seq(
      "version 1.1" -> ("""<tmx version="1.1">""" + goodHeader +
        "<body>" + tu("a", "de", "b") + "</body></tmx>").getBytes("UTF-8"),
      "srclang *all*" ->
        doc(goodHeader.replace("srclang=\"en\"", "srclang=\"*all*\""),
          tu("a", "de", "b")),
      "bad segtype" ->
        doc(goodHeader.replace("sentence", "word"), tu("a", "de", "b")),
      "missing datatype" ->
        doc(goodHeader.replace(" datatype=\"plaintext\"", ""),
          tu("a", "de", "b")),
      "header with children" ->
        doc(goodHeader.replace("/>", "><note/></header>"),
          tu("a", "de", "b")),
      "first tuv not srclang" -> doc(goodHeader,
        """<tu><tuv xml:lang="de"><seg>a</seg></tuv>""" +
          """<tuv xml:lang="en"><seg>b</seg></tuv></tu>"""),
      "target equals source lang" -> doc(goodHeader, tu("a", "en", "b")),
      "three variants" -> doc(goodHeader,
        tu("a", "de", "b").replace("</tu>",
          """<tuv xml:lang="fr"><seg>c</seg></tuv></tu>""")),
      "single variant" -> doc(goodHeader,
        """<tu><tuv xml:lang="en"><seg>a</seg></tuv></tu>"""),
      "inline markup in seg" -> doc(goodHeader,
        tu("a <bpt i=\"1\">x</bpt> b".replace("<", "&lt;"), "de", "b")
          .replace("&lt;", "<")),
      "missing seg" -> doc(goodHeader,
        """<tu><tuv xml:lang="en"></tuv>""" +
          """<tuv xml:lang="de"><seg>b</seg></tuv></tu>"""),
      "tuv without lang" -> doc(goodHeader,
        """<tu><tuv><seg>a</seg></tuv>""" +
          """<tuv xml:lang="de"><seg>b</seg></tuv></tu>"""))
    rejects.foreach { case (name, b) =>
      assert(TmxLake.parseTmx(b).isEmpty, name)
    }
    assert(TmxLake.parseTmx(null).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = TmxLake.extractTmx(
      TmxLake.tmxFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(10)))
    assert(out.length == (0 until 12).map(i => 3 + i % 3).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      def a(j: Long) = (i * 7 + k * 3 + j) % 10
      if (k % 5 == 4) assert(r.isNullAt(2))
      else assert(r.getString(2) == s"u${i}_$k")
      assert(r.getString(3) == "en")
      assert(r.getString(4) == Seq("de", "fr", "ja")((i % 3).toInt))
      val mid = if (k % 3 == 2) " & " else " and "
      assert(r.getString(5) == s"s${a(0)}${mid}s${a(1)}", s"src ($i,$k)")
      assert(r.getString(6) == s"z${a(2)} zz z${a(3)}", s"tgt ($i,$k)")
      assert(r.getLong(9) == a(2) + a(3))
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = TmxLake.tmxFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      TmxLake.parseTmx(c) // must not throw
    }
  }
}
