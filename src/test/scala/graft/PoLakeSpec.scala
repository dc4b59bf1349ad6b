package graft

import graft.operators.PoLake

/** PO catalog walk: concatenation + escape laws, plural-index law,
  * strictness matrix, fixture-law equality, byte-flip sweep. */
class PoLakeSpec extends SparkSpec {

  private def parse(s: String) = PoLake.parsePo(s.getBytes("UTF-8"))
  private val header =
    "msgid \"\"\nmsgstr \"\"\n\"Language: de\\n\"\n\n"

  test("hand-written catalogs parse with the right laws") {
    val (lang, es) = parse(header +
      "msgid \"ab \"\n\"cd\"\nmsgstr \"x\\\"y\\\"\\nz\"\n\n" +
      "msgid \"one\"\nmsgid_plural \"many\"\n" +
      "msgstr[0] \"eins\"\nmsgstr[1] \"viele\"\n").get
    assert(lang == "de" && es.size == 2)
    assert(es.head.msgid == "ab cd", "adjacent pieces concatenate")
    assert(es.head.msgstr == "x\"y\"\nz", "escapes decode")
    assert(es(1).msgstr == "eins" && es(1).nPlural == 2)
  }

  test("strictness matrix: every violation rejects") {
    val rejects = Seq(
      "missing header entry" ->
        "msgid \"x\"\nmsgstr \"y\"\n",
      "header without Language" ->
        "msgid \"\"\nmsgstr \"X-Tool: x\\n\"\n\nmsgid \"a\"\nmsgstr \"b\"\n",
      "empty msgid in body" ->
        (header + "msgid \"\"\nmsgstr \"y\"\n"),
      "duplicate msgid" ->
        (header + "msgid \"a\"\nmsgstr \"b\"\n\nmsgid \"a\"\nmsgstr \"c\"\n"),
      "unknown escape" -> (header + "msgid \"a\\q\"\nmsgstr \"b\"\n"),
      "unescaped quote" -> (header + "msgid \"a\"b\"\nmsgstr \"c\"\n"),
      "unterminated string" -> (header + "msgid \"a\nmsgstr \"b\"\n"),
      "plural with one form" ->
        (header + "msgid \"a\"\nmsgid_plural \"as\"\nmsgstr[0] \"b\"\n"),
      "plural index gap" ->
        (header + "msgid \"a\"\nmsgid_plural \"as\"\n" +
          "msgstr[0] \"b\"\nmsgstr[2] \"c\"\n"),
      "entries without blank separator" ->
        (header + "msgid \"a\"\nmsgstr \"b\"\nmsgid \"c\"\nmsgstr \"d\"\n"),
      "stray line" -> (header + "msgid \"a\"\nmsgstr \"b\"\n\njunk\n"),
      "no entries" -> header,
      "CR endings" -> header.replace("\n", "\r\n"))
    rejects.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
    assert(PoLake.parsePo(null).isEmpty)
    assert(PoLake.parsePo(Array(0xc3.toByte, 0x28.toByte)).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = PoLake.extractPo(
      PoLake.poFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(9)))
    assert(out.length == (0 until 12).map(i => 3 + i % 3).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      def a(j: Long) = (i * 7 + k * 3 + j) % 10
      assert(r.getString(2) == Seq("de", "fr", "ja", "pt")((i % 4).toInt))
      assert(r.getString(3) == s"source s${a(0)} s${a(1)} tail",
        s"msgid concat ($i,$k)")
      val wantStr =
        if (k % 3 == 2) "ziel \"t" + a(2) + "\"\nt" + a(3)
        else s"ziel t${a(2)} t${a(3)}"
      assert(r.getString(4) == wantStr, s"msgstr ($i,$k)")
      assert(r.getInt(5) == (if (k % 4 == 3) 2 else 0))
      // payloadStats splits on SPACE only: the \n-joined pair counts 2
      assert(r.getLong(6) == 4 && r.getLong(7) == (if (k % 3 == 2) 2 else 3))
      assert(r.getLong(8) == a(2) + a(3))
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = PoLake.poFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      PoLake.parsePo(c) // must not throw
    }
  }
}
