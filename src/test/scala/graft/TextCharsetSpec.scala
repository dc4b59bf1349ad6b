package graft

import java.nio.charset.StandardCharsets

import graft.operators.TextCharset

/** Charset detection ladder: fixture round-trips, strictness rejects,
  * and the cp1252/ISO-8859-1 divergence row. */
class TextCharsetSpec extends SparkSpec {

  private def sniff(b: Array[Byte]) = TextCharset.sniffDecode(b)

  test("fixture decodes to its laws across all five charset kinds") {
    val out = TextCharset.decodeText(
      TextCharset.charsetFixture(spark, 10), "id", "media")
      .orderBy("id").collect()
    val expect = Seq(
      "utf-8" -> "café € menu 0", "utf-16le" -> "日本語 text 1",
      "utf-16be" -> "snowman ☃ row 2",
      "windows-1252" -> "quote “w3” dash – eur €",
      "utf-8" -> "plain ascii line 4")
    for (i <- 0 until 5) {
      assert(out(i).getAs[Boolean]("valid"), s"id $i")
      assert(out(i).getAs[String]("charset") == expect(i)._1, s"id $i")
      assert(out(i).getAs[String]("text") == expect(i)._2, s"id $i")
    }
  }

  test("BOM handling: stripped, and a lying BOM rejects") {
    assert(sniff(Array(0xef, 0xbb, 0xbf, 'h', 'i').map(_.toByte))
      .contains(("utf-8", "hi")))
    // BOM + truncated multi-byte sequence: invalid, NOT re-guessed
    assert(sniff(Array(0xef, 0xbb, 0xbf, 0xc3).map(_.toByte)).isEmpty)
    // UTF-16LE BOM + odd byte count
    assert(sniff(Array(0xff, 0xfe, 0x41).map(_.toByte)).isEmpty)
    // UTF-16BE BOM + unpaired high surrogate U+D800
    assert(sniff(Array(0xfe, 0xff, 0xd8, 0x00).map(_.toByte)).isEmpty)
    // empty payload behind a BOM is a valid empty text
    assert(sniff(Array(0xff, 0xfe).map(_.toByte)).contains(("utf-16le", "")))
  }

  test("strict UTF-8 validation: overlongs and surrogates fall through") {
    // overlong '/' (C0 AF) is NOT utf-8 → cp1252 (À¯)
    assert(sniff(Array(0xc0, 0xaf).map(_.toByte))
      .contains(("windows-1252", "À¯")))
    // CESU-8-style encoded surrogate ED A0 80 rejects as utf-8 →
    // cp1252: ED=í, A0=NBSP, 80=€
    assert(sniff(Array(0xed, 0xa0, 0x80).map(_.toByte))
      .contains(("windows-1252", "í\u00a0€")))
    // well-formed 4-byte astral char IS utf-8
    val astral = "x😀".getBytes(StandardCharsets.UTF_8)
    assert(sniff(astral).exists { case (cs, t) =>
      cs == "utf-8" && t == "x😀" })
  }

  test("cp1252: 0x80-0x9F row maps to WHATWG points; undefined bytes reject") {
    assert(sniff(Array[Byte](0x80.toByte))
      .contains(("windows-1252", "€"))) // €
    assert(sniff(Array[Byte](0x93.toByte, 0x94.toByte))
      .contains(("windows-1252", "“”"))) // “ ”
    // ISO-8859-1 would map these to C1 controls; cp1252 is the
    // deliberate WHATWG choice — pin the divergence
    assert(sniff(Array[Byte](0x95.toByte)).contains(("windows-1252", "•")))
    for (b <- Seq(0x81, 0x8d, 0x8f, 0x90, 0x9d))
      assert(sniff(Array(0xff.toByte, b.toByte)).isEmpty, // 0xFF forces non-utf8
        s"undefined cp1252 byte $b must reject")
    // null input flags, never throws
    assert(sniff(null).isEmpty)
    assert(sniff(Array.empty[Byte]).contains(("utf-8", "")))
  }
}
