package graft

import java.nio.charset.StandardCharsets

import graft.operators.TextCharset

/** Charset detection ladder: fixture round-trips, strictness rejects,
  * and the cp1252/ISO-8859-1 divergence row. */
class TextCharsetSpec extends SparkSpec {

  private def sniff(b: Array[Byte]) = TextCharset.sniffDecode(b)

  test("fixture decodes to its laws across all seven charset kinds") {
    val out = TextCharset.decodeText(
      TextCharset.charsetFixture(spark, 14), "id", "media")
      .orderBy("id").collect()
    val expect = Seq(
      "utf-8" -> "café € menu 0", "utf-16le" -> "日本語 text 1",
      "utf-16be" -> "snowman ☃ row 2",
      "windows-1252" -> "quote “w3” dash – eur €",
      "utf-8" -> "plain ascii line 4",
      "utf-16le" -> "win export 5 é☃",
      "utf-16be" -> "be dump 6 Ω")
    for (i <- 0 until 7) {
      assert(out(i).getAs[Boolean]("valid"), s"id $i")
      assert(out(i).getAs[String]("charset") == expect(i)._1, s"id $i")
      assert(out(i).getAs[String]("text") == expect(i)._2, s"id $i")
    }
  }

  test("BOM-less UTF-16: parity majority detects, ambiguity rejects") {
    // ASCII-majority LE — bytewise valid UTF-8, so only the sniff
    // keeps it from decoding as NUL-riddled UTF-8
    assert(sniff("report 7".getBytes(StandardCharsets.UTF_16LE))
      .contains(("utf-16le", "report 7")))
    assert(sniff("report 7".getBytes(StandardCharsets.UTF_16BE))
      .contains(("utf-16be", "report 7")))
    // exactly at the majority line: half ASCII, half CJK
    assert(sniff("ab日本".getBytes(StandardCharsets.UTF_16LE))
      .contains(("utf-16le", "ab日本")))
    // below the majority line: CJK-dominant BOM-less UTF-16 has no
    // zero-parity signal, so it follows the rest of the ladder (the
    // documented ASCII-majority limitation — cp1252 is the last
    // resort and this byte soup happens to be all-defined there)
    assert(sniff("日本語あり".getBytes(StandardCharsets.UTF_16LE))
      .exists(_._1 == "windows-1252"))
    // interleaved-zero ambiguity: LE and BE evidence tie — reject
    assert(sniff(Array[Byte]('a', 0, 0, 'b')).isEmpty)
    // a candidate that lies: ASCII-majority with an unpaired
    // surrogate must reject, never fall back
    assert(sniff(Array[Byte]('a', 0, 'b', 0, 0, 0xd8.toByte)).isEmpty)
    // NUL characters in the decoded text reject (all-zero buffer
    // scores 0/0 and falls through to utf-8 instead)
    assert(sniff(Array[Byte]('a', 0, 0, 0, 'b', 0)).isEmpty,
      "NUL code unit inside an LE-majority buffer")
    // odd length can't be UTF-16: 'a\0b\0c' is not valid utf-8 text?
    // it IS valid utf-8 bytes (NULs legal) — ladder takes utf-8
    assert(sniff(Array[Byte]('a', 0, 'b', 0, 'c'))
      .exists(_._1 == "utf-8"))
    // two-byte buffers are below the sniff minimum — BOM-less 'a' in
    // UTF-16LE stays utf-8 ("a" + NUL bytes), the documented floor
    assert(sniff(Array[Byte]('a', 0)).exists(_._1 == "utf-8"))
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
