package graft

import graft.operators.SubLake
import graft.operators.SubLake.Cue

/** SRT/WebVTT grammar walk: round-trip laws, identifier/settings/NOTE
  * recognition, timing strictness, corruption matrix, flip sweep. */
class SubLakeSpec extends SparkSpec {

  private def srtBytes(s: String) = s.getBytes("UTF-8")

  private val goodSrt = srtBytes(
    "1\n00:00:01,000 --> 00:00:02,500\nhello world\n\n" +
      "2\n00:01:02,250 --> 01:02:03,999\nline one\nline two 42\n")

  private val goodVtt = srtBytes(
    "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
      "intro\n00:00:01.000 --> 00:00:02.500 align:start position:10%\nhello world\n\n" +
      "00:01:02.250 --> 01:02:03.999\nline one\nline two 42\n")

  test("SRT round-trip: indices, timings, multi-line text") {
    val got = SubLake.parseSubs(goodSrt)
    assert(got.isDefined)
    val (kind, cues) = got.get
    assert(kind == "srt")
    assert(cues.map(_.startMs) == Seq(1000L, 62250L))
    assert(cues.map(_.endMs) == Seq(2500L, 3723999L))
    assert(cues.map(_.text) == Seq("hello world", "line one\nline two 42"))
    assert(cues.map(_.ident) == Seq(None, None))
    // encoder→parser closure
    assert(SubLake.parseSubs(SubLake.writeSrt(cues)).get._2 == cues)
  }

  test("WebVTT round-trip: NOTE skipped, ident + settings recognized") {
    val got = SubLake.parseSubs(goodVtt)
    assert(got.isDefined)
    val (kind, cues) = got.get
    assert(kind == "vtt")
    assert(cues.map(_.ident) == Seq(Some("intro"), None))
    assert(cues.map(_.startMs) == Seq(1000L, 62250L))
    assert(cues.map(_.text) == Seq("hello world", "line one\nline two 42"))
    assert(cues.head.cue == 0 && cues(1).cue == 1)
  }

  test("BOM is stripped; bare header-only WebVTT is valid and empty") {
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ goodVtt
    assert(SubLake.parseSubs(bom).isDefined)
    assert(SubLake.parseSubs(srtBytes("WEBVTT\n")).contains(("vtt", Seq())))
  }

  test("corruption matrix: every malformation flags, none throws") {
    val cases: Seq[(String, Array[Byte])] = Seq(
      "index starts at 2" -> srtBytes(
        "2\n00:00:01,000 --> 00:00:02,000\nx\n"),
      "index gap" -> srtBytes(
        "1\n00:00:01,000 --> 00:00:02,000\nx\n\n" +
          "3\n00:00:03,000 --> 00:00:04,000\ny\n"),
      "leading-zero index" -> srtBytes(
        "01\n00:00:01,000 --> 00:00:02,000\nx\n"),
      "SRT with dot separator" -> srtBytes(
        "1\n00:00:01.000 --> 00:00:02.000\nx\n"),
      "VTT with comma separator" -> srtBytes(
        "WEBVTT\n\n00:00:01,000 --> 00:00:02,000\nx\n"),
      "end == start" -> srtBytes(
        "1\n00:00:01,000 --> 00:00:01,000\nx\n"),
      "minutes 60" -> srtBytes(
        "1\n00:60:01,000 --> 00:60:02,000\nx\n"),
      "2-digit millis" -> srtBytes(
        "1\n00:00:01,00 --> 00:00:02,00\nx\n"),
      "missing blank separator" -> srtBytes(
        "1\n00:00:01,000 --> 00:00:02,000\nx\n" +
          "2\n00:00:03,000 --> 00:00:04,000\ny\n"),
      "empty cue text" -> srtBytes(
        "1\n00:00:01,000 --> 00:00:02,000\n\n"),
      "non-monotonic starts" -> srtBytes(
        "1\n00:00:05,000 --> 00:00:06,000\nx\n\n" +
          "2\n00:00:01,000 --> 00:00:02,000\ny\n"),
      "SRT trailing settings" -> srtBytes(
        "1\n00:00:01,000 --> 00:00:02,000 align:start\nx\n"),
      "unknown VTT setting key" -> srtBytes(
        "WEBVTT\n\n00:00:01.000 --> 00:00:02.000 cursor:up\nx\n"),
      "duplicate VTT setting key" -> srtBytes(
        "WEBVTT\n\n00:00:01.000 --> 00:00:02.000 align:start align:end\nx\n"),
      "VTT missing header blank" -> srtBytes(
        "WEBVTT\n00:00:01.000 --> 00:00:02.000\nx\n"),
      "ident containing arrow" -> srtBytes(
        "WEBVTT\n\na --> b\nx\n"),
      "arrow inside cue text" -> srtBytes(
        "1\n00:00:01,000 --> 00:00:02,000\nx --> y\n"),
      "double trailing blank" -> (goodSrt ++ srtBytes("\n")),
      "bare CR line ending" -> srtBytes(
        "1\r00:00:01,000 --> 00:00:02,000\rx\r"),
      "invalid UTF-8" -> (goodSrt ++ Array(0xc3.toByte, 0x28.toByte)),
      "empty file" -> srtBytes(""),
      "NOTE block in SRT" -> srtBytes(
        "NOTE hi\n\n1\n00:00:01,000 --> 00:00:02,000\nx\n"))
    cases.foreach { case (name, bytes) =>
      assert(SubLake.parseSubs(bytes).isEmpty, name)
    }
  }

  test("CRLF line endings parse identically to LF") {
    val crlf = srtBytes(new String(goodSrt, "UTF-8").replace("\n", "\r\n"))
    assert(SubLake.parseSubs(crlf) == SubLake.parseSubs(goodSrt))
  }

  test("byte-flip sweep never throws; flips never widen the cue set") {
    for (src <- Seq(goodSrt, goodVtt); i <- src.indices by 3; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      val r = SubLake.parseSubs(c) // must not throw
      r.foreach { case (_, cues) => assert(cues.size <= 2) }
    }
  }

  test("fixture laws: counts, kinds, idents, stats vs the query output") {
    val fx = SubLake.subFixture(spark, 12)
    val rows = SubLake.extractSubs(fx, "id", "media")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(8), r.getLong(9)))
      .sortBy(t => (t._1, t._2))
    assert(rows.length == (0 until 12).map(i => 3 + i % 4).sum)
    rows.foreach { case (id, k, kind, ident, start, nWords, digitSum) =>
      assert(kind == (if (id % 2 == 0) "srt" else "vtt"))
      val wantIdent =
        if (id % 2 == 1 && k % 3 == 1) s"c${id}_$k" else null
      assert(ident == wantIdent, s"($id,$k)")
      assert(start == (id % 3) * 3600000L + id * 61000L + k * 4000L +
        (id * 7 + k * 13) % 1000)
      val nt = 8 + (id + k) % 5
      assert(nWords == nt)
      assert(digitSum ==
        (0 until nt.toInt).map(j => (id * 7 + k * 3 + j) % 10).sum)
    }
  }
}
