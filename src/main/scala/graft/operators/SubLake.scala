package graft.operators

import java.nio.charset.{CharsetDecoder, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subtitle / caption extraction (SubRip `.srt` + W3C WebVTT) — the
  * caption side of a video corpus is one of the larger clean-text
  * sources an LLM training pipeline ingests (every captioned video
  * ships one of these two formats). REAL parse end to end, written
  * against the published grammars (WebVTT: W3C candidate rec;
  * SubRip: the de-facto format grammar), with the codec-family
  * strictness posture — reject, never guess:
  *
  *  - bytes→text: optional UTF-8 BOM stripped, then STRICT RFC 3629
  *    UTF-8 (malformed sequences reject the file — the
  *    [[TextCharset]] posture); a bare CR (not part of CRLF) rejects;
  *  - SRT: cues are `index NL timing NL text+` separated by exactly
  *    one blank line; indices must be 1,2,3,… with no leading zeros;
  *    timing is `HH:MM:SS,mmm --> HH:MM:SS,mmm` exactly (comma
  *    decimal separator, 2-digit fields, minutes/seconds < 60,
  *    3-digit millis); end > start and cue starts are monotone
  *    non-decreasing; text lines are non-blank and must not contain
  *    `-->` (a timing arrow inside text means a dropped separator);
  *  - WebVTT: first line exactly `WEBVTT` then a blank line; `NOTE`
  *    comment blocks are skipped; a cue is `[ident NL] timing
  *    [settings] NL text+` where the optional identifier must not
  *    contain `-->`; timing uses the DOT decimal separator; cue
  *    settings are space-separated `key:value` pairs drawn from the
  *    spec's five keys (vertical/line/position/size/align), each at
  *    most once;
  *  - trailing newline at EOF is accepted; a second trailing blank
  *    line (or any structural slip) rejects the whole file.
  *
  * One blob = one task-local walk (embarrassingly parallel over the
  * media table; the codec-family plan shape — no shuffle beyond the
  * presentation sort, gated in PlanAuditSpec).
  */
object SubLake {

  private[graft] final case class Cue(
      cue: Int, ident: Option[String], startMs: Long, endMs: Long,
      text: String)

  private def utf8Strict: CharsetDecoder = StandardCharsets.UTF_8
    .newDecoder()
    .onMalformedInput(CodingErrorAction.REPORT)
    .onUnmappableCharacter(CodingErrorAction.REPORT)

  /** Strict bytes→lines: BOM strip, strict UTF-8, CRLF or LF line
    * breaks (a CR not followed by LF rejects), at most ONE trailing
    * blank produced by a final newline is dropped. */
  private[graft] def decodeLines(raw: Array[Byte]): Option[Array[String]] = {
    if (raw == null) return None
    val off =
      if (raw.length >= 3 && (raw(0) & 0xff) == 0xef &&
        (raw(1) & 0xff) == 0xbb && (raw(2) & 0xff) == 0xbf) 3
      else 0
    val s =
      try utf8Strict.decode(java.nio.ByteBuffer.wrap(raw, off, raw.length - off)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    var i = 0
    while (i < s.length) { // bare CR check
      if (s.charAt(i) == '\r' &&
        (i + 1 >= s.length || s.charAt(i + 1) != '\n')) return None
      i += 1
    }
    val lines = s.replace("\r\n", "\n").split("\n", -1)
    // a file ending in a newline yields one trailing "" — drop exactly
    // that one; an EXTRA blank line at EOF must reject, which falls out
    // of the cue grammar below (a blank where a block should start).
    if (lines.nonEmpty && lines.last.isEmpty) Some(lines.dropRight(1))
    else Some(lines)
  }

  /** `HH:MM:SS<sep>mmm` with 2-digit fields, minutes/seconds < 60. */
  private def timestamp(t: String, sep: Char): Option[Long] = {
    if (t.length != 12 || t.charAt(2) != ':' || t.charAt(5) != ':' ||
      t.charAt(8) != sep) return None
    def num(from: Int, len: Int): Int = {
      var v = 0; var i = from
      while (i < from + len) {
        val c = t.charAt(i)
        if (c < '0' || c > '9') return -1
        v = v * 10 + (c - '0'); i += 1
      }
      v
    }
    val h = num(0, 2); val m = num(3, 2); val sec = num(6, 2)
    val ms = num(9, 3)
    if (h < 0 || m < 0 || m >= 60 || sec < 0 || sec >= 60 || ms < 0)
      return None
    Some(h * 3600000L + m * 60000L + sec * 1000L + ms)
  }

  /** Timing line `start --> end[ settings]`; returns (start, end,
    * rest-after-end) — settings validation is the caller's (SRT
    * allows none, WebVTT a restricted key set). */
  private def timing(line: String, sep: Char): Option[(Long, Long, String)] = {
    if (line.length < 29) return None
    val start = timestamp(line.substring(0, 12), sep).getOrElse(return None)
    if (line.substring(12, 17) != " --> ") return None
    val end = timestamp(line.substring(17, 29), sep).getOrElse(return None)
    if (end <= start) return None
    Some((start, end, line.substring(29)))
  }

  private val VttSettingKeys =
    Set("vertical", "line", "position", "size", "align")

  /** WebVTT cue-settings list: space-separated key:value pairs, keys
    * from the spec set, no duplicates, values non-empty. */
  private def vttSettingsOk(rest: String): Boolean = {
    if (rest.isEmpty) return true
    if (!rest.startsWith(" ")) return false
    val toks = rest.substring(1).split(" ", -1)
    val seen = scala.collection.mutable.HashSet.empty[String]
    toks.forall { t =>
      val c = t.indexOf(':')
      c > 0 && c < t.length - 1 && VttSettingKeys(t.substring(0, c)) &&
        seen.add(t.substring(0, c))
    }
  }

  /** Text block: >=1 non-blank lines, none containing `-->`, up to the
    * next blank line or EOF; returns (text, next cursor). */
  private def textBlock(lines: Array[String], from: Int): Option[(String, Int)] = {
    var p = from
    val sb = new StringBuilder
    while (p < lines.length && lines(p).nonEmpty) {
      if (lines(p).contains("-->")) return None
      if (sb.nonEmpty) sb.append('\n')
      sb.append(lines(p))
      p += 1
    }
    if (p == from) None else Some((sb.toString, p))
  }

  /** Blank separator between blocks: exactly one blank line, and a
    * block must actually follow it (no trailing blank-blank). */
  private def sep(lines: Array[String], p: Int): Option[Int] =
    if (p >= lines.length) Some(p) // clean EOF
    else if (lines(p).isEmpty && p + 1 < lines.length &&
      lines(p + 1).nonEmpty) Some(p + 1)
    else None

  private def parseSrt(lines: Array[String]): Option[Seq[Cue]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var p = 0
    var lastStart = -1L
    while (p < lines.length) {
      val idx = lines(p)
      if (idx.isEmpty || !idx.forall(c => c >= '0' && c <= '9') ||
        idx.charAt(0) == '0') return None
      if (BigInt(idx) != out.length + 1) return None
      if (p + 1 >= lines.length) return None
      val (s, e, rest) = timing(lines(p + 1), ',').getOrElse(return None)
      if (rest.nonEmpty || s < lastStart) return None
      lastStart = s
      val (text, q) = textBlock(lines, p + 2).getOrElse(return None)
      out += Cue(out.length, None, s, e, text)
      p = sep(lines, q).getOrElse(return None)
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  private def parseVtt(lines: Array[String]): Option[Seq[Cue]] = {
    if (lines.isEmpty || lines(0) != "WEBVTT") return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Cue]
    var lastStart = -1L
    var p =
      if (lines.length == 1) 1
      else sep(lines, 1).getOrElse(return None)
    while (p < lines.length) {
      if (lines(p) == "NOTE" || lines(p).startsWith("NOTE ")) {
        // comment block: skip to next blank line
        var q = p + 1
        while (q < lines.length && lines(q).nonEmpty) {
          if (lines(q).contains("-->")) return None
          q += 1
        }
        p = sep(lines, q).getOrElse(return None)
      } else {
        val (ident, tp) =
          if (lines(p).contains("-->")) (None, p)
          else {
            if (p + 1 >= lines.length) return None
            (Some(lines(p)), p + 1)
          }
        if (tp >= lines.length) return None
        val (s, e, rest) = timing(lines(tp), '.').getOrElse(return None)
        if (!vttSettingsOk(rest) || s < lastStart) return None
        lastStart = s
        val (text, q) = textBlock(lines, tp + 1).getOrElse(return None)
        out += Cue(out.length, ident, s, e, text)
        p = sep(lines, q).getOrElse(return None)
      }
    }
    Some(out.toSeq)
  }

  /** Parse one subtitle file; kind is dispatched on the `WEBVTT`
    * header line. None on any structural/strictness violation. */
  private[graft] def parseSubs(raw: Array[Byte]): Option[(String, Seq[Cue])] = {
    val lines = decodeLines(raw).getOrElse(return None)
    if (lines.nonEmpty && lines(0) == "WEBVTT")
      parseVtt(lines).map(("vtt", _))
    else parseSrt(lines).map(("srt", _))
  }

  /** Explode a subtitle-media table into per-cue rows with text stats
    * computed from the assembled cue text. */
  def extractSubs(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("cue", IntegerType, true),
      StructField("kind", StringType, true),
      StructField("ident", StringType, true),
      StructField("start_ms", LongType, true),
      StructField("end_ms", LongType, true),
      StructField("text", StringType, true),
      StructField("n_lines", IntegerType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseSubs(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((kind, cues)) => cues.map { c =>
            var nWords = 0L; var digitSum = 0L
            c.text.split(Array(' ', '\n')).foreach { w =>
              if (w.nonEmpty) {
                nWords += 1
                w.foreach(ch => if (ch >= '0' && ch <= '9') digitSum += ch - '0')
              }
            }
            Row(r.getLong(0), c.cue, kind, c.ident.orNull, c.startMs,
              c.endMs, c.text, c.text.count(_ == '\n') + 1, nWords,
              digitSum, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null,
              null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // encoder (fixture/test side)

  private def fmt(ms: Long, sepCh: Char): String = {
    val h = ms / 3600000L; val m = ms / 60000L % 60
    val s = ms / 1000L % 60; val r = ms % 1000L
    f"$h%02d:$m%02d:$s%02d$sepCh$r%03d"
  }

  private[graft] def writeSrt(cues: Seq[Cue]): Array[Byte] =
    cues.zipWithIndex.map { case (c, i) =>
      s"${i + 1}\n${fmt(c.startMs, ',')} --> ${fmt(c.endMs, ',')}\n${c.text}"
    }.mkString("", "\n\n", "\n").getBytes("UTF-8")

  private[graft] def writeVtt(
      cues: Seq[Cue], settings: Int => String, note: Option[String]): Array[Byte] = {
    val blocks = note.map("NOTE " + _).toSeq ++
      cues.zipWithIndex.map { case (c, i) =>
        val id = c.ident.map(_ + "\n").getOrElse("")
        s"$id${fmt(c.startMs, '.')} --> ${fmt(c.endMs, '.')}${settings(i)}\n${c.text}"
      }
    ("WEBVTT" +: blocks).mkString("", "\n\n", "\n").getBytes("UTF-8")
  }

  /** Fixture: every second file WebVTT (identifiers on every third
    * cue, settings on every fourth, a NOTE block when id%3==0), the
    * rest SRT; token/digit laws mirror the tar/eml fixtures so the
    * oracle stays closed-form; two-line cue text on odd (id+k). */
  def subFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val cues = (0 until 3 + i % 4).map { k =>
        val start = (i % 3) * 3600000L + i * 61000L + k * 4000L +
          (i * 7 + k * 13) % 1000
        val end = start + 1500L + 100L * ((i + k) % 5)
        val nt = 8 + (i + k) % 5
        val toks = (0 until nt).map(j => s"t${(i * 7 + k * 3 + j) % 10}")
        val text =
          if ((i + k) % 2 == 0) toks.mkString(" ")
          else toks.take(5).mkString(" ") + "\n" + toks.drop(5).mkString(" ")
        val ident =
          if (i % 2 == 1 && k % 3 == 1) Some(s"c${i}_$k") else None
        Cue(k, ident, start, end, text)
      }
      val media =
        if (i % 2 == 0) writeSrt(cues)
        else writeVtt(
          cues,
          k => if (k % 4 == 2) " align:start position:10%" else "",
          if (i % 3 == 0) Some(s"graft fixture $i") else None)
      Row(i.toLong, media)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
