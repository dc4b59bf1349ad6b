package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MIME e-mail (EML) extraction — RFC 5322 message framing with the
  * RFC 2045 content machinery. Mail corpora are a first-class LLM
  * training-data source and the formats are layered exactly like the
  * web-archive family: an envelope (headers), a structural container
  * (multipart), and per-part transfer codecs that must be REALLY
  * decoded before any text analysis sees the bytes.
  *
  *  - RFC 5322 header block: CRLF lines, folding (continuation lines
  *    start with WSP) unfolded, field names restricted to printable
  *    US-ASCII minus ':'; From / To / Subject / Date / MIME-Version
  *    1.0 / Content-Type all REQUIRED, duplicates of the required
  *    fields reject;
  *  - Date: strict RFC 5322 date-time profile
  *    `Day, D Mon YYYY HH:MM:SS ±ZZZZ` — and the named day-of-week
  *    must AGREE with the civil date (a lying `Tue,` rejects);
  *  - `multipart/mixed` walk: boundary from the Content-Type
  *    parameter (token or quoted-string), preamble and epilogue
  *    skipped per the spec, every delimiter line exact (no transport
  *    padding accepted), closing `--boundary--` required, at least
  *    one part;
  *  - per-part Content-Transfer-Encoding: `7bit` (bytes ≤ 0x7E, no
  *    bare CR/LF or NUL), `quoted-printable` (strict RFC 2045 §6.7:
  *    uppercase hex only, soft line breaks, no trailing WSP before a
  *    hard break, encoded lines ≤ 76 chars), `base64` (strict
  *    alphabet, CRLF line breaks only, correct padding, lines ≤ 76);
  *    anything else — 8bit/binary/uuencode — REJECTED, not guessed;
  *  - part charset must be utf-8 or us-ascii (absent Content-Type
  *    defaults to `text/plain; charset=us-ascii` per RFC 2045 §5.2).
  *
  * Stats come from the DECODED part bodies, so the oracle hash gate
  * spans header framing, the multipart walk and both transfer
  * codecs. One blob = one task-local walk (codec-family plan shape).
  */
object MimeLake {

  private[graft] final case class MimePart(
      part: Int, contentType: String, encoding: String,
      payload: Array[Byte])

  // ------------------------------------------------------------------
  // RFC 5322 date-time (strict profile, day-of-week verified)

  private val Days = Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private val Months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private val DateRe =
    ("^(Mon|Tue|Wed|Thu|Fri|Sat|Sun), (\\d{1,2}) " +
      "(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) (\\d{4}) " +
      "(\\d{2}):(\\d{2}):(\\d{2}) ([+-])(\\d{2})(\\d{2})$").r

  private[graft] def rfc5322Epoch(s: String): Option[Long] = s match {
    case DateRe(dow, d, mon, y, h, mi, se, sign, oh, om) =>
      try {
        val off = java.time.ZoneOffset.ofHoursMinutes(
          (if (sign == "-") -1 else 1) * oh.toInt,
          (if (sign == "-") -1 else 1) * om.toInt)
        val dt = java.time.OffsetDateTime.of(y.toInt,
          Months.indexOf(mon) + 1, d.toInt, h.toInt, mi.toInt, se.toInt,
          0, off)
        // the named day must agree with the civil date
        if (Days(dt.getDayOfWeek.getValue - 1) != dow) None
        else Some(dt.toEpochSecond)
      } catch { case _: java.time.DateTimeException => None }
    case _ => None
  }

  // ------------------------------------------------------------------
  // header block

  /** Read the CRLF header block at `off`, unfolding continuations.
    * Returns (fields in order, offset past the blank line). */
  private def headerBlock(
      b: Array[Byte], off: Int): Option[(Seq[(String, String)], Int)] = {
    var p = off
    def line(): Option[String] = {
      var q = p
      while (q + 1 < b.length && !(b(q) == '\r' && b(q + 1) == '\n')) q += 1
      if (q + 1 >= b.length) None
      else { val s = new String(b, p, q - p, "ISO-8859-1"); p = q + 2; Some(s) }
    }
    val raw = scala.collection.mutable.ArrayBuffer.empty[String]
    var l = line()
    while (l.exists(_.nonEmpty)) {
      val s = l.get
      if (s.head == ' ' || s.head == '\t') { // folded continuation
        if (raw.isEmpty) return None
        raw(raw.length - 1) = raw.last + " " + s.trim
      } else raw += s
      l = line()
    }
    if (l.isEmpty) return None // buffer ended before the blank line
    val fields = raw.map { s =>
      val c = s.indexOf(':')
      if (c <= 0) return None
      val name = s.substring(0, c)
      // field names: printable US-ASCII minus ':' (RFC 5322 §2.2)
      if (!name.forall(ch => ch > ' ' && ch <= '~' && ch != ':')) return None
      (name.toLowerCase, s.substring(c + 1).trim)
    }
    Some((fields.toSeq, p))
  }

  /** `type/subtype` plus parameters; boundary/charset may be a token
    * or a quoted-string. */
  private def contentType(v: String): Option[(String, Map[String, String])] = {
    val parts = v.split(";").map(_.trim)
    val mt = parts.head.toLowerCase
    if (!mt.matches("[a-z0-9.+-]+/[a-z0-9.+-]+")) return None
    val params = parts.tail.filter(_.nonEmpty).map { kv =>
      val eq = kv.indexOf('=')
      if (eq <= 0) return None
      val k = kv.substring(0, eq).trim.toLowerCase
      var value = kv.substring(eq + 1).trim
      if (value.length >= 2 && value.head == '"' && value.last == '"')
        value = value.substring(1, value.length - 1)
      if (value.isEmpty) return None
      (k, value)
    }
    Some((mt, params.toMap))
  }

  // ------------------------------------------------------------------
  // transfer codecs (strict)

  /** 7bit: US-ASCII ≤ 0x7E, no NUL, CR and LF only as CRLF pairs. */
  private def check7bit(c: Array[Byte]): Option[Array[Byte]] = {
    var i = 0
    while (i < c.length) {
      val v = c(i) & 0xff
      if (v == 0 || v > 0x7e) return None
      if (v == '\r') {
        if (i + 1 >= c.length || c(i + 1) != '\n') return None
        i += 1
      } else if (v == '\n') return None // bare LF
      i += 1
    }
    Some(c)
  }

  /** Strict RFC 2045 §6.7 quoted-printable: uppercase hex escapes,
    * soft line breaks, no raw chars outside 0x20-0x7E minus '=', no
    * trailing WSP before a hard CRLF, encoded lines ≤ 76 chars. */
  private[graft] def decodeQp(c: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(c.length)
    var i = 0
    var lineLen = 0
    def hex(v: Int): Int =
      if (v >= '0' && v <= '9') v - '0'
      else if (v >= 'A' && v <= 'F') v - 'A' + 10
      else -1 // lowercase hex is a violation of the canonical form
    while (i < c.length) {
      val v = c(i) & 0xff
      if (lineLen > 76) return None
      if (v == '=') {
        if (i + 2 < c.length && c(i + 1) == '\r' && c(i + 2) == '\n') {
          i += 3; lineLen = 0 // soft line break
        } else if (i + 2 < c.length) {
          val h = hex(c(i + 1) & 0xff); val l = hex(c(i + 2) & 0xff)
          if (h < 0 || l < 0) return None
          out.write((h << 4) | l); i += 3; lineLen += 3
        } else return None
      } else if (v == '\r') {
        if (i + 1 >= c.length || c(i + 1) != '\n') return None
        // hard break: the char before it must not be SP/TAB
        if (i > 0 && ((c(i - 1) & 0xff) == ' ' || (c(i - 1) & 0xff) == '\t'))
          return None
        out.write('\r'); out.write('\n'); i += 2; lineLen = 0
      } else if (v == ' ' || v == '\t' ||
          (v >= 0x21 && v <= 0x7e)) {
        out.write(v); i += 1; lineLen += 1
      } else return None
    }
    Some(out.toByteArray)
  }

  /** Strict base64: alphabet + CRLF line breaks only, lines ≤ 76,
    * '=' padding only at the very end, total a multiple of 4. */
  private[graft] def decodeB64(c: Array[Byte]): Option[Array[Byte]] = {
    val sb = new StringBuilder(c.length)
    var i = 0
    var lineLen = 0
    while (i < c.length) {
      val v = c(i) & 0xff
      if (v == '\r') {
        if (i + 1 >= c.length || c(i + 1) != '\n') return None
        if (lineLen == 0 || lineLen > 76) return None
        i += 2; lineLen = 0
      } else if ((v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
          (v >= '0' && v <= '9') || v == '+' || v == '/' || v == '=') {
        sb.append(v.toChar); i += 1; lineLen += 1
      } else return None
    }
    if (lineLen > 76) return None
    val s = sb.toString
    if (s.length % 4 != 0) return None
    val pad = s.indexOf('=')
    if (pad >= 0 && pad < s.length - 2) return None // '=' mid-stream
    try Some(java.util.Base64.getDecoder.decode(s))
    catch { case _: IllegalArgumentException => None }
  }

  private def decodePart(
      enc: String, c: Array[Byte]): Option[Array[Byte]] = enc match {
    case "7bit" => check7bit(c)
    case "quoted-printable" => decodeQp(c)
    case "base64" => decodeB64(c)
    case _ => None // 8bit / binary / uuencode: rejected
  }

  /** Part headers default to text/plain; charset=us-ascii + 7bit
    * (RFC 2045 §5.2, §6.1); charset restricted to utf-8/us-ascii. */
  private def decodeEntity(
      fields: Seq[(String, String)], content: Array[Byte],
      part: Int): Option[MimePart] = {
    if (fields.map(_._1).distinct.length != fields.length) return None
    val h = fields.toMap
    val (mt, params) = h.get("content-type") match {
      case Some(v) => contentType(v).getOrElse(return None)
      case None => ("text/plain", Map("charset" -> "us-ascii"))
    }
    if (mt != "text/plain") return None
    val cs = params.getOrElse("charset", "us-ascii").toLowerCase
    if (cs != "utf-8" && cs != "us-ascii") return None
    val enc = h.getOrElse("content-transfer-encoding", "7bit")
      .toLowerCase
    val payload = decodePart(enc, content).getOrElse(return None)
    Some(MimePart(part, mt, enc, payload))
  }

  // ------------------------------------------------------------------
  // message walk

  private[graft] def parseEml(
      b: Array[Byte]): Option[(Long, Seq[MimePart])] = {
    if (b == null || b.length < 4) return None
    val (fields, bodyOff) = headerBlock(b, 0).getOrElse(return None)
    val names = fields.map(_._1)
    for (req <- Seq("from", "to", "subject", "date", "mime-version",
        "content-type"))
      if (names.count(_ == req) != 1) return None
    val h = fields.toMap
    if (h("mime-version") != "1.0") return None
    val epoch = rfc5322Epoch(h("date")).getOrElse(return None)
    val (mt, params) = contentType(h("content-type")).getOrElse(return None)
    val body = java.util.Arrays.copyOfRange(b, bodyOff, b.length)
    if (mt == "multipart/mixed") {
      val boundary = params.getOrElse("boundary", return None)
      if (boundary.isEmpty || boundary.length > 70 ||
          !boundary.forall(ch => ch > ' ' && ch <= '~')) return None
      val parts = splitMultipart(body, boundary).getOrElse(return None)
      if (parts.isEmpty) return None
      val decoded = parts.zipWithIndex.map { case (p, k) =>
        val (pf, po) = headerBlock(p, 0).getOrElse(return None)
        decodeEntity(pf,
          java.util.Arrays.copyOfRange(p, po, p.length), k)
          .getOrElse(return None)
      }
      Some((epoch, decoded))
    } else {
      // single-part: the top-level headers ARE the entity headers
      val ent = decodeEntity(
        fields.filter(f => f._1 == "content-type" ||
          f._1 == "content-transfer-encoding"), body, 0)
        .getOrElse(return None)
      Some((epoch, Seq(ent)))
    }
  }

  /** RFC 2046 §5.1.1: preamble CRLF --b CRLF part (CRLF --b CRLF
    * part)* CRLF --b-- epilogue. Delimiter lines must be exact (no
    * transport padding). */
  private def splitMultipart(
      body: Array[Byte], boundary: String): Option[Seq[Array[Byte]]] = {
    val text = new String(body, "ISO-8859-1")
    val dash = "--" + boundary
    // locate delimiter LINES: at start of body or preceded by CRLF
    var idx = List.empty[(Int, Boolean)] // (line start, isClosing)
    var from = 0
    while (from <= text.length - dash.length) {
      val at = text.indexOf(dash, from)
      if (at < 0) from = text.length + 1
      else {
        val atLineStart = at == 0 ||
          (at >= 2 && text(at - 2) == '\r' && text(at - 1) == '\n')
        if (atLineStart) {
          val rest = at + dash.length
          if (rest + 1 < text.length && text(rest) == '\r' &&
              text(rest + 1) == '\n')
            idx = idx :+ ((at, false))
          else if (rest + 1 < text.length && text(rest) == '-' &&
              text(rest + 1) == '-')
            idx = idx :+ ((at, true))
          // anything else on the delimiter line (padding, partial
          // match) is not a delimiter — keep scanning
        }
        from = at + 1
      }
    }
    if (idx.isEmpty) return None
    val closingAt = idx.lastOption.filter(_._2).map(_._1)
      .getOrElse(return None)
    if (idx.init.exists(_._2)) return None // closing delimiter not last
    val opens = idx.init.map(_._1)
    if (opens.isEmpty) return None
    // epilogue after the closing line: either nothing or CRLF + text
    val afterClose = closingAt + dash.length + 2
    if (afterClose < text.length &&
        !(text.startsWith("\r\n", afterClose))) return None
    val bounds = opens :+ closingAt
    val parts = bounds.sliding(2).map { w =>
      val start = w(0) + dash.length + 2 // past "--b\r\n"
      // the CRLF before the next delimiter belongs to the DELIMITER,
      // not the part content (RFC 2046 §5.1.1)
      val end = w(1) - 2
      if (end < start) return None
      java.util.Arrays.copyOfRange(body, start, end)
    }.toSeq
    Some(parts)
  }

  // ------------------------------------------------------------------
  // DataFrame surface

  def extractEml(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("part", IntegerType, true),
      StructField("content_type", StringType, true),
      StructField("encoding", StringType, true),
      StructField("date_epoch", LongType, true),
      StructField("body_len", LongType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseEml(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((epoch, parts)) => parts.map { e =>
            val (nWords, digitSum) = Warc.payloadStats(e.payload)
            Row(r.getLong(0), e.part, e.contentType, e.encoding, epoch,
              e.payload.length.toLong, nWords, digitSum, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // encoders (fixture/test side)

  /** Canonical QP encode: escape '=' and non-printables, soft break
    * at column 60. */
  private[graft] def encodeQp(body: Array[Byte]): String = {
    val sb = new StringBuilder
    var lineLen = 0
    body.foreach { bb =>
      val v = bb & 0xff
      val tok =
        if (v == '=' || v < 0x20 || v > 0x7e) f"=${v}%02X" else v.toChar.toString
      if (lineLen + tok.length > 60) { sb.append("=\r\n"); lineLen = 0 }
      sb.append(tok); lineLen += tok.length
    }
    sb.toString
  }

  /** Build one EML blob. Multi-part when `parts.length > 1`. */
  private[graft] def buildEml(
      from: String, to: String, subject: String, date: String,
      parts: Seq[(String, Array[Byte])], boundary: String): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(s"From: $from\r\nTo: $to\r\nSubject: $subject\r\n")
    sb.append(s"Date: $date\r\nMIME-Version: 1.0\r\n")
    def encoded(enc: String, body: Array[Byte]): String = enc match {
      case "7bit" => new String(body, "ISO-8859-1")
      case "quoted-printable" => encodeQp(body)
      case "base64" =>
        // the JDK's OWN MIME encoder — an independent producer the
        // strict decoder must agree with
        new String(java.util.Base64.getMimeEncoder(76,
          Array[Byte]('\r', '\n')).encode(body), "ISO-8859-1")
    }
    if (parts.length == 1) {
      val (enc, body) = parts.head
      sb.append("Content-Type: text/plain; charset=utf-8\r\n")
      sb.append(s"Content-Transfer-Encoding: $enc\r\n\r\n")
      sb.append(encoded(enc, body))
    } else {
      sb.append(
        s"""Content-Type: multipart/mixed; boundary="$boundary"\r\n\r\n""")
      sb.append("This is a MIME message preamble.\r\n")
      parts.foreach { case (enc, body) =>
        sb.append(s"--$boundary\r\n")
        sb.append("Content-Type: text/plain; charset=utf-8\r\n")
        sb.append(s"Content-Transfer-Encoding: $enc\r\n\r\n")
        sb.append(encoded(enc, body)).append("\r\n")
      }
      sb.append(s"--$boundary--\r\nepilogue text here")
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  private val Encs = Seq("7bit", "quoted-printable", "base64")

  /** Fixture laws (mirrored closed-form by the q166 oracle):
    * np = 1/3/4 by id%3; part k encoding cycles [[Encs]] by (id+k);
    * body = nt tokens `m<d>` with '=' appended when j%4==3 (forces
    * QP escapes); Date formatted by the JDK's OWN RFC_1123 formatter
    * over three non-UTC offsets. */
  def emlFixture(spark: SparkSession, n: Int): DataFrame = {
    val offs = Seq(java.time.ZoneOffset.ofHours(1),
      java.time.ZoneOffset.ofHours(-5),
      java.time.ZoneOffset.ofHoursMinutes(5, 30))
    val rows = (0 until n).map { i =>
      val np = Seq(1, 3, 4)(i % 3)
      val parts = (0 until np).map { k =>
        val nt = 8 + (i + k) % 5
        val body = (0 until nt).map { j =>
          s"m${(i * 7 + k * 3 + j) % 10}" + (if (j % 4 == 3) "=" else "")
        }.mkString(" ").getBytes("UTF-8")
        (Encs((i + k) % 3), body)
      }
      val epoch = 1704067200L + i * 86400L + i * 61L
      val date = java.time.OffsetDateTime
        .ofInstant(java.time.Instant.ofEpochSecond(epoch), offs(i % 3))
        .format(java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
      val eml = buildEml(s"a$i@example.com", s"b$i@example.com",
        s"Report $i", date, parts, s"b-$i")
      Row(i.toLong, eml)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
