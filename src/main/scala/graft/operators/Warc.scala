package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Web-archive (WARC, ISO 28500) ingestion — the Common Crawl layout
  * every large text-corpus pipeline starts from. REAL decode end to
  * end: the gzip member walk parses RFC 1952 headers (magic, CM=8,
  * FTEXT/FHCRC/FEXTRA/FNAME/FCOMMENT optional fields) and inflates
  * the DEFLATE body through the JDK's `java.util.zip.Inflater`
  * (nowrap), verifying BOTH trailer fields — CRC-32 of the
  * uncompressed payload and ISIZE — before the member is accepted;
  * WARC records are then parsed strictly (version line, header
  * fields, exact Content-Length payload, the mandatory CRLF CRLF
  * record terminator). Two physical layouts are supported, sniffed
  * per record boundary:
  *
  *  - per-record gzip members back to back (the Common Crawl
  *    convention for .warc.gz / .wet.gz — each record is its own
  *    member so readers can split archives without a full scan), and
  *  - plain concatenated records (uncompressed .warc).
  *
  * Scale posture: one blob = one task-local walk (records never span
  * blobs), so the operator is embarrassingly parallel over the
  * archive table and the plan stays a single per-partition pass —
  * the same shape as the codec decoders (audited in PlanAuditSpec).
  * Reference behavior anchor: the reference pipeline's
  * fetch+decode+scale stage (main.py:60-118) — here re-expressed for
  * the web-archive media type the north star needs.
  */
object Warc {

  /** One decoded record: header fields + the decoded payload bytes. */
  private[graft] final case class WarcRec(
      rec: Int, warcType: String, uri: String, dateEpoch: Long,
      contentLength: Long, payload: Array[Byte])

  // ------------------------------------------------------------------
  // gzip member walk (RFC 1952)

  /** Inflate ONE gzip member starting at `off`; returns (payload,
    * bytesConsumed) or None on any structural/CRC/ISIZE violation. */
  private[graft] def gunzipMember(
      b: Array[Byte], off: Int): Option[(Array[Byte], Int)] = {
    var p = off
    def u8(i: Int): Int = b(i) & 0xff
    if (p + 10 > b.length) return None
    if (u8(p) != 0x1f || u8(p + 1) != 0x8b || u8(p + 2) != 8) return None
    val flg = u8(p + 3)
    if ((flg & 0xe0) != 0) return None // reserved flag bits must be 0
    p += 10 // MTIME/XFL/OS carried but unconstrained
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > b.length) return None
      val xlen = u8(p) | (u8(p + 1) << 8)
      p += 2 + xlen
      if (p > b.length) return None
    }
    if ((flg & 8) != 0) { // FNAME: zero-terminated
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return None
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return None
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC: CRC-16 of the header bytes so far
      if (p + 2 > b.length) return None
      val crc = new java.util.zip.CRC32
      crc.update(b, off, p - off)
      val want = u8(p) | (u8(p + 1) << 8)
      if ((crc.getValue & 0xffff).toInt != want) return None
      p += 2
    }
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(b, p, b.length - p)
      val out = new java.io.ByteArrayOutputStream(256)
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n > 0) out.write(buf, 0, n)
        // an empty member finishes in the same call that returns 0;
        // only an UNfinished stall is a truncation (dictionary:
        // impossible for raw deflate, guarded anyway)
        else if (!inf.finished() &&
            (inf.needsInput() || inf.needsDictionary()))
          return None
      }
      val used = (b.length - p) - inf.getRemaining
      p += used
      if (p + 8 > b.length) return None
      val payload = out.toByteArray
      val crc = new java.util.zip.CRC32
      crc.update(payload)
      val wantCrc = (u8(p).toLong | (u8(p + 1).toLong << 8) |
        (u8(p + 2).toLong << 16) | (u8(p + 3).toLong << 24)) & 0xffffffffL
      val wantIsize = (u8(p + 4).toLong | (u8(p + 5).toLong << 8) |
        (u8(p + 6).toLong << 16) | (u8(p + 7).toLong << 24)) & 0xffffffffL
      if (crc.getValue != wantCrc) return None
      if ((payload.length.toLong & 0xffffffffL) != wantIsize) return None
      Some((payload, p + 8 - off))
    } finally inf.end()
  }

  /** Gzip-wrap one payload (fixture/test side — REAL compression via
    * the JDK Deflater; optional FNAME/FEXTRA fields to exercise the
    * header walk). */
  private[graft] def gzipMember(
      payload: Array[Byte], fname: Option[String] = None,
      extra: Option[Array[Byte]] = None): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    val flg = (if (extra.isDefined) 4 else 0) | (if (fname.isDefined) 8 else 0)
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, flg.toByte,
      0, 0, 0, 0, 0, 0xff.toByte))
    extra.foreach { x =>
      out.write(x.length & 0xff); out.write((x.length >> 8) & 0xff)
      out.write(x)
    }
    fname.foreach { n => out.write(n.getBytes("ISO-8859-1")); out.write(0) }
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    val c = crc.getValue; val n = payload.length.toLong
    out.write(Array[Byte](
      (c & 0xff).toByte, ((c >> 8) & 0xff).toByte,
      ((c >> 16) & 0xff).toByte, ((c >> 24) & 0xff).toByte,
      (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte))
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // WARC record parse (ISO 28500)

  private val DateRe =
    "([0-9]{4})-([0-9]{2})-([0-9]{2})T([0-9]{2}):([0-9]{2}):([0-9]{2})Z".r

  /** Strict epoch-seconds parse of the WARC-Date profile of ISO 8601
    * (UTC, second precision — the profile ISO 28500 §5.4 mandates). */
  private[graft] def warcDateEpoch(s: String): Option[Long] = s match {
    case DateRe(y, mo, d, h, mi, se) =>
      try Some(java.time.OffsetDateTime.of(y.toInt, mo.toInt, d.toInt,
        h.toInt, mi.toInt, se.toInt, 0, java.time.ZoneOffset.UTC)
        .toEpochSecond)
      catch { case _: java.time.DateTimeException => None }
    case _ => None
  }

  /** Parse ONE plain (uncompressed) WARC record starting at `off`;
    * returns (record, bytesConsumed). Strict: WARC/1.0 version line,
    * CRLF line endings, mandatory WARC-Type / WARC-Record-ID /
    * WARC-Date / Content-Length headers, exact-length payload, the
    * two-CRLF record terminator. */
  private[graft] def parseRecord(
      b: Array[Byte], off: Int, recIdx: Int): Option[(WarcRec, Int)] = {
    var p = off
    def line(): Option[String] = {
      var q = p
      while (q + 1 < b.length && !(b(q) == '\r' && b(q + 1) == '\n')) q += 1
      if (q + 1 >= b.length) None
      else {
        val s = new String(b, p, q - p, "ISO-8859-1")
        p = q + 2
        Some(s)
      }
    }
    line() match {
      case Some("WARC/1.0") =>
      case _                => return None
    }
    var wtype: String = null; var uri = ""; var date: String = null
    var rid: String = null; var clen = -1L
    var l = line()
    while (l.exists(_.nonEmpty)) {
      val s = l.get
      val i = s.indexOf(':')
      if (i <= 0) return None
      val k = s.substring(0, i).trim.toLowerCase
      val v = s.substring(i + 1).trim
      k match {
        case "warc-type"       => wtype = v
        case "warc-target-uri" => uri = v
        case "warc-date"       => date = v
        case "warc-record-id"  => rid = v
        case "content-length"  =>
          clen = try v.toLong catch { case _: NumberFormatException => -1L }
        case _ => // tolerated: Content-Type etc.
      }
      l = line()
    }
    if (l.isEmpty) return None // ran off the buffer before the blank line
    if (wtype == null || date == null || rid == null || clen < 0) return None
    val epochOpt = warcDateEpoch(date)
    if (epochOpt.isEmpty) return None
    val epoch = epochOpt.get
    if (p + clen + 4 > b.length) return None
    val payload = java.util.Arrays.copyOfRange(b, p, p + clen.toInt)
    p += clen.toInt
    if (!(b(p) == '\r' && b(p + 1) == '\n' &&
        b(p + 2) == '\r' && b(p + 3) == '\n')) return None
    p += 4
    Some((WarcRec(recIdx, wtype, uri, epoch, clen, payload), p - off))
  }

  /** Payload-derived stats: whitespace words and a digit sum that
    * proves the DECODED content (not just lengths) survived
    * decompression. */
  private[graft] def payloadStats(payload: Array[Byte]): (Long, Long) = {
    val s = new String(payload, "UTF-8")
    var nWords = 0L; var digitSum = 0L
    if (s.nonEmpty) {
      s.split(' ').foreach { w =>
        if (w.nonEmpty) {
          nWords += 1
          w.foreach(c => if (c >= '0' && c <= '9') digitSum += c - '0')
        }
      }
    }
    (nWords, digitSum)
  }

  /** Strict HTTP/1.x response-envelope parse (the payload format of
    * WARC `response` records — RFC 9112 framing): status line,
    * header fields to the blank line, body = the rest; if the
    * response declares Content-Length it must match the body length
    * exactly. Returns (status, content-type lowercased without
    * parameters, body). */
  private[graft] def parseHttp(p: Array[Byte]): Option[(Int, String, Array[Byte])] = {
    var i = 0
    def line(): Option[String] = {
      var q = i
      while (q + 1 < p.length && !(p(q) == '\r' && p(q + 1) == '\n')) q += 1
      if (q + 1 >= p.length) None
      else { val s = new String(p, i, q - i, "ISO-8859-1"); i = q + 2; Some(s) }
    }
    val status = line() match {
      case Some(sl) =>
        val parts = sl.split(" ", 3)
        if (parts.length < 2 || !parts(0).matches("HTTP/1\\.[01]")) return None
        try parts(1).toInt catch { case _: NumberFormatException => return None }
      case None => return None
    }
    if (status < 100 || status > 599) return None
    var ctype = ""; var clen = -1L
    var l = line()
    while (l.exists(_.nonEmpty)) {
      val s = l.get
      val c = s.indexOf(':')
      if (c <= 0) return None
      val k = s.substring(0, c).trim.toLowerCase
      val v = s.substring(c + 1).trim
      if (k == "content-type")
        ctype = v.split(";")(0).trim.toLowerCase
      else if (k == "content-length")
        clen = try v.toLong catch { case _: NumberFormatException => -1L }
      l = line()
    }
    if (l.isEmpty) return None // no blank line before body
    val body = java.util.Arrays.copyOfRange(p, i, p.length)
    if (clen >= 0 && clen != body.length.toLong) return None
    Some((status, ctype, body))
  }

  /** Walk one archive blob: at each record boundary sniff gzip magic
    * vs a plain "WARC/" version line; reject anything else, any
    * member-decode failure, or trailing garbage. */
  private[graft] def parseArchive(b: Array[Byte]): Option[Seq[WarcRec]] = {
    if (b == null || b.length < 4) return None
    var p = 0
    val recs = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    while (p < b.length) {
      if ((b(p) & 0xff) == 0x1f && p + 1 < b.length &&
          (b(p + 1) & 0xff) == 0x8b) {
        val m = gunzipMember(b, p)
        if (m.isEmpty) return None
        val (payload, used) = m.get
        val pr = parseRecord(payload, 0, recs.length)
        if (pr.isEmpty) return None
        val (rec, inner) = pr.get
        if (inner != payload.length) return None // member must hold ONE record
        recs += rec
        p += used
      } else {
        val pr = parseRecord(b, p, recs.length)
        if (pr.isEmpty) return None
        val (rec, used) = pr.get
        recs += rec
        p += used
      }
    }
    if (recs.isEmpty) None else Some(recs.toSeq)
  }

  /** Explode a table of archive blobs into per-record rows. Malformed
    * archives yield one valid=false row, never throw. */
  def extractWarc(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rec", IntegerType, true),
      StructField("warc_type", StringType, true),
      StructField("uri", StringType, true),
      StructField("date_epoch", LongType, true),
      StructField("content_length", LongType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseArchive(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(recs) => recs.map { w =>
            val (nWords, digitSum) = payloadStats(w.payload)
            Row(r.getLong(0), w.rec, w.warcType, w.uri, w.dateEpoch,
              w.contentLength, nWords, digitSum, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Explode archive blobs into HTTP-level rows: WARC `response`
    * records get their HTTP envelope parsed (status, media type,
    * body as UTF-8 text); non-response records pass through with
    * null HTTP fields. A response whose envelope fails to parse
    * invalidates the whole archive — same strictness as the member
    * walk. */
  def extractWarcHttp(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rec", IntegerType, true),
      StructField("warc_type", StringType, true),
      StructField("uri", StringType, true),
      StructField("date_epoch", LongType, true),
      StructField("status", IntegerType, true),
      StructField("content_type", StringType, true),
      StructField("body", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val parsed = scala.util.Try(parseArchive(r.getAs[Array[Byte]](1)))
          .toOption.flatten.flatMap { recs =>
            val out = recs.map { w =>
              if (w.warcType == "response") parseHttp(w.payload).map {
                case (status, ctype, body) =>
                  Row(r.getLong(0), w.rec, w.warcType, w.uri, w.dateEpoch,
                    status, ctype, new String(body, "UTF-8"), true)
              }
              else Some(Row(r.getLong(0), w.rec, w.warcType, w.uri,
                w.dateEpoch, null, null,
                new String(w.payload, "UTF-8"), true))
            }
            if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
          }
        parsed.getOrElse(Seq(Row(r.getLong(0), null, null, null, null,
          null, null, null, false)))
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Build one record's bytes (fixture/test side). */
  private[graft] def recordBytes(
      wtype: String, uri: String, date: String, rid: String,
      payload: String): Array[Byte] =
    recordBytesRaw(wtype, uri, date, rid, payload.getBytes("UTF-8"))

  private[graft] def recordBytesRaw(
      wtype: String, uri: String, date: String, rid: String,
      body: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder
    head.append("WARC/1.0\r\n")
    head.append(s"WARC-Type: $wtype\r\n")
    if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
    head.append(s"WARC-Date: $date\r\n")
    head.append(s"WARC-Record-ID: $rid\r\n")
    head.append("Content-Type: text/plain\r\n")
    head.append(s"Content-Length: ${body.length}\r\n\r\n")
    head.toString.getBytes("ISO-8859-1") ++ body ++
      "\r\n\r\n".getBytes("ISO-8859-1")
  }

  /** Build one HTTP response payload (fixture/test side). */
  private[graft] def httpResponse(
      status: Int, reason: String, ctype: String,
      body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status $reason\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.length}\r\nServer: graft-fixture\r\n\r\n")
      .getBytes("ISO-8859-1") ++ body

  /** Deterministic crawl-shaped fixture replayed closed-form by the
    * q159 oracle: per-record-gzipped WARC `response` records whose
    * HTTP bodies are law-HTML pages (plus every fourth record a 404
    * text/plain miss and every sixth a `metadata` record — both must
    * be FILTERED by the pipeline, not crash it). */
  def warcHttpFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nr = 3 + i % 3
      val out = new java.io.ByteArrayOutputStream()
      (0 until nr).foreach { r =>
        val epoch = 1704067200L + i * 60 + r
        val date = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
          .format(java.time.Instant.ofEpochSecond(epoch)
            .atOffset(java.time.ZoneOffset.UTC))
        val uri = s"https://crawl.example/$i/$r"
        val recBytes =
          if ((i + r) % 6 == 5)
            recordBytes("metadata", uri, date, s"<urn:uuid:m-$i-$r>",
              s"meta $i $r")
          else if ((i + r) % 4 == 3)
            recordBytesRaw("response", uri, date, s"<urn:uuid:x-$i-$r>",
              httpResponse(404, "Not Found", "text/plain",
                s"missing $i/$r".getBytes("UTF-8")))
          else {
            val nw = 4 + (i + r) % 5
            val words = (0 until nw)
              .map(k => s"t${(i * 5 + r * 7 + k) % 10}").mkString(" ")
            val html =
              s"""<html><head><title>Page $i/$r</title>""" +
                """<script>track("<div>");</script></head>""" +
                s"""<body><h1>Doc $i &#45; $r</h1>""" +
                s"""<p>$words</p>""" +
                s"""<div>end&nbsp;$i</div></body></html>"""
            recordBytesRaw("response", uri, date, s"<urn:uuid:h-$i-$r>",
              httpResponse(200, "OK",
                "text/html; charset=utf-8", html.getBytes("UTF-8")))
          }
        out.write(gzipMember(recBytes))
      }
      Row(i.toLong, out.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic archive fixture replayed closed-form by the q157
    * oracle: 3-6 records per blob, token payloads `w<digit>` with a
    * per-(id,rec,k) digit law, dates on a per-(id,rec) second law,
    * types cycling conversion/metadata. Blobs with id % 5 == 4 are
    * PLAIN .warc; the rest are per-record gzip members (Common Crawl
    * layout), every third member carrying FNAME and every fourth an
    * FEXTRA field so the optional-header walk is exercised. */
  def warcFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nr = 3 + i % 4
      val out = new java.io.ByteArrayOutputStream()
      (0 until nr).foreach { r =>
        val nt = 10 + (i + r) % 6
        val payload = (0 until nt)
          .map(k => s"w${(i * 7 + r * 3 + k) % 10}").mkString(" ")
        val epoch = 1704067200L + i * 60 + r
        val date = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
          .format(java.time.Instant.ofEpochSecond(epoch)
            .atOffset(java.time.ZoneOffset.UTC))
        val rec = recordBytes(
          if (r % 2 == 0) "conversion" else "metadata",
          s"https://example.com/$i/$r", date,
          s"<urn:uuid:$i-$r>", payload)
        if (i % 5 == 4) out.write(rec)
        else out.write(gzipMember(rec,
          fname = if (r % 3 == 1) Some(s"rec$r.warc") else None,
          extra = if (r % 4 == 2) Some(Array[Byte](65, 66, 1, 0, 88)) else None))
      }
      Row(i.toLong, out.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
