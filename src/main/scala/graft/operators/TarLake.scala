package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TAR bundle extraction (POSIX.1-1988 ustar + POSIX.1-2001 pax +
  * GNU longnames; tar(5), pax(1)) — with ZIP the other archive format
  * data lakes actually receive (dataset dumps, model checkpoints,
  * scraped-site exports ship as .tar / .tar.gz; modern GNU tar emits
  * pax by default and every recent PyPI sdist is pax format). REAL
  * parse end to end, written against the header layout spec:
  *
  *  - 512-byte header blocks: strict octal field parse (leading
  *    spaces, octal digits, NUL/space terminated — anything else
  *    rejects), unsigned header checksum verified with the checksum
  *    field blanked to spaces per the spec;
  *  - magic: POSIX `ustar\0` + version `00`, OR the old-GNU variant
  *    `ustar  \0` (magic+version read together as "ustar  " + NUL).
  *    GNU-magic headers get NO prefix joining — offset 345 is not a
  *    prefix field in that layout (it holds atime/ctime in
  *    incremental dumps), so only name[100] / an 'L' record names
  *    the entry;
  *  - pax extended headers: 'x' (next-entry) records parsed with the
  *    full "<len> key=value\n" framing law (len counts the whole
  *    record INCLUDING its own digits; strict UTF-8; duplicate keys
  *    reject). `path`, `size` and `mtime` (fractional seconds
  *    floored) override the following entry; unrecognized keywords
  *    are ignored per POSIX. A 'g' (global) header is framing-checked
  *    and ignored — except that a global `path`/`size`/`mtime`/
  *    `linkpath` is REJECTED as out of subset (a global identity
  *    override is ambiguous and no mainstream writer emits one);
  *  - GNU 'L' longname records: NUL-terminated full name for the
  *    next entry (only NULs may follow the terminator). 'K' long
  *    LINKNAME records stay rejected — link entries themselves are
  *    out of subset. Overrides must be CONSUMED: a dangling 'x'/'L'
  *    at end-of-archive, two in a row, or an 'L'+'x path' conflict
  *    all reject;
  *  - prefix[155] + name[100] path joining (POSIX magic only);
  *    regular files ('0'/NUL) and directories ('5', size forced 0)
  *    only;
  *  - payloads padded to the 512 boundary with bytes that MUST be
  *    zero; the archive must terminate in two zero blocks and only
  *    zero blocks may follow (the blocked-output tail);
  *  - `.tar.gz` layout sniffed by magic and inflated through the
  *    same RFC 1952 member walk the WARC path uses ([[Warc.gunzipMember]]
  *    — CRC-32 AND ISIZE verified), with exactly ONE member spanning
  *    the whole file.
  *
  * One blob = one task-local walk (embarrassingly parallel over the
  * bundle table; the codec-family plan shape — no shuffle beyond the
  * presentation sort, gated in PlanAuditSpec).
  */
object TarLake {

  private[graft] final case class TarEntry(
      entry: Int, name: String, typeflag: String,
      size: Long, mtime: Long, payload: Array[Byte])

  /** Strict octal field: optional leading spaces, >=1 octal digit,
    * then only NUL/space to the end of the field. */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var p = off
    val end = off + len
    while (p < end && b(p) == ' '.toByte) p += 1
    var v = 0L
    var digits = 0
    while (p < end && b(p) >= '0'.toByte && b(p) <= '7'.toByte) {
      v = (v << 3) | (b(p) - '0'.toByte)
      digits += 1
      p += 1
    }
    if (digits == 0 || digits > 12) return None
    while (p < end) {
      if (b(p) != 0.toByte && b(p) != ' '.toByte) return None
      p += 1
    }
    Some(v)
  }

  /** NUL-terminated (or field-filling) string field. */
  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0.toByte) n += 1
    new String(b, off, n, "UTF-8")
  }

  private def zeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < 512) { if (b(off + i) != 0) return false; i += 1 }
    true
  }

  /** Unsigned byte sum of one header block with the chksum field
    * (offsets 148-155) read as eight spaces — the spec's definition. */
  private[graft] def headerChecksum(b: Array[Byte], off: Int): Long = {
    var s = 0L
    var i = 0
    while (i < 512) {
      s += (if (i >= 148 && i < 156) 0x20 else b(off + i) & 0xff)
      i += 1
    }
    s
  }

  /** Parse a pax extended-header payload: records of the form
    * "<len> <key>=<value>\n" where len (decimal, counted in BYTES)
    * covers the WHOLE record including its own digits, the space and
    * the trailing newline. Strict UTF-8; duplicate keys, bad framing,
    * or a record bomb (>7 length digits) all reject. */
  private[graft] def parsePax(body: Array[Byte]): Option[Map[String, String]] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var p = 0
    while (p < body.length) {
      var q = p
      var len = 0
      var digits = 0
      while (q < body.length && body(q) >= '0'.toByte && body(q) <= '9'.toByte) {
        len = len * 10 + (body(q) - '0'.toByte)
        digits += 1
        if (digits > 7) return None // 10 MB single record: a bomb, not pax
        q += 1
      }
      if (digits == 0 || q >= body.length || body(q) != ' '.toByte) return None
      val end = p + len
      // minimum record: digits + ' ' + key(>=1) + '=' + '\n'
      if (len < digits + 4 || end > body.length) return None
      if (body(end - 1) != '\n'.toByte) return None
      val content =
        try {
          val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          dec.decode(java.nio.ByteBuffer.wrap(body, q + 1, end - q - 2))
            .toString
        } catch {
          case _: java.nio.charset.CharacterCodingException => return None
        }
      val eq = content.indexOf('=')
      if (eq < 1) return None // '=' required, key nonempty
      val key = content.substring(0, eq)
      if (m.contains(key)) return None
      m(key) = content.substring(eq + 1)
      p = end
    }
    Some(m.toMap)
  }

  /** pax decimal value: digits only, no sign, fits a Long. */
  private def paxLong(v: String): Option[Long] =
    if (v.isEmpty || v.length > 18 || !v.forall(c => c >= '0' && c <= '9'))
      None
    else Some(v.toLong)

  /** pax time value: non-negative seconds with an optional fractional
    * part, floored to whole seconds (GNU tar emits e.g.
    * "1704067200.123456789"). */
  private def paxTime(v: String): Option[Long] = {
    val dot = v.indexOf('.')
    if (dot < 0) paxLong(v)
    else if (dot == v.length - 1) None // bare trailing dot
    else for {
      s <- paxLong(v.substring(0, dot))
      _ <- Some(()).filter(_ =>
        v.substring(dot + 1).forall(c => c >= '0' && c <= '9'))
    } yield s
  }

  /** Parse one bundle (plain tar or single-member .tar.gz); None on
    * any structural/checksum/strictness violation. */
  private[graft] def parseTar(raw: Array[Byte]): Option[Seq[TarEntry]] = {
    if (raw == null || raw.length < 2) return None
    val b: Array[Byte] =
      if ((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        Warc.gunzipMember(raw, 0) match {
          case Some((payload, consumed)) if consumed == raw.length => payload
          case _ => return None // bad member, or trailing bytes after it
        }
      else raw
    if (b.length < 1024 || b.length % 512 != 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
    var p = 0
    var i = 0
    // pending next-entry overrides (pax 'x' / GNU 'L'); MUST be
    // consumed by the next plain entry
    var paxPath: Option[String] = None
    var paxSize: Option[Long] = None
    var paxMtime: Option[Long] = None
    var longName: Option[String] = None
    def pendingAny: Boolean =
      paxPath.nonEmpty || paxSize.nonEmpty || paxMtime.nonEmpty ||
        longName.nonEmpty
    while (p + 512 <= b.length) {
      if (zeroBlock(b, p)) {
        if (pendingAny) return None // dangling 'x'/'L' with no entry
        // end-of-archive: a second zero block must follow and ONLY
        // zero blocks may trail it (blocked output padding)
        if (p + 1024 > b.length || !zeroBlock(b, p + 512)) return None
        var q = p + 1024
        while (q < b.length) { if (b(q) != 0) return None; q += 1 }
        return Some(out.toSeq)
      }
      // magic: POSIX "ustar\0" + "00", or old-GNU "ustar  \0"
      if (str(b, p + 257, 5) != "ustar") return None
      val gnuMagic =
        b(p + 262) == ' '.toByte && b(p + 263) == ' '.toByte &&
          b(p + 264) == 0.toByte
      if (!gnuMagic && (b(p + 262) != 0.toByte ||
          str(b, p + 263, 2) != "00")) return None
      val want = octal(b, p + 148, 8).getOrElse(return None)
      if (headerChecksum(b, p) != want) return None
      val fieldSize = octal(b, p + 124, 12).getOrElse(return None)
      val fieldMtime = octal(b, p + 136, 12).getOrElse(return None)
      if (octal(b, p + 100, 8).isEmpty) return None // mode must parse
      val tf = b(p + 156) & 0xff
      // the meta-entry payload ('x'/'g'/'L') is framed by the header's
      // own size field; a pax size override only applies to PLAIN
      // entries
      val size = tf match {
        case 0 | 0x30 | 0x35 => paxSize.getOrElse(fieldSize)
        case _ => fieldSize
      }
      val padded = ((size + 511L) / 512L) * 512L
      if (p + 512L + padded > b.length) return None
      val dataOff = p + 512
      var z = dataOff + size.toInt
      while (z < dataOff + padded.toInt) {
        if (b(z) != 0) return None // pad bytes must be zero
        z += 1
      }
      def payload: Array[Byte] =
        java.util.Arrays.copyOfRange(b, dataOff, dataOff + size.toInt)
      tf match {
        case 0 | 0x30 | 0x35 => // plain entry: file (NUL/'0') or dir '5'
          val typeflag = if (tf == 0x35) "dir" else "file"
          if (tf == 0x35 && size != 0L) return None
          val name0 = str(b, p, 100)
          if (name0.isEmpty) return None
          // GNU layout has no prefix field (345+ holds atime/ctime in
          // incremental dumps) — name comes from name[100] or 'L'
          val joined =
            if (gnuMagic) name0
            else {
              val prefix = str(b, p + 345, 155)
              if (prefix.isEmpty) name0 else prefix + "/" + name0
            }
          // pax path and GNU longname conflicts were rejected at set
          // time, so at most one is present here
          val name = paxPath.orElse(longName).getOrElse(joined)
          val mtime = paxMtime.getOrElse(fieldMtime)
          out += TarEntry(i, name, typeflag, size, mtime, payload)
          i += 1
          paxPath = None; paxSize = None; paxMtime = None; longName = None
        case 0x78 => // 'x': pax extended header for the NEXT entry
          if (pendingAny) return None // two in a row / after 'L'
          val recs = parsePax(payload).getOrElse(return None)
          // linkpath would describe a link entry — out of subset
          if (recs.contains("linkpath")) return None
          recs.get("path") match {
            case Some(v) =>
              if (v.isEmpty || v.indexOf(0.toChar) >= 0) return None
              paxPath = Some(v)
            case None =>
          }
          recs.get("size") match {
            case Some(v) => paxSize = Some(paxLong(v).getOrElse(return None))
            case None =>
          }
          recs.get("mtime") match {
            case Some(v) => paxMtime = Some(paxTime(v).getOrElse(return None))
            case None =>
          }
          // all other keywords: ignored per POSIX
        case 0x67 => // 'g': global header — framing-checked, ignored
          val recs = parsePax(payload).getOrElse(return None)
          // a GLOBAL identity override is ambiguous; no mainstream
          // writer emits one — out of subset
          if (recs.contains("path") || recs.contains("size") ||
              recs.contains("mtime") || recs.contains("linkpath"))
            return None
        case 0x4c => // 'L': GNU longname for the NEXT entry
          if (pendingAny) return None
          val pl = payload
          if (pl.length < 2 || pl(pl.length - 1) != 0.toByte) return None
          var n = 0
          while (n < pl.length && pl(n) != 0.toByte) n += 1
          if (n == 0) return None // empty name
          var t = n
          while (t < pl.length) {
            if (pl(t) != 0.toByte) return None // junk after terminator
            t += 1
          }
          val nm =
            try {
              val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
                .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
                .onUnmappableCharacter(
                  java.nio.charset.CodingErrorAction.REPORT)
              dec.decode(java.nio.ByteBuffer.wrap(pl, 0, n)).toString
            } catch {
              case _: java.nio.charset.CharacterCodingException =>
                return None
            }
          longName = Some(nm)
        case _ => return None // links, 'K' longlink, anything else
      }
      p = dataOff + padded.toInt
    }
    None // ran off the end without the two-zero-block terminator
  }

  /** Explode a bundle table into per-entry rows with text stats
    * computed from the extracted payload. */
  def extractTar(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("entry", IntegerType, true),
      StructField("name", StringType, true),
      StructField("typeflag", StringType, true),
      StructField("size", LongType, true),
      StructField("mtime_epoch", LongType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseTar(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(entries) => entries.map { e =>
            val (nWords, digitSum) = Warc.payloadStats(e.payload)
            Row(r.getLong(0), e.entry, e.name, e.typeflag, e.size,
              e.mtime, nWords, digitSum, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // encoder (fixture/test side)

  private def putStr(h: Array[Byte], off: Int, s: String): Unit = {
    val bs = s.getBytes("UTF-8")
    System.arraycopy(bs, 0, h, off, bs.length)
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit =
    // len-1 digits, NUL terminator — the POSIX layout
    putStr(h, off, ("%0" + (len - 1) + "o").format(v))

  /** Encode one header block, POSIX (`ustar\0` + "00") or old-GNU
    * (`ustar  \0`) magic; checksum computed per spec. GNU headers get
    * no prefix field (that layout has none). */
  private[graft] def tarHeaderExt(
      name: String, prefix: String, typeflag: Char, size: Long,
      mtime: Long, gnu: Boolean): Array[Byte] = {
    val h = new Array[Byte](512)
    putStr(h, 0, name)
    putOctal(h, 100, 8, if (typeflag == '5') 493L /*0755*/ else 420L /*0644*/)
    putOctal(h, 108, 8, 0L)
    putOctal(h, 116, 8, 0L)
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, mtime)
    h(156) = typeflag.toByte
    if (gnu) putStr(h, 257, "ustar  ") // NUL at 264 stays from the fill
    else { putStr(h, 257, "ustar"); putStr(h, 263, "00") }
    putStr(h, 265, "graft")
    putStr(h, 297, "graft")
    putOctal(h, 329, 8, 0L)
    putOctal(h, 337, 8, 0L)
    if (!gnu) putStr(h, 345, prefix)
    val sum = headerChecksum(h, 0)
    putStr(h, 148, "%06o".format(sum))
    h(154) = 0.toByte
    h(155) = ' '.toByte
    h
  }

  /** Encode one POSIX ustar header block. */
  private[graft] def tarHeader(
      name: String, prefix: String, typeflag: Char, size: Long,
      mtime: Long): Array[Byte] =
    tarHeaderExt(name, prefix, typeflag, size, mtime, gnu = false)

  // wire-level items for the extended writer (fixture/test side)
  private[graft] sealed trait WireItem
  /** Plain entry; `sizeField` overrides the octal size field (for
    * exercising a pax `size` override the field itself cannot carry). */
  private[graft] final case class WirePlain(
      name: String, prefix: String, typeflag: Char, mtime: Long,
      body: Array[Byte], gnu: Boolean = false,
      sizeField: Option[Long] = None) extends WireItem
  private[graft] final case class WirePax(
      global: Boolean, records: Seq[(String, String)]) extends WireItem
  private[graft] final case class WireLongname(name: String) extends WireItem

  /** One pax record "<len> key=value\n" — len counts itself, so the
    * digit width is solved to a fixpoint. */
  private[graft] def paxRecord(key: String, value: String): Array[Byte] = {
    val tail = (" " + key + "=" + value + "\n").getBytes("UTF-8")
    var total = tail.length + 1
    while (total.toString.length + tail.length != total)
      total = total.toString.length + tail.length
    total.toString.getBytes("UTF-8") ++ tail
  }

  /** Write a complete tar stream from wire items + two zero blocks. */
  private[graft] def writeTarWire(items: Seq[WireItem]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def block(hdr: Array[Byte], body: Array[Byte]): Unit = {
      out.write(hdr)
      out.write(body)
      out.write(new Array[Byte]((512 - body.length % 512) % 512))
    }
    items.foreach {
      case WirePlain(name, prefix, tf, mtime, body, gnu, sf) =>
        block(tarHeaderExt(name, prefix, tf,
          sf.getOrElse(body.length.toLong), mtime, gnu), body)
      case WirePax(global, recs) =>
        val body = recs.toArray.flatMap { case (k, v) => paxRecord(k, v) }
        block(tarHeaderExt(
          if (global) "pax_global_header" else "PaxHeaders.0/next",
          "", if (global) 'g' else 'x', body.length.toLong, 0L,
          gnu = false), body)
      case WireLongname(nm) =>
        val body = nm.getBytes("UTF-8") :+ 0.toByte
        block(tarHeaderExt("././@LongLink", "", 'L', body.length.toLong,
          0L, gnu = true), body)
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Write a complete POSIX tar stream: entries, two zero blocks. */
  private[graft] def writeTar(
      entries: Seq[(String, String, Char, Long, Array[Byte])]): Array[Byte] =
    writeTarWire(entries.map { case (name, prefix, tf, mtime, body) =>
      WirePlain(name, prefix, tf, mtime, body)
    })

  /** Fixture: one leading directory entry + file entries, with the
    * WIRE encoding routed by bundle index while the decoded rows obey
    * the same closed-form laws (so the q165 oracle is format-blind):
    *
    *  - `i % 4 == 0|2` — POSIX ustar; every k % 3 == 2 entry path is
    *    prefix[155]-split, the rest carry the full name;
    *  - `i % 4 == 1` — old-GNU magic (`ustar  \0`, no prefix field);
    *    k % 3 == 2 entries are named via a GNU 'L' longname record
    *    (truncated name in the header), the rest inline;
    *  - `i % 4 == 3` — pax: a leading 'g' global header (comment +
    *    an ignorable vendor keyword), and each k % 3 == 2 entry
    *    preceded by an 'x' header whose `path`/`size`/`mtime`
    *    override a deliberately-zeroed octal size field, a truncated
    *    header name, and a zero header mtime (pax mtime carries a
    *    fractional part that must floor) — so the overrides are
    *    load-bearing, not decorative.
    *
    * Every second bundle is gzip-wrapped (.tar.gz) with an FNAME
    * field to exercise the RFC 1952 header walk. Laws mirror the ZIP
    * fixture so oracles stay closed-form. */
  def tarFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ne = 3 + i % 4
      val dir = s"d$i"
      val items = scala.collection.mutable.ArrayBuffer.empty[WireItem]
      if (i % 4 == 3)
        items += WirePax(global = true, Seq(
          "comment" -> s"bundle $i", "GRAFT.vendor" -> "fixture"))
      items += WirePlain(s"$dir/", "", '5', 1704067200L + i * 60L - 1L,
        Array.empty[Byte], gnu = i % 4 == 1)
      (0 until ne).foreach { k =>
        val nt = 8 + (i + k) % 5
        val body = (0 until nt)
          .map(j => s"t${(i * 7 + k * 3 + j) % 10}").mkString(" ")
          .getBytes("UTF-8")
        val mtime = 1704067200L + i * 60L + k
        val full = s"$dir/f_${i}_$k.txt"
        val short = s"f_${i}_$k.txt"
        (i % 4, k % 3) match {
          case (1, 2) => // GNU longname names the entry
            items += WireLongname(full)
            items += WirePlain(short, "", '0', mtime, body, gnu = true)
          case (1, _) =>
            items += WirePlain(full, "", '0', mtime, body, gnu = true)
          case (3, 2) => // pax overrides are load-bearing
            items += WirePax(global = false, Seq(
              "path" -> full,
              "size" -> body.length.toString,
              "mtime" -> s"$mtime.25",
              "atime" -> s"$mtime"))
            items += WirePlain(short, "", '0', 0L, body,
              sizeField = Some(0L))
          case (_, 2) => // POSIX prefix split
            items += WirePlain(short, dir, '0', mtime, body)
          case _ =>
            items += WirePlain(full, "", '0', mtime, body)
        }
      }
      val tar = writeTarWire(items.toSeq)
      val media =
        if (i % 2 == 1) Warc.gzipMember(tar, fname = Some(s"b$i.tar"))
        else tar
      Row(i.toLong, media)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
