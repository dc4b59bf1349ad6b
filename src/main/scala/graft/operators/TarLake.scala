package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TAR bundle extraction (POSIX.1-1988 ustar; tar(5)) — with ZIP the
  * other archive format data lakes actually receive (dataset dumps,
  * model checkpoints, scraped-site exports ship as .tar / .tar.gz).
  * REAL parse end to end, written against the header layout spec:
  *
  *  - 512-byte header blocks: strict octal field parse (leading
  *    spaces, octal digits, NUL/space terminated — anything else
  *    rejects), unsigned header checksum verified with the checksum
  *    field blanked to spaces per the spec;
  *  - `ustar\0` + version `00` magic required (GNU's `ustar  `
  *    variant, longname 'L'/'K' records, pax 'x'/'g' headers and
  *    link entries are REJECTED, not guessed — the codec-family
  *    strictness posture);
  *  - prefix[155] + name[100] path joining; regular files ('0'/NUL)
  *    and directories ('5', size forced 0) only;
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
    while (p + 512 <= b.length) {
      if (zeroBlock(b, p)) {
        // end-of-archive: a second zero block must follow and ONLY
        // zero blocks may trail it (blocked output padding)
        if (p + 1024 > b.length || !zeroBlock(b, p + 512)) return None
        var q = p + 1024
        while (q < b.length) { if (b(q) != 0) return None; q += 1 }
        return Some(out.toSeq)
      }
      if (str(b, p + 257, 6) != "ustar" || b(p + 262) != 0.toByte ||
          str(b, p + 263, 2) != "00") return None
      val want = octal(b, p + 148, 8).getOrElse(return None)
      if (headerChecksum(b, p) != want) return None
      val size = octal(b, p + 124, 12).getOrElse(return None)
      val mtime = octal(b, p + 136, 12).getOrElse(return None)
      if (octal(b, p + 100, 8).isEmpty) return None // mode must parse
      val typeflag = (b(p + 156) & 0xff) match {
        case 0 | 0x30 => "file" // NUL or '0'
        case 0x35 => if (size != 0L) return None else "dir" // '5'
        case _ => return None // links, longnames, pax: rejected
      }
      val prefix = str(b, p + 345, 155)
      val name0 = str(b, p, 100)
      if (name0.isEmpty) return None
      val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
      val padded = ((size + 511L) / 512L) * 512L
      if (p + 512L + padded > b.length) return None
      val dataOff = p + 512
      var z = dataOff + size.toInt
      while (z < dataOff + padded.toInt) {
        if (b(z) != 0) return None // pad bytes must be zero
        z += 1
      }
      val payload =
        java.util.Arrays.copyOfRange(b, dataOff, dataOff + size.toInt)
      out += TarEntry(i, name, typeflag, size, mtime, payload)
      p = dataOff + padded.toInt
      i += 1
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

  /** Encode one ustar header block (checksum computed per spec). */
  private[graft] def tarHeader(
      name: String, prefix: String, typeflag: Char, size: Long,
      mtime: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    putStr(h, 0, name)
    putOctal(h, 100, 8, if (typeflag == '5') 493L /*0755*/ else 420L /*0644*/)
    putOctal(h, 108, 8, 0L)
    putOctal(h, 116, 8, 0L)
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, mtime)
    h(156) = typeflag.toByte
    putStr(h, 257, "ustar")
    putStr(h, 263, "00")
    putStr(h, 265, "graft")
    putStr(h, 297, "graft")
    putOctal(h, 329, 8, 0L)
    putOctal(h, 337, 8, 0L)
    putStr(h, 345, prefix)
    val sum = headerChecksum(h, 0)
    putStr(h, 148, "%06o".format(sum))
    h(154) = 0.toByte
    h(155) = ' '.toByte
    h
  }

  /** Write a complete tar stream: entries, two zero blocks. */
  private[graft] def writeTar(
      entries: Seq[(String, String, Char, Long, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    entries.foreach { case (name, prefix, tf, mtime, body) =>
      out.write(tarHeader(name, prefix, tf, body.length.toLong, mtime))
      out.write(body)
      val pad = (512 - body.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** Fixture: one leading directory entry + alternating full-name /
    * prefix-split file entries; every second bundle is gzip-wrapped
    * (.tar.gz) with an FNAME field to exercise the RFC 1952 header
    * walk. Laws mirror the ZIP fixture so oracles stay closed-form. */
  def tarFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ne = 3 + i % 4
      val dir = s"d$i"
      val files = (0 until ne).map { k =>
        val nt = 8 + (i + k) % 5
        val body = (0 until nt)
          .map(j => s"t${(i * 7 + k * 3 + j) % 10}").mkString(" ")
          .getBytes("UTF-8")
        val mtime = 1704067200L + i * 60L + k
        if (k % 3 == 2) (s"f_${i}_$k.txt", dir, '0', mtime, body)
        else (s"$dir/f_${i}_$k.txt", "", '0', mtime, body)
      }
      val all = (s"$dir/", "", '5', 1704067200L + i * 60L - 1L,
        Array.empty[Byte]) +: files
      val tar = writeTar(all)
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
