package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ZIP archive extraction (PKWARE APPNOTE / ISO 21320) — the generic
  * bundle format data lakes actually receive (document dumps, model
  * artifacts, scraped-site exports). REAL parse end to end, written
  * against the spec rather than java.util.zip.ZipFile so the fixture
  * can use the JDK's ZipOutputStream as an INDEPENDENT encoder:
  *
  *  - End-of-Central-Directory located by backwards signature scan
  *    over the trailing 64 KiB (archive comments supported), single
  *    disk only;
  *  - ZIP64 (APPNOTE 4.4.1/4.5.3): when the EOCD64 locator
  *    (0x07064b50) sits directly before the EOCD, the EOCD64 record
  *    (0x06064b50) supplies entry count / CD size / CD offset, and
  *    every classic EOCD field must either carry its 0xFFFF(FFFF)
  *    sentinel or AGREE with the ZIP64 value (some writers mark
  *    small archives ZIP64 without sentineling — both are real);
  *    per-entry 0xFFFFFFFF sizes/offset (and the 0xFFFF disk) are
  *    resolved from the 0x0001 extra field, whose data must tile the
  *    sentinel-marked fields EXACTLY in the spec's fixed order, and
  *    the extra-field area itself must tile exactly;
  *  - central-directory walk (authoritative sizes/CRC/offsets),
  *    cross-checked against each local file header's name;
  *  - STORED and DEFLATE entries (raw Inflater), CRC-32 verified on
  *    every decompressed payload, exact-size enforcement;
  *  - data-descriptor streams (flag bit 3) parse fine — the central
  *    directory is the authoritative copy and this walk reads sizes
  *    and CRC there; encrypted entries, spanned archives and other
  *    compression methods are REJECTED, not guessed — same
  *    strictness posture as the codec family.
  *
  * One blob = one task-local walk (embarrassingly parallel over the
  * archive table; the codec-family plan shape).
  */
object ZipLake {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  /** Little-endian u64; a value with the sign bit set cannot index an
    * in-memory archive and rejects via the caller's bound checks. */
  private def u64(b: Array[Byte], o: Int): Long =
    u32(b, o) | (u32(b, o + 4) << 32)

  private[graft] final case class ZipEntry(
      entry: Int, name: String, method: String,
      uncompSize: Long, payload: Array[Byte])

  /** Parse one archive; None on any structural/CRC violation. */
  private[graft] def parseZip(b: Array[Byte]): Option[Seq[ZipEntry]] = {
    if (b == null || b.length < 22) return None
    // EOCD: signature 0x06054b50, searched backwards through the
    // comment space (comment <= 65535 bytes)
    var eocd = -1
    var p = b.length - 22
    val floor = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && p >= floor) {
      if (u32(b, p) == 0x06054b50L &&
          p + 22 + u16(b, p + 20) == b.length) eocd = p
      else p -= 1
    }
    if (eocd < 0) return None
    if (u16(b, eocd + 4) != 0 || u16(b, eocd + 6) != 0) return None // spanned
    // ZIP64: the EOCD64 locator sits DIRECTLY before the EOCD
    val zip64 = eocd >= 20 && u32(b, eocd - 20) == 0x07064b50L
    var nEntries = 0
    var cdOff = 0L
    var cdEnd = 0
    if (zip64) {
      val loc = eocd - 20
      if (u32(b, loc + 4) != 0L || u32(b, loc + 16) != 1L) return None // disks
      val e64 = u64(b, loc + 8)
      if (e64 < 0 || e64 + 56 > loc || u32(b, e64.toInt) != 0x06064b50L)
        return None
      val r = e64.toInt
      // record size excludes sig + the size field itself; the record
      // (incl. any extensible data sector) must run exactly up to the
      // locator
      val rs = u64(b, r + 4)
      if (rs < 44 || r + 12 + rs != loc) return None
      if (u32(b, r + 16) != 0L || u32(b, r + 20) != 0L) return None // disks
      val n64 = u64(b, r + 32)
      if (u64(b, r + 24) != n64 || n64 < 0 || n64 > Int.MaxValue)
        return None
      nEntries = n64.toInt
      val cdSize = u64(b, r + 40)
      cdOff = u64(b, r + 48)
      if (cdOff < 0 || cdSize < 0 || cdOff + cdSize != e64) return None
      cdEnd = r
      // classic EOCD fields must carry the sentinel OR agree with the
      // ZIP64 record (small-but-ZIP64-marked archives exist in the
      // wild with either convention)
      val cn = u16(b, eocd + 10)
      if (u16(b, eocd + 8) != cn) return None
      if (cn != 0xffff && cn != nEntries) return None
      val cs = u32(b, eocd + 12)
      if (cs != 0xffffffffL && cs != cdSize) return None
      val co = u32(b, eocd + 16)
      if (co != 0xffffffffL && co != cdOff) return None
    } else {
      nEntries = u16(b, eocd + 10)
      if (u16(b, eocd + 8) != nEntries) return None
      val cdSize = u32(b, eocd + 12)
      cdOff = u32(b, eocd + 16)
      if (cdOff + cdSize != eocd) return None
      cdEnd = eocd
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var c = cdOff.toInt
    var i = 0
    try {
      while (i < nEntries) {
        if (c + 46 > cdEnd || u32(b, c) != 0x02014b50L) return None
        val flags = u16(b, c + 8)
        if ((flags & 0x1) != 0) return None // encrypted
        // flag bit 3 (data descriptor after the payload) is FINE:
        // the central directory's sizes/CRC are authoritative and
        // that's where this walk reads them — streaming writers
        // (incl. the JDK's own ZipOutputStream) always set it
        val method = u16(b, c + 10)
        if (method != 0 && method != 8) return None
        val crc = u32(b, c + 16)
        var compSize = u32(b, c + 20)
        var uncompSize = u32(b, c + 24)
        val nameLen = u16(b, c + 28)
        val extraLen = u16(b, c + 30)
        val commentLen = u16(b, c + 32)
        val diskStart = u16(b, c + 34)
        var lhoL = u32(b, c + 42)
        // record must fit inside the central directory (a corrupt
        // nameLen would otherwise read past it — String's bounds
        // check throws StringIndexOutOfBounds, not ArrayIndexOOB)
        if (c + 46 + nameLen + extraLen + commentLen > cdEnd) return None
        // 0xFFFFFFFF sizes/offset (0xFFFF disk) resolve from the
        // 0x0001 ZIP64 extra field, fixed order, exact tiling
        val needU = uncompSize == 0xffffffffL
        val needC = compSize == 0xffffffffL
        val needL = lhoL == 0xffffffffL
        val needD = diskStart == 0xffff
        if (needU || needC || needL || needD) {
          var x = c + 46 + nameLen
          val xend = x + extraLen
          var z64 = -1
          var z64len = 0
          while (x + 4 <= xend) {
            val id = u16(b, x)
            val sz = u16(b, x + 2)
            if (x + 4 + sz > xend) return None
            if (id == 1) {
              if (z64 >= 0) return None // duplicate ZIP64 extra
              z64 = x + 4
              z64len = sz
            }
            x += 4 + sz
          }
          if (x != xend || z64 < 0) return None // extras must tile
          val want = (if (needU) 8 else 0) + (if (needC) 8 else 0) +
            (if (needL) 8 else 0) + (if (needD) 4 else 0)
          if (z64len != want) return None
          var q = z64
          if (needU) { uncompSize = u64(b, q); q += 8 }
          if (needC) { compSize = u64(b, q); q += 8 }
          if (needL) { lhoL = u64(b, q); q += 8 }
          if (needD && u32(b, q) != 0L) return None // single disk
          if (uncompSize < 0 || compSize < 0 || lhoL < 0) return None
        } else if (diskStart != 0) return None
        val name = new String(b, c + 46, nameLen, "UTF-8")
        // local header: signature + name must agree with the
        // central directory (the authoritative copy)
        if (lhoL < 0 || lhoL + 30 > b.length ||
            u32(b, lhoL.toInt) != 0x04034b50L) return None
        val lho = lhoL.toInt
        val lNameLen = u16(b, lho + 26)
        val lExtraLen = u16(b, lho + 28)
        if (lNameLen != nameLen || lho + 30 + lNameLen > b.length ||
            new String(b, lho + 30, lNameLen, "UTF-8") != name) return None
        val dataOff = lho + 30 + lNameLen + lExtraLen
        if (dataOff.toLong + compSize > b.length) return None
        val payload: Array[Byte] =
          if (method == 0) {
            if (compSize != uncompSize) return None
            java.util.Arrays.copyOfRange(b, dataOff,
              dataOff + compSize.toInt)
          } else {
            val inf = new java.util.zip.Inflater(true)
            try {
              inf.setInput(b, dataOff, compSize.toInt)
              val buf = new java.io.ByteArrayOutputStream(
                math.max(64, uncompSize.toInt))
              val tmp = new Array[Byte](8192)
              while (!inf.finished()) {
                val n =
                  try inf.inflate(tmp)
                  catch {
                    case _: java.util.zip.DataFormatException => return None
                  }
                if (n > 0) buf.write(tmp, 0, n)
                // n == 0 with finished() set happens in ONE call for
                // an empty stream — only an UNfinished stall is a
                // truncation
                else if (!inf.finished() &&
                    (inf.needsInput() || inf.needsDictionary()))
                  return None
              }
              if (inf.getRemaining != 0) return None // trailing garbage
              buf.toByteArray
            } finally inf.end()
          }
        if (payload.length.toLong != uncompSize) return None
        val check = new java.util.zip.CRC32
        check.update(payload)
        if (check.getValue != crc) return None
        out += ZipEntry(i, name,
          if (method == 0) "stored" else "deflate", uncompSize, payload)
        c += 46 + nameLen + extraLen + commentLen
        i += 1
      }
      if (c != cdEnd) return None // central directory must be exact
      Some(out.toSeq)
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Explode an archive table into per-entry rows with text stats
    * computed from the DECOMPRESSED payload. */
  def extractZip(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("entry", IntegerType, true),
      StructField("name", StringType, true),
      StructField("method", StringType, true),
      StructField("uncomp_size", LongType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseZip(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(entries) => entries.map { e =>
            val (nWords, digitSum) = Warc.payloadStats(e.payload)
            Row(r.getLong(0), e.entry, e.name, e.method, e.uncompSize,
              nWords, digitSum, true)
          }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // encoders (fixture/test side)

  private def deflateRaw(body: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(body)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, body.length))
      val tmp = new Array[Byte](8192)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      out.toByteArray
    } finally d.end()
  }

  /** Write a ZIP64-marked archive (EOCD64 + locator). WHICH central
    * fields carry the 0xFFFFFFFF sentinel routes by entry index — k%3
    * == 0 sentinels the sizes, 1 the local-header offset, 2 all three
    * plus the 0xFFFF disk — so every extra-field shape is exercised.
    * `sentinelEocd` picks between sentinel-filled and real-valued
    * classic EOCD fields (small-but-ZIP64-marked writers emit both). */
  private[graft] def writeZip64(
      entries: Seq[(String, Array[Byte], Boolean)], // (name, body, stored?)
      sentinelEocd: Boolean = true,
      comment: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def w32(v: Long): Unit = {
      w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32(v >>> 32) }
    final case class Cd(nb: Array[Byte], method: Int, crc: Long,
        comp: Long, uncomp: Long, lho: Long, mode: Int)
    val cds = scala.collection.mutable.ArrayBuffer.empty[Cd]
    entries.zipWithIndex.foreach { case ((name, body, stored), k) =>
      val lho = out.size().toLong
      val nb = name.getBytes("UTF-8")
      val c32 = new java.util.zip.CRC32
      c32.update(body)
      val comp = if (stored) body else deflateRaw(body)
      val method = if (stored) 0 else 8
      w32(0x04034b50L); w16(45); w16(0); w16(method); w16(0); w16(0)
      w32(c32.getValue); w32(comp.length.toLong); w32(body.length.toLong)
      w16(nb.length); w16(0)
      out.write(nb); out.write(comp)
      cds += Cd(nb, method, c32.getValue, comp.length.toLong,
        body.length.toLong, lho, k % 3)
    }
    val cdOff = out.size().toLong
    cds.foreach { e =>
      val (needSz, needL, needD) = e.mode match {
        case 0 => (true, false, false)
        case 1 => (false, true, false)
        case _ => (true, true, true)
      }
      val extraLen =
        (if (needSz) 16 else 0) + (if (needL) 8 else 0) +
          (if (needD) 4 else 0)
      w32(0x02014b50L); w16(45); w16(45); w16(0); w16(e.method)
      w16(0); w16(0) // time, date
      w32(e.crc)
      w32(if (needSz) 0xffffffffL else e.comp)
      w32(if (needSz) 0xffffffffL else e.uncomp)
      w16(e.nb.length); w16(if (extraLen > 0) extraLen + 4 else 0); w16(0)
      w16(if (needD) 0xffff else 0) // disk start
      w16(0); w32(0L) // int/ext attrs
      w32(if (needL) 0xffffffffL else e.lho)
      out.write(e.nb)
      if (extraLen > 0) {
        w16(1); w16(extraLen) // ZIP64 extra: id 0x0001
        if (needSz) { w64(e.uncomp); w64(e.comp) }
        if (needL) w64(e.lho)
        if (needD) w32(0L)
      }
    }
    val e64 = out.size().toLong
    val cdSize = e64 - cdOff
    val n = entries.length
    w32(0x06064b50L); w64(44L); w16(45); w16(45); w32(0L); w32(0L)
    w64(n.toLong); w64(n.toLong); w64(cdSize); w64(cdOff)
    w32(0x07064b50L); w32(0L); w64(e64); w32(1L) // locator
    val cb = comment.getBytes("UTF-8")
    w32(0x06054b50L); w16(0); w16(0)
    if (sentinelEocd) {
      w16(0xffff); w16(0xffff); w32(0xffffffffL); w32(0xffffffffL)
    } else {
      w16(n); w16(n); w32(cdSize); w32(cdOff)
    }
    w16(cb.length)
    out.write(cb)
    out.toByteArray
  }

  /** Fixture: archives built by the JDK's OWN ZipOutputStream — an
    * independent encoder the spec-written parser must agree with —
    * except every third archive, which the ZIP64 writer emits
    * (EOCD64 + locator + per-entry sentinel extras; the JDK never
    * marks small archives ZIP64). Decoded rows obey the same laws
    * either way, so the q164 oracle is format-blind. Entries
    * alternate DEFLATE and STORED; odd archives carry an archive
    * comment to exercise the EOCD backwards search. */
  def zipFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ne = 3 + i % 4
      def body(k: Int): Array[Byte] = {
        val nt = 8 + (i + k) % 5
        (0 until nt)
          .map(j => s"z${(i * 7 + k * 3 + j) % 10}").mkString(" ")
          .getBytes("UTF-8")
      }
      val media: Array[Byte] =
        if (i % 3 == 2) {
          writeZip64(
            (0 until ne).map(k =>
              (s"doc_${i}_$k.txt", body(k), k % 2 == 1)),
            sentinelEocd = i % 2 == 0,
            comment = if (i % 2 == 1) s"graft archive $i" else "")
        } else {
          val bos = new java.io.ByteArrayOutputStream()
          val zos = new java.util.zip.ZipOutputStream(bos)
          if (i % 2 == 1) zos.setComment(s"graft archive $i")
          (0 until ne).foreach { k =>
            val bk = body(k)
            val e = new java.util.zip.ZipEntry(s"doc_${i}_$k.txt")
            if (k % 2 == 1) { // STORED requires pre-declared size + CRC
              e.setMethod(java.util.zip.ZipOutputStream.STORED)
              e.setSize(bk.length)
              e.setCompressedSize(bk.length)
              val crc = new java.util.zip.CRC32
              crc.update(bk)
              e.setCrc(crc.getValue)
            }
            zos.putNextEntry(e)
            zos.write(bk)
            zos.closeEntry()
          }
          zos.close()
          bos.toByteArray
        }
      Row(i.toLong, media)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
