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
    val nEntries = u16(b, eocd + 10)
    if (u16(b, eocd + 8) != nEntries) return None
    val cdSize = u32(b, eocd + 12)
    val cdOff = u32(b, eocd + 16)
    if (cdOff + cdSize != eocd) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[ZipEntry]
    var c = cdOff.toInt
    var i = 0
    try {
      while (i < nEntries) {
        if (c + 46 > eocd || u32(b, c) != 0x02014b50L) return None
        val flags = u16(b, c + 8)
        if ((flags & 0x1) != 0) return None // encrypted
        // flag bit 3 (data descriptor after the payload) is FINE:
        // the central directory's sizes/CRC are authoritative and
        // that's where this walk reads them — streaming writers
        // (incl. the JDK's own ZipOutputStream) always set it
        val method = u16(b, c + 10)
        if (method != 0 && method != 8) return None
        val crc = u32(b, c + 16)
        val compSize = u32(b, c + 20)
        val uncompSize = u32(b, c + 24)
        val nameLen = u16(b, c + 28)
        val extraLen = u16(b, c + 30)
        val commentLen = u16(b, c + 32)
        val lho = u32(b, c + 42).toInt
        // record must fit inside the central directory (a corrupt
        // nameLen would otherwise read past it — String's bounds
        // check throws StringIndexOutOfBounds, not ArrayIndexOOB)
        if (c + 46 + nameLen + extraLen + commentLen > eocd) return None
        val name = new String(b, c + 46, nameLen, "UTF-8")
        // local header: signature + name must agree with the
        // central directory (the authoritative copy)
        if (lho < 0 || lho + 30 > b.length ||
            u32(b, lho) != 0x04034b50L) return None
        val lNameLen = u16(b, lho + 26)
        val lExtraLen = u16(b, lho + 28)
        if (lNameLen != nameLen || lho + 30 + lNameLen > b.length ||
            new String(b, lho + 30, lNameLen, "UTF-8") != name) return None
        val dataOff = lho + 30 + lNameLen + lExtraLen
        if (dataOff + compSize > b.length) return None
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
      if (c != eocd) return None // central directory must be exact
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

  /** Fixture: archives built by the JDK's OWN ZipOutputStream — an
    * independent encoder the spec-written parser must agree with.
    * Entries alternate DEFLATE and STORED; odd archives carry an
    * archive comment to exercise the EOCD backwards search. */
  def zipFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ne = 3 + i % 4
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      if (i % 2 == 1) zos.setComment(s"graft archive $i")
      (0 until ne).foreach { k =>
        val nt = 8 + (i + k) % 5
        val body = (0 until nt)
          .map(j => s"z${(i * 7 + k * 3 + j) % 10}").mkString(" ")
          .getBytes("UTF-8")
        val e = new java.util.zip.ZipEntry(s"doc_${i}_$k.txt")
        if (k % 2 == 1) { // STORED requires pre-declared size + CRC
          e.setMethod(java.util.zip.ZipOutputStream.STORED)
          e.setSize(body.length)
          e.setCompressedSize(body.length)
          val crc = new java.util.zip.CRC32
          crc.update(body)
          e.setCrc(crc.getValue)
        }
        zos.putNextEntry(e)
        zos.write(body)
        zos.closeEntry()
      }
      zos.close()
      Row(i.toLong, bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
