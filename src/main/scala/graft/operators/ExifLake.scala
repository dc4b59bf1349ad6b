package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXIF metadata extraction (q193) — the catalog pass every image
  * lake runs before any pixel work: camera identity, orientation,
  * capture time, exposure parameters and GPS position, parsed from
  * the JPEG APP1 "Exif" segment's embedded TIFF structure (public
  * EXIF 2.x / TIFF 6.0 layout, no codec work at all — the segment
  * sits before any entropy-coded data).
  *
  * REAL parse, both byte orders: JPEG marker walk to APP1 (skipping
  * other APPn/COM segments, stopping at SOS), "Exif" preamble (two NUL pad bytes)
  *, TIFF header (II/MM + magic 42), IFD0 walk, then the
  * Exif and GPS sub-IFDs through their pointer tags. Typed decode:
  * ASCII (NUL-terminated, inline or offset), SHORT/LONG (dimension
  * tags accept either, per spec), RATIONAL (num/den pairs at
  * offset). STRICT: entry tags must ascend (TIFF 6.0 requirement),
  * every offset/value must lie inside the segment, expected types
  * must match — a lying header flags the blob, never guesses.
  *
  * One blob = one task-local walk (codec-family plan shape). */
object ExifLake {

  private final case class Entry(tag: Int, typ: Int, count: Long, at: Int)

  private[graft] final case class Exif(
      byteOrder: String, make: String, model: String, orientation: Int,
      dt: String, exposureNum: Long, exposureDen: Long, iso: Int,
      pxWidth: Long, pxHeight: Long,
      focalNum: Long, focalDen: Long,
      latRef: String, latDeg: Long, latMin: Long, latSecNum: Long,
      latSecDen: Long, lonRef: String, lonDeg: Long, lonMin: Long,
      lonSecNum: Long, lonSecDen: Long)

  /** Parse a JPEG/Exif blob — or a BARE TIFF stream (scanned-document
    * corpora carry raw `.tif`; the IFD walker is TIFF 6.0 either
    * way): a blob opening with the TIFF byte-order mark + magic 42 is
    * treated as one whole TIFF segment, no JPEG wrapper. */
  private[graft] def parseExif(b: Array[Byte]): Option[Exif] = {
    if (b == null || b.length < 8) return None
    var tiff = -1
    var tiffEnd = -1
    if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) {
      tiff = 0
      tiffEnd = b.length
    } else {
      if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None // SOI
      // --- JPEG marker walk to APP1/Exif ---
      var off = 2
      var done = false
      while (!done) {
        if (off + 4 > b.length) return None
        if ((b(off) & 0xff) != 0xff) return None
        val marker = b(off + 1) & 0xff
        if (marker == 0xda || marker == 0xd9) done = true // SOS/EOI: stop
        else {
          val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          if (len < 2 || off + 2 + len > b.length) return None
          if (marker == 0xe1 && len >= 16 &&
            b(off + 4) == 'E' && b(off + 5) == 'x' && b(off + 6) == 'i' &&
            b(off + 7) == 'f' && b(off + 8) == 0 && b(off + 9) == 0) {
            if (tiff >= 0) return None // two Exif segments: reject
            tiff = off + 10
            tiffEnd = off + 2 + len
          }
          off += 2 + len
        }
      }
      if (tiff < 0) return None
    }
    // --- TIFF header ---
    if (tiffEnd - tiff < 8) return None
    val le =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return None
    def u16(o: Int): Int = {
      if (o < tiff || o + 2 > tiffEnd) throw ExifOob
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u32(o: Int): Long = {
      if (o < tiff || o + 4 > tiffEnd) throw ExifOob
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }
    try {
      if (u16(tiff + 2) != 42) return None
      val ifd0 = tiff + u32(tiff + 4).toInt
      def readIfd(at: Int): Map[Int, Entry] = {
        val n = u16(at)
        var prev = -1
        (0 until n).map { i =>
          val e = at + 2 + i * 12
          val tag = u16(e)
          if (tag <= prev) throw ExifOob // TIFF 6.0: ascending tags
          prev = tag
          tag -> Entry(tag, u16(e + 2), u32(e + 4), e + 8)
        }.toMap
      }
      val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1,
        9 -> 4, 10 -> 8)
      // ALL bound checks in Long arithmetic: count and offset are u32
      // fields a crafted entry can set past 2^31 — a .toInt there
      // wraps negative and bypasses an Int-domain comparison (the
      // r13 ADVICE finding), so reject before any narrowing.
      def valueAt(e: Entry): Int = {
        val sz = typeSize.getOrElse(e.typ, -1)
        if (sz < 0) throw ExifOob
        val seg = (tiffEnd - tiff).toLong
        val total = sz * e.count // count < 2^32, sz <= 8: no Long overflow
        if (total > seg) throw ExifOob
        if (total <= 4) e.at
        else {
          val off = u32(e.at)
          if (off + total > seg) throw ExifOob
          tiff + off.toInt
        }
      }
      def ascii(m: Map[Int, Entry], tag: Int): String = m.get(tag) match {
        case Some(e) if e.typ == 2 && e.count >= 1 =>
          val at = valueAt(e) // validates count/offset in Long domain
          if (at.toLong + e.count > tiffEnd) throw ExifOob
          val raw = new String(b, at, e.count.toInt - 1, "US-ASCII")
          if (b(at + e.count.toInt - 1) != 0) throw ExifOob // NUL term
          raw
        case Some(_) => throw ExifOob
        case None => throw ExifOob
      }
      def short(m: Map[Int, Entry], tag: Int): Int = m.get(tag) match {
        case Some(e) if e.typ == 3 && e.count == 1 => u16(valueAt(e))
        case _ => throw ExifOob
      }
      def shortOrLong(m: Map[Int, Entry], tag: Int): Long = m.get(tag) match {
        case Some(e) if e.typ == 3 && e.count == 1 => u16(valueAt(e)).toLong
        case Some(e) if e.typ == 4 && e.count == 1 => u32(valueAt(e))
        case _ => throw ExifOob
      }
      def long1(m: Map[Int, Entry], tag: Int): Long = m.get(tag) match {
        case Some(e) if e.typ == 4 && e.count == 1 => u32(valueAt(e))
        case _ => throw ExifOob
      }
      def rationals(m: Map[Int, Entry], tag: Int, k: Int): Seq[(Long, Long)] =
        m.get(tag) match {
          case Some(e) if e.typ == 5 && e.count == k =>
            val at = valueAt(e)
            (0 until k).map(i => (u32(at + i * 8), u32(at + i * 8 + 4)))
          case _ => throw ExifOob
        }
      val ifd = readIfd(ifd0)
      val exifIfd = readIfd(tiff + long1(ifd, 0x8769).toInt)
      val gpsIfd = readIfd(tiff + long1(ifd, 0x8825).toInt)
      val Seq(exp) = rationals(exifIfd, 0x829a, 1)
      if (exp._2 == 0) return None
      val Seq(focal) = rationals(exifIfd, 0x920a, 1)
      if (focal._2 == 0) return None
      val lat = rationals(gpsIfd, 0x0002, 3)
      val lon = rationals(gpsIfd, 0x0004, 3)
      // degrees/minutes carry denominator 1, seconds any nonzero
      if (lat.take(2).exists(_._2 != 1) || lon.take(2).exists(_._2 != 1) ||
        lat(2)._2 == 0 || lon(2)._2 == 0) return None
      val ori = short(ifd, 0x0112)
      if (ori < 1 || ori > 8) return None
      Some(Exif(
        if (le) "II" else "MM",
        ascii(ifd, 0x010f), ascii(ifd, 0x0110), ori, ascii(ifd, 0x0132),
        exp._1, exp._2, short(exifIfd, 0x8827),
        shortOrLong(exifIfd, 0xa002), shortOrLong(exifIfd, 0xa003),
        focal._1, focal._2,
        ascii(gpsIfd, 0x0001), lat(0)._1, lat(1)._1, lat(2)._1, lat(2)._2,
        ascii(gpsIfd, 0x0003), lon(0)._1, lon(1)._1, lon(2)._1, lon(2)._2))
    } catch { case ExifOob => None }
  }

  private object ExifOob extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** EXIF extraction as a DataFrame op (codec-family plan shape). */
  def extractExif(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("byte_order", StringType, true),
      StructField("make", StringType, true),
      StructField("model", StringType, true),
      StructField("orientation", IntegerType, true),
      StructField("dt", StringType, true),
      StructField("exposure_num", LongType, true),
      StructField("exposure_den", LongType, true),
      StructField("iso", IntegerType, true),
      StructField("px_width", LongType, true),
      StructField("px_height", LongType, true),
      StructField("focal_num", LongType, true),
      StructField("focal_den", LongType, true),
      StructField("lat_ref", StringType, true),
      StructField("lat_deg", LongType, true),
      StructField("lat_min", LongType, true),
      StructField("lat_sec_num", LongType, true),
      StructField("lat_sec_den", LongType, true),
      StructField("lon_ref", StringType, true),
      StructField("lon_deg", LongType, true),
      StructField("lon_min", LongType, true),
      StructField("lon_sec_num", LongType, true),
      StructField("lon_sec_den", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parseExif(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(e) =>
            Row(r.getLong(0), e.byteOrder, e.make, e.model, e.orientation,
              e.dt, e.exposureNum, e.exposureDen, e.iso, e.pxWidth, e.pxHeight,
              e.focalNum, e.focalDen, e.latRef, e.latDeg, e.latMin,
              e.latSecNum, e.latSecDen, e.lonRef, e.lonDeg, e.lonMin,
              e.lonSecNum, e.lonSecDen, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null,
              null, null, null, null, null, null, null, null, null, null,
              null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** TIFF builder (fixture / test side): a real TIFF 6.0 byte stream —
    * IFD0 (Make/Model/Orientation/DateTime + Exif/GPS pointers), Exif
    * IFD (exposure/ISO/dimensions/focal), GPS IFD (refs + 3-rational
    * coordinates), ascending tags, out-of-line values in a data area
    * after the IFDs. Used bare (standalone `.tif` carrier) or wrapped
    * in a JPEG APP1 Exif segment by [[buildExifJpeg]]. */
  def buildExifTiff(
      le: Boolean,
      make: String, model: String, orientation: Int, dt: String,
      exposureDen: Long, iso: Int, pxW: Long, pxH: Long,
      focalNum: Long, focalDen: Long,
      latRef: String, latDms: (Long, Long, Long, Long),
      lonRef: String, lonDms: (Long, Long, Long, Long)): Array[Byte] = {
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    final case class E(tag: Int, typ: Int, count: Long,
        inline: Option[Long] = None, bytes: Option[Array[Byte]] = None)
    def asciiBytes(s: String): Array[Byte] = s.getBytes("US-ASCII") :+ 0.toByte
    def rats(vs: Seq[(Long, Long)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vs.length * 8).order(order)
      vs.foreach { case (n, d) => bb.putInt(n.toInt).putInt(d.toInt) }
      bb.array()
    }
    val typeSize = Map(2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8)
    // three IFDs laid out back to back after the 8-byte TIFF header,
    // then one shared data area for out-of-line values
    def ifdSize(es: Seq[E]): Int = 2 + es.length * 12 + 4
    val gpsEs0 = Seq(
      E(0x0001, 2, latRef.length + 1, bytes = Some(asciiBytes(latRef))),
      E(0x0002, 5, 3, bytes = Some(rats(Seq((latDms._1, 1L), (latDms._2, 1L),
        (latDms._3, latDms._4))))),
      E(0x0003, 2, lonRef.length + 1, bytes = Some(asciiBytes(lonRef))),
      E(0x0004, 5, 3, bytes = Some(rats(Seq((lonDms._1, 1L), (lonDms._2, 1L),
        (lonDms._3, lonDms._4))))))
    val exifEs0 = Seq(
      E(0x829a, 5, 1, bytes = Some(rats(Seq((1L, exposureDen))))),
      E(0x8827, 3, 1, inline = Some(iso.toLong)),
      E(0x920a, 5, 1, bytes = Some(rats(Seq((focalNum, focalDen))))),
      E(0xa002, 4, 1, inline = Some(pxW)),
      E(0xa003, 4, 1, inline = Some(pxH)))
    val ifd0Base = 8
    // IFD0 needs the sub-IFD offsets, which depend on its own size —
    // entry count is fixed (6), so compute layout first
    val ifd0Count = 6
    val ifd0Size = 2 + ifd0Count * 12 + 4
    val exifAt = ifd0Base + ifd0Size
    val gpsAt = exifAt + ifdSize(exifEs0)
    val dataAt = gpsAt + ifdSize(gpsEs0)
    val ifd0Es = Seq(
      E(0x010f, 2, make.length + 1, bytes = Some(asciiBytes(make))),
      E(0x0110, 2, model.length + 1, bytes = Some(asciiBytes(model))),
      E(0x0112, 3, 1, inline = Some(orientation.toLong)),
      E(0x0132, 2, dt.length + 1, bytes = Some(asciiBytes(dt))),
      E(0x8769, 4, 1, inline = Some(exifAt.toLong)),
      E(0x8825, 4, 1, inline = Some(gpsAt.toLong)))
    require(ifd0Es.length == ifd0Count)
    val data = new java.io.ByteArrayOutputStream()
    def writeIfd(bb: ByteBuffer, es: Seq[E]): Unit = {
      bb.putShort(es.length.toShort)
      es.foreach { e =>
        bb.putShort(e.tag.toShort).putShort(e.typ.toShort)
          .putInt(e.count.toInt)
        val sz = typeSize(e.typ) * e.count
        e.inline match {
          case Some(v) =>
            // inline values are packed at the FIELD START (TIFF 6.0)
            if (e.typ == 3) {
              if (le) bb.putShort(v.toShort).putShort(0)
              else bb.putShort(v.toShort).putShort(0)
            } else bb.putInt(v.toInt)
          case None =>
            val payload = e.bytes.get
            require(payload.length == sz, s"tag ${e.tag}")
            if (sz <= 4) {
              val pad = java.util.Arrays.copyOf(payload, 4)
              bb.put(pad)
            } else {
              bb.putInt(dataAt + data.size())
              data.write(payload)
            }
        }
      }
      bb.putInt(0) // next-IFD pointer: none
    }
    val pre = new java.io.ByteArrayOutputStream()
    // dry-run sizes are deterministic: assemble IFDs in order
    val bbAll = ByteBuffer.allocate(8 + ifd0Size + ifdSize(exifEs0) +
      ifdSize(gpsEs0)).order(order)
    bbAll.put((if (le) "II" else "MM").getBytes("ASCII"))
      .putShort(42).putInt(ifd0Base)
    writeIfd(bbAll, ifd0Es)
    writeIfd(bbAll, exifEs0)
    writeIfd(bbAll, gpsEs0)
    pre.write(bbAll.array())
    pre.write(data.toByteArray)
    pre.toByteArray
  }

  /** JPEG/Exif builder: [[buildExifTiff]]'s stream wrapped in an APP1
    * Exif segment spliced into a REAL JPEG right after SOI. */
  def buildExifJpeg(
      jpeg: Array[Byte], le: Boolean,
      make: String, model: String, orientation: Int, dt: String,
      exposureDen: Long, iso: Int, pxW: Long, pxH: Long,
      focalNum: Long, focalDen: Long,
      latRef: String, latDms: (Long, Long, Long, Long),
      lonRef: String, lonDms: (Long, Long, Long, Long)): Array[Byte] = {
    require(jpeg.length > 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8)
    val tiffBytes = buildExifTiff(le, make, model, orientation, dt,
      exposureDen, iso, pxW, pxH, focalNum, focalDen,
      latRef, latDms, lonRef, lonDms)
    val app1Len = 2 + 6 + tiffBytes.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2) // SOI
    out.write(0xff); out.write(0xe1)
    out.write((app1Len >> 8) & 0xff); out.write(app1Len & 0xff)
    out.write("Exif".getBytes("ASCII")); out.write(0); out.write(0)
    out.write(tiffBytes)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** Deterministic EXIF fixture — the laws the q193 oracle replays;
    * byte order alternates II/MM. The carrier cycles: a REAL JPEG
    * (APP1 Exif) on most ids, a BARE TIFF stream on every 4th —
    * scanned-document corpora carry raw `.tif`, and the metadata laws
    * are carrier-independent (the oracle needs no change). */
  def exifFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val dt = f"${2020 + r % 5}%04d:${1 + r % 12}%02d:${1 + r % 28}%02d " +
        f"${r % 24}%02d:${(3 * r) % 60}%02d:${(7 * r) % 60}%02d"
      val media =
        if (r % 4 == 3)
          buildExifTiff(le = r % 2 == 0,
            make = s"Maker${r % 5}", model = s"Cam-$r",
            orientation = 1 + r % 8, dt = dt,
            exposureDen = 125 + r % 500, iso = 100 * (1 + r % 32),
            pxW = 640L + r * 16, pxH = 480L + r * 9,
            focalNum = 35 + r % 300, focalDen = 10,
            latRef = if (r % 2 == 0) "N" else "S",
            latDms = (r % 90, (3L * r) % 60, (1101L * r) % 6000, 100L),
            lonRef = if (r % 3 == 0) "E" else "W",
            lonDms = (r % 180, (7L * r) % 60, (2203L * r) % 6000, 100L))
        else
          buildExifJpeg(
            Multimodal.encodeJpegGray(8 + r % 4, 6 + r % 3, (r * 37) % 256),
            le = r % 2 == 0,
            make = s"Maker${r % 5}", model = s"Cam-$r",
            orientation = 1 + r % 8, dt = dt,
            exposureDen = 125 + r % 500, iso = 100 * (1 + r % 32),
            pxW = 640L + r * 16, pxH = 480L + r * 9,
            focalNum = 35 + r % 300, focalDen = 10,
            latRef = if (r % 2 == 0) "N" else "S",
            latDms = (r % 90, (3L * r) % 60, (1101L * r) % 6000, 100L),
            lonRef = if (r % 3 == 0) "E" else "W",
            lonDms = (r % 180, (7L * r) % 60, (2203L * r) % 6000, 100L))
      Row(r.toLong, media)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
