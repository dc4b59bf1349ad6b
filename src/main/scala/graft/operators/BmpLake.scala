package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BMP image decode (the Windows BITMAPINFOHEADER format — scanned
  * documents and legacy image dumps in a multimodal corpus). Extends
  * the decoded-image family (PNG/JPEG/GIF) with the one format whose
  * ROW ORDER is data-dependent: positive heights store rows
  * bottom-up, negative heights top-down — the classic orientation
  * bug, here pinned by a top-row checksum.
  *
  * Closed subset (strict — reject, never guess):
  *  - BITMAPFILEHEADER: `BM`, declared file size == blob length,
  *    reserved words zero, data offset == 14 + 40 + 4·palette;
  *  - BITMAPINFOHEADER (size 40 exactly — V4/V5 headers out of
  *    subset): width in [1, 2^14], |height| in [1, 2^14], planes 1,
  *    bpp 8 (palette) or 24 (BGR), BI_RGB only (the RLE8 codec lives
  *    in the AVI family), sizeImage 0 or exact, 8-bpp palettes of
  *    1..256 BGRX quads with X == 0, 24-bpp files declare no
  *    palette;
  *  - pixel array: 4-byte row stride with ZERO padding bytes, every
  *    8-bpp index inside the palette, file ends exactly at the last
  *    row.
  *
  * Emits per-file dims/orientation plus `pixel_sum` over ALL pixels
  * and `row0_sum` over the TOP row in image orientation — equal
  * pixel sums cannot mask a flipped decode. One blob = one
  * task-local walk. */
object BmpLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class Bmp(
      width: Int, height: Int, topdown: Boolean, bpp: Int, nColors: Int,
      pixelSum: Long, row0Sum: Long)

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o + 2 > b.length) throw Fail
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o + 4 > b.length) throw Fail
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  }

  /** Walk one bitmap; None on any spec or subset violation. */
  private[graft] def parseBmp(raw: Array[Byte]): Option[Bmp] = {
    if (raw == null || raw.length < 54) return None
    try {
      if (raw(0) != 'B' || raw(1) != 'M') return None
      if (u32(raw, 2) != raw.length) throw Fail // declared size law
      if (u16(raw, 6) != 0 || u16(raw, 8) != 0) throw Fail // reserved
      val dataOff = u32(raw, 10)
      if (u32(raw, 14) != 40) throw Fail // BITMAPINFOHEADER only
      val w = u32(raw, 18).toInt
      val hRaw = u32(raw, 22).toInt // signed
      if (w < 1 || w > (1 << 14)) throw Fail
      val topdown = hRaw < 0
      val h = math.abs(hRaw)
      if (h < 1 || h > (1 << 14)) throw Fail
      if (u16(raw, 26) != 1) throw Fail // planes
      val bpp = u16(raw, 28)
      if (bpp != 8 && bpp != 24) throw Fail
      if (u32(raw, 30) != 0) throw Fail // BI_RGB only
      val stride = ((w * (bpp / 8) + 3) / 4) * 4
      val sizeImage = u32(raw, 34)
      if (sizeImage != 0 && sizeImage != stride.toLong * h) throw Fail
      val colorsUsed = u32(raw, 46).toInt
      val colorsImportant = u32(raw, 50).toInt
      val nc =
        if (bpp == 8) { if (colorsUsed == 0) 256 else colorsUsed }
        else {
          if (colorsUsed != 0) throw Fail // 24-bpp declares no palette
          0
        }
      if (nc < 0 || nc > 256) throw Fail
      if (colorsImportant < 0 || colorsImportant > math.max(nc, 0)) throw Fail
      if (dataOff != 14 + 40 + 4L * nc) throw Fail // exact offset law
      if (dataOff + stride.toLong * h != raw.length) throw Fail // exact end

      // palette (BGRX, X must be 0)
      val palSum = new Array[Long](math.max(nc, 1))
      var k = 0
      while (k < nc) {
        val o = 54 + 4 * k
        if (raw(o + 3) != 0) throw Fail // reserved quad byte
        palSum(k) = (raw(o) & 0xff).toLong + (raw(o + 1) & 0xff) +
          (raw(o + 2) & 0xff)
        k += 1
      }

      var pixelSum = 0L
      var row0Sum = 0L
      var fy = 0 // file row order
      while (fy < h) {
        val y = if (topdown) fy else h - 1 - fy // image orientation
        val ro = dataOff.toInt + fy * stride
        var x = 0
        var rowSum = 0L
        if (bpp == 8) {
          while (x < w) {
            val idx = raw(ro + x) & 0xff
            if (idx >= nc) throw Fail // index outside the palette
            rowSum += palSum(idx)
            x += 1
          }
          var pz = w
          while (pz < stride) {
            if (raw(ro + pz) != 0) throw Fail // dirty padding
            pz += 1
          }
        } else {
          while (x < w) {
            val o = ro + 3 * x
            rowSum += (raw(o) & 0xff).toLong + (raw(o + 1) & 0xff) +
              (raw(o + 2) & 0xff)
            x += 1
          }
          var pz = 3 * w
          while (pz < stride) {
            if (raw(ro + pz) != 0) throw Fail
            pz += 1
          }
        }
        pixelSum += rowSum
        if (y == 0) row0Sum = rowSum
        fy += 1
      }
      Some(Bmp(w, h, topdown, bpp, nc, pixelSum, row0Sum))
    } catch { case Fail => None }
  }

  /** One row per bitmap; an invalid file yields one flagged row. */
  def extractBmp(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("topdown", BooleanType, true),
      StructField("bpp", IntegerType, true),
      StructField("nc", IntegerType, true),
      StructField("pixel_sum", LongType, true),
      StructField("row0_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        scala.util.Try(parseBmp(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(b) =>
            Row(id, b.width, b.height, b.topdown, b.bpp, b.nColors,
              b.pixelSum, b.row0Sum, true)
          case None =>
            Row(id, null, null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * k)) & 0xff).toByte)

  /** Fixture law (replayed closed-form by the oracle): file i is
    * (3+i%5)×(2+i%4); 8-bpp palette (nc = 64+64·(i%3), entry k =
    * (3k, 5k, 7k) mod 256) on even ids, 24-bpp BGR on odd; top-down
    * (negative height) when i%3==0; 24-bpp pixel (x,y) components
    * b=(i+3x+7y)%256, g=(2i+5x+11y)%256, r=(3i+7x+13y)%256; 8-bpp
    * index (x + y·w + i) % nc. */
  def bmpFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val w = 3 + i % 5
      val h = 2 + i % 4
      val bpp = if (i % 2 == 0) 8 else 24
      val topdown = i % 3 == 0
      val nc = if (bpp == 8) 64 + 64 * (i % 3) else 0
      val stride = ((w * (bpp / 8) + 3) / 4) * 4
      val dataOff = 14 + 40 + 4 * nc
      val total = dataOff + stride * h
      val b = new Array[Byte](total)
      b(0) = 'B'; b(1) = 'M'
      System.arraycopy(le(total.toLong, 4), 0, b, 2, 4)
      System.arraycopy(le(dataOff.toLong, 4), 0, b, 10, 4)
      System.arraycopy(le(40, 4), 0, b, 14, 4)
      System.arraycopy(le(w.toLong, 4), 0, b, 18, 4)
      System.arraycopy(le((if (topdown) -h else h).toLong & 0xffffffffL, 4),
        0, b, 22, 4)
      b(26) = 1
      b(28) = bpp.toByte
      // compression 0, sizeImage 0 (legal), ppm 0
      if (bpp == 8) System.arraycopy(le(nc.toLong, 4), 0, b, 46, 4)
      (0 until nc).foreach { k =>
        b(54 + 4 * k) = (k * 3 % 256).toByte
        b(54 + 4 * k + 1) = (k * 5 % 256).toByte
        b(54 + 4 * k + 2) = (k * 7 % 256).toByte
      }
      (0 until h).foreach { fy =>
        val y = if (topdown) fy else h - 1 - fy
        val ro = dataOff + fy * stride
        (0 until w).foreach { x =>
          if (bpp == 8) b(ro + x) = ((x + y * w + i) % nc).toByte
          else {
            b(ro + 3 * x) = ((i + 3 * x + 7 * y) % 256).toByte
            b(ro + 3 * x + 1) = ((2 * i + 5 * x + 11 * y) % 256).toByte
            b(ro + 3 * x + 2) = ((3 * i + 7 * x + 13 * y) % 256).toByte
          }
        }
      }
      Row(i.toLong, b)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
