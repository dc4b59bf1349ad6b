package graft

import graft.operators.{ExifLake, Multimodal}

/** EXIF extraction (q193): law replay on both byte orders, and the
  * strictness matrix. */
class ExifSpec extends SparkSpec {

  test("fixture fields match the laws on both byte orders") {
    val n = 8
    val got = ExifLake.extractExif(
        ExifLake.exifFixture(spark, n), "id", "media")
      .orderBy("id").collect()
    for (r <- 0 until n) {
      val row = got(r)
      assert(row.getAs[Boolean]("valid"), s"id $r")
      assert(row.getAs[String]("byte_order") ==
        (if (r % 2 == 0) "II" else "MM"))
      assert(row.getAs[String]("make") == s"Maker${r % 5}")
      assert(row.getAs[String]("model") == s"Cam-$r")
      assert(row.getAs[Int]("orientation") == 1 + r % 8)
      assert(row.getAs[String]("dt") ==
        f"${2020 + r % 5}%04d:${1 + r % 12}%02d:${1 + r % 28}%02d " +
          f"${r % 24}%02d:${(3 * r) % 60}%02d:${(7 * r) % 60}%02d")
      assert(row.getAs[Long]("exposure_den") == 125 + r % 500)
      assert(row.getAs[Int]("iso") == 100 * (1 + r % 32))
      assert(row.getAs[Long]("px_width") == 640L + r * 16)
      assert(row.getAs[Long]("lat_sec_num") == (1101L * r) % 6000)
      assert(row.getAs[String]("lon_ref") == (if (r % 3 == 0) "E" else "W"))
    }
  }

  test("strictness matrix") {
    def build(le: Boolean): Array[Byte] = ExifLake.buildExifJpeg(
      Multimodal.encodeJpegGray(8, 6, 40), le,
      "Mk", "Md", 3, "2024:01:02 03:04:05", 250, 200, 640, 480, 50, 10,
      "N", (10, 20, 3000, 100), "W", (30, 40, 5000, 100))
    val good = build(le = true)
    assert(ExifLake.parseExif(good).isDefined)
    assert(ExifLake.parseExif(build(le = false)).isDefined)
    // a plain JPEG with no Exif APP1 flags
    assert(ExifLake.parseExif(Multimodal.encodeJpegGray(8, 6, 40)).isEmpty)
    // TIFF layout in the built file: SOI(2) + APP1 hdr(4) + preamble(6)
    val tiff = 12
    // bad TIFF magic
    val badMagic = good.clone(); badMagic(tiff + 2) = 0; badMagic(tiff + 3) = 43
    assert(ExifLake.parseExif(badMagic).isEmpty)
    // descending tags: swap IFD0 entries 0 and 1 (12 bytes each)
    val swapped = good.clone()
    val e0 = tiff + 8 + 2
    for (i <- 0 until 12) {
      val t = swapped(e0 + i)
      swapped(e0 + i) = swapped(e0 + 12 + i)
      swapped(e0 + 12 + i) = t
    }
    assert(ExifLake.parseExif(swapped).isEmpty)
    // out-of-bounds out-of-line offset: needs a value that is NOT
    // inline (>4 bytes), so use a long Make; its pointer sits in the
    // first IFD0 entry's value field
    val longMake = ExifLake.buildExifJpeg(
      Multimodal.encodeJpegGray(8, 6, 40), le = true,
      "A-much-longer-camera-maker", "Md", 3, "2024:01:02 03:04:05",
      250, 200, 640, 480, 50, 10,
      "N", (10, 20, 3000, 100), "W", (30, 40, 5000, 100))
    assert(ExifLake.parseExif(longMake).isDefined)
    val oob = longMake.clone()
    oob(e0 + 8) = 0xff.toByte; oob(e0 + 9) = 0xff.toByte
    assert(ExifLake.parseExif(oob).isEmpty)
    // a second Exif APP1 rejects (ambiguous metadata)
    val app1Len = ((good(4) & 0xff) << 8) | (good(5) & 0xff)
    val seg = java.util.Arrays.copyOfRange(good, 2, 2 + 2 + app1Len)
    val doubled = good.take(2) ++ seg ++ good.drop(2)
    assert(ExifLake.parseExif(doubled).isEmpty)
    // truncation sweep over the metadata region
    for (cut <- 1 to 40)
      assert(ExifLake.parseExif(
        java.util.Arrays.copyOf(good, tiff + 40 - cut)).isEmpty)
    // junk and null
    assert(ExifLake.parseExif(null).isEmpty)
    assert(ExifLake.parseExif(
      Array.tabulate[Byte](300)(i => (i * 23).toByte)).isEmpty)
  }

  test("bare TIFF streams parse on both byte orders (standalone .tif)") {
    for (le <- Seq(true, false)) {
      val t = ExifLake.buildExifTiff(le,
        "Mk", "Md", 5, "2024:01:02 03:04:05", 250, 200, 640, 480, 50, 10,
        "N", (10, 20, 3000, 100), "W", (30, 40, 5000, 100))
      val got = ExifLake.parseExif(t)
      assert(got.isDefined, s"le=$le")
      assert(got.get.byteOrder == (if (le) "II" else "MM"))
      assert(got.get.make == "Mk" && got.get.orientation == 5)
      assert(got.get.pxWidth == 640 && got.get.lonDeg == 30)
      // truncation sweep: every cut rejects, never throws
      for (cut <- 1 until t.length)
        assert(ExifLake.parseExif(java.util.Arrays.copyOf(t, cut)).isEmpty)
    }
  }

  test("count/offset past 2^31 reject in Long domain (no Int wrap)") {
    // regression for the r13 ADVICE finding: a crafted ASCII entry
    // whose count (or out-of-line offset) has the top u32 bit set
    // used to wrap negative under .toInt and slip past an Int-domain
    // bound check into new String — an uncaught
    // StringIndexOutOfBounds, violating the parse->Option contract
    val good = ExifLake.buildExifTiff(le = true,
      "A-much-longer-camera-maker", "Md", 3, "2024:01:02 03:04:05",
      250, 200, 640, 480, 50, 10,
      "N", (10, 20, 3000, 100), "W", (30, 40, 5000, 100))
    assert(ExifLake.parseExif(good).isDefined)
    val e0 = 8 + 2 // first IFD0 entry (Make, type ASCII, out-of-line)
    // count := 0x80000010 (LE at e0+4)
    val hugeCount = good.clone()
    hugeCount(e0 + 4) = 0x10; hugeCount(e0 + 5) = 0
    hugeCount(e0 + 6) = 0; hugeCount(e0 + 7) = 0x80.toByte
    assert(ExifLake.parseExif(hugeCount).isEmpty)
    // offset := 0xfffffff0 (LE at e0+8)
    val hugeOff = good.clone()
    hugeOff(e0 + 8) = 0xf0.toByte; hugeOff(e0 + 9) = 0xff.toByte
    hugeOff(e0 + 10) = 0xff.toByte; hugeOff(e0 + 11) = 0xff.toByte
    assert(ExifLake.parseExif(hugeOff).isEmpty)
    // sub-IFD pointer with the top bit set (Exif IFD tag 0x8769 is
    // IFD0 entry 4; its value is inline LONG at +8)
    val hugePtr = good.clone()
    val e4 = 8 + 2 + 4 * 12
    hugePtr(e4 + 8) = 0xf0.toByte; hugePtr(e4 + 9) = 0xff.toByte
    hugePtr(e4 + 10) = 0xff.toByte; hugePtr(e4 + 11) = 0xff.toByte
    assert(ExifLake.parseExif(hugePtr).isEmpty)
  }
}
