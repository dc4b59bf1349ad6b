package graft

import graft.operators.{EbmlLake, MediaCatalog, Multimodal, OggLake}

/** Media catalog: route discrimination across every magic, fact
  * equality against the dedicated extractors, the corrupt-vs-other
  * distinction, fixture replay. */
class MediaCatalogSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df(pairs: (Long, Array[Byte])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        pairs.map { case (i, b) => Row(i, b) }, 2),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))

  test("route discriminates every family magic") {
    val png = Multimodal.encodeDHashPng(Multimodal.dhashBit(1), 1)
    val bmp = Multimodal.encodeDHashBmp(Multimodal.dhashBit(1), 1)
    val webp = Multimodal.encodeDHashWebp(Multimodal.dhashBit(1), 1)
    val tiff = Multimodal.encodeDHashTiff(Multimodal.dhashBit(1), 1)
    assert(MediaCatalog.route(png) == "png")
    assert(MediaCatalog.route(bmp) == "bmp")
    assert(MediaCatalog.route(webp) == "webp")
    assert(MediaCatalog.route(tiff) == "tiff")
    // a GIF via ImageIO (animated formats route as image too)
    val img = new java.awt.image.BufferedImage(12, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    assert(MediaCatalog.route(bos.toByteArray) == "gif")
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    assert(MediaCatalog.route(jb.toByteArray) == "jpeg")
    assert(MediaCatalog.route("OggS12345678".getBytes("US-ASCII")) ==
      "ogg")
    assert(MediaCatalog.route(Array[Byte](0x1a, 0x45, 0xdf.toByte,
      0xa3.toByte) ++ new Array[Byte](8)) == "ebml")
    // the three RIFF variants must discriminate on the form type
    assert(MediaCatalog.route(MediaCatalog.pcmWav(1, 8000, 4, 0)) ==
      "wav")
    assert(MediaCatalog.route(
      Multimodal.encodeAvi(12, 8, Seq(10, 20), 10)) == "avi")
    assert(MediaCatalog.route(
      Multimodal.encodeFlac(9, 1, 16, 2, 5L)) == "flac")
    assert(MediaCatalog.route(
      Multimodal.encodeMp4(44100, 1, 100L)) == "mp4")
    assert(MediaCatalog.route("plain text here".getBytes) == "other")
    assert(MediaCatalog.route(null) == "other")
    assert(MediaCatalog.route(Array.emptyByteArray) == "other")
  }

  test("facts equal the dedicated extractors'; gif/jpeg route decodes") {
    val png = Multimodal.encodeDHashPng(Multimodal.dhashBit(2), 2)
    val img = new java.awt.image.BufferedImage(18, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 18).foreach(x =>
      img.setRGB(x, y, ((x * 13 + y * 7) % 256) * 0x010101)))
    val gif = { val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", o); o.toByteArray }
    val rows = MediaCatalog.catalogMedia(
      df(0L -> png, 1L -> gif), "id", "media")
      .orderBy("id").collect()
    assert(rows(0).getString(2) == "image" && rows(0).getInt(3) == 18 &&
      rows(0).getInt(4) == 16 && rows(0).getBoolean(8))
    assert(rows(1).getString(1) == "gif" && rows(1).getInt(3) == 18 &&
      rows(1).getInt(4) == 16 && rows(1).getBoolean(8))
  }

  test("multi-page TIFF censuses at the chain grain") {
    // a 3-page scan: n_units = page count, dims = page 0's; a
    // single-page TIFF keeps the exact pre-r17 row shape
    val multi = graft.operators.TiffLake.multiPageDoc(7) // 1 + 7%4 = 4 pages
    val single = Multimodal.encodeDHashTiff(Multimodal.dhashBit(3), 1)
    val rows = MediaCatalog.catalogMedia(
      df(0L -> multi, 1L -> single), "id", "media")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "tiff" && rows(0).getBoolean(8))
    assert(rows(0).getInt(7) == 4, "n_units = pages")
    assert(rows(0).getInt(3) == 5 + 7 % 4 && rows(0).getInt(4) == 4 + 7 % 3,
      "page-0 dims")
    assert(rows(1).getString(1) == "tiff" && rows(1).getInt(7) == 1 &&
      rows(1).getBoolean(8))
  }

  test("corrupt members flag invalid; unknown magics census as other") {
    val png = Multimodal.encodeDHashPng(Multimodal.dhashBit(0), 1)
    val corrupt = png.take(30) // valid magic, truncated body
    val unknown = "not any media format at all".getBytes("US-ASCII")
    val rows = MediaCatalog.catalogMedia(
      df(0L -> corrupt, 1L -> unknown), "id", "media")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "png" && !rows(0).getBoolean(8),
      "a lying PNG is corrupt, not other")
    assert(rows(1).getString(1) == "other" && rows(1).getBoolean(8),
      "an unknown magic is an honest census row")
    // a CRC-broken ogg flags invalid through the family walk
    val ident = OggLake.opusHead(1, 0, 48000L)
    val ogg = OggLake.writePage(OggLake.EncPage(9, 0, 0, bos = true,
      eos = true, cont = false, OggLake.packetLaces(ident), ident))
    val badOgg = ogg.clone(); badOgg(22) = (badOgg(22) ^ 1).toByte
    val r2 = MediaCatalog.catalogMedia(df(0L -> badOgg), "id", "media")
      .collect()
    assert(r2(0).getString(1) == "ogg" && !r2(0).getBoolean(8))
  }

  test("fixture + catalogMedia: every route censuses to its law") {
    val fx = MediaCatalog.mediaFixture(spark, 26)
    val rows = MediaCatalog.catalogMedia(fx, "id", "media")
      .orderBy("id").collect()
    assert(rows.length == 26)
    assert(rows.forall(_.getBoolean(8)), "all valid")
    assert(rows.map(_.getString(1)).toSeq == Seq("png", "bmp", "webp",
      "tiff", "ogg", "ebml", "other", "wav", "flac", "mp4", "avi",
      "webp_lossy", "webp_ext",
      "png", "bmp", "webp", "tiff", "ogg", "ebml", "other", "wav",
      "flac", "mp4", "avi", "webp_lossy", "webp_ext"))
    // ogg at id 4: channels 1, 48000, 3 + 4%3 = 4 packets
    val ogg4 = rows(4)
    assert(ogg4.getInt(5) == 1 && ogg4.getLong(6) == 48000L &&
      ogg4.getInt(7) == 3 + 4 % 3)
    // ebml at id 18 (18%13=5): video 320+16*18 x 240+8*18, even id =>
    // no audio plane
    val eb = rows(18)
    assert(eb.getInt(3) == 320 + 16 * 18 && eb.getInt(4) == 240 + 8 * 18)
    assert(eb.isNullAt(5) && eb.getInt(7) == 1 + 18 % 2)
    // lossy webp at ids 11/24: header-declared dims, kind image
    for (i <- Seq(11, 24)) {
      val lw = rows(i)
      assert(lw.getString(2) == "image" && lw.getInt(3) == 64 + 2 * i &&
        lw.getInt(4) == 48 + i && lw.getInt(7) == 1, s"lossy id=$i")
    }
    // extended webp at ids 12/25: canvas dims from the VP8X header
    for (i <- Seq(12, 25)) {
      val xw = rows(i)
      assert(xw.getString(2) == "image" && xw.getInt(3) == 200 + 3 * i &&
        xw.getInt(4) == 100 + 2 * i, s"ext id=$i")
    }
    // ebml at id 5 (odd): audio plane present
    val eb5 = rows(5)
    assert(eb5.getInt(5) == 2 && eb5.getLong(6) == 48000L)
    // wav at id 7: 2 ch, 16000 Hz, 64+7 frames
    val wav7 = rows(7)
    assert(wav7.getString(2) == "audio" && wav7.getInt(5) == 2 &&
      wav7.getLong(6) == 16000L && wav7.getInt(7) == 71)
    // flac at id 8: 1 ch, rate3(8)=48000, 3+8%5 frames
    val fl8 = rows(8)
    assert(fl8.getInt(5) == 1 && fl8.getLong(6) == 48000L &&
      fl8.getInt(7) == 3 + 8 % 5)
    // mp4 at id 9: 2 ch, rate3(9)=32000, one track
    val m9 = rows(9)
    assert(m9.getString(2) == "video" && m9.getInt(5) == 2 &&
      m9.getLong(6) == 32000L && m9.getInt(7) == 1)
    // avi at id 10: dims 12+10%8 x 8+10%5, 2+10%4 frames
    val a10 = rows(10)
    assert(a10.getInt(3) == 12 + 10 % 8 && a10.getInt(4) == 8 + 10 % 5 &&
      a10.getInt(7) == 2 + 10 % 4)
  }
}
