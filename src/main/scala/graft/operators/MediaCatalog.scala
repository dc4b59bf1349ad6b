package graft.operators

/** Mixed-media catalog — the media twin of the q186 document catalog
  * and the q215 tensor catalog: a crawl bucket interleaves images,
  * audio and video containers, and the first curation pass is one
  * magic-sniff dispatch that routes every blob to its family walk
  * and censuses minimal facts on ONE schema:
  *
  *  - images (PNG / BMP / GIF / JPEG via ImageIO, WebP via the
  *    spec-written VP8L decoder, TIFF via the spec-written decoder —
  *    the [[Multimodal.parseDHash]] routing, so the catalog inherits
  *    each format's strictness posture): kind `image`, width/height,
  *    n_units 1; LOSSY WebP (`VP8 `) and extended (`VP8X`) profiles
  *    census fmt `webp_lossy` / `webp_ext` with the header-declared
  *    dimensions via [[WebpLake.webpCensus]] — no pinnable pixel
  *    oracle exists for the lossy transform pipeline, so the census
  *    records the facts the headers declare instead of guessing
  *    pixels;
  *  - WAV (the strict PCM chunk walk): kind `audio`, channels /
  *    rate, n_units = sample frames; FLAC (the CRC-verified
  *    constant-subframe walk): channels / rate, n_units = frames;
  *  - Ogg (the CRC-verified [[OggLake]] walk): kind `audio`,
  *    channels / sample rate from the first stream's ident packet,
  *    n_units = its packet census;
  *  - MP4 (the box walk): kind `video`, audio-track channels/rate
  *    when present, n_units = track count; AVI (the RIFF walk):
  *    width/height, n_units = frame count;
  *  - EBML/Matroska (the [[EbmlLake]] walk): kind `video`,
  *    width/height from the first video track, channels/rate from
  *    the first audio track if any, n_units = cluster count;
  *  - anything else: kind `other` with null facts and valid=true —
  *    a census records presence, it never guesses — while a blob
  *    whose magic MATCHES a family but whose body violates that
  *    family's laws is valid=false (a lying PNG is corrupt, not
  *    `other`).
  *
  * One blob = one task-local walk (codec-family plan shape); the
  * dispatch itself is a cheap prefix sniff, so a mixed 100 TB bucket
  * pays exactly one family walk per blob.
  */
object MediaCatalog {

  /** Magic sniff (cheap prefix checks only). */
  private[graft] def route(b: Array[Byte]): String = {
    if (b == null || b.length < 12) return "other"
    def at(i: Int, c: Char): Boolean = b(i) == c.toByte
    if ((b(0) & 0xff) == 0x89 && at(1, 'P') && at(2, 'N') && at(3, 'G'))
      "png"
    else if (at(0, 'B') && at(1, 'M')) "bmp"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
        at(8, 'W') && at(9, 'E') && at(10, 'B') && at(11, 'P')) "webp"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
        at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "wav"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
        at(8, 'A') && at(9, 'V') && at(10, 'I') && at(11, ' ')) "avi"
    else if ((at(0, 'I') && at(1, 'I') && b(2) == 42 && b(3) == 0) ||
        (at(0, 'M') && at(1, 'M') && b(2) == 0 && b(3) == 42)) "tiff"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8')) "gif"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (at(0, 'f') && at(1, 'L') && at(2, 'a') && at(3, 'C')) "flac"
    else if (at(4, 'f') && at(5, 't') && at(6, 'y') && at(7, 'p')) "mp4"
    else if (at(0, 'O') && at(1, 'g') && at(2, 'g') && at(3, 'S')) "ogg"
    else if ((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3) "ebml"
    else "other"
  }

  private final val ImageFmts = Set("png", "bmp", "webp", "tiff", "gif",
    "jpeg")

  /** One row per blob: (fmt, kind, width, height, channels,
    * sample_rate, n_units, valid). */
  def catalogMedia(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("fmt", StringType, true),
      StructField("kind", StringType, true),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("sample_rate", LongType, true),
      StructField("n_units", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        val fmt = scala.util.Try(route(media)).getOrElse("other")
        fmt match {
          case "webp" =>
            // profile first: lossless decodes fully (the VP8L pixel
            // walk), lossy/extended census header-declared facts —
            // pixel decode of lossy VP8 has no pinnable oracle, so
            // censusing is the honest posture (corrupt ≠ other: a
            // header-law violation is valid=false)
            scala.util.Try(WebpLake.webpCensus(media)).toOption
              .flatten match {
              case Some(("lossless", _, _)) =>
                scala.util.Try(Multimodal.parseDHash(media)).toOption
                  .flatten match {
                  case Some((_, w, h)) =>
                    Row(id, "webp", "image", w, h, null, null, 1, true)
                  case None =>
                    Row(id, "webp", "image", null, null, null, null,
                      null, false)
                }
              case Some(("lossy", w, h)) =>
                Row(id, "webp_lossy", "image", w, h, null, null, 1, true)
              case Some(("extended", w, h)) =>
                Row(id, "webp_ext", "image", w, h, null, null, 1, true)
              case _ =>
                Row(id, "webp", "image", null, null, null, null, null,
                  false)
            }
          case "tiff" =>
            // the page-chain surface: scanned documents are
            // predominantly multi-page — n_units is the page count
            // and the dims are the first page's (single-page files
            // census exactly as before)
            scala.util.Try(TiffLake.parseTiffPages(media)).toOption
              .flatten match {
              case Some(pages) =>
                Row(id, "tiff", "image", pages.head.width,
                  pages.head.height, null, null, pages.length, true)
              case None =>
                Row(id, "tiff", "image", null, null, null, null, null,
                  false)
            }
          case f if ImageFmts.contains(f) =>
            scala.util.Try(Multimodal.parseDHash(media)).toOption
              .flatten match {
              case Some((_, w, h)) =>
                Row(id, f, "image", w, h, null, null, 1, true)
              case None =>
                Row(id, f, "image", null, null, null, null, null, false)
            }
          case "wav" =>
            scala.util.Try(Multimodal.parseWav(media)).toOption
              .flatten match {
              case Some((rate, ch, bits, _, dLen)) =>
                Row(id, "wav", "audio", null, null, ch, rate.toLong,
                  dLen / (ch * bits / 8), true)
              case None =>
                Row(id, "wav", "audio", null, null, null, null, null,
                  false)
            }
          case "flac" =>
            scala.util.Try(Multimodal.parseFlac(media)).toOption
              .flatten match {
              case Some((rate, ch, _, nFrames, _, _)) =>
                Row(id, "flac", "audio", null, null, ch, rate.toLong,
                  nFrames, true)
              case None =>
                Row(id, "flac", "audio", null, null, null, null, null,
                  false)
            }
          case "mp4" =>
            scala.util.Try(Multimodal.parseMp4(media)).toOption
              .flatten match {
              case Some((_, _, _, nTracks, _, aRate, aCh, _)) =>
                Row(id, "mp4", "video", null, null,
                  if (aCh > 0) Int.box(aCh) else null,
                  if (aRate > 0) Long.box(aRate.toLong) else null,
                  nTracks, true)
              case None =>
                Row(id, "mp4", "video", null, null, null, null, null,
                  false)
            }
          case "avi" =>
            scala.util.Try(Multimodal.parseAvi(media)).toOption
              .flatten match {
              case Some((w, h, moviFrames, _, _, _)) =>
                Row(id, "avi", "video", w, h, null, null, moviFrames,
                  true)
              case None =>
                Row(id, "avi", "video", null, null, null, null, null,
                  false)
            }
          case "ogg" =>
            scala.util.Try(OggLake.parseOgg(media)).toOption
              .flatten match {
              case Some(ss) if ss.nonEmpty =>
                val s = ss(0)
                Row(id, "ogg", "audio", null, null,
                  s.channels.map(Int.box).orNull,
                  s.sampleRate.map(Long.box).orNull, s.nPackets, true)
              case _ =>
                Row(id, "ogg", "audio", null, null, null, null, null,
                  false)
            }
          case "ebml" =>
            scala.util.Try(EbmlLake.parseEbml(media)).toOption
              .flatten match {
              case Some(d) =>
                val video = d.tracks.find(_.trackType == 1)
                val audio = d.tracks.find(_.trackType == 2)
                Row(id, "ebml", "video",
                  video.flatMap(_.pixW).map(w => Int.box(w.toInt))
                    .orNull,
                  video.flatMap(_.pixH).map(h => Int.box(h.toInt))
                    .orNull,
                  audio.flatMap(_.channels).map(c => Int.box(c.toInt))
                    .orNull,
                  audio.flatMap(_.sampleHz).map(h => Long.box(h.toLong))
                    .orNull,
                  d.nClusters, true)
              case None =>
                Row(id, "ebml", "video", null, null, null, null, null,
                  false)
            }
          case _ =>
            Row(id, "other", "other", null, null, null, null, null,
              true)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Minimal 16-bit PCM WAV (fixture side). */
  private[graft] def pcmWav(ch: Int, rate: Int, nSamples: Int,
      seed: Int): Array[Byte] = {
    val blockAlign = ch * 2
    val dLen = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(ch.toShort).putInt(rate)
    bb.putInt(rate * blockAlign).putShort(blockAlign.toShort)
    bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dLen)
    var k = 0
    while (k < nSamples * ch) {
      bb.putShort((((seed * 31 + k * 7) % 2000) - 1000).toShort)
      k += 1
    }
    bb.array()
  }

  /** Fixture laws (blob i, routed by i % 13): the q190 dHash law
    * image at scale 1+i%3 as PNG / BMP / WebP / TIFF; a minimal
    * two-page Opus stream (channels 1+i%2, rate 48000, 2+i%3 audio
    * packets); a one-or-two-track EBML file (video dims 320+16i ×
    * 240+8i, audio channels 2 at 48000 on odd i, 1+i%2 clusters);
    * an unknown-magic blob censused as `other`; a 16-bit PCM WAV
    * (channels 1+i%2, rate 8000·(1+i%2), 64+i sample frames); a
    * constant-subframe FLAC (rate 32000/44100/48000 by i%3, 3+i%5
    * frames); an MP4 with one audio track (same rate law, channels
    * 1+i%2); a one-stream MJPEG AVI (dims 12+i%8 × 8+i%5,
    * 2+i%4 frames); a LOSSY VP8 key frame (dims 64+2i × 48+i,
    * censused without pixel decode); and an extended VP8X container
    * (canvas 200+3i × 100+2i over a VP8 still). */
  def mediaFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val s = 1 + i % 3
      val bytes = (i % 13) match {
        case 0 => Multimodal.encodeDHashPng(Multimodal.dhashBit(i), s)
        case 1 => Multimodal.encodeDHashBmp(Multimodal.dhashBit(i), s)
        case 2 => Multimodal.encodeDHashWebp(Multimodal.dhashBit(i), s)
        case 3 => Multimodal.encodeDHashTiff(Multimodal.dhashBit(i), s)
        case 4 =>
          val ident = OggLake.opusHead(1 + i % 2, 120, 48000L)
          val nPk = 2 + i % 3
          val pkts = (0 until nPk).map(j =>
            Array.tabulate(30 + j)(k => ((i * 7 + j + k) % 256).toByte))
          val bos = new java.io.ByteArrayOutputStream()
          bos.write(OggLake.writePage(OggLake.EncPage(500L + i, 0, 0,
            bos = true, eos = false, cont = false,
            OggLake.packetLaces(ident), ident)))
          val laces = pkts.flatMap(OggLake.packetLaces)
          bos.write(OggLake.writePage(OggLake.EncPage(500L + i, 1,
            960L * nPk, bos = false, eos = true, cont = false, laces,
            pkts.flatten.toArray)))
          bos.toByteArray
        case 5 =>
          val tracks =
            EbmlLake.EbmlTrack(1, 1, "V_VP9", Some(320L + 16 * i),
              Some(240L + 8 * i), None, None) +:
              (if (i % 2 == 1)
                Seq(EbmlLake.EbmlTrack(2, 2, "A_OPUS", None, None,
                  Some(1L + i % 2), Some(48000.0)))
              else Nil)
          EbmlLake.encodeEbml(
            if (i % 2 == 0) "webm" else "matroska", 4, Some(1000000L),
            Some(2000.0 + i), durF32 = false, "cat", tracks,
            (0 until 1 + i % 2).map(c => 48 + 16 * c),
            planted = false)
        case 6 =>
          Array.tabulate(24)(k => (((i * 13 + k) % 200) + 1).toByte)
        case 7 =>
          pcmWav(1 + i % 2, 8000 * (1 + i % 2), 64 + i, i)
        case 8 =>
          Multimodal.encodeFlac(8 + i % 3, 1 + i % 2, 16, 3 + i % 5,
            i.toLong)
        case 9 =>
          Multimodal.encodeMp4(Array(32000, 44100, 48000)(i % 3),
            1 + i % 2, 1000L + i)
        case 10 =>
          Multimodal.encodeAvi(12 + i % 8, 8 + i % 5,
            (0 until 2 + i % 4).map(f => (i * 11 + f * 29) % 256),
            10 + i % 15)
        case 11 =>
          WebpLake.riffWebp(Seq("VP8 " ->
            WebpLake.vp8KeyPayload(64 + 2 * i, 48 + i, 5 + i % 7, i)))
        case _ =>
          WebpLake.riffWebp(Seq(
            "VP8X" -> WebpLake.vp8xPayload(200 + 3 * i, 100 + 2 * i),
            "VP8 " -> WebpLake.vp8KeyPayload(16, 16, 4, i)))
      }
      Row(i.toLong, bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
