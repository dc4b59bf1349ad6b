package graft.operators

/** EBML / Matroska container catalog — WebM dominates scraped web
  * video, and a video-corpus curation layer needs per-track facts
  * (codec, dimensions, audio channels/rate, duration, cluster
  * census) without touching a codec. Written against the public
  * specs (RFC 8794 EBML, the Matroska element registry):
  *
  *  - VINT parsing exactly as the RFC defines: the leading-zero
  *    count of the first byte gives the width, element IDs keep
  *    their marker bit (1-4 bytes) while sizes strip it (1-8
  *    bytes); an all-ones size (the "unknown size" streaming form)
  *    REJECTS — a census needs definite extents;
  *  - strict tiling: the EBML header must be the FIRST element,
  *    exactly one Segment must follow and cover the remainder of
  *    the file, and every parent's children must consume its
  *    declared size EXACTLY;
  *  - the EBML header is validated (EBMLMaxIDLength <= 4,
  *    EBMLMaxSizeLength <= 8, DocType matroska/webm, versions as
  *    unsigned integers with the spec defaults when absent);
  *  - Segment walk: Info (TimestampScale with its 1_000_000
  *    default, Duration as a 4- or 8-byte IEEE float — a float32
  *    widens to double exactly — MuxingApp/WritingApp strict
  *    UTF-8), Tracks (TrackEntry: number, type, CodecID, nested
  *    Video PixelWidth/PixelHeight or Audio SamplingFrequency/
  *    Channels), Cluster elements censused by count and byte size
  *    with their payloads SKIPPED — forensics never decodes frames;
  *  - forward compatibility, EBML's design point: unknown element
  *    IDs at any level are skipped by their declared size (Void,
  *    SeekHead, Cues, Tags, Chapters in real files); integers are
  *    big-endian, 0-8 bytes (an EMPTY integer is the value 0 per
  *    RFC), bounded before narrowing.
  *
  * The fixture encoder writes the same subset (both doctypes,
  * video and audio tracks, absent-with-default elements, planted
  * unknown elements, multi-cluster bodies) so round-trip tests
  * drive every path with facts pinned exactly.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object EbmlLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class EbmlTrack(
      number: Long, trackType: Int, codecId: String,
      pixW: Option[Long], pixH: Option[Long],
      channels: Option[Long], sampleHz: Option[Double])

  private[graft] final case class EbmlDoc(
      docType: String, docTypeVersion: Long, timestampScale: Long,
      duration: Option[Double], muxingApp: String,
      tracks: Array[EbmlTrack], nClusters: Int, clusterBytes: Long)

  // ------------------------------------------------------------------
  // reader

  private final class Rd(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= b.length) throw Fail
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def raw(n: Long): Array[Byte] = {
      if (n < 0 || n > b.length - pos) throw Fail
      val a = java.util.Arrays.copyOfRange(b, pos, pos + n.toInt)
      pos += n.toInt
      a
    }
  }

  /** Element ID: 1-4 bytes, marker bit KEPT (0x1a45dfa3 form). */
  private def readId(rd: Rd): Long = {
    val first = rd.u8()
    val len =
      if ((first & 0x80) != 0) 1
      else if ((first & 0x40) != 0) 2
      else if ((first & 0x20) != 0) 3
      else if ((first & 0x10) != 0) 4
      else throw Fail
    var v = first.toLong
    var i = 1
    while (i < len) { v = (v << 8) | rd.u8(); i += 1 }
    v
  }

  /** Element size: 1-8 bytes, marker bit STRIPPED; all-ones rejects. */
  private def readSize(rd: Rd): Long = {
    val first = rd.u8()
    var len = 0
    var mask = 0x80
    while (mask != 0 && (first & mask) == 0) { len += 1; mask >>= 1 }
    if (mask == 0) throw Fail // 0x00: width > 8
    len += 1
    var v = (first & (mask - 1)).toLong
    var ones = (first & (mask - 1)) == mask - 1
    var i = 1
    while (i < len) {
      val x = rd.u8()
      v = (v << 8) | x
      ones &&= x == 0xff
      i += 1
    }
    if (ones) throw Fail // unknown-size element
    v
  }

  private def uint(b: Array[Byte]): Long = {
    if (b.length > 8) throw Fail
    var v = 0L
    b.foreach(x => v = (v << 8) | (x & 0xffL))
    if (v < 0) throw Fail // 8-byte values with the top bit set
    v
  }

  private def float(b: Array[Byte]): Double = b.length match {
    case 4 =>
      java.lang.Float.intBitsToFloat(
        ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
          ((b(2) & 0xff) << 8) | (b(3) & 0xff)).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uintRaw(b))
    case _ => throw Fail
  }

  private def uintRaw(b: Array[Byte]): Long = {
    var v = 0L
    b.foreach(x => v = (v << 8) | (x & 0xffL))
    v
  }

  private def strictUtf8(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
  }

  /** Walk the children of a master element spanning [rd.pos, end):
    * known children go to `handle(id, payload-extent)`, unknown are
    * skipped by size; the children must tile the extent exactly. */
  private def walk(rd: Rd, end: Long, depth: Int)(
      handle: (Long, Long) => Boolean): Unit = {
    if (depth > 16) throw Fail
    while (rd.pos < end) {
      val id = readId(rd)
      val size = readSize(rd)
      val pEnd = rd.pos + size
      if (size > end - rd.pos) throw Fail
      if (!handle(id, pEnd)) rd.pos = pEnd.toInt // unknown: skip
      if (rd.pos != pEnd) throw Fail // children consume exactly
    }
    if (rd.pos != end) throw Fail
  }

  // ------------------------------------------------------------------
  // document walk

  /** Census one EBML/Matroska file; None on any violation. */
  private[graft] def parseEbml(b: Array[Byte]): Option[EbmlDoc] = {
    if (b == null || b.length < 8) return None
    if ((b(0) & 0xff) != 0x1a || (b(1) & 0xff) != 0x45 ||
        (b(2) & 0xff) != 0xdf || (b(3) & 0xff) != 0xa3) return None
    try {
      val rd = new Rd(b)
      // ----- EBML header (must be first)
      if (readId(rd) != 0x1a45dfa3L) throw Fail
      val hSize = readSize(rd)
      val hEnd = rd.pos + hSize
      if (hSize > b.length - rd.pos) throw Fail
      var docType: String = null
      var docTypeVersion = 1L
      walk(rd, hEnd, 1) { (id, pEnd) =>
        val size = pEnd - rd.pos
        id match {
          case 0x4282 => docType = strictUtf8(rd.raw(size)); true
          case 0x4287 => docTypeVersion = uint(rd.raw(size)); true
          case 0x42f2 => // EBMLMaxIDLength
            if (uint(rd.raw(size)) > 4) throw Fail
            true
          case 0x42f3 => // EBMLMaxSizeLength
            if (uint(rd.raw(size)) > 8) throw Fail
            true
          case 0x4286 | 0x42f7 | 0x4285 => // versions: valid uints
            uint(rd.raw(size)); true
          case _ => false
        }
      }
      if (docType == null) throw Fail
      if (docType != "matroska" && docType != "webm") throw Fail
      // ----- exactly one Segment covering the rest of the file
      if (readId(rd) != 0x18538067L) throw Fail
      val segSize = readSize(rd)
      if (rd.pos + segSize != b.length) throw Fail
      var timestampScale = 1000000L
      var duration: Option[Double] = None
      var muxingApp: String = null
      var tracks: Array[EbmlTrack] = null
      var nClusters = 0
      var clusterBytes = 0L
      walk(rd, b.length, 1) { (id, pEnd) =>
        val size = pEnd - rd.pos
        id match {
          case 0x1549a966L => // Info
            walk(rd, pEnd, 2) { (cid, cEnd) =>
              val cSize = cEnd - rd.pos
              cid match {
                case 0x2ad7b1 =>
                  timestampScale = uint(rd.raw(cSize))
                  if (timestampScale < 1) throw Fail
                  true
                case 0x4489 =>
                  duration = Some(float(rd.raw(cSize)))
                  true
                case 0x4d80 => muxingApp = strictUtf8(rd.raw(cSize)); true
                case _ => false
              }
            }
            true
          case 0x1654ae6bL => // Tracks
            val acc = scala.collection.mutable.ArrayBuffer.empty[EbmlTrack]
            walk(rd, pEnd, 2) { (cid, cEnd) =>
              if (cid == 0xae) { // TrackEntry
                var number = -1L
                var ttype = -1
                var codec: String = null
                var pw: Option[Long] = None
                var ph: Option[Long] = None
                var ch: Option[Long] = None
                var hz: Option[Double] = None
                walk(rd, cEnd, 3) { (tid, tEnd) =>
                  val tSize = tEnd - rd.pos
                  tid match {
                    case 0xd7 => number = uint(rd.raw(tSize)); true
                    case 0x83 =>
                      val v = uint(rd.raw(tSize))
                      if (v < 1 || v > 254) throw Fail
                      ttype = v.toInt
                      true
                    case 0x86 => codec = strictUtf8(rd.raw(tSize)); true
                    case 0xe0 => // Video
                      walk(rd, tEnd, 4) { (vid, vEnd) =>
                        val vSize = vEnd - rd.pos
                        vid match {
                          case 0xb0 => pw = Some(uint(rd.raw(vSize))); true
                          case 0xba => ph = Some(uint(rd.raw(vSize))); true
                          case _ => false
                        }
                      }
                      true
                    case 0xe1 => // Audio
                      walk(rd, tEnd, 4) { (aid, aEnd) =>
                        val aSize = aEnd - rd.pos
                        aid match {
                          case 0xb5 => hz = Some(float(rd.raw(aSize))); true
                          case 0x9f => ch = Some(uint(rd.raw(aSize))); true
                          case _ => false
                        }
                      }
                      true
                    case _ => false
                  }
                }
                if (number < 1 || ttype < 0 || codec == null) throw Fail
                // a video track carries Video facts, an audio track
                // Audio facts — mixed or missing planes reject
                if (ttype == 1 && (pw.isEmpty || ph.isEmpty ||
                    ch.nonEmpty || hz.nonEmpty)) throw Fail
                if (ttype == 2 && (ch.isEmpty || hz.isEmpty ||
                    pw.nonEmpty || ph.nonEmpty)) throw Fail
                acc += EbmlTrack(number, ttype, codec, pw, ph, ch, hz)
                true
              } else false
            }
            if (acc.isEmpty) throw Fail
            if (tracks != null) throw Fail // one Tracks element
            tracks = acc.toArray
            true
          case 0x1f43b675L => // Cluster: censused, payload skipped
            nClusters += 1
            clusterBytes += size
            rd.pos = pEnd.toInt
            true
          case _ => false
        }
      }
      if (tracks == null || muxingApp == null) throw Fail
      Some(EbmlDoc(docType, docTypeVersion, timestampScale, duration,
        muxingApp, tracks, nClusters, clusterBytes))
    } catch { case Fail => None }
  }

  // ==================================================================
  // encoder (fixture/test side)

  private[graft] object Enc {
    def vintId(id: Long): Array[Byte] = {
      // IDs are written verbatim (marker included)
      val len =
        if (id <= 0xff) 1 else if (id <= 0xffff) 2
        else if (id <= 0xffffff) 3 else 4
      Array.tabulate(len)(k => ((id >> (8 * (len - 1 - k))) & 0xff).toByte)
    }
    def vintSize(v: Long, width: Int = 0): Array[Byte] = {
      require(v >= 0)
      var len = width
      if (len == 0) {
        len = 1
        while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
      }
      val out = new Array[Byte](len)
      var x = v | (1L << (7 * len))
      var k = len - 1
      while (k >= 0) { out(k) = (x & 0xff).toByte; x >>= 8; k -= 1 }
      out
    }
    def uintBytes(v: Long): Array[Byte] = {
      require(v >= 0)
      var len = 1
      while (len < 8 && (v >> (8 * len)) != 0) len += 1
      Array.tabulate(len)(k => ((v >> (8 * (len - 1 - k))) & 0xff).toByte)
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      vintId(id) ++ vintSize(payload.length.toLong) ++ payload
    def elUint(id: Long, v: Long): Array[Byte] = el(id, uintBytes(v))
    def elStr(id: Long, s: String): Array[Byte] =
      el(id, s.getBytes("UTF-8"))
    def elF64(id: Long, v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      el(id, Array.tabulate(8)(k =>
        ((bits >> (8 * (7 - k))) & 0xff).toByte))
    }
    def elF32(id: Long, v: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToIntBits(v)
      el(id, Array.tabulate(4)(k =>
        ((bits >> (8 * (3 - k))) & 0xff).toByte))
    }
  }

  /** Encode a full document from high-level facts. */
  private[graft] def encodeEbml(docType: String, docTypeVersion: Long,
      timestampScale: Option[Long], duration: Option[Double],
      durF32: Boolean, muxingApp: String, tracks: Seq[EbmlTrack],
      clusterSizes: Seq[Int], planted: Boolean): Array[Byte] = {
    import Enc._
    val header = el(0x1a45dfa3L,
      elUint(0x4286, 1) ++ elUint(0x42f7, 1) ++ elUint(0x42f2, 4) ++
        elUint(0x42f3, 8) ++ elStr(0x4282, docType) ++
        elUint(0x4287, docTypeVersion) ++ elUint(0x4285, 2))
    val info = el(0x1549a966L,
      timestampScale.map(elUint(0x2ad7b1, _)).getOrElse(Array.emptyByteArray) ++
        duration.map(d => if (durF32) elF32(0x4489, d.toFloat)
          else elF64(0x4489, d)).getOrElse(Array.emptyByteArray) ++
        elStr(0x4d80, muxingApp) ++ elStr(0x5741, "graft-writer") ++
        (if (planted) el(0xec, Array.tabulate(5)(_.toByte)) // Void
         else Array.emptyByteArray))
    val trackEls = tracks.map { t =>
      // planes follow the DECLARED facts, not the track type — so the
      // strictness spec can express a lying mixed-plane track
      val plane =
        t.pixW.map(w =>
          el(0xe0, elUint(0xb0, w) ++ elUint(0xba, t.pixH.get)))
          .getOrElse(Array.emptyByteArray) ++
          (if (t.channels.nonEmpty || t.sampleHz.nonEmpty)
            el(0xe1, t.sampleHz.map(h => elF64(0xb5, h))
              .getOrElse(Array.emptyByteArray) ++
              t.channels.map(elUint(0x9f, _))
                .getOrElse(Array.emptyByteArray))
          else Array.emptyByteArray)
      el(0xae, elUint(0xd7, t.number) ++ elUint(0x73c5, 7000 + t.number) ++
        elUint(0x83, t.trackType.toLong) ++ elStr(0x86, t.codecId) ++
        plane)
    }
    val tracksEl = el(0x1654ae6bL, trackEls.flatten.toArray)
    val clusters = clusterSizes.zipWithIndex.map { case (n, ci) =>
      el(0x1f43b675L,
        elUint(0xe7, 100L * ci) ++ // Timestamp
          el(0xa3, Array.tabulate(n)(k => ((ci * 37 + k) % 256).toByte)))
    }
    val voidTop =
      if (planted) el(0xec, Array.tabulate(9)(k => (k * 3).toByte))
      else Array.emptyByteArray
    val seg = el(0x18538067L,
      info ++ voidTop ++ tracksEl ++ clusters.flatten.toArray)
    header ++ seg
  }

  // ==================================================================
  // DataFrame surface + fixture (q226)

  /** One row per (file, track) in declaration order. */
  def catalogEbml(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("doctype", StringType, true),
      StructField("doctype_version", LongType, true),
      StructField("timestamp_scale", LongType, true),
      StructField("duration", DoubleType, true),
      StructField("muxing_app", StringType, true),
      StructField("n_tracks", IntegerType, true),
      StructField("track", IntegerType, true),
      StructField("track_number", LongType, true),
      StructField("track_type", IntegerType, true),
      StructField("codec_id", StringType, true),
      StructField("pix_w", LongType, true),
      StructField("pix_h", LongType, true),
      StructField("channels", LongType, true),
      StructField("sample_hz", DoubleType, true),
      StructField("n_clusters", IntegerType, true),
      StructField("cluster_bytes", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseEbml(media)).toOption.flatten match {
          case Some(d) =>
            d.tracks.iterator.zipWithIndex.map { case (t, ti) =>
              Row(id, d.docType, d.docTypeVersion, d.timestampScale,
                d.duration.map(Double.box).orNull, d.muxingApp,
                d.tracks.length, ti, t.number, t.trackType, t.codecId,
                t.pixW.map(Long.box).orNull, t.pixH.map(Long.box).orNull,
                t.channels.map(Long.box).orNull,
                t.sampleHz.map(Double.box).orNull,
                d.nClusters, d.clusterBytes, true)
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Fixture laws (file i): doctype webm/matroska by parity (version
    * 4/2), TimestampScale 1000000·(1+i%2) but ABSENT on i%3=0 (the
    * spec default), Duration 1000+10i as float64 on even i and
    * float32 on odd (both exact), 1+i%3 tracks alternating video
    * (V_VP9/V_AV1, dims 320+16i × 240+8i) and audio (A_OPUS/
    * A_VORBIS, channels 1+(i+t)%2, rate 48000/44100), 1+i%2
    * clusters of 64+32c payload bytes (+9 census framing each),
    * planted Void elements on i%4=0. */
  def ebmlFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val nTracks = 1 + i % 3
      val tracks = (0 until nTracks).map { t =>
        if ((i + t) % 2 == 0)
          EbmlTrack(t + 1L, 1, if (i % 4 < 2) "V_VP9" else "V_AV1",
            Some(320L + 16 * i), Some(240L + 8 * i), None, None)
        else
          EbmlTrack(t + 1L, 2, if (i % 4 < 2) "A_OPUS" else "A_VORBIS",
            None, None, Some(1L + (i + t) % 2),
            Some(if (i % 4 < 2) 48000.0 else 44100.0))
      }
      val bytes = encodeEbml(
        docType = if (i % 2 == 0) "webm" else "matroska",
        docTypeVersion = if (i % 2 == 0) 4 else 2,
        timestampScale = if (i % 3 == 0) None
          else Some(1000000L * (1 + i % 2)),
        duration = Some(1000.0 + 10 * i),
        durF32 = i % 2 == 1,
        muxingApp = s"graft-mux ${i % 3}",
        tracks = tracks,
        clusterSizes = (0 until 1 + i % 2).map(c => 64 + 32 * c),
        planted = i % 4 == 0)
      Row(i.toLong, bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
