package graft.operators

/** Ogg container catalog — the audio-corpus companion of the MP4/AVI
  * walks: modern speech/music corpora arrive as Ogg Opus or Ogg
  * Vorbis, and the curation layer needs per-stream facts (codec,
  * channels, rate, packet/page censuses, duration-bearing granules)
  * without decoding audio. Written against the public specs (RFC
  * 3533 Ogg framing, RFC 7845 Opus-in-Ogg, Vorbis I):
  *
  *  - page framing: `OggS` capture + version 0, header-type flags
  *    (continuation 0x01 / BOS 0x02 / EOS 0x04), little-endian
  *    granule position / serial / sequence / CRC, a segment table of
  *    lacing values; pages must tile the file EXACTLY;
  *  - the page CRC is VERIFIED (the RFC's 32-bit CRC, polynomial
  *    0x04c11db7, forward — no bit reflection, zero init, zero
  *    final XOR, computed with the CRC field zeroed) — a corrupted
  *    page rejects rather than censuses;
  *  - per-serial state machine: first page BOS (and BOS only first),
  *    sequence numbers contiguous from 0 (a gap = lost page =
  *    reject), at most one EOS and nothing after it, continuation
  *    pages must actually continue an open packet and non-
  *    continuation pages must not find one open, an unterminated
  *    packet at EOS rejects;
  *  - packet assembly from lacing (255 = continues, <255 ends; a
  *    packet of exactly k·255 bytes needs its 0 terminator —
  *    round-trip-gated);
  *  - codec identification from each stream's FIRST packet:
  *    `OpusHead` (version 1, channel count >= 1, pre-skip,
  *    input sample rate, mapping family 0) and `\x01vorbis`
  *    (version 0, channels >= 1, rate, framing bit set) are decoded
  *    with their fixed layouts; any other first packet censuses the
  *    stream honestly as codec `other` with null audio facts —
  *    a census records, it never guesses.
  *
  * Multiplexed files (several serials interleaved) census one row
  * per stream, ordered by BOS appearance. The fixture encoder writes
  * the same subset (correct CRCs, spanning packets, 255-boundary
  * packets, interleaved streams) so round-trip tests drive every
  * path.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object OggLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class OggStream(
      serial: Long, codec: String, channels: Option[Int],
      sampleRate: Option[Long], preSkip: Option[Int],
      nPages: Int, nPackets: Int, lastGranule: Long)

  // ------------------------------------------------------------------
  // the RFC 3533 page CRC: forward CRC-32, poly 0x04c11db7, init 0,
  // no reflection, no final XOR

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[graft] def pageCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ (b(off + i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def i64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xffL); k -= 1 }
    v
  }

  // ------------------------------------------------------------------
  // ident-packet decodes (fixed public layouts)

  private def decodeIdent(p: Array[Byte]):
      (String, Option[Int], Option[Long], Option[Int]) = {
    if (p.length >= 19 && p(0) == 'O' && p(1) == 'p' && p(2) == 'u' &&
        p(3) == 's' && p(4) == 'H' && p(5) == 'e' && p(6) == 'a' &&
        p(7) == 'd') {
      // RFC 7845 §5.1: version 1, ch, pre-skip u16, rate u32, gain
      // i16, mapping family (0: exactly 19 bytes, no table)
      if (p(8) != 1) throw Fail
      val ch = p(9) & 0xff
      if (ch < 1) throw Fail
      val preSkip = (p(10) & 0xff) | ((p(11) & 0xff) << 8)
      val rate = u32le(p, 12)
      val family = p(18) & 0xff
      if (family == 0 && (p.length != 19 || ch > 2)) throw Fail
      if (family != 0) throw Fail // mapping tables out of subset
      ("opus", Some(ch), Some(rate), Some(preSkip))
    } else if (p.length >= 30 && p(0) == 1 && p(1) == 'v' && p(2) == 'o' &&
        p(3) == 'r' && p(4) == 'b' && p(5) == 'i' && p(6) == 's') {
      // Vorbis I §4.2.2: version u32(0), ch u8, rate u32, 3 bitrates,
      // blocksizes u8, framing bit — 30 bytes exactly
      if (p.length != 30) throw Fail
      if (u32le(p, 7) != 0) throw Fail
      val ch = p(11) & 0xff
      if (ch < 1) throw Fail
      val rate = u32le(p, 12)
      if (rate < 1) throw Fail
      if ((p(29) & 0x01) != 1) throw Fail // framing bit
      ("vorbis", Some(ch), Some(rate), None)
    } else ("other", None, None, None)
  }

  // ------------------------------------------------------------------
  // walk

  private final class StreamState(val serial: Long, val order: Int) {
    var nPages = 0
    var nPackets = 0
    var lastGranule = 0L
    var nextSeq = 0L
    var sawEos = false
    var open: java.io.ByteArrayOutputStream = null // packet in progress
    var firstPacket: Array[Byte] = null
    var secondPacket: Array[Byte] = null
    // (first byte, second byte or -1, length) per completed packet —
    // all the TOC-layer census needs, without retaining bodies
    val pkts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
  }

  /** The shared page walk: framing + CRC + state machines + packet
    * assembly; throws Fail on any violation. */
  private def walkStreams(
      b: Array[Byte]): java.util.LinkedHashMap[Long, StreamState] = {
    {
      val streams = new java.util.LinkedHashMap[Long, StreamState]()
      var pos = 0
      var nPagesTotal = 0
      while (pos < b.length) {
        if (pos + 27 > b.length) throw Fail
        if (b(pos) != 'O' || b(pos + 1) != 'g' || b(pos + 2) != 'g' ||
            b(pos + 3) != 'S') throw Fail
        if (b(pos + 4) != 0) throw Fail // version
        val flags = b(pos + 5) & 0xff
        if ((flags & 0xf8) != 0) throw Fail
        val granule = i64le(b, pos + 6)
        val serial = u32le(b, pos + 14)
        val seq = u32le(b, pos + 18)
        val crc = u32le(b, pos + 22)
        val nSegs = b(pos + 26) & 0xff
        if (pos + 27 + nSegs > b.length) throw Fail
        var body = 0
        var s = 0
        while (s < nSegs) { body += b(pos + 27 + s) & 0xff; s += 1 }
        val pageLen = 27 + nSegs + body
        if (pos + pageLen > b.length) throw Fail
        // CRC over the page with its CRC field zeroed
        val crcCalc = {
          val save = Array(b(pos + 22), b(pos + 23), b(pos + 24),
            b(pos + 25))
          b(pos + 22) = 0; b(pos + 23) = 0; b(pos + 24) = 0; b(pos + 25) = 0
          val c = pageCrc(b, pos, pageLen)
          b(pos + 22) = save(0); b(pos + 23) = save(1)
          b(pos + 24) = save(2); b(pos + 25) = save(3)
          c
        }
        if ((crcCalc & 0xffffffffL) != crc) throw Fail
        nPagesTotal += 1
        if (nPagesTotal > (1 << 20)) throw Fail
        val bos = (flags & 0x02) != 0
        val eos = (flags & 0x04) != 0
        val cont = (flags & 0x01) != 0
        var st = streams.get(serial)
        if (st == null) {
          if (!bos) throw Fail // a stream must open with BOS
          st = new StreamState(serial, streams.size())
          streams.put(serial, st)
        } else if (bos) throw Fail // BOS only on the first page
        if (st.sawEos) throw Fail // nothing after EOS
        if (seq != st.nextSeq) throw Fail // lost page
        st.nextSeq += 1
        st.nPages += 1
        st.lastGranule = granule
        if (cont != (st.open != null)) throw Fail
        // assemble packets from lacing values
        var off = pos + 27 + nSegs
        s = 0
        while (s < nSegs) {
          val lace = b(pos + 27 + s) & 0xff
          if (st.open == null) st.open = new java.io.ByteArrayOutputStream()
          st.open.write(b, off, lace)
          off += lace
          if (lace < 255) { // packet ends
            val p = st.open.toByteArray
            st.open = null
            st.nPackets += 1
            if (st.firstPacket == null) st.firstPacket = p
            else if (st.secondPacket == null) st.secondPacket = p
            st.pkts += ((if (p.length > 0) p(0) & 0xff else -1,
              if (p.length > 1) p(1) & 0xff else -1, p.length))
          }
          s += 1
        }
        if (eos) {
          if (st.open != null) throw Fail // unterminated packet
          st.sawEos = true
        }
        pos += pageLen
      }
      val it0 = streams.values().iterator()
      while (it0.hasNext) {
        val st = it0.next()
        if (!st.sawEos) throw Fail // truncated stream
        if (st.firstPacket == null) throw Fail
      }
      streams
    }
  }

  /** Census one Ogg file; None on any violation. */
  private[graft] def parseOgg(b: Array[Byte]): Option[Array[OggStream]] = {
    if (b == null || b.length < 28) return None
    if (b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S') return None
    try {
      val streams = walkStreams(b)
      val out = new Array[OggStream](streams.size())
      val it = streams.values().iterator()
      while (it.hasNext) {
        val st = it.next()
        val (codec, ch, rate, preSkip) = decodeIdent(st.firstPacket)
        out(st.order) = OggStream(st.serial, codec, ch, rate, preSkip,
          st.nPages, st.nPackets, st.lastGranule)
      }
      Some(out)
    } catch { case Fail => None }
  }

  // ------------------------------------------------------------------
  // Opus TOC-byte packet census (RFC 6716 §3.1): the TOC byte alone
  // pins config (5 bits → mode/bandwidth/frame size), the per-packet
  // stereo flag, and the frame-count code; the per-packet duration in
  // 48 kHz samples follows without any codec decode, and RFC 7845's
  // granule law (final granule = pre-skip + total samples − end trim,
  // trim smaller than the last packet) cross-checks the page-layer
  // duration against the packet layer.

  private[graft] final case class OpusTocStream(
      serial: Long, channels: Int, preSkip: Int, nAudio: Int,
      tocSamples: Long, nConfigs: Int, maxFrames: Int, stereoPkts: Int,
      trim: Long)

  /** Frame duration in 48 kHz samples per RFC 6716 §3.1: SILK groups
    * (configs 0-11) run 10/20/40/60 ms, hybrid (12-15) 10/20 ms,
    * CELT (16-31) 2.5/5/10/20 ms. */
  private[graft] def opusCfgSamples(cfg: Int): Int =
    if (cfg < 12) Array(480, 960, 1920, 2880)(cfg % 4)
    else if (cfg < 16) Array(480, 960)(cfg % 2)
    else Array(120, 240, 480, 960)(cfg % 4)

  /** (duration in samples, config, frames, stereo) of one packet from
    * its first two bytes + length; Fail on any §3.4 framing-law
    * violation expressible at this layer. */
  private def tocPacket(b0: Int, b1: Int, len: Int): (Int, Int, Int, Int) = {
    if (len < 1 || b0 < 0) throw Fail
    val cfg = b0 >>> 3
    val stereo = (b0 >> 2) & 1
    val frames = (b0 & 3) match {
      case 0 => 1
      case 1 => // two frames of equal size: the payload must split
        if ((len - 1) % 2 != 0) throw Fail
        2
      case 2 => // two frames, first length self-delimited
        if (len < 2) throw Fail
        2
      case _ => // code 3: count byte (vbr/padding flags + 6-bit M)
        if (len < 2 || b1 < 0) throw Fail
        val m = b1 & 0x3f
        if (m < 1) throw Fail
        m
    }
    val dur = frames * opusCfgSamples(cfg)
    if (dur > 5760) throw Fail // the 120 ms packet law (R5)
    (dur, cfg, frames, stereo)
  }

  /** TOC-layer census of an all-Opus Ogg file; None on any page,
    * header or TOC-layer violation, including a granule that the
    * packet-layer durations cannot explain. */
  private[graft] def parseOpusToc(
      b: Array[Byte]): Option[Array[OpusTocStream]] = {
    if (b == null || b.length < 28) return None
    if (b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S')
      return None
    try {
      val streams = walkStreams(b)
      val out = new Array[OpusTocStream](streams.size())
      val it = streams.values().iterator()
      while (it.hasNext) {
        val st = it.next()
        val (codec, ch, _, preSkip) = decodeIdent(st.firstPacket)
        if (codec != "opus") throw Fail // this census is Opus-specific
        // RFC 7845: the second packet MUST be OpusTags
        val tags = st.secondPacket
        if (tags == null || tags.length < 8 || tags(0) != 'O' ||
            tags(1) != 'p' || tags(2) != 'u' || tags(3) != 's' ||
            tags(4) != 'T' || tags(5) != 'a' || tags(6) != 'g' ||
            tags(7) != 's') throw Fail
        val audio = st.pkts.drop(2)
        if (audio.isEmpty) throw Fail
        var total = 0L
        var lastDur = 0
        var maxFrames = 0
        var stereoPkts = 0
        val cfgs = scala.collection.mutable.HashSet.empty[Int]
        audio.foreach { case (b0, b1, len) =>
          val (dur, cfg, frames, stereo) = tocPacket(b0, b1, len)
          total += dur
          lastDur = dur
          maxFrames = math.max(maxFrames, frames)
          stereoPkts += stereo
          cfgs += cfg
        }
        // granule cross-law: pre-skip + samples − trim, 0 ≤ trim <
        // last packet duration (RFC 7845 §4)
        val trim = preSkip.get + total - st.lastGranule
        if (trim < 0 || trim >= lastDur) throw Fail
        out(st.order) = OpusTocStream(st.serial, ch.get, preSkip.get,
          audio.length, total, cfgs.size, maxFrames, stereoPkts, trim)
      }
      Some(out)
    } catch { case Fail => None }
  }

  /** One row per Opus stream: TOC-layer census + the granule trim. */
  def extractOpusToc(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("stream", IntegerType, false),
      StructField("channels", IntegerType, true),
      StructField("pre_skip", IntegerType, true),
      StructField("n_audio", IntegerType, true),
      StructField("toc_samples", LongType, true),
      StructField("n_configs", IntegerType, true),
      StructField("max_frames", IntegerType, true),
      StructField("stereo_pkts", IntegerType, true),
      StructField("trim_samples", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseOpusToc(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(ss) => ss.zipWithIndex.map { case (s, k) =>
            Row(id, k, s.channels, s.preSkip, s.nAudio, s.tocSamples,
              s.nConfigs, s.maxFrames, s.stereoPkts, s.trim, true)
          }
          case None =>
            Seq(Row(id, 0, null, null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** TOC fixture law (doc i): one Opus stream, channels 1+i%2,
    * pre-skip 100+i, 2+i%3 audio packets; packet j uses frame-count
    * code j%4 — code 3 carries M = 1+(i+j)%3 frames of CELT config
    * 16+(i+j)%4, the others one/two frames of config (i+j)%32 — with
    * the TOC stereo flag set on odd i+j; the final page's granule is
    * pre-skip + total samples − (i%3) (an end trim smaller than the
    * last packet, per RFC 7845 §4). */
  def opusTocFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val ch = 1 + i % 2
      val preSkip = 100 + i
      val nAudio = 2 + i % 3
      var total = 0L
      val audio = (0 until nAudio).map { j =>
        val code = j % 4
        val cfg = if (code == 3) 16 + (i + j) % 4 else (i + j) % 32
        val stereo = (i + j) % 2
        val toc = (cfg << 3) | (stereo << 2) | code
        val body = code match {
          case 0 => Array.tabulate(1 + (i + j) % 3)(k =>
            ((i + j + k) % 256).toByte)
          case 1 => Array.tabulate(2 * ((i + j) % 3))(k =>
            ((i * 3 + k) % 256).toByte)
          case 2 => Array.tabulate(1 + (i + j) % 3)(k =>
            ((i * 5 + k) % 256).toByte)
          case _ =>
            val m = 1 + (i + j) % 3
            (0x80 | m).toByte +: Array.tabulate((i + j) % 4)(k =>
              ((i * 7 + k) % 256).toByte)
        }
        val frames = code match {
          case 0 => 1
          case 3 => 1 + (i + j) % 3
          case _ => 2
        }
        total += frames.toLong * opusCfgSamples(cfg)
        (toc.toByte +: body, j)
      }
      val granule = preSkip + total - (i % 3)
      val ident = opusHead(ch, preSkip, 48000L)
      val tags = opusTagsPacket("graft-toc " + i % 3,
        Seq("title=t" + i))
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(writePage(EncPage(900L + i, 0, 0, bos = true,
        eos = false, cont = false, packetLaces(ident), ident)))
      bos.write(writePage(EncPage(900L + i, 1, 0, bos = false,
        eos = false, cont = false, packetLaces(tags), tags)))
      val pkts = audio.map(_._1)
      val laces = pkts.flatMap(packetLaces)
      bos.write(writePage(EncPage(900L + i, 2, granule, bos = false,
        eos = true, cont = false, laces, pkts.flatten.toArray)))
      Row(i.toLong, bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  // ------------------------------------------------------------------
  // comment headers (RFC 7845 §5.2 OpusTags / Vorbis I §5 comments)

  private[graft] final case class OggComment(key: String, value: String)

  private[graft] final case class OggTagStream(
      serial: Long, codec: String, vendor: String,
      comments: Array[OggComment])

  private def strictUtf8(b: Array[Byte], off: Int, len: Int): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b, off, len)).toString
    catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
  }

  /** The shared vendor + user-comment-list layout starting at `off`;
    * returns (vendor, comments, positionAfter). Field names must be
    * nonempty, '='-separated at the FIRST '=', with every key
    * character in 0x20-0x7d excluding '=' (both specs' rule); the
    * value is arbitrary strict UTF-8. */
  private def parseCommentBlock(p: Array[Byte],
      off: Int): (String, Array[OggComment], Int) = {
    var pos = off
    def u32(): Long = {
      if (pos + 4 > p.length) throw Fail
      val v = u32le(p, pos)
      pos += 4
      v
    }
    val vlen = u32()
    if (vlen > p.length - pos) throw Fail
    val vendor = strictUtf8(p, pos, vlen.toInt)
    pos += vlen.toInt
    val n = u32()
    if (n > 65536) throw Fail
    val out = new Array[OggComment](n.toInt)
    var i = 0
    while (i < n) {
      val clen = u32()
      if (clen > p.length - pos) throw Fail
      val s = strictUtf8(p, pos, clen.toInt)
      pos += clen.toInt
      val eq = s.indexOf('=')
      if (eq < 1) throw Fail // key must be nonempty
      val key = s.substring(0, eq)
      if (!key.forall(c => c >= 0x20 && c <= 0x7d && c != '=')) throw Fail
      out(i) = OggComment(key, s.substring(eq + 1))
      i += 1
    }
    (vendor, out, pos)
  }

  /** Comment-header extraction: for every opus/vorbis stream the
    * SECOND packet MUST be its comment header (both specs mandate
    * it), consumed exactly (the Vorbis form ends with its framing
    * bit set); `other` streams carry no comment surface and census
    * with a null vendor. */
  private[graft] def parseOggTags(
      b: Array[Byte]): Option[Array[OggTagStream]] = {
    if (b == null || b.length < 28) return None
    if (b(0) != 'O' || b(1) != 'g' || b(2) != 'g' || b(3) != 'S') return None
    try {
      val streams = walkStreams(b)
      val out = new Array[OggTagStream](streams.size())
      val it = streams.values().iterator()
      while (it.hasNext) {
        val st = it.next()
        val (codec, _, _, _) = decodeIdent(st.firstPacket)
        val res = codec match {
          case "opus" =>
            val p = st.secondPacket
            if (p == null || p.length < 8 || p(0) != 'O' || p(1) != 'p' ||
                p(2) != 'u' || p(3) != 's' || p(4) != 'T' || p(5) != 'a' ||
                p(6) != 'g' || p(7) != 's') throw Fail
            val (vendor, cs, end) = parseCommentBlock(p, 8)
            if (end != p.length) throw Fail
            OggTagStream(st.serial, codec, vendor, cs)
          case "vorbis" =>
            val p = st.secondPacket
            if (p == null || p.length < 8 || p(0) != 3 || p(1) != 'v' ||
                p(2) != 'o' || p(3) != 'r' || p(4) != 'b' || p(5) != 'i' ||
                p(6) != 's') throw Fail
            val (vendor, cs, end) = parseCommentBlock(p, 7)
            if (end != p.length - 1 || (p(p.length - 1) & 1) != 1)
              throw Fail // framing bit
            OggTagStream(st.serial, codec, vendor, cs)
          case _ =>
            OggTagStream(st.serial, codec, null, Array.empty)
        }
        out(st.order) = res
      }
      Some(out)
    } catch { case Fail => None }
  }

  // ==================================================================
  // encoder (fixture/test side)

  private[graft] final case class EncPage(
      serial: Long, seq: Long, granule: Long, bos: Boolean, eos: Boolean,
      cont: Boolean, laces: Seq[Int], body: Array[Byte])

  private[graft] def writePage(p: EncPage): Array[Byte] = {
    require(p.laces.length <= 255 && p.laces.forall(l => l >= 0 && l <= 255))
    require(p.laces.sum == p.body.length)
    val out = new Array[Byte](27 + p.laces.length + p.body.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(5) = ((if (p.cont) 1 else 0) | (if (p.bos) 2 else 0) |
      (if (p.eos) 4 else 0)).toByte
    var g = p.granule
    var k = 0
    while (k < 8) { out(6 + k) = (g & 0xff).toByte; g >>= 8; k += 1 }
    def le32(v: Long, o: Int): Unit =
      (0 until 4).foreach(j => out(o + j) = ((v >> (8 * j)) & 0xff).toByte)
    le32(p.serial, 14)
    le32(p.seq, 18)
    out(26) = p.laces.length.toByte
    p.laces.zipWithIndex.foreach { case (l, i) => out(27 + i) = l.toByte }
    System.arraycopy(p.body, 0, out, 27 + p.laces.length, p.body.length)
    val crc = pageCrc(out, 0, out.length)
    le32(crc & 0xffffffffL, 22)
    out
  }

  /** Split packets into pages: each inner Seq is one page's worth of
    * packet fragments; lacing is derived (255-continuation runs). */
  private[graft] def packetLaces(pkt: Array[Byte]): Seq[Int] = {
    val full = pkt.length / 255
    val rem = pkt.length % 255
    Seq.fill(full)(255) :+ rem
  }

  private[graft] def opusHead(ch: Int, preSkip: Int, rate: Long): Array[Byte] = {
    val b = new Array[Byte](19)
    "OpusHead".getBytes("US-ASCII").copyToArray(b)
    b(8) = 1
    b(9) = ch.toByte
    b(10) = (preSkip & 0xff).toByte
    b(11) = ((preSkip >> 8) & 0xff).toByte
    (0 until 4).foreach(j => b(12 + j) = ((rate >> (8 * j)) & 0xff).toByte)
    // gain 0, family 0
    b
  }

  private[graft] def vorbisIdent(ch: Int, rate: Long): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 1
    "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
    b(11) = ch.toByte
    (0 until 4).foreach(j => b(12 + j) = ((rate >> (8 * j)) & 0xff).toByte)
    b(28) = ((6 << 4) | 6).toByte // blocksizes 64/64
    b(29) = 1 // framing bit
    b
  }

  // ==================================================================
  // DataFrame surface + fixture (q225)

  /** One row per (file, stream) in BOS order. */
  def catalogOgg(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("stream", IntegerType, true),
      StructField("serial", LongType, true),
      StructField("codec", StringType, true),
      StructField("channels", IntegerType, true),
      StructField("sample_rate", LongType, true),
      StructField("pre_skip", IntegerType, true),
      StructField("n_pages", IntegerType, true),
      StructField("n_packets", IntegerType, true),
      StructField("last_granule", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseOgg(media)).toOption.flatten match {
          case Some(ss) =>
            ss.iterator.zipWithIndex.map { case (s, i) =>
              Row(id, i, s.serial, s.codec,
                s.channels.map(Int.box).orNull,
                s.sampleRate.map(Long.box).orNull,
                s.preSkip.map(Int.box).orNull,
                s.nPages, s.nPackets, s.lastGranule, true)
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** One row per (file, stream, comment); codec `other` streams and
    * zero-comment headers contribute no rows (vendor rides on every
    * comment row). */
  def tagsOgg(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("stream", IntegerType, true),
      StructField("serial", LongType, true),
      StructField("codec", StringType, true),
      StructField("vendor", StringType, true),
      StructField("seq", IntegerType, true),
      StructField("key", StringType, true),
      StructField("key_upper", StringType, true),
      StructField("value", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseOggTags(media)).toOption.flatten match {
          case Some(ss) =>
            ss.iterator.zipWithIndex.flatMap { case (s, si) =>
              s.comments.iterator.zipWithIndex.map { case (c, ci) =>
                Row(id, si, s.serial, s.codec, s.vendor, ci, c.key,
                  c.key.toUpperCase(java.util.Locale.ROOT), c.value,
                  true)
              }
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  private[graft] def opusTagsPacket(vendor: String,
      comments: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OpusTags".getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      (0 until 4).foreach(j => out.write((v >> (8 * j)) & 0xff))
    val vb = vendor.getBytes("UTF-8")
    le32(vb.length)
    out.write(vb, 0, vb.length)
    le32(comments.length)
    comments.foreach { c =>
      val cb = c.getBytes("UTF-8")
      le32(cb.length)
      out.write(cb, 0, cb.length)
    }
    out.toByteArray
  }

  private[graft] def vorbisCommentPacket(vendor: String,
      comments: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1) // placeholder; fixed below to 0x03
    out.write("vorbis".getBytes("US-ASCII"))
    def le32(v: Int): Unit =
      (0 until 4).foreach(j => out.write((v >> (8 * j)) & 0xff))
    val vb = vendor.getBytes("UTF-8")
    le32(vb.length)
    out.write(vb, 0, vb.length)
    le32(comments.length)
    comments.foreach { c =>
      val cb = c.getBytes("UTF-8")
      le32(cb.length)
      out.write(cb, 0, cb.length)
    }
    out.write(1) // framing bit
    val b = out.toByteArray
    b(0) = 3 // comment-header packet type
    b
  }

  /** Tags fixture (file i): a CONFORMANT Opus stream — ident,
    * OpusTags (vendor `graft-vendor i%4`, 1+i%3 comments whose keys
    * cycle Title/ARTIST/lang preserving case, values embedding '='
    * on odd seq, é on even i, and an EMPTY value at seq 0 when
    * i%5=0), one audio packet — plus, on odd i, a Vorbis stream with
    * its 0x03-vorbis comment header (one LANGUAGE comment). */
  def oggTagsFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val bos = new java.io.ByteArrayOutputStream()
      val serialA = 1000L + i
      val ident = opusHead(1 + i % 2, 300, 48000L)
      bos.write(writePage(EncPage(serialA, 0, 0, bos = true, eos = false,
        cont = false, packetLaces(ident), ident)))
      val comments = (0 until 1 + i % 3).map { k =>
        val key = k % 3 match {
          case 0 => "Title"
          case 1 => "ARTIST"
          case _ => "lang"
        }
        val value =
          if (i % 5 == 0 && k == 0) ""
          else s"v${(i * 7 + k) % 10}" +
            (if (k % 2 == 1) "=x" else "") +
            (if (i % 2 == 0) "é" else "")
        s"$key=$value"
      }
      val tags = opusTagsPacket(s"graft-vendor ${i % 4}", comments)
      val audio = Array.tabulate(40)(k => ((i * 3 + k) % 256).toByte)
      bos.write(writePage(EncPage(serialA, 1, 0, bos = false,
        eos = false, cont = false, packetLaces(tags), tags)))
      bos.write(writePage(EncPage(serialA, 2, 960, bos = false,
        eos = true, cont = false, packetLaces(audio), audio)))
      if (i % 2 == 1) {
        val serialB = 2000L + i
        val vident = vorbisIdent(2, 44100L)
        val vtags = vorbisCommentPacket(s"graft-vorbis ${i % 3}",
          Seq(s"LANGUAGE=l${i % 6}"))
        val vaudio = Array.tabulate(16)(k => ((i * 5 + k) % 256).toByte)
        bos.write(writePage(EncPage(serialB, 0, 0, bos = true,
          eos = false, cont = false, packetLaces(vident), vident)))
        bos.write(writePage(EncPage(serialB, 1, 0, bos = false,
          eos = false, cont = false, packetLaces(vtags), vtags)))
        bos.write(writePage(EncPage(serialB, 2, 128, bos = false,
          eos = true, cont = false, packetLaces(vaudio), vaudio)))
      }
      Row(i.toLong, bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Fixture laws (file i): an Opus stream (serial 1000+i, channels
    * 1+i%2, pre-skip 312+i, rate 48000) and, on i%2=1, a SECOND
    * multiplexed Vorbis stream (serial 2000+i, channels 2, rate
    * 44100/48000 by i%4), and on i%5=0 a THIRD stream whose ident
    * packet matches no known codec (censused as 'other'). The Opus
    * stream carries 3+i%3 audio packets — packet j=1 is 510 bytes
    * (a k·255 boundary exercising the 0-lace terminator) when
    * i%3=0, and the LAST packet is >255 bytes and SPANS two pages
    * via a continuation when i%3=1. */
  def oggFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val bos = new java.io.ByteArrayOutputStream()
      val serialA = 1000L + i
      val chA = 1 + i % 2
      // stream A page 0: the ident packet alone (RFC 7845 requires it)
      bos.write(writePage(EncPage(serialA, 0, 0, bos = true, eos = false,
        cont = false, packetLaces(opusHead(chA, 312 + i, 48000L)),
        opusHead(chA, 312 + i, 48000L))))
      // optional multiplexed Vorbis stream B
      val hasB = i % 2 == 1
      val serialB = 2000L + i
      val rateB = if (i % 4 == 1) 44100L else 48000L
      if (hasB)
        bos.write(writePage(EncPage(serialB, 0, 0, bos = true,
          eos = false, cont = false, packetLaces(vorbisIdent(2, rateB)),
          vorbisIdent(2, rateB))))
      // optional third stream with an unrecognized ident packet — the
      // honest codec='other' census path (no audio facts, no guess)
      val hasC = i % 5 == 0
      val serialC = 3000L + i
      if (hasC) {
        val identC = Array.tabulate(10)(k => ((i * 17 + k) % 256).toByte)
        bos.write(writePage(EncPage(serialC, 0, 0, bos = true,
          eos = false, cont = false, packetLaces(identC), identC)))
      }
      // stream A audio packets
      val nPk = 3 + i % 3
      val pkts = (0 until nPk).map { j =>
        val len =
          if (i % 3 == 0 && j == 1) 510 // k·255 boundary: 0-lace ending
          else if (i % 3 == 1 && j == nPk - 1) 300 + i // will span pages
          else 50 + 20 * j
        Array.tabulate(len)(k => ((i * 31 + j * 7 + k) % 256).toByte)
      }
      if (i % 3 == 1) {
        // pack all but the last packet on one page, then SPAN the
        // last across two pages: its first 255 bytes end the first
        // page with a 255 lace (packet open), the rest rides a
        // continuation page
        val head = pkts.dropRight(1)
        val laces = head.flatMap(packetLaces)
        bos.write(writePage(EncPage(serialA, 1, 960L * head.length,
          bos = false, eos = false, cont = false, laces,
          head.flatten.toArray)))
        val last = pkts.last
        val h1 = last.take(255)
        bos.write(writePage(EncPage(serialA, 2, -1L, bos = false,
          eos = false, cont = false, Seq(255), h1)))
        val h2 = last.drop(255)
        bos.write(writePage(EncPage(serialA, 3, 960L * nPk, bos = false,
          eos = true, cont = true, packetLaces(h2), h2)))
      } else {
        val laces = pkts.flatMap(packetLaces)
        bos.write(writePage(EncPage(serialA, 1, 960L * nPk, bos = false,
          eos = true, cont = false, laces, pkts.flatten.toArray)))
      }
      // close streams B and C with their packets
      if (hasB) {
        val pktB = Array.tabulate(64)(k => ((i * 13 + k) % 256).toByte)
        bos.write(writePage(EncPage(serialB, 1, 128L, bos = false,
          eos = true, cont = false, packetLaces(pktB), pktB)))
      }
      if (i % 5 == 0) {
        val pktC = Array.tabulate(24)(k => ((i * 19 + k) % 256).toByte)
        bos.write(writePage(EncPage(serialC, 1, 777L, bos = false,
          eos = true, cont = false, packetLaces(pktC), pktC)))
      }
      Row(i.toLong, bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
