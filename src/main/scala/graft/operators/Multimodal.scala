package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition (SURVEY.md
  * §7.1 ext).
  *
  * Images are REAL formats — PNG and JPEG, parsed with the JDK's
  * `javax.imageio` (no extra dependency): metadata comes from a
  * header-only `ImageReader` probe (no pixel decode on the metadata
  * path — the cheap scan a 100 TB catalog pass needs), pixels from a
  * full `ImageIO.read` only where features/resize ask for them.
  *
  * Audio is REAL for the canonical raw format — RIFF/WAVE PCM (8/16
  * bit), parsed with a plain chunk walk (WAV is a container + raw
  * samples; no codec library needed): metadata from the fmt/data
  * chunks, features from the decoded sample stream. For COMPRESSED
  * audio, the real formats are: the MP3 (MPEG-1 Layer III)
  * frame-HEADER walk (q93) AND the full Layer III PAYLOAD decode
  * (q188 — bit reservoir, side info, scalefactors, three-region
  * Huffman through the checked-in public-spec tables, count1,
  * requantization; see the Layer III block comment below), FLAC
  * DECODE at two depths — the byte-aligned constant-subframe catalog
  * subset (q144) and the bit-exact PCM decoder for CONSTANT /
  * VERBATIM / FIXED-predictor / LPC subframes with partitioned Rice
  * residuals, RFC 9639 §9 (q148 fixed, q149 LPC) — and the MP4/M4A
  * `moov` box walk (ISO-BMFF nesting, timescales, stsd sample
  * entries). VIDEO is REAL for MJPEG-in-AVI (q147): the RIFF chunk
  * walk plus per-frame JPEG decode through the same ImageIO path as
  * the stills — multi-frame pixel content verified, closing the r10
  * video-decode gap. MPEG-1 Layer I audio PAYLOADS are decoded for
  * real (q155): full bit-unpack + CRC-16 + conformant requantization
  * to the subband domain — Layer I is the MPEG audio family member
  * whose bitstream needs no tabulated allocation/Huffman tables.
  * MPEG-1 Layer II payloads are ALSO real (q156): the ISO/IEC
  * 11172-3 Tables 3-B.2a-d allocation classes are checked in as
  * code and the decode requantizes grouped/ungrouped codes with
  * per-granule scalefactor selection (see `parseMp2` below). Layer
  * III payloads are real too (q188 — see the Layer III block). For
  * VIDEO, inter-frame decode is real for MS-RLE8-in-AVI (q189): the
  * delta/skip escapes leave prior-frame pixels in place, so frame N
  * genuinely depends on the framebuffer after N−1. What remains
  * behind the deterministic `GRFT` container STUB: AAC-class
  * perceptual audio (large filterbank constants) and transform-coded
  * inter-frame video (H.26x-class: DCT/Huffman/motion-compensation
  * tables and reference-frame interpolation) — the per-partition
  * batch shape is identical, and swapping in a real codec changes
  * no plan shape.
  *
  * Fake container layout (little-endian):
  * {{{
  *   magic   : 4 bytes "GRFT"
  *   mtype   : 1 byte  (0=image, 1=audio, 2=video)
  *   width   : int32   (image/video) | sample_rate (audio)
  *   height  : int32   (image/video) | channels    (audio)
  *   nframes : int32   (1 for image)
  *   payload : width·height bytes per frame (pixel/PCM stand-in)
  * }}}
  */
object Multimodal {

  val Magic: Array[Byte] = "GRFT".getBytes("ASCII")

  val metaSchema: StructType = StructType(Seq(
    StructField("mtype", StringType, true),
    StructField("codec", StringType, true),
    StructField("width", IntegerType, true),
    StructField("height", IntegerType, true),
    StructField("nframes", IntegerType, true),
    StructField("payload_bytes", IntegerType, true),
    StructField("valid", BooleanType, false)))

  private def isPng(b: Array[Byte]): Boolean =
    b != null && b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def isGrft(b: Array[Byte]): Boolean =
    b != null && b.length >= 17 && b(0) == 'G' && b(1) == 'R' && b(2) == 'F' && b(3) == 'T'

  private def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** PCM WAV parse: walk the RIFF chunks, return (sampleRate,
    * channels, bitsPerSample, dataOffset, dataLength) for PCM 8/16
    * bit with a size-consistent data chunk. None for compressed,
    * malformed, or truncated containers. */
  private[graft] def parseWav(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Int)] = {
    if (!isWav(b)) return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFmt, ch, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, off, 4, "ASCII")
      val size = bb.getInt(off + 4)
      // long arithmetic: for size near Int.MaxValue the int sum
      // off + 8 + size wraps negative and a truncated/crafted chunk
      // would slip past the guard (then the data loop walks garbage)
      if (size < 0 || off.toLong + 8L + size > b.length) return None // truncated
      if (id == "fmt " && size >= 16)
        fmt = Some((bb.getShort(off + 8) & 0xffff,
          bb.getShort(off + 10) & 0xffff,
          bb.getInt(off + 12),
          bb.getShort(off + 22) & 0xffff))
      else if (id == "data")
        data = Some((off + 8, size))
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    for {
      (audioFmt, ch, rate, bits) <- fmt
      (dOff, dLen) <- data
      if audioFmt == 1 && (bits == 8 || bits == 16) && ch > 0 && rate > 0
      blockAlign = ch * bits / 8
      if blockAlign > 0 && dLen % blockAlign == 0
    } yield (rate, ch, bits, dOff, dLen)
  }

  // ------------------------------------------------------------------
  // IMA-ADPCM WAV (wFormatTag 0x11 — DVI/IMA ADPCM, the public IMA
  // Digital Audio Compatibility Project algorithm as registered for
  // RIFF/WAVE): REAL compressed-audio sample decode — 4-bit nibbles
  // through the 89-entry step-size state machine, per-block state
  // reset from the block header, interleaved 4-byte channel words.
  // This closes the "PCM-only" gap in the WAV path with pure integer
  // table arithmetic (no codec library, no perceptual transform).

  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA nibble through the decoder state machine: returns the
    * new (predictor, stepIndex). Both clamps are the standard's. */
  private def imaStep(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p =
      if ((nib & 8) != 0) math.max(pred - diff, -32768)
      else math.min(pred + diff, 32767)
    (p, math.min(math.max(idx + ImaIndexTable(nib & 7), 0), 88))
  }

  /** Parse + FULLY decode an IMA-ADPCM RIFF/WAVE container. Strict:
    * fmt tag 0x11, 4 bits/sample, 1-2 channels, the fmt extension's
    * samplesPerBlock consistent with blockAlign (spb = 1 +
    * (blockAlign − 4·ch)·2/ch, data-word region a multiple of 4·ch),
    * a fact chunk matching nBlocks·spb, data a whole number of
    * blocks, and every block header's step index ≤ 88. Returns
    * (rate, ch, samplesPerBlock, nBlocks, totalSamples, valueSum,
    * minSample, maxSample) over every decoded sample (the block
    * header predictor IS sample 0 of its block, per the format). */
  private[graft] def parseAdpcmWav(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Long, Long, Int, Int)] = {
    if (!isWav(b)) return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    var fact: Option[Long] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty || fact.isEmpty)) {
      val id = new String(b, off, 4, "ASCII")
      val size = bb.getInt(off + 4)
      if (size < 0 || off.toLong + 8L + size > b.length) return None
      if (id == "fmt " && size >= 20)
        fmt = Some((bb.getShort(off + 8) & 0xffff,   // wFormatTag
          bb.getShort(off + 10) & 0xffff,            // channels
          bb.getInt(off + 12),                       // sample rate
          bb.getShort(off + 20) & 0xffff,            // blockAlign
          bb.getShort(off + 22) & 0xffff,            // bitsPerSample
          bb.getShort(off + 26) & 0xffff))           // samplesPerBlock
      else if (id == "fact" && size >= 4)
        fact = Some(bb.getInt(off + 8).toLong & 0xffffffffL)
      else if (id == "data")
        data = Some((off + 8, size))
      off += 8 + size + (size & 1)
    }
    for {
      (tag, ch, rate, blockAlign, bits, spb) <- fmt
      (dOff, dLen) <- data
      factSamples <- fact
      if tag == 0x11 && bits == 4 && (ch == 1 || ch == 2) && rate > 0
      if blockAlign > 4 * ch && (blockAlign - 4 * ch) % (4 * ch) == 0
      if spb == 1 + (blockAlign - 4 * ch) * 2 / ch
      if dLen > 0 && dLen % blockAlign == 0
      nBlocks = dLen / blockAlign
      if factSamples == nBlocks.toLong * spb
      decoded <- decodeAdpcmBlocks(b, dOff, nBlocks, blockAlign, ch, spb)
    } yield {
      val (sum, mn, mx) = decoded
      (rate, ch, spb, nBlocks, nBlocks.toLong * spb * ch, sum, mn, mx)
    }
  }

  /** Decode every block's every channel; None if any block header
    * carries a step index > 88. Data words interleave per channel in
    * 4-byte groups (8 nibbles, low nibble first — the IMA layout). */
  private def decodeAdpcmBlocks(
      b: Array[Byte], dOff: Int, nBlocks: Int, blockAlign: Int,
      ch: Int, spb: Int): Option[(Long, Int, Int)] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val wordsPerChannel = (spb - 1) / 8
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    val pred = new Array[Int](ch)
    val idx = new Array[Int](ch)
    var blk = 0
    while (blk < nBlocks) {
      val o = dOff + blk * blockAlign
      var c = 0
      while (c < ch) {
        pred(c) = bb.getShort(o + 4 * c).toInt
        idx(c) = b(o + 4 * c + 2) & 0xff
        if (idx(c) > 88) return None
        // header predictor is the block's sample 0 for this channel
        sum += pred(c); mn = math.min(mn, pred(c)); mx = math.max(mx, pred(c))
        c += 1
      }
      val dataStart = o + 4 * ch
      var w = 0
      while (w < wordsPerChannel) {
        c = 0
        while (c < ch) {
          val wo = dataStart + (w * ch + c) * 4
          var k = 0
          while (k < 8) {
            val byte = b(wo + (k >> 1)) & 0xff
            val nib = if ((k & 1) == 0) byte & 0xf else byte >> 4
            val (p, i) = imaStep(pred(c), idx(c), nib)
            pred(c) = p; idx(c) = i
            sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
            k += 1
          }
          c += 1
        }
        w += 1
      }
      blk += 1
    }
    Some((sum, mn, mx))
  }

  /** Encode a REAL IMA-ADPCM WAV container (fixture / test side): the
    * nibble stream is SUPPLIED, not quantized from PCM — the decode
    * state machine is the operator under test, and a supplied stream
    * keeps every decoded sample an exact integer function of the
    * (header, nibbles) laws so the oracle can replay it. */
  def encodeAdpcmWav(
      rate: Int,
      channels: Int,
      samplesPerBlock: Int,
      nBlocks: Int,
      header: (Int, Int) => (Int, Int),   // (block, ch) -> (pred0, idx0)
      nibble: (Int, Int, Int) => Int      // (block, ch, j) -> 0..15
  ): Array[Byte] = {
    require((samplesPerBlock - 1) % 8 == 0 && samplesPerBlock > 1)
    val w = (samplesPerBlock - 1) / 8
    val blockAlign = 4 * channels + 4 * w * channels
    val dataLen = nBlocks * blockAlign
    // fmt payload: 16 base + cbSize(2) + samplesPerBlock(2) = 20 bytes
    val bb = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(4 + 28 + 12 + 8 + dataLen)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(20)
      .putShort(0x11)                       // IMA ADPCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * blockAlign / samplesPerBlock) // nominal byte rate
      .putShort(blockAlign.toShort)
      .putShort(4)                          // bits per sample
      .putShort(2)                          // cbSize
      .putShort(samplesPerBlock.toShort)
    bb.put("fact".getBytes("ASCII")).putInt(4)
      .putInt(nBlocks * samplesPerBlock)
    bb.put("data".getBytes("ASCII")).putInt(dataLen)
    for (blk <- 0 until nBlocks) {
      for (c <- 0 until channels) {
        val (p0, i0) = header(blk, c)
        bb.putShort(p0.toShort).put(i0.toByte).put(0.toByte)
      }
      for (w0 <- 0 until w; c <- 0 until channels; byteK <- 0 until 4) {
        val lo = nibble(blk, c, w0 * 8 + byteK * 2) & 0xf
        val hi = nibble(blk, c, w0 * 8 + byteK * 2 + 1) & 0xf
        bb.put(((hi << 4) | lo).toByte)
      }
    }
    bb.array()
  }

  /** Deterministic IMA-ADPCM fixture: rate, channels, block shape,
    * every block header and every nibble closed-form in id — the
    * oracle replays the identical state machine (step/index tables as
    * SQL literals, recursion over the nibble stream). */
  def adpcmFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rate = 8000 + (i % 3) * 4000
      val ch = 1 + i % 2
      val spb = 1 + 8 * (2 + i % 3)
      val nBlocks = 2 + i % 4
      Row(i.toLong, encodeAdpcmWav(rate, ch, spb, nBlocks,
        header = (b, c) => (((i * 31 + b * 17 + c * 29) % 4001) - 2000,
          (i * 7 + b * 3 + c * 5) % 89),
        nibble = (b, c, j) => (i * 13 + b * 7 + c * 3 + j * 5) % 16))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Full-decode DataFrame op over IMA-ADPCM WAV blobs — same surface
    * family as [[decodeFlacPcm]]; malformed/PCM/non-IMA containers
    * yield valid=false rows, never throw. */
  def decodeAdpcm(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("samples_per_block", IntegerType, true),
      StructField("n_blocks", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("min_sample", IntegerType, true),
      StructField("max_sample", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parseAdpcmWav(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((rate, ch, spb, nb, total, sum, mn, mx)) =>
            Row(r.getLong(0), rate, ch, spb, nb, total, sum, mn, mx, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // G.711 μ-law / A-law WAV (wFormatTag 7 / 6 — the ITU-T G.711
  // companding laws, public since 1972; decode formulas per the
  // CCITT reference implementation): stateless byte → PCM16 table
  // decode, the telephony capture format a speech-data pipeline
  // ingests by the petabyte.

  /** μ-law byte → linear sample (G.711; CCITT reference formula). */
  private def ulaw2linear(v: Int): Int = {
    val u = (~v) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear sample (G.711; CCITT reference formula). */
  private def alaw2linear(v: Int): Int = {
    val a = v ^ 0x55
    val seg = (a & 0x70) >> 4
    val t0 = (a & 0x0f) << 4
    val t = seg match {
      case 0 => t0 + 8
      case 1 => t0 + 0x108
      case _ => (t0 + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Parse + fully decode a G.711 RIFF/WAVE container (fmt tag 6 =
    * A-law, 7 = μ-law; 8 bits/sample, blockAlign == channels, fact
    * chunk matching the frame count). Returns (codec, rate, ch,
    * totalSamples, valueSum, min, max). */
  private[graft] def parseG711Wav(b: Array[Byte])
      : Option[(String, Int, Int, Long, Long, Int, Int)] = {
    if (!isWav(b)) return None
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    var fact: Option[Long] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty || fact.isEmpty)) {
      val id = new String(b, off, 4, "ASCII")
      val size = bb.getInt(off + 4)
      if (size < 0 || off.toLong + 8L + size > b.length) return None
      if (id == "fmt " && size >= 16)
        fmt = Some((bb.getShort(off + 8) & 0xffff,   // wFormatTag
          bb.getShort(off + 10) & 0xffff,            // channels
          bb.getInt(off + 12),                       // sample rate
          bb.getShort(off + 20) & 0xffff,            // blockAlign
          bb.getShort(off + 22) & 0xffff))           // bitsPerSample
      else if (id == "fact" && size >= 4)
        fact = Some(bb.getInt(off + 8).toLong & 0xffffffffL)
      else if (id == "data")
        data = Some((off + 8, size))
      off += 8 + size + (size & 1)
    }
    for {
      (tag, ch, rate, blockAlign, bits) <- fmt
      (dOff, dLen) <- data
      factSamples <- fact
      if (tag == 6 || tag == 7) && bits == 8 && ch > 0 && rate > 0
      if blockAlign == ch && dLen > 0 && dLen % ch == 0
      if factSamples == dLen.toLong / ch
    } yield {
      val dec: Int => Int = if (tag == 7) ulaw2linear else alaw2linear
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var k = 0
      while (k < dLen) {
        val s = dec(b(dOff + k) & 0xff)
        sum += s; mn = math.min(mn, s); mx = math.max(mx, s)
        k += 1
      }
      (if (tag == 7) "ulaw" else "alaw", rate, ch, dLen.toLong, sum, mn, mx)
    }
  }

  /** Encode a REAL G.711 WAV container (fixture / test side). */
  def encodeG711Wav(
      rate: Int, channels: Int, tag: Int, bytes: Array[Byte]): Array[Byte] = {
    require(tag == 6 || tag == 7, s"G.711 tag 6 or 7, got $tag")
    require(bytes.length % channels == 0)
    val dataLen = bytes.length
    val pad = dataLen & 1
    val bb = ByteBuffer.allocate(12 + 8 + 18 + 8 + 4 + 8 + dataLen + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(4 + 26 + 12 + 8 + dataLen + pad)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(18) // 16 base + cbSize(0)
      .putShort(tag.toShort)
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels) // 1 byte/sample
      .putShort(channels.toShort)
      .putShort(8)
      .putShort(0) // cbSize
    bb.put("fact".getBytes("ASCII")).putInt(4).putInt(dataLen / channels)
    bb.put("data".getBytes("ASCII")).putInt(dataLen).put(bytes)
    bb.array()
  }

  /** Deterministic G.711 fixture: even ids μ-law, odd ids A-law;
    * every encoded byte closed-form in (id, j) and sweeping the full
    * byte range across ids. */
  def g711Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rate = 8000 * (1 + i % 2)
      val ch = 1 + i % 2
      val frames = 40 + i % 25
      val bytes = Array.tabulate[Byte](frames * ch)(j =>
        ((i * 11 + j * 13) % 256).toByte)
      Row(i.toLong, encodeG711Wav(rate, ch, if (i % 2 == 0) 7 else 6, bytes))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Full-decode DataFrame op over G.711 WAV blobs; malformed/PCM/
    * other-codec containers yield valid=false rows, never throw. */
  def decodeG711(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("codec", StringType, true),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("min_sample", IntegerType, true),
      StructField("max_sample", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parseG711Wav(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((codec, rate, ch, total, sum, mn, mx)) =>
            Row(r.getLong(0), codec, rate, ch, total, sum, mn, mx, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  private def isMp3Sync(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0

  /** MPEG-1 Layer III header tables (public ISO/IEC 11172-3 layout).
    * Index 0 ("free") and 15 (reserved) are rejected. */
  private val Mp3Bitrates = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** REAL frame-header walk over an MPEG-1 Layer III stream: verify
    * the sync + version/layer bits of every frame, derive each
    * frame's length from its bitrate/sample-rate/padding fields
    * (144·bitrate/rate + pad), and require the walk to land exactly
    * on end-of-buffer. Returns (sampleRate, firstFrameBitrateKbps,
    * frameCount) — the metadata a catalog pass needs (duration =
    * frames·1152/rate) WITHOUT any audio decode; the full payload
    * decode is [[parseMp3L3]] (q188). Mixed sample rates, truncated
    * tails, or reserved field values ⇒ None. */
  private[graft] def parseMp3(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isMp3Sync(b)) return None
    var off = 0; var n = 0; var sr = -1; var br = -1
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return None
      // low 5 bits of byte 1: version(2) layer(2) protection(1);
      // require MPEG-1 (11) Layer III (01), either protection bit
      if ((b(off + 1) & 0x1e) != 0x1a) return None
      val b2 = b(off + 2) & 0xff
      val bi = b2 >> 4
      val si = (b2 >> 2) & 3
      val pad = (b2 >> 1) & 1
      if (bi == 0 || bi == 15 || si == 3) return None
      if (sr == -1) { sr = Mp3Rates(si); br = Mp3Bitrates(bi) }
      else if (Mp3Rates(si) != sr) return None
      val flen = 144000 * Mp3Bitrates(bi) / sr + pad
      if (flen < 4 || off + flen > b.length) return None
      n += 1
      off += flen
    }
    if (n > 0 && off == b.length) Some((sr, br, n)) else None
  }

  /** CBR MPEG-1 Layer III frame stream with zeroed payloads — valid
    * headers, no audio content (the header walk is what's real). */
  def encodeMp3(bitrateIdx: Int, rateIdx: Int, nFrames: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    val flen = 144000 * Mp3Bitrates(bitrateIdx) / Mp3Rates(rateIdx)
    val out = new Array[Byte](flen * nFrames)
    var f = 0
    while (f < nFrames) {
      val o = f * flen
      out(o) = 0xff.toByte
      out(o + 1) = 0xfb.toByte // sync(3) | MPEG-1(11) | Layer III(01) | no CRC(1)
      out(o + 2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte // pad=0
      out(o + 3) = 0xc4.toByte // mono, no emphasis
      f += 1
    }
    out
  }

  /** Deterministic MP3 fixture: CBR streams whose bitrate index,
    * sample-rate index and frame count are closed-form in id. */
  def mp3Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, encodeMp3(1 + i % 14, i % 3, 10 + i % 30))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  // ------------------------------------------------------------------
  // MPEG-1 Audio Layer I — REAL payload decode (ISO/IEC 11172-3
  // §2.4.1.5 / §2.4.2.3 / §2.4.3.3, public spec). Layer I is the one
  // member of the MPEG-1 audio family whose bitstream is fully
  // determined by structure alone — no tabulated bit-allocation
  // classes (Layer II's Tables 3-B.2a-d) and no Huffman tables
  // (Layer III) — so the payload can be decoded for real, not just
  // header-walked: sync/header verification, optional CRC-16
  // protection (poly x^16+x^15+x^2+1, init 0xFFFF, over header bytes
  // 2-3 + the bit-allocation field), 4-bit-per-subband allocations,
  // 6-bit scalefactor indices, and all 12 granules of offset-binary
  // sample codes, requantized through the spec's formula in its exact
  // rational closed form
  //   s'' = (2^nb/(2^nb−1)) · (c·2^(1−nb) − 1 + 2^(1−nb))
  //       = (2·c − 2^nb + 2) / (2^nb − 1),        s = sf · s''
  // and emitted as round-half-even Q15 integers (round(s·2^15)) so
  // the per-stream aggregate is exact and order-independent. For
  // scalefactor indices ≡ 0 (mod 3) — sf an exact power of two —
  // the whole path is integer arithmetic and the DuckDB oracle
  // replays it bit-exactly; other indices (sf = 2·2^(−idx/3),
  // irrational) take the IEEE-double path and are spec-gated. The
  // final 32-band synthesis window (Table 3-B.3 — a 512-tap
  // tabulated constant with no closed form) is out of decode scope:
  // this operator's surface is the payload bit-unpack + requantize
  // pass, where the per-bit structure lives. Intensity (joint)
  // stereo's bound-subband allocation sharing is likewise rejected,
  // not guessed.

  /** Layer I bitrate table (kbps), index 1-14; 0 = free (rejected). */
  private val Mp1Bitrates = Array(
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)

  /** ISO Table 3-B.1 scalefactors: sf(idx) = 2·2^(−idx/3), idx 0-62
    * (63 is forbidden). Indices divisible by 3 are exact powers of
    * two — the fixture/oracle subset; the rest are the IEEE values. */
  private val Mp1Scalefactors: Array[Double] =
    Array.tabulate(63)(i => 2.0 * math.pow(2.0, -i / 3.0))

  /** MPEG audio CRC-16: G(x)=x^16+x^15+x^2+1, initial 0xFFFF,
    * MSB-first. Mutable accumulator, one per frame. */
  private final class Mp1Crc {
    private var crc = 0xffff
    def update(v: Int, nBits: Int): Unit = {
      var i = nBits - 1
      while (i >= 0) {
        val fb = ((v >>> i) & 1) ^ (crc >>> 15)
        crc = (crc << 1) & 0xffff
        if (fb != 0) crc ^= 0x8005
        i -= 1
      }
    }
    def value: Int = crc
  }

  /** Exact round-half-even of the rational a/b (b > 0). */
  private def rne(a: Long, b: Long): Long = {
    val f = Math.floorDiv(a, b)
    val r = a - f * b
    if (2 * r > b) f + 1
    else if (2 * r < b) f
    else if ((f & 1L) == 0L) f else f + 1
  }

  /** Requantize one Layer I sample code to a Q15 round-half-even
    * integer: q = rne(sf · (2c − 2^nb + 2)/(2^nb − 1) · 2^15).
    * Integer-exact when the scalefactor is a power of two (idx % 3
    * == 0, sf = 2^(1−e)): q = rne(m·2^(36−e) / ((2^nb−1)·2^20)). */
  private def mp1Quant(code: Int, nb: Int, scfIdx: Int): Long = {
    val m = 2 * code - (1 << nb) + 2
    if (scfIdx % 3 == 0) {
      val e = scfIdx / 3
      rne(m.toLong << (36 - e), ((1L << nb) - 1) << 20)
    } else
      Math.rint(Mp1Scalefactors(scfIdx) * 32768.0 * m /
        ((1 << nb) - 1).toDouble).toLong
  }

  private[graft] final case class Mp1Decoded(
      rate: Int, kbps: Int, channels: Int, nFrames: Int,
      totalSamples: Long, nDecoded: Long, valueSum: Long, mn: Int, mx: Int)

  /** Parse + FULLY decode an MPEG-1 Layer I stream to the subband
    * domain — all four modes including intensity stereo (mode 1:
    * subbands above the mode_extension bound share one sample stream
    * requantized per channel through its own scalefactor). Strict:
    * every frame re-verified (sync, MPEG-1 + Layer I bits,
    * bitrate/rate indices, frame-length walk landing exactly on
    * end-of-buffer), constant sample-rate and channel count across
    * frames, allocation 15 / scalefactor 63 rejected, CRC-16 checked
    * on protected frames. Bits after the last sample up to the frame
    * boundary are ancillary data (spec §2.4.1.8) and are skipped. */
  private[graft] def parseMp1(b: Array[Byte]): Option[Mp1Decoded] = {
    if (b == null || b.length < 8) return None
    var off = 0; var nf = 0
    var rate = -1; var kbps = -1; var chans = -1
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var nDec = 0L
    try {
      while (off + 4 <= b.length) {
        if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xfe) != 0xfe) return None
        val prot = (b(off + 1) & 1) == 0 // protection_bit 0 = CRC present
        val b2 = b(off + 2) & 0xff
        val bi = b2 >> 4
        val si = (b2 >> 2) & 3
        val pad = (b2 >> 1) & 1
        if (bi == 0 || bi == 15 || si == 3) return None
        val b3 = b(off + 3) & 0xff
        val mode = b3 >> 6
        // intensity stereo (mode 1): subbands from `bound` up carry ONE
        // shared sample stream, requantized per channel through each
        // channel's OWN scalefactor (§2.4.2.4) — in Layers I/II the
        // scalefactor scaling IS the intensity reconstruction, so the
        // joint region decodes exactly like everything else
        val bound = if (mode == 1) 4 * (((b3 >> 4) & 3) + 1) else 32
        val ch = if (mode == 3) 1 else 2
        val r0 = Mp3Rates(si)
        if (rate == -1) { rate = r0; kbps = Mp1Bitrates(bi); chans = ch }
        else if (r0 != rate || ch != chans) return None
        val flen = 4 * (12000 * Mp1Bitrates(bi) / r0 + pad)
        if (flen < 8 || off + flen > b.length) return None
        val br = new FlacBitReader(b, off + 4, off + flen)
        val crcWord = if (prot) br.readBits(16).toInt else -1
        val crc = new Mp1Crc
        crc.update(b2, 8); crc.update(b3, 8)
        val alloc = Array.ofDim[Int](32, ch)
        val scf = Array.ofDim[Int](32, ch)
        var sb = 0
        while (sb < 32) {
          if (sb < bound) {
            var c = 0
            while (c < ch) {
              val a = br.readBits(4).toInt
              if (a == 15) return None
              crc.update(a, 4)
              alloc(sb)(c) = if (a == 0) 0 else a + 1
              c += 1
            }
          } else { // joint region: one allocation for both channels
            val a = br.readBits(4).toInt
            if (a == 15) return None
            crc.update(a, 4)
            val v = if (a == 0) 0 else a + 1
            alloc(sb)(0) = v
            alloc(sb)(1) = v // mode 1 implies ch == 2
          }
          sb += 1
        }
        if (prot && crc.value != crcWord) return None
        sb = 0
        while (sb < 32) {
          var c = 0
          while (c < ch) {
            if (alloc(sb)(c) != 0) {
              val idx = br.readBits(6).toInt
              if (idx == 63) return None
              scf(sb)(c) = idx
            }
            c += 1
          }
          sb += 1
        }
        var g = 0
        while (g < 12) {
          sb = 0
          while (sb < 32) {
            if (sb < bound) {
              var c = 0
              while (c < ch) {
                val nb = alloc(sb)(c)
                if (nb != 0) {
                  val q = mp1Quant(br.readBits(nb).toInt, nb, scf(sb)(c))
                  sum += q
                  if (q < mn) mn = q.toInt
                  if (q > mx) mx = q.toInt
                  nDec += 1
                }
                c += 1
              }
            } else if (alloc(sb)(0) != 0) {
              // joint region: one code, two per-channel requantizations
              val nb = alloc(sb)(0)
              val raw = br.readBits(nb).toInt
              var c = 0
              while (c < ch) {
                val q = mp1Quant(raw, nb, scf(sb)(c))
                sum += q
                if (q < mn) mn = q.toInt
                if (q > mx) mx = q.toInt
                nDec += 1
                c += 1
              }
            }
            sb += 1
          }
          g += 1
        }
        nf += 1
        off += flen
      }
      if (nf > 0 && off == b.length) {
        if (nDec == 0) { mn = 0; mx = 0 } // silent stream (all alloc 0)
        Some(Mp1Decoded(rate, kbps, chans, nf,
          nf.toLong * 384 * chans, nDec, sum, mn, mx))
      } else None
    } catch { case FlacEof => None }
  }

  /** Encode a REAL MPEG-1 Layer I stream (fixture / test side): the
    * allocation map, scalefactor indices and sample codes are
    * SUPPLIED closed-form — the decoder is the operator under test —
    * and the CRC on protected frames is computed for real. `alloc`
    * returns the quantizer width nb ∈ {0, 2..15} (0 = subband off). */
  def encodeMp1(
      bitrateIdx: Int, rateIdx: Int, mode: Int, nFrames: Int,
      protect: Boolean,
      pad: Int => Int,                       // frame -> 0/1
      alloc: (Int, Int, Int) => Int,         // (frame, sb, ch) -> nb
      scf: (Int, Int, Int) => Int,           // (frame, sb, ch) -> idx 0..62
      code: (Int, Int, Int, Int) => Int,     // (frame, granule, sb, ch) -> raw
      modeExt: Int => Int = _ => 0           // frame -> mode_extension (mode 1)
  ): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    require(mode >= 0 && mode <= 3)
    val rate = Mp3Rates(rateIdx)
    val ch = if (mode == 3) 1 else 2
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val p = pad(f) & 1
      val ext = if (mode == 1) modeExt(f) & 3 else 0
      // joint region from `bound` up: one allocation + one sample
      // stream (taken from channel 0's laws), scalefactors per channel
      val bound = if (mode == 1) 4 * (ext + 1) else 32
      def nbAt(sb: Int, c: Int): Int = alloc(f, sb, if (sb < bound) c else 0)
      val flen = 4 * (12000 * Mp1Bitrates(bitrateIdx) / rate + p)
      var bits = 32 + (if (protect) 16 else 0) +
        4 * (bound * ch + (32 - bound))
      for (sb <- 0 until 32; c <- 0 until ch) {
        val nb = nbAt(sb, c)
        require(nb == 0 || (nb >= 2 && nb <= 15), s"bad nb $nb")
        if (nb != 0) bits += 6 // scalefactors stay per channel
      }
      for (sb <- 0 until 32; c <- 0 until (if (sb < bound) ch else 1)) {
        val nb = nbAt(sb, c)
        if (nb != 0) bits += 12 * nb
      }
      require(bits <= flen * 8, s"payload $bits bits > frame ${flen * 8}")
      val bw = new FlacBitWriter(flen)
      val b2 = (bitrateIdx << 4) | (rateIdx << 2) | (p << 1)
      val b3 = (mode << 6) | (ext << 4)
      bw.writeBits(0xfff, 12)                // sync
      bw.writeBit(1)                         // ID: MPEG-1
      bw.writeBits(3, 2)                     // Layer I
      bw.writeBit(if (protect) 0 else 1)     // protection_bit
      bw.writeBits(b2.toLong, 8)
      bw.writeBits(b3.toLong, 8)
      val crc = new Mp1Crc
      crc.update(b2, 8); crc.update(b3, 8)
      for (sb <- 0 until 32; c <- 0 until (if (sb < bound) ch else 1)) {
        val nb = nbAt(sb, c)
        crc.update(if (nb == 0) 0 else nb - 1, 4)
      }
      if (protect) bw.writeBits(crc.value.toLong, 16)
      for (sb <- 0 until 32; c <- 0 until (if (sb < bound) ch else 1)) {
        val nb = nbAt(sb, c)
        bw.writeBits((if (nb == 0) 0 else nb - 1).toLong, 4)
      }
      for (sb <- 0 until 32; c <- 0 until ch)
        if (nbAt(sb, c) != 0) {
          val idx = scf(f, sb, c)
          require(idx >= 0 && idx <= 62)
          bw.writeBits(idx.toLong, 6)
        }
      for (g <- 0 until 12; sb <- 0 until 32;
           c <- 0 until (if (sb < bound) ch else 1)) {
        val nb = nbAt(sb, c)
        if (nb != 0)
          bw.writeBits((code(f, g, sb, c) & ((1 << nb) - 1)).toLong, nb)
      }
      out.write(java.util.Arrays.copyOf(bw.bytes, flen)) // rest: ancillary zeros
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic Layer I fixture: rate/mode/bitrate/frame count,
    * the active-subband set, per-subband quantizer widths, per-frame
    * scalefactors and every sample code closed-form in id; even ids
    * CRC-protected. Scalefactor indices are multiples of 3 (exact
    * power-of-two sf), keeping every decoded Q15 sample an exact
    * integer the oracle replays. */
  def mp1Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rateIdx = i % 3
      val mode = Seq(3, 0, 2)((i / 3) % 3)   // mono / stereo / dual
      val bitrateIdx = 13 + i % 2            // 416 / 448 kbps
      val nf = 2 + i % 4
      val nA = 5 + i % 4
      // active subbands (r + 3j) % 32, j < nA — distinct for nA <= 12
      val act: Map[Int, Int] =
        (0 until nA).map(j => ((i + 3 * j) % 32, 2 + (3 * i + 5 * j) % 14)).toMap
      Row(i.toLong, encodeMp1(bitrateIdx, rateIdx, mode, nf,
        protect = i % 2 == 0,
        pad = f => (i + f) % 2,
        alloc = (_, sb, _) => act.getOrElse(sb, 0),
        scf = (f, sb, c) => 3 * ((i + sb + 7 * c + 2 * f) % 21),
        code = (f, g, sb, c) => i * 13 + f * 3 + g * 7 + sb * 5 + c * 11))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Intensity-stereo Layer I fixture (q220): every stream mode 1
    * with mode_extension i%4 (bound = 4·(ext+1) ∈ {4,8,12,16}).
    * Active-subband, scalefactor and code laws mirror
    * [[mp1Fixture]]'s; in the joint region the encoder writes channel
    * 0's code ONCE and the decoder requantizes it through BOTH
    * channels' scalefactors — the value_sum law splits on sb < bound,
    * which is exactly what the oracle replays. */
  def mp1IsFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rateIdx = i % 3
      val bitrateIdx = 13 + i % 2            // 416 / 448 kbps
      val nf = 2 + i % 4
      val nA = 5 + i % 4
      val act: Map[Int, Int] =
        (0 until nA).map(j => ((i + 3 * j) % 32, 2 + (3 * i + 5 * j) % 14)).toMap
      Row(i.toLong, encodeMp1(bitrateIdx, rateIdx, 1, nf,
        protect = i % 2 == 0,
        pad = f => (i + f) % 2,
        alloc = (_, sb, _) => act.getOrElse(sb, 0),
        scf = (f, sb, c) => 3 * ((i + sb + 7 * c + 2 * f) % 21),
        code = (f, g, sb, c) => i * 13 + f * 3 + g * 7 + sb * 5 + c * 11,
        modeExt = _ => i % 4))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Full-decode DataFrame op over MPEG-1 Layer I blobs — same
    * surface family as [[decodeAdpcm]]; malformed streams yield
    * valid=false rows, never throw. */
  def decodeMp1(df: DataFrame, idCol: String, binCol: String): DataFrame =
    decodeMpegAudio(df, idCol, binCol, parseMp1)

  // ------------------------------------------------------------------
  // MPEG-1 Audio Layer II — REAL payload decode (ISO/IEC 11172-3
  // §2.4.1.6 / §2.4.2.7 / Annex B Tables 3-B.2a/b and 3-B.4, public
  // spec). Layer II adds everything Layer I leaves out structurally:
  // tabulated bit-allocation classes per subband (Tables 3-B.2a/b —
  // the low-bitrate B.2c/d regimes at <= 48 kbps/ch are documented
  // out of scope and rejected, not guessed), GROUPED quantizers (3/5/
  // 9-level codes packed three-samples-to-a-word in 5/7/10 bits,
  // degrouped by base-nlevels digit extraction), scalefactor select
  // information (scfsi — 1, 2 or 3 scalefactors per subband covering
  // the three 12-sample parts of the frame), and CRC-16 protection
  // spanning the allocation AND scfsi fields. The requantizer is the
  // spec's s'' = C·(s''' + D) with C = 2^nb/nlevels and D an exact
  // binary fraction (Table 3-B.4 — every C,D is rational), which
  // collapses to the integer form
  //   s'' = (2·c − 2^nb + madd) / nlevels,
  //   madd = 2^(nb−1) for grouped classes, 2 otherwise,
  // so the Q15 round-half-even output q = rne(sf·s''·2^15) is exact
  // integer arithmetic whenever sf is a power of two (scf idx ≡ 0
  // mod 3) and the DuckDB oracle replays it bit-for-bit — the same
  // contract as Layer I (q155). Mode-bitrate legality (§2.4.2.3:
  // 32/48/56/80 kbps mono-only, 224+ two-channel-only), free format,
  // intensity stereo, scalefactor 63 and grouped codes ≥ nlevels³
  // are all rejected. The 512-tap synthesis window (Table 3-B.3)
  // stays out of decode scope exactly as for Layer I.

  /** Layer II bitrate table (kbps), index 1-14; 0 = free (rejected). */
  private val Mp2Bitrates = Array(
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)

  // Table 3-B.2a/b quantization-class rows: nonzero allocation code a
  // selects row(a-1). B.2b differs from B.2a only by extending the
  // 2-bit tail rows from subband 27 to 30 (sblimit).
  private val Mp2Steps03 = Array(
    3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383,
    32767, 65535)
  private val Mp2Steps311 = Array(
    3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535)
  private val Mp2Steps1123 = Array(3, 5, 7, 9, 15, 31, 65535)
  private val Mp2StepsTail = Array(3, 5, 65535)
  private def mp2Row(sb: Int): Array[Int] =
    if (sb < 3) Mp2Steps03 else if (sb < 11) Mp2Steps311
    else if (sb < 23) Mp2Steps1123 else Mp2StepsTail
  private def mp2Nbal(sb: Int): Int =
    if (sb < 11) 4 else if (sb < 23) 3 else 2

  /** Bits per sample code for a class (Table 3-B.4 "bits"): grouped
    * classes (3/5/9 levels) conceptually use 2/3/4 bits, transmitted
    * as one 5/7/10-bit group word per three samples. */
  private def mp2SampleBits(nlev: Int): Int = nlev match {
    case 3 => 2
    case 5 => 3
    case 9 => 4
    case _ => 32 - Integer.numberOfLeadingZeros(nlev)
  }

  /** Requantize one Layer II sample code to a Q15 round-half-even
    * integer (see block comment): exact integer path for power-of-two
    * scalefactors, IEEE-double path otherwise. */
  private def mp2Quant(code: Int, nlev: Int, scfIdx: Int): Long = {
    val nb = mp2SampleBits(nlev)
    val grouped = nlev == 3 || nlev == 5 || nlev == 9
    val m = 2 * code - (1 << nb) + (if (grouped) 1 << (nb - 1) else 2)
    if (scfIdx % 3 == 0) {
      val e = scfIdx / 3
      rne(m.toLong << (36 - e), nlev.toLong << 20)
    } else
      Math.rint(Mp1Scalefactors(scfIdx) * 32768.0 * m / nlev.toDouble).toLong
  }

  /** Table 3-B.2 regime: sblimit for (rate, per-channel kbps), or -1
    * for the out-of-scope low-bitrate B.2c/B.2d regimes. 48 kHz always
    * uses B.2a (27); 44.1/32 kHz use B.2a up to 80 kbps/ch and B.2b
    * (30) above. */
  private def mp2Sblimit(rate: Int, perChKbps: Int): Int =
    if (perChKbps <= 48) -1
    else if (rate == 48000 || perChKbps <= 80) 27
    else 30

  /** Parse + FULLY decode an MPEG-1 Layer II stream to the subband
    * domain — the Layer II counterpart of [[parseMp1]]; same
    * strictness posture (intensity stereo decoded the same way: the
    * joint region's shared codes requantize per channel), same
    * aggregate surface. */
  private[graft] def parseMp2(b: Array[Byte]): Option[Mp1Decoded] = {
    if (b == null || b.length < 8) return None
    var off = 0; var nf = 0
    var rate = -1; var kbps = -1; var chans = -1; var sblimit = -1
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var nDec = 0L
    try {
      while (off + 4 <= b.length) {
        if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xfe) != 0xfc) return None
        val prot = (b(off + 1) & 1) == 0
        val b2 = b(off + 2) & 0xff
        val bi = b2 >> 4
        val si = (b2 >> 2) & 3
        val pad = (b2 >> 1) & 1
        if (bi == 0 || bi == 15 || si == 3) return None
        val b3 = b(off + 3) & 0xff
        val mode = b3 >> 6
        // intensity stereo (mode 1): shared allocation + samples above
        // the mode_extension bound, per-channel scfsi/scalefactors —
        // the scaling IS the intensity reconstruction (§2.4.2.4)
        val bound = if (mode == 1) 4 * (((b3 >> 4) & 3) + 1) else 64
        val ch = if (mode == 3) 1 else 2
        val kb = Mp2Bitrates(bi)
        // §2.4.2.3 mode-bitrate legality for Layer II
        if (ch == 1 && kb >= 224) return None
        if (ch == 2 && (kb == 32 || kb == 48 || kb == 56 || kb == 80))
          return None
        val r0 = Mp3Rates(si)
        val sbl = mp2Sblimit(r0, kb / ch)
        if (sbl < 0) return None
        if (rate == -1) { rate = r0; kbps = kb; chans = ch; sblimit = sbl }
        else if (r0 != rate || ch != chans || sbl != sblimit) return None
        val flen = 144000 * kb / r0 + pad
        if (flen < 12 || off + flen > b.length) return None
        val br = new FlacBitReader(b, off + 4, off + flen)
        val crcWord = if (prot) br.readBits(16).toInt else -1
        val crc = new Mp1Crc
        crc.update(b2, 8); crc.update(b3, 8)
        val nlev = Array.ofDim[Int](sbl, ch)
        var sb = 0
        while (sb < sbl) {
          val nbal = mp2Nbal(sb); val row = mp2Row(sb)
          if (sb < bound) {
            var c = 0
            while (c < ch) {
              val a = br.readBits(nbal).toInt
              crc.update(a, nbal)
              nlev(sb)(c) = if (a == 0) 0 else row(a - 1)
              c += 1
            }
          } else { // joint region: one allocation for both channels
            val a = br.readBits(nbal).toInt
            crc.update(a, nbal)
            val v = if (a == 0) 0 else row(a - 1)
            nlev(sb)(0) = v
            nlev(sb)(1) = v // mode 1 implies ch == 2
          }
          sb += 1
        }
        val scfsi = Array.ofDim[Int](sbl, ch)
        sb = 0
        while (sb < sbl) {
          var c = 0
          while (c < ch) {
            if (nlev(sb)(c) != 0) {
              val s = br.readBits(2).toInt
              crc.update(s, 2)
              scfsi(sb)(c) = s
            }
            c += 1
          }
          sb += 1
        }
        if (prot && crc.value != crcWord) return None
        // scalefactors: 3 / 2 / 1 transmitted per scfsi, expanded to
        // the three 12-sample parts (idx 63 forbidden)
        val scf = Array.ofDim[Int](sbl, ch, 3)
        sb = 0
        while (sb < sbl) {
          var c = 0
          while (c < ch) {
            if (nlev(sb)(c) != 0) {
              val t0 = br.readBits(6).toInt
              if (t0 == 63) return None
              scfsi(sb)(c) match {
                case 0 =>
                  val t1 = br.readBits(6).toInt
                  val t2 = br.readBits(6).toInt
                  if (t1 == 63 || t2 == 63) return None
                  scf(sb)(c)(0) = t0; scf(sb)(c)(1) = t1; scf(sb)(c)(2) = t2
                case 1 =>
                  val t1 = br.readBits(6).toInt
                  if (t1 == 63) return None
                  scf(sb)(c)(0) = t0; scf(sb)(c)(1) = t0; scf(sb)(c)(2) = t1
                case 2 =>
                  scf(sb)(c)(0) = t0; scf(sb)(c)(1) = t0; scf(sb)(c)(2) = t0
                case _ =>
                  val t1 = br.readBits(6).toInt
                  if (t1 == 63) return None
                  scf(sb)(c)(0) = t0; scf(sb)(c)(1) = t1; scf(sb)(c)(2) = t1
              }
            }
            c += 1
          }
          sb += 1
        }
        var g = 0
        while (g < 12) {
          sb = 0
          while (sb < sbl) {
            @inline def emit(q: Long): Unit = {
              sum += q
              if (q < mn) mn = q.toInt
              if (q > mx) mx = q.toInt
            }
            if (sb < bound) {
              var c = 0
              while (c < ch) {
                val nl = nlev(sb)(c)
                if (nl != 0) {
                  val e = scf(sb)(c)(g >> 2)
                  if (nl == 3 || nl == 5 || nl == 9) {
                    val gb = if (nl == 3) 5 else if (nl == 5) 7 else 10
                    var v = br.readBits(gb).toInt
                    if (v >= nl * nl * nl) return None
                    var k = 0
                    while (k < 3) {
                      emit(mp2Quant(v % nl, nl, e))
                      v /= nl
                      k += 1
                    }
                  } else {
                    val nb = mp2SampleBits(nl)
                    var k = 0
                    while (k < 3) {
                      emit(mp2Quant(br.readBits(nb).toInt, nl, e))
                      k += 1
                    }
                  }
                  nDec += 3
                }
                c += 1
              }
            } else if (nlev(sb)(0) != 0) {
              // joint region: one code stream, each sample requantized
              // once per channel through its own part-scalefactor
              val nl = nlev(sb)(0)
              if (nl == 3 || nl == 5 || nl == 9) {
                val gb = if (nl == 3) 5 else if (nl == 5) 7 else 10
                var v = br.readBits(gb).toInt
                if (v >= nl * nl * nl) return None
                var k = 0
                while (k < 3) {
                  var c = 0
                  while (c < ch) {
                    emit(mp2Quant(v % nl, nl, scf(sb)(c)(g >> 2)))
                    c += 1
                  }
                  v /= nl
                  k += 1
                }
              } else {
                val nb = mp2SampleBits(nl)
                var k = 0
                while (k < 3) {
                  val raw = br.readBits(nb).toInt
                  var c = 0
                  while (c < ch) {
                    emit(mp2Quant(raw, nl, scf(sb)(c)(g >> 2)))
                    c += 1
                  }
                  k += 1
                }
              }
              nDec += 3L * ch
            }
            sb += 1
          }
          g += 1
        }
        nf += 1
        off += flen
      }
      if (nf > 0 && off == b.length) {
        if (nDec == 0) { mn = 0; mx = 0 }
        Some(Mp1Decoded(rate, kbps, chans, nf,
          nf.toLong * 1152 * chans, nDec, sum, mn, mx))
      } else None
    } catch { case FlacEof => None }
  }

  /** Encode a REAL MPEG-1 Layer II stream (fixture / test side).
    * `allocIdx` returns the ALLOCATION CODE into the subband's Table
    * 3-B.2 row (0 = subband off); `scf(frame, part, sb, ch)` supplies
    * the three 12-sample-part scalefactor indices (only the parts
    * scfsi transmits are written — parts the decoder expands by
    * sharing are taken from the shared slot, per §2.4.2.7); `code`
    * supplies each sample's quantizer code (MUST be < nlevels —
    * grouped words are packed here). */
  def encodeMp2(
      bitrateIdx: Int, rateIdx: Int, mode: Int, nFrames: Int,
      protect: Boolean,
      pad: Int => Int,                       // frame -> 0/1
      allocIdx: (Int, Int, Int) => Int,      // (frame, sb, ch) -> code
      scfsi: (Int, Int, Int) => Int,         // (frame, sb, ch) -> 0..3
      scf: (Int, Int, Int, Int) => Int,      // (frame, part, sb, ch) -> 0..62
      code: (Int, Int, Int, Int, Int) => Int, // (frame, granule, k, sb, ch)
      modeExt: Int => Int = _ => 0           // frame -> mode_extension (mode 1)
  ): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    require(mode >= 0 && mode <= 3)
    val rate = Mp3Rates(rateIdx)
    val ch = if (mode == 3) 1 else 2
    val kb = Mp2Bitrates(bitrateIdx)
    require(!(ch == 1 && kb >= 224) &&
      !(ch == 2 && Set(32, 48, 56, 80)(kb)), s"illegal mode for $kb kbps")
    val sbl = mp2Sblimit(rate, kb / ch)
    require(sbl > 0, s"low-bitrate B.2c/d regime not encodable here")
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val p = pad(f) & 1
      val ext = if (mode == 1) modeExt(f) & 3 else 0
      // joint region from `bound` up: one allocation + one code
      // stream (channel 0's laws); scfsi/scalefactors per channel
      val bound = if (mode == 1) 4 * (ext + 1) else sbl
      def aAt(sb: Int, c: Int): Int =
        allocIdx(f, sb, if (sb < bound) c else 0)
      val flen = 144000 * kb / rate + p
      val bw = new FlacBitWriter(flen)
      val b2 = (bitrateIdx << 4) | (rateIdx << 2) | (p << 1)
      val b3 = (mode << 6) | (ext << 4)
      bw.writeBits(0xfff, 12)                // sync
      bw.writeBit(1)                         // ID: MPEG-1
      bw.writeBits(2, 2)                     // Layer II
      bw.writeBit(if (protect) 0 else 1)
      bw.writeBits(b2.toLong, 8)
      bw.writeBits(b3.toLong, 8)
      val crc = new Mp1Crc
      crc.update(b2, 8); crc.update(b3, 8)
      for (sb <- 0 until sbl; c <- 0 until (if (sb < bound) ch else 1)) {
        val a = aAt(sb, c)
        require(a >= 0 && a < (1 << mp2Nbal(sb)), s"alloc code $a sb $sb")
        crc.update(a, mp2Nbal(sb))
      }
      for (sb <- 0 until sbl; c <- 0 until ch)
        if (aAt(sb, c) != 0) crc.update(scfsi(f, sb, c) & 3, 2)
      if (protect) bw.writeBits(crc.value.toLong, 16)
      for (sb <- 0 until sbl; c <- 0 until (if (sb < bound) ch else 1))
        bw.writeBits(aAt(sb, c).toLong, mp2Nbal(sb))
      for (sb <- 0 until sbl; c <- 0 until ch)
        if (aAt(sb, c) != 0) bw.writeBits((scfsi(f, sb, c) & 3).toLong, 2)
      for (sb <- 0 until sbl; c <- 0 until ch) if (aAt(sb, c) != 0) {
        val parts: Seq[Int] = (scfsi(f, sb, c) & 3) match {
          case 0 => Seq(0, 1, 2)
          case 1 => Seq(0, 2)
          case 2 => Seq(0)
          case _ => Seq(0, 1)
        }
        parts.foreach { pt =>
          val idx = scf(f, pt, sb, c)
          require(idx >= 0 && idx <= 62, s"scf $idx")
          bw.writeBits(idx.toLong, 6)
        }
      }
      for (g <- 0 until 12; sb <- 0 until sbl;
           c <- 0 until (if (sb < bound) ch else 1)) {
        val a = aAt(sb, c)
        if (a != 0) {
          val nl = mp2Row(sb)(a - 1)
          def cd(k: Int): Int = {
            val v = code(f, g, k, sb, c)
            require(v >= 0 && v < nl, s"code $v >= nlevels $nl")
            v
          }
          if (nl == 3 || nl == 5 || nl == 9) {
            val gb = if (nl == 3) 5 else if (nl == 5) 7 else 10
            bw.writeBits((cd(0) + nl * cd(1) + nl * nl * cd(2)).toLong, gb)
          } else {
            val nb = mp2SampleBits(nl)
            bw.writeBits(cd(0).toLong, nb)
            bw.writeBits(cd(1).toLong, nb)
            bw.writeBits(cd(2).toLong, nb)
          }
        }
      }
      // payload overflow (supplied laws too wide for the bitrate)
      // surfaces as FlacBitWriter's capacity bound — fixture-side only
      out.write(java.util.Arrays.copyOf(bw.bytes, flen))
      f += 1
    }
    out.toByteArray
  }

  /** Deterministic Layer II fixture: 44.1/48/32 kHz cycle (B.2b at
    * 44.1/32, B.2a at 48 — both tables exercised), mono 192 kbps /
    * two-channel 384 kbps (per-channel 192 ≥ 96 keeps the high-rate
    * regime), 4-7 active subbands per id stepping (i + 7j) % sblimit
    * across every class row, all four scfsi patterns, power-of-two
    * scalefactors (idx ≡ 0 mod 3) and closed-form sample codes — the
    * exact laws the q156 oracle replays. Even ids CRC-protected. */
  def mp2Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rateIdx = i % 3
      val mode = Seq(3, 0, 2)((i / 3) % 3)   // mono / stereo / dual
      val ch = if (mode == 3) 1 else 2
      val bitrateIdx = if (ch == 1) 10 else 14 // 192 / 384 kbps
      val sbl = mp2Sblimit(Mp3Rates(rateIdx), Mp2Bitrates(bitrateIdx) / ch)
      val nf = 2 + i % 3
      val nA = 4 + i % 4
      // active subbands (i + 7j) % sblimit, j < nA — distinct since
      // gcd(7, 27) = gcd(7, 30) = 1 and nA <= 7
      val act: Map[Int, Int] = (0 until nA).map { j =>
        val sb = (i + 7 * j) % sbl
        val cap = if (sb < 11) 15 else if (sb < 23) 7 else 3
        sb -> (1 + (3 * i + 5 * j) % cap)
      }.toMap
      val jOf: Map[Int, Int] =
        (0 until nA).map(j => ((i + 7 * j) % sbl) -> j).toMap
      Row(i.toLong, encodeMp2(bitrateIdx, rateIdx, mode, nf,
        protect = i % 2 == 0,
        pad = f => (i + f) % 2,
        allocIdx = (_, sb, _) => act.getOrElse(sb, 0),
        scfsi = (_, sb, c) => (i + 2 * jOf(sb) + c) % 4,
        scf = (f, p, sb, c) => 3 * ((i + sb + 7 * c + 2 * p + f) % 21),
        code = (f, g, k, sb, c) => {
          val nl = mp2Row(sb)(act(sb) - 1)
          (i * 13 + f * 3 + g * 7 + k * 17 + sb * 5 + c * 11) % nl
        }))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Intensity-stereo Layer II fixture (q221): mode 1 with
    * mode_extension i%4; allocation/scfsi/scalefactor/code laws
    * mirror [[mp2Fixture]]'s stereo shape, with the joint region's
    * shared code stream requantized per channel. */
  def mp2IsFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rateIdx = i % 3
      val bitrateIdx = 14                    // 384 kbps (legal stereo)
      val sbl = mp2Sblimit(Mp3Rates(rateIdx), Mp2Bitrates(bitrateIdx) / 2)
      val nf = 2 + i % 3
      val nA = 4 + i % 4
      val act: Map[Int, Int] = (0 until nA).map { j =>
        val sb = (i + 7 * j) % sbl
        val cap = if (sb < 11) 15 else if (sb < 23) 7 else 3
        sb -> (1 + (3 * i + 5 * j) % cap)
      }.toMap
      val jOf: Map[Int, Int] =
        (0 until nA).map(j => ((i + 7 * j) % sbl) -> j).toMap
      Row(i.toLong, encodeMp2(bitrateIdx, rateIdx, 1, nf,
        protect = i % 2 == 0,
        pad = f => (i + f) % 2,
        allocIdx = (_, sb, _) => act.getOrElse(sb, 0),
        scfsi = (_, sb, c) => (i + 2 * jOf(sb) + c) % 4,
        scf = (f, p, sb, c) => 3 * ((i + sb + 7 * c + 2 * p + f) % 21),
        code = (f, g, k, sb, c) => {
          val nl = mp2Row(sb)(act(sb) - 1)
          (i * 13 + f * 3 + g * 7 + k * 17 + sb * 5 + c * 11) % nl
        },
        modeExt = _ => i % 4))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Full-decode DataFrame op over MPEG-1 Layer II blobs — same
    * surface as [[decodeMp1]]; malformed streams yield valid=false
    * rows, never throw. */
  def decodeMp2(df: DataFrame, idCol: String, binCol: String): DataFrame =
    decodeMpegAudio(df, idCol, binCol, parseMp2)

  /** Shared aggregate-row surface for the MPEG audio payload
    * decoders ([[decodeMp1]]/[[decodeMp2]]). */
  private def decodeMpegAudio(
      df: DataFrame, idCol: String, binCol: String,
      parse: Array[Byte] => Option[Mp1Decoded]): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("sample_rate", IntegerType, true),
      StructField("bitrate_kbps", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("n_frames", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("n_decoded", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("min_sample", IntegerType, true),
      StructField("max_sample", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parse(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) =>
            Row(r.getLong(0), d.rate, d.kbps, d.channels, d.nFrames,
              d.totalSamples, d.nDecoded, d.valueSum, d.mn, d.mx, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null,
              null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // MPEG-1 Audio Layer III — REAL payload decode (ISO/IEC 11172-3
  // §2.4.1.7 / §2.4.2.7 / §2.4.3.4, public spec), q188. Everything the
  // header walk (q93) leaves out is decoded for real: the BIT RESERVOIR
  // (main_data_begin back-pointers into previous frames' slots, honored
  // through a rolling 511-byte window — the spec's own bound, so memory
  // stays O(1) per stream however long the blob), side info unpacking
  // (17/32 bytes, CRC-16-protected together with the header on
  // protected frames), scfsi scalefactor sharing between granules over
  // the four band groups, per-granule long-block scalefactors (slen1/
  // slen2 from the scalefac_compress table), three-region big-value
  // HUFFMAN decoding with per-region table selection from the
  // checked-in public-spec code tables (src/main/resources/graft/
  // mp3_huffman.txt — see that file's provenance note; absent table
  // ids are rejected as unsupported, never guessed), the resource-
  // driven linbits/ESC path, sign bits, the count1 quadruple region
  // (Huffman table A and raw-inverted table B), rzero, and
  // requantization
  //   xr = sign · is^(4/3) · 2^((global_gain−210)/4
  //        − (scalefac_scale+1)/2 · (scalefac[sfb] + preflag·pretab[sfb]))
  // emitted in the CUBE DOMAIN as round-half-even Q15 integers:
  //   q = rne(is⁴ · 2^(3·E4/4) · 2^15),   E4 = quarter-exponent above.
  // The cube is a strictly monotone transform of |xr| that pins exactly
  // the same information (the Huffman integer and the full exponent
  // law), but is INTEGER-EXACT for EVERY Huffman magnitude whenever
  // E4 ≡ 0 (mod 4) — is^(4/3) itself is irrational for every non-cube
  // is, which would leave most magnitudes pinned only through doubles.
  // Quarter exponents not divisible by 4 take an exact BigInt
  // fourth-root path (property-gated in Mp3Layer3Spec), never doubles.
  //
  // WINDOW SWITCHING is decoded in full: pure short granules
  // (block_type 2, q197), the long transition windows (block_type 1
  // start / 3 stop — long spectral layout, fixed 36-line region0, the
  // transmitted subblock gains unused per spec, q200), and MIXED
  // blocks (block_type 2 + mixed_block_flag: long bands 0-7 over
  // lines 0-35, then short sfbs 3-12 — whose line layout coincides
  // with the pure-short map from line 36 because short sfbs 0-2 are
  // 4+4+4 wide at every MPEG-1 rate, q201). JOINT STEREO accepts
  // EVERY mode_extension (0-3): in Layer III the stereo tools change
  // only the RECONSTRUCTION semantics, never the bitstream syntax, so
  // the bitstream is decoded per channel exactly as L/R and the
  // emitted spectra are the transmitted channels' requantized values.
  // The reconstructions themselves stay OUTSIDE exact-decode scope
  // with the IMDCT they feed: the MS butterfly L,R = (M±S)/√2 — each
  // channel's cube m³ = is⁴·2^(3E4/4) is rational (that is what makes
  // the per-channel pin exact), but (m+s)³ carries cross terms m²s,
  // ms² — sums of independent 12th-root surds no power domain makes
  // integer-exact; and intensity re-scaling multiplies the upper
  // bands by is_ratio = tan(is_pos·π/12), irrational for every
  // in-range is_pos except 3 (where it is 1). The decoded stream
  // reports per-tool frame counts (ms_frames / is_frames) so a
  // downstream stage knows which tools a file uses. The synthesis
  // filterbank (IMDCT + Table 3-B.3 window) stays out of decode scope
  // exactly as for Layers I/II.

  /** One loaded Huffman code table: decode tree + encode map. Pair
    * tables key x·16+y; the count1 quad table keys v·8+w·4+x·2+y. */
  private[graft] final class Mp3Huff(
      val id: Int, val maxVal: Int, val linbits: Int, val quad: Boolean,
      entries: Seq[(Int, Int, String)]) {
    private val left = scala.collection.mutable.ArrayBuffer(-1)
    private val right = scala.collection.mutable.ArrayBuffer(-1)
    private val leaf = scala.collection.mutable.ArrayBuffer(-1)
    private val enc = new java.util.HashMap[Integer, (Int, Long)]()
    entries.foreach { case (key, hlen, bits) =>
      require(bits.length == hlen, s"table $id: hlen mismatch")
      var node = 0
      var i = 0
      while (i < bits.length) {
        val zero = bits.charAt(i) == '0'
        val arr = if (zero) left else right
        var child = arr(node)
        if (child == -1) {
          left += -1; right += -1; leaf += -1
          child = leaf.length - 1
          arr(node) = child
        }
        require(leaf(node) == -1, s"table $id: code under a leaf")
        node = child
        i += 1
      }
      require(leaf(node) == -1 && left(node) == -1 && right(node) == -1,
        s"table $id: duplicate/prefix code")
      leaf(node) = key
      enc.put(key, (hlen, java.lang.Long.parseLong(bits, 2)))
    }
    private val ls = left.toArray
    private val rs = right.toArray
    private val vs = leaf.toArray
    /** Every internal node must have both children — a complete prefix
      * code (Kraft sum exactly 1), which is what makes the offline
      * transcription check strong. */
    val complete: Boolean = ls.indices.forall { n =>
      vs(n) >= 0 || (ls(n) != -1 && rs(n) != -1)
    }
    def decode(br: FlacBitReader): Int = {
      var node = 0
      while (vs(node) < 0)
        node = if (br.readBit() == 0) ls(node) else rs(node)
      vs(node)
    }
    def encodeBits(key: Int): (Int, Long) = {
      val e = enc.get(key)
      require(e != null, s"table $id: no code for key $key")
      e
    }
    def keys: Seq[Int] = {
      import scala.jdk.CollectionConverters._
      enc.keySet().asScala.map(_.intValue()).toSeq.sorted
    }
  }

  /** Layer III Huffman tables from the checked-in public-spec resource
    * (mp3_huffman.txt — see its header for provenance and scope). */
  private[graft] lazy val mp3HuffTables: Map[Int, Mp3Huff] = {
    val in = getClass.getResourceAsStream("/graft/mp3_huffman.txt")
    require(in != null, "graft/mp3_huffman.txt resource missing")
    val lines = try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally in.close()
    val tables = Map.newBuilder[Int, Mp3Huff]
    // raw entry lists by id, so `codes <base>` aliases (the spec's own
    // structure: 17-23 share table 16's codewords, 25-31 table 24's,
    // differing only in linbits) can reuse a previously parsed body
    val bodies = scala.collection.mutable.Map.empty[Int, Seq[(Int, Int, String)]]
    var i = 0
    while (i < lines.length) {
      val hdr = lines(i).split("\\s+")
      require(hdr(0) == "table", s"bad table header: ${lines(i)}")
      val id = hdr(1).toInt
      val quad = hdr(2) == "quad"
      val (maxVal, linbits) =
        if (quad) (2, 0) else (hdr(3).toInt, hdr(5).toInt)
      i += 1
      val entries =
        if (!quad && hdr.length >= 8 && hdr(6) == "codes") {
          val base = hdr(7).toInt
          require(bodies.contains(base), s"table $id: alias base $base undefined")
          bodies(base)
        } else {
          val es = Seq.newBuilder[(Int, Int, String)]
          while (i < lines.length && !lines(i).startsWith("table")) {
            val t = lines(i).split("\\s+")
            if (quad)
              es += (((t(0).toInt << 3) | (t(1).toInt << 2) |
                (t(2).toInt << 1) | t(3).toInt, t(4).toInt, t(5)))
            else
              es += (((t(0).toInt << 4) | t(1).toInt, t(2).toInt, t(3)))
            i += 1
          }
          val r = es.result()
          bodies(id) = r
          r
        }
      val tab = new Mp3Huff(id, maxVal, linbits, quad, entries)
      require(tab.complete, s"table $id: not a complete prefix code")
      tables += id -> tab
    }
    tables.result()
  }

  /** ISO Table B.8 long-block scalefactor-band boundaries per rate
    * index (44.1 / 48 / 32 kHz): 22 bands, last boundary 576. */
  private val Mp3SfbLong: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
      134, 162, 196, 238, 288, 342, 418, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
      128, 156, 190, 230, 276, 330, 384, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
      156, 194, 240, 296, 364, 448, 550, 576))

  /** Preemphasis table (pretab), one entry per long band 0..21. */
  private val Mp3Pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** ISO Table B.8 SHORT-block scalefactor-band widths per rate index
    * (13 bands × 3 windows; widths sum to 192 per window). The q197
    * fixture and oracle touch only sfbs 0-5, whose widths agree
    * across all three rates except sfb 5 (8/6/8) — bands past the
    * fixture's reach affect only the rzero region's (empty) band
    * mapping, so a high-band transcription slip cannot move any
    * gated output. */
  private val Mp3SfbShortW: Array[Array[Int]] = Array(
    Array(4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56),
    Array(4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66),
    Array(4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12))

  /** Position → (sfb·4 | window) map for pure-short granules: the
    * bitstream orders spectral values sfb-major, window-mid, line-
    * minor, so the linear decode index maps through the cumulative
    * short-band layout. */
  private lazy val Mp3ShortPosMap: Array[Array[Int]] =
    Mp3SfbShortW.map { widths =>
      val m = new Array[Int](576)
      var base = 0
      var s = 0
      while (s < widths.length) {
        val wd = widths(s)
        var w = 0
        while (w < 3) {
          var line = 0
          while (line < wd) {
            m(base + w * wd + line) = (s << 2) | w
            line += 1
          }
          w += 1
        }
        base += 3 * wd
        s += 1
      }
      m
    }

  /** scalefac_compress → (slen1 for bands 0-10, slen2 for bands 11-20). */
  private val Mp3Slen: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** scfsi band group of a long band: 0-5, 6-10, 11-15, 16-20. */
  private def mp3Grp(band: Int): Int =
    if (band < 6) 0 else if (band < 11) 1 else if (band < 16) 2 else 3

  /** floor of the integer fourth root (sqrt of sqrt is exact). */
  private[graft] def bigIntRoot4(n: BigInt): BigInt =
    BigInt(n.bigInteger.sqrt().sqrt())

  /** Exact round-half-even of (m⁴·2^t)^(1/4) (t in quarter-of-2 units
    * not divisible by 4): RHE(x) where x⁴·den = num, decided purely on
    * integers — x ≥ q+1/2 ⟺ 16·num ≥ (2q+1)⁴·den. */
  private[graft] def mp3CubeQ15Exact(m: Long, t: Int): BigInt = {
    val n0 = BigInt(m).pow(4)
    val num = if (t >= 0) n0 << t else n0
    val den = if (t >= 0) BigInt(1) else BigInt(1) << -t
    val q = bigIntRoot4(num / den)
    val lhs = num << 4
    val rhs = (2 * q + 1).pow(4) * den
    if (lhs > rhs) q + 1
    else if (lhs < rhs) q
    else if (q.testBit(0)) q + 1 else q
  }

  /** Cube-domain Q15 requantized magnitude for Huffman integer `is`
    * under quarter-exponent E4 (see the block comment): exact shifts
    * when E4 ≡ 0 (mod 4), exact BigInt fourth root otherwise. Values
    * past 62 bits reject the stream (output is a LongType column). */
  private[graft] def mp3CubeQ15(is: Int, e4: Int): Long = {
    if (is == 0) return 0L
    val m = is.toLong
    val m4 = m * m * m * m // is ≤ 15 + 2^13 ⇒ m4 < 2^53
    val t = 3 * e4 + 60
    if ((t & 3) == 0) {
      val e = t >> 2
      if (e >= 0) {
        if (64 - java.lang.Long.numberOfLeadingZeros(m4) + e > 62)
          throw FlacEof
        m4 << e
      } else if (e <= -63) 0L
      else rne(m4, 1L << -e)
    } else {
      val q = mp3CubeQ15Exact(m4, t)
      if (q.bitLength > 62) throw FlacEof
      q.toLong
    }
  }

  private[graft] final case class Mp3L3Decoded(
      rate: Int, kbps: Int, channels: Int, nFrames: Int,
      totalSamples: Long, nDecoded: Long, huffSum: Long, valueSum: Long,
      mn: Long, mx: Long, msFrames: Int, isFrames: Int)

  private final case class Mp3GrInfo(
      part23: Int, bigValues: Int, globalGain: Int, scalefacCompress: Int,
      tableSelect: Array[Int], region0: Int, region1: Int,
      preflag: Int, scalefacScale: Int, count1Table: Int,
      blockType: Int, mixed: Boolean, subblockGain: Array[Int]) {
    /** pure-short granule: every line is short-windowed */
    def short: Boolean = blockType == 2 && !mixed
    /** granule carries short-windowed lines (pure short or mixed) —
      * the cases scfsi sharing and preflag are undefined for */
    def hasShortPart: Boolean = blockType == 2
  }

  /** Parse + FULLY decode an MPEG-1 Layer III stream to requantized
    * (cube-domain Q15) spectral values — same strictness posture and
    * aggregate surface family as [[parseMp1]]/[[parseMp2]], plus
    * `huffSum` (the signed Huffman-integer sum), which pins the
    * entropy-decode stage independently of the requantizer. */
  private[graft] def parseMp3L3(b: Array[Byte]): Option[Mp3L3Decoded] = {
    if (b == null || b.length < 8) return None
    var off = 0; var nf = 0
    var end = b.length
    // Real-world MP3 carriers: a wellformed ID3v2 tag before the
    // first frame (skipped — "ID3", major 2..4, sane revision,
    // syncsafe size, optional footer) and an ID3v1 trailer (exactly
    // the last 128 bytes, "TAG") after the last. Both are metadata,
    // not audio: Id3Lake (q178) is the tag CATALOG; this path only
    // locates the audio. A malformed tag rejects, never guesses.
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if (b.length < 10) return None
      val major = b(3) & 0xff
      if (major < 2 || major > 4 || (b(4) & 0xff) == 0xff) return None
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None // syncsafe
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val footer = (b(5) & 0x10) != 0
      off = 10 + size + (if (footer) 10 else 0)
      if (off >= b.length) return None
    }
    if (end - off > 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
      b(end - 126) == 'G')
      end -= 128
    var rate = -1; var rateIdx = -1; var kbps = -1; var chans = -1
    var sum = 0L; var hsum = 0L; var msf = 0; var isf = 0
    var mn = Long.MaxValue; var mx = Long.MinValue; var nDec = 0L
    // rolling bit-reservoir window: the last ≤511 bytes of main data
    // (main_data_begin is a 9-bit byte count — the spec's own bound)
    var resv = new Array[Byte](0)
    try {
      while (off + 4 <= end) {
        if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xfe) != 0xfa)
          return None // sync + MPEG-1 + Layer III (either protection bit)
        val prot = (b(off + 1) & 1) == 0
        val b2 = b(off + 2) & 0xff
        val bi = b2 >> 4
        val si = (b2 >> 2) & 3
        val pad = (b2 >> 1) & 1
        if (bi == 0 || bi == 15 || si == 3) return None
        val b3 = b(off + 3) & 0xff
        val mode = b3 >> 6
        // joint stereo: mode_extension bit 1 = MS stereo, bit 0 =
        // intensity stereo. BOTH parse identically — in Layer III the
        // stereo tools change only the RECONSTRUCTION semantics (the
        // MS butterfly; is_pos re-scaling of the upper bands), never
        // the bitstream syntax, so the emitted per-channel requantized
        // spectra stay exact. See the block comment for why the
        // reconstructions themselves stay out of exact-decode scope.
        if (mode == 1) {
          val ext = (b3 >> 4) & 3
          if ((ext & 2) == 2) msf += 1
          if ((ext & 1) == 1) isf += 1
        }
        val ch = if (mode == 3) 1 else 2
        val r0 = Mp3Rates(si)
        if (rate == -1) {
          rate = r0; rateIdx = si; kbps = Mp3Bitrates(bi); chans = ch
        } else if (r0 != rate || ch != chans) return None
        val flen = 144000 * Mp3Bitrates(bi) / r0 + pad
        val siBytes = if (ch == 1) 17 else 32
        val hdrBytes = 4 + (if (prot) 2 else 0) + siBytes
        if (flen < hdrBytes || off + flen > end) return None
        val siStart = off + 4 + (if (prot) 2 else 0)
        if (prot) {
          val crcWord = ((b(off + 4) & 0xff) << 8) | (b(off + 5) & 0xff)
          val crc = new Mp1Crc
          crc.update(b2, 8); crc.update(b3, 8)
          var i = 0
          while (i < siBytes) { crc.update(b(siStart + i) & 0xff, 8); i += 1 }
          if (crc.value != crcWord) return None
        }
        // --- side info ---
        val sr = new FlacBitReader(b, siStart, siStart + siBytes)
        val mdb = sr.readBits(9).toInt
        sr.readBits(if (ch == 1) 5 else 3) // private_bits
        val scfsi = new Array[Int](ch)
        var c = 0
        while (c < ch) { scfsi(c) = sr.readBits(4).toInt; c += 1 }
        val gi = Array.ofDim[Mp3GrInfo](2, ch)
        var g = 0
        while (g < 2) {
          c = 0
          while (c < ch) {
            val p23 = sr.readBits(12).toInt
            val bv = sr.readBits(9).toInt
            val gg = sr.readBits(8).toInt
            val scomp = sr.readBits(4).toInt
            val wsf = sr.readBit()
            val info =
              if (wsf == 0) {
                val ts = Array(sr.readBits(5).toInt, sr.readBits(5).toInt,
                  sr.readBits(5).toInt)
                val r0c = sr.readBits(4).toInt
                val r1c = sr.readBits(3).toInt
                Mp3GrInfo(p23, bv, gg, scomp, ts, r0c, r1c,
                  sr.readBit(), sr.readBit(), sr.readBit(),
                  blockType = 0, mixed = false, subblockGain = null)
              } else {
                // window switching: every spec-legal shape decodes —
                // pure short (bt 2), long transition windows (bt 1/3:
                // long spectral layout, only the synthesis window
                // differs, which is out of decode scope; their
                // transmitted subblock gains are unused per spec), and
                // mixed blocks (bt 2 + flag). bt 0 with the flag set
                // is illegal, and mixed_block_flag is defined for
                // block_type 2 only — both strict-reject.
                val bt = sr.readBits(2).toInt
                val mixed = sr.readBit() == 1
                val ts = Array(sr.readBits(5).toInt, sr.readBits(5).toInt, 0)
                val sbg = Array(sr.readBits(3).toInt, sr.readBits(3).toInt,
                  sr.readBits(3).toInt)
                if (bt == 0 || (mixed && bt != 2)) return None
                val pf = sr.readBit()
                val ssc = sr.readBit()
                val c1t = sr.readBit()
                // pretab is a LONG-band table; with block_type 2 it is
                // undefined (pure short) or a no-op (the mixed long
                // bands 0-7 all carry pretab 0) — strict reject keeps
                // the field pinned. bt 1/3 are long: preflag applies.
                if (bt == 2 && pf != 0) return None
                Mp3GrInfo(p23, bv, gg, scomp, ts, 0, 0, pf, ssc, c1t,
                  blockType = bt, mixed = mixed, subblockGain = sbg)
              }
            if (bv > 288) return None // §2.4.2.7 bound
            gi(g)(c) = info
            c += 1
          }
          g += 1
        }
        // --- reservoir: this frame's granule data starts mdb bytes
        // before its own slot, inside the rolling window ---
        if (mdb > resv.length) return None
        val slotStart = siStart + siBytes
        val slotLen = off + flen - slotStart
        val buf = new Array[Byte](mdb + slotLen)
        System.arraycopy(resv, resv.length - mdb, buf, 0, mdb)
        System.arraycopy(b, slotStart, buf, mdb, slotLen)
        val br = new FlacBitReader(buf, 0, buf.length)
        val bounds = Mp3SfbLong(rateIdx)
        val sfPrev = Array.ofDim[Int](ch, 22)
        val isArr = new Array[Int](576)
        g = 0
        while (g < 2) {
          c = 0
          while (c < ch) {
            val info = gi(g)(c)
            val start = br.bitPosition
            // scfsi sharing is defined over LONG band groups only: a
            // channel whose frame contains any short granule must
            // carry scfsi 0 (strict — sharing into or out of a short
            // granule is undefined)
            if (info.hasShortPart && scfsi(c) != 0) return None
            val (sl1, sl2) = Mp3Slen(info.scalefacCompress)
            val sf = new Array[Int](22)          // long bands
            val sfS = Array.ofDim[Int](13, 3)    // short (sfb, window)
            if (info.short) {
              // short scalefactors: sfb-major, window-minor; slen1
              // for sfbs 0-5, slen2 for 6-11 (sfb 12 has none)
              var s = 0
              while (s < 12) {
                val sl = if (s < 6) sl1 else sl2
                var w = 0
                while (w < 3) {
                  sfS(s)(w) = if (sl == 0) 0 else br.readBits(sl).toInt
                  w += 1
                }
                s += 1
              }
            } else if (info.mixed) {
              // mixed: long bands 0-7 (slen1), then short sfbs 3-11
              // (slen1 through sfb 5, slen2 from 6; sfb 12 has none)
              var band = 0
              while (band < 8) {
                sf(band) = if (sl1 == 0) 0 else br.readBits(sl1).toInt
                band += 1
              }
              var s = 3
              while (s < 12) {
                val sl = if (s < 6) sl1 else sl2
                var w = 0
                while (w < 3) {
                  sfS(s)(w) = if (sl == 0) 0 else br.readBits(sl).toInt
                  w += 1
                }
                s += 1
              }
            } else {
              // --- scalefactors (long layout, bt 0/1/3:
              // 11·slen1 + 10·slen2) ---
              var band = 0
              while (band < 21) {
                val sl = if (band < 11) sl1 else sl2
                val shared =
                  g == 1 && ((scfsi(c) >> (3 - mp3Grp(band))) & 1) == 1
                sf(band) =
                  if (shared) sfPrev(c)(band)
                  else if (sl == 0) 0
                  else br.readBits(sl).toInt
                band += 1
              }
              if (g == 0) System.arraycopy(sf, 0, sfPrev(c), 0, 22)
            }
            // --- big values: regions and per-region table. Window
            // switching (any block_type != 0) fixes region0 at the
            // first 36 lines and region1 at the rest (no region2 —
            // §2.4.2.7) ---
            val r0End =
              if (info.blockType != 0) 36
              else bounds(math.min(info.region0 + 1, 22))
            val r1End =
              if (info.blockType != 0) 576
              else bounds(math.min(info.region0 + 1 + info.region1 + 1, 22))
            val bvEnd = info.bigValues * 2
            var p = 0
            while (p < bvEnd) {
              val tsel =
                if (p < r0End) info.tableSelect(0)
                else if (p < r1End) info.tableSelect(1)
                else info.tableSelect(2)
              if (tsel == 0) { isArr(p) = 0; isArr(p + 1) = 0 }
              else {
                val tab = mp3HuffTables.getOrElse(tsel, null)
                if (tab == null || tab.quad) return None // unsupported id
                val key = tab.decode(br)
                var x = key >> 4
                var y = key & 15
                if (x == 15 && tab.linbits > 0)
                  x += br.readBits(tab.linbits).toInt
                if (x != 0 && br.readBit() == 1) x = -x
                if (y == 15 && tab.linbits > 0)
                  y += br.readBits(tab.linbits).toInt
                if (y != 0 && br.readBit() == 1) y = -y
                isArr(p) = x; isArr(p + 1) = y
              }
              p += 2
            }
            // --- count1 quadruples until part2_3_length exhausted ---
            val quadA = mp3HuffTables(32)
            while (br.bitPosition - start < info.part23 && p + 4 <= 576) {
              val quad =
                if (info.count1Table == 1) (~br.readBits(4).toInt) & 15
                else quadA.decode(br)
              var k = 0
              while (k < 4) {
                var v = (quad >> (3 - k)) & 1
                if (v != 0 && br.readBit() == 1) v = -v
                isArr(p) = v
                p += 1; k += 1
              }
            }
            if (br.bitPosition - start > info.part23) return None
            br.seekBits(start + info.part23) // rest of granule: rzero
            // --- requantize decoded slots (cube-domain Q15). Mixed
            // granules reuse the pure-short position map from line 36:
            // short sfbs 0-2 are 4+4+4 wide at every MPEG-1 rate, so
            // the short layout's sfb-3 base is exactly 36 — the same
            // lines the mixed long bands 0-7 occupy. bt 1/3 take the
            // long path (their transmitted subblock gains are unused
            // per spec). ---
            val posMap =
              if (info.hasShortPart) Mp3ShortPosMap(rateIdx) else null
            var bnd = 0
            var i = 0
            while (i < p) {
              val e4 =
                if (info.short || (info.mixed && i >= 36)) {
                  val sw = posMap(i)
                  val s = sw >> 2
                  val w = sw & 3
                  // sfb 12 carries no scalefactor (remainder band)
                  val sfe = if (s < 12) sfS(s)(w) else 0
                  (info.globalGain - 210) - 8 * info.subblockGain(w) -
                    (2 + 2 * info.scalefacScale) * sfe
                } else {
                  while (bnd < 21 && i >= bounds(bnd + 1)) bnd += 1
                  val sfe = sf(bnd) +
                    (if (info.preflag == 1) Mp3Pretab(bnd) else 0)
                  (info.globalGain - 210) -
                    (2 + 2 * info.scalefacScale) * sfe
                }
              val v = isArr(i)
              val qa = mp3CubeQ15(math.abs(v), e4)
              val q = if (v < 0) -qa else qa
              sum += q; hsum += v
              if (q < mn) mn = q
              if (q > mx) mx = q
              i += 1
            }
            nDec += p
            c += 1
          }
          g += 1
        }
        // roll the reservoir window forward
        val keep = math.min(resv.length + slotLen, 511)
        val nr = new Array[Byte](keep)
        if (slotLen >= keep)
          System.arraycopy(b, slotStart + slotLen - keep, nr, 0, keep)
        else {
          val fromResv = keep - slotLen
          System.arraycopy(resv, resv.length - fromResv, nr, 0, fromResv)
          System.arraycopy(b, slotStart, nr, fromResv, slotLen)
        }
        resv = nr
        nf += 1
        off += flen
      }
      if (nf > 0 && off == end) {
        if (nDec == 0) { mn = 0; mx = 0 }
        Some(Mp3L3Decoded(rate, kbps, chans, nf, nf.toLong * 1152 * chans,
          nDec, hsum, sum, mn, mx, msf, isf))
      } else None
    } catch { case FlacEof => None }
  }

  /** One granule-channel's encode-side description. Long blocks by
    * default; `blockType = 2` encodes a PURE short granule (fixed
    * 36-line region0, two table selects, subblock gains, sfb-major
    * window-minor short scalefactors via `sfShort`; `preflag` must
    * be 0 and the channel's scfsi nibble 0) — or, with `mixedBlock`,
    * a MIXED granule (long bands 0-7 via `sf` over lines 0-35, short
    * sfbs 3-11 via `sfShort` from line 36). `blockType` 1/3 encode
    * the long transition windows: long layout, fixed 36-line region0,
    * two table selects, subblock gains transmitted (unused by
    * decode). */
  final case class Mp3GrSpec(
      globalGain: Int, scalefacCompress: Int, preflag: Int,
      scalefacScale: Int, count1Table: Int,
      tableSelect: (Int, Int, Int), region0Count: Int, region1Count: Int,
      bigValues: Int,
      sf: Int => Int,    // band 0..20 → raw scalefactor (must fit slen)
      value: Int => Int, // position → signed spectral integer
      nCount1: Int,      // quadruples appended after the big values
      blockType: Int = 0,
      subblockGain: (Int, Int, Int) = (0, 0, 0),
      sfShort: (Int, Int) => Int = (_, _) => 0, // (sfb 0..11, window)
      mixedBlock: Boolean = false)

  /** Encode a REAL MPEG-1 Layer III stream (fixture / test side): the
    * per-granule structure and every spectral value are SUPPLIED
    * closed-form — the decoder is the operator under test. Main data
    * is assembled as one global bit stream and distributed into the
    * frames' slots with caller-chosen main_data_begin back-pointers,
    * so the bit reservoir is exercised for real; part2_3_length is
    * measured from the actual bits written; the CRC on protected
    * frames covers header bytes 2-3 + side info, computed for real. */
  def encodeMp3L3(
      bitrateIdx: Int, rateIdx: Int, mono: Boolean, nFrames: Int,
      protect: Boolean,
      pad: Int => Int,                 // frame → 0/1
      mdbTarget: Int => Int,           // frame → main_data_begin (0 for f=0)
      scfsiN: (Int, Int) => Int,       // (frame, ch) → 4-bit nibble, grp0=MSB
      gr: (Int, Int, Int) => Mp3GrSpec, // (frame, granule, ch)
      mode: Int = -1,                  // -1: mono ? 3 : 0; 1 = joint stereo
      modeExt: Int => Int = _ => 0     // frame → mode_extension (mode 1)
  ): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    val rate = Mp3Rates(rateIdx)
    val ch = if (mono) 1 else 2
    val md = if (mode == -1) (if (mono) 3 else 0) else mode
    require((md == 3) == mono, s"mode $md vs mono=$mono")
    val siBytes = if (mono) 17 else 32
    val flens = Array.tabulate(nFrames)(f =>
      144000 * Mp3Bitrates(bitrateIdx) / rate + (pad(f) & 1))
    val slots = flens.map(_ - 4 - (if (protect) 2 else 0) - siBytes)
    require(slots.forall(_ > 0), "bitrate too low for side info")
    val totSlots = slots.sum
    // --- pass 1: granule sections into one global main-data stream ---
    val gw = new FlacBitWriter(totSlots)
    val p23 = Array.ofDim[Int](nFrames, 2, ch)
    val tAcc = new Array[Int](nFrames + 1) // slot bytes before frame f
    for (f <- 0 until nFrames) tAcc(f + 1) = tAcc(f) + slots(f)
    var gBits = 0 // running bit length of the global stream
    def padToByte(): Unit = while ((gBits & 7) != 0) { gw.writeBit(0); gBits += 1 }
    def padToBytePos(target: Int): Unit = {
      padToByte()
      require(gBits / 8 <= target,
        s"main data overran its reservoir target ($gBits bits > $target B)")
      while (gBits / 8 < target) { gw.writeBits(0, 8); gBits += 8 }
    }
    val bounds = Mp3SfbLong(rateIdx)
    for (f <- 0 until nFrames) {
      val mdb = mdbTarget(f)
      require(mdb >= 0 && mdb <= 511 && mdb <= tAcc(f), s"mdb $mdb frame $f")
      padToBytePos(tAcc(f) - mdb)
      for (g <- 0 until 2; c <- 0 until ch) {
        val s = gr(f, g, c)
        val startBits = gBits
        def wb(v: Long, n: Int): Unit = { gw.writeBits(v, n); gBits += n }
        require(s.blockType >= 0 && s.blockType <= 3, s"blockType ${s.blockType}")
        require(!s.mixedBlock || s.blockType == 2,
          "mixed_block_flag is defined for block_type 2 only")
        val short = s.blockType == 2 && !s.mixedBlock
        val mixed = s.blockType == 2 && s.mixedBlock
        if (s.blockType == 2) {
          require(s.preflag == 0,
            "preflag undefined/no-op for block_type-2 granules")
          require(scfsiN(f, c) == 0,
            "scfsi must be 0 for a channel with a short-part granule")
        }
        // scalefactors
        val (sl1, sl2) = Mp3Slen(s.scalefacCompress)
        if (short) {
          for (sfb <- 0 until 12; w <- 0 until 3) {
            val sl = if (sfb < 6) sl1 else sl2
            if (sl > 0) {
              val v = s.sfShort(sfb, w)
              require(v >= 0 && v < (1 << sl), s"short sf $v !fit slen $sl")
              wb(v.toLong, sl)
            } else require(s.sfShort(sfb, w) == 0, "short sf at slen 0")
          }
        } else if (mixed) {
          for (band <- 0 until 8) {
            if (sl1 > 0) {
              val v = s.sf(band)
              require(v >= 0 && v < (1 << sl1), s"mixed sf $v !fit slen $sl1")
              wb(v.toLong, sl1)
            } else require(s.sf(band) == 0, "mixed sf at slen 0")
          }
          for (sfb <- 3 until 12; w <- 0 until 3) {
            val sl = if (sfb < 6) sl1 else sl2
            if (sl > 0) {
              val v = s.sfShort(sfb, w)
              require(v >= 0 && v < (1 << sl), s"mixed short sf $v !fit $sl")
              wb(v.toLong, sl)
            } else require(s.sfShort(sfb, w) == 0, "mixed short sf at slen 0")
          }
        } else for (band <- 0 until 21) {
          val sl = if (band < 11) sl1 else sl2
          val shared =
            g == 1 && ((scfsiN(f, c) >> (3 - mp3Grp(band))) & 1) == 1
          if (!shared && sl > 0) {
            val v = s.sf(band)
            require(v >= 0 && v < (1 << sl), s"sf $v !fit slen $sl")
            wb(v.toLong, sl)
          } else if (!shared) require(s.sf(band) == 0, "sf nonzero at slen 0")
        }
        // big values (window switching: fixed 36-line region0, no region2)
        val r0End =
          if (s.blockType != 0) 36
          else bounds(math.min(s.region0Count + 1, 22))
        val r1End =
          if (s.blockType != 0) 576
          else bounds(math.min(s.region0Count + 1 + s.region1Count + 1, 22))
        var p = 0
        while (p < s.bigValues * 2) {
          val tsel = if (p < r0End) s.tableSelect._1
            else if (p < r1End) s.tableSelect._2 else s.tableSelect._3
          val x = s.value(p); val y = s.value(p + 1)
          if (tsel == 0) require(x == 0 && y == 0, "table 0 must code zeros")
          else {
            val tab = mp3HuffTables(tsel)
            val ax = math.abs(x); val ay = math.abs(y)
            val esc = tab.linbits > 0
            val cap = if (esc) 15 + (1 << tab.linbits) - 1 else tab.maxVal - 1
            require(ax <= cap && ay <= cap,
              s"value $x/$y exceeds table $tsel (cap $cap)")
            // ESC: magnitudes >= 15 code as key 15 + a linbits residual
            // (written even when the residual is 0 — the decoder always
            // reads linbits after a 15). Field order per spec:
            // code, x-linbits, x-sign, y-linbits, y-sign.
            val kx = if (esc && ax >= 15) 15 else ax
            val ky = if (esc && ay >= 15) 15 else ay
            val (hl, hc) = tab.encodeBits((kx << 4) | ky)
            wb(hc, hl)
            if (esc && kx == 15) wb((ax - 15).toLong, tab.linbits)
            if (ax != 0) wb(if (x < 0) 1 else 0, 1)
            if (esc && ky == 15) wb((ay - 15).toLong, tab.linbits)
            if (ay != 0) wb(if (y < 0) 1 else 0, 1)
          }
          p += 2
        }
        // count1 quadruples
        val quadA = mp3HuffTables(32)
        for (_ <- 0 until s.nCount1) {
          val vs = Array(s.value(p), s.value(p + 1), s.value(p + 2), s.value(p + 3))
          require(vs.forall(v => v >= -1 && v <= 1), "count1 values must be ±1/0")
          val key = vs.map(math.abs).foldLeft(0)((a, v) => (a << 1) | v)
          if (s.count1Table == 1) wb((~key & 15).toLong, 4)
          else { val (hl, hc) = quadA.encodeBits(key); wb(hc, hl) }
          vs.foreach(v => if (v != 0) wb(if (v < 0) 1 else 0, 1))
          p += 4
        }
        p23(f)(g)(c) = gBits - startBits
        require(p23(f)(g)(c) < 4096, "part2_3_length overflow")
      }
    }
    padToBytePos(totSlots)
    val global = java.util.Arrays.copyOf(gw.bytes, totSlots)
    // --- pass 2: frames = header + CRC + side info + slot bytes ---
    val out = new java.io.ByteArrayOutputStream()
    for (f <- 0 until nFrames) {
      val p = pad(f) & 1
      val b2 = (bitrateIdx << 4) | (rateIdx << 2) | (p << 1)
      val b3 = (md << 6) | (if (md == 1) (modeExt(f) & 3) << 4 else 0)
      val sw = new FlacBitWriter(siBytes)
      sw.writeBits(mdbTarget(f).toLong, 9)
      sw.writeBits(0, if (mono) 5 else 3)
      for (c <- 0 until ch) sw.writeBits((scfsiN(f, c) & 15).toLong, 4)
      for (g <- 0 until 2; c <- 0 until ch) {
        val s = gr(f, g, c)
        sw.writeBits(p23(f)(g)(c).toLong, 12)
        sw.writeBits(s.bigValues.toLong, 9)
        sw.writeBits(s.globalGain.toLong, 8)
        sw.writeBits(s.scalefacCompress.toLong, 4)
        if (s.blockType != 0) {
          sw.writeBit(1)      // window_switching_flag
          sw.writeBits(s.blockType.toLong, 2)
          sw.writeBit(if (s.mixedBlock) 1 else 0)
          sw.writeBits(s.tableSelect._1.toLong, 5)
          sw.writeBits(s.tableSelect._2.toLong, 5)
          sw.writeBits(s.subblockGain._1.toLong, 3)
          sw.writeBits(s.subblockGain._2.toLong, 3)
          sw.writeBits(s.subblockGain._3.toLong, 3)
        } else {
          sw.writeBit(0) // window_switching_flag: long blocks
          sw.writeBits(s.tableSelect._1.toLong, 5)
          sw.writeBits(s.tableSelect._2.toLong, 5)
          sw.writeBits(s.tableSelect._3.toLong, 5)
          sw.writeBits(s.region0Count.toLong, 4)
          sw.writeBits(s.region1Count.toLong, 3)
        }
        sw.writeBit(s.preflag)
        sw.writeBit(s.scalefacScale)
        sw.writeBit(s.count1Table)
      }
      sw.alignByte()
      val siArr = java.util.Arrays.copyOf(sw.bytes, siBytes)
      val fw = new java.io.ByteArrayOutputStream()
      fw.write(0xff)
      fw.write(if (protect) 0xfa else 0xfb) // MPEG-1, Layer III
      fw.write(b2)
      fw.write(b3)
      if (protect) {
        val crc = new Mp1Crc
        crc.update(b2, 8); crc.update(b3, 8)
        siArr.foreach(x => crc.update(x & 0xff, 8))
        fw.write(crc.value >> 8); fw.write(crc.value & 0xff)
      }
      fw.write(siArr)
      fw.write(global, tAcc(f), slots(f))
      val fb = fw.toByteArray
      require(fb.length == flens(f), s"frame $f length ${fb.length}")
      out.write(fb)
    }
    out.toByteArray
  }

  /** Deterministic Layer III fixture: 44.1/48/32 kHz cycle, mono and
    * stereo, 256/320 kbps, CRC on even ids, real bit-reservoir
    * back-pointers on most frames, all 16 scfsi patterns over the
    * corpus, both scalefac_scale laws (with sf parity pinned so every
    * quarter exponent is ≡ 0 mod 4 — the oracle's integer-exact
    * regime; the general path is property-gated in Mp3Layer3Spec),
    * preflag exercised on band-12 samples where pretab = 1, region0
    * through tables 1/2/3, region1 through 5/6, count1 through both
    * table A and raw table B — the exact laws the q188 oracle
    * replays. */
  def mp3L3Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val mono = (r / 3) % 3 == 0
      val ch = if (mono) 1 else 2
      val bitrateIdx = 13 + r % 2 // 256 / 320 kbps
      val nf = 2 + r % 3
      val s12 = Array(74, 72, 82)(rateIdx)
      val bv = s12 / 2 + 1
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val ss = (r + f + c) % 2
        val scomp = (r + 2 * f + 3 * g + 5 * c) % 16
        val (sl1, sl2) = Mp3Slen(scomp)
        val pf = if (ss == 0) 0 else (r + f + g + c) % 2
        def sfRaw(grp: Int): Int = {
          val base = r + 2 * f + 3 * g + 5 * c + 7 * grp
          val sl = if (grp < 2) sl1 else sl2
          if (ss == 1) base % (1 << sl)
          else if (sl == 0) 0
          else 2 * (base % (1 << (sl - 1)))
        }
        val t0 = 1 + (r + f + g + c) % 3
        val mx0 = if (t0 == 1) 2 else 3 // modulus, values 0..mx0-1
        def v(p: Int): Int = {
          val (m, negKey) =
            if (p < 24)
              ((r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0,
                r + f + g + c + p)
            else if (p < 36)
              ((r * 11 + f * 3 + g * 7 + c * 5 + p) % 4,
                r + f + g + c + p)
            else if (p < s12) (0, 0)
            else if (p == s12) (1 + (r + f + g + c) % 3, r + f + g + c)
            else if (p == s12 + 1)
              (1 + (r + f + g + c + 1) % 3, r + f + g + c + 1)
            else // count1 region: s12+2 .. s12+13
              ((r + 3 * f + 5 * g + 7 * c + (p - s12 - 2)) % 2,
                r + f + g + c + (p - s12 - 2))
          if (m != 0 && negKey % 2 == 1) -m else m
        }
        Mp3GrSpec(
          globalGain = 210 + 4 * ((r + f + 2 * g + 3 * c) % 4),
          scalefacCompress = scomp,
          preflag = pf,
          scalefacScale = ss,
          count1Table = (r + f + g + c) % 2,
          tableSelect = (t0, 5 + (r + g + c) % 2, 1),
          region0Count = 5, region1Count = 7,
          bigValues = bv,
          sf = band => sfRaw(mp3Grp(band)),
          value = v,
          nCount1 = 3)
      }
      val media = encodeMp3L3(bitrateIdx, rateIdx, mono, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (f, c) => (r + 3 * f + 5 * c) % 16,
        gr = grSpec)
      Row(r.toLong, media)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic SHORT-BLOCK Layer III fixture (q197): frames
    * alternate one pure-short and one silent long granule per
    * channel (granule f%2 is the short one), so the reservoir and
    * part2_3 accounting cross long/short boundaries every frame.
    * Short values live in lines 0-77 — scalefactor bands 0-5, whose
    * SHORT widths (4,4,4,4,6,8|6) agree across all three rates — so
    * the oracle's position→(sfb,window) map is closed-form and a
    * transcription slip in the high short bands cannot move any
    * gated output. Subblock gains, both scalefac_scale regimes, both
    * count1 tables, tables 1/2/3 in the fixed 36-line region0 and
    * 5/6 in region1 are all exercised; scfsi is 0 throughout (its
    * sharing is a LONG-group contract — strict-gated). */
  def mp3L3ShortFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val mono = (r / 3) % 3 == 0
      val nf = 2 + r % 3
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val short = (f + g) % 2 == 0
        if (!short)
          Mp3GrSpec(210, 0, 0, 0, 0, (1, 1, 1), 5, 7, 0,
            _ => 0, _ => 0, 0) // silent long granule
        else {
          val ss = (r + f + c) % 2
          val scomp = (r + 2 * f + 3 * g + 5 * c) % 16
          val (sl1, sl2) = Mp3Slen(scomp)
          val t0 = 1 + (r + f + g + c) % 3
          val mx0 = if (t0 == 1) 2 else 3
          def v(p: Int): Int = {
            val (m, negKey) =
              if (p < 36)
                ((r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0,
                  r + f + g + c + p)
              else if (p < 66)
                ((r * 11 + f * 3 + g * 7 + c * 5 + p) % 4,
                  r + f + g + c + p)
              else ((r + 3 * f + 5 * g + 7 * c + (p - 66)) % 2,
                r + f + g + c + (p - 66))
            if (m != 0 && negKey % 2 == 1) -m else m
          }
          Mp3GrSpec(
            globalGain = 210 + 4 * ((r + f + 2 * g + 3 * c) % 4),
            scalefacCompress = scomp,
            preflag = 0,
            scalefacScale = ss,
            count1Table = (r + f + g + c) % 2,
            tableSelect = (t0, 5 + (r + g + c) % 2, 0),
            region0Count = 0, region1Count = 0,
            bigValues = 33,
            sf = _ => 0,
            value = v,
            nCount1 = 3,
            blockType = 2,
            subblockGain = ((r + f + g + c) % 8, (r + f + g + c + 1) % 8,
              (r + f + g + c + 2) % 8),
            sfShort = (sfb, w) => {
              val sl = if (sfb < 6) sl1 else sl2
              val base = r + 2 * f + 3 * g + 5 * c + 7 * sfb + 11 * w
              if (ss == 1) base % (1 << sl)
              else if (sl == 0) 0
              else 2 * (base % (1 << (sl - 1)))
            })
        }
      }
      Row(r.toLong, encodeMp3L3(13 + r % 2, rateIdx, mono, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (_, _) => 0,
        gr = grSpec))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic ESC/linbits Layer III fixture (q198): every
    * granule's region2 selects one of the sixteen linbits/ESC tables
    * (ids 16-23 and 24-31 — codewords shared within each family,
    * per-id linbits), with magnitudes alternating the escape path
    * (|v| >= 15: key 15 + a linbits residual, including residual 0
    * at exactly 15) and the sub-15 direct path; region0 runs tables
    * 7/8/9 and region1 10/11/15 — the big-value ids this round's
    * transcription added. Scalefactors are all zero
    * (scalefac_compress 0) and global_gain = 210 − 4K pins every
    * quarter exponent to −4K (K = (r+f+g+c) mod 4), so the oracle's
    * requantization is a pure left shift q = m⁴ << (15 − 3K); the
    * per-K magnitude caps keep every sample under 2⁵² and stream
    * sums inside 63 bits. Reservoir back-pointers, CRC frames,
    * padding and count1 follow the q188 fixture's laws. */
  def mp3L3EscFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val mono = (r / 3) % 3 == 0
      val nf = 2 + r % 3
      val e14 = Array(110, 106, 126)(rateIdx) // bounds(14): region1 end
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val k = (r + f + g + c) % 4
        val t1 = Array(10, 11, 15)((r + g + c) % 3)
        val t2 = 16 + (r + 2 * f + 3 * g + 5 * c) % 16
        val linbits =
          Array(1, 2, 3, 4, 6, 8, 10, 13, 4, 5, 6, 7, 8, 9, 11, 13)(t2 - 16)
        val extMod = math.min(1 << linbits, Array(512, 1024, 1024, 2048)(k) - 15)
        def v(p: Int): Int = {
          val m =
            if (p < 24) (r * 7 + f * 5 + g * 3 + c * 9 + p) % 6
            else if (p < e14)
              (r * 11 + f * 3 + g * 7 + c * 5 + p) % (if (t1 == 15) 16 else 8)
            else if (p < e14 + 12) {
              val j = p - e14
              val u = r * 13 + f * 7 + g * 11 + c * 5 + j * 17
              if (j % 2 == 0) 15 + u % extMod else u % 15
            } else (r + 3 * f + 5 * g + 7 * c + (p - e14 - 12)) % 2
          if (m != 0 && (r + f + g + c + p) % 2 == 1) -m else m
        }
        Mp3GrSpec(
          globalGain = 210 - 4 * k,
          scalefacCompress = 0,
          preflag = 0,
          scalefacScale = 0,
          count1Table = (r + f + g + c) % 2,
          tableSelect = (7 + (r + f + g + c) % 3, t1, t2),
          region0Count = 5, region1Count = 7,
          bigValues = (e14 + 12) / 2,
          sf = _ => 0,
          value = v,
          nCount1 = 3)
      }
      Row(r.toLong, encodeMp3L3(14, rateIdx, mono, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (_, _) => 0,
        gr = grSpec))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic MS JOINT-STEREO Layer III fixture (q199): every
    * stream is mode-1 (joint stereo) with the per-frame
    * mode_extension alternating 2 (MS stereo on) and 0 (both tools
    * off) — the header legality surface real stereo music MP3s
    * exercise. The emitted spectra are the MID/SIDE channels'
    * requantized values (the butterfly is synthesis-side — see the
    * Layer III block comment). Laws mirror the ESC fixture's
    * shift-only regime without the escape path: global_gain 210−4K,
    * zero scalefactors, tables 1/2/3 and 5/6. */
  def mp3L3MsFixture(spark: SparkSession, n: Int): DataFrame =
    mp3L3JointFixture(spark, n, (r, f) => if ((r + f) % 2 == 0) 2 else 0)

  /** Intensity-stereo twin (q219): the SAME audio laws behind
    * mode_extension 1 (intensity only) on even r+f and 3 (intensity +
    * MS) on odd — the bitstream is identical to the MS fixture's
    * mode-1 shape, so the oracle replays the same value CTEs; only
    * the per-tool frame counters differ. */
  def mp3L3IsFixture(spark: SparkSession, n: Int): DataFrame =
    mp3L3JointFixture(spark, n, (r, f) => if ((r + f) % 2 == 0) 1 else 3)

  private def mp3L3JointFixture(spark: SparkSession, n: Int,
      ext: (Int, Int) => Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val nf = 2 + r % 3
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val k = (r + f + g + c) % 4
        val t0 = 1 + (r + f + g + c) % 3
        val mx0 = if (t0 == 1) 2 else 3
        def v(p: Int): Int = {
          val m =
            if (p < 24) (r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0
            else if (p < 40) (r * 11 + f * 3 + g * 7 + c * 5 + p) % 4
            else (r + 3 * f + 5 * g + 7 * c + (p - 40)) % 2
          if (m != 0 && (r + f + g + c + p) % 2 == 1) -m else m
        }
        Mp3GrSpec(
          globalGain = 210 - 4 * k,
          scalefacCompress = 0,
          preflag = 0,
          scalefacScale = 0,
          count1Table = (r + f + g + c) % 2,
          tableSelect = (t0, 5 + (r + g + c) % 2, 0),
          region0Count = 5, region1Count = 7,
          bigValues = 20,
          sf = _ => 0,
          value = v,
          nCount1 = 3)
      }
      Row(r.toLong, encodeMp3L3(13 + r % 2, rateIdx, mono = false, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (_, _) => 0,
        gr = grSpec,
        mode = 1,
        modeExt = f => ext(r, f)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** ID3-WRAPPED Layer III fixture (q202): the real-world MP3 FILE
    * shape — an ID3v2 tag (REAL frames via [[Id3Lake.encFrame]], both
    * tag majors, padding) before the first audio frame on ids ≢ 2
    * (mod 3), an ID3v1 trailer (exactly 128 "TAG…" bytes) on even
    * ids — so the corpus carries v2-only, v1-only, both and neither.
    * The audio laws mirror the MS fixture's shift-only regime
    * (mono/stereo, tables 1/2/3 + 5/6); the decode output is
    * tag-invariant, so the oracle replays only the audio laws. */
  def mp3L3Id3Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val mono = (r / 3) % 3 == 0
      val nf = 2 + r % 3
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val k = (r + f + g + c) % 4
        val t0 = 1 + (r + f + g + c) % 3
        val mx0 = if (t0 == 1) 2 else 3
        def v(p: Int): Int = {
          val m =
            if (p < 24) (r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0
            else if (p < 40) (r * 11 + f * 3 + g * 7 + c * 5 + p) % 4
            else (r + 3 * f + 5 * g + 7 * c + (p - 40)) % 2
          if (m != 0 && (r + f + g + c + p) % 2 == 1) -m else m
        }
        Mp3GrSpec(
          globalGain = 210 - 4 * k,
          scalefacCompress = 0,
          preflag = 0,
          scalefacScale = 0,
          count1Table = (r + f + g + c) % 2,
          tableSelect = (t0, 5 + (r + g + c) % 2, 0),
          region0Count = 5, region1Count = 7,
          bigValues = 20,
          sf = _ => 0,
          value = v,
          nCount1 = 3)
      }
      val audio = encodeMp3L3(13 + r % 2, rateIdx, mono, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (_, _) => 0,
        gr = grSpec)
      val v2: Array[Byte] =
        if (r % 3 == 2) Array.emptyByteArray
        else {
          val ver = if (r % 2 == 0) 3 else 4
          val body = Id3Lake.encFrame(ver, "TIT2", 0, s"Track $r",
            trailingNul = false) ++ new Array[Byte](r % 32)
          val sz = body.length
          "ID3".getBytes("ISO-8859-1") ++
            Array(ver.toByte, 0.toByte, 0.toByte,
              ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
              ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte) ++ body
        }
      val v1: Array[Byte] =
        if (r % 2 != 0) Array.emptyByteArray
        else {
          val blk = new Array[Byte](128)
          val s = ("TAG" + s"Song $r".padTo(30, ' ') +
            s"Artist ${r % 7}".padTo(30, ' ') +
            s"Album ${r % 5}".padTo(30, ' ') +
            (1990 + r % 30).toString).getBytes("ISO-8859-1")
          System.arraycopy(s, 0, blk, 0, s.length)
          blk(127) = (r % 80).toByte // genre id
          blk
        }
      Row(r.toLong, v2 ++ audio ++ v1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic TRANSITION-WINDOW Layer III fixture (q200):
    * granules cycle block types 0 → 1 (start) → 3 (stop), all with
    * the LONG spectral layout. The bt-0 granules declare
    * region0_count 7 / region1_count 13, which lands their region
    * boundaries on the same [0,36)/[36,576) split window switching
    * fixes — so one value law covers all three types, and the hash
    * gate pins the 22-bit window-switching side-info layout (any
    * parse slip desyncs the Huffman stream). Transmitted subblock
    * gains on bt-1/3 granules are unused per spec; scalefactors,
    * scfsi sharing and preflag run the full q188 laws across all
    * three block types. */
  def mp3L3TransitionFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val mono = (r / 3) % 3 == 0
      val nf = 2 + r % 3
      val s12 = Array(74, 72, 82)(rateIdx)
      val bv = s12 / 2 + 1
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val ss = (r + f + c) % 2
        val scomp = (r + 2 * f + 3 * g + 5 * c) % 16
        val (sl1, sl2) = Mp3Slen(scomp)
        val pf = if (ss == 0) 0 else (r + f + g + c) % 2
        def sfRaw(grp: Int): Int = {
          val base = r + 2 * f + 3 * g + 5 * c + 7 * grp
          val sl = if (grp < 2) sl1 else sl2
          if (ss == 1) base % (1 << sl)
          else if (sl == 0) 0
          else 2 * (base % (1 << (sl - 1)))
        }
        val bt = Array(0, 1, 3)((r + f + g + c) % 3)
        val t0 = 1 + (r + f + g + c) % 3
        val mx0 = if (t0 == 1) 2 else 3
        def v(p: Int): Int = {
          val (m, negKey) =
            if (p < 36)
              ((r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0,
                r + f + g + c + p)
            else if (p < s12) (0, 0)
            else if (p == s12) (1 + (r + f + g + c) % 3, r + f + g + c)
            else if (p == s12 + 1)
              (1 + (r + f + g + c + 1) % 3, r + f + g + c + 1)
            else ((r + 3 * f + 5 * g + 7 * c + (p - s12 - 2)) % 2,
              r + f + g + c + (p - s12 - 2))
          if (m != 0 && negKey % 2 == 1) -m else m
        }
        Mp3GrSpec(
          globalGain = 210 + 4 * ((r + f + 2 * g + 3 * c) % 4),
          scalefacCompress = scomp,
          preflag = pf,
          scalefacScale = ss,
          count1Table = (r + f + g + c) % 2,
          tableSelect = (t0, 5 + (r + g + c) % 2, 0),
          region0Count = 7, region1Count = 13,
          bigValues = bv,
          sf = band => sfRaw(mp3Grp(band)),
          value = v,
          nCount1 = 3,
          blockType = bt,
          subblockGain = if (bt == 0) (0, 0, 0)
            else ((r + f + g + c) % 8, (r + f + g + c + 1) % 8,
              (r + f + g + c + 2) % 8))
      }
      Row(r.toLong, encodeMp3L3(13 + r % 2, rateIdx, mono, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (f, c) => (r + 3 * f + 5 * c) % 16,
        gr = grSpec))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic MIXED-BLOCK Layer III fixture (q201): granule
    * f%2 of every (frame, channel) is a mixed granule (block_type 2
    * + mixed_block_flag — long bands 0-7 over lines 0-35 via long
    * scalefactors, short sfbs 3+ from line 36 with per-window
    * subblock gains), the other granule silent long. Values reach
    * the count1 region past the big values so short sfb 6 (slen2) is
    * exercised; both scalefac_scale regimes keep the parity trick
    * (quarter exponents ≡ 0 mod 4 except where values are zero). */
  def mp3L3MixedFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rateIdx = r % 3
      val mono = (r / 3) % 3 == 0
      val nf = 2 + r % 3
      val bvEnd = Array(90, 84, 90)(rateIdx) // end of short sfb 5
      def grSpec(f: Int, g: Int, c: Int): Mp3GrSpec = {
        val isMixed = g == f % 2
        if (!isMixed)
          Mp3GrSpec(210, 0, 0, 0, 0, (1, 1, 1), 5, 7, 0,
            _ => 0, _ => 0, 0) // silent long granule
        else {
          val ss = (r + f + c) % 2
          val scomp = (r + 2 * f + 3 * g + 5 * c) % 16
          val (sl1, sl2) = Mp3Slen(scomp)
          val t0 = 1 + (r + f + g + c) % 3
          val mx0 = if (t0 == 1) 2 else 3
          def v(p: Int): Int = {
            val m =
              if (p < 36) (r * 7 + f * 5 + g * 3 + c * 9 + p) % mx0
              else if (p < bvEnd)
                (r * 11 + f * 3 + g * 7 + c * 5 + p) % 4
              else (r + 3 * f + 5 * g + 7 * c + (p - bvEnd)) % 2
            if (m != 0 && (r + f + g + c + p) % 2 == 1) -m else m
          }
          def fit(base: Int, sl: Int): Int =
            if (ss == 1) base % (1 << sl)
            else if (sl == 0) 0
            else 2 * (base % (1 << (sl - 1)))
          Mp3GrSpec(
            globalGain = 210 + 4 * ((r + f + 2 * g + 3 * c) % 4),
            scalefacCompress = scomp,
            preflag = 0,
            scalefacScale = ss,
            count1Table = (r + f + g + c) % 2,
            tableSelect = (t0, 5 + (r + g + c) % 2, 0),
            region0Count = 0, region1Count = 0,
            bigValues = bvEnd / 2,
            sf = band => fit(r + 2 * f + 3 * g + 5 * c + 13 * band, sl1),
            value = v,
            nCount1 = 3,
            blockType = 2,
            subblockGain = ((r + f + g + c) % 8, (r + f + g + c + 1) % 8,
              (r + f + g + c + 2) % 8),
            sfShort = (sfb, w) =>
              fit(r + 2 * f + 3 * g + 5 * c + 7 * sfb + 11 * w,
                if (sfb < 6) sl1 else sl2),
            mixedBlock = true)
        }
      }
      Row(r.toLong, encodeMp3L3(13 + r % 2, rateIdx, mono, nf,
        protect = r % 2 == 0,
        pad = f => (r + f) % 2,
        mdbTarget = f =>
          if (f == 0 || (r + f) % 3 == 0) 0 else (r + 11 * f) % 200,
        scfsiN = (_, _) => 0,
        gr = grSpec))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Full-decode DataFrame op over MPEG-1 Layer III blobs — the
    * [[decodeMp1]]/[[decodeMp2]] surface plus `huff_sum`; malformed
    * streams yield valid=false rows, never throw. */
  def decodeMp3L3(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("sample_rate", IntegerType, true),
      StructField("bitrate_kbps", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("n_frames", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("n_decoded", LongType, true),
      StructField("huff_sum", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("min_sample", LongType, true),
      StructField("max_sample", LongType, true),
      StructField("ms_frames", IntegerType, true),
      StructField("is_frames", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parseMp3L3(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) =>
            Row(r.getLong(0), d.rate, d.kbps, d.channels, d.nFrames,
              d.totalSamples, d.nDecoded, d.huffSum, d.valueSum,
              d.mn, d.mx, d.msFrames, d.isFrames, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null,
              null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // FLAC — REAL container walk + frame decode for the CONSTANT-subframe
  // subset (public format, xiph.org spec / RFC 9639): "fLaC" magic,
  // METADATA_BLOCK walk, STREAMINFO bit unpacking, per-frame header
  // verification (sync, blocksize/sample-rate codes, UTF-8-coded frame
  // number, CRC-8) and constant-subframe SAMPLE decode with the frame
  // CRC-16 checked — i.e. actual PCM reconstruction, not just headers,
  // for the subset a fixture can pin closed-form. LPC/fixed/verbatim
  // subframes (rice-coded residuals) are out of scope and flag the
  // blob invalid rather than guessing. Restricting to bps ∈ {8,16} and
  // whole-byte layouts keeps every field byte-aligned, so the walk is
  // plain index arithmetic — no bit reader in the hot loop.

  private def isFlac(b: Array[Byte]): Boolean =
    b != null && b.length > 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  /** CRC-8, poly 0x07, init 0 — the FLAC frame-header checksum. */
  private[graft] def flacCrc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC whole-frame checksum. */
  private[graft] def flacCrc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Sample-rate header codes this module emits (subset of the spec
    * table; parse rejects others as unsupported-not-invalid). */
  private val FlacRates = Map(8 -> 32000, 9 -> 44100, 10 -> 48000)
  private val FlacBlockSize = 4096 // header code 0b1100 = 256·2⁴

  /** CBR-like FLAC stream of CONSTANT-subframe frames: every header
    * field, CRC and sample value is real per spec — a conforming
    * decoder reproduces exactly `nFrames·4096` samples per channel.
    * `bps` ∈ {8,16}; `frame f`'s constant (all channels) is
    * `((seed·31 + f·17) mod 200) − 100`. */
  def encodeFlac(rateCode: Int, channels: Int, bps: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(FlacRates.contains(rateCode), s"rateCode $rateCode")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(bps == 8 || bps == 16, s"bps $bps (byte-aligned subset)")
    require(nFrames >= 1 && nFrames <= 127,
      s"nFrames $nFrames (single-byte UTF-8 frame numbers)")
    val rate = FlacRates(rateCode)
    val vBytes = bps / 8
    val frameLen = 6 + channels * (1 + vBytes) + 2
    val total = nFrames.toLong * FlacBlockSize
    val out = ByteBuffer.allocate(4 + 4 + 34 + frameLen * nFrames)
      .order(ByteOrder.BIG_ENDIAN) // FLAC is big-endian throughout
    out.put("fLaC".getBytes("ASCII"))
    // METADATA_BLOCK_HEADER: last-block flag | type 0 (STREAMINFO), 24-bit length
    out.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    // STREAMINFO: min/max blocksize (16+16), min/max frame size (24+24)
    out.putShort(FlacBlockSize.toShort).putShort(FlacBlockSize.toShort)
    out.put((frameLen >> 16).toByte).put((frameLen >> 8).toByte).put(frameLen.toByte)
    out.put((frameLen >> 16).toByte).put((frameLen >> 8).toByte).put(frameLen.toByte)
    // rate(20) | channels-1(3) | bps-1(5) | totalSamples(36) = 8 bytes
    out.putLong((rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total)
    out.put(new Array[Byte](16)) // MD5 of unencoded audio: 0 = unknown
    val bpsCode = if (bps == 8) 1 else 4
    var f = 0
    while (f < nFrames) {
      val start = out.position()
      out.put(0xff.toByte).put(0xf8.toByte) // sync(14) | reserved 0 | fixed blocksize
      out.put(((12 << 4) | rateCode).toByte) // blocksize 4096 | sample rate
      out.put((((channels - 1) << 4) | (bpsCode << 1)).toByte)
      out.put(f.toByte) // UTF-8 frame number, single byte for 0..127
      out.put(flacCrc8(out.array(), start, out.position()).toByte)
      val v = (((seed * 31 + f * 17) % 200) - 100).toInt
      var c = 0
      while (c < channels) {
        out.put(0x00.toByte) // subframe header: reserved 0 | CONSTANT | no wasted bits
        if (bps == 8) out.put(v.toByte) else out.putShort(v.toShort)
        c += 1
      }
      out.putShort(flacCrc16(out.array(), start, out.position()).toShort)
      f += 1
    }
    out.array()
  }

  /** REAL decode of the constant-subframe FLAC subset. Verifies magic,
    * metadata walk, STREAMINFO consistency, every frame's sync +
    * header codes + CRC-8 + CRC-16, and reconstructs each channel's
    * constant sample value. Returns
    * (sampleRate, channels, bps, nFrames, totalSamples, valueSum)
    * where valueSum = Σ_frames Σ_channels constant — an integer the
    * oracle can replay closed-form. Any non-constant subframe, CRC
    * mismatch, code inconsistency or trailing bytes ⇒ None. */
  private[graft] def parseFlac(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Long, Long)] = {
    if (!isFlac(b)) return None
    var off = 4
    // metadata block walk: STREAMINFO must come first (spec), later
    // blocks (padding, vorbis comments...) are skipped
    if (off + 4 > b.length || (b(off) & 0x7f) != 0) return None
    var last = (b(off) & 0x80) != 0
    var len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    if (len != 34 || off + 4 + len > b.length) return None
    val si = off + 4
    val minBs = ((b(si) & 0xff) << 8) | (b(si + 1) & 0xff)
    val maxBs = ((b(si + 2) & 0xff) << 8) | (b(si + 3) & 0xff)
    val packed = ByteBuffer.wrap(b, si + 10, 8).order(ByteOrder.BIG_ENDIAN).getLong
    val rate = (packed >>> 44).toInt
    val channels = ((packed >>> 41) & 0x7).toInt + 1
    val bps = ((packed >>> 36) & 0x1f).toInt + 1
    val totalSamples = packed & 0xfffffffffL
    off = si + len
    while (!last) {
      if (off + 4 > b.length) return None
      last = (b(off) & 0x80) != 0
      if ((b(off) & 0x7f) == 0) return None // duplicate STREAMINFO
      len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      off += 4 + len
      if (off > b.length) return None
    }
    if (minBs != FlacBlockSize || maxBs != FlacBlockSize) return None
    if (bps != 8 && bps != 16) return None
    if (!FlacRates.values.exists(_ == rate)) return None
    val vBytes = bps / 8
    var nFrames = 0
    var valueSum = 0L
    while (off < b.length) {
      val start = off
      if (off + 6 > b.length) return None
      // sync (14 bits) + reserved 0 + fixed-blocksize strategy
      if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xff) != 0xf8) return None
      val bsCode = (b(off + 2) & 0xff) >> 4
      val srCode = b(off + 2) & 0x0f
      if (bsCode != 12) return None // 0b1100 = 4096, the emitted subset
      if (!FlacRates.get(srCode).contains(rate)) return None
      val chAssign = (b(off + 3) & 0xff) >> 4
      val bpsCode = (b(off + 3) & 0x0f) >> 1
      if (chAssign != channels - 1) return None
      if ((bpsCode == 1 && bps != 8) || (bpsCode == 4 && bps != 16)) return None
      if (bpsCode != 1 && bpsCode != 4) return None
      if ((b(off + 4) & 0x80) != 0) return None // single-byte UTF-8 number
      if ((b(off + 4) & 0x7f) != nFrames) return None // coded frame index
      if ((b(off + 5) & 0xff) != flacCrc8(b, start, off + 5)) return None
      off += 6
      var c = 0
      while (c < channels) {
        if (off + 1 + vBytes > b.length) return None
        if ((b(off) & 0xff) != 0x00) return None // CONSTANT subframe only
        val v =
          if (bps == 8) b(off + 1).toInt // sign-extends
          else (b(off + 1) << 8) | (b(off + 2) & 0xff)
        valueSum += v
        off += 1 + vBytes
        c += 1
      }
      if (off + 2 > b.length) return None
      val crc = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      if (crc != flacCrc16(b, start, off)) return None
      off += 2
      nFrames += 1
    }
    if (nFrames.toLong * FlacBlockSize != totalSamples) return None
    Some((rate, channels, bps, nFrames, totalSamples, valueSum))
  }

  /** Deterministic FLAC fixture: rate/channels/bps/frame-count are
    * closed-form in id, so the oracle replays the decode in SQL. */
  def flacFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, encodeFlac(8 + i % 3, 1 + i % 2,
        if (i % 4 < 2) 8 else 16, 3 + i % 7, i.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Full constant-subset decode as a DataFrame op: one row per blob,
    * integer-only outputs (the q93 playbook, plus actual sample
    * values). Runs per-partition over the binary column — the batch
    * shape a real codec plugs into, no shuffle. */
  def decodeFlac(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("bps", IntegerType, true),
      StructField("n_frames", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        parseFlac(r.getAs[Array[Byte]](1)) match {
          case Some((rate, ch, bps, nf, total, sum)) =>
            Row(r.getLong(0), rate, ch, bps, nf, total, sum, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // FLAC, bit-exact PCM subset (RFC 9639 §9): CONSTANT, VERBATIM,
  // FIXED-predictor (orders 0-4) and LPC (orders 1-32, arbitrary
  // quantized coefficients + shift) subframes, with partitioned
  // Rice residuals (both 4- and 5-bit parameter widths, escaped raw
  // partitions included). [[parseFlac]] above stays the byte-aligned
  // CATALOG subset that q144's oracle pins (per-frame constants,
  // summed once); this section is the bit-level PCM decoder that
  // extends the honest decode surface per r10 VERDICT #5 (fixed,
  // q148) and the r10 "missing" list item 2 (LPC, q149) — value_sum
  // is the sum of EVERY decoded sample (a constant frame contributes
  // 4096·v). Stereo decorrelation (left/side, right/side, mid/side
  // channel assignments, one-bit-wider side subframes) and wasted
  // bits decode for real too (q150). Still rejected, never guessed:
  // variable block size, reserved residual methods, reserved
  // subframe/channel codes.

  /** MSB-first bit writer over a growable frame buffer; exposes the
    * written bytes so FLAC's CRCs can run over the exact stream. */
  private final class FlacBitWriter(capacity: Int) {
    private val buf = new Array[Byte](capacity)
    private var bitPos = 0
    def writeBit(bit: Int): Unit = {
      if (bit != 0)
        buf(bitPos >> 3) = (buf(bitPos >> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while ((bitPos & 7) != 0) writeBit(0)
    def byteLength: Int = { require((bitPos & 7) == 0); bitPos >> 3 }
    def bytes: Array[Byte] = buf
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, byteLength)
  }

  /** MSB-first bit reader; any read past `until` raises [[FlacEof]]
    * (caught by the parser → reject). */
  private final class FlacBitReader(b: Array[Byte], from: Int, until: Int) {
    private var bitPos = from * 8
    private val endBit = until * 8
    def readBit(): Int = {
      if (bitPos >= endBit) throw FlacEof
      val v = (b(bitPos >> 3) >>> (7 - (bitPos & 7))) & 1
      bitPos += 1
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val u = readBits(n)
      (u << (64 - n) >> (64 - n)).toInt // sign-extend
    }
    /** Rice unary quotient: zeros then a one. Bounded so a corrupted
      * stream cannot spin to EOF one bit at a time. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        if (q > (1 << 20)) throw FlacEof
      }
      q
    }
    /** Consume pad bits to the byte boundary; they must be zero. */
    def alignByteZero(): Unit =
      while ((bitPos & 7) != 0) if (readBit() != 0) throw FlacEof
    def bytePos: Int = { require((bitPos & 7) == 0); bitPos >> 3 }
    /** Absolute bit cursor — Layer III tracks part2_3_length with it. */
    def bitPosition: Int = bitPos
    /** Seek to an absolute bit position (forward or backward within
      * bounds); Layer III granule sections are length-framed, not
      * self-terminating, so the caller repositions between them. */
    def seekBits(p: Int): Unit = {
      if (p < from * 8 || p > endBit) throw FlacEof
      bitPos = p
    }
  }
  private object FlacEof extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Fixed-predictor FLAC stream (bps 16): frame `f`'s subframe type
    * cycles CONSTANT / VERBATIM / FIXED order 0-4 by `(seed + f) % 7`,
    * and its samples are the closed-form ramp-plus-wiggle
    *   s[i] = c0 + c1·i + d·(i mod 2)
    * with c0 = (seed·31 + f·17) mod 50 − 25,
    *      c1 = (seed·13 + f·7) mod 7 − 3  (0 for CONSTANT frames),
    *      d  = (seed + f) mod 4           (0 for CONSTANT frames) —
    * so Σ samples = 4096·c0 + 8386560·c1 + 2048·d per channel per
    * frame, replayable in SQL. Rice parameter: 12 for order 0 (the
    * residuals ARE the ramp), 3 otherwise (residuals ≤ ~24). */
  def encodeFlacPred(rateCode: Int, channels: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(FlacRates.contains(rateCode), s"rateCode $rateCode")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(nFrames >= 1 && nFrames <= 127,
      s"nFrames $nFrames (single-byte UTF-8 frame numbers)")
    val bps = 16
    val bs = FlacBlockSize
    val rate = FlacRates(rateCode)
    val frames = (0 until nFrames).map { f =>
      val t = ((seed + f) % 7).toInt
      val c0 = ((seed * 31 + f * 17) % 50 - 25).toInt
      val c1 = if (t == 0) 0 else ((seed * 13 + f * 7) % 7 - 3).toInt
      val d = if (t == 0) 0 else ((seed + f) % 4).toInt
      def s(i: Int): Int = c0 + c1 * i + d * (i % 2)
      val bw = new FlacBitWriter(16 + channels * (2 + bs * (bps / 8 + 1)))
      bw.writeBits(0xff, 8); bw.writeBits(0xf8, 8)
      bw.writeBits((12 << 4) | rateCode, 8) // blocksize 4096 | rate
      bw.writeBits(((channels - 1) << 4) | (4 << 1), 8) // indep ch | bps 16
      bw.writeBits(f.toLong, 8) // UTF-8 frame number (single byte)
      bw.writeBits(flacCrc8(bw.bytes, 0, bw.byteLength).toLong, 8)
      (0 until channels).foreach { _ =>
        t match {
          case 0 => // CONSTANT
            bw.writeBits(0x00, 8)
            bw.writeBits(s(0).toLong & 0xffff, bps)
          case 1 => // VERBATIM
            bw.writeBits(0x02, 8)
            var i = 0
            while (i < bs) { bw.writeBits(s(i).toLong & 0xffff, bps); i += 1 }
          case _ => // FIXED order t-2
            val o = t - 2
            bw.writeBits(((8 + o) << 1).toLong, 8)
            var i = 0
            while (i < o) { bw.writeBits(s(i).toLong & 0xffff, bps); i += 1 }
            bw.writeBits(0, 2)  // residual method: 4-bit Rice
            bw.writeBits(0, 4)  // partition order 0
            val k = if (o == 0) 12 else 3
            bw.writeBits(k.toLong, 4)
            i = o
            while (i < bs) {
              val e = o match {
                case 0 => s(i)
                case 1 => s(i) - s(i - 1)
                case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
                case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
                case _ =>
                  s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
              }
              val u = (e << 1) ^ (e >> 31) // zigzag fold
              bw.writeUnary(u >>> k)
              bw.writeBits((u & ((1 << k) - 1)).toLong, k)
              i += 1
            }
        }
      }
      bw.alignByte()
      bw.writeBits(flacCrc16(bw.bytes, 0, bw.byteLength).toLong, 16)
      bw.toArray
    }
    val total = nFrames.toLong * bs
    val out = ByteBuffer.allocate(4 + 4 + 34 + frames.map(_.length).sum)
      .order(ByteOrder.BIG_ENDIAN)
    out.put("fLaC".getBytes("ASCII"))
    out.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(bs.toShort).putShort(bs.toShort)
    out.put(new Array[Byte](6)) // min/max frame size 0 = unknown (spec)
    out.putLong((rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total)
    out.put(new Array[Byte](16)) // MD5 unknown
    frames.foreach(out.put)
    out.array()
  }

  /** Bit-exact PCM decode of the CONSTANT / VERBATIM / FIXED / LPC
    * subset: verifies the same outer framing as [[parseFlac]] (magic,
    * metadata walk, frame sync/codes/number, CRC-8, CRC-16, zero pad
    * bits) and reconstructs EVERY sample through the predictor
    * recurrences — fixed orders 0-4 (RFC 9639 §9.2.2) and quantized
    * LPC up to order 32 (§9.2.4: per-subframe coefficient precision,
    * signed coefficients, arithmetic-shift division) — with
    * partitioned Rice residuals (§9.2.7: both 4- and 5-bit parameter
    * widths, any legal partition order, escaped raw partitions),
    * stereo decorrelation (§9.1.3: left/side, right/side, mid/side
    * with the one-bit-wider side subframe) and wasted bits (§9.2.1).
    * Variable block size and reserved codes reject —
    * unsupported-not-guessed. Returns
    * (sampleRate, channels, bps, nFrames, totalSamples, pcmSum). */
  private[graft] def parseFlacPcm(b: Array[Byte])
      : Option[(Int, Int, Int, Int, Long, Long)] = {
    if (!isFlac(b)) return None
    try {
      var off = 4
      if (off + 4 > b.length || (b(off) & 0x7f) != 0) return None
      var last = (b(off) & 0x80) != 0
      var len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      if (len != 34 || off + 4 + len > b.length) return None
      val si = off + 4
      val minBs = ((b(si) & 0xff) << 8) | (b(si + 1) & 0xff)
      val maxBs = ((b(si + 2) & 0xff) << 8) | (b(si + 3) & 0xff)
      val packed = ByteBuffer.wrap(b, si + 10, 8).order(ByteOrder.BIG_ENDIAN).getLong
      val rate = (packed >>> 44).toInt
      val channels = ((packed >>> 41) & 0x7).toInt + 1
      val bps = ((packed >>> 36) & 0x1f).toInt + 1
      val totalSamples = packed & 0xfffffffffL
      off = si + len
      while (!last) {
        if (off + 4 > b.length) return None
        last = (b(off) & 0x80) != 0
        if ((b(off) & 0x7f) == 0) return None
        len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        off += 4 + len
        if (off > b.length) return None
      }
      if (minBs != FlacBlockSize || maxBs != FlacBlockSize) return None
      if (bps != 8 && bps != 16) return None
      if (!FlacRates.values.exists(_ == rate)) return None
      val bs = FlacBlockSize
      var nFrames = 0
      var pcmSum = 0L
      while (off < b.length) {
        val start = off
        if (off + 6 > b.length) return None
        if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xff) != 0xf8) return None
        if ((b(off + 2) & 0xff) >> 4 != 12) return None
        if (!FlacRates.get(b(off + 2) & 0x0f).contains(rate)) return None
        val chAssign = (b(off + 3) & 0xff) >> 4
        val bpsCode = (b(off + 3) & 0x0f) >> 1
        // 0-7: chAssign+1 independent channels; 8/9/10: left/side,
        // right/side, mid/side stereo decorrelation (§9.1.3 — the
        // SIDE subframe carries one extra bit); 11-15: reserved
        val stereoMode = chAssign - 8
        if (chAssign <= 7) { if (chAssign != channels - 1) return None }
        else if (chAssign > 10 || channels != 2) return None
        if ((bpsCode == 1 && bps != 8) || (bpsCode == 4 && bps != 16)) return None
        if (bpsCode != 1 && bpsCode != 4) return None
        if ((b(off + 4) & 0x80) != 0) return None
        if ((b(off + 4) & 0x7f) != nFrames) return None
        if ((b(off + 5) & 0xff) != flacCrc8(b, start, off + 5)) return None
        val br = new FlacBitReader(b, off + 6, b.length)
        // One subframe at `effBps` bits → the decoded sample array,
        // or null on any structural/reserved-code violation. Wasted
        // bits (§9.2.1: header flag + unary k-1) narrow the coded
        // width and shift the decoded samples back up.
        def decodeSub(effBps: Int): Array[Int] = {
          val hdr = br.readBits(8).toInt
          if ((hdr & 0x80) != 0) return null // reserved bit
          var wasted = 0
          if ((hdr & 1) != 0) wasted = br.readUnary() + 1
          val w = effBps - wasted
          if (w <= 0) return null
          val typ = (hdr >> 1) & 0x3f
          val s = new Array[Int](bs)
          if (typ == 0) {
            java.util.Arrays.fill(s, br.readSigned(w))
          } else if (typ == 1) {
            var i = 0
            while (i < bs) { s(i) = br.readSigned(w); i += 1 }
          } else if ((typ >= 8 && typ <= 12) || typ >= 32) {
            // FIXED order 0-4 (RFC 9639 §9.2.2) or LPC order 1-32
            // (§9.2.4): both are [warm-up][predictor spec][coded
            // residual]; the sample array is the predictor history
            // (LPC reaches back up to 32 samples).
            val isLpc = typ >= 32
            val o = if (isLpc) typ - 31 else typ - 8
            var i = 0
            while (i < o) { s(i) = br.readSigned(w); i += 1 }
            var shift = 0
            var coefs: Array[Long] = null
            if (isLpc) {
              val precM1 = br.readBits(4).toInt
              if (precM1 == 15) return null // 0b1111: forbidden (§9.2.4)
              val prec = precM1 + 1
              val shRaw = br.readBits(5)
              shift = ((shRaw << 59) >> 59).toInt // 5-bit sign extend
              if (shift < 0) return null // negative shift: spec-forbidden
              coefs = new Array[Long](o)
              var j = 0
              while (j < o) {
                coefs(j) = (br.readBits(prec) << (64 - prec)) >> (64 - prec)
                j += 1
              }
            }
            // Coded residual (§9.2.7): method 0 = 4-bit Rice, 1 =
            // 5-bit Rice; 2^po partitions, the first short by `o`
            // samples; per-partition parameter, all-ones = escape to
            // raw `rawBits`-wide residuals (rawBits 0 → all zero).
            val method = br.readBits(2).toInt
            if (method > 1) return null // 0b1x: reserved
            val kBits = 4 + method
            val escape = (1 << kBits) - 1
            val po = br.readBits(4).toInt
            val nPart = 1 << po
            if (bs % nPart != 0 || (bs >> po) <= o) return null // §9.2.7
            var part = 0
            while (part < nPart) {
              val k = br.readBits(kBits).toInt
              val rawBits = if (k == escape) br.readBits(5).toInt else -1
              val cnt = (bs >> po) - (if (part == 0) o else 0)
              var n = 0
              while (n < cnt) {
                val e =
                  if (rawBits == 0) 0
                  else if (rawBits > 0) br.readSigned(rawBits)
                  else {
                    val q = br.readUnary()
                    val u = (q.toLong << k) | br.readBits(k)
                    ((u >>> 1) ^ -(u & 1L)).toInt // zigzag unfold
                  }
                val v =
                  if (isLpc) {
                    var acc = 0L
                    var j = 0
                    while (j < o) { acc += coefs(j) * s(i - 1 - j); j += 1 }
                    e + (acc >> shift).toInt
                  } else o match {
                    case 0 => e
                    case 1 => e + s(i - 1)
                    case 2 => e + 2 * s(i - 1) - s(i - 2)
                    case 3 => e + 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
                    case _ => e + 4 * s(i - 1) - 6 * s(i - 2) +
                      4 * s(i - 3) - s(i - 4)
                  }
                s(i) = v
                i += 1
                n += 1
              }
              part += 1
            }
          } else return null // reserved subframe types: reject
          if (wasted > 0) {
            var i = 0
            while (i < bs) { s(i) = s(i) << wasted; i += 1 }
          }
          s
        }
        if (stereoMode < 0) {
          var c = 0
          while (c < channels) {
            val s = decodeSub(bps)
            if (s == null) return None
            var i = 0
            while (i < bs) { pcmSum += s(i); i += 1 }
            c += 1
          }
        } else {
          // the SIDE subframe is coded one bit wider (§9.1.3):
          // mode 0 = left/side, 1 = right/side (side FIRST), 2 = mid/side
          val s0 = decodeSub(if (stereoMode == 1) bps + 1 else bps)
          if (s0 == null) return None
          val s1 = decodeSub(if (stereoMode == 1) bps else bps + 1)
          if (s1 == null) return None
          var i = 0
          while (i < bs) {
            if (stereoMode == 0) { // left + side → right = left - side
              pcmSum += s0(i); pcmSum += s0(i) - s1(i)
            } else if (stereoMode == 1) { // side + right → left = right + side
              pcmSum += s1(i) + s0(i); pcmSum += s1(i)
            } else { // mid + side: L+R = (mid<<1)|(side&1), L-R = side
              val m2 = (s0(i) << 1) | (s1(i) & 1)
              pcmSum += (m2 + s1(i)) >> 1
              pcmSum += (m2 - s1(i)) >> 1
            }
            i += 1
          }
        }
        br.alignByteZero()
        val end = br.bytePos
        if (end + 2 > b.length) return None
        val crc = ((b(end) & 0xff) << 8) | (b(end + 1) & 0xff)
        if (crc != flacCrc16(b, start, end)) return None
        off = end + 2
        nFrames += 1
      }
      if (nFrames.toLong * bs != totalSamples) return None
      Some((rate, channels, bps, nFrames, totalSamples, pcmSum))
    } catch { case FlacEof => None }
  }

  /** LPC-subframe FLAC stream (bps 16): every frame is an LPC
    * subframe whose TARGET signal keeps the q148 ramp-plus-wiggle law
    *   s[i] = c0 + c1·i + d·(i mod 2)
    * with c0 = (seed·31 + f·17) mod 50 − 25,
    *      c1 = (seed·13 + f·7) mod 7 − 3,
    *      d  = (seed + f) mod 4,
    * so Σ samples = 4096·c0 + 8386560·c1 + 2048·d per channel per
    * frame stays SQL-replayable REGARDLESS of the predictor — the
    * encoder computes exact integer residuals against its quantized
    * predictor and the decoder's recurrence reconstructs the target
    * bit-for-bit. The predictor/residual-coding surface is swept
    * deterministically per frame:
    *  - LPC order o = 1 + (seed + f) mod 8   (1..8),
    *  - shift    p = 1 + (seed + f) mod 4    (1..4),
    *  - coefficients a₁ = 2^p + u, a_o = −u (u = 1 + (seed + 3f) mod 3)
    *    at precision 12 — near-unity-gain, so residuals stay small,
    *  - Rice method f mod 2 (4- vs 5-bit parameters), k = 7,
    *  - partition order (seed + f) mod 3 (1, 2 or 4 partitions),
    *  - frames with (seed + f) mod 5 = 0 store their LAST partition
    *    ESCAPED as raw 12-bit residuals. */
  def encodeFlacLpc(rateCode: Int, channels: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(FlacRates.contains(rateCode), s"rateCode $rateCode")
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(nFrames >= 1 && nFrames <= 127,
      s"nFrames $nFrames (single-byte UTF-8 frame numbers)")
    val bps = 16
    val bs = FlacBlockSize
    val rate = FlacRates(rateCode)
    val frames = (0 until nFrames).map { f =>
      val c0 = ((seed * 31 + f * 17) % 50 - 25).toInt
      val c1 = ((seed * 13 + f * 7) % 7 - 3).toInt
      val d = ((seed + f) % 4).toInt
      def s(i: Int): Int = c0 + c1 * i + d * (i % 2)
      val o = 1 + ((seed + f) % 8).toInt
      val p = 1 + ((seed + f) % 4).toInt
      val u = 1 + ((seed + 3 * f) % 3).toInt
      // a(0) multiplies s[i-1] ... a(o-1) multiplies s[i-o]
      val a = new Array[Int](o)
      a(0) = (1 << p) + (if (o > 1) u else 0)
      if (o > 1) a(o - 1) = -u
      def predict(i: Int): Int = {
        var acc = 0L
        var j = 0
        while (j < o) { acc += a(j).toLong * s(i - 1 - j); j += 1 }
        (acc >> p).toInt
      }
      val method = f % 2
      val kBits = 4 + method
      val k = 7
      val po = ((seed + f) % 3).toInt
      val nPart = 1 << po
      val escapeLast = (seed + f) % 5 == 0
      val bw = new FlacBitWriter(64 + channels * bs * 4)
      bw.writeBits(0xff, 8); bw.writeBits(0xf8, 8)
      bw.writeBits((12 << 4) | rateCode, 8)
      bw.writeBits(((channels - 1) << 4) | (4 << 1), 8)
      bw.writeBits(f.toLong, 8)
      bw.writeBits(flacCrc8(bw.bytes, 0, bw.byteLength).toLong, 8)
      (0 until channels).foreach { _ =>
        bw.writeBits(((0x20 | (o - 1)) << 1).toLong, 8) // LPC order o
        var i = 0
        while (i < o) { bw.writeBits(s(i).toLong & 0xffff, bps); i += 1 }
        bw.writeBits(11, 4) // precision 12 (stored as prec-1)
        bw.writeBits(p.toLong, 5) // non-negative shift
        a.foreach(c => bw.writeBits(c.toLong & 0xfff, 12))
        bw.writeBits(method.toLong, 2)
        bw.writeBits(po.toLong, 4)
        var part = 0
        i = o
        while (part < nPart) {
          val cnt = (bs >> po) - (if (part == 0) o else 0)
          val escaped = escapeLast && part == nPart - 1
          if (escaped) {
            bw.writeBits(((1 << kBits) - 1).toLong, kBits)
            bw.writeBits(12, 5) // raw 12-bit residuals
          } else bw.writeBits(k.toLong, kBits)
          var n = 0
          while (n < cnt) {
            val e = s(i) - predict(i)
            if (escaped) bw.writeBits(e.toLong & 0xfff, 12)
            else {
              val z = (e << 1) ^ (e >> 31) // zigzag fold
              bw.writeUnary(z >>> k)
              bw.writeBits((z & ((1 << k) - 1)).toLong, k)
            }
            i += 1
            n += 1
          }
          part += 1
        }
      }
      bw.alignByte()
      bw.writeBits(flacCrc16(bw.bytes, 0, bw.byteLength).toLong, 16)
      bw.toArray
    }
    val total = nFrames.toLong * bs
    val out = ByteBuffer.allocate(4 + 4 + 34 + frames.map(_.length).sum)
      .order(ByteOrder.BIG_ENDIAN)
    out.put("fLaC".getBytes("ASCII"))
    out.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(bs.toShort).putShort(bs.toShort)
    out.put(new Array[Byte](6))
    out.putLong((rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | total)
    out.put(new Array[Byte](16))
    frames.foreach(out.put)
    out.array()
  }

  /** Deterministic LPC fixture (see [[encodeFlacLpc]]): rate /
    * channels / frame count / per-frame predictor sweep closed-form
    * in id. */
  def flacLpcFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, encodeFlacLpc(8 + i % 3, 1 + i % 2, 2 + i % 4, i.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Stereo-decorrelated FLAC stream (2 channels, bps 16): frame `f`
    * cycles the channel assignment by `f mod 4` — independent,
    * left/side, right/side, mid/side (RFC 9639 §9.1.3) — over the
    * closed-form channel laws
    *   L[i] = (a0 + a1·i + da·(i mod 2)) · 2^w
    *   R[i] =  b0 + b1·i + db·(i mod 2)
    * with a0 = (seed·31 + f·17) mod 50 − 25, a1 = (seed·13 + f·7) mod 3 − 1,
    *      da = (seed + f) mod 4, b0 = (seed·19 + f·23) mod 50 − 25,
    *      b1 = (seed·11 + f·5) mod 7 − 3, db = (seed + 2f) mod 4, and
    *      w = (seed + f) mod 3 on the independent and left/side frames
    *      (0 otherwise) — `w` wasted bits are ENCODED on the first
    * subframe of those frames (samples written >> w at bps − w, flag +
    * unary k−1 in the subframe header). Σ(L+R) per frame is
    *   2^w·(4096·a0 + 8386560·a1 + 2048·da)
    *      + 4096·b0 + 8386560·b1 + 2048·db,
    * SQL-replayable. Subframes are FIXED order 2 (k=5 Rice), except
    * the second subframe goes VERBATIM when (seed + f) mod 5 = 0 —
    * exercising 17-bit verbatim side channels. */
  def encodeFlacStereo(rateCode: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(FlacRates.contains(rateCode), s"rateCode $rateCode")
    require(nFrames >= 1 && nFrames <= 127,
      s"nFrames $nFrames (single-byte UTF-8 frame numbers)")
    val bps = 16
    val bs = FlacBlockSize
    val rate = FlacRates(rateCode)
    val frames = (0 until nFrames).map { f =>
      val a0 = ((seed * 31 + f * 17) % 50 - 25).toInt
      val a1 = ((seed * 13 + f * 7) % 3 - 1).toInt
      val da = ((seed + f) % 4).toInt
      val b0 = ((seed * 19 + f * 23) % 50 - 25).toInt
      val b1 = ((seed * 11 + f * 5) % 7 - 3).toInt
      val db = ((seed + 2 * f) % 4).toInt
      val mode = f % 4 // 0 indep, 1 left/side, 2 right/side, 3 mid/side
      val w = if (mode <= 1) ((seed + f) % 3).toInt else 0
      def L(i: Int): Int = (a0 + a1 * i + da * (i % 2)) << w
      def R(i: Int): Int = b0 + b1 * i + db * (i % 2)
      val chAssign = if (mode == 0) 1 else 7 + mode
      val verb1 = (seed + f) % 5 == 0
      val bw = new FlacBitWriter(64 + 2 * bs * 4)
      bw.writeBits(0xff, 8); bw.writeBits(0xf8, 8)
      bw.writeBits((12 << 4) | rateCode, 8)
      bw.writeBits((chAssign << 4) | (4 << 1), 8)
      bw.writeBits(f.toLong, 8)
      bw.writeBits(flacCrc8(bw.bytes, 0, bw.byteLength).toLong, 8)
      // subframe payloads per assignment; the side channel is L-R
      val (v0, e0, w0) = mode match {
        case 0 => (Array.tabulate(bs)(L), bps, w)
        case 1 => (Array.tabulate(bs)(L), bps, w)
        case 2 => (Array.tabulate(bs)(i => L(i) - R(i)), bps + 1, 0)
        case _ => (Array.tabulate(bs)(i => (L(i) + R(i)) >> 1), bps, 0)
      }
      val (v1, e1) = mode match {
        case 0 | 2 => (Array.tabulate(bs)(R), bps)
        case _ => (Array.tabulate(bs)(i => L(i) - R(i)), bps + 1)
      }
      def writeSub(vals: Array[Int], effBps: Int, wasted: Int,
          verbatim: Boolean): Unit = {
        val vs = if (wasted > 0) vals.map(_ >> wasted) else vals
        val b2 = effBps - wasted
        val mask = (1L << b2) - 1
        val typ = if (verbatim) 1 else 10 // VERBATIM | FIXED order 2
        bw.writeBits(((typ << 1) | (if (wasted > 0) 1 else 0)).toLong, 8)
        if (wasted > 0) bw.writeUnary(wasted - 1)
        if (verbatim) vs.foreach(x => bw.writeBits(x.toLong & mask, b2))
        else {
          bw.writeBits(vs(0).toLong & mask, b2)
          bw.writeBits(vs(1).toLong & mask, b2)
          bw.writeBits(0, 2) // 4-bit Rice
          bw.writeBits(0, 4) // partition order 0
          val k = 5
          bw.writeBits(k.toLong, 4)
          var i = 2
          while (i < bs) {
            val e = vs(i) - 2 * vs(i - 1) + vs(i - 2)
            val z = (e << 1) ^ (e >> 31)
            bw.writeUnary(z >>> k)
            bw.writeBits((z & ((1 << k) - 1)).toLong, k)
            i += 1
          }
        }
      }
      writeSub(v0, e0, w0, verbatim = false)
      writeSub(v1, e1, 0, verbatim = verb1)
      bw.alignByte()
      bw.writeBits(flacCrc16(bw.bytes, 0, bw.byteLength).toLong, 16)
      bw.toArray
    }
    val total = nFrames.toLong * bs
    val out = ByteBuffer.allocate(4 + 4 + 34 + frames.map(_.length).sum)
      .order(ByteOrder.BIG_ENDIAN)
    out.put("fLaC".getBytes("ASCII"))
    out.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(bs.toShort).putShort(bs.toShort)
    out.put(new Array[Byte](6))
    out.putLong((rate.toLong << 44) | (1L << 41) | ((bps - 1).toLong << 36) |
      total)
    out.put(new Array[Byte](16))
    frames.foreach(out.put)
    out.array()
  }

  /** Deterministic stereo-decorrelation fixture (see
    * [[encodeFlacStereo]]): rate / frame count / per-frame channel
    * assignment and both channel laws closed-form in id. */
  def flacStereoFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, encodeFlacStereo(8 + i % 3, 2 + i % 4, i.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic fixed-predictor fixture (see [[encodeFlacPred]]):
    * rate/channels/frame-count/per-frame type and samples closed-form
    * in id. */
  def flacPredFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, encodeFlacPred(8 + i % 3, 1 + i % 2, 2 + i % 4, i.toLong))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Bit-exact PCM decode as a DataFrame op (same surface as
    * [[decodeFlac]], value_sum = sum over every decoded sample). */
  def decodeFlacPcm(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("bps", IntegerType, true),
      StructField("n_frames", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        parseFlacPcm(r.getAs[Array[Byte]](1)) match {
          case Some((rate, ch, bps, nf, total, sum)) =>
            Row(r.getLong(0), rate, ch, bps, nf, total, sum, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // MP4 / M4A — REAL ISO-BMFF (MPEG-4 Part 12) box walk: the
  // `moov` metadata catalog pass a 100 TB media library needs. The
  // walk parses the actual container protocol — [size][fourcc]
  // nesting, FullBox version/flags, mvhd/mdhd timescales, the stsd
  // sample-entry layout with its 16.16 fixed-point sample rate — and
  // requires byte-exact landing at every level. Audio/video PAYLOAD
  // decode (mdat) stays out of scope, exactly like a real catalog
  // scan; fixtures carry an empty mdat.

  private def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length > 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ASCII")

  /** Walk one box level [from, until), invoking f(type, payloadFrom,
    * payloadUntil); returns false on any structural violation
    * (truncated box, size < 8, not landing exactly on `until`).
    * 64-bit largesize and size-0 (to-EOF) boxes are rejected — the
    * fixtures never emit them and a catalog pass flags, not guesses. */
  private def walkBoxes(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var off = from
    while (off < until) {
      if (off + 8 > until) return false
      val size = be32(b, off)
      if (size < 8 || off + size > until) return false
      if (!f(fourcc(b, off + 4), off + 8, off + size.toInt)) return false
      off += size.toInt
    }
    off == until
  }

  /** Minimal-but-conforming M4A: ftyp + moov{mvhd, trak{mdia{mdhd,
    * hdlr(soun), minf{stbl{stsd{mp4a}}}}}} + empty mdat. Movie
    * timescale 1000; the audio track's mdhd timescale is the sample
    * rate (the iTunes/ffmpeg convention). */
  def encodeMp4(rate: Int, channels: Int, nSamples: Long): Array[Byte] = {
    require(channels >= 1 && channels <= 2 && rate > 0 && nSamples > 0)
    val durMovieMs = nSamples * 1000 / rate
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + payload.length).put(typ.getBytes("ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = ByteBuffer.allocate(8)
      bb.put("M4A ".getBytes("ASCII")).putInt(0)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = ByteBuffer.allocate(100).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0)                 // version 0 + flags
      bb.putInt(0).putInt(0)       // creation/modification
      bb.putInt(1000)              // movie timescale: ms
      bb.putInt(durMovieMs.toInt)  // duration in movie units
      bb.putInt(0x00010000)        // rate 1.0 (16.16)
      bb.putShort(0x0100.toShort)  // volume 1.0 (8.8)
      bb.position(bb.position() + 2 + 8) // reserved
      // unity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
      bb.putInt(0).putInt(0x00010000).putInt(0)
      bb.putInt(0).putInt(0).putInt(0x40000000)
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(2)                 // next_track_ID
      bb.array()
    })
    val mdhd = box("mdhd", {
      val bb = ByteBuffer.allocate(24).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0).putInt(0).putInt(0)
      bb.putInt(rate)              // media timescale: the sample rate
      bb.putInt(nSamples.toInt)    // duration in media units
      bb.putShort(0x55c4.toShort)  // language 'und' packed 5-bit
      bb.putShort(0)
      bb.array()
    })
    val hdlr = box("hdlr", {
      val bb = ByteBuffer.allocate(25)
      bb.putInt(0).putInt(0).put("soun".getBytes("ASCII"))
      bb.position(bb.position() + 12) // reserved
      bb.put(0.toByte)                // empty name
      bb.array()
    })
    val mp4aEntry = {
      val bb = ByteBuffer.allocate(36).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(36).put("mp4a".getBytes("ASCII"))
      bb.position(bb.position() + 6)  // reserved
      bb.putShort(1)                  // data_reference_index
      bb.position(bb.position() + 8)  // reserved
      bb.putShort(channels.toShort).putShort(16) // channelcount, samplesize
      bb.putShort(0).putShort(0)      // pre_defined, reserved
      bb.putInt(rate << 16)           // samplerate, 16.16 fixed point
      bb.array()
    }
    val stsd = box("stsd", {
      val bb = ByteBuffer.allocate(8 + mp4aEntry.length).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(0).putInt(1).put(mp4aEntry)
      bb.array()
    })
    val minf = box("minf", box("stbl", stsd))
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", Array.emptyByteArray)
    ftyp ++ moov ++ mdat
  }

  /** REAL moov walk. Returns (brand, movieTimescale, movieDuration,
    * nTracks, audioCodec, audioRate, audioChannels, mediaDuration) —
    * the catalog surface — or None on any structural violation. */
  private[graft] def parseMp4(b: Array[Byte])
      : Option[(String, Int, Long, Int, String, Int, Int, Long)] = {
    if (!isMp4(b)) return None
    var brand: String = null
    var movieTs = -1; var movieDur = -1L
    var nTracks = 0
    var codec: String = null; var aRate = -1; var aCh = -1
    var mediaDur = -1L
    var sawMoov = false
    val ok = walkBoxes(b, 0, b.length) {
      case ("ftyp", from, until) =>
        if (until - from < 8) false else { brand = fourcc(b, from); true }
      case ("moov", mFrom, mUntil) =>
        sawMoov = true
        walkBoxes(b, mFrom, mUntil) {
          case ("mvhd", f, u) =>
            if (u - f < 100 || b(f) != 0) false // version 0 only
            else { movieTs = be32(b, f + 12).toInt; movieDur = be32(b, f + 16); true }
          case ("trak", tF, tU) =>
            // ADVICE r10: all track fields are collected PER-TRAK and
            // committed to the file-level catalog only for the trak
            // whose hdlr is 'soun' — a multi-track file can no longer
            // mix one trak's codec with another's rate/duration. A
            // second audio trak rejects (strict-subset posture).
            nTracks += 1
            var tRate = -1; var tDur = -1L
            var tCodec: String = null; var tCh = -1
            var tHandler: String = null
            val tOk = walkBoxes(b, tF, tU) {
              case ("mdia", dF, dU) => walkBoxes(b, dF, dU) {
                case ("mdhd", f, u) =>
                  if (u - f < 24 || b(f) != 0) false
                  else { tRate = be32(b, f + 12).toInt; tDur = be32(b, f + 16); true }
                case ("hdlr", f, u) =>
                  if (u - f < 12) false
                  else { tHandler = fourcc(b, f + 8); true }
                case ("minf", f, u) => walkBoxes(b, f, u) {
                  case ("stbl", sF, sU) => walkBoxes(b, sF, sU) {
                    case ("stsd", eF, eU) =>
                      if (eU - eF < 16 || be32(b, eF + 4) < 1) false
                      else {
                        val entry = eF + 8
                        val esize = be32(b, entry)
                        if (esize < 36 || entry + esize > eU) false
                        else {
                          tCodec = fourcc(b, entry + 4)
                          tCh = ((b(entry + 24) & 0xff) << 8) | (b(entry + 25) & 0xff)
                          // sample rate is 16.16 fixed point; must
                          // agree with THIS trak's mdhd timescale
                          if ((be32(b, entry + 32) & 0xffff) != 0) false
                          else {
                            if ((be32(b, entry + 32) >>> 16).toInt != tRate) false
                            else true
                          }
                        }
                      }
                    case _ => true
                  }
                  case _ => true
                }
                case _ => true
              }
              case _ => true
            }
            if (!tOk) false
            else if (tHandler == "soun") {
              if (codec != null) false // second audio trak
              else {
                codec = tCodec; aRate = tRate; aCh = tCh; mediaDur = tDur
                true
              }
            } else true
          case _ => true // udta, iods… skipped
        }
      case ("mdat", _, _) => true
      case _ => true // free, skip…
    }
    if (!ok || !sawMoov || brand == null || movieTs <= 0 || codec == null ||
      aRate <= 0 || aCh <= 0) None
    else Some((brand, movieTs, movieDur, nTracks, codec, aRate, aCh, mediaDur))
  }

  /** Deterministic M4A fixture: rate/channels/sample-count closed-form
    * in id. */
  def mp4Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rate = Array(32000, 44100, 48000)(i % 3)
      Row(i.toLong, encodeMp4(rate, 1 + i % 2, (rate.toLong * (2 + i % 9)) / 2))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** moov-walk catalog pass as a DataFrame op (one row per blob,
    * integer outputs, per-partition, no shuffle). */
  def decodeMp4(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("brand", StringType, true),
      StructField("codec", StringType, true),
      StructField("movie_timescale", IntegerType, true),
      StructField("movie_duration", LongType, true),
      StructField("n_tracks", IntegerType, true),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("media_duration", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        parseMp4(r.getAs[Array[Byte]](1)) match {
          case Some((brand, ts, dur, nt, codec, rate, ch, mDur)) =>
            Row(r.getLong(0), brand, codec, ts, dur, nt, rate, ch, mDur, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // Animated GIF — REAL multi-frame decode via the JDK's ImageIO
  // (GIF89a): frame count, per-frame pixel decode, and per-frame
  // delay from the GraphicControlExtension metadata tree. This makes
  // the video-style frame-sampling path real on an actual format —
  // fixtures write TYPE_BYTE_INDEXED images over a fixed 256-gray
  // palette, so the palette-indexed storage round-trips pixels
  // EXACTLY (no quantizer in the loop) and oracles can replay sums
  // closed-form.

  private def isGif(b: Array[Byte]): Boolean =
    b != null && b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Animated GIF with explicit per-frame delays (centiseconds) and
    * 8-bit gray pixels; `pixels(f)(y*width + x)` row-major. */
  def encodeGif(width: Int, height: Int, pixels: Seq[Array[Byte]],
      delaysCs: Seq[Int]): Array[Byte] = {
    require(pixels.nonEmpty && pixels.length == delaysCs.length)
    require(pixels.forall(_.length == width * height))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      pixels.zip(delaysCs).foreach { case (px, delay) =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        img.getRaster.setDataElements(0, 0, width, height, px)
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img),
          writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = {
          val kids = tree.getElementsByTagName("GraphicControlExtension")
          if (kids.getLength > 0)
            kids.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode(
              "GraphicControlExtension")
            tree.appendChild(n); n
          }
        }
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delay.toString)
        meta.setFromTree(fmt, tree)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** REAL GIF multi-frame decode: (width, height, nFrames,
    * pixelSum over every frame's gray samples, totalDelayCs). None
    * on anything ImageIO rejects or on inconsistent frame dims. */
  private[graft] def parseGif(b: Array[Byte])
      : Option[(Int, Int, Int, Long, Long)] = {
    if (!isGif(b)) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        if (n < 1) return None
        var w = -1; var h = -1
        var pixelSum = 0L; var delaySum = 0L
        var f = 0
        while (f < n) {
          val img = r.read(f)
          if (f == 0) { w = img.getWidth; h = img.getHeight }
          else if (img.getWidth != w || img.getHeight != h) return None
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { pixelSum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          val fmt = "javax_imageio_gif_image_1.0"
          val tree = r.getImageMetadata(f).getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = tree.getElementsByTagName("GraphicControlExtension")
          if (gce.getLength > 0)
            delaySum += gce.item(0)
              .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              .getAttribute("delayTime").toLong
          f += 1
        }
        Some((w, h, n, pixelSum, delaySum))
      } finally r.dispose()
    } catch { case _: Exception => None } finally iis.close()
  }

  /** Deterministic animated-GIF fixture: dims 8×6, frame count,
    * pixels and delays closed-form in id. */
  def gifFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nf = 2 + i % 5
      val px = (0 until nf).map { f =>
        Array.tabulate[Byte](8 * 6) { p =>
          val x = p % 8; val y = p / 8
          ((i * 7 + f * 13 + x * 3 + y) % 256).toByte
        }
      }
      val delays = (0 until nf).map(f => 5 + (i + f) % 10)
      Row(i.toLong, encodeGif(8, 6, px, delays))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** GIF catalog pass as a DataFrame op (integer outputs, one row per
    * blob, per-partition, no shuffle). */
  def decodeGif(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("n_frames", IntegerType, true),
      StructField("pixel_sum", LongType, true),
      StructField("total_delay_cs", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        parseGif(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, nf, ps, ds)) =>
            Row(r.getLong(0), w, h, nf, ps, ds, true)
          case None => Row(r.getLong(0), null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ----------------------------------------------------------- AVI
  // REAL MJPEG-in-AVI video decode (RIFF AVI 1.0, the Microsoft "AVI
  // RIFF File Reference" layout): RIFF('AVI '){ LIST('hdrl'){ avih,
  // LIST('strl'){ strh('vids'/'MJPG'), strf(BITMAPINFOHEADER) } },
  // LIST('movi'){ '00dc' <JPEG> ... }, 'idx1' }. This closes the last
  // multimodal stub (reference catalogs video payloads it never
  // decodes — gcf-corima-parquet-converter main.py handles sensor
  // tables only): the container walk reuses the q60 WAV RIFF pattern,
  // each '00dc' chunk is a REAL JPEG decoded through the same ImageIO
  // path as q31/q146, and per-frame pixel content is verified.
  // Fixture frames are SOLID-GRAY JPEGs written at compression
  // quality 1.0: the scaled Annex-K quantization tables degenerate to
  // all-ones, a constant block is pure DC, and decode returns EXACTLY
  // the encoded gray at every pixel (spec-checked for all 256 values)
  // — so pixel sums are closed-form for the oracle, the q146 palette
  // trick transposed to the lossy codec.

  private def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length > 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Solid-gray JPEG via the JDK codec at EXPLICIT quality 1.0 (the
    * exact-round-trip operating point — see the AVI section note). */
  def encodeJpegGray(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(gray >= 0 && gray <= 255)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Minimal-but-conforming MJPEG AVI: one 'vids' stream at
    * `rate` fps (scale 1), one solid-gray JPEG frame per entry of
    * `grays`, plus the idx1 index. All sizes little-endian; odd-sized
    * frame chunks get the RIFF pad byte. */
  def encodeAvi(width: Int, height: Int, grays: Seq[Int], rate: Int): Array[Byte] = {
    require(grays.nonEmpty && rate > 0)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length % 2
      val bb = ByteBuffer.allocate(8 + payload.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ASCII") ++ payload)
    val frames = grays.map(encodeJpegGray(width, height, _))
    val maxFrame = frames.map(_.length).max
    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / rate)      // dwMicroSecPerFrame
        .putInt(0)                   // dwMaxBytesPerSec
        .putInt(0)                   // dwPaddingGranularity
        .putInt(0x10)                // dwFlags: AVIF_HASINDEX
        .putInt(frames.length)       // dwTotalFrames
        .putInt(0)                   // dwInitialFrames
        .putInt(1)                   // dwStreams
        .putInt(maxFrame)            // dwSuggestedBufferSize
        .putInt(width).putInt(height)
      bb.array()                     // + 16 reserved zero bytes
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("ASCII")).put("MJPG".getBytes("ASCII"))
        .putInt(0)                   // dwFlags
        .putShort(0).putShort(0)     // priority, language
        .putInt(0)                   // dwInitialFrames
        .putInt(1)                   // dwScale
        .putInt(rate)                // dwRate → fps = rate/scale
        .putInt(0)                   // dwStart
        .putInt(frames.length)       // dwLength (frames)
        .putInt(maxFrame)            // dwSuggestedBufferSize
        .putInt(-1)                  // dwQuality (default)
        .putInt(0)                   // dwSampleSize (0: varying)
        .putShort(0).putShort(0)     // rcFrame left, top
        .putShort(width.toShort).putShort(height.toShort)
      bb.array()
    }
    val strf = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40)                  // biSize
        .putInt(width).putInt(height)
        .putShort(1)                 // biPlanes
        .putShort(24)                // biBitCount
        .put("MJPG".getBytes("ASCII")) // biCompression
        .putInt(width * height * 3)  // biSizeImage
        .putInt(0).putInt(0)         // ppm x/y
        .putInt(0).putInt(0)         // clrUsed / clrImportant
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks.flatten.toArray)
    val idx1 = {
      val bb = ByteBuffer.allocate(16 * frames.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      var off = 4 // from the 'movi' fourcc; first chunk right after it
      frameChunks.zip(frames).foreach { case (ck, f) =>
        bb.put("00dc".getBytes("ASCII"))
          .putInt(0x10)              // AVIIF_KEYFRAME
          .putInt(off).putInt(f.length)
        off += ck.length
      }
      chunk("idx1", bb.array())
    }
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi ++ idx1
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** REAL MJPEG-AVI decode: (width, height, nFrames, usecPerFrame,
    * durMs, pixelSum over every frame's R,G,B samples). None on any
    * structural violation: bad RIFF framing, missing/malformed
    * hdrl/avih/strh/strf, a non-'vids'/'MJPG' stream, a frame the
    * JPEG decoder rejects, frame dims differing from the declared
    * ones, or a frame count disagreeing between avih, strh and the
    * movi payload — a catalog pass flags, not guesses. */
  private[graft] def parseAvi(b: Array[Byte])
      : Option[(Int, Int, Int, Long, Long, Long)] = {
    if (!isAvi(b)) return None
    if (le32(b, 4) != b.length - 8) return None
    try {
      var width = -1; var height = -1
      var usecPerFrame = -1L; var totalFrames = -1L
      var scale = -1L; var rate = -1L; var strhLen = -1L
      var sawAvih = false; var sawStrh = false; var sawStrf = false
      var moviFrames = 0
      var pixelSum = 0L
      // walk one RIFF chunk level [from, until); payload offsets
      var ok = true
      def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Boolean = {
        var off = from
        while (off < until) {
          if (off + 8 > until) return false
          val size = le32(b, off + 4)
          if (off + 8 + size > until) return false
          f(fourcc(b, off), off + 8, off + 8 + size.toInt)
          off += 8 + size.toInt + (size.toInt % 2) // RIFF pad byte
        }
        true
      }
      def parseHdrl(from: Int, until: Int): Unit = {
        // NOTE: walk's callback mutates `ok`; evaluate walk FIRST
        // (ok &= walk(...) would read ok before the callback ran)
        val w = walk(from, until) {
          case ("avih", p, q) if q - p >= 40 =>
            sawAvih = true
            usecPerFrame = le32(b, p)
            totalFrames = le32(b, p + 16)
            if (le32(b, p + 24) != 1L) ok = false // exactly one stream
            width = le32(b, p + 32).toInt
            height = le32(b, p + 36).toInt
          case ("LIST", p, q) if q - p >= 4 && fourcc(b, p) == "strl" =>
            val sw = walk(p + 4, q) {
              case ("strh", sp, sq) if sq - sp >= 48 =>
                sawStrh = true
                if (fourcc(b, sp) != "vids" || fourcc(b, sp + 4) != "MJPG")
                  ok = false
                scale = le32(b, sp + 20)
                rate = le32(b, sp + 24)
                strhLen = le32(b, sp + 32)
              case ("strf", sp, sq) if sq - sp >= 40 =>
                sawStrf = true
                if (le32(b, sp + 4).toInt != width ||
                  le32(b, sp + 8).toInt != height ||
                  fourcc(b, sp + 16) != "MJPG") ok = false
              case _ => ()
            }
            if (!sw) ok = false
          case _ => ()
        }
        if (!w) ok = false
      }
      def parseMovi(from: Int, until: Int): Unit = {
        val w = walk(from, until) {
          case ("00dc", p, q) =>
            val frame = java.util.Arrays.copyOfRange(b, p, q)
            readImage(frame) match {
              case Some(img)
                  if img.getWidth == width && img.getHeight == height =>
                moviFrames += 1
                var y = 0
                while (y < height) {
                  var x = 0
                  while (x < width) {
                    val rgb = img.getRGB(x, y)
                    pixelSum += ((rgb >>> 16) & 0xff) +
                      ((rgb >>> 8) & 0xff) + (rgb & 0xff)
                    x += 1
                  }
                  y += 1
                }
              case _ => ok = false
            }
          case _ => ok = false // movi may contain only video chunks here
        }
        if (!w) ok = false
      }
      var sawMovi = false
      val top = walk(12, b.length) {
        case ("LIST", p, q) if q - p >= 4 && fourcc(b, p) == "hdrl" =>
          parseHdrl(p + 4, q)
        case ("LIST", p, q) if q - p >= 4 && fourcc(b, p) == "movi" =>
          sawMovi = true; parseMovi(p + 4, q)
        case ("idx1", _, _) | ("JUNK", _, _) => ()
        case _ => ok = false
      }
      if (!top || !ok || !sawAvih || !sawStrh || !sawStrf || !sawMovi)
        return None
      if (width <= 0 || height <= 0 || rate <= 0 || scale <= 0) return None
      if (moviFrames.toLong != totalFrames || moviFrames.toLong != strhLen)
        return None
      val durMs = moviFrames.toLong * 1000L * scale / rate
      Some((width, height, moviFrames, usecPerFrame, durMs, pixelSum))
    } catch { case _: Exception => None }
  }

  /** Deterministic MJPEG-AVI fixture: dims, fps, frame count and
    * every frame's solid gray closed-form in id. */
  def aviFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val w = 12 + i % 8
      val h = 8 + i % 5
      val nf = 2 + i % 4
      val rate = 10 + i % 15
      val grays = (0 until nf).map(f => (i * 11 + f * 29) % 256)
      Row(i.toLong, encodeAvi(w, h, grays, rate))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** AVI catalog + frame-content pass as a DataFrame op (integer
    * outputs, one row per blob, per-partition, no shuffle). */
  def decodeAvi(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("n_frames", IntegerType, true),
      StructField("usec_per_frame", LongType, true),
      StructField("dur_ms", LongType, true),
      StructField("pixel_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        parseAvi(r.getAs[Array[Byte]](1)) match {
          case Some((w, h, nf, us, dm, ps)) =>
            Row(r.getLong(0), w, h, nf, us, dm, ps, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // MS-RLE8 video in AVI (BI_RLE8, biCompression = 1) — REAL
  // INTER-FRAME decode (q189). Microsoft RLE8 is the public,
  // fully-structural member of the inter-frame family: no tabulated
  // constants, no transforms — encoded runs, absolute literal
  // segments (word-padded), end-of-line / end-of-bitmap escapes, and
  // the DELTA escape (00 02 dx dy) that SKIPS pixels, leaving the
  // PREVIOUS frame's content in place. That skip is genuine
  // inter-frame state: frame N's output depends on the framebuffer
  // after frame N−1, which is exactly the statefulness the GRFT video
  // stub stood in for. Decode keeps one palette-index framebuffer per
  // stream and emits per-frame integer aggregates (pixels written
  // this frame, framebuffer index sum after it) plus the strf
  // palette's component sum — all closed-form for the oracle.
  // Strict: every run/absolute segment must fit its row, delta jumps
  // must stay in bounds, each frame must end with EOB exactly at its
  // chunk boundary, and header/stream/frame counts must agree.

  private[graft] final case class AviRle8Decoded(
      width: Int, height: Int, nFrames: Int, paletteSum: Long,
      frames: Seq[(Long, Long)]) // per frame: (nWritten, fbSum)

  private[graft] def parseAviRle8(b: Array[Byte]): Option[AviRle8Decoded] = {
    if (!isAvi(b)) return None
    if (le32(b, 4) != b.length - 8) return None
    try {
      var width = -1; var height = -1
      var totalFrames = -1L; var strhLen = -1L
      var sawAvih = false; var sawStrh = false; var sawStrf = false
      var paletteSum = -1L
      var ok = true
      def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Boolean = {
        var off = from
        while (off < until) {
          if (off + 8 > until) return false
          val size = le32(b, off + 4)
          if (off + 8 + size > until) return false
          f(fourcc(b, off), off + 8, off + 8 + size.toInt)
          off += 8 + size.toInt + (size.toInt % 2)
        }
        true
      }
      def parseHdrl(from: Int, until: Int): Unit = {
        // bind walk's result first — `ok &= walk(...)` reads ok
        // before the callback mutates it (the parseAvi gotcha)
        val w = walk(from, until) {
          case ("avih", p, q) if q - p >= 40 =>
            sawAvih = true
            totalFrames = le32(b, p + 16)
            if (le32(b, p + 24) != 1L) ok = false
            width = le32(b, p + 32).toInt
            height = le32(b, p + 36).toInt
          case ("LIST", p, q) if q - p >= 4 && fourcc(b, p) == "strl" =>
            val sw = walk(p + 4, q) {
              case ("strh", sp, sq) if sq - sp >= 48 =>
                sawStrh = true
                if (fourcc(b, sp) != "vids" || fourcc(b, sp + 4) != "MRLE")
                  ok = false
                strhLen = le32(b, sp + 32)
              case ("strf", sp, sq) if sq - sp >= 40 + 256 * 4 =>
                sawStrf = true
                // BITMAPINFOHEADER: dims must match avih; BI_RLE8 = 1,
                // 8 bpp, then the full 256-entry RGBQUAD palette
                if (le32(b, sp + 4).toInt != width ||
                  le32(b, sp + 8).toInt != height ||
                  le32(b, sp + 14) % 65536 != 8 || // biBitCount (u16)
                  le32(b, sp + 16) != 1L) ok = false
                else {
                  var s = 0L
                  var i = 0
                  while (i < 256) {
                    val o = sp + 40 + i * 4
                    s += (b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)
                    i += 1
                  }
                  paletteSum = s
                }
              case _ => ()
            }
            if (!sw) ok = false
          case _ => ()
        }
        if (!w) ok = false
      }
      // locate hdrl before movi so dims are known when frames decode
      var hdrlSpan: Option[(Int, Int)] = None
      var moviSpan: Option[(Int, Int)] = None
      val top = walk(12, b.length) {
        case ("LIST", p, q) if q - p >= 4 && fourcc(b, p) == "hdrl" =>
          hdrlSpan = Some((p + 4, q))
        case ("LIST", p, q) if q - p >= 4 && fourcc(b, p) == "movi" =>
          moviSpan = Some((p + 4, q))
        case ("idx1", _, _) | ("JUNK", _, _) => ()
        case _ => ok = false
      }
      if (!top || !ok || hdrlSpan.isEmpty || moviSpan.isEmpty) return None
      hdrlSpan.foreach { case (p, q) => parseHdrl(p, q) }
      if (!ok || !sawAvih || !sawStrh || !sawStrf) return None
      if (width <= 0 || width > 255 || height <= 0 || paletteSum < 0)
        return None
      // --- frame decode: persistent framebuffer of palette indices ---
      val fb = new Array[Int](width * height)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def decodeFrame(p: Int, q: Int): Boolean = {
        var off = p
        var x = 0; var y = 0
        var written = 0L
        var done = false
        def put(v: Int): Boolean = {
          if (x >= width || y >= height) return false
          fb(y * width + x) = v
          x += 1; written += 1
          true
        }
        while (!done) {
          if (off + 2 > q) return false
          val c = b(off) & 0xff; val v = b(off + 1) & 0xff
          off += 2
          if (c > 0) {
            var i = 0
            while (i < c) { if (!put(v)) return false; i += 1 }
          } else v match {
            case 0 => x = 0; y += 1                 // end of line
            case 1 => done = true                   // end of bitmap
            case 2 =>                               // delta: skip dx, dy
              if (off + 2 > q) return false
              x += b(off) & 0xff; y += b(off + 1) & 0xff
              off += 2
              if (x > width || y > height) return false
            case n =>                               // absolute: n literals
              if (off + n > q) return false
              var i = 0
              while (i < n) { if (!put(b(off + i) & 0xff)) return false; i += 1 }
              off += n + (n % 2)                    // word padding
          }
        }
        if (off != q) return false // EOB must land on the chunk end
        var s = 0L
        var i = 0
        while (i < fb.length) { s += fb(i); i += 1 }
        frames += ((written, s))
        true
      }
      val (mp, mq) = moviSpan.get
      val mw = walk(mp, mq) {
        case ("00dc", p, q) => if (!decodeFrame(p, q)) ok = false
        case _ => ok = false
      }
      if (!mw || !ok) return None
      if (frames.length.toLong != totalFrames ||
        frames.length.toLong != strhLen || frames.isEmpty) return None
      Some(AviRle8Decoded(width, height, frames.length, paletteSum,
        frames.toSeq))
    } catch { case _: Exception => None }
  }

  /** One RLE8 frame's encode-side description: opcodes are emitted
    * exactly as supplied — the decoder is the operator under test. */
  sealed trait Rle8Op
  object Rle8Op {
    final case class Run(count: Int, value: Int) extends Rle8Op
    final case class Abs(values: Seq[Int]) extends Rle8Op
    case object Eol extends Rle8Op
    final case class Delta(dx: Int, dy: Int) extends Rle8Op
  }

  /** Encode an MS-RLE8 AVI (fixture / test side): one 'vids'/'MRLE'
    * stream, BITMAPINFOHEADER with biCompression = BI_RLE8 and the
    * full 256-RGBQUAD palette, one 00dc chunk per frame from the
    * supplied opcode lists (EOB appended), idx1 marking frame 0 the
    * keyframe. */
  def encodeAviRle8(
      width: Int, height: Int, palette: Int => (Int, Int, Int),
      frameOps: Seq[Seq[Rle8Op]], rate: Int): Array[Byte] = {
    require(width > 0 && width <= 255 && height > 0 && frameOps.nonEmpty)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length % 2
      val bb = ByteBuffer.allocate(8 + payload.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ASCII") ++ payload)
    val frames = frameOps.map { ops =>
      val bos = new java.io.ByteArrayOutputStream()
      ops.foreach {
        case Rle8Op.Run(c, v) =>
          require(c >= 1 && c <= 255 && v >= 0 && v <= 255)
          bos.write(c); bos.write(v)
        case Rle8Op.Abs(vs) =>
          require(vs.length >= 3 && vs.length <= 255)
          bos.write(0); bos.write(vs.length)
          vs.foreach(v => bos.write(v & 0xff))
          if (vs.length % 2 == 1) bos.write(0)
        case Rle8Op.Eol => bos.write(0); bos.write(0)
        case Rle8Op.Delta(dx, dy) =>
          bos.write(0); bos.write(2); bos.write(dx); bos.write(dy)
      }
      bos.write(0); bos.write(1) // end of bitmap
      bos.toByteArray
    }
    val maxFrame = frames.map(_.length).max
    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000000 / rate).putInt(0).putInt(0)
        .putInt(0x10).putInt(frames.length).putInt(0).putInt(1)
        .putInt(maxFrame).putInt(width).putInt(height)
      bb.array()
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("ASCII")).put("MRLE".getBytes("ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(rate).putInt(0).putInt(frames.length)
        .putInt(maxFrame).putInt(-1).putInt(0)
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort)
      bb.array()
    }
    val strf = {
      val bb = ByteBuffer.allocate(40 + 256 * 4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(8)
        .putInt(1) // biCompression = BI_RLE8
        .putInt(0).putInt(0).putInt(0).putInt(256).putInt(0)
      (0 until 256).foreach { i =>
        val (r, g, bl) = palette(i)
        bb.put(bl.toByte).put(g.toByte).put(r.toByte).put(0.toByte)
      }
      bb.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks.flatten.toArray)
    val idx1 = {
      val bb = ByteBuffer.allocate(16 * frames.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      var off = 4
      frameChunks.zip(frames).zipWithIndex.foreach { case ((ck, f), i) =>
        bb.put("00dc".getBytes("ASCII"))
          .putInt(if (i == 0) 0x10 else 0) // only frame 0 is the keyframe
          .putInt(off).putInt(f.length)
        off += ck.length
      }
      chunk("idx1", bb.array())
    }
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi ++ idx1
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** Deterministic MS-RLE8 fixture — the laws the q189 oracle
    * replays. Keyframe: row y holds k(y) = (r + 3y) % 240; even rows
    * one full run, odd rows run + 5-literal absolute segment (odd
    * count → pad byte exercised) + run, so odd-row sums carry a +10
    * literal ramp. Delta frame f ≥ 1 jumps (delta escape, dy) to row
    * (7f + r) % h — rows distinct within a stream — and rewrites it
    * with u(f) = (r + 11f) % 240 as run + 6-literal absolute (even
    * count) + run (+15 ramp); every other pixel RETAINS the prior
    * frame's content through the skip, the inter-frame contract. */
  def aviRle8Fixture(spark: SparkSession, n: Int): DataFrame = {
    import Rle8Op._
    val rows = (0 until n).map { r =>
      val w = 16 + (r % 4) * 8
      val h = 8 + r % 5
      val nf = 2 + r % 4
      val rate = 8 + r % 10
      def k(y: Int): Int = (r + 3 * y) % 240
      val key: Seq[Rle8Op] = (0 until h).flatMap { y =>
        val v = k(y)
        val row: Seq[Rle8Op] =
          if (y % 2 == 0) Seq(Run(w, v))
          else Seq(Run(10, v), Abs((0 until 5).map(v + _)),
            Run(w - 15, v))
        row :+ Eol
      }
      val deltas: Seq[Seq[Rle8Op]] = (1 until nf).map { f =>
        val yf = (7 * f + r) % h
        val u = (r + 11 * f) % 240
        Seq(Delta(0, yf), Run(7, u), Abs((0 until 6).map(u + _)),
          Run(w - 13, u))
      }
      Row(r.toLong, encodeAviRle8(w, h,
        i => ((7 * i) % 256, (5 * i) % 256, (3 * i) % 256),
        key +: deltas, rate))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** MS-RLE8 decode as a DataFrame op: one row per FRAME (the
    * inter-frame state is the point — each row's fb_sum depends on
    * every frame before it), integer outputs, per-partition. */
  def decodeAviRle8(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("frame", IntegerType, true),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("n_written", LongType, true),
      StructField("fb_sum", LongType, true),
      StructField("palette_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseAviRle8(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) =>
            d.frames.zipWithIndex.map { case ((nw, fs), i) =>
              Row(r.getLong(0), i, d.width, d.height, nw, fs,
                d.paletteSum, true)
            }
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // Image perceptual hash (dHash) + near-dup pairs (q190): the image
  // member of the near-dup family (LAION-style image dedup). The
  // 64-bit difference hash is fully structural — decode (lossless
  // PNG path ⇒ exact), integer grayscale g = (r+g+b)/3, nearest-
  // neighbor downsample to a 9×8 grid at src = (idx·dim)/9 (resp /8,
  // integer division), bit (y·8+x) = 1 iff grid(x+1,y) > grid(x,y)
  // (ties → 0) — so the whole pipeline is integer-exact and the
  // oracle replays it closed-form. Pairing reuses the SimHash banded
  // pigeonhole machinery (Dedup.simhashNearDup): EXACT ≤ maxDist
  // retrieval whose join keys scale with the corpus — the image and
  // text near-dup paths share one blocking implementation, not two.

  /** The 9×8 grid walk shared by every container route. */
  private def dhashOf(w: Int, h: Int,
      rgbAt: (Int, Int) => Int): Option[(Long, Int, Int)] = {
    if (w < 9 || h < 8) return None
    val grid = Array.ofDim[Int](9, 8)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val rgb = rgbAt(gx * w / 9, gy * h / 8)
        grid(gx)(gy) = (((rgb >>> 16) & 0xff) + ((rgb >>> 8) & 0xff) +
          (rgb & 0xff)) / 3
        gx += 1
      }
      gy += 1
    }
    var fp = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(x + 1)(y) > grid(x)(y)) fp |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    Some((fp, w, h))
  }

  /** dHash of one image blob: (fingerprint, width, height). None for
    * undecodable bytes or images smaller than the 9×8 sample grid.
    * Routes RIFF/WEBP through the spec-written VP8L decoder
    * ([[WebpLake.parseVp8l]] — ImageIO has no WebP support) and the
    * II/MM byte-order marks through the spec-written baseline TIFF
    * decoder
    * ([[TiffLake.parseTiff]] — authoritative over ImageIO's TIFF
    * plugin so the strictness posture is ours, not the JDK's); PNG /
    * BMP / GIF / JPEG go through ImageIO. */
  private[graft] def parseDHash(b: Array[Byte]): Option[(Long, Int, Int)] = {
    if (b == null || b.length < 8) return None
    if (b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P')
      WebpLake.parseVp8l(b).flatMap { img =>
        dhashOf(img.width, img.height,
          (x, y) => img.argb(y * img.width + x))
      }
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
      TiffLake.parseTiff(b).flatMap { img =>
        dhashOf(img.width, img.height,
          (x, y) => img.argb(y * img.width + x))
      }
    else
      readImage(b) match {
        case Some(img) =>
          dhashOf(img.getWidth, img.getHeight, (x, y) => img.getRGB(x, y))
        case _ => None
      }
  }

  /** dHash as a DataFrame op: (id, dhash, width, height, valid) —
    * per-partition, no shuffle; feed the `dhash` column to
    * [[graft.operators.Dedup.simhashNearDup]] for exact ≤ k pairs. */
  def imageDHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("dhash", LongType, true),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parseDHash(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((fp, w, h)) => Row(r.getLong(0), fp, w, h, true)
          case None => Row(r.getLong(0), null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Gray PNG whose 9×8 dHash equals exactly the supplied bit
    * function (bit 63 must be 0 — the fingerprint stays non-negative
    * so the oracle's BIGINT arithmetic never overflows): row pixels
    * walk v(0)=100, v(x+1) = v(x) + (bit(x,y) ? 1+((x+y)%3) : 0),
    * replicated s×s so the nearest-neighbor sample at (x·9s/9, y·8s/8)
    * = (x·s, y·s) recovers the law pixel at every scale. */
  def encodeDHashPng(bit: (Int, Int) => Boolean, s: Int): Array[Byte] = {
    require(s >= 1 && s <= 8)
    val img = new java.awt.image.BufferedImage(
      9 * s, 8 * s, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 100
      var x = 0
      while (x < 9) {
        val rgb = (v << 16) | (v << 8) | v
        var dy = 0
        while (dy < s) {
          var dx = 0
          while (dx < s) {
            img.setRGB(x * s + dx, y * s + dy, rgb)
            dx += 1
          }
          dy += 1
        }
        if (x < 8 && bit(x, y)) v += 1 + (x + y) % 3
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The [[encodeDHashPng]] law image as a 24-bpp bottom-up BMP
    * (BITMAPINFOHEADER, BI_RGB — hand-written so the pixel content
    * is bit-identical to the PNG twin's): the JDK's ImageIO decodes
    * BMP natively, so [[parseDHash]] fingerprints both formats
    * through the SAME grid walk — the format-invariance q212 pins. */
  def encodeDHashBmp(bit: (Int, Int) => Boolean, s: Int): Array[Byte] = {
    require(s >= 1 && s <= 8)
    val w = 9 * s
    val h = 8 * s
    val stride = ((w * 3 + 3) / 4) * 4
    val dataOff = 14 + 40
    val total = dataOff + stride * h
    val b = new Array[Byte](total)
    def le(v: Long, o: Int, n: Int): Unit =
      (0 until n).foreach(k => b(o + k) = ((v >> (8 * k)) & 0xff).toByte)
    b(0) = 'B'; b(1) = 'M'
    le(total.toLong, 2, 4)
    le(dataOff.toLong, 10, 4)
    le(40, 14, 4)
    le(w.toLong, 18, 4)
    le(h.toLong, 22, 4) // positive: bottom-up rows
    b(26) = 1
    b(28) = 24
    var y = 0
    while (y < 8) {
      var v = 100
      var x = 0
      while (x < 9) {
        var dy = 0
        while (dy < s) {
          var dx = 0
          while (dx < s) {
            val py = y * s + dy // image orientation
            val fy = h - 1 - py // bottom-up file row
            val o = dataOff + fy * stride + 3 * (x * s + dx)
            b(o) = v.toByte; b(o + 1) = v.toByte; b(o + 2) = v.toByte
            dx += 1
          }
          dy += 1
        }
        if (x < 8 && bit(x, y)) v += 1 + (x + y) % 3
        x += 1
      }
      y += 1
    }
    b
  }

  /** The [[encodeDHashPng]] law image as a VP8L lossless WebP (the
    * spec-written [[WebpLake]] encoder; subtract-green + row-copy
    * LZ77 — the wire shapes real lossless encoders emit), so
    * [[parseDHash]] fingerprints all three containers through the
    * SAME grid walk — the format-invariance q212 pins. */
  /** The law image as raw ARGB (shared by the WebP encoders). */
  private[graft] def dhashLawPixels(bit: (Int, Int) => Boolean,
      s: Int): Array[Int] = {
    require(s >= 1 && s <= 8)
    val w = 9 * s
    val px = new Array[Int](w * 8 * s)
    var y = 0
    while (y < 8) {
      var v = 100
      var x = 0
      while (x < 9) {
        val rgb = 0xff000000 | (v << 16) | (v << 8) | v
        var dy = 0
        while (dy < s) {
          var dx = 0
          while (dx < s) {
            px((y * s + dy) * w + x * s + dx) = rgb
            dx += 1
          }
          dy += 1
        }
        if (x < 8 && bit(x, y)) v += 1 + (x + y) % 3
        x += 1
      }
      y += 1
    }
    px
  }

  def encodeDHashWebp(bit: (Int, Int) => Boolean, s: Int): Array[Byte] =
    WebpLake.encodeVp8l(dhashLawPixels(bit, s), 9 * s, 8 * s,
      WebpLake.EncOpts(subtractGreen = true, rowCopy = true))

  private[graft] def dhashBit(r: Int)(x: Int, y: Int): Boolean = {
    val g = r / 3
    val m = r % 3
    val geff = g - (g % 2)
    val k = y * 8 + x
    def baseBit = (geff * 5 + k * 3) % 7 < 3
    def flipped = m match {
      case 1 => k == (3 * g) % 63 || k == (3 * g + 21) % 63
      case 2 => k == (3 * g + 7) % 63
      case _ => false
    }
    k < 63 && (baseBit ^ flipped)
  }

  /** q190's fixture routed across THREE containers — PNG / 24-bpp
    * BMP / VP8L WebP (a mixed-format image corpus) — by
    * (r + r/3) % 3, NOT r % 3: the law's Hamming-0 pairs are
    * (6g+m, 6g+3+m), whose containers under this routing are
    * (8g+m) % 3 and (8g+m+1) % 3 — provably ALWAYS different, so
    * every exact-duplicate pair is a cross-format one (same picture,
    * different container — what the format-invariance gate exists to
    * pin; a plain r % 3 would make them all same-format). The bit
    * laws are q190's exactly, so the near-dup pair set is identical. */
  def dhashMixedFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val enc: ((Int, Int) => Boolean, Int) => Array[Byte] =
        (r + r / 3) % 3 match {
          case 1 => encodeDHashBmp
          case 2 => encodeDHashWebp
          case _ => encodeDHashPng
        }
      Row(r.toLong, enc(dhashBit(r), 1 + r % 3))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** The law image as a baseline TIFF (the spec-written [[TiffLake]]
    * encoder; big-endian, LZW with the horizontal predictor, 3-row
    * strips — the wire shape real scanner output takes), extending
    * the format-invariance family to a fourth container. */
  def encodeDHashTiff(bit: (Int, Int) => Boolean, s: Int): Array[Byte] =
    TiffLake.encodeTiff(dhashLawPixels(bit, s), 9 * s, 8 * s,
      TiffLake.TiffOpts(bigEndian = true, compression = 5,
        predictor = 2, rowsPerStrip = 3))

  /** q190's fixture routed across FOUR containers — PNG / 24-bpp BMP
    * / VP8L WebP / baseline TIFF — by (r%6 + r/6) % 4: the law's
    * Hamming-0 pairs are (6k, 6k+3), whose routes are (k) % 4 and
    * (k+3) % 4 — always different, so every exact-duplicate pair is
    * a cross-format one. The bit laws are q190's exactly, so the
    * near-dup pair set is identical. */
  def dhashMixed4Fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val enc: ((Int, Int) => Boolean, Int) => Array[Byte] =
        (r % 6 + r / 6) % 4 match {
          case 1 => encodeDHashBmp
          case 2 => encodeDHashWebp
          case 3 => encodeDHashTiff
          case _ => encodeDHashPng
        }
      Row(r.toLong, enc(dhashBit(r), 1 + r % 3))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic near-dup image fixture — the laws the q190 oracle
    * replays. Groups of three images share a base bit pattern keyed
    * on the EVEN group index (so adjacent groups' bases are identical
    * — exact-duplicate fingerprints across DIFFERENT pixels/scales,
    * exercising the Hamming-0 path); members 1 and 2 flip 2 and 1
    * law bits. Scale s = 1 + id%3 varies within each group, so equal
    * fingerprints come from genuinely different images through the
    * real downsample. */
  def dhashFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      Row(r.toLong, encodeDHashPng(dhashBit(r), 1 + r % 3))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Header-only (width, height) of a PNG/JPEG — ImageReader probes
    * the stream metadata without decoding pixel data. */
  private def imageDims(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val fmt = r.getFormatName.toLowerCase match {
            case "jpg" => "jpeg"
            case f => f
          }
          Some((r.getWidth(0), r.getHeight(0), fmt))
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally iis.close()
  }

  /** Full pixel decode of a PNG/JPEG. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Deterministic fake encoder (fixture side). */
  def encode(mtype: Int, width: Int, height: Int, nframes: Int, seed: Long): Array[Byte] = {
    val payload = width * height * nframes
    val bb = ByteBuffer.allocate(4 + 1 + 12 + payload).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(mtype.toByte).putInt(width).putInt(height).putInt(nframes)
    var i = 0
    var x = seed
    while (i < payload) { // xorshift noise — deterministic "pixels"
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      bb.put((x & 0xff).toByte)
      i += 1
    }
    bb.array()
  }

  private def parseHeader(bytes: Array[Byte]): Row = {
    if (bytes == null) Row(null, null, null, null, null, null, false)
    else if (isWav(bytes)) parseWav(bytes) match {
      // audio maps onto the shared meta columns like the GRFT
      // container: width = sample_rate, height = channels,
      // nframes = samples per channel
      case Some((rate, ch, bits, _, dLen)) =>
        Row("audio", "wav", rate, ch, dLen / (ch * bits / 8), dLen, true)
      case None => Row("audio", "wav", null, null, null, null, false)
    }
    else if (isMp3Sync(bytes)) parseMp3(bytes) match {
      // width = sample_rate, height = bitrate_kbps, nframes = frames
      case Some((rate, kbps, nf)) =>
        Row("audio", "mp3", rate, kbps, nf, bytes.length, true)
      case None => Row("audio", "mp3", null, null, null, null, false)
    }
    else if (isFlac(bytes)) parseFlac(bytes) match {
      // width = sample_rate, height = channels (like wav);
      // nframes = FLAC frame count
      case Some((rate, ch, _, nf, _, _)) =>
        Row("audio", "flac", rate, ch, nf, bytes.length, true)
      case None => Row("audio", "flac", null, null, null, null, false)
    }
    else if (isMp4(bytes)) parseMp4(bytes) match {
      // width = sample_rate, height = channels, nframes = n_tracks
      case Some((_, _, _, nt, _, rate, ch, _)) =>
        Row("audio", "mp4a", rate, ch, nt, bytes.length, true)
      case None => Row("audio", "mp4a", null, null, null, null, false)
    }
    else if (isGif(bytes)) parseGif(bytes) match {
      case Some((w, h, nf, _, _)) =>
        Row(if (nf > 1) "video" else "image", "gif", w, h, nf,
          bytes.length, true)
      case None => Row("image", "gif", null, null, null, null, false)
    }
    else if (isPng(bytes) || isJpeg(bytes)) imageDims(bytes) match {
      case Some((w, h, fmt)) if w > 0 && h > 0 && w.toLong * h <= Int.MaxValue =>
        // payload_bytes for real images = pixel count (decoded size),
        // not the codec-dependent encoded length; >2^31-pixel images
        // fall through to invalid rather than overflowing the Int
        Row("image", fmt, w, h, 1, w * h, true)
      case _ => Row(null, null, null, null, null, null, false)
    }
    else if (isGrft(bytes)) {
      val bb = ByteBuffer.wrap(bytes, 4, 13).order(ByteOrder.LITTLE_ENDIAN)
      val mtype = bb.get() match {
        case 0 => "image"
        case 1 => "audio"
        case 2 => "video"
        case _ => "unknown"
      }
      val w = bb.getInt; val h = bb.getInt; val nf = bb.getInt
      // a truncated payload must flag invalid, not crash downstream
      // pixel/frame readers with out-of-bounds access
      val declared = w.toLong * h.toLong * math.max(nf, 1).toLong
      val ok = w > 0 && h > 0 && nf > 0 &&
        declared <= bytes.length.toLong - 17
      Row(mtype, "grft", w, h, nf, bytes.length - 17, ok)
    }
    else Row(null, null, null, null, null, null, false)
  }

  /** Header decode: binary column → typed metadata struct. Runs as a
    * per-partition map over the binary payloads (the shape a real
    * codec needs: whole blob visible to one task, no shuffle). */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField("id", LongType, false) +: metaSchema.fields.toIndexedSeq)
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val meta = parseHeader(r.getAs[Array[Byte]](1))
        Row.fromSeq(r.getLong(0) +: meta.toSeq)
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Per-blob channel/byte statistics (one feature row per blob,
    * partition-parallel — the batch shape a real embedding model
    * plugs into). Real PNG/JPEG blobs are pixel-decoded and measured
    * over their R,G,B channel samples; GRFT blobs over their payload
    * bytes. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("mean_byte", DoubleType, true),
      StructField("min_byte", IntegerType, true),
      StructField("max_byte", IntegerType, true)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val b = r.getAs[Array[Byte]](1)
        if (b == null) Row(r.getLong(0), null, null, null)
        else if (isWav(b)) parseWav(b) match {
          // audio features run in the SAMPLE domain (int16 signed /
          // uint8 re-centered to signed), interleaved stream order
          case Some((_, _, bits, dOff, dLen)) if dLen > 0 =>
            val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
            var s = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            if (bits == 16) {
              var i = dOff
              while (i < dOff + dLen) {
                val v: Int = bb.getShort(i)
                s += v; if (v < mn) mn = v; if (v > mx) mx = v
                i += 2
              }
              val cnt = dLen / 2
              Row(r.getLong(0), s.toDouble / cnt.toDouble, mn, mx)
            } else {
              var i = dOff
              while (i < dOff + dLen) {
                val v = (b(i) & 0xff) - 128
                s += v; if (v < mn) mn = v; if (v > mx) mx = v
                i += 1
              }
              Row(r.getLong(0), s.toDouble / dLen.toDouble, mn, mx)
            }
          case _ => Row(r.getLong(0), null, null, null)
        }
        else if (isPng(b) || isJpeg(b)) readImage(b) match {
          case Some(img) =>
            var s = 0L; var mn = 255; var mx = 0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                var c = 0
                while (c < 3) {
                  val v = (rgb >>> (c * 8)) & 0xff
                  s += v; if (v < mn) mn = v; if (v > mx) mx = v
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            val cnt = 3L * img.getWidth * img.getHeight
            Row(r.getLong(0), s.toDouble / cnt.toDouble, mn, mx)
          case None => Row(r.getLong(0), null, null, null)
        }
        else if (b.length > 17 && isGrft(b)) {
          var s = 0L; var mn = 255; var mx = 0; var i = 17
          while (i < b.length) {
            val v = b(i) & 0xff
            s += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row(r.getLong(0), s.toDouble / (b.length - 17), mn, mx)
        }
        else Row(r.getLong(0), null, null, null)
      })
    spark.createDataFrame(rows, schema)
  }

  /** Nearest-neighbor resize to (outW × outH). Real PNG/JPEG blobs
    * are pixel-decoded, resampled with an explicit deterministic NN
    * loop (no Graphics2D filtering ambiguity), and re-encoded as PNG
    * (lossless — the resampled pixels round-trip exactly). GRFT image
    * blobs resample their payload grid in-container. Non-image or
    * invalid blobs pass through null. */
  def resize(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("resized", BinaryType, true)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val b = r.getAs[Array[Byte]](1)
        if (b != null && (isPng(b) || isJpeg(b))) readImage(b) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < outH) {
              val sy = y * img.getHeight / outH
              var x = 0
              while (x < outW) {
                out.setRGB(x, y, img.getRGB(x * img.getWidth / outW, sy))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(r.getLong(0), bos.toByteArray)
          case None => Row(r.getLong(0), null)
        } else {
          val meta = parseHeader(b)
          if (!meta.getBoolean(6) || meta.getString(0) != "image")
            Row(r.getLong(0), null)
          else {
            val w = meta.getInt(2); val h = meta.getInt(3)
            val out = ByteBuffer.allocate(17 + outW * outH)
              .order(ByteOrder.LITTLE_ENDIAN)
            out.put(Magic).put(0.toByte).putInt(outW).putInt(outH).putInt(1)
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) {
                val sx = x * w / outW
                out.put(b(17 + sy * w + sx))
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), out.array())
          }
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Frame sampling for video-like blobs: every `stride`-th frame as
    * its own row (id, frame_idx, frame binary). The explode runs
    * inside the partition — no shuffle, output size bounded by
    * payload/stride. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("frame_idx", IntegerType, false),
      StructField("frame", BinaryType, true)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val b = r.getAs[Array[Byte]](1)
        if (b != null && (isPng(b) || isJpeg(b)))
          // a real still image is its own single frame
          Iterator.single(Row(r.getLong(0), 0, b))
        else if (b != null && isGif(b)) {
          // REAL multi-frame sampling: decode every stride-th GIF
          // frame and re-encode losslessly as PNG
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(b))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Iterator.empty
            else {
              val rd = readers.next()
              try {
                rd.setInput(iis)
                val n = rd.getNumImages(true)
                (0 until n by stride).map { f =>
                  val src = rd.read(f)
                  // resolve the GIF palette to true color BEFORE the
                  // PNG encode: round-tripping the indexed color
                  // model through the PNG writer is not
                  // palette-order-stable across JDK codecs
                  val rgb = new java.awt.image.BufferedImage(
                    src.getWidth, src.getHeight,
                    java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = rgb.getGraphics
                  try g.drawImage(src, 0, 0, null) finally g.dispose()
                  val out = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(rgb, "png", out)
                  Row(r.getLong(0), f, out.toByteArray)
                }.iterator
              } finally rd.dispose()
            }
          } catch { case _: Exception => Iterator.empty } finally iis.close()
        }
        else if (b != null && isWav(b))
          Iterator.empty // audio has samples, not frames
        else {
          val meta = parseHeader(b)
          if (!meta.getBoolean(6)) Iterator.empty
          else {
            val w = meta.getInt(2); val h = meta.getInt(3); val nf = meta.getInt(4)
            val frameBytes = w * h
            (0 until nf by stride).iterator.map { f =>
              val frame = java.util.Arrays.copyOfRange(b, 17 + f * frameBytes,
                math.min(17 + (f + 1) * frameBytes, b.length))
              Row(r.getLong(0), f, frame)
            }
          }
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Encode a solid-color image via the JDK's real codecs (fixture /
    * test side). PNG is lossless: decode returns exactly (r,g,b) at
    * every pixel. JPEG dims survive exactly; pixel values are
    * codec-rounded. */
  def encodeImage(fmt: String, width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Deterministic REAL-image fixture: solid-color PNG (even ids) /
    * JPEG (odd ids), dims and color closed-form in id — so decoded
    * metadata (and PNG channel means) are independently recomputable
    * in plain SQL. */
  def imageFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val fmt = if (i % 2 == 0) "png" else "jpg"
      val rgb = ((i % 256) << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
      Row(i.toLong, encodeImage(fmt, 16 + i % 9, 12 + i % 7, rgb))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Encode a REAL PCM16 WAV container (fixture / test side):
    * canonical 44-byte header + interleaved little-endian samples. */
  // ------------------------------------------------------------------
  // Audio energy segmentation (q191): the silence-trim / speech-
  // activity pass an audio-corpus curation pipeline runs before
  // anything else. Frames of `frameLen` samples per channel; a
  // frame's energy is the integer sum of squared samples across all
  // channels (8-bit PCM widened (u−128)·256 first, the standard
  // embedding into the 16-bit range, so one threshold serves both
  // widths); a frame is ACTIVE iff energy ≥ meanThreshold ·
  // frameLen · channels (a per-sample mean bound, so the knob is
  // width- and channel-independent). Consecutive active frames merge
  // into segments; a trailing partial frame is IGNORED (only full
  // frames are classified — the fixture pins this with a loud
  // partial tail that must not leak into any segment). All integer,
  // so the oracle replays energies and the gaps-and-islands merge
  // exactly.

  private[graft] final case class EnergySegment(
      seg: Int, startFrame: Long, nFrames: Long, energySum: Long)

  private[graft] def parseEnergySegments(
      b: Array[Byte], frameLen: Int, meanThreshold: Long)
      : Option[(Int, Int, Long, Seq[EnergySegment])] = {
    parseWav(b) match {
      case Some((rate, ch, bits, off, dLen)) =>
        val bytesPerSample = bits / 8
        val totalSamples = dLen / bytesPerSample // across channels
        val perFrame = frameLen * ch
        val nf = totalSamples / perFrame
        val thr = meanThreshold * perFrame
        def sample(i: Int): Long = {
          if (bits == 16) {
            val o = off + i * 2
            ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toLong
          } else ((b(off + i) & 0xff) - 128).toLong * 256
        }
        val segs = scala.collection.mutable.ArrayBuffer.empty[EnergySegment]
        var j = 0L
        var segStart = -1L
        var segEnergy = 0L
        while (j < nf) {
          var e = 0L
          var i = 0
          while (i < perFrame) {
            val s = sample((j * perFrame + i).toInt)
            e += s * s
            i += 1
          }
          if (e >= thr) {
            if (segStart < 0) { segStart = j; segEnergy = 0L }
            segEnergy += e
          } else if (segStart >= 0) {
            segs += EnergySegment(segs.length, segStart, j - segStart, segEnergy)
            segStart = -1L
          }
          j += 1
        }
        if (segStart >= 0)
          segs += EnergySegment(segs.length, segStart, nf - segStart, segEnergy)
        Some((rate, ch, nf, segs.toSeq))
      case None => None
    }
  }

  /** Energy segmentation as a DataFrame op: one row per SEGMENT
    * (id, seg, start_frame, n_frames, energy_sum) plus stream
    * context; per-partition, no shuffle. A valid WAV with no active
    * frames yields zero segment rows (not an invalid row). */
  def energySegments(
      df: DataFrame, idCol: String, binCol: String,
      frameLen: Int, meanThreshold: Long): DataFrame = {
    require(frameLen >= 1 && meanThreshold >= 0)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seg", IntegerType, true),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("n_frames", LongType, true),
      StructField("start_frame", LongType, true),
      StructField("seg_frames", LongType, true),
      StructField("energy_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        scala.util.Try(parseEnergySegments(
          r.getAs[Array[Byte]](1), frameLen, meanThreshold)).toOption
          .flatten match {
          case Some((rate, ch, nf, segs)) =>
            segs.map(s => Row(r.getLong(0), s.seg, rate, ch, nf,
              s.startFrame, s.nFrames, s.energySum, true))
          case None =>
            Seq(Row(r.getLong(0), null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic energy-segmentation fixture — the laws the q191
    * oracle replays. 16-bit PCM; frame j holds constant-magnitude
    * sign-alternating samples a(j)·(−1)^i with a(j) = ((r+3j) mod 5)
    * · 300, so exactly the k=0 frames (one in five) fall silent at a
    * 90 000 per-sample mean threshold; a LOUD partial tail of r mod 7
    * samples at 30 000 pins the only-full-frames contract. */
  def energyFixture(spark: SparkSession, n: Int, frameLen: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rate = 8000 + (r % 3) * 4000
      val ch = 1 + r % 2
      val nf = 20 + r % 10
      val tail = r % 7
      val samples = new Array[Short](nf * frameLen * ch + tail * ch)
      var j = 0
      while (j < nf) {
        val a = ((r + 3 * j) % 5) * 300
        var i = 0
        while (i < frameLen * ch) {
          samples(j * frameLen * ch + i) =
            (if (i % 2 == 0) a else -a).toShort
          i += 1
        }
        j += 1
      }
      var t = 0
      while (t < tail * ch) {
        samples(nf * frameLen * ch + t) = 30000
        t += 1
      }
      Row(r.toLong, encodeWav(rate, ch, samples))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  // ------------------------------------------------------------------
  // Rational audio resampling (q192): the 48 k→16 k / 44.1 k→16 k
  // pass every speech-training pipeline runs. Linear-interpolation
  // polyphase at the reduced ratio L/M (L = outRate/g, M = inRate/g):
  // output n sits at source position n·M/L = k + f/L and
  //   y[n] = rne( s[k]·(L−f) + s[k+1]·f,  L )
  // — exact integer arithmetic (round-half-even rational division),
  // no floats anywhere, so decimation (f ≡ 0), heavy rationals
  // (44.1 k→16 k ⇒ L/M = 160/441) and upsampling all replay exactly
  // in the oracle. n_out per channel = floor((n_in−1)·L/M) + 1 (the
  // last output never needs a sample past the end; s[k+1] is touched
  // only when f > 0). Anti-alias filtering is deliberately out of
  // scope — the operator is the INDEX/INTERPOLATION kernel whose
  // per-bit behavior a fixture can pin; a production low-pass is a
  // windowed-sinc float convolution with no exact oracle.

  private[graft] final case class Resampled(
      inRate: Int, outRate: Int, channels: Int, nIn: Long, nOut: Long,
      outSum: Long, outMin: Long, outMax: Long, outFirst: Long, outLast: Long)

  private[graft] def parseResample(
      b: Array[Byte], outRate: Int): Option[Resampled] = {
    if (outRate <= 0) return None
    parseWav(b) match {
      case Some((rate, ch, bits, off, dLen)) =>
        val bytesPerSample = bits / 8
        val nIn = dLen / bytesPerSample / ch
        if (nIn < 2) return None
        val g = java.math.BigInteger.valueOf(rate)
          .gcd(java.math.BigInteger.valueOf(outRate)).longValueExact()
        val l = outRate / g
        val m = rate / g
        def sample(i: Long, c: Int): Long = {
          val idx = (i * ch + c).toInt
          if (bits == 16) {
            val o = off + idx * 2
            ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toLong
          } else ((b(off + idx) & 0xff) - 128).toLong * 256
        }
        val nOut = (nIn - 1) * l / m + 1
        var sum = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var first = 0L
        var last = 0L
        var c = 0
        while (c < ch) {
          var n = 0L
          while (n < nOut) {
            val k = n * m / l
            val f = n * m % l
            val a =
              if (f == 0) sample(k, c) * l
              else sample(k, c) * (l - f) + sample(k + 1, c) * f
            val y = rne(a, l)
            sum += y
            if (y < mn) mn = y
            if (y > mx) mx = y
            if (c == 0 && n == 0) first = y
            if (c == 0 && n == nOut - 1) last = y
            n += 1
          }
          c += 1
        }
        Some(Resampled(rate, outRate, ch, nIn, nOut, sum, mn, mx,
          first, last))
      case None => None
    }
  }

  /** Resampling as a DataFrame op: per-stream integer aggregates of
    * the resampled signal (plus first/last output of channel 0, which
    * pin the boundary arithmetic); per-partition, no shuffle. */
  def resampleWav(
      df: DataFrame, idCol: String, binCol: String, outRate: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("in_rate", IntegerType, true),
      StructField("out_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("n_in", LongType, true),
      StructField("n_out", LongType, true),
      StructField("out_sum", LongType, true),
      StructField("out_min", LongType, true),
      StructField("out_max", LongType, true),
      StructField("out_first", LongType, true),
      StructField("out_last", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(parseResample(r.getAs[Array[Byte]](1), outRate))
          .toOption.flatten match {
          case Some(d) =>
            Row(r.getLong(0), d.inRate, d.outRate, d.channels, d.nIn,
              d.nOut, d.outSum, d.outMin, d.outMax, d.outFirst,
              d.outLast, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null,
              null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic resample fixture — the laws the q192 oracle
    * replays: rates 48 k / 44.1 k / 32 k (pure 1/3 decimation, the
    * 160/441 heavy rational, and 1/2), mono and stereo, sample
    * (i, c) of id r = ((r·31 + i·7 + c·13) mod 401) − 200. */
  def resampleFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val rate = Array(48000, 44100, 32000)(r % 3)
      val ch = 1 + r % 2
      val nIn = 400 + r % 50
      val samples = new Array[Short](nIn * ch)
      var i = 0
      while (i < nIn) {
        var c = 0
        while (c < ch) {
          samples(i * ch + c) =
            (((r * 31 + i * 7 + c * 13) % 401) - 200).toShort
          c += 1
        }
        i += 1
      }
      Row(r.toLong, encodeWav(rate, ch, samples))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort(_))
    bb.array()
  }

  /** Deterministic REAL-audio fixture: PCM16 WAV blobs whose rate,
    * channel count and every sample value are closed-form in id —
    * sample j (interleaved) of blob r is ((r·31 + j·7) mod 65536) −
    * 32768 — so decoded metadata AND sample statistics are
    * independently recomputable in plain SQL. */
  def audioFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val rate = 8000 + (i % 3) * 4000
      val ch = 1 + i % 2
      val frames = 50 + i % 20
      val samples = Array.tabulate(frames * ch)(j =>
        (((i.toLong * 31 + j.toLong * 7) % 65536) - 32768).toShort)
      Row(i.toLong, encodeWav(rate, ch, samples))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Heterogeneous AUDIO CATALOG dispatch — the "scan a mixed audio
    * lake" pass: sniff each blob's container, route it to the right
    * REAL parser, and emit one uniform metadata row. Formats: PCM
    * WAV (fmt 1), IMA-ADPCM WAV (fmt 0x11), G.711 WAV (fmt 6/7),
    * FLAC, MPEG-1 Layer III. `total_samples` reports each family's
    * parser convention (WAV families: samples × channels; FLAC:
    * frames × 4096 per channel; MP3: frames × 1152 per channel).
    * Unrecognized/malformed blobs flag valid=false, never throw. */
  /** One catalog row's dispatch (see [[audioCatalog]]); object-level
    * so the task closure stays free of enclosing-scope captures. */
  private[graft] def catalogRow(id: Long, b: Array[Byte]): Row = {
    val parsed: Option[(String, Int, Int, Long)] =
      if (isWav(b))
        parseWav(b).map { case (rate, ch, bits, _, dLen) =>
          ("pcm", rate, ch, dLen.toLong / (bits / 8))
        }.orElse(parseAdpcmWav(b).map { case (rate, ch, _, _, total, _, _, _) =>
          ("adpcm", rate, ch, total)
        }).orElse(parseG711Wav(b).map { case (codec, rate, ch, total, _, _, _) =>
          (codec, rate, ch, total)
        })
      else if (b != null && b.length > 4 && b(0) == 'f' && b(1) == 'L' &&
          b(2) == 'a' && b(3) == 'C')
        parseFlacPcm(b).map { case (rate, ch, _, _, total, _) =>
          ("flac", rate, ch, total)
        }
      else if (isMp3Sync(b))
        parseMp3(b).map { case (rate, _, frames) =>
          ("mp3", rate, 1, frames.toLong * 1152)
        }
      else None
    parsed match {
      case Some((codec, rate, ch, total)) =>
        Row(id, codec, rate, ch, total, true)
      case None => Row(id, null, null, null, null, false)
    }
  }

  def audioCatalog(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("codec", StringType, true),
      StructField("sample_rate", IntegerType, true),
      StructField("channels", IntegerType, true),
      StructField("total_samples", LongType, true),
      StructField("valid", BooleanType, false)))
    spark.createDataFrame(
      df.select(col(idCol).cast(LongType), col(binCol)).rdd
        .mapPartitions(_.map { r =>
          scala.util.Try(
            Multimodal.catalogRow(r.getLong(0), r.getAs[Array[Byte]](1)))
            .getOrElse(Row(r.getLong(0), null, null, null, null, false))
        }),
      outSchema)
  }

  /** Mixed-format audio fixture: id % 5 selects the family, each
    * family reusing its own query's closed-form parameter law. */
  def audioLakeFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val bytes = (i % 5) match {
        case 0 => // PCM WAV (q60 law)
          val ch = 1 + i % 2
          val frames = 50 + i % 20
          encodeWav(8000 + (i % 3) * 4000, ch,
            Array.tabulate(frames * ch)(j =>
              (((i.toLong * 31 + j.toLong * 7) % 65536) - 32768).toShort))
        case 1 => // IMA-ADPCM (q151 law)
          encodeAdpcmWav(8000 + (i % 3) * 4000, 1 + i % 2,
            1 + 8 * (2 + i % 3), 2 + i % 4,
            header = (b, c) => (((i * 31 + b * 17 + c * 29) % 4001) - 2000,
              (i * 7 + b * 3 + c * 5) % 89),
            nibble = (b, c, j) => (i * 13 + b * 7 + c * 3 + j * 5) % 16)
        case 2 => // G.711 (q152 law)
          val ch = 1 + i % 2
          val frames = 40 + i % 25
          encodeG711Wav(8000 * (1 + i % 2), ch, if (i % 2 == 0) 7 else 6,
            Array.tabulate[Byte](frames * ch)(j => ((i * 11 + j * 13) % 256).toByte))
        case 3 => // FLAC fixed-predictor (q148 law)
          encodeFlacPred(8 + i % 3, 1 + i % 2, 2 + i % 4, i.toLong)
        case _ => // MP3 CBR headers (q93 law)
          encodeMp3(1 + i % 14, i % 3, 10 + i % 30)
      }
      Row(i.toLong, bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Deterministic fixture table: mixed image/audio/video blobs. */
  def fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val mtype = i % 3
      val bytes = mtype match {
        case 0 => encode(0, 8 + i % 5, 6 + i % 4, 1, seed = 1000 + i)
        case 1 => encode(1, 16000, 2, 1, seed = 1000 + i) // 32 kB "PCM"
        case 2 => encode(2, 8, 8, 4 + i % 3, seed = 1000 + i)
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
