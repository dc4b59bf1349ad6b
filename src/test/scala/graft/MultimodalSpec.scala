package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decodeMeta: header roundtrip for image/audio/video, invalid flagged") {
    val fx = Multimodal.fixture(spark, 9)
    val meta = Multimodal.decodeMeta(fx, "id", "media").orderBy("id").collect()
    assert(meta.length == 9)
    assert(meta(0).getAs[String]("mtype") == "image")
    assert(meta(1).getAs[String]("mtype") == "audio")
    assert(meta(2).getAs[String]("mtype") == "video")
    assert(meta(0).getAs[Int]("width") == 8 && meta(0).getAs[Int]("height") == 6)
    assert(meta(0).getAs[Int]("payload_bytes") == 8 * 6)
    assert(meta.forall(_.getAs[Boolean]("valid")))

    // corrupt blob → invalid row, not a crash
    import spark.implicits._
    val bad = Seq((99L, "nonsense".getBytes)).toDF("id", "media")
    val badMeta = Multimodal.decodeMeta(bad, "id", "media").collect()(0)
    assert(!badMeta.getAs[Boolean]("valid"))
  }

  test("real PNG/JPEG: header-only dims, lossless PNG pixels, resize") {
    val fx = Multimodal.imageFixture(spark, 10)
    val meta = Multimodal.decodeMeta(fx, "id", "media").orderBy("id").collect()
    assert(meta.length == 10)
    meta.zipWithIndex.foreach { case (m, i) =>
      assert(m.getAs[String]("mtype") == "image")
      assert(m.getAs[String]("codec") == (if (i % 2 == 0) "png" else "jpeg"))
      assert(m.getAs[Int]("width") == 16 + i % 9, s"width of id $i")
      assert(m.getAs[Int]("height") == 12 + i % 7, s"height of id $i")
      assert(m.getAs[Boolean]("valid"))
    }
    // PNG is lossless: solid-color channel mean is exactly (r+g+b)/3
    val feats = Multimodal.extractFeatures(fx, "id", "media")
      .orderBy("id").collect()
    for (i <- 0 until 10 by 2) {
      val expected = (i % 256 + (i * 7) % 256 + (i * 13) % 256).toDouble / 3.0
      assert(feats(i).getAs[Double]("mean_byte") == expected, s"png mean id $i")
    }
    // JPEG pixels are codec-rounded but stay near the solid color
    for (i <- 1 until 10 by 2) {
      val expected = (i % 256 + (i * 7) % 256 + (i * 13) % 256).toDouble / 3.0
      assert(math.abs(feats(i).getAs[Double]("mean_byte") - expected) < 8.0,
        s"jpeg mean id $i")
    }
    // resize: real decode → NN resample → PNG re-encode, dims stick
    val rz = Multimodal.resize(fx, "id", "media", 5, 4).orderBy("id").collect()
    val rzMeta = Multimodal.decodeMeta(
      spark.createDataFrame(Seq((0L, rz(0).getAs[Array[Byte]]("resized"))))
        .toDF("id", "media"), "id", "media").collect()(0)
    assert(rzMeta.getAs[String]("codec") == "png")
    assert(rzMeta.getAs[Int]("width") == 5 && rzMeta.getAs[Int]("height") == 4)
    // a solid-color PNG resamples to the same solid color, losslessly
    val rzFeats = Multimodal.extractFeatures(
      spark.createDataFrame(Seq((0L, rz(0).getAs[Array[Byte]]("resized"))))
        .toDF("id", "media"), "id", "media").collect()(0)
    assert(rzFeats.getAs[Double]("mean_byte") == 0.0) // id 0 is black
  }

  test("real WAV: PCM16 metadata + sample stats, malformed containers flagged") {
    import spark.implicits._
    val samples = Array[Short](-3, 0, 7, 32767, -32768, 5)
    val good = Multimodal.encodeWav(44100, 2, samples)
    // truncated data chunk: declared size runs past the buffer
    val truncated = java.util.Arrays.copyOf(good, good.length - 4)
    // non-PCM audio format (2 = ADPCM) must be rejected, not decoded
    val adpcm = good.clone(); adpcm(20) = 2
    val df = Seq((0L, good), (1L, truncated), (2L, adpcm))
      .toDF("id", "media")
    val meta = Multimodal.decodeMeta(df, "id", "media").orderBy("id").collect()
    assert(meta(0).getAs[String]("mtype") == "audio")
    assert(meta(0).getAs[String]("codec") == "wav")
    assert(meta(0).getAs[Int]("width") == 44100, "sample_rate")
    assert(meta(0).getAs[Int]("height") == 2, "channels")
    assert(meta(0).getAs[Int]("nframes") == 3, "frames per channel")
    assert(meta(0).getAs[Boolean]("valid"))
    assert(!meta(1).getAs[Boolean]("valid"), "truncated must flag invalid")
    assert(!meta(2).getAs[Boolean]("valid"), "compressed fmt must flag invalid")
    val feats = Multimodal.extractFeatures(df, "id", "media")
      .orderBy("id").collect()
    assert(feats(0).getAs[Double]("mean_byte") == samples.map(_.toInt).sum.toDouble / 6)
    assert(feats(0).getAs[Int]("min_byte") == -32768)
    assert(feats(0).getAs[Int]("max_byte") == 32767)
    assert(feats(1).isNullAt(1) && feats(2).isNullAt(1))
    // audio has samples, not frames
    assert(Multimodal.sampleFrames(df.limit(1), "id", "media", 1).count() == 0)
  }

  test("IMA-ADPCM: decode matches a plain-Scala state machine; corruption matrix flags") {
    import spark.implicits._
    // independent reference: the textbook IMA recurrence, written
    // directly from the published tables (kept separate from the
    // operator's imaStep so a transcription slip can't self-verify)
    val stepTab = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
      25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
      118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
      408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
      1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val idxTab = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    def ref(i: Int): (Long, Int, Int, Long) = {
      val ch = 1 + i % 2; val spb = 1 + 8 * (2 + i % 3); val nb = 2 + i % 4
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      for (b <- 0 until nb; c <- 0 until ch) {
        var p = ((i * 31 + b * 17 + c * 29) % 4001) - 2000
        var ix = (i * 7 + b * 3 + c * 5) % 89
        sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
        for (j <- 0 until 8 * (2 + i % 3)) {
          val nib = (i * 13 + b * 7 + c * 3 + j * 5) % 16
          val st = stepTab(ix)
          var d = st >> 3
          if ((nib & 4) != 0) d += st
          if ((nib & 2) != 0) d += st >> 1
          if ((nib & 1) != 0) d += st >> 2
          p = if ((nib & 8) != 0) math.max(p - d, -32768)
              else math.min(p + d, 32767)
          ix = math.min(math.max(ix + idxTab(nib & 7), 0), 88)
          sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
        }
      }
      (sum, mn, mx, ch.toLong * nb * spb)
    }
    val got = Multimodal.decodeAdpcm(
      Multimodal.adpcmFixture(spark, 12), "id", "media").orderBy("id").collect()
    for (i <- 0 until 12) {
      val (sum, mn, mx, total) = ref(i)
      assert(got(i).getAs[Boolean]("valid"), s"id $i")
      assert(got(i).getAs[Long]("value_sum") == sum, s"sum id $i")
      assert(got(i).getAs[Int]("min_sample") == mn, s"min id $i")
      assert(got(i).getAs[Int]("max_sample") == mx, s"max id $i")
      assert(got(i).getAs[Long]("total_samples") == total, s"total id $i")
    }
    // corruption matrix: every malformed variant flags, never throws
    val good = Multimodal.adpcmFixture(spark, 1).collect()(0)
      .getAs[Array[Byte]]("media")
    val truncated = java.util.Arrays.copyOf(good, good.length - 3)
    val pcmTag = good.clone(); pcmTag(20) = 1       // PCM tag, ADPCM layout
    val badIdx = good.clone()
    // first block header's step index beyond 88 (data starts after
    // RIFF(12) + fmt(8+20) + fact(8+4) + data hdr(8) = 60; idx at +2)
    badIdx(62) = 120.toByte
    val badFact = good.clone(); badFact(48) = (badFact(48) + 1).toByte
    val garbage = Array.tabulate[Byte](64)(k => (k * 37).toByte)
    val df = Seq((0L, good), (1L, truncated), (2L, pcmTag), (3L, badIdx),
      (4L, badFact), (5L, garbage)).toDF("id", "media")
    val out = Multimodal.decodeAdpcm(df, "id", "media").orderBy("id").collect()
    assert(out(0).getAs[Boolean]("valid"))
    for (k <- 1 to 5)
      assert(!out(k).getAs[Boolean]("valid"), s"variant $k must flag")
  }

  test("G.711: μ-law/A-law decode matches the reference tables on all 256 bytes; corruption flags") {
    import spark.implicits._
    // independent reference: decode ALL 256 byte values per law
    // against the published G.711 segment-boundary spot values
    def uref(v: Int): Int = {
      val u = (~v) & 0xff
      val t = (((u & 0xf) << 3) + 132) << ((u >> 4) & 7)
      if ((u & 0x80) != 0) 132 - t else t - 132
    }
    def aref(v: Int): Int = {
      val a = v ^ 0x55
      val m = a & 0xf; val seg = (a >> 4) & 7
      val t = if (seg == 0) (m << 4) + 8
        else if (seg == 1) (m << 4) + 0x108
        else ((m << 4) + 0x108) << (seg - 1)
      if ((a & 0x80) != 0) t else -t
    }
    // spec anchors: μ-law 0xFF → 0 (+ silence), 0x7F → -0,
    // 0x80 → +32124 max magnitude; A-law 0xD5 → +8, 0x2A → -8
    assert(uref(0xff) == 0 && uref(0x80) == 32124 && uref(0x00) == -32124)
    assert(aref(0xd5) == 8 && aref(0x55) == -8 && aref(0xaa) == 32256)
    // one blob per law carrying every byte value once → decoder
    // sum/min/max must equal the reference aggregate over 0..255
    val allBytes = Array.tabulate[Byte](256)(_.toByte)
    val df = Seq(
      (0L, Multimodal.encodeG711Wav(8000, 1, 7, allBytes)),
      (1L, Multimodal.encodeG711Wav(8000, 1, 6, allBytes))).toDF("id", "media")
    val out = Multimodal.decodeG711(df, "id", "media").orderBy("id").collect()
    val us = (0 until 256).map(uref)
    val as = (0 until 256).map(aref)
    assert(out(0).getAs[String]("codec") == "ulaw")
    assert(out(0).getAs[Long]("value_sum") == us.map(_.toLong).sum)
    assert(out(0).getAs[Int]("min_sample") == us.min)
    assert(out(0).getAs[Int]("max_sample") == us.max)
    assert(out(1).getAs[String]("codec") == "alaw")
    assert(out(1).getAs[Long]("value_sum") == as.map(_.toLong).sum)
    assert(out(1).getAs[Int]("min_sample") == as.min)
    assert(out(1).getAs[Int]("max_sample") == as.max)
    // corruption matrix
    val good = Multimodal.encodeG711Wav(8000, 2, 7, allBytes)
    val truncated = java.util.Arrays.copyOf(good, good.length - 5)
    val pcmTag = good.clone(); pcmTag(20) = 1
    val badFact = good.clone(); badFact(46) = (badFact(46) + 1).toByte
    val cdf = Seq((0L, good), (1L, truncated), (2L, pcmTag), (3L, badFact))
      .toDF("id", "media")
    val cout = Multimodal.decodeG711(cdf, "id", "media").orderBy("id").collect()
    assert(cout(0).getAs[Boolean]("valid") &&
      cout(0).getAs[Long]("total_samples") == 256L)
    for (k <- 1 to 3) assert(!cout(k).getAs[Boolean]("valid"), s"variant $k")
    // the dedicated decoders ignore each other's formats
    assert(!Multimodal.decodeAdpcm(cdf.limit(1), "id", "media")
      .collect()(0).getAs[Boolean]("valid"))
  }

  test("MPEG-1 Layer I: payload decode matches a BigDecimal reference; corruption flags") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD, RoundingMode}
    // independent reference: replay the fixture laws through
    // BigDecimal HALF_EVEN division — none of the decoder's
    // shift/floorDiv/parity arithmetic is reused
    def ref(i: Int): (Long, Long, Long, Long) = {
      val mode = Seq(3, 0, 2)((i / 3) % 3)
      val ch = if (mode == 3) 1 else 2
      val nf = 2 + i % 4
      val nA = 5 + i % 4
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var n = 0L
      for (j <- 0 until nA; f <- 0 until nf; c <- 0 until ch; g <- 0 until 12) {
        val sb = (i + 3 * j) % 32
        val nb = 2 + (3 * i + 5 * j) % 14
        val e = (i + sb + 7 * c + 2 * f) % 21
        val code = (i * 13 + f * 3 + g * 7 + sb * 5 + c * 11) % (1 << nb)
        val m = 2 * code - (1 << nb) + 2
        val num = new JBD(m).multiply(new JBD(2).pow(36 - e))
        val den = new JBD((1L << nb) - 1).multiply(new JBD(2).pow(20))
        val q = num.divide(den, 0, RoundingMode.HALF_EVEN).longValueExact()
        sum += q; mn = math.min(mn, q); mx = math.max(mx, q); n += 1
      }
      (sum, mn, mx, n)
    }
    val got = Multimodal.decodeMp1(
      Multimodal.mp1Fixture(spark, 12), "id", "media").orderBy("id").collect()
    for (i <- 0 until 12) {
      val (sum, mn, mx, n) = ref(i)
      assert(got(i).getAs[Boolean]("valid"), s"id $i")
      assert(got(i).getAs[Long]("value_sum") == sum, s"sum id $i")
      assert(got(i).getAs[Int]("min_sample").toLong == mn, s"min id $i")
      assert(got(i).getAs[Int]("max_sample").toLong == mx, s"max id $i")
      assert(got(i).getAs[Long]("n_decoded") == n, s"nDec id $i")
    }
    // irrational-scalefactor path (idx % 3 != 0): sf = 2·2^(−idx/3),
    // IEEE-double rint — spec-gated here (the oracle subset pins
    // idx ≡ 0 mod 3)
    val odd = Multimodal.encodeMp1(14, 0, 3, 1, protect = false,
      pad = _ => 0, alloc = (_, sb, _) => if (sb == 0) 8 else 0,
      scf = (_, _, _) => 7, code = (_, g, _, _) => g * 11)
    val oddOut = Multimodal.decodeMp1(
      Seq((0L, odd)).toDF("id", "media"), "id", "media").collect()(0)
    val sf7 = 2.0 * math.pow(2.0, -7.0 / 3.0)
    val expOdd = (0 until 12).map { g =>
      val code = (g * 11) % 256
      Math.rint(sf7 * 32768.0 * (2 * code - 256 + 2) / 255.0).toLong
    }.sum
    assert(oddOut.getAs[Boolean]("valid") &&
      oddOut.getAs[Long]("value_sum") == expOdd)
    // silent stream: every subband off is VALID (12·384·ch duration,
    // zero decoded subband samples)
    val silent = Multimodal.encodeMp1(14, 1, 3, 2, protect = true,
      pad = _ => 0, alloc = (_, _, _) => 0, scf = (_, _, _) => 0,
      code = (_, _, _, _) => 0)
    val sOut = Multimodal.decodeMp1(
      Seq((0L, silent)).toDF("id", "media"), "id", "media").collect()(0)
    assert(sOut.getAs[Boolean]("valid") &&
      sOut.getAs[Long]("total_samples") == 768L &&
      sOut.getAs[Long]("n_decoded") == 0L &&
      sOut.getAs[Long]("value_sum") == 0L)
    // corruption matrix over fixture id 1 (unprotected mono: alloc
    // bits at bytes 4-19, scalefactors from byte 20) and id 0
    // (protected: CRC word at bytes 4-5, alloc from byte 6)
    val fx = Multimodal.mp1Fixture(spark, 2).collect()
    val goodU = fx(1).getAs[Array[Byte]]("media")
    val goodP = fx(0).getAs[Array[Byte]]("media")
    val truncated = java.util.Arrays.copyOf(goodU, goodU.length - 3)
    val alloc15 = goodU.clone(); alloc15(4) = (alloc15(4) | 0xf0).toByte
    val scf63 = goodU.clone(); scf63(20) = (scf63(20) | 0xfc).toByte
    // intensity mode itself is DECODED now (q220); the lie here is a
    // flipped mode_extension on a protected intensity stream — the
    // bound moves, the allocation region changes length, and the
    // CRC-pinned layout no longer matches
    val joint = {
      val c = Multimodal.mp1IsFixture(spark, 1).collect()(0)
        .getAs[Array[Byte]]("media").clone() // id 0: protected, ext 0
      c(3) = (c(3) ^ 0x10).toByte
      c
    }
    val freeRate = goodU.clone(); freeRate(2) = (freeRate(2) & 0x0f).toByte
    val badCrc = goodP.clone(); badCrc(6) = (badCrc(6) ^ 0x10).toByte
    val mixedRate = Multimodal.encodeMp1(14, 0, 3, 1, protect = false,
        pad = _ => 0, alloc = (_, sb, _) => if (sb < 4) 4 else 0,
        scf = (_, _, _) => 0, code = (_, _, _, _) => 5) ++
      Multimodal.encodeMp1(14, 1, 3, 1, protect = false,
        pad = _ => 0, alloc = (_, sb, _) => if (sb < 4) 4 else 0,
        scf = (_, _, _) => 0, code = (_, _, _, _) => 5)
    val cdf = Seq((0L, goodU), (1L, truncated), (2L, alloc15), (3L, scf63),
      (4L, joint), (5L, freeRate), (6L, badCrc), (7L, mixedRate))
      .toDF("id", "media")
    val cout = Multimodal.decodeMp1(cdf, "id", "media").orderBy("id").collect()
    assert(cout(0).getAs[Boolean]("valid"))
    for (k <- 1 to 7)
      assert(!cout(k).getAs[Boolean]("valid"), s"variant $k must flag")
    // layer discrimination: a Layer III stream is NOT a Layer I
    // stream and vice versa; a WAV is neither
    val mp3 = Multimodal.encodeMp3(9, 0, 3)
    assert(!Multimodal.decodeMp1(Seq((0L, mp3)).toDF("id", "media"),
      "id", "media").collect()(0).getAs[Boolean]("valid"))
    assert(Multimodal.parseMp3(goodU).isEmpty)
  }

  test("MPEG-1 Layer II: payload decode matches a BigDecimal reference; corruption flags") {
    import spark.implicits._
    import java.math.{BigDecimal => JBD, RoundingMode}
    // independent reference: replay the fixture laws (allocation
    // tables, grouped-code degrouping, scfsi sharing) through
    // BigDecimal HALF_EVEN division — none of the decoder's
    // shift/floorDiv/parity arithmetic is reused
    val row03 = Array(3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
      8191, 16383, 32767, 65535)
    val row311 = Array(3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
      4095, 8191, 65535)
    val row1123 = Array(3, 5, 7, 9, 15, 31, 65535)
    val rowTail = Array(3, 5, 65535)
    def ref(i: Int): (Long, Long, Long, Long) = {
      val rate = Seq(44100, 48000, 32000)(i % 3)
      val ch = if (Seq(3, 0, 2)((i / 3) % 3) == 3) 1 else 2
      val sbl = if (rate == 48000) 27 else 30
      val nf = 2 + i % 3
      val nA = 4 + i % 4
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue; var n = 0L
      for (j <- 0 until nA; f <- 0 until nf; c <- 0 until ch;
           g <- 0 until 12; k <- 0 until 3) {
        val sb = (i + 7 * j) % sbl
        val row = if (sb < 3) row03 else if (sb < 11) row311
          else if (sb < 23) row1123 else rowTail
        val cap = if (sb < 11) 15 else if (sb < 23) 7 else 3
        val nlev = row((3 * i + 5 * j) % cap)
        val nb = if (nlev == 3) 2 else if (nlev == 5) 3 else if (nlev == 9) 4
          else 32 - Integer.numberOfLeadingZeros(nlev)
        val madd = if (nlev == 3 || nlev == 5 || nlev == 9) 1 << (nb - 1) else 2
        val scfsi = (i + 2 * j + c) % 4
        val p = g / 4
        val pEff = scfsi match {
          case 0 => p
          case 1 => if (p == 2) 2 else 0
          case 2 => 0
          case _ => if (p == 0) 0 else 1
        }
        val e = (i + sb + 7 * c + 2 * pEff + f) % 21
        val code = (i * 13 + f * 3 + g * 7 + k * 17 + sb * 5 + c * 11) % nlev
        val m = 2 * code - (1 << nb) + madd
        val num = new JBD(m).multiply(new JBD(2).pow(36 - e))
        val den = new JBD(nlev).multiply(new JBD(2).pow(20))
        val q = num.divide(den, 0, RoundingMode.HALF_EVEN).longValueExact()
        sum += q; mn = math.min(mn, q); mx = math.max(mx, q); n += 1
      }
      (sum, mn, mx, n)
    }
    val got = Multimodal.decodeMp2(
      Multimodal.mp2Fixture(spark, 12), "id", "media").orderBy("id").collect()
    for (i <- 0 until 12) {
      val (sum, mn, mx, n) = ref(i)
      assert(got(i).getAs[Boolean]("valid"), s"id $i")
      assert(got(i).getAs[Long]("value_sum") == sum, s"sum id $i")
      assert(got(i).getAs[Int]("min_sample").toLong == mn, s"min id $i")
      assert(got(i).getAs[Int]("max_sample").toLong == mx, s"max id $i")
      assert(got(i).getAs[Long]("n_decoded") == n, s"nDec id $i")
      assert(got(i).getAs[Long]("total_samples") ==
        (2 + i % 3).toLong * 1152 *
          (if (Seq(3, 0, 2)((i / 3) % 3) == 3) 1 else 2), s"total id $i")
    }
    // irrational-scalefactor path (idx % 3 != 0): IEEE rint, spec-gated
    val odd = Multimodal.encodeMp2(10, 1, 3, 1, protect = false,
      pad = _ => 0, allocIdx = (_, sb, _) => if (sb == 0) 2 else 0, // nlev 7
      scfsi = (_, _, _) => 2, scf = (_, _, _, _) => 5,
      code = (_, g, k, _, _) => (g + k) % 7)
    val oddOut = Multimodal.decodeMp2(
      Seq((0L, odd)).toDF("id", "media"), "id", "media").collect()(0)
    val sf5 = 2.0 * math.pow(2.0, -5.0 / 3.0)
    val expOdd = (for (g <- 0 until 12; k <- 0 until 3) yield {
      val code = (g + k) % 7
      Math.rint(sf5 * 32768.0 * (2 * code - 8 + 2) / 7.0).toLong
    }).sum
    assert(oddOut.getAs[Boolean]("valid") &&
      oddOut.getAs[Long]("value_sum") == expOdd)
    // silent stream (all subbands off) is VALID: 1152·ch·nf duration
    val silent = Multimodal.encodeMp2(14, 0, 0, 2, protect = true,
      pad = _ => 0, allocIdx = (_, _, _) => 0, scfsi = (_, _, _) => 0,
      scf = (_, _, _, _) => 0, code = (_, _, _, _, _) => 0)
    val sOut = Multimodal.decodeMp2(
      Seq((0L, silent)).toDF("id", "media"), "id", "media").collect()(0)
    assert(sOut.getAs[Boolean]("valid") &&
      sOut.getAs[Long]("total_samples") == 4608L &&
      sOut.getAs[Long]("n_decoded") == 0L)
    // corruption/legality matrix. Crafted layout (unprotected mono
    // 192 kbps @ 48 kHz, ONE active subband sb 0): header bytes 0-3,
    // allocation bits 32-119 (88 bits), scfsi bits 120-121, one
    // scalefactor bits 122-127, sample words from byte 16.
    val one = Multimodal.encodeMp2(10, 1, 3, 1, protect = false,
      pad = _ => 0, allocIdx = (_, sb, _) => if (sb == 0) 1 else 0, // nlev 3
      scfsi = (_, _, _) => 2, scf = (_, _, _, _) => 0,
      code = (_, g, k, _, _) => (g + k) % 3)
    val scf63 = one.clone(); scf63(15) = (scf63(15) | 0x3f).toByte
    val groupOver = one.clone() // first 5-bit group word := 31 >= 3^3
    groupOver(16) = (groupOver(16) | 0xf8).toByte
    // intensity mode is DECODED now (q221); the lie is a flipped
    // mode_extension on a protected intensity stream (bound moves →
    // the CRC-pinned allocation layout no longer matches)
    val joint = {
      val c = Multimodal.mp2IsFixture(spark, 1).collect()(0)
        .getAs[Array[Byte]]("media").clone() // id 0: protected, ext 0
      c(3) = (c(3) ^ 0x10).toByte
      c
    }
    val truncated = java.util.Arrays.copyOf(one, one.length - 3)
    val freeRate = one.clone(); freeRate(2) = (freeRate(2) & 0x0f).toByte
    val prot = Multimodal.mp2Fixture(spark, 1).collect()(0)
      .getAs[Array[Byte]]("media") // id 0: protected, CRC at bytes 4-5
    val badCrc = prot.clone(); badCrc(4) = (badCrc(4) ^ 0x10).toByte
    // hand-crafted headers: low-bitrate B.2c regime (48 kbps mono —
    // legal mode, out-of-scope table) and stereo at a mono-only rate
    def hdr(b1: Int, b2: Int, b3: Int, len: Int): Array[Byte] = {
      val a = new Array[Byte](len)
      a(0) = 0xff.toByte; a(1) = b1.toByte; a(2) = b2.toByte; a(3) = b3.toByte
      a
    }
    val b2c = hdr(0xfd, 0x24, 0xc0, 144) // 48 kbps mono 48 kHz
    val modeBad = hdr(0xfd, 0x24, 0x00, 144) // 48 kbps STEREO: illegal
    val cdf = Seq((0L, one), (1L, scf63), (2L, groupOver), (3L, joint),
      (4L, truncated), (5L, freeRate), (6L, badCrc), (7L, b2c),
      (8L, modeBad)).toDF("id", "media")
    val cout = Multimodal.decodeMp2(cdf, "id", "media").orderBy("id").collect()
    assert(cout(0).getAs[Boolean]("valid"))
    for (k <- 1 to 8)
      assert(!cout(k).getAs[Boolean]("valid"), s"variant $k must flag")
    // layer discrimination: Layer I/III streams are not Layer II and
    // vice versa
    val mp1 = Multimodal.encodeMp1(14, 0, 3, 1, protect = false,
      pad = _ => 0, alloc = (_, _, _) => 0, scf = (_, _, _) => 0,
      code = (_, _, _, _) => 0)
    assert(Multimodal.parseMp2(mp1).isEmpty)
    assert(Multimodal.parseMp1(one).isEmpty)
    assert(Multimodal.parseMp3(one).isEmpty)
    assert(!Multimodal.decodeMp2(
      Seq((0L, Multimodal.encodeMp3(9, 0, 3))).toDF("id", "media"),
      "id", "media").collect()(0).getAs[Boolean]("valid"))
  }

  test("Layers I+II intensity stereo: shared joint-region codes match a BigDecimal reference") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // Layer I: replay mp1IsFixture's laws with the shared-code rule
    // (joint region takes channel 0's code, each channel its own
    // scalefactor) through BigDecimal HALF_EVEN — independent of the
    // decoder's shift/parity arithmetic
    def refMp1(i: Int): (Long, Long) = {
      val nf = 2 + i % 4
      val nA = 5 + i % 4
      val bound = 4 * (i % 4 + 1)
      var sum = 0L
      var n = 0L
      for (j <- 0 until nA; f <- 0 until nf; c <- 0 until 2;
           g <- 0 until 12) {
        val sb = (i + 3 * j) % 32
        val nb = 2 + (3 * i + 5 * j) % 14
        val e = (i + sb + 7 * c + 2 * f) % 21
        val cc = if (sb < bound) c else 0
        val code = (i * 13 + f * 3 + g * 7 + sb * 5 + cc * 11) % (1 << nb)
        val m = 2 * code - (1 << nb) + 2
        val num = new JBD(m).multiply(new JBD(2).pow(36 - e))
        val den = new JBD((1L << nb) - 1).multiply(new JBD(2).pow(20))
        sum += num.divide(den, 0, RoundingMode.HALF_EVEN).longValueExact()
        n += 1
      }
      (sum, n)
    }
    val got1 = Multimodal.decodeMp1(
      Multimodal.mp1IsFixture(spark, 8), "id", "media")
      .orderBy("id").collect()
    for (i <- 0 until 8) {
      val (sum, n) = refMp1(i)
      assert(got1(i).getAs[Boolean]("valid"), s"mp1 id $i")
      assert(got1(i).getAs[Long]("value_sum") == sum, s"mp1 sum id $i")
      assert(got1(i).getAs[Long]("n_decoded") == n, s"mp1 nDec id $i")
      assert(got1(i).getAs[Int]("channels") == 2)
    }
    // Layer II: same rule through the grouped/ungrouped requantizer
    def refMp2(i: Int): (Long, Long) = {
      val rate = Seq(44100, 48000, 32000)(i % 3)
      val sbl = if (rate == 48000) 27 else 30
      val nf = 2 + i % 3
      val nA = 4 + i % 4
      val bound = 4 * (i % 4 + 1)
      var sum = 0L
      var n = 0L
      for (j <- 0 until nA; c <- 0 until 2; f <- 0 until nf;
           g <- 0 until 12; k <- 0 until 3) {
        val sb = (i + 7 * j) % sbl
        val cap = if (sb < 11) 15 else if (sb < 23) 7 else 3
        val row =
          if (sb < 3) Seq(3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047,
            4095, 8191, 16383, 32767, 65535)
          else if (sb < 11) Seq(3, 5, 7, 9, 15, 31, 63, 127, 255, 511,
            1023, 2047, 4095, 8191, 65535)
          else if (sb < 23) Seq(3, 5, 7, 9, 15, 31, 65535)
          else Seq(3, 5, 65535)
        val nl = row((3 * i + 5 * j) % cap)
        val nb = if (nl == 3) 2 else if (nl == 5) 3 else if (nl == 9) 4
          else 32 - Integer.numberOfLeadingZeros(nl)
        val madd = if (nl == 3 || nl == 5 || nl == 9) 1 << (nb - 1) else 2
        val scfsi = (i + 2 * j + c) % 4
        val part = scfsi match {
          case 0 => g / 4
          case 1 => if (g / 4 == 2) 2 else 0
          case 2 => 0
          case _ => if (g / 4 == 0) 0 else 1
        }
        val e = (i + sb + 7 * c + 2 * part + f) % 21
        val cc = if (sb < bound) c else 0
        val code =
          (i * 13 + f * 3 + g * 7 + k * 17 + sb * 5 + cc * 11) % nl
        val m = 2 * code - (1 << nb) + madd
        val num = new JBD(m).multiply(new JBD(2).pow(36 - e))
        val den = new JBD(nl).multiply(new JBD(2).pow(20))
        sum += num.divide(den, 0, RoundingMode.HALF_EVEN).longValueExact()
        n += 1
      }
      (sum, n)
    }
    val got2 = Multimodal.decodeMp2(
      Multimodal.mp2IsFixture(spark, 8), "id", "media")
      .orderBy("id").collect()
    for (i <- 0 until 8) {
      val (sum, n) = refMp2(i)
      assert(got2(i).getAs[Boolean]("valid"), s"mp2 id $i")
      assert(got2(i).getAs[Long]("value_sum") == sum, s"mp2 sum id $i")
      assert(got2(i).getAs[Long]("n_decoded") == n, s"mp2 nDec id $i")
    }
    // Layer III: intensity frames parse (bitstream-identical to L/R);
    // the per-tool counters split ext 1 / ext 3 correctly
    val got3 = Multimodal.decodeMp3L3(
      Multimodal.mp3L3IsFixture(spark, 6), "id", "media")
      .orderBy("id").collect()
    for (i <- 0 until 6) {
      val nf = 2 + i % 3
      assert(got3(i).getAs[Boolean]("valid"), s"mp3 id $i")
      assert(got3(i).getAs[Int]("is_frames") == nf, s"mp3 isf id $i")
      assert(got3(i).getAs[Int]("ms_frames") == (nf + i % 2) / 2,
        s"mp3 msf id $i")
    }
    // and the MS fixture reports zero intensity frames
    val ms = Multimodal.decodeMp3L3(
      Multimodal.mp3L3MsFixture(spark, 2), "id", "media")
      .orderBy("id").collect()
    assert(ms.forall(_.getAs[Int]("is_frames") == 0))
  }

  test("audioCatalog: dispatch routes every family to its parser; junk flags") {
    import spark.implicits._
    val out = Multimodal.audioCatalog(
        Multimodal.audioLakeFixture(spark, 10), "id", "media")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("codec")).toSeq ==
      Seq("pcm", "adpcm", "ulaw", "flac", "mp3",
          "pcm", "adpcm", "alaw", "flac", "mp3"))
    assert(out.forall(_.getAs[Boolean]("valid")))
    // a PCM-tagged WAV with ADPCM-only extension fields must NOT be
    // claimed by any family; raw garbage likewise
    val adpcm = Multimodal.audioLakeFixture(spark, 2).collect()(1)
      .getAs[Array[Byte]]("media")
    val mislabeled = adpcm.clone(); mislabeled(20) = 1 // tag 0x11 -> 1
    val junk = Array.tabulate[Byte](128)(k => (k * 29).toByte)
    val bad = Multimodal.audioCatalog(
        Seq((0L, mislabeled), (1L, junk)).toDF("id", "media"), "id", "media")
      .orderBy("id").collect()
    assert(bad.forall(!_.getAs[Boolean]("valid")))
  }

  test("extractFeatures: deterministic byte stats") {
    val fx = Multimodal.fixture(spark, 3)
    val f1 = Multimodal.extractFeatures(fx, "id", "media").orderBy("id").collect()
    val f2 = Multimodal.extractFeatures(Multimodal.fixture(spark, 3), "id", "media")
      .orderBy("id").collect()
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    assert(f1.forall { r =>
      val m = r.getAs[Double]("mean_byte"); m >= 0 && m <= 255
    })
  }

  test("resize: nearest-neighbor downsample keeps container contract") {
    val fx = Multimodal.fixture(spark, 3) // id 0 is an 8x6 image
    val out = Multimodal.resize(fx, "id", "media", 4, 3)
      .orderBy("id").collect()
    val img = out(0).getAs[Array[Byte]]("resized")
    assert(img != null)
    val meta = Multimodal.decodeMeta(
      spark.createDataFrame(Seq((0L, img)))
        .toDF("id", "media"), "id", "media").collect()(0)
    assert(meta.getAs[String]("mtype") == "image")
    assert(meta.getAs[Int]("width") == 4 && meta.getAs[Int]("height") == 3)
    assert(meta.getAs[Int]("payload_bytes") == 12)
    // audio blob (id 1) passes through as null
    assert(out(1).isNullAt(1))
  }

  test("sampleFrames: stride sampling of video frames") {
    val fx = Multimodal.fixture(spark, 9) // ids 2,5,8 are video with 4..6 frames
    val frames = Multimodal.sampleFrames(fx, "id", "media", stride = 2)
      .collect().groupBy(_.getAs[Long]("id"))
    // id 2: nframes = 4+2%3 = 6 → frames 0,2,4
    assert(frames(2L).map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2, 4))
    // every frame blob is width*height = 64 bytes
    assert(frames(2L).forall(_.getAs[Array[Byte]]("frame").length == 64))
    // images (id 0,...) produce one frame at idx 0
    assert(frames(0L).map(_.getAs[Int]("frame_idx")).toSeq == Seq(0))
  }

  test("mp3: frame-header walk — valid streams parse, malformed reject") {
    import graft.operators.Multimodal
    // closed-form CBR stream: bitrate idx 9 (128 kbps), rate idx 0
    // (44100), 7 frames → frame length 144000·128/44100 = 417 bytes
    val good = Multimodal.encodeMp3(9, 0, 7)
    assert(good.length == 417 * 7)
    assert(Multimodal.parseMp3(good).contains((44100, 128, 7)))
    // truncated tail → reject (walk must land exactly on EOF)
    assert(Multimodal.parseMp3(good.dropRight(1)).isEmpty)
    // mixed sample rates across frames → reject
    val mixed = Multimodal.encodeMp3(9, 0, 2) ++ Multimodal.encodeMp3(9, 1, 1)
    assert(Multimodal.parseMp3(mixed).isEmpty)
    // reserved bitrate index (15) → reject
    val bad = good.clone(); bad(2) = 0xf0.toByte
    assert(Multimodal.parseMp3(bad).isEmpty)
    // decodeMeta dispatch: mp3 sync classified as audio/mp3 with the
    // (rate, kbps, frames) mapping; a JPEG must NOT be misdetected
    val fx = Multimodal.mp3Fixture(spark, 6)
    val meta = Multimodal.decodeMeta(fx, "id", "media")
      .orderBy("id").collect()
    meta.foreach { r =>
      assert(r.getAs[String]("mtype") == "audio" &&
        r.getAs[String]("codec") == "mp3" && r.getAs[Boolean]("valid"))
    }
    assert(meta(0).getAs[Int]("width") == 44100) // id 0: rate idx 0
    assert(meta(0).getAs[Int]("height") == 32)   // id 0: bitrate idx 1 → 32 kbps
    assert(meta(0).getAs[Int]("nframes") == 10)  // id 0: 10 + 0 % 30
  }

  test("flac: constant-subframe decode — values reconstruct, every corruption rejects") {
    import graft.operators.Multimodal
    // closed-form reference for the fixture's frame constants
    def refSum(seed: Long, nf: Int, ch: Int): Long =
      (0 until nf).map(f => ((seed * 31 + f * 17) % 200) - 100).sum * ch
    val good = Multimodal.encodeFlac(rateCode = 9, channels = 2, bps = 16,
      nFrames = 5, seed = 3L)
    val parsed = Multimodal.parseFlac(good)
    assert(parsed.contains((44100, 2, 16, 5, 5L * 4096, refSum(3L, 5, 2))))
    // 8-bit mono variant
    val p8 = Multimodal.parseFlac(
      Multimodal.encodeFlac(8, 1, 8, 3, seed = 7L))
    assert(p8.contains((32000, 1, 8, 3, 3L * 4096, refSum(7L, 3, 1))))
    // corruptions: each must reject, never mis-decode
    def mut(i: Int, f: Byte => Byte): Array[Byte] = {
      val c = good.clone(); c(i) = f(c(i)); c
    }
    assert(Multimodal.parseFlac(mut(0, _ => 'g')).isEmpty, "magic")
    assert(Multimodal.parseFlac(mut(8, b => (b ^ 1).toByte)).isEmpty,
      "STREAMINFO blocksize vs frame code")
    val frame0 = 4 + 4 + 34
    assert(Multimodal.parseFlac(mut(frame0 + 1, _ => 0xf9.toByte)).isEmpty,
      "blocking-strategy bit")
    assert(Multimodal.parseFlac(
      mut(frame0 + 7, b => (b ^ 1).toByte)).isEmpty,
      "flipped sample byte breaks the frame CRC-16")
    assert(Multimodal.parseFlac(
      mut(frame0 + 6, b => (b | 0x08).toByte)).isEmpty,
      "non-constant subframe type")
    assert(Multimodal.parseFlac(good.dropRight(1)).isEmpty, "truncated tail")
    assert(Multimodal.parseFlac(good ++ Array[Byte](0)).isEmpty,
      "trailing garbage")
    // CRC self-checks against known spec vectors: CRC-8(0x00)=0x00,
    // CRC-8 of "123456789" (poly 0x07) = 0xF4; CRC-16/BUYPASS = 0xFEE8
    val ck = "123456789".getBytes("ASCII")
    assert(Multimodal.flacCrc8(ck, 0, ck.length) == 0xf4)
    assert(Multimodal.flacCrc16(ck, 0, ck.length) == 0xfee8)
    // decodeMeta catalogs flac blobs alongside the other codecs
    val meta = Multimodal.decodeMeta(
        Multimodal.flacFixture(spark, 6), "id", "media")
      .orderBy("id").collect()
    assert(meta.forall(_.getAs[Boolean]("valid")))
    assert(meta(0).getAs[String]("codec") == "flac")
    assert(meta(0).getAs[Int]("width") == 32000) // id 0: rate code 8
    assert(meta(1).getAs[Int]("height") == 2)    // id 1: 1 + 1 % 2 channels
    assert(meta(3).getAs[Int]("nframes") == 6)   // id 3: 3 + 3 % 7
  }

  test("gif: animated multi-frame decode — exact pixels, delays, PNG frame sampling") {
    import graft.operators.Multimodal
    // hand-built 2-frame animation with known pixels + delays
    val px0 = Array.tabulate[Byte](8 * 6)(p => (p % 256).toByte)
    val px1 = Array.tabulate[Byte](8 * 6)(p => ((p * 3 + 1) % 256).toByte)
    val gif = Multimodal.encodeGif(8, 6, Seq(px0, px1), Seq(7, 12))
    val want = px0.map(_ & 0xff).sum.toLong + px1.map(_ & 0xff).sum
    assert(Multimodal.parseGif(gif).contains((8, 6, 2, want, 19L)))
    // corrupt magic rejects
    val bad = gif.clone(); bad(0) = 'X'.toByte
    assert(Multimodal.parseGif(bad).isEmpty)
    // the DataFrame op over the closed-form fixture
    val rows = Multimodal.decodeGif(
        Multimodal.gifFixture(spark, 4), "id", "media")
      .orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("valid")))
    assert(rows(2).getAs[Int]("n_frames") == 4) // id 2: 2 + 2 % 5
    val refSum = (0 until 4).flatMap(f => for {
      x <- 0 until 8; y <- 0 until 6
    } yield (2 * 7 + f * 13 + x * 3 + y) % 256).map(_.toLong).sum
    assert(rows(2).getAs[Long]("pixel_sum") == refSum)
    // sampleFrames: real PNG re-encode of every second frame,
    // losslessly decodable back to the same gray values
    val frames = Multimodal.sampleFrames(
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            Seq(org.apache.spark.sql.Row(0L, gif)), 1),
          new org.apache.spark.sql.types.StructType()
            .add("id", "long", false).add("media", "binary")),
        "id", "media", stride = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0))
    val png = frames(0).getAs[Array[Byte]]("frame")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 8 && img.getHeight == 6)
    assert((img.getRGB(3, 2) & 0xff) == (px0(2 * 8 + 3) & 0xff))
  }

  test("mp4: moov walk — conforming containers parse, malformed reject") {
    import graft.operators.Multimodal
    val good = Multimodal.encodeMp4(rate = 44100, channels = 2,
      nSamples = 44100L * 3)
    // full catalog surface via the DataFrame op
    val row = Multimodal.decodeMp4(
        Multimodal.mp4Fixture(spark, 1), "id", "media")
      .head()
    assert(row.getAs[Boolean]("valid"))
    assert(row.getAs[String]("brand") == "M4A ")
    assert(row.getAs[String]("codec") == "mp4a")
    assert(row.getAs[Int]("movie_timescale") == 1000)
    assert(row.getAs[Int]("sample_rate") == 32000) // id 0: rate idx 0
    assert(row.getAs[Int]("channels") == 1)
    assert(row.getAs[Long]("media_duration") == 32000L) // 32000·2/2
    assert(row.getAs[Long]("movie_duration") == 1000L)
    // structural corruption matrix
    def mut(i: Int, v: Byte): Array[Byte] = {
      val c = good.clone(); c(i) = v; c
    }
    assert(Multimodal.decodeMp4(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, mut(5, 'x'.toByte)),       // no ftyp
        org.apache.spark.sql.Row(1L, good.dropRight(1)),         // truncated
        org.apache.spark.sql.Row(2L, mut(3, 99.toByte)),         // ftyp size lies
        org.apache.spark.sql.Row(3L, good ++ Array[Byte](0, 0))  // trailing bytes
      ), 1),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long", false).add("media", "binary")), "id", "media")
      .collect().forall(!_.getAs[Boolean]("valid")))
    // 16.16 sample-rate / mdhd-timescale cross-check: corrupt the
    // mdhd timescale field and the stsd check must reject
    val mdhdTsOff = good.indexOfSlice("mdhd".getBytes("ASCII")) + 4 + 12
    val badTs = good.clone(); badTs(mdhdTsOff + 3) = (badTs(mdhdTsOff + 3) ^ 1).toByte
    assert(Multimodal.decodeMp4(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, badTs)), 1),
      new org.apache.spark.sql.types.StructType()
        .add("id", "long", false).add("media", "binary")), "id", "media")
      .collect().forall(!_.getAs[Boolean]("valid")))
  }

  test("avi: MJPEG container decode — exact frame pixels, structural corruptions reject") {
    import graft.operators.Multimodal
    // hand-built 3-frame 13x9 @ 25 fps with known grays
    val good = Multimodal.encodeAvi(13, 9, Seq(0, 128, 255), 25)
    val want = 3L * 13 * 9 * (0 + 128 + 255)
    assert(Multimodal.parseAvi(good).contains(
      (13, 9, 3, 40000L, 120L, want)))
    // the exact-round-trip operating point: EVERY gray value decodes
    // bit-exactly through the real JPEG codec at quality 1.0 (the
    // closed-form-oracle guarantee q147 rests on)
    for (v <- 0 until 256) {
      val one = Multimodal.parseAvi(Multimodal.encodeAvi(13, 9, Seq(v), 25))
      assert(one.contains((13, 9, 1, 40000L, 40L, 3L * 13 * 9 * v)),
        s"gray $v did not round-trip exactly")
    }
    // corruption matrix: structural damage must reject, never guess
    def mut(i: Int, f: Byte => Byte): Array[Byte] = {
      val c = good.clone(); c(i) = f(c(i)); c
    }
    assert(Multimodal.parseAvi(mut(0, _ => 'X')).isEmpty, "RIFF magic")
    assert(Multimodal.parseAvi(mut(4, b => (b ^ 1).toByte)).isEmpty,
      "RIFF size vs actual length")
    assert(Multimodal.parseAvi(mut(8, _ => 'B')).isEmpty, "AVI fourcc")
    // avih payload starts at 32; dwTotalFrames at +16, dwStreams at +24
    assert(Multimodal.parseAvi(mut(48, b => (b + 1).toByte)).isEmpty,
      "declared frame count vs movi payload")
    assert(Multimodal.parseAvi(mut(56, b => (b + 1).toByte)).isEmpty,
      "more than one declared stream")
    assert(Multimodal.parseAvi(good.dropRight(3)).isEmpty, "truncated tail")
    // a frame chunk whose payload is not a decodable JPEG rejects
    val firstDc = {
      var i = 12
      while (!(good(i) == '0' && good(i + 1) == '0' &&
        good(i + 2) == 'd' && good(i + 3) == 'c')) i += 1
      i
    }
    assert(Multimodal.parseAvi(
      mut(firstDc + 8, _ => 'P')).isEmpty, "non-JPEG frame payload")
    // the DataFrame op over the closed-form fixture
    val rows = Multimodal.decodeAvi(
        Multimodal.aviFixture(spark, 6), "id", "media")
      .orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("valid")))
    val r2 = rows(2) // id 2: 14x10, 4 frames, rate 12
    assert(r2.getAs[Int]("width") == 14 && r2.getAs[Int]("height") == 10)
    assert(r2.getAs[Int]("n_frames") == 4)
    assert(r2.getAs[Long]("usec_per_frame") == 1000000L / 12)
    assert(r2.getAs[Long]("dur_ms") == 4 * 1000L / 12)
    val graySum = (0 until 4).map(f => (2 * 11 + f * 29) % 256).sum
    assert(r2.getAs[Long]("pixel_sum") == 3L * 14 * 10 * graySum)
  }

  /** Closed-form sample sum for the fixed-predictor FLAC fixture. */
  private def refSumPred(seed: Long, nf: Int, ch: Int): Long =
    (0 until nf).map { f =>
      val t = ((seed + f) % 7).toInt
      val c0 = (seed * 31 + f * 17) % 50 - 25
      val c1 = if (t == 0) 0L else (seed * 13 + f * 7) % 7 - 3
      val d = if (t == 0) 0L else (seed + f) % 4
      4096L * c0 + 8386560L * c1 + 2048L * d
    }.sum * ch

  test("flac PCM: fixed-predictor/verbatim/constant decode — every sample reconstructs") {
    import graft.operators.Multimodal
    // one stream covering all 7 subframe types (seed 0, 7 frames)
    val all7 = Multimodal.encodeFlacPred(9, 2, 7, 0L)
    assert(Multimodal.parseFlacPcm(all7).contains(
      (44100, 2, 16, 7, 7L * 4096, refSumPred(0L, 7, 2))))
    // mono variant, different rate/seed
    assert(Multimodal.parseFlacPcm(Multimodal.encodeFlacPred(8, 1, 5, 11L))
      .contains((32000, 1, 16, 5, 5L * 4096, refSumPred(11L, 5, 1))))
    // consistency with the q144 constant-catalog subset: the PCM
    // decoder sums every sample, i.e. 4096x the per-frame constants
    def refConst(seed: Long, nf: Int, ch: Int): Long =
      (0 until nf).map(f => ((seed * 31 + f * 17) % 200) - 100).sum * ch
    val const = Multimodal.encodeFlac(9, 2, 16, 4, 5L)
    assert(Multimodal.parseFlacPcm(const).contains(
      (44100, 2, 16, 4, 4L * 4096, 4096L * refConst(5L, 4, 2))))
    assert(Multimodal.parseFlac(const).contains(
      (44100, 2, 16, 4, 4L * 4096, refConst(5L, 4, 2))))
    // a constant frame RELABELED as LPC order 1 (header byte 0x40,
    // CRC-16 recomputed valid) is structurally garbage as LPC — the
    // decoder runs out of bits mid-subframe and rejects rather than
    // guessing (real LPC decode is covered by its own test below)
    val lpc = Multimodal.encodeFlac(8, 1, 8, 1, 3L).clone()
    val f0 = 4 + 4 + 34
    lpc(f0 + 6) = 0x40.toByte // subframe header: LPC order 1
    val crc = Multimodal.flacCrc16(lpc, f0, lpc.length - 2)
    lpc(lpc.length - 2) = (crc >> 8).toByte
    lpc(lpc.length - 1) = crc.toByte
    assert(Multimodal.parseFlacPcm(lpc).isEmpty,
      "truncated-as-LPC must reject")
    // structural damage: truncation and trailing garbage reject
    assert(Multimodal.parseFlacPcm(all7.dropRight(1)).isEmpty)
    assert(Multimodal.parseFlacPcm(all7 ++ Array[Byte](0)).isEmpty)
    // deterministic corruption sweep: flipping any sampled byte of
    // the frame region must reject (CRC-8/CRC-16/structure coverage)
    val sweep = Multimodal.encodeFlacPred(10, 1, 3, 4L)
    var pos = f0
    while (pos < sweep.length) {
      val c = sweep.clone(); c(pos) = (c(pos) ^ 0x41).toByte
      assert(Multimodal.parseFlacPcm(c).isEmpty, s"flip at byte $pos parsed")
      pos += 5
    }
    // the DataFrame op over the closed-form fixture
    val rows = Multimodal.decodeFlacPcm(
        Multimodal.flacPredFixture(spark, 8), "id", "media")
      .orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("valid")))
    val r3 = rows(3) // id 3: rate code 9+... 8 + 3 % 3 = 8+0 -> 32000, ch 2, nf 5
    assert(r3.getAs[Int]("sample_rate") == 32000)
    assert(r3.getAs[Int]("channels") == 2)
    assert(r3.getAs[Int]("n_frames") == 5)
    assert(r3.getAs[Long]("value_sum") == refSumPred(3L, 5, 2))
  }

  /** Closed-form sample sum for the LPC FLAC fixture (the full
    * ramp-plus-wiggle law, no CONSTANT special case). */
  private def refSumLpc(seed: Long, nf: Int, ch: Int): Long =
    (0 until nf).map { f =>
      4096L * ((seed * 31 + f * 17) % 50 - 25) +
        8386560L * ((seed * 13 + f * 7) % 7 - 3) +
        2048L * ((seed + f) % 4)
    }.sum * ch

  /** Single-frame mono/16-bit/44100 FLAC stream with CALLER-SUPPLIED
    * subframe bits — valid outer framing (CRC-8/CRC-16/pad), so a
    * reject is attributable to the subframe payload, not the
    * envelope. Bits are (value, width) MSB-first. */
  private def craftedFlacFrame(subframeBits: Seq[(Long, Int)]): Array[Byte] = {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def put(v: Long, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bits += ((v >>> i) & 1L) != 0L)
    Seq(0xffL -> 8, 0xf8L -> 8, ((12 << 4) | 9).toLong -> 8,
      (4 << 1).toLong -> 8, 0L -> 8).foreach { case (v, n) => put(v, n) }
    // crc8 over the 5 header bytes
    val hdr = new Array[Byte](5)
    bits.zipWithIndex.foreach { case (b, i) =>
      if (b) hdr(i / 8) = (hdr(i / 8) | (0x80 >>> (i % 8))).toByte }
    put(graft.operators.Multimodal.flacCrc8(hdr, 0, 5).toLong, 8)
    subframeBits.foreach { case (v, n) => put(v, n) }
    while (bits.length % 8 != 0) bits += false
    val frame = new Array[Byte](bits.length / 8)
    bits.zipWithIndex.foreach { case (b, i) =>
      if (b) frame(i / 8) = (frame(i / 8) | (0x80 >>> (i % 8))).toByte }
    val crc16 = graft.operators.Multimodal.flacCrc16(frame, 0, frame.length)
    val out = java.nio.ByteBuffer.allocate(42 + frame.length + 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.put("fLaC".getBytes("ASCII"))
    out.put(0x80.toByte).put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(4096.toShort).putShort(4096.toShort)
    out.put(new Array[Byte](6))
    out.putLong((44100L << 44) | (0L << 41) | (15L << 36) | 4096L)
    out.put(new Array[Byte](16))
    out.put(frame)
    out.putShort(crc16.toShort)
    out.array()
  }

  test("flac PCM: LPC subframes decode bit-exactly; illegal predictor specs reject") {
    import graft.operators.Multimodal
    // 10 frames sweep orders 1-8, shifts 1-4, both Rice parameter
    // widths, partition orders 0-2 and two escaped-raw frames
    val st = Multimodal.encodeFlacLpc(9, 2, 10, 0L)
    assert(Multimodal.parseFlacPcm(st).contains(
      (44100, 2, 16, 10, 10L * 4096, refSumLpc(0L, 10, 2))))
    assert(Multimodal.parseFlacPcm(Multimodal.encodeFlacLpc(8, 1, 7, 23L))
      .contains((32000, 1, 16, 7, 7L * 4096, refSumLpc(23L, 7, 1))))
    // structural damage rejects
    assert(Multimodal.parseFlacPcm(st.dropRight(1)).isEmpty)
    assert(Multimodal.parseFlacPcm(st ++ Array[Byte](0)).isEmpty)
    var pos = 42
    while (pos < st.length) {
      val c = st.clone(); c(pos) = (c(pos) ^ 0x41).toByte
      assert(Multimodal.parseFlacPcm(c).isEmpty, s"flip at byte $pos parsed")
      pos += 7
    }
    // crafted illegal predictor specs, each in a CRC-valid envelope:
    // LPC order 1 (subframe header (0x20|0)<<1 = 0x40), one 16-bit
    // warm-up sample, then the offending field
    val warmup = Seq(0x40L -> 8, 0L -> 16)
    // precision code 0b1111 is forbidden (RFC 9639 §9.2.4)
    assert(Multimodal.parseFlacPcm(craftedFlacFrame(
      warmup ++ Seq(15L -> 4, 1L -> 5, 0L -> 12))).isEmpty)
    // negative shift (5-bit two's complement -1) is spec-forbidden
    assert(Multimodal.parseFlacPcm(craftedFlacFrame(
      warmup ++ Seq(11L -> 4, 0x1fL -> 5, 0L -> 12))).isEmpty)
    // reserved residual method 0b10
    assert(Multimodal.parseFlacPcm(craftedFlacFrame(
      warmup ++ Seq(11L -> 4, 1L -> 5, 4L -> 12, 2L -> 2))).isEmpty)
    // partition order that leaves the first partition non-positive:
    // order 8 LPC with bs >> po = 8 ≤ 8 (po = 9)
    val warm8 = Seq(((0x20L | 7L) << 1, 8)) ++ (0 until 8).map(_ => 0L -> 16)
    assert(Multimodal.parseFlacPcm(craftedFlacFrame(
      warm8 ++ Seq(11L -> 4, 1L -> 5) ++ (0 until 8).map(_ => 4L -> 12) ++
        Seq(0L -> 2, 9L -> 4, 3L -> 4))).isEmpty)
    // the registry fixture end-to-end
    val rows = Multimodal.decodeFlacPcm(
        Multimodal.flacLpcFixture(spark, 8), "id", "media")
      .orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("valid")))
    val r5 = rows(5) // id 5: rate 48000, ch 2, nf 3
    assert(r5.getAs[Int]("sample_rate") == 48000)
    assert(r5.getAs[Int]("channels") == 2)
    assert(r5.getAs[Int]("n_frames") == 3)
    assert(r5.getAs[Long]("value_sum") == refSumLpc(5L, 3, 2))
  }

  /** Closed-form Σ(L+R) for the stereo-decorrelation fixture. */
  private def refSumStereo(seed: Long, nf: Int): Long =
    (0 until nf).map { f =>
      val mode = f % 4
      val w = if (mode <= 1) ((seed + f) % 3).toInt else 0
      (1L << w) * (4096L * ((seed * 31 + f * 17) % 50 - 25) +
        8386560L * ((seed * 13 + f * 7) % 3 - 1) +
        2048L * ((seed + f) % 4)) +
        4096L * ((seed * 19 + f * 23) % 50 - 25) +
        8386560L * ((seed * 11 + f * 5) % 7 - 3) +
        2048L * ((seed + 2 * f) % 4)
    }.sum

  test("flac PCM: stereo decorrelation + wasted bits decode bit-exactly") {
    import graft.operators.Multimodal
    // 8 frames cycle independent / left-side / right-side / mid-side
    // twice, with wasted-bits subframes and a verbatim 17-bit side
    val st = Multimodal.encodeFlacStereo(9, 8, 0L)
    assert(Multimodal.parseFlacPcm(st).contains(
      (44100, 2, 16, 8, 8L * 4096, refSumStereo(0L, 8))))
    for (seed <- 1L to 20L; nf <- Seq(3, 5)) {
      assert(Multimodal.parseFlacPcm(Multimodal.encodeFlacStereo(10, nf, seed))
        .contains((48000, 2, 16, nf, nf.toLong * 4096,
          refSumStereo(seed, nf))),
        s"stereo round-trip failed at seed=$seed nf=$nf")
    }
    // structural damage rejects
    assert(Multimodal.parseFlacPcm(st.dropRight(1)).isEmpty)
    assert(Multimodal.parseFlacPcm(st ++ Array[Byte](0)).isEmpty)
    var pos = 42
    while (pos < st.length) {
      val c = st.clone(); c(pos) = (c(pos) ^ 0x41).toByte
      assert(Multimodal.parseFlacPcm(c).isEmpty, s"flip at byte $pos parsed")
      pos += 7
    }
    // reserved channel assignment 11 rejects (header byte, CRC-8 and
    // CRC-16 recomputed so the reject is attributable to the code)
    val bad = st.clone()
    bad(42 + 3) = ((11 << 4) | (4 << 1)).toByte
    bad(42 + 5) = Multimodal.flacCrc8(bad, 42, 42 + 5).toByte
    assert(Multimodal.parseFlacPcm(bad).isEmpty, "reserved chAssign parsed")
    // a MONO stream with a stereo channel assignment rejects (the
    // streaminfo channel count must match)
    val mono = Multimodal.encodeFlacPred(9, 1, 3, 2L).clone()
    mono(42 + 3) = ((8 << 4) | (4 << 1)).toByte
    mono(42 + 5) = Multimodal.flacCrc8(mono, 42, 42 + 5).toByte
    assert(Multimodal.parseFlacPcm(mono).isEmpty, "stereo-on-mono parsed")
    // the registry fixture end-to-end
    val rows = Multimodal.decodeFlacPcm(
        Multimodal.flacStereoFixture(spark, 8), "id", "media")
      .orderBy("id").collect()
    assert(rows.forall(_.getAs[Boolean]("valid")))
    val r4 = rows(4) // id 4: rate code 8+1 → 44100, nf 2 + 4 % 4 = 2
    assert(r4.getAs[Int]("sample_rate") == 44100)
    assert(r4.getAs[Int]("channels") == 2)
    assert(r4.getAs[Int]("n_frames") == 2)
    assert(r4.getAs[Long]("value_sum") == refSumStereo(4L, 2))
  }
}
