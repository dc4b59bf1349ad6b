package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.Multimodal

/** Property suites for the real codec walks (no SparkSession needed —
  * the parsers are plain byte-array functions).
  *
  * The FLAC flip property is the strong one: every byte of the frame
  * region is covered by either the header CRC-8 or the frame CRC-16
  * (or IS one of the CRC bytes, or a sync/code byte whose change
  * breaks structural validation), so ANY single-byte corruption after
  * the STREAMINFO block must reject — there is no byte bit-rot can
  * touch silently. */
object MultimodalPropertySpec extends Properties("MultimodalCodecs") {

  private def refSum(seed: Long, nf: Int, ch: Int): Long =
    (0 until nf).map(f => ((seed * 31 + f * 17) % 200) - 100).sum * ch

  private val flacRates = Map(8 -> 32000, 9 -> 44100, 10 -> 48000)

  private val flacParams = for {
    rateCode <- Gen.oneOf(8, 9, 10)
    channels <- Gen.choose(1, 8)
    bps <- Gen.oneOf(8, 16)
    nFrames <- Gen.choose(1, 127)
    seed <- Gen.choose(0L, 1000000L)
  } yield (rateCode, channels, bps, nFrames, seed)

  property("flac decode(encode(params)) reconstructs params and samples") =
    Prop.forAll(flacParams) { case (rc, ch, bps, nf, seed) =>
      val b = Multimodal.encodeFlac(rc, ch, bps, nf, seed)
      Multimodal.parseFlac(b).contains(
        (flacRates(rc), ch, bps, nf, nf.toLong * 4096, refSum(seed, nf, ch)))
    }

  property("flac: EVERY single-byte flip in the frame region rejects") =
    Prop.forAll(flacParams, Gen.choose(0, Int.MaxValue),
        Gen.choose(1, 255)) { (p, posRaw, xor) =>
      val (rc, ch, bps, nf, seed) = p
      val b = Multimodal.encodeFlac(rc, ch, bps, nf, seed)
      val frameStart = 4 + 4 + 34
      val pos = frameStart + posRaw % (b.length - frameStart)
      val c = b.clone()
      c(pos) = (c(pos) ^ xor).toByte
      Multimodal.parseFlac(c).isEmpty
    }

  private val mp4Params = for {
    rate <- Gen.oneOf(32000, 44100, 48000)
    channels <- Gen.choose(1, 2)
    nSamples <- Gen.choose(1L, 10000000L)
  } yield (rate, channels, nSamples)

  property("mp4 decode(encode(params)) reconstructs the catalog surface") =
    Prop.forAll(mp4Params) { case (rate, ch, n) =>
      Multimodal.parseMp4(Multimodal.encodeMp4(rate, ch, n)).contains(
        ("M4A ", 1000, n * 1000 / rate, 1, "mp4a", rate, ch, n))
    }

  // cutting exactly the trailing (empty) mdat box leaves a
  // structurally conforming file — the metadata must then be
  // UNCHANGED; any other cut must reject outright
  property("mp4: truncation never MIS-parses") =
    Prop.forAll(mp4Params, Gen.choose(1, 4096)) { (p, cutRaw) =>
      val (rate, ch, n) = p
      val b = Multimodal.encodeMp4(rate, ch, n)
      val cut = cutRaw % b.length + 1
      val full = Multimodal.parseMp4(b)
      val got = Multimodal.parseMp4(b.dropRight(cut))
      got.isEmpty || (cut == 8 && got == full)
    }

  private val flacPredParams = for {
    rateCode <- Gen.oneOf(8, 9, 10)
    channels <- Gen.choose(1, 8)
    nFrames <- Gen.choose(1, 16)
    seed <- Gen.choose(0L, 1000000L)
  } yield (rateCode, channels, nFrames, seed)

  private def refSumPred(seed: Long, nf: Int, ch: Int): Long =
    (0 until nf).map { f =>
      val t = ((seed + f) % 7).toInt
      val c0 = (seed * 31 + f * 17) % 50 - 25
      val c1 = if (t == 0) 0L else (seed * 13 + f * 7) % 7 - 3
      val d = if (t == 0) 0L else (seed + f) % 4
      4096L * c0 + 8386560L * c1 + 2048L * d
    }.sum * ch

  property("flac PCM decode(encodePred(params)) reconstructs every sample") =
    Prop.forAll(flacPredParams) { case (rc, ch, nf, seed) =>
      val b = Multimodal.encodeFlacPred(rc, ch, nf, seed)
      Multimodal.parseFlacPcm(b).contains(
        (flacRates(rc), ch, 16, nf, nf.toLong * 4096,
          refSumPred(seed, nf, ch)))
    }

  // the LPC fixture's value_sum law is predictor-independent (the
  // ramp-plus-wiggle target never has the CONSTANT special case)
  private def refSumLpc(seed: Long, nf: Int, ch: Int): Long =
    (0 until nf).map { f =>
      4096L * ((seed * 31 + f * 17) % 50 - 25) +
        8386560L * ((seed * 13 + f * 7) % 7 - 3) +
        2048L * ((seed + f) % 4)
    }.sum * ch

  property("flac PCM decode(encodeLpc(params)) reconstructs every sample") =
    Prop.forAll(flacPredParams) { case (rc, ch, nf, seed) =>
      val b = Multimodal.encodeFlacLpc(rc, ch, nf, seed)
      Multimodal.parseFlacPcm(b).contains(
        (flacRates(rc), ch, 16, nf, nf.toLong * 4096,
          refSumLpc(seed, nf, ch)))
    }

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

  property("flac PCM decode(encodeStereo(params)) undoes the decorrelation exactly") =
    Prop.forAll(Gen.oneOf(8, 9, 10), Gen.choose(1, 16),
        Gen.choose(0L, 1000000L)) { (rc, nf, seed) =>
      val b = Multimodal.encodeFlacStereo(rc, nf, seed)
      Multimodal.parseFlacPcm(b).contains(
        (flacRates(rc), 2, 16, nf, nf.toLong * 4096,
          refSumStereo(seed, nf)))
    }

  property("flac PCM agrees with the catalog parser on constant streams (x4096)") =
    Prop.forAll(flacParams) { case (rc, ch, bps, nf, seed) =>
      val b = Multimodal.encodeFlac(rc, ch, bps, nf, seed)
      (Multimodal.parseFlac(b), Multimodal.parseFlacPcm(b)) match {
        case (Some((r1, c1, b1, n1, t1, s1)), Some((r2, c2, b2, n2, t2, s2))) =>
          r1 == r2 && c1 == c2 && b1 == b2 && n1 == n2 && t1 == t2 &&
            s2 == 4096L * s1
        case _ => false
      }
    }

  private val aviParams = for {
    w <- Gen.choose(8, 24)
    h <- Gen.choose(6, 18)
    rate <- Gen.choose(5, 60)
    grays <- Gen.nonEmptyListOf(Gen.choose(0, 255)).map(_.take(6))
  } yield (w, h, rate, grays)

  property("avi decode(encode(params)) reconstructs frames bit-exactly") =
    Prop.forAll(aviParams) { case (w, h, rate, grays) =>
      val b = Multimodal.encodeAvi(w, h, grays, rate)
      Multimodal.parseAvi(b).contains(
        (w, h, grays.length, (1000000 / rate).toLong,
          grays.length * 1000L / rate, 3L * w * h * grays.sum))
    }

  property("avi: truncation never parses") =
    Prop.forAll(aviParams, Gen.choose(1, 4096)) { (p, cutRaw) =>
      val (w, h, rate, grays) = p
      val b = Multimodal.encodeAvi(w, h, grays, rate)
      Multimodal.parseAvi(b.dropRight(cutRaw % b.length + 1)).isEmpty
    }

  // ---- IMA-ADPCM: randomized state-machine round trip -------------

  private val adpcmParams = for {
    rate <- Gen.oneOf(8000, 16000, 44100)
    ch <- Gen.choose(1, 2)
    w <- Gen.choose(1, 6)           // samplesPerBlock = 1 + 8w
    nBlocks <- Gen.choose(1, 5)
    seed <- Gen.choose(0L, 1000000L)
  } yield (rate, ch, w, nBlocks, seed)

  private val imaStepTab = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19,
    21, 23, 25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97,
    107, 118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
    408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
    1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
    4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
  private val imaIdxTab = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  property("adpcm decode(encode) matches the reference recurrence on random streams") =
    Prop.forAll(adpcmParams) { case (rate, ch, w, nb, seed) =>
      val spb = 1 + 8 * w
      def hdr(b: Int, c: Int): (Int, Int) =
        ((((seed * 31 + b * 17 + c * 29) % 4001) - 2000).toInt,
          ((seed * 7 + b * 3 + c * 5) % 89).toInt)
      def nib(b: Int, c: Int, j: Int): Int =
        ((seed * 13 + b * 7 + c * 3 + j * 5) % 16).toInt
      val bytes = Multimodal.encodeAdpcmWav(rate, ch, spb, nb, hdr, nib)
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      for (b <- 0 until nb; c <- 0 until ch) {
        var (p, ix) = hdr(b, c)
        sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
        for (j <- 0 until 8 * w) {
          val v = nib(b, c, j)
          val st = imaStepTab(ix)
          var d = st >> 3
          if ((v & 4) != 0) d += st
          if ((v & 2) != 0) d += st >> 1
          if ((v & 1) != 0) d += st >> 2
          p = if ((v & 8) != 0) math.max(p - d, -32768)
              else math.min(p + d, 32767)
          ix = math.min(math.max(ix + imaIdxTab(v & 7), 0), 88)
          sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
        }
      }
      Multimodal.parseAdpcmWav(bytes).contains(
        (rate, ch, spb, nb, nb.toLong * spb * ch, sum, mn, mx))
    }

  property("adpcm: truncation never parses") =
    Prop.forAll(adpcmParams, Gen.choose(1, 4096)) { case ((rate, ch, w, nb, seed), cutRaw) =>
      val b = Multimodal.encodeAdpcmWav(rate, ch, 1 + 8 * w, nb,
        (bk, c) => (0, (seed % 89).toInt), (bk, c, j) => (j * 7 + seed.toInt) % 16)
      Multimodal.parseAdpcmWav(b.dropRight(cutRaw % b.length + 1)).isEmpty
    }

  // ---- G.711: randomized companding round trip --------------------

  private val g711Params = for {
    rate <- Gen.oneOf(8000, 16000)
    ch <- Gen.choose(1, 2)
    tag <- Gen.oneOf(6, 7)
    frames <- Gen.choose(1, 500)
    seed <- Gen.choose(0, 100000)
  } yield (rate, ch, tag, frames, seed)

  property("g711 decode(encode) matches the reference companding on random bytes") =
    Prop.forAll(g711Params) { case (rate, ch, tag, frames, seed) =>
      val raw = Array.tabulate[Byte](frames * ch)(j => ((seed + j * 41) % 256).toByte)
      def dec(v: Int): Int =
        if (tag == 7) {
          val u = (~v) & 0xff
          val t = (((u & 0xf) << 3) + 132) << ((u >> 4) & 7)
          if ((u & 0x80) != 0) 132 - t else t - 132
        } else {
          val a = v ^ 0x55
          val m = a & 0xf; val seg = (a >> 4) & 7
          val t = if (seg == 0) (m << 4) + 8
            else if (seg == 1) (m << 4) + 0x108
            else ((m << 4) + 0x108) << (seg - 1)
          if ((a & 0x80) != 0) t else -t
        }
      val vals = raw.map(b => dec(b & 0xff))
      Multimodal.parseG711Wav(
        Multimodal.encodeG711Wav(rate, ch, tag, raw)).contains(
        (if (tag == 7) "ulaw" else "alaw", rate, ch, raw.length.toLong,
          vals.map(_.toLong).sum, vals.min, vals.max))
    }

  property("g711: truncation never parses") =
    Prop.forAll(g711Params, Gen.choose(1, 4096)) { case ((rate, ch, tag, frames, seed), cutRaw) =>
      val raw = Array.tabulate[Byte](frames * ch)(j => ((seed + j) % 256).toByte)
      val b = Multimodal.encodeG711Wav(rate, ch, tag, raw)
      // cut past the RIFF word-alignment pad byte (losing only the
      // pad leaves every chunk intact — legal to parse)
      val pad = raw.length & 1
      val cut = pad + 1 + cutRaw % (b.length - pad - 1)
      Multimodal.parseG711Wav(b.dropRight(cut)).isEmpty
    }
}
