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
}
