package graft

import graft.operators.{Multimodal, WebpLake}
import graft.operators.WebpLake.EncOpts

/** VP8L codec: encode→decode round-trip across every transform and
  * entropy-layer combination, predictor-mode sweep, container and
  * bitstream strictness, fuzz sweeps. */
class WebpLakeSpec extends SparkSpec {

  // deterministic pseudo-random ARGB image (seeded; no Math.random)
  private def image(seed: Int, w: Int, h: Int,
      colors: Int = 0, opaque: Boolean = true): Array[Int] = {
    var s = seed * 2654435761L + 97
    def next(): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toInt
    }
    Array.tabulate(w * h) { _ =>
      val v = next()
      val px =
        if (colors > 0) { // draw from a small deterministic palette
          val k = math.floorMod(v, colors)
          (0xff << 24) | (k * 37 % 256 << 16) | (k * 91 % 256 << 8) |
            (k * 53 % 256)
        } else if (opaque) v | 0xff000000
        else v
      px
    }
  }

  private def roundTrip(px: Array[Int], w: Int, h: Int,
      opts: EncOpts, label: String): Unit = {
    val bytes = WebpLake.encodeVp8l(px, w, h, opts)
    val got = WebpLake.parseVp8l(bytes)
    assert(got.nonEmpty, s"$label: decode failed")
    val img = got.get
    assert(img.width == w && img.height == h, label)
    assert(java.util.Arrays.equals(img.argb, px), s"$label: pixels differ")
  }

  test("round-trip: plain literals, odd sizes, non-opaque alpha") {
    roundTrip(image(1, 9, 8), 9, 8, EncOpts(), "9x8")
    roundTrip(image(2, 13, 7), 13, 7, EncOpts(), "13x7")
    roundTrip(image(3, 1, 1), 1, 1, EncOpts(), "1x1")
    roundTrip(image(4, 31, 2, opaque = false), 31, 2, EncOpts(),
      "alpha channel carried")
    // uniform image: single-symbol (zero-bit) codes everywhere
    roundTrip(Array.fill(48)(0xff102030), 8, 6, EncOpts(), "uniform")
  }

  test("round-trip: every predictor mode, all four transforms, combos") {
    for (mode <- 0 to 13)
      roundTrip(image(10 + mode, 16, 12), 16, 12,
        EncOpts(predictor = Some(mode)), s"predictor mode $mode")
    roundTrip(image(30, 16, 12), 16, 12, EncOpts(subtractGreen = true),
      "subtract-green")
    roundTrip(image(31, 16, 12), 16, 12,
      EncOpts(colorElt = Some(0x2a1b3c)), "color transform")
    for (nc <- Seq(2, 3, 4, 9, 16, 17, 200)) // all bundling widths
      roundTrip(image(32 + nc, 21, 9, colors = nc), 21, 9,
        EncOpts(palette = true), s"palette $nc colors")
    roundTrip(image(40, 16, 12), 16, 12,
      EncOpts(subtractGreen = true, predictor = Some(11),
        colorElt = Some(0x106090)), "predictor + color + subtract-green")
  }

  test("round-trip: color cache and LZ77 row copies") {
    roundTrip(image(50, 16, 12, colors = 6), 16, 12,
      EncOpts(cacheBits = 4), "color cache 4 bits")
    roundTrip(image(51, 16, 12, colors = 40), 16, 12,
      EncOpts(cacheBits = 2), "cache smaller than color count")
    // row-replicated image exercises backward references (dist = w)
    val rows = Array.tabulate(12 * 10) { i =>
      val y = i / 12
      image(52 + y / 3, 12, 1)(i % 12) // every 3 rows identical
    }
    roundTrip(rows, 12, 10, EncOpts(rowCopy = true), "row-copy LZ77")
    roundTrip(rows, 12, 10, EncOpts(rowCopy = true, cacheBits = 5),
      "row-copy + cache")
    roundTrip(rows, 12, 10,
      EncOpts(rowCopy = true, subtractGreen = true),
      "row-copy + subtract-green")
  }

  test("hand-computed 1x1 vector pins the bit conventions exactly") {
    // a 1x1 pixel 0xff804020 under default options reduces to five
    // simple Huffman codes and zero data bits; every byte below was
    // computed BY HAND from the spec's LSB-first bit packing, so this
    // pins bit order / simple-code layout independent of the
    // encoder/decoder round-trip (which could share a misreading)
    val px = Array(0xff804020)
    val bytes = WebpLake.encodeVp8l(px, 1, 1, EncOpts())
    val payload = Array(0x2f, 0x00, 0x00, 0x00, 0x00, 0x28, 0x50, 0x01,
      0x0b, 0xd2, 0xff, 0x00).map(_.toByte)
    val expect =
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte](24, 0, 0, 0) ++
        "WEBPVP8L".getBytes("US-ASCII") ++
        Array[Byte](12, 0, 0, 0) ++ payload
    assert(bytes.toSeq == expect.toSeq,
      bytes.map(b => f"${b & 0xff}%02x").mkString(" "))
    val img = WebpLake.parseVp8l(bytes).get
    assert(img.width == 1 && img.height == 1 && img.argb(0) == 0xff804020)
  }

  test("container + bitstream strictness: every lie rejects") {
    val good = WebpLake.encodeVp8l(image(60, 10, 8), 10, 8, EncOpts())
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "RIFF magic flip" -> mut(c => c(0) = 'Q'.toByte),
      "WEBP fourcc flip" -> mut(c => c(8) = 'X'.toByte),
      "VP8L fourcc flip (lossy VP8 rejected)" ->
        mut(c => c(15) = ' '.toByte),
      "riff size lie" -> mut(c => c(4) = (c(4) + 1).toByte),
      "chunk size lie" -> mut(c => c(16) = (c(16) + 1).toByte),
      "signature byte" -> mut(c => c(20) = 0x2e.toByte),
      "version bits nonzero" ->
        // header bits: sig(8) w(14) h(14) alpha(1) version(3) — the
        // last version bit is bit 39 of the payload = byte 24 bit 7
        mut(c => c(24) = (c(24) | 0x80).toByte),
      "truncated mid-stream" -> good.dropRight(6),
      "trailing bytes" -> (good ++ Array[Byte](0, 0, 0, 0)))
    cases.foreach { case (name, b) =>
      assert(WebpLake.parseVp8l(b).isEmpty, name)
    }
    assert(WebpLake.parseVp8l(good).nonEmpty, "control: unmutated parses")
    assert(WebpLake.parseVp8l(null).isEmpty)
    assert(WebpLake.parseVp8l(Array.emptyByteArray).isEmpty)
  }

  test("byte-flip + truncation sweeps never throw, and dims are stable") {
    val seeds = Seq(
      WebpLake.encodeVp8l(image(70, 12, 9), 12, 9,
        EncOpts(subtractGreen = true)),
      WebpLake.encodeVp8l(image(71, 12, 9, colors = 5), 12, 9,
        EncOpts(palette = true)),
      WebpLake.encodeVp8l(image(72, 12, 9), 12, 9,
        EncOpts(predictor = Some(12), cacheBits = 3)))
    for (src <- seeds; i <- src.indices; bit <- Seq(1, 0x40)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      WebpLake.parseVp8l(c).foreach { img =>
        // a surviving mutation must still produce a well-formed image
        assert(img.argb.length == img.width * img.height)
      }
    }
    val s0 = seeds.head
    (0 until s0.length).foreach(n => WebpLake.parseVp8l(s0.take(n)))
  }

  test("container census: lossless, lossy and extended profiles") {
    // lossless: census dims without decode, consistent with parseVp8l
    val ll = Multimodal.encodeDHashWebp((x, y) => (x + y) % 2 == 0, 2)
    assert(WebpLake.webpCensus(ll).contains(("lossless", 18, 16)))
    // lossy: the RFC 6386 key-frame header (no pixel decode)
    val lossy = WebpLake.riffWebp(Seq("VP8 " ->
      WebpLake.vp8KeyPayload(640, 480, 12, 7)))
    assert(WebpLake.webpCensus(lossy).contains(("lossy", 640, 480)))
    // odd-sized payload exercises the RIFF pad law
    val odd = WebpLake.riffWebp(Seq("VP8 " ->
      WebpLake.vp8KeyPayload(33, 21, 5, 3)))
    assert(WebpLake.webpCensus(odd).contains(("lossy", 33, 21)))
    // extended: canvas dims from VP8X over a VP8 still
    val ext = WebpLake.riffWebp(Seq(
      "VP8X" -> WebpLake.vp8xPayload(4000, 3000),
      "VP8 " -> WebpLake.vp8KeyPayload(16, 16, 4, 1)))
    assert(WebpLake.webpCensus(ext).contains(("extended", 4000, 3000)))
    // extended animation: ANMF frames satisfy the flag law; a still
    // chunk does NOT satisfy an animation flag and vice versa
    val anim = WebpLake.riffWebp(Seq(
      "VP8X" -> WebpLake.vp8xPayload(100, 50, flags = 0x02),
      "ANMF" -> Array.fill[Byte](24)(1)))
    assert(WebpLake.webpCensus(anim).contains(("extended", 100, 50)))
    assert(WebpLake.webpCensus(WebpLake.riffWebp(Seq(
      "VP8X" -> WebpLake.vp8xPayload(100, 50, flags = 0x02),
      "VP8 " -> WebpLake.vp8KeyPayload(16, 16, 4, 1)))).isEmpty,
      "anim flag without frames")
    assert(WebpLake.webpCensus(WebpLake.riffWebp(Seq(
      "VP8X" -> WebpLake.vp8xPayload(100, 50)))).isEmpty,
      "extended without any image chunk")
  }

  test("container census strictness: every header lie rejects") {
    val good = WebpLake.riffWebp(Seq("VP8 " ->
      WebpLake.vp8KeyPayload(64, 48, 8, 5)))
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases = Seq(
      // payload starts at 20: frame tag bytes 20-22, start code 23-25
      "inter frame" -> mut(c => c(20) = (c(20) | 1).toByte),
      "version 4" -> mut(c => c(20) = ((c(20) & ~0x0e) | 8).toByte),
      "hidden frame" -> mut(c => c(20) = (c(20) & ~0x10).toByte),
      "bad start code" -> mut(c => c(23) = 0x9c.toByte),
      "riff size lie" -> mut(c => c(4) = (c(4) + 1).toByte),
      "partition overruns chunk" ->
        mut(c => c(22) = (c(22) + 0x40).toByte),
      "truncated" -> good.dropRight(3))
    cases.foreach { case (name, b) =>
      assert(WebpLake.webpCensus(b).isEmpty, name)
    }
    assert(WebpLake.webpCensus(good).nonEmpty, "control")
    assert(WebpLake.webpCensus(null).isEmpty)
    // zero-dimension and reserved-bit lies
    assert(WebpLake.webpCensus(WebpLake.riffWebp(Seq("VP8 " -> {
      val p = WebpLake.vp8KeyPayload(1, 1, 4, 0)
      p(6) = 0; p // width 0
    }))).isEmpty, "zero width")
    val badFlags = WebpLake.riffWebp(Seq(
      "VP8X" -> { val p = WebpLake.vp8xPayload(10, 10); p(0) = 0x40; p },
      "VP8 " -> WebpLake.vp8KeyPayload(16, 16, 4, 1)))
    assert(WebpLake.webpCensus(badFlags).isEmpty, "reserved flag bit")
    val badRsv = WebpLake.riffWebp(Seq(
      "VP8X" -> { val p = WebpLake.vp8xPayload(10, 10); p(2) = 1; p },
      "VP8 " -> WebpLake.vp8KeyPayload(16, 16, 4, 1)))
    assert(WebpLake.webpCensus(badRsv).isEmpty, "reserved bytes")
    // census never throws across flips/truncations
    for (i <- good.indices; bit <- Seq(1, 0x40)) {
      val c = good.clone(); c(i) = (c(i) ^ bit).toByte
      WebpLake.webpCensus(c)
    }
    (0 until good.length).foreach(n => WebpLake.webpCensus(good.take(n)))
  }
}
