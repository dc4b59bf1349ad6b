package graft

import graft.operators.{Multimodal, TiffLake}
import graft.operators.TiffLake.TiffOpts

/** CCITT G4 (ITU-T T.6) codec laws: the modified-Huffman alphabets
  * are structurally validated (prefix-free, complete, length-bounded),
  * the 2D coding is pinned by HAND-DERIVED wire vectors (bitstreams
  * written out from the published mode/run tables by hand, then fed
  * to the decoder — independent of the in-repo encoder, so a shared
  * transcription slip cannot hide), and the full encoder/decoder pair
  * round-trips across run lengths that cross every makeup-code
  * boundary (64, the 1664 short code, 1792 extended, and the repeated
  * 2560 case), both sequence orders, strips and tiles, and EOFB
  * closing. Purely JVM-side except the fixture checks. */
class G4Spec extends SparkSpec {

  // ------------------------------------------------------------------
  // alphabet structure

  private def codes(black: Boolean): Seq[(Int, Int, Int)] =
    TiffLake.mhAlphabet(black).toSeq

  test("MH alphabets: complete, prefix-free, length-bounded") {
    for (black <- Seq(false, true)) {
      val cs = codes(black)
      // completeness: terminating 0-63, makeup 64..1728 step 64,
      // extended 1792..2560 step 64 — one code each, no duplicates
      assert(cs.map(_._1).sorted ==
        ((0 to 63) ++ (64 to 2560 by 64)).sorted, s"black=$black runs")
      assert(cs.map(_._1).distinct.length == cs.length)
      // length bound: T.4 codes are 2..13 bits; code fits its length
      cs.foreach { case (run, code, len) =>
        assert(len >= 2 && len <= 13, s"black=$black run=$run len")
        assert(code >= 0 && code < (1 << len), s"black=$black run=$run")
      }
      // prefix-freeness: no code word is a prefix of another (the
      // property a transcription slip is most likely to break)
      for (a <- cs; b <- cs if a != b) {
        val (_, ca, la) = a
        val (_, cb, lb) = b
        if (la <= lb)
          assert(ca != (cb >> (lb - la)),
            s"black=$black: run ${a._1} is a prefix of run ${b._1}")
      }
      // the 2D mode codes must also be distinguishable from every MH
      // code START — mode codes are read first, so it suffices that
      // no mode code is a prefix of... actually mode and MH alphabets
      // live in disjoint positions (mode at element start, MH only
      // inside horizontal mode), so no cross-check is needed; the
      // vertical/pass/horizontal set itself must be prefix-free:
      val modes = Seq((1, 1), (3, 3), (2, 3), (1, 3), (1, 4),
        (3, 6), (2, 6), (3, 7), (2, 7))
      for (x <- modes; yb <- modes if x != yb) {
        val (cx, lx) = x
        val (cy, ly) = yb
        if (lx <= ly) assert(cx != (cy >> (ly - lx)), s"mode $x vs $yb")
      }
    }
  }

  test("MH alphabet spot vectors from the published tables") {
    // famous entries, written from T.4 directly
    val w = codes(false).map(c => c._1 -> ((c._2, c._3))).toMap
    val b = codes(true).map(c => c._1 -> ((c._2, c._3))).toMap
    assert(w(0) == ((Integer.parseInt("00110101", 2), 8)))
    assert(w(1) == ((Integer.parseInt("000111", 2), 6)))
    assert(w(2) == ((Integer.parseInt("0111", 2), 4)))
    assert(w(63) == ((Integer.parseInt("00110100", 2), 8)))
    assert(w(64) == ((Integer.parseInt("11011", 2), 5)))
    assert(w(128) == ((Integer.parseInt("10010", 2), 5)))
    assert(w(1664) == ((Integer.parseInt("011000", 2), 6)))
    assert(w(2560) == ((Integer.parseInt("000000011111", 2), 12)))
    assert(b(0) == ((Integer.parseInt("0000110111", 2), 10)))
    assert(b(1) == ((Integer.parseInt("010", 2), 3)))
    assert(b(2) == ((3, 2)))
    assert(b(3) == ((2, 2)))
    assert(b(63) == ((Integer.parseInt("000001100111", 2), 12)))
    assert(b(64) == ((Integer.parseInt("0000001111", 2), 10)))
    assert(b(1728) == ((Integer.parseInt("0000001100101", 2), 13)))
    assert(b(2560) == w(2560)) // extended makeup is colour-common
  }

  // ------------------------------------------------------------------
  // hand-derived wire vectors (decoder independence)

  private def bits(s: String): Array[Byte] = {
    val clean = s.filter(c => c == '0' || c == '1')
    val out = new Array[Byte]((clean.length + 7) / 8)
    clean.zipWithIndex.foreach { case (c, i) =>
      if (c == '1') out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
    }
    out
  }

  test("hand-derived bitstreams decode to the pinned pixels") {
    // all-white 8×1: V0 against the imaginary white line (b1 = 8)
    assert(TiffLake.g4Decode(bits("1"), 8, 1).forall(_ == 0))
    // all-black 8×1: first element is black at 0, b1 = 8 → |a1-b1| > 3
    // → horizontal: 001 + white run 0 (00110101) + black run 8 (000101)
    val blackRow = TiffLake.g4Decode(
      bits("001 00110101 000101"), 8, 1)
    assert(blackRow.forall(_ == 1))
    // BBBBWWWW 8×1: H + white 0 + black 4 (011), then white to the
    // edge: b1 = 8 (sentinel), a1 = 8 → V0
    val bw = TiffLake.g4Decode(bits("001 00110101 011 1"), 8, 1)
    assert(bw.toSeq == Seq[Byte](1, 1, 1, 1, 0, 0, 0, 0))
    // 70 black pixels: black run 70 = makeup 64 (0000001111) +
    // terminating 6 (0010) — crosses the makeup boundary
    val long = TiffLake.g4Decode(
      bits("001 00110101 0000001111 0010"), 70, 1)
    assert(long.forall(_ == 1))
    // two rows, vertical coding: row0 = WWBBBWWW (transitions 2,5),
    // row1 = WWWBBBWW (transitions 3,6): row0 H(w2=0111, b3=10) + V0;
    // row1 VR1 (011) twice + V0
    val two = TiffLake.g4Decode(
      bits("001 0111 10 1 011 011 1"), 8, 2)
    assert(two.toSeq == Seq[Byte](0, 0, 1, 1, 1, 0, 0, 0,
      0, 0, 0, 1, 1, 1, 0, 0))
    // pass mode: row0 = WBBWWWWW (transitions 1,3; H: white 1 =
    // 000111, black 2 = 11, then V0 to the edge), row1 all white
    // (pass over both ref transitions — b1=1, b2=3, next cur
    // transition a1=8, b2<a1 → P — then V0 against the sentinel)
    val pass = TiffLake.g4Decode(
      bits("001 000111 11 1 0001 1"), 8, 2)
    assert(pass.toSeq == Seq[Byte](0, 1, 1, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0))
    // VL coding: row0 = WWWWBBBB (transition 4; H: white 4 = 1011,
    // black 4 = 011, lands exactly on the edge), row1 = WWWBBBBB
    // (transition 3 = b1 - 1 → VL1, then V0 against the sentinel on
    // the black side)
    val vl = TiffLake.g4Decode(
      bits("001 1011 011 010 1"), 8, 2)
    assert(vl.toSeq == Seq[Byte](0, 0, 0, 0, 1, 1, 1, 1,
      0, 0, 0, 1, 1, 1, 1, 1))
    // EOFB closing is accepted and bounded
    assert(TiffLake.g4Decode(
      bits("1 000000000001 000000000001"), 8, 1).forall(_ == 0))
  }

  test("hand-derived rejects: EOL mid-stream, extension, trailing junk") {
    def rejects(s: String, w: Int, rows: Int): Unit =
      assertThrows[Throwable](TiffLake.g4Decode(bits(s), w, rows))
    intercept[Throwable](TiffLake.g4Decode(bits("0000000 1"), 8, 1))
    // uncompressed-mode extension 0000001xxx
    intercept[Throwable](TiffLake.g4Decode(bits("0000001 111"), 8, 1))
    // a second full byte after the row is neither pad nor EOFB
    intercept[Throwable](TiffLake.g4Decode(bits("1 00000000"), 8, 1))
    // EOFB with only one EOL
    intercept[Throwable](TiffLake.g4Decode(
      bits("1 000000000001 000000000000"), 8, 1))
    // run overruns the row: black 8 into a 6-wide row
    intercept[Throwable](TiffLake.g4Decode(
      bits("001 00110101 000101"), 6, 1))
    rejects("", 8, 1) // empty stream
  }

  // ------------------------------------------------------------------
  // CCITT MH 1D (TIFF Compression 2, "CCITT RLE")

  test("MH 1D: hand vectors, row byte-alignment, round-trips") {
    // BBBBWWWW: white 0 (00110101), black 4 (011), white 4 (1011) —
    // hand-derived, decoder-independent
    assert(TiffLake.mh1dDecode(bits("00110101 011 1011"), 8, 1).toSeq ==
      Seq[Byte](1, 1, 1, 1, 0, 0, 0, 0))
    // two rows, each byte-aligned: all-white 8 (10011) wait — white 8
    // = 10011: row0 all white, row1 all black (white 0 + black 8)
    assert(TiffLake.mh1dDecode(
      bits("10011 000 00110101 000101 00"), 8, 2).toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1))
    // strictness: a mid-row zero run would loop forever; the decoder
    // rejects it (white 0 after a black run)
    intercept[Throwable](TiffLake.mh1dDecode(
      bits("00110101 011 00110101 1011"), 8, 1))
    // a black 0 right after the leading white 0 as well
    intercept[Throwable](TiffLake.mh1dDecode(
      bits("00110101 0000110111 00110101 000101"), 8, 1))
    // run overrunning the row width
    intercept[Throwable](TiffLake.mh1dDecode(
      bits("10011"), 6, 1)) // white 8 into a 6-wide row
    intercept[Throwable](TiffLake.mh1dDecode(bits(""), 8, 1))
    // round-trips across makeup boundaries and shapes
    for (n <- Seq(1, 63, 64, 1664, 1792, 2624, 3000)) {
      val white = new Array[Byte](n)
      assert(java.util.Arrays.equals(
        TiffLake.mh1dDecode(TiffLake.mh1dEncode(white, n, 1), n, 1),
        white), s"white $n")
      val black = Array.fill[Byte](n)(1)
      assert(java.util.Arrays.equals(
        TiffLake.mh1dDecode(TiffLake.mh1dEncode(black, n, 1), n, 1),
        black), s"black $n")
    }
    val rnd = new scala.util.Random(46002)
    (0 until 80).foreach { t =>
      val w = 1 + rnd.nextInt(120)
      val rows = 1 + rnd.nextInt(16)
      val samples = Array.fill[Byte](w * rows)(
        if (rnd.nextInt(3) == 0) 1 else 0)
      val enc = TiffLake.mh1dEncode(samples, w, rows)
      assert(java.util.Arrays.equals(
        TiffLake.mh1dDecode(enc, w, rows), samples), s"sweep $t")
    }
    // container level: MH-1D strips and both dimensions
    val px = bilevelImage(77, 23, 18)
    val enc = TiffLake.encodeTiff(px, 23, 18, TiffOpts(photometric = 0,
      compression = 2, bitsPerSample = 1, rowsPerStrip = 5))
    val got = TiffLake.parseTiff(enc)
    assert(got.nonEmpty && java.util.Arrays.equals(got.get.argb, px),
      "MH-1D container round-trip")
    assert(got.get.compression == 2 && got.get.nStrips == 4)
  }

  // ------------------------------------------------------------------
  // CCITT G3 1D (TIFF Compression 3, T.4 EOL framing)

  test("G3 1D: hand vectors for EOL and fill framing, round-trips") {
    val eol = "000000000001"
    // one all-white 8-wide row: EOL then white 8 (10011) —
    // hand-derived from the T.4 tables, decoder-independent
    assert(TiffLake.g31dDecode(bits(eol + " 10011"), 8, 1,
      aligned = false).forall(_ == 0))
    // BBBBWWWW: EOL, white 0 (00110101), black 4 (011), white 4 (1011)
    assert(TiffLake.g31dDecode(bits(eol + " 00110101 011 1011"), 8, 1,
      aligned = false).toSeq == Seq[Byte](1, 1, 1, 1, 0, 0, 0, 0))
    // an EOL before EVERY row, rows NOT byte-aligned in between:
    // row0 all white (10011 — 5 bits), row1 all black (white 0 +
    // black 8 = 00110101 000101)
    assert(TiffLake.g31dDecode(
      bits(eol + " 10011 " + eol + " 00110101 000101"), 8, 2,
      aligned = false).toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1))
    // aligned mode (T4Options bit 2), fill hand-computed: first EOL
    // needs 4 fill zeros (0+4+12 = 16 = two bytes); after the 5-bit
    // row the second EOL needs 7 (21+7+12 = 40); the trailing 1 of
    // each EOL ends a byte exactly
    assert(TiffLake.g31dDecode(
      bits("0000 " + eol + " 10011 0000000 " + eol + " 00110101 000101"),
      8, 2, aligned = true).toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1))
    // hand-derived rejects
    // no leading EOL
    intercept[Throwable](TiffLake.g31dDecode(bits("10011"), 8, 1,
      aligned = false))
    // fill in unaligned mode (12 zeros before the 1)
    intercept[Throwable](TiffLake.g31dDecode(bits("0" + eol + " 10011"),
      8, 1, aligned = false))
    // aligned mode: EOL's trailing 1 does not end a byte
    intercept[Throwable](TiffLake.g31dDecode(bits(eol + " 10011"), 8, 1,
      aligned = true))
    // more fill than alignment can need: 12 fill zeros land the EOL
    // on a byte boundary, but past the 7-bit fill cap
    intercept[Throwable](TiffLake.g31dDecode(
      bits("000000000000" + eol + " 10011"), 8, 1, aligned = true))
    // RTC after the last row (T.4's six EOLs are not used in TIFF)
    intercept[Throwable](TiffLake.g31dDecode(
      bits(eol + " 10011 " + eol + eol + eol + eol + eol + eol), 8, 1,
      aligned = false))
    intercept[Throwable](TiffLake.g31dDecode(bits(""), 8, 1,
      aligned = false))
    // round-trips across makeup boundaries, both EOL modes
    for (n <- Seq(1, 63, 64, 1664, 1792, 2624, 3000);
        al <- Seq(false, true)) {
      val black = Array.fill[Byte](n)(1)
      assert(java.util.Arrays.equals(TiffLake.g31dDecode(
        TiffLake.g31dEncode(black, n, 1, al), n, 1, al), black),
        s"black $n aligned=$al")
    }
    val rnd = new scala.util.Random(46003)
    (0 until 80).foreach { t =>
      val w = 1 + rnd.nextInt(120)
      val rows = 1 + rnd.nextInt(16)
      val al = rnd.nextBoolean()
      val samples = Array.fill[Byte](w * rows)(
        if (rnd.nextInt(3) == 0) 1 else 0)
      val enc = TiffLake.g31dEncode(samples, w, rows, al)
      assert(java.util.Arrays.equals(
        TiffLake.g31dDecode(enc, w, rows, al), samples),
        s"sweep $t aligned=$al")
    }
    // container level: both T4Options modes, strips, both endians
    for (al <- Seq(false, true); be <- Seq(false, true)) {
      val px = bilevelImage(80 + (if (al) 1 else 0), 23, 18)
      val enc = TiffLake.encodeTiff(px, 23, 18, TiffOpts(
        bigEndian = be, photometric = 0, compression = 3,
        bitsPerSample = 1, rowsPerStrip = 5, t4Aligned = al))
      val got = TiffLake.parseTiff(enc)
      assert(got.nonEmpty && java.util.Arrays.equals(got.get.argb, px),
        s"G3 container aligned=$al be=$be")
      assert(got.get.compression == 3 && got.get.nStrips == 4)
    }
    // T4Options strictness: 2D bit, uncompressed bit, junk values,
    // and the tag riding a non-G3 compression all reject
    val good = TiffLake.encodeTiff(bilevelImage(82, 18, 17), 18, 17,
      TiffOpts(photometric = 0, compression = 3, bitsPerSample = 1))
    assert(TiffLake.parseTiff(good).nonEmpty, "G3 control")
    def patchT4(v: Int): Array[Byte] = {
      val c = good.clone()
      val ifd = (c(4) & 0xff) | ((c(5) & 0xff) << 8) |
        ((c(6) & 0xff) << 16) | ((c(7) & 0xff) << 24)
      // tag 292 = 0x0124 LE, type 4 (LONG), inline value at +8
      val i = (ifd until c.length - 12).find(k =>
        (c(k) & 0xff) == 0x24 && c(k + 1) == 1 && c(k + 2) == 4).get
      c(i + 8) = v.toByte
      c
    }
    assert(TiffLake.parseTiff(patchT4(2)).isEmpty, "uncompressed bit")
    assert(TiffLake.parseTiff(patchT4(3)).isEmpty, "2D + uncompressed")
    assert(TiffLake.parseTiff(patchT4(5)).isEmpty, "2D + aligned")
    assert(TiffLake.parseTiff(patchT4(8)).isEmpty, "junk option bit")
    // byte-flip sweep over the G3 container (never throws)
    for (i <- good.indices; bit <- Seq(1, 0x10)) {
      val c = good.clone(); c(i) = (c(i) ^ bit).toByte
      TiffLake.parseTiff(c).foreach { img =>
        assert(img.argb.length == img.width * img.height)
      }
    }
  }

  // ------------------------------------------------------------------
  // CCITT G3 2D (TIFF Compression 3, T4Options bit 0: T.4 sec 4.2)

  test("G3 2D: tag-bit hand vectors, K-factor round-trips") {
    val eol = "000000000001"
    // row0 1D (tag 1): WWBBBWWW = white 2 (0111), black 3 (10),
    // white 3 (1000); row1 2D (tag 0): same row = V0 V0 V0 against
    // the reference — hand-derived, decoder-independent
    val two = TiffLake.g32dDecode(
      bits(eol + "1" + " 0111 10 1000 " + eol + "0" + " 1 1 1"), 8, 2)
    assert(two.toSeq == Seq[Byte](0, 0, 1, 1, 1, 0, 0, 0,
      0, 0, 1, 1, 1, 0, 0, 0))
    // 2D row shifted right by one: VR1 VR1 V0
    val shifted = TiffLake.g32dDecode(
      bits(eol + "1" + " 0111 10 1000 " + eol + "0" + " 011 011 1"),
      8, 2)
    assert(shifted.toSeq == Seq[Byte](0, 0, 1, 1, 1, 0, 0, 0,
      0, 0, 0, 1, 1, 1, 0, 0))
    // all-1D stream decodes too (every tag 1)
    assert(TiffLake.g32dDecode(
      bits(eol + "1" + " 10011 " + eol + "1" + " 10011"), 8, 2)
      .forall(_ == 0))
    // rejects: missing EOL, fill before EOL (out of the 2D subset),
    // RTC tail
    intercept[Throwable](TiffLake.g32dDecode(bits("1 10011"), 8, 1))
    intercept[Throwable](TiffLake.g32dDecode(
      bits("0" + eol + "1 10011"), 8, 1))
    intercept[Throwable](TiffLake.g32dDecode(
      bits(eol + "1 10011 " + eol + eol + eol + eol + eol + eol), 8, 1))
    // K-factor round-trips: every k-th row 1D, the rest 2D
    val rnd = new scala.util.Random(46004)
    (0 until 60).foreach { t =>
      val w = 1 + rnd.nextInt(100)
      val rows = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(5)
      val samples = Array.fill[Byte](w * rows)(
        if (rnd.nextInt(3) == 0) 1 else 0)
      val enc = TiffLake.g32dEncode(samples, w, rows, k)
      assert(java.util.Arrays.equals(
        TiffLake.g32dDecode(enc, w, rows), samples), s"sweep $t k=$k")
    }
    // container level: T4Options = 1, strips, both endians
    for (be <- Seq(false, true)) {
      val px = bilevelImage(85, 23, 18)
      val enc = TiffLake.encodeTiff(px, 23, 18, TiffOpts(
        bigEndian = be, photometric = 0, compression = 3,
        bitsPerSample = 1, rowsPerStrip = 6, t42d = true))
      val got = TiffLake.parseTiff(enc)
      assert(got.nonEmpty && java.util.Arrays.equals(got.get.argb, px),
        s"G3 2D container be=$be")
      assert(got.get.compression == 3 && got.get.nStrips == 3)
    }
    // byte-flip sweep over a 2D container (never throws)
    val good = TiffLake.encodeTiff(bilevelImage(86, 18, 17), 18, 17,
      TiffOpts(photometric = 0, compression = 3, bitsPerSample = 1,
        t42d = true))
    for (i <- good.indices; bit <- Seq(1, 0x10)) {
      val c = good.clone(); c(i) = (c(i) ^ bit).toByte
      TiffLake.parseTiff(c).foreach { img =>
        assert(img.argb.length == img.width * img.height)
      }
    }
  }

  // ------------------------------------------------------------------
  // encoder/decoder round-trip across the makeup boundaries

  private def roundTrip(samples: Array[Byte], w: Int, rows: Int,
      eofb: Boolean = false): Unit = {
    val enc = TiffLake.g4Encode(samples, w, rows, eofb)
    val dec = TiffLake.g4Decode(enc, w, rows)
    assert(java.util.Arrays.equals(dec, samples),
      s"w=$w rows=$rows eofb=$eofb")
  }

  test("round-trip: run lengths across every makeup boundary") {
    // single-row runs: white-run and black-run of every interesting
    // length — terminating-only, one makeup, the 1664 short code,
    // extended makeup, repeated 2560 makeups
    for (n <- Seq(1, 2, 63, 64, 65, 127, 128, 192, 1663, 1664, 1665,
        1728, 1791, 1792, 2560, 2623, 2624, 3000, 5200)) {
      roundTrip(new Array[Byte](n), n, 1) // all white
      roundTrip(Array.fill[Byte](n)(1), n, 1) // all black
      // black prefix of every split inside a white row
      val half = new Array[Byte](n)
      java.util.Arrays.fill(half, 0, (n + 1) / 2, 1.toByte)
      roundTrip(half, n, 1)
    }
  }

  test("round-trip: seeded random pages, EOFB, single columns") {
    val rnd = new scala.util.Random(46001)
    (0 until 120).foreach { t =>
      val w = 1 + rnd.nextInt(200)
      val rows = 1 + rnd.nextInt(24)
      val samples = Array.fill[Byte](w * rows)(
        if (rnd.nextInt(4) == 0) 1 else 0)
      roundTrip(samples, w, rows, eofb = t % 3 == 0)
    }
    // runs-shaped pages (documents are runs, not noise)
    (0 until 60).foreach { t =>
      val w = 20 + rnd.nextInt(400)
      val rows = 1 + rnd.nextInt(12)
      val samples = new Array[Byte](w * rows)
      var p = 0
      var ink = false
      while (p < samples.length) {
        val run = 1 + rnd.nextInt(60)
        if (ink) java.util.Arrays.fill(samples, p,
          math.min(p + run, samples.length), 1.toByte)
        p += run
        ink = !ink
      }
      roundTrip(samples, w, rows, eofb = t % 2 == 0)
    }
    roundTrip(Array[Byte](1), 1, 1)
    roundTrip(Array[Byte](0, 1, 0, 1), 1, 4) // 1-wide column
  }

  // ------------------------------------------------------------------
  // container-level: bilevel TIFFs (raw + G4, strips + tiles)

  private def bilevelImage(seed: Int, w: Int, h: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h)(if (rnd.nextInt(3) == 0) 0xff000000 else 0xffffffff)
  }

  test("bilevel TIFF round-trip: raw and G4, strips and tiles, both endians") {
    for {
      be <- Seq(false, true)
      comp <- Seq(1, 4)
      pm <- if (comp == 4) Seq(0) else Seq(0, 1)
      (tw, tl) <- Seq((0, 0), (16, 16))
      rps <- if (tw > 0) Seq(0) else Seq(0, 3)
    } {
      val (w, h) = (21, 19)
      val px = bilevelImage(be.hashCode + comp * 7 + pm * 3 + tw + rps,
        w, h)
      val enc = TiffLake.encodeTiff(px, w, h, TiffOpts(bigEndian = be,
        photometric = pm, compression = comp, bitsPerSample = 1,
        rowsPerStrip = rps, tileWidth = tw, tileLength = tl))
      val got = TiffLake.parseTiff(enc)
      assert(got.nonEmpty, s"be=$be comp=$comp pm=$pm tiled=${tw > 0}")
      assert(java.util.Arrays.equals(got.get.argb, px),
        s"pixels: be=$be comp=$comp pm=$pm tiled=${tw > 0} rps=$rps")
    }
    // tiled 8-bit gray and RGB with LZW (the depth-8 tile path) —
    // gray photometrics carry the GREEN channel replicated
    for (pm <- Seq(1, 2); comp <- Seq(1, 5)) {
      val (w, h) = (37, 21)
      val rnd = new scala.util.Random(pm * 31 + comp)
      val px = Array.fill(w * h)(rnd.nextInt() | 0xff000000)
      val want =
        if (pm == 2) px
        else px.map { p =>
          val v = (p >> 8) & 0xff
          0xff000000 | (v << 16) | (v << 8) | v
        }
      val enc = TiffLake.encodeTiff(px, w, h, TiffOpts(photometric = pm,
        compression = comp, tileWidth = 16, tileLength = 16))
      val got = TiffLake.parseTiff(enc)
      assert(got.nonEmpty && java.util.Arrays.equals(got.get.argb, want),
        s"tiled8 pm=$pm comp=$comp")
      assert(got.get.nStrips == 3 * 2, "tile count")
    }
    // tiled LZW + predictor 2: differencing scopes to the TILE row
    val px = {
      val rnd = new scala.util.Random(99)
      Array.fill(37 * 21)(rnd.nextInt() | 0xff000000)
    }
    val predEnc = TiffLake.encodeTiff(px, 37, 21, TiffOpts(
      photometric = 2, compression = 5, predictor = 2,
      tileWidth = 16, tileLength = 16))
    val predGot = TiffLake.parseTiff(predEnc)
    assert(predGot.nonEmpty &&
      java.util.Arrays.equals(predGot.get.argb, px), "tiled predictor")
  }

  test("strictness: out-of-subset bilevel/tile shapes reject") {
    val good = TiffLake.encodeTiff(bilevelImage(5, 18, 17), 18, 17,
      TiffOpts(photometric = 0, compression = 4, bitsPerSample = 1))
    assert(TiffLake.parseTiff(good).nonEmpty, "control")
    // photometric 1 under G4 would silently invert scanned documents;
    // scan for the tag from the IFD offset, not from the data region
    def ifdAt(b: Array[Byte]): Int =
      (b(4) & 0xff) | ((b(5) & 0xff) << 8) | ((b(6) & 0xff) << 16) |
        ((b(7) & 0xff) << 24)
    def patchTag(b: Array[Byte], tagLo: Int, tagHi: Int,
        v: Int): Array[Byte] = {
      val c = b.clone()
      val i = (ifdAt(c) until c.length - 12).find(k =>
        (c(k) & 0xff) == tagLo && c(k + 1) == tagHi && c(k + 2) == 3).get
      c(i + 8) = v.toByte
      c
    }
    assert(TiffLake.parseTiff(patchTag(good, 0x06, 1, 1)).isEmpty,
      "G4 + pm1")
    // G4 byte corruption: every single-byte flip either rejects or
    // still yields a well-formed image (never throws)
    for (i <- good.indices; bit <- Seq(1, 0x10)) {
      val c = good.clone(); c(i) = (c(i) ^ bit).toByte
      TiffLake.parseTiff(c).foreach { img =>
        assert(img.argb.length == img.width * img.height)
      }
    }
    (0 until good.length).foreach(n => TiffLake.parseTiff(good.take(n)))
    // non-multiple-of-16 tile dims reject: hand-patch the 322 entry
    val tiledGood = TiffLake.encodeTiff(bilevelImage(6, 18, 17), 18, 17,
      TiffOpts(photometric = 0, compression = 4, bitsPerSample = 1,
        tileWidth = 16, tileLength = 16))
    assert(TiffLake.parseTiff(tiledGood).nonEmpty, "tiled control")
    assert(TiffLake.parseTiff(patchTag(tiledGood, 0x42, 1, 17)).isEmpty,
      "tile width % 16")
  }

  // ------------------------------------------------------------------
  // fixture law (the q222 bilevel variants)

  test("fixture bilevel variants decode to the bit law exactly") {
    val fx = TiffLake.tiffFixture(spark, 40).orderBy("id").collect()
    fx.foreach { r =>
      val i = r.getLong(0).toInt
      val v = i % 16
      if (v == 8 || v == 9 || v >= 11) {
        val s = 1 + i % 3
        val img = TiffLake.parseTiff(r.getAs[Array[Byte]](1)).get
        val want = TiffLake.bilevelLawPixels(Multimodal.dhashBit(i), s)
        assert(java.util.Arrays.equals(img.argb, want), s"id=$i pixels")
        val expComp = v match {
          case 8 => 1
          case 12 => 2
          case 13 | 14 | 15 => 3
          case _ => 4
        }
        assert(img.compression == expComp, s"id=$i comp")
        val expSegs =
          if (v == 11) ((9 * s + 15) / 16) * ((8 * s + 15) / 16)
          else if (v == 9) 1
          else if (v == 12) (8 * s + 3) / 4
          else if (v == 13) (8 * s + 1) / 2
          else if (v == 14) (8 * s + 4) / 5
          else if (v == 15) 1
          else (8 * s + 2) / 3
        assert(img.nStrips == expSegs, s"id=$i segments")
        // the extractTiff dhash law: bit k = black(k) && !black(k+1)
        val fp = Multimodal.parseDHash(r.getAs[Array[Byte]](1)).get._1
        var want2 = 0L
        for (y <- 0 until 8; x <- 0 until 8)
          if (Multimodal.dhashBit(i)(x, y) &&
            !Multimodal.dhashBit(i)(x + 1, y))
            want2 |= 1L << (y * 8 + x)
        assert(fp == want2, s"id=$i dhash")
      }
    }
  }
}
