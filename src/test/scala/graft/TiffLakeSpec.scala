package graft

import graft.operators.TiffLake
import graft.operators.TiffLake.TiffOpts
import graft.operators.Multimodal

/** Baseline TIFF codec: encode→decode round-trip across photometrics
  * × compressions × endians × strip layouts × predictors, a
  * hand-built minimal file pinning the byte conventions independent
  * of the encoder, an LZW round-trip that crosses the 9→10→11-bit
  * width boundaries AND the 4094-entry clear, PackBits hand vectors,
  * a strictness matrix, fuzz sweeps, and format invariance against
  * the PNG twin. */
class TiffLakeSpec extends SparkSpec {

  // deterministic pseudo-random ARGB image (seeded; no Math.random)
  private def image(seed: Int, w: Int, h: Int, colors: Int = 0): Array[Int] = {
    var s = seed * 2654435761L + 97
    def next(): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toInt
    }
    Array.tabulate(w * h) { _ =>
      val v = next()
      if (colors > 0) {
        val k = math.floorMod(v, colors)
        0xff000000 | (k * 37 % 256 << 16) | (k * 91 % 256 << 8) |
          (k * 53 % 256)
      } else v | 0xff000000
    }
  }

  // gray projection of an ARGB image (what gray photometrics carry):
  // the encoder stores the GREEN channel, so round-trip equality for
  // photometric 0/1/3 is asserted on gray(g) replicated to all three
  private def grayOf(px: Array[Int]): Array[Int] =
    px.map { p =>
      val v = (p >> 8) & 0xff
      0xff000000 | (v << 16) | (v << 8) | v
    }

  private def roundTrip(px: Array[Int], w: Int, h: Int, opts: TiffOpts,
      label: String): Unit = {
    val bytes = TiffLake.encodeTiff(px, w, h, opts)
    val got = TiffLake.parseTiff(bytes)
    assert(got.nonEmpty, s"$label: decode failed")
    val img = got.get
    assert(img.width == w && img.height == h, label)
    // RGB and palette restore full color; gray photometrics carry the
    // green channel replicated
    val want =
      if (opts.photometric == 2 || opts.photometric == 3) px
      else grayOf(px)
    assert(java.util.Arrays.equals(img.argb, want), s"$label: pixels differ")
    assert(img.bigEndian == opts.bigEndian, label)
    assert(img.compression == opts.compression, label)
  }

  test("round-trip: photometrics x compressions x endians x strips") {
    for {
      be <- Seq(false, true)
      pm <- Seq(0, 1, 2, 3)
      comp <- Seq(1, 5, 32773)
      rps <- Seq(0, 1, 3)
    } {
      val px =
        if (pm == 3) image(pm * 100 + comp, 11, 7, colors = 9)
        else image(pm * 100 + comp + (if (be) 7 else 0), 11, 7)
      roundTrip(px, 11, 7, TiffOpts(bigEndian = be, photometric = pm,
        compression = comp, rowsPerStrip = rps),
        s"be=$be pm=$pm comp=$comp rps=$rps")
    }
    // predictor 2 over LZW, both endians, gray + RGB, multi-strip
    for (be <- Seq(false, true); pm <- Seq(1, 2))
      roundTrip(image(50 + pm, 13, 9), 13, 9,
        TiffOpts(bigEndian = be, photometric = pm, compression = 5,
          predictor = 2, rowsPerStrip = 4), s"pred2 be=$be pm=$pm")
    // single pixel, uniform image (PackBits all-runs), 256-color palette
    roundTrip(image(60, 1, 1), 1, 1, TiffOpts(), "1x1")
    roundTrip(Array.fill(35)(0xff404040), 7, 5,
      TiffOpts(compression = 32773), "uniform packbits")
    roundTrip(image(61, 32, 8, colors = 256), 32, 8,
      TiffOpts(photometric = 3), "palette 256 colors")
  }

  test("LZW round-trip crosses 9/10/11-bit widths and the table clear") {
    // high-entropy RGB raster: LZW adds roughly one table entry per
    // ~2 input bytes, so 64x48x3 = 9216 bytes crosses 510 (9→10),
    // 1022 (10→11) and the 4094-entry clear-and-reset — the width
    // derivation in TiffLake's comment is exercised, not just argued
    val px = image(70, 64, 48)
    roundTrip(px, 64, 48, TiffOpts(photometric = 2, compression = 5),
      "lzw width boundaries")
    roundTrip(px, 64, 48, TiffOpts(photometric = 2, compression = 5,
      predictor = 2), "lzw + predictor")
    // direct kernel check with an exact byte count
    val raw = new Array[Byte](20000)
    var s = 0x9e3779b97f4a7c15L
    raw.indices.foreach { i =>
      s = s * 6364136223846793005L + 1442695040888963407L
      raw(i) = (s >>> 56).toByte
    }
    val enc = TiffLake.lzwEncode(raw)
    val tiff = TiffLake.encodeTiff(
      raw.map(b => 0xff000000 | ((b & 0xff) << 16) | ((b & 0xff) << 8)
        | (b & 0xff)), 100, 200, TiffOpts(compression = 5))
    assert(TiffLake.parseTiff(tiff).nonEmpty, s"kernel ${enc.length}")
  }

  test("randomized sweep: arbitrary shapes x compressions round-trip") {
    // 150 seeded-random cases over the whole wire grid — sizes that
    // hit 1-pixel rows, strip remainders, LZW streams from a few
    // bytes to several KB (KwKwK sequences arise naturally from
    // random bytes), palette fallback excluded (random pixels exceed
    // 256 colors)
    val rnd = new scala.util.Random(41507)
    (0 until 150).foreach { t =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val pm = Seq(0, 1, 2)(rnd.nextInt(3))
      val comp = Seq(1, 5, 32773)(rnd.nextInt(3))
      val pred = if (comp == 5 && rnd.nextBoolean()) 2 else 1
      val rps = if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(h)
      val px = Array.fill(w * h)(rnd.nextInt() | 0xff000000)
      roundTrip(px, w, h, TiffOpts(bigEndian = rnd.nextBoolean(),
        photometric = pm, compression = comp, predictor = pred,
        rowsPerStrip = rps), s"sweep#$t w=$w h=$h pm=$pm comp=$comp")
    }
  }

  test("LZW flush at the early-change boundary (phantom-entry law)") {
    // the decoder adds one phantom table entry after the final data
    // code; when that add lands exactly on 510/1022/2046 the EOI is
    // read one bit wider than a naive encoder writes it. 300 seeded
    // 16x16 gray tiles land on the boundary by volume (a sweep of
    // this shape found the original miss) — every one must round-trip
    val rnd = new scala.util.Random(36)
    (0 until 300).foreach { t =>
      val px = Array.fill(16 * 16)(rnd.nextInt() | 0xff000000)
      val enc = TiffLake.encodeTiff(px, 16, 16,
        TiffOpts(photometric = 1, compression = 5))
      val got = TiffLake.parseTiff(enc)
      assert(got.nonEmpty, s"seed case $t failed to parse")
      assert(java.util.Arrays.equals(got.get.argb, grayOf(px)), s"case $t")
    }
  }

  test("hand-built minimal TIFFs pin the byte conventions") {
    // 1x1 gray pixel 0x55 at offset 8, IFD at 10, built by hand in
    // BOTH byte orders — pins header layout, entry packing, inline
    // SHORT placement and the LONG strip pointer independent of the
    // encoder (which could share a misreading with the decoder)
    def mk(be: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit =
        if (be) { out.write(v >> 8); out.write(v & 0xff) }
        else { out.write(v & 0xff); out.write(v >> 8) }
      def u32(v: Int): Unit =
        if (be) { u16(v >>> 16); u16(v & 0xffff) }
        else { u16(v & 0xffff); u16(v >>> 16) }
      if (be) { out.write('M'); out.write('M'); u16(42) }
      else { out.write('I'); out.write('I'); u16(42) }
      u32(10) // first IFD
      out.write(0x55) // the pixel, at offset 8
      out.write(0) // pad to even
      u16(9) // entry count
      def shortEnt(tag: Int, v: Int): Unit = {
        u16(tag); u16(3); u32(1); u16(v); u16(0)
      }
      def longEnt(tag: Int, v: Int): Unit = { u16(tag); u16(4); u32(1); u32(v) }
      shortEnt(256, 1); shortEnt(257, 1); shortEnt(258, 8)
      shortEnt(259, 1); shortEnt(262, 1)
      longEnt(273, 8)
      shortEnt(277, 1); shortEnt(278, 1)
      longEnt(279, 1)
      u32(0) // next IFD
      out.toByteArray
    }
    for (be <- Seq(false, true)) {
      val img = TiffLake.parseTiff(mk(be))
      assert(img.nonEmpty, s"hand-built be=$be")
      assert(img.get.width == 1 && img.get.height == 1 &&
        img.get.argb(0) == 0xff555555 && img.get.bigEndian == be)
    }
  }

  test("PackBits hand vector decodes through a hand-built file") {
    // -2 'A' (run of 3) | 2 'B','C','D' (3 literals) | -128 (no-op) |
    // -1 'E' (run of 2)  =>  AAABCDEE — pins the control-byte
    // conventions independent of the packBits encoder
    val strip = Array[Byte](-2, 'A', 2, 'B', 'C', 'D', -128, -1, 'E')
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
    out.write('I'); out.write('I'); u16(42)
    u32(18) // strip at 8 (9 bytes), pad at 17, IFD at 18
    out.write(strip, 0, strip.length)
    out.write(0)
    u16(9)
    def shortEnt(tag: Int, v: Int): Unit = {
      u16(tag); u16(3); u32(1); u16(v); u16(0)
    }
    def longEnt(tag: Int, v: Int): Unit = { u16(tag); u16(4); u32(1); u32(v) }
    shortEnt(256, 8); shortEnt(257, 1); shortEnt(258, 8)
    shortEnt(259, 32773); shortEnt(262, 1)
    longEnt(273, 8)
    shortEnt(277, 1); shortEnt(278, 1)
    longEnt(279, strip.length)
    u32(0)
    val img = TiffLake.parseTiff(out.toByteArray)
    assert(img.nonEmpty, "hand-built packbits")
    val want = "AAABCDEE".getBytes("US-ASCII")
      .map(b => 0xff000000 | ((b & 0xff) * 0x010101))
    assert(java.util.Arrays.equals(img.get.argb, want))
    // and the canonical encoder round-trips the same raster
    roundTrip(want, 8, 1, TiffOpts(compression = 32773), "packbits law")
  }

  test("strictness: every lie rejects") {
    val good = TiffLake.encodeTiff(image(80, 9, 8), 9, 8,
      TiffOpts(photometric = 2, compression = 5, predictor = 2,
        rowsPerStrip = 3))
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "magic not 42" -> mut(c => c(2) = 43),
      "mixed byte-order mark" -> mut(c => c(1) = 'M'.toByte),
      "odd IFD offset" -> mut(c => c(4) = (c(4) + 1).toByte),
      "truncated" -> good.dropRight(3))
    cases.foreach { case (name, b) =>
      assert(TiffLake.parseTiff(b).isEmpty, name)
    }
    assert(TiffLake.parseTiff(good).nonEmpty, "control: unmutated parses")
    assert(TiffLake.parseTiff(null).isEmpty)
    assert(TiffLake.parseTiff(Array.emptyByteArray).isEmpty)
  }

  test("strictness: unsupported structure rejects, not guesses") {
    // each case hand-builds the minimal file with ONE law broken
    def mk(tweak: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
      def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
      out.write('I'); out.write('I'); u16(42)
      u32(10)
      out.write(0x55); out.write(0)
      val extra = tweak match {
        case "tile" | "orientation" | "fillorder" | "planar2" |
             "extrasamples" | "colormap-on-gray" => 1
        case _ => 0
      }
      u16(9 + extra)
      def shortEnt(tag: Int, v: Int): Unit = {
        u16(tag); u16(3); u32(1); u16(v); u16(0)
      }
      def longEnt(tag: Int, v: Int): Unit = { u16(tag); u16(4); u32(1); u32(v) }
      // entries stay in ascending tag order so each case isolates
      // exactly the one law it breaks
      shortEnt(256, 1); shortEnt(257, 1)
      shortEnt(258, if (tweak == "bps16") 16 else 8)
      shortEnt(259, if (tweak == "comp6") 6 else 1)
      shortEnt(262, if (tweak == "pm9") 9 else 1)
      if (tweak == "fillorder") shortEnt(266, 2)
      shortEnt(273, 8) // SHORT strip offset is legal
      if (tweak == "orientation") shortEnt(274, 3)
      shortEnt(277, 1); shortEnt(278, 1)
      longEnt(279, if (tweak == "cntlie") 2 else 1)
      if (tweak == "planar2") shortEnt(284, 2)
      if (tweak == "colormap-on-gray") shortEnt(320, 0)
      if (tweak == "tile") shortEnt(322, 16)
      if (tweak == "extrasamples") shortEnt(338, 0)
      // "multi-ifd": next-IFD pointing back at THIS IFD — a chain
      // cycle, which the strictly-forward law rejects (and the
      // one-page parseTiff surface would reject any chain anyway)
      u32(if (tweak == "multi-ifd") 10 else 0)
      out.toByteArray
    }
    for (t <- Seq("bps16", "comp6", "pm9", "cntlie", "planar2", "tile",
        "orientation", "fillorder", "extrasamples", "colormap-on-gray",
        "multi-ifd"))
      assert(TiffLake.parseTiff(mk(t)).isEmpty, t)
    assert(TiffLake.parseTiff(mk("none")).nonEmpty, "control")
    // entry order law: 273 placed before 262 violates ascending tags
    // (mk writes 262 then 273 — build the swap by hand)
    val swapped = {
      val b = mk("none")
      // entries start at 12; entry i at 12 + 12*i; swap entries 4 and 5
      val e4 = java.util.Arrays.copyOfRange(b, 12 + 48, 12 + 60)
      val e5 = java.util.Arrays.copyOfRange(b, 12 + 60, 12 + 72)
      System.arraycopy(e5, 0, b, 12 + 48, 12)
      System.arraycopy(e4, 0, b, 12 + 60, 12)
      b
    }
    assert(TiffLake.parseTiff(swapped).isEmpty, "tag order")
  }

  test("u32 dimension product cannot wrap the Long bound") {
    // w = h = 0xB504F334 (~3.04e9, a legal u32): the product is just
    // past 2^63, so an unguarded `w * h > bound` wraps negative and
    // passes — width.toInt then goes negative and the raster
    // allocation throws outside the parse->Option contract. Each
    // factor must reject on its own.
    def mk(dim: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
      def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
      out.write('I'); out.write('I'); u16(42)
      u32(10)
      out.write(0x55); out.write(0)
      u16(9)
      def shortEnt(tag: Int, v: Int): Unit = {
        u16(tag); u16(3); u32(1); u16(v); u16(0)
      }
      def longEnt(tag: Int, v: Int): Unit = { u16(tag); u16(4); u32(1); u32(v) }
      longEnt(256, dim); longEnt(257, dim)
      shortEnt(258, 8); shortEnt(259, 1); shortEnt(262, 1)
      longEnt(273, 8)
      shortEnt(277, 1); longEnt(278, dim)
      longEnt(279, 1)
      u32(0)
      out.toByteArray
    }
    assert(TiffLake.parseTiff(mk(0xB504F334)).isEmpty, "wrap dims")
    // a second wrap shape: one huge factor, one tiny
    assert(TiffLake.parseTiff(mk(0xFFFFFFFF)).isEmpty, "u32 max dims")
    assert(TiffLake.parseTiff(mk(1)).nonEmpty, "control: 1x1 parses")
  }

  test("u32 tile dimension product cannot wrap the Long bound") {
    // tw = tl = 0xB504F340 (~3.04e9, a multiple of 16, a legal u32):
    // the product is just past 2^63, so an unguarded `tw * tl > bound`
    // wraps negative and passes — tw.toInt then goes negative and the
    // LZW segment path would allocate a negative-size array
    // (NegativeArraySizeException escaping parse->Option). Each
    // factor must reject on its own, as the image w/h guard does.
    def mk(tdim: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
      def u32(v: Int): Unit = { u16(v & 0xffff); u16(v >>> 16) }
      out.write('I'); out.write('I'); u16(42)
      u32(8 + 256) // one 16x16 gray tile at 8, IFD after it
      (0 until 256).foreach(i => out.write(i & 0xff))
      u16(10)
      def shortEnt(tag: Int, v: Int): Unit = {
        u16(tag); u16(3); u32(1); u16(v); u16(0)
      }
      def longEnt(tag: Int, v: Int): Unit = {
        u16(tag); u16(4); u32(1); u32(v)
      }
      longEnt(256, 16); longEnt(257, 16)
      shortEnt(258, 8); shortEnt(259, 1); shortEnt(262, 1)
      shortEnt(277, 1)
      longEnt(322, tdim); longEnt(323, tdim)
      longEnt(324, 8); longEnt(325, 256)
      u32(0)
      out.toByteArray
    }
    assert(TiffLake.parseTiff(mk(0xB504F340)).isEmpty, "wrap tile dims")
    assert(TiffLake.parseTiff(mk(0xFFFFFFF0)).isEmpty, "u32 max tile dims")
    assert(TiffLake.parseTiff(mk(16)).nonEmpty, "control: 16x16 tile parses")
  }

  test("multi-page chain: forward walk decodes, every chain lie rejects") {
    // a 3-page file mixing compressions (none / LZW / PackBits)
    val three = TiffLake.encodeTiffMulti((0 until 3).map { p =>
      val (w, h) = (5 + p, 4 + p % 2)
      val argb = Array.tabulate(w * h)(k =>
        0xff000000 | (((p * 31 + k * 3) % 256) * 0x010101))
      (argb, w, h, TiffLake.TiffOpts(
        compression = Seq(1, 5, 32773)(p), rowsPerStrip = 1 + p % 2))
    })
    val pages = TiffLake.parseTiffPages(three)
    assert(pages.nonEmpty && pages.get.length == 3)
    pages.get.zipWithIndex.foreach { case (img, p) =>
      assert(img.width == 5 + p && img.height == 4 + p % 2, s"page $p dims")
      assert(img.compression == Seq(1, 5, 32773)(p), s"page $p comp")
      (0 until img.width * img.height).foreach(k =>
        assert((img.argb(k) & 0xff) == (p * 31 + k * 3) % 256))
    }
    // the one-page surface refuses to pick a page of a chain
    assert(TiffLake.parseTiff(three).isEmpty, "parseTiff: one page only")
    // path equality on a single-page file
    val one = TiffLake.encodeTiff(Array.fill(6)(0xff808080), 3, 2)
    assert(TiffLake.parseTiffPages(one).get.map(i => (i.width, i.height,
      i.argb.toSeq)) == Seq(TiffLake.parseTiff(one).get)
        .map(i => (i.width, i.height, i.argb.toSeq)))
    // chain lies: locate page 2's next-IFD pointer (the file's last
    // u32, written 0) and point it backward / at itself / odd / past
    // the file — every shape rejects, and a huge forward offset is
    // out of bounds
    def patched(v: Long): Array[Byte] = {
      val b = three.clone()
      val at = b.length - 4
      var k = 0
      while (k < 4) { b(at + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
      b
    }
    assert(TiffLake.parseTiffPages(patched(10L)).isEmpty, "backward link")
    assert(TiffLake.parseTiffPages(patched(9L)).isEmpty, "odd offset")
    assert(TiffLake.parseTiffPages(
      patched(three.length.toLong + 8)).isEmpty, "out of bounds")
    // the page cap (2048 since r18 — scanned books/faxes exceed the
    // old 32): a cap+1 chain rejects, a cap-sized one parses
    def manyPages(n: Int) = TiffLake.encodeTiffMulti((0 until n).map(_ =>
      (Array.fill(4)(0xffffffff), 2, 2, TiffLake.TiffOpts())))
    assert(TiffLake.parseTiffPages(manyPages(TiffLake.MaxPages))
      .exists(_.length == TiffLake.MaxPages))
    assert(TiffLake.parseTiffPages(manyPages(TiffLake.MaxPages + 1))
      .isEmpty, "page cap")
    // the whole-chain pixel budget (2^24 samples): 16 megapixel-pages
    // land exactly on the cap, a 17th rejects — without it, 32 pages
    // at the per-page bound could demand ~512 MB of argb in one task
    val mega = Array.fill(1 << 20)(0xff808080)
    def megaPages(n: Int) = TiffLake.encodeTiffMulti((0 until n).map(_ =>
      (mega, 1024, 1024, TiffLake.TiffOpts())))
    assert(TiffLake.parseTiffPages(megaPages(16)).exists(_.length == 16))
    assert(TiffLake.parseTiffPages(megaPages(17)).isEmpty, "pixel budget")
  }

  test("JPEG-in-TIFF (Compression 7): exact solid decode, corruption matrix") {
    // all 256 grays, single strip: a solid 1-component JFIF at
    // quality 1.0 decodes to EXACTLY the encoded gray at every pixel
    // (the q147 operating point, composed into the TIFF container)
    (0 until 256).foreach { g =>
      val px = 0xff000000 | (g * 0x010101)
      val t = TiffLake.encodeTiff(Array.fill(35)(px), 7, 5,
        TiffOpts(compression = 7))
      val img = TiffLake.parseTiff(t)
      assert(img.nonEmpty, s"gray $g")
      assert(img.get.compression == 7 && img.get.argb.forall(_ == px),
        s"gray $g exact")
    }
    // multi-strip big-endian and tiled wire shapes, same pixel law
    // (tile dims divide the image so every JPEG segment stays solid)
    val p77 = 0xff000000 | (77 * 0x010101)
    val si = TiffLake.parseTiff(TiffLake.encodeTiff(
      Array.fill(45)(p77), 9, 5,
      TiffOpts(bigEndian = true, compression = 7, rowsPerStrip = 2))).get
    assert(si.nStrips == 3 && si.argb.forall(_ == p77))
    val p130 = 0xff000000 | (130 * 0x010101)
    val ti = TiffLake.parseTiff(TiffLake.encodeTiff(
      Array.fill(32 * 16)(p130), 32, 16,
      TiffOpts(compression = 7, tileWidth = 16, tileLength = 16))).get
    assert(ti.nStrips == 2 && ti.argb.forall(_ == p130))
    // --- corruption matrix ---
    val t0 = TiffLake.encodeTiff(
      Array.fill(35)(0xff000000 | (80 * 0x010101)), 7, 5,
      TiffOpts(compression = 7))
    assert(TiffLake.parseTiff(t0).nonEmpty, "control")
    def u32le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val ifd = u32le(t0, 4)
    // non-JPEG payload behind the tag: the first strip rides at
    // offset 8 — break the SOI magic
    val noJpeg = t0.clone(); noJpeg(8) = 0x00
    assert(TiffLake.parseTiff(noJpeg).isEmpty,
      "non-JPEG payload behind Compression 7")
    // declared dims lie: tag 256 is the first (ascending) entry, its
    // inline SHORT at ifd+10 — the JPEG's own 7x5 must then mismatch
    val lie = t0.clone(); lie(ifd + 10) = 6
    assert(TiffLake.parseTiff(lie).isEmpty,
      "JPEG dims must equal the declared dims")
    // photometric 0 under comp 7 (entry 4 = tag 262): gray-only subset
    val pm0 = t0.clone(); pm0(ifd + 2 + 12 * 4 + 8) = 0
    assert(TiffLake.parseTiff(pm0).isEmpty, "comp 7 is photometric 1 only")
    // bilevel under comp 7 (entry 2 = tag 258): rejects in the bps-1 set
    val b1 = t0.clone(); b1(ifd + 2 + 12 * 2 + 8) = 1
    assert(TiffLake.parseTiff(b1).isEmpty, "comp 7 under bps 1")
    // JPEGTables (347): append a sorted-last IFD entry (existing tags
    // all < 347), bump the count — abbreviated streams reject
    val n0 = (t0(ifd) & 0xff) | ((t0(ifd + 1) & 0xff) << 8)
    val entEnd = ifd + 2 + 12 * n0
    val tables = t0.take(entEnd) ++
      Array[Byte](0x5B, 0x01, 1, 0, 4, 0, 0, 0, // tag 347, BYTE x4
        0xDE.toByte, 0xAD.toByte, 0xBE.toByte, 0xEF.toByte) ++
      Array[Byte](0, 0, 0, 0) // next-IFD: end of chain
    tables(ifd) = ((n0 + 1) & 0xff).toByte
    tables(ifd + 1) = (((n0 + 1) >> 8) & 0xff).toByte
    assert(TiffLake.parseTiff(tables).isEmpty,
      "JPEGTables (abbreviated streams) reject")
    // a structurally-VALID other format behind the tag exercises the
    // format-name gate specifically (not just the no-reader path):
    // a real 9x8 PNG fed as a 9x8 "JPEG" segment must reject
    val png = Multimodal.encodeDHashPng(Multimodal.dhashBit(5), 1)
    intercept[Throwable] { TiffLake.jpegDecodeSeg(png, 9, 8) }
    // the >32-page scanned-book fixture member decodes end-to-end
    val book = TiffLake.parseTiffPages(TiffLake.multiPageDoc(9))
    assert(book.exists(_.length == 40), "40-page chain member")
  }

  test("page signatures: exact rasters, real cross-document duplicates") {
    val sigs = TiffLake.extractTiffPageSigs(
      TiffLake.tiffMultiFixture(spark, 40), "id", "media").collect()
    assert(sigs.length == (0 until 40)
      .map(i => if (i % 20 == 9) 40 else 1 + i % 4).sum)
    // the signature IS the raster: replay doc 2's pages from the law
    // (page 0: i+p=2 -> the 8-bit ramp; page 1: i+p=3 -> G4 bilevel)
    val s20 = sigs.find(r => r.getLong(0) == 2 && r.getInt(1) == 0).get
    assert(s20.getInt(2) == 7 && s20.getInt(3) == 6)
    assert(s20.getString(4) ==
      (0 until 42).map(k => ((14 + 3 * k) % 256) * 0x010101)
        .mkString(","))
    val s21 = sigs.find(r => r.getLong(0) == 2 && r.getInt(1) == 1).get
    val b0 = (2 * 3 + 1 * 5) % 3
    assert(s21.getString(4) == (0 until 8 * 4).map(k =>
      if ((b0 + k) % 3 == 0) 0 else 0xffffff).mkString(","))
    // JPEG page (i+p ≡ 4 mod 5): doc 2 page 2 is SOLID gray
    // (7·2 + 11·2) % 256 = 36 at w = 5+4%4 = 5, h = 4+4%3 = 5 — the
    // quality-1.0 round trip returns the encoded gray at every pixel
    val s22 = sigs.find(r => r.getLong(0) == 2 && r.getInt(1) == 2).get
    assert(s22.getInt(2) == 5 && s22.getInt(3) == 5)
    assert(s22.getString(4) ==
      Seq.fill(25)(36 * 0x010101).mkString(","))
    // hand-derived duplicate: doc 0 page 0 and doc 35 page 1 share
    // (i+p) mod 12 (dims) and the ramp base 7i+11p mod 256 (= 0 and
    // 7*35+11 = 256), hence the full raster — while their WIRE
    // compressions differ (none vs LZW under the mod-5 cycle): the
    // dedup key is format-invariant by construction
    val a = sigs.find(r => r.getLong(0) == 0 && r.getInt(1) == 0).get
    val b = sigs.find(r => r.getLong(0) == 35 && r.getInt(1) == 1).get
    assert(a.getString(4) == b.getString(4) && a.getInt(2) == b.getInt(2),
      "the q241 fixture must contain real cross-document duplicates")
    // ...and a non-duplicate control
    val c = sigs.find(r => r.getLong(0) == 1 && r.getInt(1) == 0).get
    assert(c.getString(4) != a.getString(4))
  }

  test("page dedup scale path: hash pregroup equals the direct window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sigs = TiffLake.extractTiffPageSigs(
      TiffLake.tiffMultiFixture(spark, 40), "id", "media")
    val stride = TiffLake.MaxPages
    val grp = Window.partitionBy(col("width"), col("height"), col("sig"))
    val direct = sigs.select(col("id"), col("page"),
        count(lit(1)).over(grp).cast("int").as("dup_count"),
        min(col("id") * stride + col("page")).over(grp).as("canon"))
      .select(col("id"), col("page"), col("dup_count"),
        expr(s"canon DIV $stride").as("canon_id"),
        expr(s"CAST(canon % $stride AS INT)").as("canon_page"))
      .orderBy("id", "page").collect().toSeq
    val pre = graft.operators.Dedup.pageDupGroups(sigs, stride)
      .orderBy("id", "page").collect().toSeq
    assert(pre == direct, "xxhash64 pregroup must be output-identical")
    // a deliberately-degenerate hash lands EVERY page in one bucket:
    // the exact verify must still yield identical output (a hash
    // collision can never merge distinct pages)
    val worst = graft.operators.Dedup
      .pageDupGroups(sigs, stride, hash = lit(0L))
      .orderBy("id", "page").collect().toSeq
    assert(worst == direct, "degenerate hash must still verify exactly")
    // the fixture exercises BOTH passes: hash-singletons and colliders
    assert(direct.exists(_.getInt(2) > 1) &&
      direct.exists(_.getInt(2) == 1))
  }

  test("byte-flip + truncation sweeps never throw; survivors well-formed") {
    val seeds = Seq(
      TiffLake.encodeTiff(image(90, 11, 9), 11, 9,
        TiffOpts(photometric = 2, compression = 5, predictor = 2)),
      TiffLake.encodeTiff(image(91, 11, 9, colors = 7), 11, 9,
        TiffOpts(photometric = 3, compression = 32773, rowsPerStrip = 2)),
      TiffLake.encodeTiff(image(92, 11, 9), 11, 9,
        TiffOpts(bigEndian = true, photometric = 0)),
      TiffLake.multiPageDoc(7)) // chain walk swept too
    for (src <- seeds; i <- src.indices; bit <- Seq(1, 0x40)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      TiffLake.parseTiff(c).foreach { img =>
        assert(img.argb.length == img.width * img.height)
      }
      TiffLake.parseTiffPages(c).foreach(_.foreach { img =>
        assert(img.argb.length == img.width * img.height)
      })
    }
    val s0 = seeds.head
    (0 until s0.length).foreach { n =>
      TiffLake.parseTiff(s0.take(n))
      TiffLake.parseTiffPages(s0.take(n))
    }
  }

  test("format invariance: TIFF twin fingerprints equal the PNG twin's") {
    for (r <- 0 until 12) {
      val s = 1 + r % 3
      val png = Multimodal.parseDHash(
        Multimodal.encodeDHashPng(Multimodal.dhashBit(r), s))
      val tif = Multimodal.parseDHash(
        Multimodal.encodeDHashTiff(Multimodal.dhashBit(r), s))
      assert(png.nonEmpty && tif.nonEmpty, s"r=$r")
      assert(png.get == tif.get, s"r=$r: dHash differs across formats")
    }
  }

  test("fixture + extractTiff: every wire variant decodes to the law") {
    val fx = TiffLake.tiffFixture(spark, 32)
    val rows = TiffLake.extractTiff(fx, "id", "media")
      .orderBy("id").collect()
    assert(rows.length == 32)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(8), s"id=$id invalid")
      val s = 1 + (id % 3).toInt
      assert(r.getInt(1) == 9 * s && r.getInt(2) == 8 * s, s"id=$id dims")
      val v = (id % 16).toInt
      val want =
        if (v == 8 || v == 9 || v >= 11) {
          // bilevel variants: bit k = black(k) && !black(k+1)
          var fp = 0L
          for (y <- 0 until 8; x <- 0 until 8)
            if (Multimodal.dhashBit(id.toInt)(x, y) &&
              !Multimodal.dhashBit(id.toInt)(x + 1, y))
              fp |= 1L << (y * 8 + x)
          fp
        } else Multimodal.parseDHash(
          Multimodal.encodeDHashPng(Multimodal.dhashBit(id.toInt), s))
          .get._1
      assert(r.getLong(7) == want, s"id=$id dhash")
    }
  }
}
