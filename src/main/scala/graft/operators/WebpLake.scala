package graft.operators

/** WebP VP8L lossless image codec (the "WebP Lossless Bitstream
  * Specification") — WebP dominates modern web image corpora, and the
  * lossless profile keeps the exact-oracle discipline of the codec
  * family (every decoded pixel is pinned, no quantization slack).
  * REAL decode end to end, written against the public spec:
  *
  *  - container: RIFF + `WEBP` with exactly ONE `VP8L` chunk (odd
  *    sizes padded per RIFF); extended `VP8X` layouts, animation and
  *    lossy `VP8 ` streams are REJECTED, not guessed;
  *  - header: 0x2f signature, 14-bit width/height-minus-one, alpha
  *    hint, version 0 required;
  *  - ALL FOUR transforms: predictor (all 14 modes incl. Select and
  *    both ClampAddSubtract variants; the top-right neighbor of a
  *    rightmost pixel is the current row's first pixel, as the spec's
  *    contiguous-buffer addressing defines), color (signed-int8
  *    `(t*c)>>5` deltas), subtract-green, and color-indexing (delta-
  *    coded palette, sub-byte pixel bundling at ≤16 colors, an
  *    out-of-range index REJECTS); each transform at most once,
  *    inverses applied in reverse read order with the width in effect
  *    at each step;
  *  - entropy layer: canonical Huffman codes (simple 1-/2-symbol and
  *    full code-length-coded forms with 16/17/18 repeats and the
  *    max_symbol cutoff; incomplete codes REJECT via the exact Kraft
  *    check, one-symbol codes are 0-bit), spatially-varying meta
  *    codes via the entropy image, color cache (hash
  *    0x1e35a7bd·argb >>> (32-bits)), and LZ77 backward references
  *    with the 120-entry 2D distance neighborhood (generated as the
  *    120 nearest (dx,dy) offsets ordered by squared distance then
  *    descending dy, positive dx first — reproduces the spec's table;
  *    the 120-entry cut falls cleanly between d²=74 and d²=80, so no
  *    tie is split);
  *  - strict framing: every read is bounds-checked, pixel counts are
  *    exact, at most 7 trailing pad bits may remain.
  *
  * The encoder (fixture/test side) writes the same subset it decodes
  * — literals under canonical or simple codes, optional color cache,
  * optional row-copy LZ77 references, and any combination of the four
  * transforms — so round-trip property tests drive every decode path
  * with pixels pinned exactly.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object WebpLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class Vp8lImage(
      width: Int, height: Int, argb: Array[Int], alphaHint: Boolean)

  // 120 nearest 2D offsets: (d² asc, dy desc, +dx before -dx)
  private val DistMap: Array[(Int, Int)] = {
    val cands = for {
      dy <- 0 to 8
      dx <- -8 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    cands.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, -dy, if (dx >= 0) 0 else 1)
    }.take(120).toArray
  }

  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ------------------------------------------------------------------
  // bit reader (LSB-first within bytes, per VP8L)

  private final class Br(b: Array[Byte], off: Int, end: Int) {
    private var pos: Long = off.toLong * 8
    private val lim: Long = end.toLong * 8
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= lim) throw Fail
        val bit = (b((pos >> 3).toInt) >> (pos & 7).toInt) & 1
        v |= bit << i
        pos += 1
        i += 1
      }
      v
    }
    def bitsLeft: Long = lim - pos
  }

  // ------------------------------------------------------------------
  // canonical Huffman decode (MSB-first code walk, max length 15)

  private final class Huff private (
      single: Int, count: Array[Int], first: Array[Int],
      offset: Array[Int], syms: Array[Int]) {
    def decode(br: Br): Int = {
      if (single >= 0) return single // one-symbol code: zero bits
      var code = 0
      var len = 0
      while (len < 15) {
        code = (code << 1) | br.readBits(1)
        len += 1
        if (count(len) > 0) {
          val d = code - first(len)
          if (d >= 0 && d < count(len)) return syms(offset(len) + d)
        }
      }
      throw Fail
    }
  }

  private object Huff {
    /** Canonical code from per-symbol lengths; strict Kraft
      * completeness unless exactly one symbol is coded. */
    def canonical(lengths: Array[Int]): Huff = {
      var n = 0
      var last = -1
      var maxLen = 0
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) throw Fail
        if (l > 0) { n += 1; last = i; if (l > maxLen) maxLen = l }
        i += 1
      }
      if (n == 0) throw Fail
      if (n == 1) return new Huff(last, null, null, null, null)
      val count = new Array[Int](16)
      lengths.foreach(l => if (l > 0) count(l) += 1)
      // exact Kraft check: complete codes only
      var kraft = 0L
      var l = 1
      while (l <= 15) { kraft += count(l).toLong << (15 - l); l += 1 }
      if (kraft != (1L << 15)) throw Fail
      val first = new Array[Int](16)
      val offset = new Array[Int](16)
      var code = 0
      var off = 0
      l = 1
      while (l <= 15) {
        code = (code + count(l - 1)) << 1
        first(l) = code
        offset(l) = off
        off += count(l)
        l += 1
      }
      val syms = new Array[Int](n)
      val cursor = offset.clone()
      i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { syms(cursor(lengths(i))) = i
          cursor(lengths(i)) += 1 }
        i += 1
      }
      new Huff(-1, count, first, offset, syms)
    }

    /** Simple code: symbols in READ order (code 0 = first symbol). */
    def simple(symbols: Array[Int]): Huff =
      if (symbols.length == 1) new Huff(symbols(0), null, null, null, null)
      else {
        val count = new Array[Int](16)
        count(1) = 2
        val first = new Array[Int](16)
        val offset = new Array[Int](16)
        new Huff(-1, count, first, offset, symbols)
      }
  }

  /** Read one Huffman code per spec (simple or code-length-coded). */
  private def readHuffCode(br: Br, alphabetSize: Int): Huff = {
    if (br.readBits(1) == 1) { // simple
      val numSymbols = br.readBits(1) + 1
      val firstLen = if (br.readBits(1) == 1) 8 else 1
      val s0 = br.readBits(firstLen)
      if (s0 >= alphabetSize) throw Fail
      if (numSymbols == 1) Huff.simple(Array(s0))
      else {
        val s1 = br.readBits(8)
        if (s1 >= alphabetSize || s1 == s0) throw Fail
        Huff.simple(Array(s0, s1))
      }
    } else {
      val numCl = 4 + br.readBits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.readBits(3); i += 1 }
      val cl = Huff.canonical(clLens)
      var maxSymbol =
        if (br.readBits(1) == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          val m = 2 + br.readBits(nbits)
          if (m > alphabetSize) throw Fail
          m
        } else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prev = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val c = cl.decode(br)
        if (c < 16) {
          lens(sym) = c
          sym += 1
          if (c != 0) prev = c
        } else {
          val (rep, fill) = c match {
            case 16 => (3 + br.readBits(2), prev)
            case 17 => (3 + br.readBits(3), 0)
            case 18 => (11 + br.readBits(7), 0)
            case _ => throw Fail
          }
          if (sym + rep > alphabetSize) throw Fail
          var k = 0
          while (k < rep) { lens(sym) = fill; sym += 1; k += 1 }
        }
      }
      Huff.canonical(lens)
    }
  }

  // ------------------------------------------------------------------
  // LZ77 prefix values

  private def prefixValue(code: Int, br: Br): Int = {
    if (code < 0 || code >= 40) throw Fail
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.readBits(extra) + 1
    }
  }

  // ------------------------------------------------------------------
  // pixel helpers

  @inline private def a8(p: Int): Int = (p >>> 24) & 0xff
  @inline private def r8(p: Int): Int = (p >>> 16) & 0xff
  @inline private def g8(p: Int): Int = (p >>> 8) & 0xff
  @inline private def b8(p: Int): Int = p & 0xff
  @inline private def pack(a: Int, r: Int, g: Int, b: Int): Int =
    ((a & 0xff) << 24) | ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)

  private def avg2(x: Int, y: Int): Int =
    pack((a8(x) + a8(y)) / 2, (r8(x) + r8(y)) / 2,
      (g8(x) + g8(y)) / 2, (b8(x) + b8(y)) / 2)

  private def addPixels(x: Int, y: Int): Int =
    pack(a8(x) + a8(y), r8(x) + r8(y), g8(x) + g8(y), b8(x) + b8(y))

  private def select(l: Int, t: Int, tl: Int): Int = {
    // P = L + T - TL per channel; pL = Σ|P-L|, pT = Σ|P-T|
    val pL = math.abs(a8(t) - a8(tl)) + math.abs(r8(t) - r8(tl)) +
      math.abs(g8(t) - g8(tl)) + math.abs(b8(t) - b8(tl))
    val pT = math.abs(a8(l) - a8(tl)) + math.abs(r8(l) - r8(tl)) +
      math.abs(g8(l) - g8(tl)) + math.abs(b8(l) - b8(tl))
    if (pL < pT) l else t
  }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int =
    pack(clip255(a8(l) + a8(t) - a8(tl)), clip255(r8(l) + r8(t) - r8(tl)),
      clip255(g8(l) + g8(t) - g8(tl)), clip255(b8(l) + b8(t) - b8(tl)))

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val av = avg2(l, t)
    @inline def h(a: Int, b: Int): Int = clip255(a + (a - b) / 2)
    pack(h(a8(av), a8(tl)), h(r8(av), r8(tl)),
      h(g8(av), g8(tl)), h(b8(av), b8(tl)))
  }

  private def predict(mode: Int, buf: Array[Int], p: Int, w: Int): Int = {
    val x = p % w
    val y = p / w
    if (p == 0) return 0xff000000
    if (y == 0) return buf(p - 1) // top row: L
    if (x == 0 && mode != 0) return buf(p - w) // left column: T
    @inline def L = buf(p - 1)
    @inline def T = buf(p - w)
    @inline def TL = buf(p - w - 1)
    // at x == w-1 this wraps to the current row's first pixel — the
    // spec's contiguous-buffer top-right addressing
    @inline def TR = buf(p - w + 1)
    mode match {
      case 0 => 0xff000000
      case 1 => L
      case 2 => T
      case 3 => TR
      case 4 => TL
      case 5 => avg2(avg2(L, TR), T)
      case 6 => avg2(L, TL)
      case 7 => avg2(L, T)
      case 8 => avg2(TL, T)
      case 9 => avg2(T, TR)
      case 10 => avg2(avg2(L, TL), avg2(T, TR))
      case 11 => select(L, T, TL)
      case 12 => clampAddSubFull(L, T, TL)
      case 13 => clampAddSubHalf(L, T, TL)
      case _ => throw Fail
    }
  }

  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  // ------------------------------------------------------------------
  // transforms

  private sealed trait Xform
  private final case class XPred(bits: Int, tw: Int, img: Array[Int])
    extends Xform
  private final case class XColor(bits: Int, tw: Int, img: Array[Int])
    extends Xform
  private case object XSubGreen extends Xform
  private final case class XPalette(palette: Array[Int], widthBits: Int,
      origW: Int) extends Xform

  private def divRoundUp(a: Int, b: Int): Int = (a + b - 1) / b

  private[graft] def paletteWidthBits(size: Int): Int =
    if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0

  // ------------------------------------------------------------------
  // image stream decode (shared by the main image and every sub-image)

  private def decodeImageStream(br: Br, w0: Int, h0: Int,
      level0: Boolean): Array[Int] = {
    var w = w0
    val xforms = scala.collection.mutable.ArrayBuffer.empty[Xform]
    if (level0) {
      val seen = scala.collection.mutable.HashSet.empty[Int]
      while (br.readBits(1) == 1) {
        val t = br.readBits(2)
        if (!seen.add(t)) throw Fail // each transform at most once
        t match {
          case 0 =>
            val bits = 2 + br.readBits(3)
            val tw = divRoundUp(w, 1 << bits)
            val th = divRoundUp(h0, 1 << bits)
            xforms += XPred(bits, tw, decodeImageStream(br, tw, th, false))
          case 1 =>
            val bits = 2 + br.readBits(3)
            val tw = divRoundUp(w, 1 << bits)
            val th = divRoundUp(h0, 1 << bits)
            xforms += XColor(bits, tw, decodeImageStream(br, tw, th, false))
          case 2 =>
            xforms += XSubGreen
          case 3 =>
            val size = br.readBits(8) + 1
            val raw = decodeImageStream(br, size, 1, false)
            val pal = new Array[Int](size)
            var prev = 0
            var i = 0
            while (i < size) { // palette entries are delta-coded
              pal(i) = addPixels(raw(i), prev)
              prev = pal(i)
              i += 1
            }
            val wb = paletteWidthBits(size)
            xforms += XPalette(pal, wb, w)
            w = divRoundUp(w, 1 << wb)
        }
      }
    }
    val h = h0
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 22)) throw Fail
    // color cache (allowed at every level)
    val cacheBits =
      if (br.readBits(1) == 1) {
        val cb = br.readBits(4)
        if (cb < 1 || cb > 11) throw Fail
        cb
      } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    // meta codes (level0 only)
    var metaBits = 0
    var metaImg: Array[Int] = null
    var numGroups = 1
    if (level0 && br.readBits(1) == 1) {
      metaBits = 2 + br.readBits(3)
      val mw = divRoundUp(w, 1 << metaBits)
      val mh = divRoundUp(h, 1 << metaBits)
      metaImg = decodeImageStream(br, mw, mh, false)
      var mx = 0
      metaImg.foreach { p =>
        val m = ((r8(p) << 8) | g8(p))
        if (m > mx) mx = m
      }
      numGroups = mx + 1
      if (numGroups > 1024) throw Fail // bomb guard
    }
    val greenSize = 256 + 24 + cacheSize
    val groups = Array.tabulate(numGroups) { _ =>
      Array(readHuffCode(br, greenSize), readHuffCode(br, 256),
        readHuffCode(br, 256), readHuffCode(br, 256),
        readHuffCode(br, 40))
    }
    val metaW = if (metaImg != null) divRoundUp(w, 1 << metaBits) else 0
    @inline def groupAt(pos: Int): Array[Huff] =
      if (metaImg == null) groups(0)
      else {
        val x = pos % w
        val y = pos / w
        val p = metaImg((y >> metaBits) * metaW + (x >> metaBits))
        groups((r8(p) << 8) | g8(p))
      }
    @inline def cacheInsert(px: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * px) >>> (32 - cacheBits))) = px
    val total = w * h
    val buf = new Array[Int](total)
    var pos = 0
    while (pos < total) {
      val g = groupAt(pos)
      val s = g(0).decode(br)
      if (s < 256) {
        val red = g(1).decode(br)
        val blue = g(2).decode(br)
        val alpha = g(3).decode(br)
        val px = pack(alpha, red, s, blue)
        buf(pos) = px
        cacheInsert(px)
        pos += 1
      } else if (s < 256 + 24) {
        val len = prefixValue(s - 256, br)
        val dval = prefixValue(g(4).decode(br), br)
        val dist =
          if (dval > 120) dval - 120
          else {
            val (dx, dy) = DistMap(dval - 1)
            val d = dy * w + dx
            if (d < 1) 1 else d
          }
        if (dist > pos || pos + len > total) throw Fail
        var k = 0
        while (k < len) {
          val px = buf(pos - dist)
          buf(pos) = px
          cacheInsert(px)
          pos += 1
          k += 1
        }
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) throw Fail
        buf(pos) = cache(idx)
        pos += 1
      }
    }
    // inverse transforms, reverse read order
    var out = buf
    var curW = w
    xforms.reverseIterator.foreach {
      case XPalette(pal, wb, origW) =>
        val expanded = new Array[Int](origW * h)
        val perByte = 1 << wb
        val bpp = 8 >> wb
        val mask = (1 << bpp) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < origW) {
            val coded = out(y * curW + (x >> wb))
            val idx = (g8(coded) >> ((x % perByte) * bpp)) & mask
            if (idx >= pal.length) throw Fail // out-of-range index
            expanded(y * origW + x) = pal(idx)
            x += 1
          }
          y += 1
        }
        out = expanded
        curW = origW
      case XSubGreen =>
        var i = 0
        while (i < out.length) {
          val p = out(i)
          val g = g8(p)
          out(i) = pack(a8(p), r8(p) + g, g, b8(p) + g)
          i += 1
        }
      case XColor(bits, tw, img) =>
        var i = 0
        while (i < out.length) {
          val x = i % curW
          val y = i / curW
          val elt = img((y >> bits) * tw + (x >> bits))
          val g2r = b8(elt)
          val g2b = g8(elt)
          val r2b = r8(elt)
          val p = out(i)
          val g = g8(p)
          val nr = (r8(p) + ctDelta(g2r, g)) & 0xff
          val nb = (b8(p) + ctDelta(g2b, g) + ctDelta(r2b, nr)) & 0xff
          out(i) = pack(a8(p), nr, g, nb)
          i += 1
        }
      case XPred(bits, tw, img) =>
        var p = 0
        while (p < out.length) {
          val x = p % curW
          val y = p / curW
          val mode = g8(img((y >> bits) * tw + (x >> bits)))
          if (mode > 13) throw Fail
          out(p) = addPixels(out(p), predict(mode, out, p, curW))
          p += 1
        }
    }
    if (curW != w0) throw Fail // transforms must restore the real width
    out
  }

  // ------------------------------------------------------------------
  // container + header

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decode one WebP lossless file; None on any violation. */
  private[graft] def parseVp8l(b: Array[Byte]): Option[Vp8lImage] = {
    if (b == null || b.length < 30) return None
    try {
      if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F')
        return None
      if (u32le(b, 4) != b.length - 8L) throw Fail
      if (b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
        throw Fail
      // exactly one chunk, and it must be VP8L (VP8X/ANIM/lossy: out)
      if (b(12) != 'V' || b(13) != 'P' || b(14) != '8' || b(15) != 'L')
        throw Fail
      val size = u32le(b, 16)
      val padded = size + (size & 1)
      if (20L + padded != b.length) throw Fail
      if ((size & 1) == 1 && b(b.length - 1) != 0) throw Fail // pad byte
      val br = new Br(b, 20, 20 + size.toInt)
      if (br.readBits(8) != 0x2f) throw Fail // VP8L signature
      val w = br.readBits(14) + 1
      val h = br.readBits(14) + 1
      val alphaHint = br.readBits(1) == 1
      if (br.readBits(3) != 0) throw Fail // version
      if (w.toLong * h > (1L << 22)) throw Fail
      val argb = decodeImageStream(br, w, h, level0 = true)
      if (br.bitsLeft >= 8) throw Fail // at most 7 pad bits
      Some(Vp8lImage(w, h, argb, alphaHint))
    } catch { case Fail => None }
  }

  // ==================================================================
  // encoder (fixture/test side): writes the same subset, so round-trip
  // property tests drive every decode path with pixels pinned exactly.

  private final class Bw {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** MSB-first code emission (Huffman codes walk MSB to LSB). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (nbits > 0) { buf.write(cur); cur = 0; nbits = 0 }
      buf.toByteArray
    }
  }

  /** Complete canonical code lengths for n >= 2 distinct symbols:
    * a = 2^L - n symbols get length L-1, the rest L (Kraft == 1). */
  private def completeLengths(symbols: Seq[Int]): Map[Int, Int] = {
    val n = symbols.length
    require(n >= 2)
    var lBits = 1
    while ((1 << lBits) < n) lBits += 1
    val short = (1 << lBits) - n
    symbols.sorted.zipWithIndex.map { case (s, i) =>
      s -> (if (i < short && lBits > 1) lBits - 1 else lBits)
    }.toMap
  }

  /** Canonical code assignment from lengths (MSB-first codes). */
  private def assignCodes(lens: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val bySym = lens.toSeq.sortBy { case (s, l) => (l, s) }
    var code = 0
    var prevLen = 0
    bySym.map { case (s, l) =>
      code <<= (l - prevLen)
      prevLen = l
      val r = s -> (code, l)
      code += 1
      r
    }.toMap
  }

  /** Write one Huffman code declaration; returns the emit map. */
  private def writeHuffCode(bw: Bw, alphabetSize: Int,
      used: Seq[Int]): Map[Int, (Int, Int)] = {
    require(used.nonEmpty && used.forall(s => s >= 0 && s < alphabetSize))
    // the simple form carries symbols in at most 8 bits — cache hits
    // and length prefixes (green >= 256) must go the normal route
    if (used.length <= 2 && used.max <= 255) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.length - 1, 1)
      val s0 = used.head
      if (s0 <= 1) { bw.writeBits(0, 1); bw.writeBits(s0, 1) }
      else { bw.writeBits(1, 1); bw.writeBits(s0, 8) }
      if (used.length == 2) {
        bw.writeBits(used(1), 8)
        Map(used.head -> (0, 1), used(1) -> (1, 1))
      } else Map(s0 -> (0, 0))
    } else {
      bw.writeBits(0, 1) // normal
      val lens =
        if (used.length == 1) Map(used.head -> 1) // never hit (see call
        // sites: a lone >255 green cannot occur — pixel 0 is a literal)
        else completeLengths(used)
      val maxUsed = used.max
      // per-slot code-length symbols (no repeats — simple and valid)
      val slotCl = (0 to maxUsed).map(s => lens.getOrElse(s, 0))
      val clUsed = slotCl.distinct.sorted
      // a single distinct CL value would need a 0-bit CL code; use the
      // guaranteed-complete 2-symbol form by adding an unused dummy
      val clFinal =
        if (clUsed.length == 1) {
          val dummy = if (clUsed.head == 0) 1 else 0
          completeLengths(Seq(clUsed.head, dummy))
        } else completeLengths(clUsed)
      val clCodes = assignCodes(clFinal)
      val numCl = math.max(4,
        (0 until 19).reverse.find(i => clFinal.contains(ClOrder(i)))
          .map(_ + 1).getOrElse(4))
      bw.writeBits(numCl - 4, 4)
      var i = 0
      while (i < numCl) {
        bw.writeBits(clFinal.getOrElse(ClOrder(i), 0), 3)
        i += 1
      }
      // max_symbol cutoff: write exactly maxUsed+1 slots, with the
      // smallest spec field width that fits (2 + 2*k bits, k in 0..7)
      bw.writeBits(1, 1)
      var k = 0
      while ((1 << (2 + 2 * k)) <= maxUsed - 1 && k < 7) k += 1
      bw.writeBits(k, 3)
      bw.writeBits(maxUsed + 1 - 2, 2 + 2 * k)
      slotCl.foreach { cl =>
        val (c, l) = clCodes(cl)
        bw.writeCode(c, l)
      }
      assignCodes(lens)
    }
  }

  private[graft] final case class EncOpts(
      subtractGreen: Boolean = false,
      predictor: Option[Int] = None, // uniform mode 0-13
      colorElt: Option[Int] = None, // packed (r2b<<16 | g2b<<8 | g2r)
      palette: Boolean = false,
      cacheBits: Int = 0,
      rowCopy: Boolean = false)

  /** Encode one image-stream body (cache declaration, the meta-codes
    * bit when `level0`, Huffman codes, pixel data) into `bw`. */
  private def writeImageBody(bw: Bw, px: Array[Int], w: Int,
      cacheBits: Int, rowCopy: Boolean, level0: Boolean): Unit = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenSize = 256 + 24 + cacheSize
    // plan the token stream (so histograms exist before codes)
    // token: >=0 literal pixel index; -1 row-copy ref; -2..: cache hit
    val h = px.length / w
    val cacheSim = if (cacheBits > 0) new Array[Int](cacheSize) else null
    val cacheState = if (cacheBits > 0) new Array[Boolean](cacheSize)
      else null
    sealed trait Tok
    final case class TLit(p: Int) extends Tok
    final case class TCache(idx: Int) extends Tok
    case object TRow extends Tok
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var pos = 0
    while (pos < px.length) {
      val y = pos / w
      if (rowCopy && pos % w == 0 && y > 0 &&
          (0 until w).forall(x => px(pos + x) == px(pos - w + x))) {
        toks += TRow
        if (cacheSim != null) {
          var x = 0
          while (x < w) {
            val p = px(pos + x)
            val k = (0x1e35a7bd * p) >>> (32 - cacheBits)
            cacheSim(k) = p
            cacheState(k) = true
            x += 1
          }
        }
        pos += w
      } else {
        val p = px(pos)
        val k = if (cacheSim != null)
          (0x1e35a7bd * p) >>> (32 - cacheBits) else 0
        if (cacheSim != null && cacheState(k) && cacheSim(k) == p)
          toks += TCache(k)
        else {
          toks += TLit(p)
          if (cacheSim != null) { cacheSim(k) = p; cacheState(k) = true }
        }
        pos += 1
      }
    }
    // prefix code for a value v >= 1: (code, extraBits, extraVal)
    def prefixOf(v: Int): (Int, Int, Int) = {
      if (v <= 4) (v - 1, 0, 0)
      else {
        var code = 4
        while (code < 40) {
          val extra = (code - 2) >> 1
          val lo = ((2 + (code & 1)) << extra) + 1
          val hi = lo + (1 << extra) - 1
          if (v >= lo && v <= hi) return (code, extra, v - lo)
          code += 1
        }
        throw Fail
      }
    }
    val (lenCode, lenExtraBits, lenExtraVal) =
      if (toks.exists(_ == TRow)) prefixOf(w) else (0, 0, 0)
    val (distCode, distExtraBits, distExtraVal) =
      if (toks.exists(_ == TRow)) prefixOf(w + 120) else (0, 0, 0)
    val greens = scala.collection.mutable.SortedSet.empty[Int]
    val reds = scala.collection.mutable.SortedSet.empty[Int]
    val blues = scala.collection.mutable.SortedSet.empty[Int]
    val alphas = scala.collection.mutable.SortedSet.empty[Int]
    toks.foreach {
      case TLit(p) =>
        greens += g8(p); reds += r8(p); blues += b8(p); alphas += a8(p)
      case TCache(k) => greens += 256 + 24 + k
      case TRow => greens += 256 + lenCode
    }
    if (greens.isEmpty) throw Fail
    if (reds.isEmpty) { reds += 0; blues += 0; alphas += 0 }
    // cache declaration, then (level0 only) the meta-codes bit
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    if (level0) bw.writeBits(0, 1) // single huffman group
    val gC = writeHuffCode(bw, greenSize, greens.toSeq)
    val rC = writeHuffCode(bw, 256, reds.toSeq)
    val bC = writeHuffCode(bw, 256, blues.toSeq)
    val aC = writeHuffCode(bw, 256, alphas.toSeq)
    val dC = writeHuffCode(bw, 40,
      if (toks.exists(_ == TRow)) Seq(distCode) else Seq(0))
    @inline def emit(m: Map[Int, (Int, Int)], s: Int): Unit = {
      val (c, l) = m(s)
      bw.writeCode(c, l)
    }
    toks.foreach {
      case TLit(p) =>
        emit(gC, g8(p)); emit(rC, r8(p)); emit(bC, b8(p)); emit(aC, a8(p))
      case TCache(k) => emit(gC, 256 + 24 + k)
      case TRow =>
        emit(gC, 256 + lenCode)
        bw.writeBits(lenExtraVal, lenExtraBits)
        emit(dC, distCode)
        bw.writeBits(distExtraVal, distExtraBits)
    }
  }

  /** Write a sub-image (transform data): its own image stream with no
    * transforms and no meta codes. */
  private def writeSubImage(bw: Bw, px: Array[Int], w: Int): Unit =
    writeImageBody(bw, px, w, cacheBits = 0, rowCopy = false,
      level0 = false)

  /** Encode an ARGB image as a VP8L WebP file with the given options
    * (palette excludes the other transforms by construction). */
  // ------------------------------------------------------------------
  // container census — the lossy (VP8) and extended (VP8X) profiles a
  // real web crawl is dominated by. An honest census, not a decode:
  // profile + the header-declared dimensions, with every header law
  // checked (RFC 6386 §9.1 key-frame header for lossy; the VP8X
  // flags/reserved/canvas layout with the animation↔ANMF consistency
  // law for extended). Pixel decode of lossy VP8 stays out of scope:
  // no pinned-subset oracle exists for its transform pipeline, so the
  // exact-oracle posture censuses it rather than guessing pixels.

  /** (profile, width, height) for one WebP container; None on any
    * header-law violation. Profiles: "lossless", "lossy", "extended"
    * (canvas dimensions). */
  private[graft] def webpCensus(
      b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null || b.length < 20) return None
    try {
      if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F')
        return None
      if (u32le(b, 4) != b.length - 8L) throw Fail
      if (b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P')
        throw Fail
      def fourcc(o: Int): String =
        new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)),
          "US-ASCII")
      // RFC 6386 §9.1: 3-byte frame tag (key frame, version ≤ 3,
      // show_frame, 19-bit first-partition size), start code
      // 0x9d012a, 14-bit dimensions
      def vp8Dims(off: Int, len: Long): (Int, Int) = {
        if (len < 10) throw Fail
        val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16)
        if ((tag & 1) != 0) throw Fail // inter frame: not an image
        if (((tag >> 1) & 7) > 3) throw Fail // version
        if (((tag >> 4) & 1) != 1) throw Fail // show_frame
        if (10L + (tag >>> 5) > len) throw Fail // partition must fit
        if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
            (b(off + 5) & 0xff) != 0x2a) throw Fail // start code
        val w = ((b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)) & 0x3fff
        val h = ((b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)) & 0x3fff
        if (w < 1 || h < 1) throw Fail
        (w, h)
      }
      val size0 = u32le(b, 16)
      val padded0 = size0 + (size0 & 1)
      fourcc(12) match {
        case "VP8L" =>
          if (20L + padded0 != b.length || size0 < 5) throw Fail
          if ((b(20) & 0xff) != 0x2f) throw Fail
          val bits = (b(21) & 0xffL) | ((b(22) & 0xffL) << 8) |
            ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 24)
          if (((bits >> 29) & 7) != 0) throw Fail // version
          Some(("lossless", (bits & 0x3fff).toInt + 1,
            ((bits >> 14) & 0x3fff).toInt + 1))
        case "VP8 " =>
          if (20L + padded0 != b.length) throw Fail // one chunk
          val (w, h) = vp8Dims(20, size0)
          Some(("lossy", w, h))
        case "VP8X" =>
          if (size0 != 10) throw Fail
          val flags = b(20) & 0xff
          if ((flags & 0xc1) != 0) throw Fail // reserved bits
          if (b(21) != 0 || b(22) != 0 || b(23) != 0) throw Fail
          val cw = ((b(24) & 0xff) | ((b(25) & 0xff) << 8) |
            ((b(26) & 0xff) << 16)) + 1
          val ch = ((b(27) & 0xff) | ((b(28) & 0xff) << 8) |
            ((b(29) & 0xff) << 16)) + 1
          // walk the remaining chunks: consistent framing, and the
          // container must actually carry an image (ANMF frames when
          // the animation flag is set, a VP8/VP8L chunk otherwise)
          val anim = (flags & 0x02) != 0
          var o = 30
          var still = false
          var frames = false
          while (o < b.length) {
            if (o + 8 > b.length) throw Fail
            val fc = fourcc(o)
            val sz = u32le(b, o + 4)
            val pad = sz + (sz & 1)
            if (o + 8 + pad > b.length) throw Fail
            if (fc == "VP8 ") { vp8Dims(o + 8, sz); still = true }
            if (fc == "VP8L") still = true
            if (fc == "ANMF") frames = true
            o += 8 + pad.toInt
          }
          if ((anim && !frames) || (!anim && !still)) throw Fail
          Some(("extended", cw, ch))
        case _ => throw Fail
      }
    } catch { case Fail => None }
  }

  /** RIFF/WEBP wrap (fixture side). */
  private[graft] def riffWebp(
      chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    body.write("WEBP".getBytes("US-ASCII"))
    chunks.foreach { case (fc, payload) =>
      body.write(fc.getBytes("US-ASCII"))
      val n = payload.length
      body.write(n & 0xff); body.write((n >> 8) & 0xff)
      body.write((n >> 16) & 0xff); body.write((n >> 24) & 0xff)
      body.write(payload, 0, n)
      if ((n & 1) == 1) body.write(0)
    }
    val bb = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(bb.length & 0xff); out.write((bb.length >> 8) & 0xff)
    out.write((bb.length >> 16) & 0xff); out.write((bb.length >> 24) & 0xff)
    out.write(bb, 0, bb.length)
    out.toByteArray
  }

  /** A VP8 key-frame header + deterministic first-partition filler
    * (fixture side — enough header for the census laws; no pixels). */
  private[graft] def vp8KeyPayload(w: Int, h: Int, partBytes: Int,
      seed: Int): Array[Byte] = {
    require(w >= 1 && w < (1 << 14) && h >= 1 && h < (1 << 14) &&
      partBytes >= 0 && partBytes < (1 << 19))
    val out = new Array[Byte](10 + partBytes)
    val tag = (partBytes << 5) | (1 << 4) // key frame, version 0, shown
    out(0) = (tag & 0xff).toByte
    out(1) = ((tag >> 8) & 0xff).toByte
    out(2) = ((tag >> 16) & 0xff).toByte
    out(3) = 0x9d.toByte; out(4) = 0x01; out(5) = 0x2a
    out(6) = (w & 0xff).toByte; out(7) = ((w >> 8) & 0x3f).toByte
    out(8) = (h & 0xff).toByte; out(9) = ((h >> 8) & 0x3f).toByte
    var k = 0
    while (k < partBytes) {
      out(10 + k) = ((seed * 31 + k * 7) % 256).toByte
      k += 1
    }
    out
  }

  /** VP8X chunk payload for a cw×ch canvas (fixture side). */
  private[graft] def vp8xPayload(cw: Int, ch: Int,
      flags: Int = 0): Array[Byte] = {
    require(cw >= 1 && cw <= (1 << 24) && ch >= 1 && ch <= (1 << 24))
    val out = new Array[Byte](10)
    out(0) = flags.toByte
    out(4) = ((cw - 1) & 0xff).toByte
    out(5) = (((cw - 1) >> 8) & 0xff).toByte
    out(6) = (((cw - 1) >> 16) & 0xff).toByte
    out(7) = ((ch - 1) & 0xff).toByte
    out(8) = (((ch - 1) >> 8) & 0xff).toByte
    out(9) = (((ch - 1) >> 16) & 0xff).toByte
    out
  }

  private[graft] def encodeVp8l(argb: Array[Int], w: Int, h: Int,
      opts: EncOpts = EncOpts()): Array[Byte] = {
    require(argb.length == w * h && w >= 1 && h >= 1 && w <= 16384 &&
      h <= 16384)
    require(!(opts.palette && (opts.subtractGreen ||
      opts.predictor.nonEmpty || opts.colorElt.nonEmpty)))
    val bw = new Bw
    bw.writeBits(0x2f, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(if (argb.exists(p => a8(p) != 0xff)) 1 else 0, 1)
    bw.writeBits(0, 3) // version
    var px = argb.clone()
    var codedW = w
    // forward transforms in stream order (decoder inverts in reverse)
    if (opts.predictor.nonEmpty) {
      val mode = opts.predictor.get
      require(mode >= 0 && mode <= 13)
      bw.writeBits(1, 1)
      bw.writeBits(0, 2) // PREDICTOR
      val bits = 9 // one 512-block: uniform mode
      require(w <= 512 && h <= 512)
      bw.writeBits(bits - 2, 3)
      // residuals vs the reconstruction the decoder will run
      val res = new Array[Int](px.length)
      var p = 0
      while (p < px.length) {
        val pr = predict(mode, px, p, w)
        res(p) = pack(a8(px(p)) - a8(pr), r8(px(p)) - r8(pr),
          g8(px(p)) - g8(pr), b8(px(p)) - b8(pr))
        p += 1
      }
      writeSubImage(bw, Array(pack(0, 0, mode, 0)), 1)
      px = res
    }
    if (opts.colorElt.nonEmpty) {
      val elt = opts.colorElt.get
      bw.writeBits(1, 1)
      bw.writeBits(1, 2) // COLOR
      val bits = 9
      require(w <= 512 && h <= 512)
      bw.writeBits(bits - 2, 3)
      writeSubImage(bw, Array(elt | 0xff000000), 1)
      // forward color transform (inverse of the decoder's inverse)
      val g2r = b8(elt)
      val g2b = g8(elt)
      val r2b = r8(elt)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = g8(p)
        val nr = (r8(p) - ctDelta(g2r, g)) & 0xff
        val nb = (b8(p) - ctDelta(g2b, g) - ctDelta(r2b, r8(p))) & 0xff
        px(i) = pack(a8(p), nr, g, nb)
        i += 1
      }
    }
    if (opts.subtractGreen) {
      bw.writeBits(1, 1)
      bw.writeBits(2, 2) // SUBTRACT_GREEN
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = g8(p)
        px(i) = pack(a8(p), r8(p) - g, g, b8(p) - g)
        i += 1
      }
    }
    if (opts.palette) {
      val pal = scala.collection.mutable.LinkedHashSet.empty[Int]
      px.foreach(pal += _)
      require(pal.size <= 256, "palette overflow")
      val palette = pal.toArray
      bw.writeBits(1, 1)
      bw.writeBits(3, 2) // COLOR_INDEXING
      bw.writeBits(palette.length - 1, 8)
      // delta-coded palette sub-image
      val deltas = palette.zipWithIndex.map { case (p, i) =>
        if (i == 0) p
        else pack(a8(p) - a8(palette(i - 1)), r8(p) - r8(palette(i - 1)),
          g8(p) - g8(palette(i - 1)), b8(p) - b8(palette(i - 1)))
      }
      writeSubImage(bw, deltas, palette.length)
      val idxOf = palette.zipWithIndex.toMap
      val wb = paletteWidthBits(palette.length)
      val perByte = 1 << wb
      val bpp = 8 >> wb
      codedW = divRoundUp(w, perByte)
      val packed = new Array[Int](codedW * h)
      var y = 0
      while (y < h) {
        var cx = 0
        while (cx < codedW) {
          var green = 0
          var k = 0
          while (k < perByte) {
            val x = cx * perByte + k
            if (x < w) green |= idxOf(px(y * w + x)) << (k * bpp)
            k += 1
          }
          packed(y * codedW + cx) = pack(0xff, 0, green, 0)
          cx += 1
        }
        y += 1
      }
      px = packed
    }
    bw.writeBits(0, 1) // end of transforms
    writeImageBody(bw, px, codedW, opts.cacheBits, opts.rowCopy,
      level0 = true)
    val payload = bw.bytes
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit =
      (0 until 4).foreach(k => out.write(((v >> (8 * k)) & 0xff).toInt))
    out.write("RIFF".getBytes("US-ASCII"))
    le32(4L + 8L + payload.length + (payload.length & 1))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    le32(payload.length.toLong)
    out.write(payload)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ==================================================================
  // DataFrame surface + fixture (q218)

  /** One row per decodable WebP: integer pixel stats plus the shared
    * dHash fingerprint (routed through [[Multimodal.parseDHash]], so
    * the hash gate spans the whole VP8L chain). */
  def extractWebp(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("gray_sum", LongType, true),
      StructField("n_colors", IntegerType, true),
      StructField("dhash", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseVp8l(media)).toOption.flatten match {
          case Some(img) =>
            var gsum = 0L
            val distinct = scala.collection.mutable.HashSet.empty[Int]
            img.argb.foreach { p =>
              gsum += g8(p)
              distinct += p
            }
            val fp = Multimodal.parseDHash(media).map(_._1)
            Row(r.getLong(0), img.width, img.height, gsum, distinct.size,
              fp.map(Long.box).orNull, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Fixture: the q190 law image per id (scale 1 + id%3), with the
    * WIRE routed by id % 6 across the whole codec surface — plain
    * literals / subtract-green / a sweeping predictor mode / palette
    * with bundling / color cache + row-copy LZ77 / all three
    * pixel-value transforms stacked — while the decoded pixels obey
    * ONE law, so the oracle is wire-blind. */
  def webpFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val s = 1 + i % 3
      val px = Multimodal.dhashLawPixels(Multimodal.dhashBit(i), s)
      val opts = i % 6 match {
        case 0 => EncOpts()
        case 1 => EncOpts(subtractGreen = true)
        case 2 => EncOpts(predictor = Some((i * 7) % 14))
        case 3 => EncOpts(palette = true)
        case 4 => EncOpts(cacheBits = 4, rowCopy = true)
        case _ => EncOpts(subtractGreen = true, predictor = Some(11),
          colorElt = Some(0x106090))
      }
      Row(i.toLong, encodeVp8l(px, 9 * s, 8 * s, opts))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
