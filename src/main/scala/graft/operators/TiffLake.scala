package graft.operators

/** Baseline TIFF 6.0 image decode — TIFF is the scanned-document and
  * scientific-imaging format a large image corpus yields next to
  * PNG/JPEG/WebP (ExifLake already walks TIFF *metadata*; this closes
  * the pixel half flagged in the r14 verdict). REAL decode end to
  * end, written against the public TIFF 6.0 specification, covering
  * the baseline subset a strict curation pipeline can pin exactly:
  *
  *  - both byte orders (`II*\0` little-endian, `MM\0*` big-endian);
  *  - exactly ONE IFD (next-IFD offset must be 0 — multi-page rejects,
  *    not silently-first-page), entries in strictly ascending tag
  *    order as the spec requires, every out-of-line value bounded in
  *    Long domain before narrowing (the ExifLake int-wrap lesson);
  *  - PhotometricInterpretation 0 (WhiteIsZero — inverted grayscale),
  *    1 (BlackIsZero), 2 (RGB, SamplesPerPixel 3), 3 (palette via a
  *    768-entry 16-bit ColorMap, 8-bit value = entry >> 8);
  *  - BitsPerSample 8 per sample (the tag is REQUIRED here: its TIFF
  *    default is 1 bit and bilevel is out of this subset — absent
  *    rejects rather than guesses);
  *  - strip organization: RowsPerStrip (default = all rows), matching
  *    StripOffsets/StripByteCounts counts, every strip decoding to
  *    exactly rows·width·spp bytes;
  *  - Compression 1 (none — byte count must equal the raster size
  *    exactly), 32773 (PackBits — strict: exact consume AND exact
  *    produce, -128 no-op accepted), 5 (LZW — see below) with
  *    Predictor 2 (horizontal differencing, per row per channel);
  *  - documented strict-rejects instead of guesses: tiles (tags
  *    322-325), PlanarConfiguration 2, Orientation != 1,
  *    FillOrder != 1, ExtraSamples present, SampleFormat != unsigned,
  *    unknown compression, bits-per-sample != 8.
  *
  * TIFF LZW (the one genuinely tricky layer): MSB-first bit packing,
  * ClearCode 256 / EOI 257 / first dynamic code 258, 9→12 bit codes
  * with the TIFF "early change". The ±1 is derived, not guessed: the
  * encoder writes code c_k then adds table entry 257+k, while the
  * decoder adds entry 256+k after *reading* c_k — the decoder's table
  * lags the encoder's by exactly one entry at every read. Hence if
  * the encoder widens after adding code (1<<w)-1 (511, 1023, 2047 —
  * so the first code written at w+1 bits is the one following that
  * add), the decoder must widen after adding code (1<<w)-2 (510,
  * 1022, 2046). A strip must BEGIN with ClearCode, EOI must land in
  * the strip's final byte (at most 7 pad bits follow), and once the
  * table reaches 4094 entries only Clear/EOI are accepted (the spec
  * requires the encoder to have emitted ClearCode there).
  *
  * The encoder (fixture/test side) writes the same subset it decodes
  * — both endians, all four photometrics, all three compressions,
  * multi-strip layouts, both predictors — so round-trip property
  * tests drive every decode path with pixels pinned exactly, and a
  * dedicated high-entropy round-trip crosses the 9→10→11 bit LZW
  * width boundaries.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object TiffLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class TiffImage(
      width: Int, height: Int, argb: Array[Int],
      photometric: Int, compression: Int, nStrips: Int,
      bigEndian: Boolean)

  // ------------------------------------------------------------------
  // bounded multi-byte reads (all offsets validated in Long domain)

  private final class Rd(b: Array[Byte], be: Boolean) {
    val len: Long = b.length.toLong
    def u8(o: Long): Int = {
      if (o < 0 || o >= len) throw Fail
      b(o.toInt) & 0xff
    }
    def u16(o: Long): Int =
      if (be) (u8(o) << 8) | u8(o + 1)
      else (u8(o + 1) << 8) | u8(o)
    def u32(o: Long): Long =
      if (be) (u16(o).toLong << 16) | u16(o + 2).toLong
      else (u16(o + 2).toLong << 16) | u16(o).toLong
    def slice(o: Long, n: Long): Array[Byte] = {
      if (o < 0 || n < 0 || o + n > len) throw Fail
      java.util.Arrays.copyOfRange(b, o.toInt, (o + n).toInt)
    }
  }

  // one parsed IFD entry: tag, type, count, and the offset where the
  // value bytes live (inline in the entry or out-of-line)
  private final case class Ent(tag: Int, typ: Int, count: Long, valOff: Long)

  private def typeSize(typ: Int): Int = typ match {
    case 1 | 2 => 1 // BYTE, ASCII
    case 3 => 2 // SHORT
    case 4 => 4 // LONG
    case 5 => 8 // RATIONAL
    case _ => throw Fail
  }

  /** Scalar SHORT-or-LONG with count 1 (width, length, etc.). */
  private def scalar(rd: Rd, e: Ent): Long = {
    if (e.count != 1) throw Fail
    e.typ match {
      case 3 => rd.u16(e.valOff).toLong
      case 4 => rd.u32(e.valOff)
      case _ => throw Fail
    }
  }

  /** SHORT-or-LONG array of the entry's declared count. */
  private def longs(rd: Rd, e: Ent): Array[Long] = {
    if (e.count < 1 || e.count > (1 << 20)) throw Fail
    val n = e.count.toInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = e.typ match {
        case 3 => rd.u16(e.valOff + 2L * i).toLong
        case 4 => rd.u32(e.valOff + 4L * i)
        case _ => throw Fail
      }
      i += 1
    }
    out
  }

  private def shorts(rd: Rd, e: Ent): Array[Int] = {
    if (e.typ != 3 || e.count < 1 || e.count > (1 << 20)) throw Fail
    val n = e.count.toInt
    Array.tabulate(n)(i => rd.u16(e.valOff + 2L * i))
  }

  // ------------------------------------------------------------------
  // PackBits (strict: exact consume, exact produce)

  private def unpackBits(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var ip = 0
    var op = 0
    while (op < expected) {
      if (ip >= in.length) throw Fail
      val n = in(ip)
      ip += 1
      if (n >= 0) { // n+1 literal bytes
        val cnt = n + 1
        if (ip + cnt > in.length || op + cnt > expected) throw Fail
        System.arraycopy(in, ip, out, op, cnt)
        ip += cnt
        op += cnt
      } else if (n != -128) { // repeat next byte 1-n times
        val cnt = 1 - n
        if (ip >= in.length || op + cnt > expected) throw Fail
        java.util.Arrays.fill(out, op, op + cnt, in(ip))
        ip += 1
        op += cnt
      } // -128: no-op
      // a trailing run of no-ops after the final byte would be
      // pointless padding no known writer emits — consumed exactly:
    }
    while (ip < in.length) { // only -128 no-ops may remain
      if (in(ip) != -128) throw Fail
      ip += 1
    }
    out
  }

  private[graft] def packBits(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < in.length) {
      var run = 1
      while (i + run < in.length && in(i + run) == in(i) && run < 128)
        run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(in(i))
        i += run
      } else {
        // literal packet: until a run of >= 3 starts (2-byte runs may
        // ride inside literals) or 128 bytes
        var j = i + 1
        while (j < in.length && j - i < 128 &&
            !(j + 2 < in.length && in(j) == in(j + 1) &&
              in(j) == in(j + 2))) j += 1
        out.write(j - i - 1)
        out.write(in, i, j - i)
        i = j
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // TIFF LZW

  private final val ClearCode = 256
  private final val EoiCode = 257

  /** MSB-first code reader over one strip. */
  private final class MsbBits(b: Array[Byte]) {
    var pos = 0L // bit position
    val lim: Long = b.length.toLong * 8
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= lim) throw Fail
        v = (v << 1) | ((b((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  private def lzwDecode(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var op = 0
    val br = new MsbBits(in)
    // table: prefix code and final byte per dynamic entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextFree = 258
    var width = 9
    var oldCode = -1
    val stack = new Array[Byte](4096)
    @inline def emit(code: Int): Byte = { // returns first byte
      var c = code
      var sp = 0
      while (c >= 258) {
        if (sp >= stack.length) throw Fail
        stack(sp) = suffix(c)
        sp += 1
        c = prefix(c)
      }
      val first = c.toByte
      if (op + sp + 1 > expected) throw Fail
      out(op) = first
      op += 1
      var i = sp - 1
      while (i >= 0) { out(op) = stack(i); op += 1; i -= 1 }
      first
    }
    var first = true
    var done = false
    while (!done) {
      val code = br.read(width)
      if (first && code != ClearCode) throw Fail // must begin with Clear
      first = false
      if (code == EoiCode) done = true
      else if (code == ClearCode) {
        nextFree = 258
        width = 9
        val c2 = br.read(width)
        if (c2 == EoiCode) done = true
        else {
          if (c2 >= 256) throw Fail // first code after Clear: literal
          emit(c2)
          oldCode = c2
        }
      } else {
        if (oldCode < 0) throw Fail
        // table-full guard: per spec the encoder must have cleared
        if (nextFree >= 4094) throw Fail
        if (code > nextFree) throw Fail
        val first =
          if (code < nextFree) emit(code)
          else { // KwKwK: code == nextFree -> string(old) + first(old)
            var c = oldCode
            while (c >= 258) c = prefix(c)
            val f = c.toByte
            emit(oldCode)
            if (op + 1 > expected) throw Fail
            out(op) = f
            op += 1
            f
          }
        prefix(nextFree) = oldCode
        suffix(nextFree) = first
        nextFree += 1
        // early change, decoder side: one entry before the encoder
        // (derivation in the object comment)
        if (width < 12 && nextFree == (1 << width) - 1) width += 1
        oldCode = code
      }
    }
    if (op != expected) throw Fail
    // EOI must land in the final byte: at most 7 pad bits remain
    if (br.lim - br.pos >= 8) throw Fail
    out
  }

  private final class MsbBw {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def write(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) { buf.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def bytes: Array[Byte] = {
      if (n > 0) { buf.write(cur << (8 - n)); cur = 0; n = 0 }
      buf.toByteArray
    }
  }

  private[graft] def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val bw = new MsbBw
    // (prefixCode << 8 | byte) -> code
    val table = new java.util.HashMap[Integer, Integer](8192)
    var nextFree = 258
    var width = 9
    bw.write(ClearCode, width)
    var omega = -1 // current prefix code; -1 = empty
    var i = 0
    while (i < in.length) {
      val c = in(i) & 0xff
      if (omega < 0) omega = c
      else {
        val key = (omega << 8) | c
        val hit = table.get(key)
        if (hit != null) omega = hit
        else {
          bw.write(omega, width)
          table.put(key, nextFree)
          nextFree += 1
          // early change, encoder side
          if (width < 12 && nextFree == (1 << width)) width += 1
          omega = c
          if (nextFree == 4094) { // table full: clear per spec
            bw.write(omega, width)
            bw.write(ClearCode, width)
            table.clear()
            nextFree = 258
            width = 9
            omega = -1
          }
        }
      }
      i += 1
    }
    if (omega >= 0) bw.write(omega, width)
    bw.write(EoiCode, width)
    bw.bytes
  }

  // ------------------------------------------------------------------
  // decode

  /** Decode one baseline TIFF; None on any violation. */
  private[graft] def parseTiff(b: Array[Byte]): Option[TiffImage] = {
    if (b == null || b.length < 8) return None
    val be =
      if (b(0) == 'M' && b(1) == 'M') true
      else if (b(0) == 'I' && b(1) == 'I') false
      else return None
    try {
      val rd = new Rd(b, be)
      if (rd.u16(2) != 42) throw Fail
      val ifdOff = rd.u32(4)
      if (ifdOff < 8 || (ifdOff & 1) != 0) throw Fail // word-aligned
      val n = rd.u16(ifdOff)
      if (n < 1) throw Fail
      if (rd.u32(ifdOff + 2 + 12L * n) != 0) throw Fail // single IFD
      val ents = new java.util.TreeMap[Int, Ent]()
      var prevTag = -1
      var i = 0
      while (i < n) {
        val eo = ifdOff + 2 + 12L * i
        val tag = rd.u16(eo)
        if (tag <= prevTag) throw Fail // strictly ascending tag order
        prevTag = tag
        val typ = rd.u16(eo + 2)
        val count = rd.u32(eo + 4)
        if (typ >= 1 && typ <= 5) {
          val size = typeSize(typ) * count
          val valOff =
            if (size <= 4) eo + 8
            else {
              val off = rd.u32(eo + 8)
              if ((off & 1) != 0) throw Fail // word-aligned values
              off
            }
          if (valOff + size > rd.len) throw Fail
          ents.put(tag, Ent(tag, typ, count, valOff))
        } else {
          // TIFF 6.0 p.16: a reader must SKIP fields whose type it
          // does not know (real files carry 6-12 on baggage tags);
          // the entry still occupies the IFD slot but is never read —
          // a REQUIRED tag carried in an unknown type then rejects
          // through the missing-tag path, not a guess
          ents.put(tag, Ent(tag, typ, count, eo + 8))
        }
        i += 1
      }
      @inline def ent(tag: Int): Option[Ent] = Option(ents.get(tag))
      @inline def req(tag: Int): Ent = ent(tag).getOrElse(throw Fail)
      // strict-rejects: anything that would change pixel meaning
      for (t <- Seq(322, 323, 324, 325, 338)) // tiles, ExtraSamples
        if (ents.containsKey(t)) throw Fail
      for ((t, want) <- Seq(266 -> 1L, 274 -> 1L, 284 -> 1L))
        ent(t).foreach(e => if (scalar(rd, e) != want) throw Fail)
      ent(339).foreach(e => // SampleFormat: unsigned only
        if (shorts(rd, e).exists(_ != 1)) throw Fail)
      val w = scalar(rd, req(256))
      val h = scalar(rd, req(257))
      // bound each factor BEFORE the product: w,h are u32 reads, so
      // w*h can wrap past 2^63 and slip a pure product bound
      if (w < 1 || h < 1 || w > (1L << 22) || h > (1L << 22) ||
          w * h > (1L << 22)) throw Fail
      val width = w.toInt
      val height = h.toInt
      val pm = scalar(rd, req(262)).toInt
      val spp = ent(277).map(scalar(rd, _)).getOrElse(1L).toInt
      val expSpp = pm match {
        case 0 | 1 | 3 => 1
        case 2 => 3
        case _ => throw Fail
      }
      if (spp != expSpp) throw Fail
      val bpsE = req(258) // required: the TIFF default is 1-bit
      if (bpsE.count != spp) throw Fail
      if (shorts(rd, bpsE).exists(_ != 8)) throw Fail
      val comp = ent(259).map(scalar(rd, _)).getOrElse(1L).toInt
      if (comp != 1 && comp != 5 && comp != 32773) throw Fail
      val pred = ent(317).map(scalar(rd, _)).getOrElse(1L).toInt
      if (pred != 1 && (pred != 2 || comp != 5)) throw Fail
      val rps = ent(278).map(scalar(rd, _)).getOrElse(h)
      if (rps < 1) throw Fail
      val nStrips = ((h + rps - 1) / rps).toInt
      val offs = longs(rd, req(273))
      val cnts = longs(rd, req(279))
      if (offs.length != nStrips || cnts.length != nStrips) throw Fail
      val cmap: Array[Int] =
        if (pm == 3) {
          val e = req(320)
          if (e.count != 3L * 256) throw Fail
          shorts(rd, e)
        } else {
          if (ents.containsKey(320)) throw Fail
          null
        }
      // decode strips into one contiguous sample raster
      val raster = new Array[Byte](width * height * spp)
      var strip = 0
      var row = 0
      while (strip < nStrips) {
        val rows = math.min(rps, h - row).toInt
        val expected = rows * width * spp
        val in = rd.slice(offs(strip), cnts(strip))
        val dec = comp match {
          case 1 =>
            if (in.length != expected) throw Fail
            in
          case 32773 => unpackBits(in, expected)
          case 5 => lzwDecode(in, expected)
        }
        System.arraycopy(dec, 0, raster, row * width * spp, expected)
        strip += 1
        row += rows
      }
      if (pred == 2) { // horizontal differencing, per row per channel
        var y = 0
        while (y < height) {
          val base = y * width * spp
          var x = spp
          while (x < width * spp) {
            raster(base + x) = (raster(base + x) + raster(base + x - spp))
              .toByte
            x += 1
          }
          y += 1
        }
      }
      val argb = new Array[Int](width * height)
      var p = 0
      while (p < argb.length) {
        argb(p) = pm match {
          case 0 =>
            val v = 255 - (raster(p) & 0xff)
            0xff000000 | (v << 16) | (v << 8) | v
          case 1 =>
            val v = raster(p) & 0xff
            0xff000000 | (v << 16) | (v << 8) | v
          case 2 =>
            val o = p * 3
            0xff000000 | ((raster(o) & 0xff) << 16) |
              ((raster(o + 1) & 0xff) << 8) | (raster(o + 2) & 0xff)
          case 3 =>
            val idx = raster(p) & 0xff
            0xff000000 | ((cmap(idx) >> 8) << 16) |
              ((cmap(256 + idx) >> 8) << 8) | (cmap(512 + idx) >> 8)
        }
        p += 1
      }
      Some(TiffImage(width, height, argb, pm, comp, nStrips, be))
    } catch { case Fail => None }
  }

  // ==================================================================
  // encoder (fixture/test side)

  private[graft] final case class TiffOpts(
      bigEndian: Boolean = false,
      photometric: Int = 1, // 0 gray-inverted, 1 gray, 2 RGB, 3 palette
      compression: Int = 1, // 1, 5 (LZW), 32773 (PackBits)
      rowsPerStrip: Int = 0, // 0 = all rows in one strip
      predictor: Int = 1)

  private final class Wr(be: Boolean) {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def u16(v: Int): Unit =
      if (be) { u8(v >> 8); u8(v) } else { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit =
      if (be) { u16((v >> 16).toInt); u16(v.toInt) }
      else { u16(v.toInt); u16((v >> 16).toInt) }
    def raw(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
    def size: Int = buf.size()
  }

  /** Encode an ARGB image per `opts` (palette requires <= 256 distinct
    * colors; ColorMap entries are v·257 so decode recovers v exactly). */
  private[graft] def encodeTiff(argb: Array[Int], w: Int, h: Int,
      opts: TiffOpts = TiffOpts()): Array[Byte] = {
    require(argb.length == w * h && w >= 1 && h >= 1)
    val spp = if (opts.photometric == 2) 3 else 1
    require(opts.predictor == 1 ||
      (opts.predictor == 2 && opts.compression == 5))
    // palette (photometric 3)
    val palette: Array[Int] =
      if (opts.photometric == 3) {
        val seen = new scala.collection.mutable.LinkedHashSet[Int]
        argb.foreach(p => seen += (p & 0xffffff))
        require(seen.size <= 256, "palette overflow")
        seen.toArray
      } else null
    val palIdx: Map[Int, Int] =
      if (palette != null) palette.zipWithIndex.toMap else null
    // sample raster
    val raster = new Array[Byte](w * h * spp)
    var p = 0
    while (p < argb.length) {
      val px = argb(p)
      opts.photometric match {
        case 0 => raster(p) = (255 - ((px >> 8) & 0xff)).toByte
        case 1 => raster(p) = ((px >> 8) & 0xff).toByte
        case 2 =>
          raster(3 * p) = ((px >> 16) & 0xff).toByte
          raster(3 * p + 1) = ((px >> 8) & 0xff).toByte
          raster(3 * p + 2) = (px & 0xff).toByte
        case 3 => raster(p) = palIdx(px & 0xffffff).toByte
      }
      p += 1
    }
    val rps = if (opts.rowsPerStrip <= 0) h else opts.rowsPerStrip
    val nStrips = (h + rps - 1) / rps
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(rps, h - s * rps)
      val plain = java.util.Arrays.copyOfRange(
        raster, s * rps * w * spp, (s * rps + rows) * w * spp)
      if (opts.predictor == 2) { // forward horizontal differencing
        var y = rows - 1
        while (y >= 0) {
          val base = y * w * spp
          var x = w * spp - 1
          while (x >= spp) {
            plain(base + x) = (plain(base + x) - plain(base + x - spp))
              .toByte
            x -= 1
          }
          y -= 1
        }
      }
      opts.compression match {
        case 1 => plain
        case 5 => lzwEncode(plain)
        case 32773 => packBits(plain)
      }
    }
    // layout: header(8) | strip data (word-aligned) | out-of-line tag
    // values | IFD
    val wr = new Wr(opts.bigEndian)
    wr.raw(if (opts.bigEndian) Array[Byte]('M', 'M', 0, 42)
      else Array[Byte]('I', 'I', 42, 0))
    val ifdOffFixup = wr.size
    wr.u32(0) // patched below
    val stripOffs = strips.map { s =>
      if ((wr.size & 1) != 0) wr.u8(0) // word alignment
      val off = wr.size
      wr.raw(s)
      off
    }
    case class Tag(tag: Int, typ: Int, count: Long,
        inline: Option[Long] = None, values: Array[Long] = null)
    val tags = scala.collection.mutable.ArrayBuffer.empty[Tag]
    tags += Tag(256, 3, 1, Some(w.toLong))
    tags += Tag(257, 3, 1, Some(h.toLong))
    tags += Tag(258, 3, spp.toLong,
      values = Array.fill(spp)(8L))
    tags += Tag(259, 3, 1, Some(opts.compression.toLong))
    tags += Tag(262, 3, 1, Some(opts.photometric.toLong))
    tags += Tag(273, 4, nStrips.toLong,
      values = stripOffs.map(_.toLong).toArray)
    tags += Tag(277, 3, 1, Some(spp.toLong))
    tags += Tag(278, 3, 1, Some(rps.toLong))
    tags += Tag(279, 4, nStrips.toLong,
      values = strips.map(_.length.toLong).toArray)
    if (opts.predictor == 2) tags += Tag(317, 3, 1, Some(2L))
    if (palette != null)
      tags += Tag(320, 3, 768, values =
        (palette.map(c => (((c >> 16) & 0xff) * 257).toLong) ++
          Array.fill(256 - palette.length)(0L) ++
          palette.map(c => (((c >> 8) & 0xff) * 257).toLong) ++
          Array.fill(256 - palette.length)(0L) ++
          palette.map(c => ((c & 0xff) * 257).toLong) ++
          Array.fill(256 - palette.length)(0L)))
    // out-of-line values
    val valueOffs = tags.map { t =>
      val size = typeSize(t.typ) * t.count
      if (t.inline.nonEmpty || size <= 4) -1L
      else {
        if ((wr.size & 1) != 0) wr.u8(0)
        val off = wr.size.toLong
        t.values.foreach { v =>
          if (t.typ == 3) wr.u16(v.toInt) else wr.u32(v)
        }
        off
      }
    }
    if ((wr.size & 1) != 0) wr.u8(0)
    val ifdOff = wr.size
    val sorted = tags.zip(valueOffs).sortBy(_._1.tag)
    wr.u16(sorted.length)
    sorted.foreach { case (t, voff) =>
      wr.u16(t.tag)
      wr.u16(t.typ)
      wr.u32(t.count)
      val before = wr.size
      if (voff >= 0) wr.u32(voff)
      else t.inline match {
        case Some(v) => if (t.typ == 3) { wr.u16(v.toInt); wr.u16(0) }
          else wr.u32(v)
        case None => // small array inline
          t.values.foreach(v =>
            if (t.typ == 3) wr.u16(v.toInt) else wr.u32(v))
          while (wr.size < before + 4) wr.u8(0)
      }
    }
    wr.u32(0) // next IFD
    val out = wr.buf.toByteArray
    // patch the first-IFD offset
    val be = opts.bigEndian
    var k = 0
    while (k < 4) {
      val shift = if (be) 8 * (3 - k) else 8 * k
      out(ifdOffFixup + k) = ((ifdOff >> shift) & 0xff).toByte
      k += 1
    }
    out
  }

  // ==================================================================
  // DataFrame surface + fixture (q222)

  /** One row per decodable TIFF: integer pixel stats, the wire shape
    * (n_strips, compression) and the shared dHash fingerprint (routed
    * through [[Multimodal.parseDHash]], so the hash gate spans the
    * whole container+codec chain). */
  def extractTiff(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("n_strips", IntegerType, true),
      StructField("compression", IntegerType, true),
      StructField("gray_sum", LongType, true),
      StructField("n_colors", IntegerType, true),
      StructField("dhash", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseTiff(media)).toOption.flatten match {
          case Some(img) =>
            var gsum = 0L
            val distinct = scala.collection.mutable.HashSet.empty[Int]
            img.argb.foreach { px =>
              gsum += (px >> 8) & 0xff
              distinct += px
            }
            val fp = Multimodal.parseDHash(media).map(_._1)
            Row(r.getLong(0), img.width, img.height, img.nStrips,
              img.compression, gsum, distinct.size,
              fp.map(Long.box).orNull, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, null, null,
              false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Fixture: the q190 law image per id (scale 1 + id%3) behind EIGHT
    * wire variants routed by id % 8 — both endians, all four
    * photometrics, all three compressions, single- and multi-strip
    * layouts, both predictors — while the decoded pixels obey ONE
    * law, so the oracle is wire-blind on the pixel columns and
    * closed-form on the wire columns. */
  private[graft] def tiffOptsFor(i: Int): TiffOpts = (i % 8) match {
    case 0 => TiffOpts()
    case 1 => TiffOpts(bigEndian = true, compression = 32773,
      rowsPerStrip = 3)
    case 2 => TiffOpts(photometric = 2, rowsPerStrip = 2)
    case 3 => TiffOpts(bigEndian = true, photometric = 2,
      compression = 5, predictor = 2)
    case 4 => TiffOpts(photometric = 3)
    case 5 => TiffOpts(bigEndian = true, photometric = 0,
      rowsPerStrip = 5)
    case 6 => TiffOpts(compression = 5, rowsPerStrip = 4)
    case _ => TiffOpts(photometric = 2, compression = 32773)
  }

  def tiffFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val s = 1 + i % 3
      val px = Multimodal.dhashLawPixels(Multimodal.dhashBit(i), s)
      Row(i.toLong, encodeTiff(px, 9 * s, 8 * s, tiffOptsFor(i)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
