package graft.operators

/** TIFF 6.0 image decode — TIFF is the scanned-document and
  * scientific-imaging format a large image corpus yields next to
  * PNG/JPEG/WebP (ExifLake already walks TIFF *metadata*; this closes
  * the pixel half flagged in the r14 verdict). REAL decode end to
  * end, written against the public TIFF 6.0 specification, covering
  * the subset a strict curation pipeline can pin exactly:
  *
  *  - both byte orders (`II*\0` little-endian, `MM\0*` big-endian);
  *  - a bounded IFD chain (<= 32 pages, <= 2^24 samples across the
  *    whole chain, offsets STRICTLY ascending so cycles and backward
  *    links are structurally impossible): the
  *    multi-page shape scanned-document corpora actually ship, each
  *    page under the same per-IFD laws. The single-image surface
  *    ([[parseTiff]] — what the near-dup fingerprints consume) still
  *    requires exactly ONE page rather than silently picking one;
  *    [[parseTiffPages]] is the page-grain surface. IFD entries in
  *    strictly ascending tag order as the spec requires, every
  *    out-of-line value bounded in Long domain before narrowing (the
  *    ExifLake int-wrap lesson);
  *  - PhotometricInterpretation 0 (WhiteIsZero — inverted grayscale),
  *    1 (BlackIsZero), 2 (RGB, SamplesPerPixel 3), 3 (palette via a
  *    768-entry 16-bit ColorMap, 8-bit value = entry >> 8);
  *  - BitsPerSample: all 8, or all 1 (bilevel — the scanned-document
  *    depth; the tag's TIFF default IS 1 bit, so absence resolves per
  *    the spec); bilevel admits photometric 0/1 and Compression 1
  *    (byte-aligned packed rows), 4 (CCITT G4/T.6) or 2 (CCITT MH
  *    1D, "CCITT RLE") — the fax coders under photometric 0 only,
  *    the sense scanners write; see the G4/MH sections;
  *  - strip organization (RowsPerStrip default = all rows, matching
  *    StripOffsets/StripByteCounts counts, every strip decoding to
  *    exactly rows·width·spp samples) XOR tile organization (tags
  *    322-325: dimensions multiples of 16, count = across·down, edge
  *    padding discarded on assembly; the predictor's differencing
  *    scope is the SEGMENT row — tile, not image row);
  *  - Compression 1 (none — byte count must equal the raster size
  *    exactly), 32773 (PackBits — strict: exact consume AND exact
  *    produce, -128 no-op accepted), 5 (LZW — see below) with
  *    Predictor 2 (horizontal differencing, per row per channel),
  *    4 (G4, bilevel);
  *  - documented strict-rejects instead of guesses:
  *    PlanarConfiguration 2, Orientation != 1, FillOrder != 1,
  *    ExtraSamples present, SampleFormat != unsigned, unknown
  *    compression, bits-per-sample outside {1, 8}, mixed strip+tile
  *    tag families, fax coders on photometric 1, G3 with EOLs
  *    (Compression 3).
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
    /** Zero-pad to the next byte boundary (the MH-1D row law). */
    def align(): Unit = if (n > 0) { buf.write(cur << (8 - n)); cur = 0; n = 0 }
    /** Bits written so far (the G3 aligned-EOL fill computation). */
    def bitPos: Long = buf.size().toLong * 8 + n
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
    // the decoder adds one phantom table entry after reading the
    // final data code (its add always trails the read); when that add
    // lands exactly on its early-change boundary it reads the EOI one
    // bit wider — mirror the bump or the stream misparses. Content-
    // dependent: only streams whose final add crosses 510/1022/2046
    // hit it (found by a seeded tile sweep; G4Spec pins the shape).
    if (width < 12 && nextFree == (1 << width) - 1) width += 1
    bw.write(EoiCode, width)
    bw.bytes
  }

  // ------------------------------------------------------------------
  // CCITT G4 (ITU-T T.6, the TIFF Compression=4 of scanned-document
  // corpora): pure 2D MMR coding — no EOLs, no fill bits; every row
  // codes against the row above (an imaginary all-white line above
  // row 0), with vertical (V0, VR/VL 1-3), pass and horizontal modes;
  // horizontal mode's two run lengths use the T.4 modified-Huffman
  // white/black tables (terminating 0-63, makeup 64-1728 per colour,
  // extended makeup 1792-2560 common). The uncompressed-mode
  // extension (0000001xxx) is out of subset and rejects. An optional
  // EOFB (two 12-bit EOLs, 000000000001 twice) may close a segment;
  // either way at most 7 pad bits may remain. All code words below
  // are transcribed from the public ITU-T T.4 §4.1 / T.6 §2 tables;
  // G4Spec asserts prefix-freeness and completeness of each alphabet
  // and pins hand vectors, and every decode path round-trips against
  // the in-repo encoder.

  // (run, code, bitLen) — T.4 white codes
  private val WhiteTerm: Array[(Int, Int, Int)] = Array(
    (0, 0x35, 8), (1, 0x07, 6), (2, 0x07, 4), (3, 0x08, 4),
    (4, 0x0B, 4), (5, 0x0C, 4), (6, 0x0E, 4), (7, 0x0F, 4),
    (8, 0x13, 5), (9, 0x14, 5), (10, 0x07, 5), (11, 0x08, 5),
    (12, 0x08, 6), (13, 0x03, 6), (14, 0x34, 6), (15, 0x35, 6),
    (16, 0x2A, 6), (17, 0x2B, 6), (18, 0x27, 7), (19, 0x0C, 7),
    (20, 0x08, 7), (21, 0x17, 7), (22, 0x03, 7), (23, 0x04, 7),
    (24, 0x28, 7), (25, 0x2B, 7), (26, 0x13, 7), (27, 0x24, 7),
    (28, 0x18, 7), (29, 0x02, 8), (30, 0x03, 8), (31, 0x1A, 8),
    (32, 0x1B, 8), (33, 0x12, 8), (34, 0x13, 8), (35, 0x14, 8),
    (36, 0x15, 8), (37, 0x16, 8), (38, 0x17, 8), (39, 0x28, 8),
    (40, 0x29, 8), (41, 0x2A, 8), (42, 0x2B, 8), (43, 0x2C, 8),
    (44, 0x2D, 8), (45, 0x04, 8), (46, 0x05, 8), (47, 0x0A, 8),
    (48, 0x0B, 8), (49, 0x52, 8), (50, 0x53, 8), (51, 0x54, 8),
    (52, 0x55, 8), (53, 0x24, 8), (54, 0x25, 8), (55, 0x58, 8),
    (56, 0x59, 8), (57, 0x5A, 8), (58, 0x5B, 8), (59, 0x4A, 8),
    (60, 0x4B, 8), (61, 0x32, 8), (62, 0x33, 8), (63, 0x34, 8))

  private val WhiteMakeup: Array[(Int, Int, Int)] = Array(
    (64, 0x1B, 5), (128, 0x12, 5), (192, 0x17, 6), (256, 0x37, 7),
    (320, 0x36, 8), (384, 0x37, 8), (448, 0x64, 8), (512, 0x65, 8),
    (576, 0x68, 8), (640, 0x67, 8), (704, 0xCC, 9), (768, 0xCD, 9),
    (832, 0xD2, 9), (896, 0xD3, 9), (960, 0xD4, 9), (1024, 0xD5, 9),
    (1088, 0xD6, 9), (1152, 0xD7, 9), (1216, 0xD8, 9), (1280, 0xD9, 9),
    (1344, 0xDA, 9), (1408, 0xDB, 9), (1472, 0x98, 9), (1536, 0x99, 9),
    (1600, 0x9A, 9), (1664, 0x18, 6), (1728, 0x9B, 9))

  private val BlackTerm: Array[(Int, Int, Int)] = Array(
    (0, 0x37, 10), (1, 0x02, 3), (2, 0x03, 2), (3, 0x02, 2),
    (4, 0x03, 3), (5, 0x03, 4), (6, 0x02, 4), (7, 0x03, 5),
    (8, 0x05, 6), (9, 0x04, 6), (10, 0x04, 7), (11, 0x05, 7),
    (12, 0x07, 7), (13, 0x04, 8), (14, 0x07, 8), (15, 0x18, 9),
    (16, 0x17, 10), (17, 0x18, 10), (18, 0x08, 10), (19, 0x67, 11),
    (20, 0x68, 11), (21, 0x6C, 11), (22, 0x37, 11), (23, 0x28, 11),
    (24, 0x17, 11), (25, 0x18, 11), (26, 0xCA, 12), (27, 0xCB, 12),
    (28, 0xCC, 12), (29, 0xCD, 12), (30, 0x68, 12), (31, 0x69, 12),
    (32, 0x6A, 12), (33, 0x6B, 12), (34, 0xD2, 12), (35, 0xD3, 12),
    (36, 0xD4, 12), (37, 0xD5, 12), (38, 0xD6, 12), (39, 0xD7, 12),
    (40, 0x6C, 12), (41, 0x6D, 12), (42, 0xDA, 12), (43, 0xDB, 12),
    (44, 0x54, 12), (45, 0x55, 12), (46, 0x56, 12), (47, 0x57, 12),
    (48, 0x64, 12), (49, 0x65, 12), (50, 0x52, 12), (51, 0x53, 12),
    (52, 0x24, 12), (53, 0x37, 12), (54, 0x38, 12), (55, 0x27, 12),
    (56, 0x28, 12), (57, 0x58, 12), (58, 0x59, 12), (59, 0x2B, 12),
    (60, 0x2C, 12), (61, 0x5A, 12), (62, 0x66, 12), (63, 0x67, 12))

  private val BlackMakeup: Array[(Int, Int, Int)] = Array(
    (64, 0x0F, 10), (128, 0xC8, 12), (192, 0xC9, 12), (256, 0x5B, 12),
    (320, 0x33, 12), (384, 0x34, 12), (448, 0x35, 12), (512, 0x6C, 13),
    (576, 0x6D, 13), (640, 0x4A, 13), (704, 0x4B, 13), (768, 0x4C, 13),
    (832, 0x4D, 13), (896, 0x72, 13), (960, 0x73, 13), (1024, 0x74, 13),
    (1088, 0x75, 13), (1152, 0x76, 13), (1216, 0x77, 13),
    (1280, 0x52, 13), (1344, 0x53, 13), (1408, 0x54, 13),
    (1472, 0x55, 13), (1536, 0x5A, 13), (1600, 0x5B, 13),
    (1664, 0x64, 13), (1728, 0x65, 13))

  // extended makeup 1792-2560, common to both colours (T.4 Table 3b)
  private val ExtMakeup: Array[(Int, Int, Int)] = Array(
    (1792, 0x08, 11), (1856, 0x0C, 11), (1920, 0x0D, 11),
    (1984, 0x12, 12), (2048, 0x13, 12), (2112, 0x14, 12),
    (2176, 0x15, 12), (2240, 0x16, 12), (2304, 0x17, 12),
    (2368, 0x1C, 12), (2432, 0x1D, 12), (2496, 0x1E, 12),
    (2560, 0x1F, 12))

  private[graft] def mhAlphabet(black: Boolean): Array[(Int, Int, Int)] =
    (if (black) BlackTerm ++ BlackMakeup else WhiteTerm ++ WhiteMakeup) ++
      ExtMakeup

  // decode maps: (bitLen << 16 | code) -> run
  private def mhMap(black: Boolean): java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer](256)
    mhAlphabet(black).foreach { case (run, code, len) =>
      m.put((len << 16) | code, run)
    }
    m
  }
  private val WhiteMap = mhMap(black = false)
  private val BlackMap = mhMap(black = true)

  /** One MH run (makeup* then terminating), bounded by `limit`. */
  private def mhRun(br: MsbBits, black: Boolean, limit: Int): Int = {
    val map = if (black) BlackMap else WhiteMap
    var total = 0
    var terms = 0
    while (terms == 0) {
      var code = 0
      var len = 0
      var run = -1
      while (run < 0) {
        code = (code << 1) | br.read(1)
        len += 1
        if (len > 13) throw Fail
        val hit = map.get((len << 16) | code)
        if (hit != null) run = hit
      }
      total += run
      if (run < 64) terms = 1 // terminating code closes the run
      else if (total > limit + 2560) throw Fail // runaway makeups
    }
    if (total > limit) throw Fail
    total
  }

  /** Decode ONE 2D-coded row against the reference line's changing
    * elements (sentinel-padded); writes pixels at `rowBase` and
    * records the row's changing elements into `cur`, returning their
    * count. Shared by G4 (every row 2D) and G3 2D (tag-bit rows). */
  private def decode2dRow(br: MsbBits, w: Int, out: Array[Byte],
      rowBase: Int, ref: Array[Int], refN: Int,
      cur: Array[Int]): Int = {
      var curN = 0
      var a0 = -1
      var black = false
      var lo = 0
      while (a0 < w) {
        // b1: first ref transition > a0 whose parity matches the
        // current colour; b2: the next one after it
        while (lo < refN && ref(lo) <= a0) lo += 1
        val i1 = if ((lo & 1) == (if (black) 1 else 0)) lo else lo + 1
        val b1 = ref(i1)
        val b2 = ref(i1 + 1)
        // mode code: V0=1, VR1=011, VL1=010, H=001, P=0001,
        // VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
        val a0f = if (a0 < 0) 0 else a0
        @inline def fill(from: Int, until: Int, blk: Boolean): Unit = {
          if (until > w || until < from) throw Fail
          if (blk) java.util.Arrays.fill(out, rowBase + from,
            rowBase + until, 1.toByte)
        }
        if (br.read(1) == 1) { // V0
          fill(a0f, b1, black)
          if (b1 <= a0 && a0 >= 0) throw Fail
          if (curN > w + 1) throw Fail
          cur(curN) = b1; curN += 1
          a0 = b1
          black = !black
        } else if (br.read(1) == 1) { // 01x: VR1 / VL1
          val a1 = if (br.read(1) == 1) b1 + 1 else b1 - 1
          if (a1 < 0 || a1 > w || a1 <= a0) throw Fail
          fill(a0f, a1, black)
          if (curN > w + 1) throw Fail
          cur(curN) = a1; curN += 1
          a0 = a1
          black = !black
        } else if (br.read(1) == 1) { // 001: horizontal
          val r1 = mhRun(br, black, w)
          val r2 = mhRun(br, !black, w)
          // zero-length runs exist only where a valid encoding needs
          // them: r1=0 at row start (first pixel of the other colour),
          // r2=0 only when the row ends with r1 — anything else would
          // record duplicate transitions and corrupt the next row's
          // reference-line parity
          if (a0 >= 0 && r1 == 0) throw Fail
          val a1 = a0f + r1
          val a2 = a1 + r2
          if (a2 > w) throw Fail
          if (r2 == 0 && a2 != w) throw Fail
          fill(a0f, a1, black)
          fill(a1, a2, !black)
          if (curN > w) throw Fail
          cur(curN) = a1; cur(curN + 1) = a2; curN += 2
          a0 = a2
        } else if (br.read(1) == 1) { // 0001: pass
          fill(a0f, b2, black)
          if (b2 <= a0) throw Fail
          a0 = b2
        } else if (br.read(1) == 1) { // 00001x: VR2 / VL2
          val a1 = if (br.read(1) == 1) b1 + 2 else b1 - 2
          if (a1 < 0 || a1 > w || a1 <= a0) throw Fail
          fill(a0f, a1, black)
          if (curN > w + 1) throw Fail
          cur(curN) = a1; curN += 1
          a0 = a1
          black = !black
        } else if (br.read(1) == 1) { // 000001x: VR3 / VL3
          val a1 = if (br.read(1) == 1) b1 + 3 else b1 - 3
          if (a1 < 0 || a1 > w || a1 <= a0) throw Fail
          fill(a0f, a1, black)
          if (curN > w + 1) throw Fail
          cur(curN) = a1; curN += 1
          a0 = a1
          black = !black
        } else throw Fail // 0000001 extension (uncompressed) / EOL: out
      }
      if (a0 != w) throw Fail
      // transitions at w are not changing elements of the next row
      while (curN > 0 && cur(curN - 1) >= w) curN -= 1
      curN
  }

  /** Decode one G4 segment to one byte per sample (0 white, 1 black). */
  private[graft] def g4Decode(in: Array[Byte], w: Int,
      rows: Int): Array[Byte] = {
    if (w < 1 || rows < 1) throw Fail
    val out = new Array[Byte](w * rows)
    val br = new MsbBits(in)
    // changing elements of the reference line (positions where colour
    // flips; even index = white->black), padded with w sentinels so
    // b1/b2 lookups never fall off the end
    var ref = Array.fill(4)(w)
    var refN = 0
    // positions strictly increase within [0, w]: at most w+1
    // recorded entries per row; the guard is a pathology backstop
    val cur = new Array[Int](w + 8)
    var y = 0
    while (y < rows) {
      val curN = decode2dRow(br, w, out, y * w, ref, refN, cur)
      ref = java.util.Arrays.copyOf(cur, curN + 4)
      java.util.Arrays.fill(ref, curN, curN + 4, w)
      refN = curN
      y += 1
    }
    // optional EOFB (two EOLs), then at most 7 pad bits
    if (br.lim - br.pos >= 8) {
      if (br.lim - br.pos < 24 || br.read(24) != ((1 << 12) | 1)) throw Fail
      if (br.lim - br.pos >= 8) throw Fail
    }
    out
  }

  // encoder-side MH lookup tables (shared by G4 and the 1D coder)
  private lazy val TermW: Array[(Int, Int)] = {
    val a = new Array[(Int, Int)](64)
    WhiteTerm.foreach { case (r, c, l) => a(r) = (c, l) }
    a
  }
  private lazy val TermB: Array[(Int, Int)] = {
    val a = new Array[(Int, Int)](64)
    BlackTerm.foreach { case (r, c, l) => a(r) = (c, l) }
    a
  }
  private lazy val MkW: Map[Int, (Int, Int)] =
    (WhiteMakeup ++ ExtMakeup).map { case (r, c, l) => r -> ((c, l)) }
      .toMap
  private lazy val MkB: Map[Int, (Int, Int)] =
    (BlackMakeup ++ ExtMakeup).map { case (r, c, l) => r -> ((c, l)) }
      .toMap

  private def mhWrite(bw: MsbBw, run0: Int, black: Boolean): Unit = {
    var run = run0
    while (run >= 2624) {
      val (c, l) = if (black) MkB(2560) else MkW(2560)
      bw.write(c, l)
      run -= 2560
    }
    if (run >= 64) {
      val (c, l) = if (black) MkB(run / 64 * 64) else MkW(run / 64 * 64)
      bw.write(c, l)
      run %= 64
    }
    val (c, l) = if (black) TermB(run) else TermW(run)
    bw.write(c, l)
  }

  // ------------------------------------------------------------------
  // CCITT MH 1D (TIFF Compression=2, "CCITT RLE" — the T.4 one-
  // dimensional coder old scanners and faxes wrote): each row is an
  // independent alternating white/black MH run sequence starting
  // white (a black-first row opens with white run 0), runs summing
  // EXACTLY to the row width, and — the TIFF variant's law — every
  // row starts on a byte boundary (no EOL codes).

  /** Decode one MH-1D segment to one byte per sample. */
  private[graft] def mh1dDecode(in: Array[Byte], w: Int,
      rows: Int): Array[Byte] = {
    if (w < 1 || rows < 1) throw Fail
    val out = new Array[Byte](w * rows)
    val br = new MsbBits(in)
    var y = 0
    while (y < rows) {
      var x = 0
      var black = false
      var runIdx = 0
      while (x < w) {
        val run = mhRun(br, black, w - x)
        // a zero run is legal ONLY as the row's leading white run
        // (first pixel black); anywhere else — including a black 0
        // right after it — the decoder would loop forever
        if (run == 0 && runIdx > 0) throw Fail
        runIdx += 1
        if (black)
          java.util.Arrays.fill(out, y * w + x, y * w + x + run,
            1.toByte)
        x += run
        black = !black
      }
      br.pos = (br.pos + 7) / 8 * 8 // rows are byte-aligned
      y += 1
    }
    if (br.lim - br.pos >= 8) throw Fail
    out
  }

  // ------------------------------------------------------------------
  // CCITT G3 1D (TIFF Compression=3, T.4 with EOL framing — the
  // profile fax-originated documents ship): every row, INCLUDING the
  // first, is preceded by the 12-bit EOL code 000000000001 (T.4
  // sec 4.1.2); the rows themselves are the same alternating MH run
  // sequences as Compression 2. T4Options (tag 292) closes the
  // subset: bit 0 (2D coding — each EOL would carry a trailing mode
  // bit) and bit 1 (uncompressed mode) reject; bit 2 selects
  // byte-ALIGNED EOLs, honoured exactly — in aligned mode the zero
  // fill before an EOL is precisely what makes its trailing 1 end a
  // byte (at most 7 bits), in unaligned mode no fill is accepted.
  // T.4's RTC (six EOLs) is not used in TIFF (TIFF 6.0 p.49 "the
  // RTC should not be written"), so a trailing RTC rejects; after
  // the last row at most 7 zero pad bits close the segment.

  /** One EOL: optional alignment fill, eleven+ zeros, a one. */
  private def expectEol(br: MsbBits, aligned: Boolean): Unit = {
    var zeros = 0
    var bit = br.read(1)
    while (bit == 0) {
      zeros += 1
      if (zeros > 18) throw Fail // 11 + at most 7 fill bits
      bit = br.read(1)
    }
    if (zeros < 11) throw Fail
    if (aligned) {
      if ((br.pos & 7) != 0) throw Fail // the 1 must END a byte
    } else if (zeros != 11) throw Fail // no fill in unaligned mode
  }

  /** Decode one G3 1D segment to one byte per sample. */
  private[graft] def g31dDecode(in: Array[Byte], w: Int, rows: Int,
      aligned: Boolean): Array[Byte] = {
    if (w < 1 || rows < 1) throw Fail
    val out = new Array[Byte](w * rows)
    val br = new MsbBits(in)
    var y = 0
    while (y < rows) {
      expectEol(br, aligned)
      var x = 0
      var black = false
      var runIdx = 0
      while (x < w) {
        val run = mhRun(br, black, w - x)
        // a zero run is legal ONLY as the row's leading white run
        // (first pixel black) — the Compression-2 law
        if (run == 0 && runIdx > 0) throw Fail
        runIdx += 1
        if (black)
          java.util.Arrays.fill(out, y * w + x, y * w + x + run,
            1.toByte)
        x += run
        black = !black
      }
      y += 1
    }
    // no RTC: at most 7 zero pad bits close the segment
    if (br.lim - br.pos >= 8) throw Fail
    while (br.pos < br.lim) if (br.read(1) != 0) throw Fail
    out
  }

  /** Decode one G3 2D segment (T.4 sec 4.2: T4Options bit 0 set).
    * Every row is EOL-framed like 1D, but the EOL carries a trailing
    * tag bit — 1 = the next row is 1D-coded, 0 = 2D-coded against
    * the previous row with the SAME vertical/pass/horizontal machine
    * as G4. Fill before EOLs is out of this mode's subset (the
    * byte-aligned variant's fill placement relative to the tag bit
    * is writer-divergent in the wild — reject, never guess). */
  private[graft] def g32dDecode(in: Array[Byte], w: Int,
      rows: Int): Array[Byte] = {
    if (w < 1 || rows < 1) throw Fail
    val out = new Array[Byte](w * rows)
    val br = new MsbBits(in)
    var ref = Array.fill(4)(w)
    var refN = 0
    val cur = new Array[Int](w + 8)
    var y = 0
    while (y < rows) {
      expectEol(br, aligned = false)
      val tag = br.read(1)
      var curN = 0
      if (tag == 1) { // 1D row: MH runs, changing elements recorded
        var x = 0
        var black = false
        var runIdx = 0
        while (x < w) {
          val run = mhRun(br, black, w - x)
          if (run == 0 && runIdx > 0) throw Fail
          runIdx += 1
          if (black)
            java.util.Arrays.fill(out, y * w + x, y * w + x + run,
              1.toByte)
          x += run
          if (x < w) { cur(curN) = x; curN += 1 }
          black = !black
        }
      } else curN = decode2dRow(br, w, out, y * w, ref, refN, cur)
      ref = java.util.Arrays.copyOf(cur, curN + 4)
      java.util.Arrays.fill(ref, curN, curN + 4, w)
      refN = curN
      y += 1
    }
    // no RTC: at most 7 zero pad bits close the segment
    if (br.lim - br.pos >= 8) throw Fail
    while (br.pos < br.lim) if (br.read(1) != 0) throw Fail
    out
  }

  /** Encode one segment as G3 2D with K-factor `k`: every k-th row
    * is 1D-coded (the error-confinement convention), the rest 2D. */
  private[graft] def g32dEncode(samples: Array[Byte], w: Int,
      rows: Int, k: Int): Array[Byte] = {
    require(samples.length == w * rows && w >= 1 && rows >= 1 && k >= 1)
    val bw = new MsbBw
    var ref: Array[Int] = null
    var y = 0
    while (y < rows) {
      bw.write(1, 12) // EOL
      val curT = transitionsOf(samples, w, y)
      if (y % k == 0) {
        bw.write(1, 1) // tag: 1D row
        var x = 0
        var black = false
        while (x < w) {
          var run = 0
          while (x + run < w &&
            ((samples(y * w + x + run) != 0) == black)) run += 1
          mhWrite(bw, run, black)
          x += run
          black = !black
        }
      } else {
        bw.write(0, 1) // tag: 2D row
        encode2dRow(bw, ref, curT, w)
      }
      ref = curT
      y += 1
    }
    bw.bytes
  }

  /** Encode one segment of samples as G3 1D. */
  private[graft] def g31dEncode(samples: Array[Byte], w: Int,
      rows: Int, aligned: Boolean): Array[Byte] = {
    require(samples.length == w * rows && w >= 1 && rows >= 1)
    val bw = new MsbBw
    var y = 0
    while (y < rows) {
      if (aligned) { // fill so the EOL's trailing 1 ends a byte
        val fill = ((8 - (bw.bitPos + 12) % 8) % 8).toInt
        if (fill > 0) bw.write(0, fill)
      }
      bw.write(1, 12) // EOL
      var x = 0
      var black = false
      while (x < w) {
        var run = 0
        while (x + run < w &&
          ((samples(y * w + x + run) != 0) == black)) run += 1
        mhWrite(bw, run, black)
        x += run
        black = !black
      }
      y += 1
    }
    bw.bytes
  }

  /** Encode one segment of samples as MH 1D. */
  private[graft] def mh1dEncode(samples: Array[Byte], w: Int,
      rows: Int): Array[Byte] = {
    require(samples.length == w * rows && w >= 1 && rows >= 1)
    val bw = new MsbBw
    var y = 0
    while (y < rows) {
      var x = 0
      var black = false
      while (x < w) {
        var run = 0
        while (x + run < w &&
          ((samples(y * w + x + run) != 0) == black)) run += 1
        mhWrite(bw, run, black)
        x += run
        black = !black
      }
      bw.align()
      y += 1
    }
    bw.bytes
  }

  /** Changing elements of row y, padded with four w sentinels. */
  private def transitionsOf(samples: Array[Byte], w: Int,
      y: Int): Array[Int] = {
    val t = scala.collection.mutable.ArrayBuffer.empty[Int]
    var prev = 0
    var x = 0
    while (x < w) {
      val v = samples(y * w + x) & 1
      if (v != prev) { t += x; prev = v }
      x += 1
    }
    t += w; t += w; t += w; t += w
    t.toArray
  }

  /** Code ONE row 2D against the reference transitions (both
    * sentinel-padded). Shared by G4 and the G3 2D rows. */
  private def encode2dRow(bw: MsbBw, ref: Array[Int],
      curT: Array[Int], w: Int): Unit = {
    var a0 = -1
    var black = false
    var lo = 0 // into ref
    var ci = 0 // into curT: next transition > a0
    while (a0 < w) {
      while (lo + 1 < ref.length && ref(lo) <= a0) lo += 1
      val i1 = if ((lo & 1) == (if (black) 1 else 0)) lo else lo + 1
      val b1 = ref(i1)
      val b2 = ref(i1 + 1)
      while (curT(ci) <= a0 && curT(ci) < w) ci += 1
      val a1 = if (curT(ci) <= a0) w else curT(ci)
      if (b2 < a1) { // pass
        bw.write(1, 4) // 0001
        a0 = b2
      } else if (a1 - b1 >= -3 && a1 - b1 <= 3) { // vertical
        a1 - b1 match {
          case 0 => bw.write(1, 1)
          case 1 => bw.write(3, 3)
          case -1 => bw.write(2, 3)
          case 2 => bw.write(3, 6)
          case -2 => bw.write(2, 6)
          case 3 => bw.write(3, 7)
          case _ => bw.write(2, 7)
        }
        a0 = a1
        black = !black
      } else { // horizontal: two runs from a0 (first-pixel a0f rule)
        val a0f = if (a0 < 0) 0 else a0
        val a2 = if (ci + 1 < curT.length && curT(ci + 1) < w &&
          a1 < w) curT(ci + 1) else w
        bw.write(1, 3) // 001
        mhWrite(bw, a1 - a0f, black)
        mhWrite(bw, a2 - a1, !black)
        a0 = a2
      }
    }
  }

  /** Encode one segment of samples (0 white, 1 black) as G4. */
  private[graft] def g4Encode(samples: Array[Byte], w: Int, rows: Int,
      eofb: Boolean = false): Array[Byte] = {
    require(samples.length == w * rows && w >= 1 && rows >= 1)
    val bw = new MsbBw
    var ref = Array.fill(4)(w)
    var y = 0
    while (y < rows) {
      val curT = transitionsOf(samples, w, y)
      encode2dRow(bw, ref, curT, w)
      ref = curT
      y += 1
    }
    if (eofb) bw.write((1 << 12) | 1, 24)
    bw.bytes
  }

  // ------------------------------------------------------------------
  // JPEG-in-TIFF (Compression 7, TIFF TechNote 2 "new-style" JPEG)

  /** ImageIO's stream factories default to DISK-backed caches — a
    * temp file per stream, a multi-ms tax per tiny segment at census
    * scale. Segments here are small in-memory byte arrays: cache in
    * memory, pinned once per JVM. */
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** One Compression-7 segment: a COMPLETE JFIF stream (abbreviated
    * streams via JPEGTables reject at the tag layer). Dims are probed
    * header-first and must equal the declared segment dims BEFORE the
    * pixel decode — a crafted stream declaring huge dims must not get
    * to allocate. The subset is grayscale: a 1-component stream's
    * raster samples pass through untouched (raster access, never
    * getRGB — that would route TYPE_BYTE_GRAY through the
    * linear-gray→sRGB color conversion and silently gamma-shift every
    * pixel); a 3-component stream must decode achromatic (equal
    * bands), else the payload contradicts the gray photometric.
    * A non-JPEG payload behind the tag rejects by format name. */
  private[graft] def jpegDecodeSeg(in: Array[Byte], sw: Int,
      sh: Int): Array[Byte] = {
    imageIoMemCache
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(in))
      catch { case scala.util.control.NonFatal(_) => throw Fail }
    if (iis == null) throw Fail // no SPI for the stream shape
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) throw Fail
      val r = readers.next()
      try {
        if (!r.getFormatName.equalsIgnoreCase("jpeg")) throw Fail
        r.setInput(iis)
        if (r.getWidth(0) != sw || r.getHeight(0) != sh) throw Fail
        val img = r.read(0)
        if (img == null) throw Fail
        val raster = img.getRaster
        val nb = raster.getNumBands
        if (nb != 1 && nb != 3) throw Fail
        val out = new Array[Byte](sw * sh)
        var y = 0
        while (y < sh) {
          var x = 0
          while (x < sw) {
            val s0 = raster.getSample(x, y, 0)
            // 12-bit JPEG samples would silently truncate in the
            // byte store — the subset is 8-bit, reject out-of-range
            if (s0 < 0 || s0 > 255) throw Fail
            if (nb == 3 && (raster.getSample(x, y, 1) != s0 ||
                raster.getSample(x, y, 2) != s0)) throw Fail
            out(y * sw + x) = s0.toByte
            x += 1
          }
          y += 1
        }
        out
      } catch {
        case Fail => throw Fail
        case scala.util.control.NonFatal(_) => throw Fail
      } finally r.dispose()
    } finally iis.close()
  }

  /** Solid-gray 1-component JFIF at EXPLICIT quality 1.0 — the
    * exact-round-trip operating point (the q147 closed-form-oracle
    * trick: scaled quant tables degenerate to all-ones and a constant
    * block is pure DC, so decode returns exactly the encoded gray).
    * Compression-7 fixtures therefore encode SOLID segments only. */
  private[graft] def jpegEncodeSeg(seg: Array[Byte], sw: Int,
      sh: Int): Array[Byte] = {
    require(seg.length == sw * sh && seg.forall(_ == seg(0)),
      "Compression-7 fixtures encode solid segments only")
    imageIoMemCache
    val img = new java.awt.image.BufferedImage(sw, sh,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, sw, sh, seg)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // decode

  /** Decode one baseline TIFF; None on any violation. */
  /** Single-image surface: exactly ONE page (the near-dup family's
    * fingerprint contract — picking a page of a multi-page file would
    * be a guess); multi-page documents go through [[parseTiffPages]]. */
  private[graft] def parseTiff(b: Array[Byte]): Option[TiffImage] =
    parseTiffPages(b).flatMap(ps =>
      if (ps.length == 1) Some(ps.head) else None)

  /** Bounded page-chain walk (scanned-document corpora are
    * predominantly multi-page): offsets must move STRICTLY forward —
    * the ascending law makes chain cycles structurally impossible —
    * and each page decodes under the existing per-IFD laws. The page
    * bound caps per-file ROW fanout (memory is bounded separately by
    * the whole-chain 2^24-sample pixel budget): 2048 covers scanned
    * books and long faxes, which the r17 cap of 32 strict-rejected
    * although every page was in-profile. */
  private[graft] val MaxPages = 2048

  private[graft] def parseTiffPages(b: Array[Byte]): Option[Seq[TiffImage]] = {
    if (b == null || b.length < 8) return None
    val be =
      if (b(0) == 'M' && b(1) == 'M') true
      else if (b(0) == 'I' && b(1) == 'I') false
      else return None
    try {
      val rd = new Rd(b, be)
      if (rd.u16(2) != 42) throw Fail
      var off = rd.u32(4)
      val pages = scala.collection.mutable.ArrayBuffer.empty[TiffImage]
      var prev = 0L
      var pxTotal = 0L
      while (off != 0) {
        if (pages.length >= MaxPages) throw Fail
        // word-aligned and strictly past the previous IFD (cycles and
        // backward links reject; off >= 8 follows from prev >= 0)
        if (off <= math.max(prev, 7L) || (off & 1) != 0) throw Fail
        prev = off
        val (img, next) = parseIfd(rd, be, off)
        // a WHOLE-CHAIN pixel budget: the per-page 2^22 bound alone
        // would let 32 crafted max-dim pages demand ~512 MB of argb
        // in one task — the chain is capped at 2^24 samples total
        pxTotal += img.width.toLong * img.height
        if (pxTotal > (1L << 24)) throw Fail
        pages += img
        off = next
      }
      Some(pages.toSeq)
    } catch { case Fail => None }
  }

  /** Decode the ONE IFD at `ifdOff`; returns the page image and the
    * raw next-IFD offset (0 = end of chain). */
  private def parseIfd(rd: Rd, be: Boolean,
      ifdOff: Long): (TiffImage, Long) = {
      val n = rd.u16(ifdOff)
      if (n < 1) throw Fail
      val nextIfd = rd.u32(ifdOff + 2 + 12L * n)
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
      if (ents.containsKey(338)) throw Fail // ExtraSamples
      // JPEGTables (347): abbreviated streams factor the DQT/DHT out
      // of the segments — every segment in THIS subset must be a
      // COMPLETE JFIF stream, so the tag's presence rejects rather
      // than silently decoding table-less segments with ImageIO
      if (ents.containsKey(347)) throw Fail
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
      // BitsPerSample: all 8, or all 1 (bilevel). The tag's TIFF
      // default IS 1 bit, so absence resolves per the spec, not a
      // guess; anything else (4/16-bit, mixed depths) rejects.
      val bps = ent(258) match {
        case Some(e) =>
          if (e.count != spp) throw Fail
          val vs = shorts(rd, e)
          if (vs.exists(_ != vs(0)) || (vs(0) != 8 && vs(0) != 1))
            throw Fail
          vs(0)
        case None => 1
      }
      if (bps == 1 && pm >= 2) throw Fail // bilevel is grayscale
      val comp = ent(259).map(scalar(rd, _)).getOrElse(1L).toInt
      if (bps == 8) {
        if (comp != 1 && comp != 5 && comp != 32773 && comp != 7)
          throw Fail
        // JPEG-in-TIFF (Compression 7, TIFF TechNote 2 "new-style"):
        // grayscale pages only — scanned corpora mix G4 bilevel with
        // JFIF gray pages in one chain; a color JPEG behind RGB tags
        // would need subsampling/positioning tags this subset rejects
        if (comp == 7 && pm != 1) throw Fail
      } else {
        // bilevel subset: raw packed rows, CCITT G4, CCITT MH 1D
        // (Compression 2, "CCITT RLE") or CCITT G3 1D (Compression 3,
        // T.4 EOL-framed) — the fax coders' white/black runs are the
        // photometric-0 sense (min-is-white, the one scanners
        // write); any fax coder under pm 1 would silently invert
        // every document, so they reject
        if (comp != 1 && comp != 2 && comp != 3 && comp != 4) throw Fail
        if (comp != 1 && pm != 0) throw Fail
      }
      // T4Options (292) only rides Compression 3; the closed subset
      // is 0 (plain 1D), 4 (1D with byte-aligned EOLs) and 1 (2D
      // coding, unaligned) — uncompressed mode (bit 1) and the
      // aligned-2D combination (whose fill placement relative to the
      // tag bit is writer-divergent) reject
      val t4opts = ent(292) match {
        case Some(e) =>
          if (comp != 3) throw Fail
          val v = scalar(rd, e)
          if (v != 0L && v != 1L && v != 4L) throw Fail
          v.toInt
        case None => 0
      }
      val pred = ent(317).map(scalar(rd, _)).getOrElse(1L).toInt
      if (pred != 1 && (pred != 2 || comp != 5)) throw Fail
      val cmap: Array[Int] =
        if (pm == 3) {
          val e = req(320)
          if (e.count != 3L * 256) throw Fail
          shorts(rd, e)
        } else {
          if (ents.containsKey(320)) throw Fail
          null
        }
      // organization: strips XOR tiles (mixed tag families reject)
      val tiled = Seq(322, 323, 324, 325).exists(ents.containsKey(_))
      if (tiled && Seq(273, 278, 279).exists(ents.containsKey(_)))
        throw Fail
      // decode ONE segment of sw×sh to one byte per sample: bps 8
      // passes bytes through (predictor undone per segment row — for
      // tiles the differencing scope is the tile, not the image row);
      // bps 1 unpacks byte-aligned rows or runs the G4 coder
      def decodeSeg(in: Array[Byte], sw: Int, sh: Int): Array[Byte] =
        if (bps == 8) {
          val expected = sw * sh * spp
          val dec = comp match {
            case 1 =>
              if (in.length != expected) throw Fail
              in
            case 32773 => unpackBits(in, expected)
            case 5 => lzwDecode(in, expected)
            case 7 => jpegDecodeSeg(in, sw, sh) // pm 1 ⇒ spp 1
          }
          if (pred == 2) { // horizontal differencing, per segment row
            var yy = 0
            while (yy < sh) {
              val base = yy * sw * spp
              var x = spp
              while (x < sw * spp) {
                dec(base + x) = (dec(base + x) + dec(base + x - spp))
                  .toByte
                x += 1
              }
              yy += 1
            }
          }
          dec
        } else comp match {
          case 4 => g4Decode(in, sw, sh)
          case 3 => t4opts match {
            case 1 => g32dDecode(in, sw, sh)
            case a => g31dDecode(in, sw, sh, a == 4)
          }
          case 2 => mh1dDecode(in, sw, sh)
          case _ => // raw packed bits, each row byte-aligned
            val rowBytes = (sw + 7) / 8
            if (in.length != rowBytes * sh) throw Fail
            val out = new Array[Byte](sw * sh)
            var yy = 0
            while (yy < sh) {
              var x = 0
              while (x < sw) {
                out(yy * sw + x) =
                  ((in(yy * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1)
                    .toByte
                x += 1
              }
              yy += 1
            }
            out
        }
      val raster = new Array[Byte](width * height * spp)
      val nSegs =
        if (tiled) {
          val tw = scalar(rd, req(322))
          val tl = scalar(rd, req(323))
          // TIFF 6.0: tile dimensions are multiples of 16; edge tiles
          // pad to the full tile grid and the padding is discarded
          // bound each factor before the product: two ~3e9 u32 dims
          // wrap tw*tl negative and would pass a product-only check
          if (tw < 16 || tl < 16 || tw > (1L << 22) || tl > (1L << 22) ||
              tw % 16 != 0 || tl % 16 != 0 ||
              tw * tl > (1L << 22)) throw Fail
          val across = ((w + tw - 1) / tw).toInt
          val down = ((h + tl - 1) / tl).toInt
          val offs = longs(rd, req(324))
          val cnts = longs(rd, req(325))
          if (offs.length.toLong != across.toLong * down ||
              cnts.length != offs.length) throw Fail
          val (sw, sh) = (tw.toInt, tl.toInt)
          var t = 0
          while (t < offs.length) {
            val tx = t % across
            val ty = t / across
            val dec = decodeSeg(rd.slice(offs(t), cnts(t)), sw, sh)
            val copyW = math.min(sw, width - tx * sw)
            val copyH = math.min(sh, height - ty * sh)
            var yy = 0
            while (yy < copyH) {
              System.arraycopy(dec, yy * sw * spp,
                raster, ((ty * sh + yy) * width + tx * sw) * spp,
                copyW * spp)
              yy += 1
            }
            t += 1
          }
          offs.length
        } else {
          val rps = math.min(ent(278).map(scalar(rd, _)).getOrElse(h), h)
          if (rps < 1) throw Fail
          val nStrips = ((h + rps - 1) / rps).toInt
          val offs = longs(rd, req(273))
          val cnts = longs(rd, req(279))
          if (offs.length != nStrips || cnts.length != nStrips) throw Fail
          var strip = 0
          var row = 0
          while (strip < nStrips) {
            val rows = math.min(rps, h - row).toInt
            val dec = decodeSeg(rd.slice(offs(strip), cnts(strip)),
              width, rows)
            System.arraycopy(dec, 0, raster, row * width * spp,
              rows * width * spp)
            strip += 1
            row += rows
          }
          nStrips
        }
      val argb = new Array[Int](width * height)
      var p = 0
      while (p < argb.length) {
        argb(p) =
          if (bps == 1) {
            // pm 0: sample 1 = black; pm 1: sample 1 = white
            val v = if ((raster(p) != 0) ^ (pm == 1)) 0 else 255
            0xff000000 | (v << 16) | (v << 8) | v
          } else pm match {
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
      (TiffImage(width, height, argb, pm, comp, nSegs, be), nextIfd)
  }

  // ==================================================================
  // encoder (fixture/test side)

  private[graft] final case class TiffOpts(
      bigEndian: Boolean = false,
      photometric: Int = 1, // 0 gray-inverted, 1 gray, 2 RGB, 3 palette
      compression: Int = 1, // 1, 5 (LZW), 32773 (PackBits), 4 (G4),
      // 2 (MH 1D), 3 (G3 1D), 7 (JPEG — solid-gray segments only)
      rowsPerStrip: Int = 0, // 0 = all rows in one strip
      predictor: Int = 1,
      bitsPerSample: Int = 8, // 8, or 1 (bilevel; photometric 0/1)
      tileWidth: Int = 0, // 0 = strips; else multiples of 16
      tileLength: Int = 0,
      eofb: Boolean = false, // close each G4 segment with EOFB
      t4Aligned: Boolean = false, // G3: byte-aligned EOLs (T4Options 4)
      t42d: Boolean = false) // G3: 2D coding (T4Options 1), K = 4

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
    * colors; ColorMap entries are v·257 so decode recovers v exactly;
    * bilevel requires every pixel pure black or white). */
  private[graft] def encodeTiff(argb: Array[Int], w: Int, h: Int,
      opts: TiffOpts = TiffOpts()): Array[Byte] =
    encodeTiffMulti(Seq((argb, w, h, opts)))

  /** Multi-page file: one byte order, pages appended in order, each
    * next-IFD pointer chained strictly forward (the shape
    * [[parseTiffPages]] requires). */
  private[graft] def encodeTiffMulti(
      pages: Seq[(Array[Int], Int, Int, TiffOpts)]): Array[Byte] = {
    require(pages.nonEmpty)
    val be = pages.head._4.bigEndian
    require(pages.forall(_._4.bigEndian == be), "one byte order per file")
    val wr = new Wr(be)
    wr.raw(if (be) Array[Byte]('M', 'M', 0, 42)
      else Array[Byte]('I', 'I', 42, 0))
    var fixupAt = wr.size // the header's first-IFD pointer
    wr.u32(0)
    val patches = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    pages.foreach { case (argb, w, h, opts) =>
      val (ifdOff, nextFixup) = writePage(wr, argb, w, h, opts)
      patches += ((fixupAt, ifdOff))
      fixupAt = nextFixup
    }
    val out = wr.buf.toByteArray
    patches.foreach { case (at, ifdOff) =>
      var k = 0
      while (k < 4) {
        val shift = if (be) 8 * (3 - k) else 8 * k
        out(at + k) = ((ifdOff >> shift) & 0xff).toByte
        k += 1
      }
    }
    out
  }

  /** One page's segment data + out-of-line values + IFD into `wr`;
    * returns (the page's IFD offset, the position of its next-IFD
    * pointer — written 0, chained by the caller). */
  private def writePage(wr: Wr, argb: Array[Int], w: Int, h: Int,
      opts: TiffOpts): (Int, Int) = {
    require(argb.length == w * h && w >= 1 && h >= 1)
    val spp = if (opts.photometric == 2) 3 else 1
    require(opts.predictor == 1 ||
      (opts.predictor == 2 && opts.compression == 5))
    require(opts.bitsPerSample == 8 ||
      (opts.bitsPerSample == 1 && opts.photometric <= 1 &&
        Set(1, 2, 3, 4)(opts.compression)))
    require(opts.compression != 7 ||
      (opts.bitsPerSample == 8 && opts.photometric == 1),
      "JPEG-in-TIFF is the grayscale subset")
    require(!Set(2, 3, 4)(opts.compression) ||
      (opts.bitsPerSample == 1 && opts.photometric == 0))
    require(!(opts.t42d && opts.t4Aligned), "aligned-2D is out of subset")
    require((opts.tileWidth == 0) == (opts.tileLength == 0))
    require(opts.tileWidth % 16 == 0 && opts.tileLength % 16 == 0)
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
    // sample raster: bps 8 = one byte per sample; bps 1 = one byte
    // per PIXEL holding 0 (white) or 1 (black) in the photometric's
    // own sense, packed/coded at the segment layer
    val bilevel = opts.bitsPerSample == 1
    val raster = new Array[Byte](w * h * spp)
    var p = 0
    while (p < argb.length) {
      val px = argb(p)
      if (bilevel) {
        val g = (px >> 8) & 0xff
        require(g == 0 || g == 255, "bilevel needs pure black/white")
        val black = g == 0
        raster(p) = (if (black ^ (opts.photometric == 1)) 1 else 0).toByte
      } else opts.photometric match {
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
    // one segment (strip or tile) of sw×sh samples → wire bytes
    def encodeSeg(seg: Array[Byte], sw: Int, sh: Int): Array[Byte] =
      if (bilevel) opts.compression match {
        case 4 => g4Encode(seg, sw, sh, opts.eofb)
        case 3 =>
          if (opts.t42d) g32dEncode(seg, sw, sh, k = 4)
          else g31dEncode(seg, sw, sh, opts.t4Aligned)
        case 2 => mh1dEncode(seg, sw, sh)
        case _ => // raw packed bits, each row byte-aligned
          val rowBytes = (sw + 7) / 8
          val out = new Array[Byte](rowBytes * sh)
          var y = 0
          while (y < sh) {
            var x = 0
            while (x < sw) {
              if (seg(y * sw + x) != 0)
                out(y * rowBytes + (x >> 3)) =
                  (out(y * rowBytes + (x >> 3)) | (1 << (7 - (x & 7))))
                    .toByte
              x += 1
            }
            y += 1
          }
          out
      } else {
        if (opts.predictor == 2) { // forward horizontal differencing
          var y = sh - 1
          while (y >= 0) {
            val base = y * sw * spp
            var x = sw * spp - 1
            while (x >= spp) {
              seg(base + x) = (seg(base + x) - seg(base + x - spp)).toByte
              x -= 1
            }
            y -= 1
          }
        }
        opts.compression match {
          case 1 => seg
          case 5 => lzwEncode(seg)
          case 32773 => packBits(seg)
          case 7 => jpegEncodeSeg(seg, sw, sh)
        }
      }
    val tiled = opts.tileWidth > 0
    val rps = if (opts.rowsPerStrip <= 0) h else opts.rowsPerStrip
    val segs: IndexedSeq[Array[Byte]] =
      if (tiled) {
        val (tw, tl) = (opts.tileWidth, opts.tileLength)
        val across = (w + tw - 1) / tw
        val down = (h + tl - 1) / tl
        (0 until across * down).map { t =>
          val tx = t % across
          val ty = t / across
          // edge tiles pad to the tile grid with zero samples
          val seg = new Array[Byte](tw * tl * spp)
          val copyW = math.min(tw, w - tx * tw)
          val copyH = math.min(tl, h - ty * tl)
          var y = 0
          while (y < copyH) {
            System.arraycopy(raster, ((ty * tl + y) * w + tx * tw) * spp,
              seg, y * tw * spp, copyW * spp)
            y += 1
          }
          encodeSeg(seg, tw, tl)
        }
      } else (0 until (h + rps - 1) / rps).map { s =>
        val rows = math.min(rps, h - s * rps)
        encodeSeg(java.util.Arrays.copyOfRange(
          raster, s * rps * w * spp, (s * rps + rows) * w * spp), w, rows)
      }
    // layout within the caller's stream: segment data (word-aligned)
    // | out-of-line tag values | IFD
    val segOffs = segs.map { s =>
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
      values = Array.fill(spp)(opts.bitsPerSample.toLong))
    tags += Tag(259, 3, 1, Some(opts.compression.toLong))
    tags += Tag(262, 3, 1, Some(opts.photometric.toLong))
    if (!tiled) {
      tags += Tag(273, 4, segs.length.toLong,
        values = segOffs.map(_.toLong).toArray)
      tags += Tag(278, 3, 1, Some(rps.toLong))
      tags += Tag(279, 4, segs.length.toLong,
        values = segs.map(_.length.toLong).toArray)
    }
    tags += Tag(277, 3, 1, Some(spp.toLong))
    if (opts.compression == 3)
      tags += Tag(292, 4, 1, Some(
        if (opts.t42d) 1L else if (opts.t4Aligned) 4L else 0L))
    if (opts.predictor == 2) tags += Tag(317, 3, 1, Some(2L))
    if (tiled) {
      tags += Tag(322, 3, 1, Some(opts.tileWidth.toLong))
      tags += Tag(323, 3, 1, Some(opts.tileLength.toLong))
      tags += Tag(324, 4, segs.length.toLong,
        values = segOffs.map(_.toLong).toArray)
      tags += Tag(325, 4, segs.length.toLong,
        values = segs.map(_.length.toLong).toArray)
    }
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
    val nextFixup = wr.size
    wr.u32(0) // next IFD: 0 here, chained by encodeTiffMulti
    (ifdOff, nextFixup)
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

  /** Page-grain extraction over [[parseTiffPages]] — one row per
    * page of the IFD chain (the scanned-document shape); any chain
    * or per-page violation flags the whole file invalid. */
  def extractTiffPages(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("page", IntegerType, false),
      StructField("n_pages", IntegerType, true),
      StructField("width", IntegerType, true),
      StructField("height", IntegerType, true),
      StructField("n_strips", IntegerType, true),
      StructField("compression", IntegerType, true),
      StructField("gray_sum", LongType, true),
      StructField("n_colors", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseTiffPages(media)).toOption.flatten match {
          case Some(pages) =>
            pages.zipWithIndex.map { case (img, p) =>
              var gsum = 0L
              val distinct = scala.collection.mutable.HashSet.empty[Int]
              img.argb.foreach { px =>
                gsum += (px >> 8) & 0xff
                distinct += px
              }
              Row(r.getLong(0), p, pages.length, img.width, img.height,
                img.nStrips, img.compression, gsum, distinct.size, true)
            }
          case None =>
            Seq(Row(r.getLong(0), 0, null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Page-content signatures over [[parseTiffPages]] — one row per
    * page carrying the EXACT 24-bit RGB raster as a comma-joined
    * decimal string (pages are small scans; the FULL pixel value is
    * the collision-free join key page-level exact dedup groups on —
    * a gray projection would collide RGB/palette pages differing
    * only in red/blue, and a perceptual hash could alias content the
    * oracle cannot replay). Invalid files contribute no rows (dedup
    * input grain). */
  def extractTiffPageSigs(df: org.apache.spark.sql.DataFrame,
      idCol: String, binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("page", IntegerType, false),
      StructField("width", IntegerType, false),
      StructField("height", IntegerType, false),
      StructField("sig", StringType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseTiffPages(media)).toOption.flatten
          .toSeq.flatMap(_.zipWithIndex.map { case (img, p) =>
            val sb = new java.lang.StringBuilder(img.argb.length * 4)
            var k = 0
            while (k < img.argb.length) {
              if (k > 0) sb.append(',')
              sb.append(img.argb(k) & 0xffffff)
              k += 1
            }
            Row(r.getLong(0), p, img.width, img.height, sb.toString)
          })
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Multi-page fixture law (q239, replayed closed-form by the
    * oracle): doc i has 1 + i%4 pages — 40 pages when i%20 == 9, the
    * scanned-book shape past the old 32-page cap — chained in one
    * file (big-endian on odd i); page p is w×h gray with
    * w = 5+(i+p)%4, h = 4+(i+p)%3, compression cycling (i+p)%5 →
    * none / LZW / PackBits / CCITT G4 (the G4 page bilevel,
    * photometric 0) / JPEG (Compression 7), one strip on even i+p
    * and RowsPerStrip 2 otherwise. Pixels: 8-bit ramp pages are
    * photometric-1 gray v(k) = (i·7 + p·11 + 3k) % 256 in row-major
    * k (all w·h values distinct since 3(wh−1) < 256); G4 pages are
    * black iff (i·3 + p·5 + k) % 3 == 0; JPEG pages are SOLID gray
    * (i·7 + p·11) % 256 — the exact-round-trip operating point. */
  def tiffMultiFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map(i => Row(i.toLong, multiPageDoc(i)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  private[graft] def multiPageDoc(i: Int): Array[Byte] = {
    val np = if (i % 20 == 9) 40 else 1 + i % 4
    val pages = (0 until np).map { p =>
      val w = 5 + (i + p) % 4
      val h = 4 + (i + p) % 3
      val cm = (i + p) % 5
      val rps = if ((i + p) % 2 == 0) 0 else 2
      val argb = new Array[Int](w * h)
      var k = 0
      while (k < argb.length) {
        val v = cm match {
          case 3 => if ((i * 3 + p * 5 + k) % 3 == 0) 0 else 255
          case 4 => (i * 7 + p * 11) % 256 // solid: JPEG-exact
          case _ => (i * 7 + p * 11 + 3 * k) % 256
        }
        argb(k) = 0xff000000 | (v << 16) | (v << 8) | v
        k += 1
      }
      val opts = cm match {
        case 0 => TiffOpts(bigEndian = i % 2 == 1, rowsPerStrip = rps)
        case 1 => TiffOpts(bigEndian = i % 2 == 1, compression = 5,
          rowsPerStrip = rps)
        case 2 => TiffOpts(bigEndian = i % 2 == 1, compression = 32773,
          rowsPerStrip = rps)
        case 3 => TiffOpts(bigEndian = i % 2 == 1, photometric = 0,
          bitsPerSample = 1, compression = 4, rowsPerStrip = rps)
        case _ => TiffOpts(bigEndian = i % 2 == 1, compression = 7,
          rowsPerStrip = rps)
      }
      (argb, w, h, opts)
    }
    encodeTiffMulti(pages)
  }

  /** Fixture: the q190 law image per id (scale 1 + id%3) behind
    * SIXTEEN wire variants routed by id % 16 — both endians, all
    * four photometrics, compressions none/LZW/PackBits/G4/MH-1D/
    * G3-1D/G3-2D, single- and multi-strip AND tiled layouts, both
    * predictors, 8-bit and bilevel depths. Variants 0-7 carry the
    * grayscale ramp law; variants 8/9/11-15 are BILEVEL renderings
    * of the same dHash bit law (cell (x,y) black iff bit(x,y)) —
    * raw packed rows, G4 strips, G4 tiles, MH-1D strips, G3-1D
    * strips in both EOL modes (13 unaligned, 14 with byte-aligned
    * EOL fill, big-endian) and G3-2D single strips (15, K = 4) —
    * and variant 10 is the ramp law in LZW tiles; so the pixel
    * columns stay wire-blind within each depth class and the wire
    * columns (n_strips, compression) are closed-form in id. */
  private[graft] def tiffOptsFor(i: Int): TiffOpts = (i % 16) match {
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
    case 7 => TiffOpts(photometric = 2, compression = 32773)
    case 8 => TiffOpts(photometric = 0, bitsPerSample = 1,
      rowsPerStrip = 3)
    case 9 => TiffOpts(bigEndian = true, photometric = 0,
      bitsPerSample = 1, compression = 4)
    case 10 => TiffOpts(compression = 5, tileWidth = 16, tileLength = 16)
    case 11 => TiffOpts(bigEndian = true, photometric = 0,
      bitsPerSample = 1, compression = 4, tileWidth = 16,
      tileLength = 16, eofb = true)
    case 12 => TiffOpts(photometric = 0, bitsPerSample = 1,
      compression = 2, rowsPerStrip = 4)
    case 13 => TiffOpts(photometric = 0, bitsPerSample = 1,
      compression = 3, rowsPerStrip = 2)
    case 14 => TiffOpts(bigEndian = true, photometric = 0,
      bitsPerSample = 1, compression = 3, rowsPerStrip = 5,
      t4Aligned = true)
    case _ => TiffOpts(photometric = 0, bitsPerSample = 1,
      compression = 3, t42d = true)
  }

  /** The dHash bit law rendered bilevel: cell (x,y) of the 9×8 grid
    * (each s×s pixels) is black iff bit(x,y). */
  private[graft] def bilevelLawPixels(bit: (Int, Int) => Boolean,
      s: Int): Array[Int] = {
    val w = 9 * s
    Array.tabulate(w * 8 * s) { p =>
      val x = (p % w) / s
      val y = (p / w) / s
      if (bit(x, y)) 0xff000000 else 0xffffffff
    }
  }

  def tiffFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val s = 1 + i % 3
      val v = i % 16
      val bilevel = v == 8 || v == 9 || v >= 11
      val px =
        if (bilevel) bilevelLawPixels(Multimodal.dhashBit(i), s)
        else Multimodal.dhashLawPixels(Multimodal.dhashBit(i), s)
      Row(i.toLong, encodeTiff(px, 9 * s, 8 * s, tiffOptsFor(i)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
