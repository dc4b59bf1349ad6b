package graft.operators

/** Parquet FOOTER census — byte-level corpus forensics over the
  * format this engine is built around. A 100 TB lake inventory needs
  * per-file, per-row-group, per-column-chunk facts (physical type,
  * codec, value counts, compressed/uncompressed sizes, dictionary
  * presence, writer identity) WITHOUT decoding a single data page —
  * exactly what the footer carries. The walk is a spec-written
  * Thrift Compact Protocol reader over the public `parquet.thrift`
  * schema (parquet-format), not a call into a parquet library, so it
  * runs on raw blobs from any source and censuses even files the
  * table reader would refuse to load:
  *
  *  - framing: `PAR1` magic at BOTH ends, a little-endian u32 footer
  *    length that must fit between them, and the FileMetaData struct
  *    must consume the footer region EXACTLY;
  *  - Thrift compact: short-form field headers (delta 1-15 in the
  *    high nibble, type in the low), long-form zigzag field ids,
  *    zigzag varints (bounded at 10 bytes), bools carried in the
  *    type nibble for fields but as one byte inside lists, list
  *    headers with the size-15 escape, maps, nested structs with a
  *    per-struct last-field-id;
  *  - FORWARD COMPATIBILITY, the protocol's point: unknown field ids
  *    and unknown struct members are SKIPPED by wire type (bounded
  *    depth + size caps) — real writers add fields constantly
  *    (column orders, logical types, statistics, bloom offsets,
  *    page-index offsets), and a reader that rejected them would
  *    reject every modern file;
  *  - extraction: FileMetaData version / created_by / num_rows /
  *    schema / row_groups; the SchemaElement list is validated as a
  *    complete tree (num_children slots consumed exactly, leaves
  *    must carry a physical type); per RowGroup num_rows +
  *    total_byte_size + columns; per ColumnChunk the ColumnMetaData
  *    type / codec / num_values / sizes / page offsets /
  *    path_in_schema (strict UTF-8);
  *  - cross-field laws a lying footer trips: Σ row-group rows ==
  *    file num_rows, columns per row group == schema leaf count,
  *    chunk page bytes (dictionary-or-data offset + compressed
  *    size) inside the data region, dictionary page strictly before
  *    the first data page, enum ranges (type 0-7, codec 0-7).
  *
  * Conformance is gated two ways: a fixture written by an
  * independent in-repo compact-protocol writer (laws closed-form for
  * the DuckDB oracle), and REAL third-party files — the spec parses
  * the parquet-cpp-arrow-written test tables and cross-checks
  * row/column/codec facts against known values.
  *
  * At 100 TB the fetch layer hands this walk only a file TAIL (the
  * footer is self-delimiting from the last 8 bytes); the blob-in
  * signature here matches the lake-family contract, and the walk
  * touches only the tail region plus O(1) header bytes.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object ParquetLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class PqCol(
      path: String, ptype: Int, codec: Int, nValues: Long,
      totalCompressed: Long, totalUncompressed: Long, hasDict: Boolean,
      encodings: Int = 0, // bitmask over the Encoding enum (0..9)
      pagesV1: Int = -1, pagesV2: Int = -1, dictPages: Int = -1,
      nPages: Int = -1, // from the OffsetIndex; -1 = no page index
      hasColIndex: Boolean = false,
      bloomBytes: Long = -1L) // SBBF bitset size; -1 = no bloom filter

  private[graft] final case class PqRowGroup(
      nRows: Long, totalByteSize: Long, cols: Array[PqCol])

  private[graft] final case class PqMeta(
      version: Int, createdBy: Option[String], nSchema: Int,
      nLeaves: Int, numRows: Long, rowGroups: Array[PqRowGroup])

  // ------------------------------------------------------------------
  // thrift compact protocol reader (bounded, strict framing)

  private final class Tc(b: Array[Byte], start: Int, val end: Int) {
    var pos: Int = start
    def u8(): Int = {
      if (pos >= end) throw Fail
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    def raw(n: Int): Array[Byte] = {
      if (n < 0 || n > end - pos) throw Fail
      val a = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      a
    }
    def skipRaw(n: Long): Unit = {
      if (n < 0 || n > end - pos) throw Fail
      pos += n.toInt
    }
    def varint(): Long = {
      var v = 0L
      var sh = 0
      var i = 0
      while (i < 10) {
        val x = u8()
        v |= (x & 0x7fL) << sh
        if ((x & 0x80) == 0) return v
        sh += 7
        i += 1
      }
      throw Fail
    }
    def zig(): Long = {
      val v = varint()
      (v >>> 1) ^ -(v & 1)
    }
  }

  private def strictUtf8(b: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
  }

  /** (elemType, size) of a compact list/set header. */
  private def listHeader(tc: Tc): (Int, Long) = {
    val head = tc.u8()
    val et = head & 0x0f
    val szn = (head >>> 4) & 0x0f
    val sz = if (szn == 15) tc.varint() else szn.toLong
    if (sz < 0 || sz > 65536) throw Fail
    (et, sz)
  }

  /** Skip one value of compact type `typ` (list-element context for
    * bools: one byte each, unlike field context where the value rides
    * in the type nibble). */
  private def skipVal(tc: Tc, typ: Int, depth: Int): Unit = {
    if (depth > 32) throw Fail
    typ match {
      case 3 => tc.u8() // i8: one raw byte
      case 4 | 5 | 6 => tc.varint()
      case 7 => tc.skipRaw(8) // double
      case 8 =>
        val n = tc.varint()
        if (n > (1 << 24)) throw Fail
        tc.skipRaw(n)
      case 9 | 10 =>
        val (et, sz) = listHeader(tc)
        if (et == 1 || et == 2) tc.skipRaw(sz) // bool elements: 1 byte
        else {
          var i = 0L
          while (i < sz) { skipVal(tc, et, depth + 1); i += 1 }
        }
      case 11 =>
        val sz = tc.varint()
        if (sz < 0 || sz > 65536) throw Fail
        if (sz > 0) {
          val kv = tc.u8()
          val kt = (kv >>> 4) & 0x0f
          val vt = kv & 0x0f
          var i = 0L
          while (i < sz) {
            skipVal(tc, kt, depth + 1)
            skipVal(tc, vt, depth + 1)
            i += 1
          }
        }
      case 12 => readStruct(tc, depth + 1)((_, _) => false)
      case _ => throw Fail // 1/2 never reach here in field context
    }
  }

  /** Walk one struct's fields; `handle(id, typ)` returns true if it
    * consumed the value, false to skip it generically (the forward-
    * compatibility path). Bool field values ride in `typ` (1/2). */
  private def readStruct(tc: Tc, depth: Int)(
      handle: (Int, Int) => Boolean): Unit = {
    if (depth > 32) throw Fail
    var lastId = 0
    var n = 0
    var cont = true
    while (cont) {
      val head = tc.u8()
      if (head == 0) cont = false
      else {
        val typ = head & 0x0f
        val delta = (head >>> 4) & 0x0f
        val id =
          if (delta != 0) lastId + delta
          else {
            val z = tc.zig()
            if (z < 1 || z > Short.MaxValue) throw Fail
            z.toInt
          }
        lastId = id
        n += 1
        if (n > 4096) throw Fail
        if (!handle(id, typ)) {
          if (typ == 1 || typ == 2) () // bool value is the type nibble
          else skipVal(tc, typ, depth)
        }
      }
    }
  }

  private def readI32(tc: Tc, typ: Int): Int = {
    if (typ != 5) throw Fail
    val v = tc.zig()
    if (v < Int.MinValue || v > Int.MaxValue) throw Fail
    v.toInt
  }

  private def readI64(tc: Tc, typ: Int): Long = {
    if (typ != 6) throw Fail
    tc.zig()
  }

  private def readBinary(tc: Tc, typ: Int): Array[Byte] = {
    if (typ != 8) throw Fail
    val n = tc.varint()
    if (n > (1 << 20)) throw Fail
    tc.raw(n.toInt)
  }

  // ------------------------------------------------------------------
  // parquet.thrift struct walks

  private final case class SchemaEl(name: String, ptype: Int,
      numChildren: Int) // ptype -1 = absent; numChildren 0 = leaf

  private def readSchemaElement(tc: Tc, depth: Int): SchemaEl = {
    var name: String = null
    var ptype = -1
    var numChildren = 0
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 1 => ptype = readI32(tc, typ); true
        case 4 => name = strictUtf8(readBinary(tc, typ)); true
        case 5 => numChildren = readI32(tc, typ); true
        case _ => false
      }
    }
    if (name == null || numChildren < 0) throw Fail
    SchemaEl(name, ptype, numChildren)
  }

  private def readColumnMeta(tc: Tc, depth: Int,
      dataEnd: Long): (PqCol, Long, Int) = {
    var ptype = -1
    var codec = -1
    var nValues = -1L
    var tcSize = -1L
    var tuSize = -1L
    var dataOff = -1L
    var dictOff = -1L
    var path: String = null
    var encodings = 0
    var pagesV1 = -1
    var pagesV2 = -1
    var dictPages = -1
    var bloomOff = -1L
    var bloomLen = -1
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 1 => ptype = readI32(tc, typ); true
        case 2 => // encodings: list<Encoding> — the O11 surface
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 5 || sz < 1 || sz > 16) throw Fail
          var i = 0
          while (i < sz) {
            val e = tc.zig()
            if (e < 0 || e > 9) throw Fail
            encodings |= 1 << e.toInt
            i += 1
          }
          true
        case 3 => // path_in_schema: list<string>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 8 || sz < 1 || sz > 64) throw Fail
          val parts = new Array[String](sz.toInt)
          var i = 0
          while (i < sz) {
            parts(i) = strictUtf8(readBinary(tc, 8))
            i += 1
          }
          path = parts.mkString(".")
          true
        case 4 => codec = readI32(tc, typ); true
        case 5 => nValues = readI64(tc, typ); true
        case 6 => tuSize = readI64(tc, typ); true
        case 7 => tcSize = readI64(tc, typ); true
        case 9 => dataOff = readI64(tc, typ); true
        case 11 => dictOff = readI64(tc, typ); true
        case 13 => // encoding_stats: list<PageEncodingStats>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 12 || sz < 1 || sz > 64) throw Fail
          pagesV1 = 0; pagesV2 = 0; dictPages = 0
          var i = 0
          while (i < sz) {
            var pt = -1
            var enc = -1
            var cnt = -1
            readStruct(tc, depth + 1) { (sid, styp) =>
              sid match {
                case 1 => pt = readI32(tc, styp); true
                case 2 => enc = readI32(tc, styp); true
                case 3 => cnt = readI32(tc, styp); true
                case _ => false
              }
            }
            // cnt is attacker-controlled i32: 64 entries of 2^30
            // would wrap the Int accumulators into a census that
            // LOOKS valid — bound each term before the sum (the
            // ExifLake/TiffLake wrap lesson, page-count form)
            if (pt < 0 || pt > 3 || enc < 0 || enc > 9 || cnt < 1 ||
                cnt > (1 << 24)) throw Fail
            pt match {
              case 0 => pagesV1 += cnt
              case 2 => dictPages += cnt
              case 3 => pagesV2 += cnt
              case _ => // INDEX_PAGE: counted nowhere
            }
            i += 1
          }
          true
        case 14 => bloomOff = readI64(tc, typ); true
        case 15 => bloomLen = readI32(tc, typ); true
        case _ => false
      }
    }
    if (ptype < 0 || ptype > 7) throw Fail
    if (codec < 0 || codec > 7) throw Fail
    if (nValues < 0 || tcSize < 0 || tuSize < 0 || path == null) throw Fail
    if (dataOff < 4) throw Fail
    val hasDict = dictOff >= 0
    // dictionary page strictly precedes the first data page; the
    // chunk's pages (dict-or-data start + compressed size) must fit
    // inside the data region, before the footer — with each term
    // bounded BEFORE the sum, so a crafted huge size cannot wrap the
    // Long and slip past the check
    if (hasDict && (dictOff < 4 || dictOff >= dataOff)) throw Fail
    val pageStart = if (hasDict) dictOff else dataOff
    if (pageStart > dataEnd || tcSize > dataEnd - pageStart) throw Fail
    // encoding_stats must agree with the dictionary-offset fact — a
    // footer that lists a dictionary page without declaring the
    // offset (or vice versa) lies about its own layout
    if (dictPages >= 0 && hasDict != (dictPages == 1)) throw Fail
    (PqCol(path, ptype, codec, nValues, tcSize, tuSize, hasDict,
      encodings, pagesV1, pagesV2, dictPages), bloomOff, bloomLen)
  }

  // ------------------------------------------------------------------
  // page-index structures (OffsetIndex / ColumnIndex) and the bloom
  // header — each a thrift-compact struct sitting OUTSIDE the footer,
  // located by the ColumnChunk/ColumnMetaData offset fields

  /** Parse one OffsetIndex; returns the page count. */
  private def readOffsetIndex(raw: Array[Byte], off: Long, len: Int,
      dataEnd: Long, chunkCompressed: Long, rgRows: Long): Int = {
    if (off < 4 || len < 1 || len > (1 << 20) || off > dataEnd - len)
      throw Fail
    val tc = new Tc(raw, off.toInt, off.toInt + len)
    var nPages = -1
    readStruct(tc, 0) { (id, typ) =>
      id match {
        case 1 => // page_locations: list<PageLocation>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 12 || sz < 1 || sz > 65536) throw Fail
          var prevOff = -1L
          var prevRow = -1L
          var sizeSum = 0L
          var i = 0
          while (i < sz) {
            var pOff = -1L
            var pSize = -1
            var pRow = -1L
            readStruct(tc, 1) { (sid, styp) =>
              sid match {
                case 1 => pOff = readI64(tc, styp); true
                case 2 => pSize = readI32(tc, styp); true
                case 3 => pRow = readI64(tc, styp); true
                case _ => false
              }
            }
            // pages tile forward: offsets and first-row indexes
            // strictly increase, the first page starts at row 0,
            // sizes are positive and sum within the chunk
            if (pOff <= prevOff || pSize < 1 || pRow <= prevRow)
              throw Fail
            if (i == 0 && pRow != 0) throw Fail
            if (pRow >= rgRows) throw Fail
            sizeSum += pSize
            if (sizeSum > chunkCompressed) throw Fail
            prevOff = pOff
            prevRow = pRow
            i += 1
          }
          nPages = sz.toInt
          true
        case _ => false
      }
    }
    if (tc.pos != tc.end || nPages < 1) throw Fail
    nPages
  }

  /** Parse one ColumnIndex; its page grain must match `nPages`. */
  private def readColumnIndex(raw: Array[Byte], off: Long, len: Int,
      dataEnd: Long, nPages: Int): Unit = {
    if (off < 4 || len < 1 || len > (1 << 20) || off > dataEnd - len)
      throw Fail
    val tc = new Tc(raw, off.toInt, off.toInt + len)
    var nNull = -1L
    var nMin = -1L
    var nMax = -1L
    var bound = -1
    readStruct(tc, 0) { (id, typ) =>
      id match {
        case 1 => // null_pages: list<bool>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if ((et != 1 && et != 2) || sz < 1 || sz > 65536) throw Fail
          var i = 0
          while (i < sz) {
            // compact-protocol list bools are the TYPE codes:
            // 1 = true, 2 = false (parquet-mr's all-false null_pages
            // is all 2s — 0/1 would reject every real file)
            val v = tc.u8()
            if (v != 1 && v != 2) throw Fail
            i += 1
          }
          nNull = sz
          true
        case 2 | 3 => // min_values / max_values: list<binary>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 8 || sz < 1 || sz > 65536) throw Fail
          var i = 0
          while (i < sz) {
            val bl = tc.varint()
            if (bl < 0 || bl > (1 << 16)) throw Fail
            tc.skipRaw(bl)
            i += 1
          }
          if (id == 2) nMin = sz else nMax = sz
          true
        case 4 => // boundary_order: enum 0..2
          bound = readI32(tc, typ)
          if (bound < 0 || bound > 2) throw Fail
          true
        case _ => false
      }
    }
    if (tc.pos != tc.end) throw Fail
    if (nNull < 1 || nMin != nNull || nMax != nNull || bound < 0)
      throw Fail
    if (nPages >= 0 && nNull != nPages) throw Fail
  }

  /** Parse one BloomFilterHeader (SBBF); returns the bitset size. */
  private def readBloomHeader(raw: Array[Byte], off: Long, len: Int,
      dataEnd: Long): Long = {
    if (off < 4 || off >= dataEnd) throw Fail
    val tc = new Tc(raw, off.toInt, dataEnd.toInt)
    var numBytes = -1
    var alg = false
    var hash = false
    var comp = false
    // a union is a struct carrying exactly one field; the subset is
    // BLOCK (split-block) / XXHASH / UNCOMPRESSED — each an empty
    // struct at field 1
    def union(): Boolean = {
      var seen = false
      readStruct(tc, 1) { (sid, styp) =>
        if (sid == 1 && styp == 12) {
          readStruct(tc, 2)((_, _) => false)
          seen = true
          true
        } else false
      }
      seen
    }
    readStruct(tc, 0) { (id, typ) =>
      id match {
        case 1 => numBytes = readI32(tc, typ); true
        case 2 => alg = union(); true
        case 3 => hash = union(); true
        case 4 => comp = union(); true
        case _ => false
      }
    }
    // SBBF: a power-of-two number of 32-byte blocks
    if (numBytes < 32 || (numBytes & (numBytes - 1)) != 0) throw Fail
    if (!alg || !hash || !comp) throw Fail
    val headerLen = tc.pos - off
    if (len >= 0 && headerLen + numBytes != len) throw Fail
    if (off + headerLen + numBytes > dataEnd) throw Fail
    numBytes.toLong
  }

  // page-index / bloom locations collected per chunk; parsed only
  // after the row group closes (its row count arrives after the
  // column list in field-id order)
  private final case class ChunkSide(
      offIdxOff: Long, offIdxLen: Int, colIdxOff: Long, colIdxLen: Int,
      bloomOff: Long, bloomLen: Int)

  private def readColumnChunk(tc: Tc, depth: Int,
      dataEnd: Long): (PqCol, ChunkSide) = {
    var col: PqCol = null
    var bloomOff = -1L
    var bloomLen = -1
    var oiOff = -1L
    var oiLen = -1
    var ciOff = -1L
    var ciLen = -1
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 3 =>
          if (typ != 12) throw Fail
          if (col != null) throw Fail
          val (c, bo, bl) = readColumnMeta(tc, depth + 1, dataEnd)
          col = c
          bloomOff = bo
          bloomLen = bl
          true
        case 4 => oiOff = readI64(tc, typ); true
        case 5 => oiLen = readI32(tc, typ); true
        case 6 => ciOff = readI64(tc, typ); true
        case 7 => ciLen = readI32(tc, typ); true
        case _ => false
      }
    }
    if (col == null) throw Fail // Spark/arrow always embed meta_data
    // offset/length fields must pair up
    if ((oiOff >= 0) != (oiLen >= 0) || (ciOff >= 0) != (ciLen >= 0))
      throw Fail
    (col, ChunkSide(oiOff, oiLen, ciOff, ciLen, bloomOff, bloomLen))
  }

  private def readRowGroup(raw: Array[Byte], tc: Tc, depth: Int,
      dataEnd: Long): PqRowGroup = {
    var cols: Array[PqCol] = null
    var sides: Array[ChunkSide] = null
    var totalBytes = -1L
    var nRows = -1L
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 1 =>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 12 || sz < 1 || sz > 4096) throw Fail
          val a = new Array[PqCol](sz.toInt)
          val s = new Array[ChunkSide](sz.toInt)
          var i = 0
          while (i < sz) {
            val (c, side) = readColumnChunk(tc, depth + 1, dataEnd)
            a(i) = c
            s(i) = side
            i += 1
          }
          cols = a
          sides = s
          true
        case 2 => totalBytes = readI64(tc, typ); true
        case 3 => nRows = readI64(tc, typ); true
        case _ => false
      }
    }
    if (cols == null || nRows < 0 || totalBytes < 0) throw Fail
    // now the row count is known: chase the side structures
    var i = 0
    while (i < cols.length) {
      val side = sides(i)
      var c = cols(i)
      if (side.offIdxOff >= 0) {
        val nPages = readOffsetIndex(raw, side.offIdxOff, side.offIdxLen,
          dataEnd, c.totalCompressed, nRows)
        c = c.copy(nPages = nPages)
      }
      if (side.colIdxOff >= 0) {
        readColumnIndex(raw, side.colIdxOff, side.colIdxLen, dataEnd,
          c.nPages)
        c = c.copy(hasColIndex = true)
      }
      if (side.bloomOff >= 0)
        c = c.copy(bloomBytes = readBloomHeader(raw, side.bloomOff,
          side.bloomLen, dataEnd))
      cols(i) = c
      i += 1
    }
    PqRowGroup(nRows, totalBytes, cols)
  }

  /** Validate the flattened schema list as one complete tree and
    * return (total elements, leaf count). */
  private def validateSchema(els: Array[SchemaEl]): (Int, Int) = {
    if (els.length < 2) throw Fail // root + at least one leaf
    val root = els(0)
    if (root.numChildren < 1) throw Fail
    var leaves = 0
    // stack of remaining-children counts
    val stack = new Array[Int](64)
    var sp = 0
    stack(0) = root.numChildren
    sp = 1
    var i = 1
    while (i < els.length) {
      if (sp == 0) throw Fail // more elements than tree slots
      stack(sp - 1) -= 1
      val e = els(i)
      if (e.numChildren > 0) {
        if (sp >= 64) throw Fail
        stack(sp) = e.numChildren
        sp += 1
      } else {
        if (e.ptype < 0 || e.ptype > 7) throw Fail // leaf needs a type
        leaves += 1
      }
      while (sp > 0 && stack(sp - 1) == 0) sp -= 1
      i += 1
    }
    if (sp != 0) throw Fail // tree incomplete
    (els.length, leaves)
  }

  // ------------------------------------------------------------------
  // file framing + FileMetaData

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Census one parquet file's footer; None on any violation. */
  private[graft] def parseParquetMeta(b: Array[Byte]): Option[PqMeta] = {
    if (b == null || b.length < 12) return None
    try {
      val n = b.length
      if (b(0) != 'P' || b(1) != 'A' || b(2) != 'R' || b(3) != '1')
        return None
      if (b(n - 4) != 'P' || b(n - 3) != 'A' || b(n - 2) != 'R' ||
          b(n - 1) != '1') throw Fail
      val flen = u32le(b, n - 8)
      if (flen < 1 || flen > n - 12L || flen > (1L << 23)) throw Fail
      val fStart = n - 8 - flen.toInt
      val tc = new Tc(b, fStart, n - 8)
      var version = -1
      var createdBy: Option[String] = None
      var numRows = -1L
      var schema: Array[SchemaEl] = null
      var rgs: Array[PqRowGroup] = null
      readStruct(tc, 0) { (id, typ) =>
        id match {
          case 1 => version = readI32(tc, typ); true
          case 2 =>
            if (typ != 9) throw Fail
            val (et, sz) = listHeader(tc)
            if (et != 12 || sz < 1 || sz > 4096) throw Fail
            val a = new Array[SchemaEl](sz.toInt)
            var i = 0
            while (i < sz) { a(i) = readSchemaElement(tc, 1); i += 1 }
            schema = a
            true
          case 3 => numRows = readI64(tc, typ); true
          case 4 =>
            if (typ != 9) throw Fail
            val (et, sz) = listHeader(tc)
            if (et != 12 || sz > 65536) throw Fail
            val a = new Array[PqRowGroup](sz.toInt)
            var i = 0
            while (i < sz) {
              a(i) = readRowGroup(b, tc, 1, fStart.toLong)
              i += 1
            }
            rgs = a
            true
          case 6 =>
            createdBy = Some(strictUtf8(readBinary(tc, typ)))
            true
          case _ => false
        }
      }
      if (tc.pos != tc.end) throw Fail // footer consumed exactly
      if (version < 1 || numRows < 0 || schema == null || rgs == null)
        throw Fail
      val (nSchema, nLeaves) = validateSchema(schema)
      var rowSum = 0L
      rgs.foreach { rg =>
        if (rg.cols.length != nLeaves) throw Fail
        rowSum += rg.nRows
      }
      if (rowSum != numRows) throw Fail
      Some(PqMeta(version, createdBy, nSchema, nLeaves, numRows, rgs))
    } catch { case Fail => None }
  }

  // ==================================================================
  // fixture-side thrift compact writer

  private[graft] final class Tw {
    val out = new java.io.ByteArrayOutputStream()
    private var lastId = 0
    private val stack = new scala.collection.mutable.ArrayDeque[Int]()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) {
        out.write(((x & 0x7f) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
    }
    def zig(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    def field(id: Int, typ: Int): Unit = {
      val d = id - lastId
      require(d >= 1 && d <= 15, s"field delta $d")
      out.write((d << 4) | typ)
      lastId = id
    }
    def i32(id: Int, v: Int): Unit = { field(id, 5); zig(v.toLong) }
    def i64(id: Int, v: Long): Unit = { field(id, 6); zig(v) }
    def str(id: Int, s: String): Unit = {
      field(id, 8)
      val b = s.getBytes("UTF-8")
      varint(b.length.toLong)
      out.write(b, 0, b.length)
    }
    def listBegin(id: Int, elemType: Int, size: Int): Unit = {
      field(id, 9)
      if (size < 15) out.write((size << 4) | elemType)
      else { out.write(0xf0 | elemType); varint(size.toLong) }
    }
    def structBegin(id: Int): Unit = { field(id, 12); enter() }
    /** A struct as a LIST ELEMENT has no field header. */
    def enter(): Unit = { stack.append(lastId); lastId = 0 }
    def structEnd(): Unit = { out.write(0); lastId = stack.removeLast() }
  }

  private[graft] final case class FixCol(
      name: String, ptype: Int, codec: Int, nValues: Long,
      tcSize: Long, tuSize: Long, hasDict: Boolean)

  private[graft] final case class FixRg(nRows: Long, cols: Seq[FixCol])

  /** Write a complete parquet file (magic + zero data region + footer)
    * whose footer declares `rgs`; page offsets are assigned
    * sequentially from 4 and the data region is sized to fit them.
    * `extraKv` / `columnOrders` / `stats` exercise the known-but-
    * skipped and unknown-field forward-compat paths. */
  private[graft] def encodeParquetMeta(version: Int, createdBy: String,
      rgs: Seq[FixRg], extraKv: Boolean = false,
      columnOrders: Boolean = false, stats: Boolean = false): Array[Byte] = {
    val leaves = rgs.head.cols.map(_.name)
    val tw = new Tw
    tw.i32(1, version)
    // schema: root + leaves
    tw.listBegin(2, 12, 1 + leaves.length)
    tw.enter() // root SchemaElement
    tw.str(4, "schema")
    tw.i32(5, leaves.length)
    tw.structEnd()
    rgs.head.cols.foreach { c =>
      tw.enter()
      tw.i32(1, c.ptype)
      tw.i32(3, 1) // OPTIONAL
      tw.str(4, c.name)
      tw.structEnd()
    }
    tw.i64(3, rgs.map(_.nRows).sum)
    // row groups, page offsets assigned sequentially from 4
    var cur = 4L
    tw.listBegin(4, 12, rgs.length)
    rgs.foreach { rg =>
      tw.enter() // RowGroup
      tw.listBegin(1, 12, rg.cols.length)
      rg.cols.foreach { c =>
        tw.enter() // ColumnChunk
        tw.i64(2, cur) // file_offset (informational)
        tw.structBegin(3) // ColumnMetaData
        tw.i32(1, c.ptype)
        tw.listBegin(2, 5, if (c.hasDict) 3 else 2) // encodings
        tw.zig(0) // PLAIN
        tw.zig(3) // RLE
        if (c.hasDict) tw.zig(8) // RLE_DICTIONARY
        tw.listBegin(3, 8, 1) // path_in_schema
        val pathBytes = c.name.getBytes("UTF-8")
        tw.varint(pathBytes.length.toLong)
        tw.out.write(pathBytes, 0, pathBytes.length)
        tw.i32(4, c.codec)
        tw.i64(5, c.nValues)
        tw.i64(6, c.tuSize)
        tw.i64(7, c.tcSize)
        tw.i64(9, if (c.hasDict) cur + 16 else cur) // data_page_offset
        if (c.hasDict) tw.i64(11, cur) // dictionary_page_offset
        if (stats) { // Statistics struct: skipped generically
          tw.structBegin(12)
          tw.str(5, "mx") // max_value
          tw.str(6, "mn") // min_value
          tw.structEnd()
        }
        tw.structEnd() // ColumnMetaData
        tw.structEnd() // ColumnChunk
        cur += c.tcSize
      }
      tw.i64(2, rg.cols.map(_.tuSize).sum) // total_byte_size
      tw.i64(3, rg.nRows)
      tw.structEnd()
    }
    if (extraKv) { // key_value_metadata: known field, skipped
      tw.listBegin(5, 12, 2)
      for (k <- 0 until 2) {
        tw.enter()
        tw.str(1, s"k$k")
        tw.str(2, s"v$k")
        tw.structEnd()
      }
    }
    tw.str(6, createdBy)
    if (columnOrders) { // list<ColumnOrder> — union of empty structs
      tw.listBegin(7, 12, leaves.length)
      leaves.foreach { _ =>
        tw.enter()
        tw.structBegin(1) // TYPE_ORDER (TypeDefinedOrder: empty)
        tw.structEnd()
        tw.structEnd()
      }
    }
    tw.out.write(0) // FileMetaData STOP
    val footer = tw.out.toByteArray
    val dataLen = (cur - 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("PAR1".getBytes("US-ASCII"))
    bos.write(new Array[Byte](dataLen), 0, dataLen)
    bos.write(footer, 0, footer.length)
    (0 until 4).foreach(k => bos.write(((footer.length >> (8 * k)) & 0xff)))
    bos.write("PAR1".getBytes("US-ASCII"))
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // extended fixture writer (q236): encodings variants,
  // encoding_stats, page indexes, bloom headers

  private[graft] final case class FixColX(
      name: String, ptype: Int, codec: Int, nValues: Long,
      tcSize: Long, tuSize: Long, hasDict: Boolean,
      nPages: Int = -1, v2: Boolean = false, bloomBytes: Int = -1,
      delta: Boolean = false)

  /** Write a parquet file whose footer carries the page-grain
    * surfaces: per-column encodings (PLAIN+RLE, +RLE_DICTIONARY on
    * dict chunks, +DELTA_BINARY_PACKED on `delta`), encoding_stats
    * (all data pages V2 on `v2`), OffsetIndex/ColumnIndex structures
    * when `nPages` >= 0, and SBBF bloom headers when `bloomBytes`
    * >= 32 — all located after the zero data region, before the
    * footer. */
  private[graft] def encodeParquetMetaX(version: Int, createdBy: String,
      rgRows: Long, cols: Seq[FixColX]): Array[Byte] = {
    // layout pass: data pages from 4, side structures after them
    val dataOffs = new Array[Long](cols.length)
    var cur = 4L
    cols.zipWithIndex.foreach { case (c, i) =>
      dataOffs(i) = cur
      cur += c.tcSize
    }
    val sideBase = cur
    val side = new java.io.ByteArrayOutputStream()
    // per column: (oiOff, oiLen, ciOff, ciLen, bloomOff, bloomLen)
    val sides = cols.zipWithIndex.map { case (c, i) =>
      val dataOff = dataOffs(i) + (if (c.hasDict) 16 else 0)
      var oiOff = -1L; var oiLen = -1
      var ciOff = -1L; var ciLen = -1
      var bloomOff = -1L; var bloomLen = -1
      if (c.nPages >= 1) {
        val dataBytes = c.tcSize - (if (c.hasDict) 16 else 0)
        val rowsPer = rgRows / c.nPages
        val oi = new Tw
        oi.listBegin(1, 12, c.nPages)
        var off = dataOff
        (0 until c.nPages).foreach { p =>
          val sz = if (p == c.nPages - 1)
            (dataBytes - 10L * (c.nPages - 1)).toInt else 10
          oi.enter()
          oi.i64(1, off)
          oi.i32(2, sz)
          oi.i64(3, p * rowsPer)
          oi.structEnd()
          off += sz
        }
        oi.out.write(0) // OffsetIndex STOP
        oiOff = sideBase + side.size
        oiLen = oi.out.size
        side.write(oi.out.toByteArray, 0, oiLen)
        val ci = new Tw
        ci.listBegin(1, 1, c.nPages) // null_pages: all false (= 2)
        (0 until c.nPages).foreach(_ => ci.out.write(2))
        ci.listBegin(2, 8, c.nPages) // min_values
        (0 until c.nPages).foreach { p =>
          ci.varint(1L); ci.out.write('a' + p % 16)
        }
        ci.listBegin(3, 8, c.nPages) // max_values
        (0 until c.nPages).foreach { p =>
          ci.varint(1L); ci.out.write('m' + p % 8)
        }
        ci.i32(4, 0) // boundary_order UNORDERED
        ci.out.write(0)
        ciOff = sideBase + side.size
        ciLen = ci.out.size
        side.write(ci.out.toByteArray, 0, ciLen)
      }
      if (c.bloomBytes >= 32) {
        val bh = new Tw
        bh.i32(1, c.bloomBytes)
        bh.structBegin(2); bh.structBegin(1); bh.structEnd()
        bh.structEnd() // algorithm = BLOCK
        bh.structBegin(3); bh.structBegin(1); bh.structEnd()
        bh.structEnd() // hash = XXHASH
        bh.structBegin(4); bh.structBegin(1); bh.structEnd()
        bh.structEnd() // compression = UNCOMPRESSED
        bh.out.write(0)
        bloomOff = sideBase + side.size
        bloomLen = bh.out.size + c.bloomBytes
        side.write(bh.out.toByteArray, 0, bh.out.size)
        side.write(new Array[Byte](c.bloomBytes), 0, c.bloomBytes)
      }
      (oiOff, oiLen, ciOff, ciLen, bloomOff, bloomLen)
    }
    // footer
    val tw = new Tw
    tw.i32(1, version)
    tw.listBegin(2, 12, 1 + cols.length)
    tw.enter()
    tw.str(4, "schema")
    tw.i32(5, cols.length)
    tw.structEnd()
    cols.foreach { c =>
      tw.enter()
      tw.i32(1, c.ptype)
      tw.i32(3, 1)
      tw.str(4, c.name)
      tw.structEnd()
    }
    tw.i64(3, rgRows)
    tw.listBegin(4, 12, 1) // one row group
    tw.enter()
    tw.listBegin(1, 12, cols.length)
    cols.zipWithIndex.foreach { case (c, i) =>
      val (oiOff, oiLen, ciOff, ciLen, bloomOff, bloomLen) = sides(i)
      tw.enter() // ColumnChunk
      tw.i64(2, dataOffs(i))
      tw.structBegin(3) // ColumnMetaData
      tw.i32(1, c.ptype)
      val encs = Seq(0, 3) ++ (if (c.delta) Seq(5) else Nil) ++
        (if (c.hasDict) Seq(8) else Nil)
      tw.listBegin(2, 5, encs.length)
      encs.foreach(e => tw.zig(e.toLong))
      tw.listBegin(3, 8, 1)
      val pathBytes = c.name.getBytes("UTF-8")
      tw.varint(pathBytes.length.toLong)
      tw.out.write(pathBytes, 0, pathBytes.length)
      tw.i32(4, c.codec)
      tw.i64(5, c.nValues)
      tw.i64(6, c.tuSize)
      tw.i64(7, c.tcSize)
      tw.i64(9, dataOffs(i) + (if (c.hasDict) 16 else 0))
      if (c.hasDict) tw.i64(11, dataOffs(i))
      // encoding_stats: the dictionary page plus the data pages
      val dataPages = math.max(c.nPages, 1)
      tw.listBegin(13, 12, if (c.hasDict) 2 else 1)
      if (c.hasDict) {
        tw.enter()
        tw.i32(1, 2) // DICTIONARY_PAGE
        tw.i32(2, 0) // PLAIN
        tw.i32(3, 1)
        tw.structEnd()
      }
      tw.enter()
      tw.i32(1, if (c.v2) 3 else 0) // DATA_PAGE_V2 / DATA_PAGE
      tw.i32(2, if (c.delta) 5 else if (c.hasDict) 8 else 0)
      tw.i32(3, dataPages)
      tw.structEnd()
      if (bloomOff >= 0) {
        tw.i64(14, bloomOff)
        tw.i32(15, bloomLen)
      }
      tw.structEnd() // ColumnMetaData
      if (oiOff >= 0) {
        tw.i64(4, oiOff)
        tw.i32(5, oiLen)
        tw.i64(6, ciOff)
        tw.i32(7, ciLen)
      }
      tw.structEnd() // ColumnChunk
    }
    tw.i64(2, cols.map(_.tuSize).sum)
    tw.i64(3, rgRows)
    tw.structEnd()
    tw.str(6, createdBy)
    tw.out.write(0) // FileMetaData STOP
    val footer = tw.out.toByteArray
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("PAR1".getBytes("US-ASCII"))
    bos.write(new Array[Byte]((sideBase - 4).toInt), 0,
      (sideBase - 4).toInt)
    bos.write(side.toByteArray, 0, side.size)
    bos.write(footer, 0, footer.length)
    (0 until 4).foreach(k => bos.write(((footer.length >> (8 * k)) & 0xff)))
    bos.write("PAR1".getBytes("US-ASCII"))
    bos.toByteArray
  }

  // ==================================================================
  // DataFrame surface + fixture (q224)

  /** One row per (file, row group, column chunk). */
  def extractParquetMeta(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("version", IntegerType, true),
      StructField("created_by", StringType, true),
      StructField("n_schema", IntegerType, true),
      StructField("n_leaves", IntegerType, true),
      StructField("num_rows", LongType, true),
      StructField("n_row_groups", IntegerType, true),
      StructField("rg", IntegerType, true),
      StructField("rg_rows", LongType, true),
      StructField("rg_bytes", LongType, true),
      StructField("col", IntegerType, true),
      StructField("col_path", StringType, true),
      StructField("ptype", IntegerType, true),
      StructField("codec", IntegerType, true),
      StructField("n_values", LongType, true),
      StructField("total_compressed", LongType, true),
      StructField("total_uncompressed", LongType, true),
      StructField("has_dict", BooleanType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseParquetMeta(media)).toOption.flatten match {
          case Some(m) =>
            m.rowGroups.iterator.zipWithIndex.flatMap { case (rg, gi) =>
              rg.cols.iterator.zipWithIndex.map { case (c, ci) =>
                Row(id, m.version, m.createdBy.orNull, m.nSchema,
                  m.nLeaves, m.numRows, m.rowGroups.length, gi, rg.nRows,
                  rg.totalByteSize, ci, c.path, c.ptype, c.codec,
                  c.nValues, c.totalCompressed, c.totalUncompressed,
                  c.hasDict, true)
              }
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, null, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** One row per (file, column) with the page-grain surfaces: the
    * encodings bitmask (the O11 verification surface), V1/V2/dict
    * page counts from encoding_stats, the OffsetIndex page count,
    * ColumnIndex presence and the SBBF bitset size. */
  def extractParquetPages(df: org.apache.spark.sql.DataFrame,
      idCol: String, binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rg", IntegerType, true),
      StructField("col", IntegerType, true),
      StructField("col_path", StringType, true),
      StructField("encodings", IntegerType, true),
      StructField("pages_v1", IntegerType, true),
      StructField("pages_v2", IntegerType, true),
      StructField("dict_pages", IntegerType, true),
      StructField("n_pages", IntegerType, true),
      StructField("has_col_index", BooleanType, true),
      StructField("bloom_bytes", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseParquetMeta(media)).toOption.flatten match {
          case Some(m) =>
            m.rowGroups.iterator.zipWithIndex.flatMap { case (rg, gi) =>
              rg.cols.iterator.zipWithIndex.map { case (c, ci) =>
                Row(id, gi, ci, c.path, c.encodings,
                  if (c.pagesV1 < 0) null else Int.box(c.pagesV1),
                  if (c.pagesV2 < 0) null else Int.box(c.pagesV2),
                  if (c.dictPages < 0) null else Int.box(c.dictPages),
                  if (c.nPages < 0) null else Int.box(c.nPages),
                  c.hasColIndex,
                  if (c.bloomBytes < 0) null else Long.box(c.bloomBytes),
                  true)
              }
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Page-grain fixture laws (file i): one row group of 80+8i rows;
    * 2+i%2 columns; ptype [INT32, INT64, BYTE_ARRAY] by (i+c)%3;
    * sizes 600+13i+11c (+300 uncompressed); dictionary AND V2 pages
    * AND DELTA_BINARY_PACKED on (i+c)%2=0 chunks; page index with
    * 2+(i+c)%3 pages except on i%4=3 files; SBBF bloom of 32·2^(i%3)
    * bytes on (i+c)%3=0 chunks. */
  def parquetPagesFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ptypes = Array(1, 2, 6)
    val codecs = Array(0, 1, 6)
    val rows = (0 until n).map { i =>
      val nLeaves = 2 + i % 2
      val rgRows = 80L + 8 * i
      val cols = (0 until nLeaves).map { c =>
        val even = (i + c) % 2 == 0
        FixColX(s"c$c", ptypes((i + c) % 3), codecs((i + 2 * c) % 3),
          rgRows, 600L + 13 * i + 11 * c, 900L + 13 * i + 11 * c,
          hasDict = even,
          nPages = if (i % 4 == 3) -1 else 2 + (i + c) % 3,
          v2 = even,
          bloomBytes = if ((i + c) % 3 == 0) 32 << (i % 3) else -1,
          delta = even)
      }
      Row(i.toLong,
        encodeParquetMetaX(1 + i % 2, s"graft-pages ${i % 3}", rgRows,
          cols))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Fixture laws (file i): version 1+i%2; 2+i%3 leaf columns c0..;
    * ptype [INT32, INT64, BYTE_ARRAY] by (i+c)%3; 100+10i rows over
    * 1+i%2 row groups (60+5i / 40+5i when split); codec
    * [UNCOMPRESSED, SNAPPY, ZSTD] by (i+2c+3g)%3; sizes linear laws;
    * dictionary on (i+c)%2=0; key-value metadata on i%4=0, column
    * orders on i%5=0, statistics on i%3=0 — the skipped-field paths
    * exercise forward compatibility inside the oracle-gated corpus. */
  def parquetMetaFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val ptypes = Array(1, 2, 6)
    val codecs = Array(0, 1, 6)
    val rows = (0 until n).map { i =>
      val nLeaves = 2 + i % 3
      val numRows = 100L + 10 * i
      val rgRows =
        if (i % 2 == 0) Seq(numRows) else Seq(60L + 5 * i, 40L + 5 * i)
      val rgs = rgRows.zipWithIndex.map { case (rows, g) =>
        FixRg(rows, (0 until nLeaves).map { c =>
          val tc = 500L + 13 * i + 11 * c + 5 * g
          FixCol(s"c$c", ptypes((i + c) % 3), codecs((i + 2 * c + 3 * g) % 3),
            rows, tc, tc + 200 + i, hasDict = (i + c) % 2 == 0)
        })
      }
      Row(i.toLong, encodeParquetMeta(1 + i % 2, s"graft-parquet ${i % 5}",
        rgs, extraKv = i % 4 == 0, columnOrders = i % 5 == 0,
        stats = i % 3 == 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
