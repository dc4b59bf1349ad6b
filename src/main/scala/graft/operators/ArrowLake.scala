package graft.operators

/** Arrow IPC *file* (Feather V2) census — the fifth data-interchange
  * format a model-hub / dataset crawl yields next to parquet,
  * SafeTensors/NPY/GGUF and Avro: HuggingFace datasets cache and
  * exchange as `.arrow` files. The walk is spec-written from the
  * public Arrow columnar-format documents — including the
  * FLATBUFFERS wire format itself (root uoffset, signed
  * table-to-vtable soffsets, u16 vtable slots, forward u32
  * indirections, inline structs), implemented here directly rather
  * than through a flatbuffers library:
  *
  *  - framing: `ARROW1\0\0` at the start, the footer flatbuffer +
  *    little-endian i32 footer length + `ARROW1` at the end;
  *  - Footer: version, schema, recordBatches as 24-byte Block
  *    structs (offset / metaDataLength / bodyLength);
  *  - each block is re-walked as an encapsulated MESSAGE
  *    (0xFFFFFFFF continuation + i32 metadata length + Message
  *    flatbuffer + padding + body): header union must be
  *    RecordBatch, the message's bodyLength must equal the block's;
  *  - the leading Schema MESSAGE is parsed independently and must
  *    MATCH the footer's schema field-for-field (name, nullability,
  *    type family, width) — a file whose stream and footer disagree
  *    lies about its own content;
  *  - schema subset decoded exactly: Int (8/16/32/64, signed or
  *    not), FloatingPoint (single/double), Utf8, Bool — flat only
  *    (no children). Any OTHER type family is censused honestly as
  *    family `other` (a crawl is full of lists and timestamps; a
  *    census records, it never guesses) — but then per-batch node/
  *    buffer validation and value decoding are off (child layouts
  *    are format-defined per type and out of subset);
  *  - for all-known schemas every RecordBatch is validated: node
  *    count == field count, the buffer list must be exactly
  *    [validity, data] per primitive field and [validity, offsets,
  *    data] per Utf8 field, every buffer inside the body, data
  *    buffer sizes consistent with the row count — and INT64
  *    columns with zero nulls are SUMMED exactly (the content hash
  *    gate);
  *  - DICTIONARY-encoded fields (Utf8 values, signed 8/16/32/64-bit
  *    indices — the string categoricals HuggingFace `datasets`
  *    writes): DictionaryBatch blocks walk BEFORE the data (size +
  *    total value chars from the offsets buffer), isDelta = 1
  *    batches APPEND to an already-defined id (how `datasets`
  *    appends categories; in a stream they may arrive between record
  *    batches), every record-batch index is bounds-checked against
  *    its dictionary and the index SUM is the content gate;
  *  - BODY COMPRESSION (BodyCompression, method BUFFER): each
  *    non-empty buffer is an i64 uncompressed length (-1 = raw)
  *    followed by an LZ4 frame or zstd frame; size laws run on the
  *    UNCOMPRESSED lengths, decoded buffers must produce EXACTLY the
  *    declared length, and the whole file must use one codec;
  *  - strict rejects: non-Utf8 dictionary values, missing
  *    dictionaries, REPLACEMENT (a second definition without the
  *    delta flag) or before-definition delta batches, out-of-range
  *    indices, lying length prefixes, mixed codecs, big-endian
  *    schemas, non-RecordBatch data blocks;
  *  - the IPC STREAM form (`.arrows`) walks the same batch engine
  *    sequentially: Schema message first, dictionaries strictly
  *    before the data, the 8-byte EOS marker closing the blob
  *    exactly — no footer, so the census facts come from the walk
  *    alone.
  *
  * The fixture encoder builds real flatbuffers back-to-front with
  * the canonical builder algorithm (prep-alignment, vtable emission,
  * soffset patching) — an independent in-repo writer — while the
  * spec ALSO parses genuine pyarrow-written files checked in as
  * test resources, pinning conformance against the reference
  * implementation.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object ArrowLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class ArrowField(
      name: String, nullable: Boolean, family: String, bitWidth: Int,
      dictId: Long = -1L)

  private[graft] final case class ArrowMeta(
      version: Int, fields: Array[ArrowField], nBatches: Int,
      totalRows: Long, bodyBytes: Long, intSums: Array[Option[Long]],
      codec: String = "none", dictSizes: Array[Option[Long]] = null,
      dictChars: Array[Option[Long]] = null)

  // ------------------------------------------------------------------
  // flatbuffers reader (bounded, absolute positions)

  private final class Fb(b: Array[Byte], val base: Int, val end: Int) {
    def u8(p: Int): Int = {
      if (p < base || p >= end) throw Fail
      b(p) & 0xff
    }
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def i32(p: Int): Int =
      u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)
    def i64(p: Int): Long =
      (i32(p) & 0xffffffffL) | (i32(p + 4).toLong << 32)
    def root: Int = {
      val r = base + i32(base)
      if (r < base || r >= end) throw Fail
      r
    }
    /** Absolute position of field `slot`'s data, or 0 if absent. */
    def field(table: Int, slot: Int): Int = {
      val vt = table - i32(table) // signed soffset
      if (vt < base || vt + 4 > end) throw Fail
      val vsize = u16(vt)
      if (vsize < 4 || vt + vsize > end) throw Fail
      val o = 4 + 2 * slot
      if (o + 2 > vsize) return 0
      val fo = u16(vt + o)
      if (fo == 0) 0 else table + fo
    }
    def indirect(p: Int): Int = {
      val t = p + i32(p)
      if (t < base || t >= end) throw Fail
      t
    }
    def str(p: Int): String = {
      val s = indirect(p)
      val len = i32(s)
      if (len < 0 || len > (1 << 20) || s + 4 + len > end) throw Fail
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try dec.decode(java.nio.ByteBuffer.wrap(b, s + 4, len)).toString
      catch {
        case _: java.nio.charset.CharacterCodingException => throw Fail
      }
    }
    /** (absolute position of element 0, length) of a vector field. */
    def vec(p: Int, elemSize: Int): (Int, Int) = {
      val v = indirect(p)
      val n = i32(v)
      if (n < 0 || n > (1 << 20)) throw Fail
      if (v + 4 + n.toLong * elemSize > end) throw Fail
      (v + 4, n)
    }
  }

  // ------------------------------------------------------------------
  // schema decode (shared by the stream message and the footer)

  private def readSchema(fb: Fb, schemaTable: Int): Array[ArrowField] = {
    // endianness (slot 0, i16 default 0 = Little)
    val endianPos = fb.field(schemaTable, 0)
    if (endianPos != 0 && fb.u16(endianPos) != 0) throw Fail
    val fieldsPos = fb.field(schemaTable, 1)
    if (fieldsPos == 0) throw Fail
    val (el0, n) = fb.vec(fieldsPos, 4)
    if (n < 1 || n > 4096) throw Fail
    Array.tabulate(n) { i =>
      val f = fb.indirect(el0 + 4 * i)
      val namePos = fb.field(f, 0)
      if (namePos == 0) throw Fail
      val name = fb.str(namePos)
      val nullablePos = fb.field(f, 1)
      val nullable = nullablePos != 0 && fb.u8(nullablePos) != 0
      val dictPos = fb.field(f, 4)
      val childrenPos = fb.field(f, 5)
      val nChildren =
        if (childrenPos == 0) 0 else fb.vec(childrenPos, 4)._2
      val ttPos = fb.field(f, 2)
      val tt = if (ttPos == 0) 0 else fb.u8(ttPos)
      val tvPos = fb.field(f, 3)
      val (family, width) = tt match {
        case 2 => // Int
          if (tvPos == 0) throw Fail
          val t = fb.indirect(tvPos)
          val bwPos = fb.field(t, 0)
          val bw = if (bwPos == 0) 0 else fb.i32(bwPos)
          if (bw != 8 && bw != 16 && bw != 32 && bw != 64) throw Fail
          ("int", bw)
        case 3 => // FloatingPoint
          if (tvPos == 0) throw Fail
          val t = fb.indirect(tvPos)
          val pPos = fb.field(t, 0)
          val prec = if (pPos == 0) 0 else fb.u16(pPos)
          prec match {
            case 1 => ("float", 32)
            case 2 => ("float", 64)
            case _ => throw Fail // HALF out of subset
          }
        case 5 => ("utf8", 0)
        case 6 => ("bool", 1)
        case _ => ("other", 0)
      }
      if (dictPos != 0) {
        // DictionaryEncoding (slot 4): id, indexType (Int), isOrdered,
        // dictionaryKind (DenseArray only). The dictionary VALUE type
        // in this subset is Utf8 — string categoricals, the form
        // HuggingFace `datasets` writes; anything else rejects.
        if (family != "utf8" || nChildren != 0) throw Fail
        val dt = fb.indirect(dictPos)
        val idPos = fb.field(dt, 0)
        val id = if (idPos == 0) 0L else fb.i64(idPos)
        if (id < 0) throw Fail
        val itPos = fb.field(dt, 1)
        if (itPos == 0) throw Fail // pyarrow always writes it
        val it = fb.indirect(itPos)
        val bwPos = fb.field(it, 0)
        val bw = if (bwPos == 0) 0 else fb.i32(bwPos)
        if (bw != 8 && bw != 16 && bw != 32 && bw != 64) throw Fail
        val dkPos = fb.field(dt, 3)
        if (dkPos != 0 && fb.u16(dkPos) != 0) throw Fail // dense only
        ArrowField(name, nullable, "dict", bw, id)
      } else {
        // the flat subset: known families must be leaves
        if (family != "other" && nChildren != 0) throw Fail
        ArrowField(name, nullable, family, width)
      }
    }
  }

  // ------------------------------------------------------------------
  // body-buffer access under optional LZ4-frame / zstd compression
  // (BodyCompression, method BUFFER: each non-empty buffer is an i64
  // uncompressed length followed by the frame; -1 marks a raw buffer)

  private def i64leAt(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(o + k) & 0xffL); k -= 1 }
    v
  }

  /** codec of one record batch: -1 none, 0 LZ4_FRAME, 1 ZSTD. */
  private def batchCodec(mfb: Fb, rb: Int): Int = {
    val cPos = mfb.field(rb, 3)
    if (cPos == 0) -1
    else {
      val ct = mfb.indirect(cPos)
      val codPos = mfb.field(ct, 0)
      val cod = if (codPos == 0) 0 else mfb.u8(codPos)
      if (cod > 1) throw Fail
      val mPos = mfb.field(ct, 1)
      if (mPos != 0 && mfb.u8(mPos) != 0) throw Fail // BUFFER method
      cod
    }
  }

  private final val MaxBuf = 1 << 26

  /** Declared UNCOMPRESSED length of a buffer (size laws run on it). */
  private def bufUncompLen(b: Array[Byte], bodyStart: Long, off: Long,
      len: Long, codec: Int): Long =
    if (codec < 0 || len == 0) len
    else {
      if (len < 8) throw Fail
      val decl = i64leAt(b, (bodyStart + off).toInt)
      if (decl == -1) len - 8 // stored raw behind the prefix
      else if (decl < 0 || decl > MaxBuf) throw Fail
      else decl
    }

  /** Materialized uncompressed bytes of a buffer we decode. */
  private def bufData(b: Array[Byte], bodyStart: Long, off: Long,
      len: Long, codec: Int): Array[Byte] = {
    val p = (bodyStart + off).toInt
    if (codec < 0 || len == 0)
      java.util.Arrays.copyOfRange(b, p, p + len.toInt)
    else {
      val decl = i64leAt(b, p)
      if (decl == -1)
        java.util.Arrays.copyOfRange(b, p + 8, p + len.toInt)
      else {
        if (decl < 0 || decl > MaxBuf) throw Fail
        val in = new java.io.ByteArrayInputStream(b, p + 8,
          len.toInt - 8)
        var st: java.io.InputStream = null
        try {
          // the LZ4 constructor reads the frame header EAGERLY, so it
          // sits inside the try; zstd-jni signals malformed frames as
          // IOExceptions but lz4-java throws RuntimeExceptions (found
          // by the fuzz corruption sweep: "Reserved0 field must be 0")
          st =
            if (codec == 0) new net.jpountz.lz4.LZ4FrameInputStream(in)
            else new com.github.luben.zstd.ZstdInputStream(in)
          val out = st.readNBytes(decl.toInt + 1)
          // the frame must produce EXACTLY the declared length — a
          // lying prefix is a framing violation, not a truncation
          if (out.length != decl) throw Fail
          out
        } catch {
          case _: java.io.IOException => throw Fail
          case _: RuntimeException => throw Fail
        } finally if (st != null) st.close()
      }
    }
  }

  /** Parse one encapsulated message; returns (headerType, headerTable,
    * bodyLengthField, fb). */
  private def readMessage(b: Array[Byte], off: Int,
      metaEnd: Int): (Int, Int, Long, Fb) = {
    if (off + 8 > metaEnd) throw Fail
    def i32At(p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    if (i32At(off) != -1) throw Fail // 0xFFFFFFFF continuation
    val mlen = i32At(off + 4)
    if (mlen <= 0 || off + 8 + mlen > metaEnd) throw Fail
    val fb = new Fb(b, off + 8, off + 8 + mlen)
    val msg = fb.root
    val htPos = fb.field(msg, 1)
    val ht = if (htPos == 0) 0 else fb.u8(htPos)
    val hvPos = fb.field(msg, 2)
    if (hvPos == 0) throw Fail
    val header = fb.indirect(hvPos)
    val blPos = fb.field(msg, 3)
    val bodyLen = if (blPos == 0) 0L else fb.i64(blPos)
    if (bodyLen < 0) throw Fail
    (ht, header, bodyLen, fb)
  }

  // ------------------------------------------------------------------
  // shared batch/dictionary walking (the file and stream forms drive
  // the same validation and summing; `limit` bounds every offset —
  // the footer start for files, the blob length for streams)

  private final class Walk(b: Array[Byte], limit: Long,
      fields: Array[ArrowField]) {
    val allKnown: Boolean = fields.forall(_.family != "other")
    // one codec for the whole file — a mix would make the census's
    // codec fact a lie; -2 = not yet seen
    private var fileCodec = -2
    val dictSizes = new java.util.HashMap[Long, Long]()
    val dictChars = new java.util.HashMap[Long, Long]()
    val sums: Array[Option[Long]] = fields.map(f =>
      if (allKnown &&
        ((f.family == "int" && f.bitWidth == 64) || f.family == "dict"))
        Some(0L)
      else None)
    var totalRows = 0L
    var bodyBytes = 0L
    var nBatches = 0

    private def meldCodec(c: Int): Unit = {
      if (fileCodec == -2) fileCodec = c
      else if (fileCodec != c) throw Fail
    }

    def codecName: String = fileCodec match {
      case 0 => "lz4"
      case 1 => "zstd"
      case _ => "none"
    }

    /** Walk one RecordBatch-shaped table (a data batch or a
      * dictionary batch's payload): per-node validation, size laws
      * under the batch codec, int64/dict-index sums. */
    private def walkBatch(mfb: Fb, rb: Int, bodyStart: Long,
        bodyLen: Long, bFields: Array[ArrowField],
        bSums: Array[Option[Long]], dictOf: Long => Long): Long = {
      val lenPos = mfb.field(rb, 0)
      val rows = if (lenPos == 0) 0L else mfb.i64(lenPos)
      // a batch cannot hold more fixed-width rows than the file has
      // bytes — rejecting implausible counts up front keeps the
      // size-law products below (rows * width, (rows+1) * 4) from
      // wrapping Long and passing vacuously
      if (rows < 0 || rows > limit) throw Fail
      val codec = batchCodec(mfb, rb)
      meldCodec(codec)
      val (nd0, nNodes) = mfb.vec(mfb.field(rb, 1), 16)
      if (nNodes != bFields.length) throw Fail
      val (bf0, nBufs) = mfb.vec(mfb.field(rb, 2), 16)
      val expBufs = bFields.map(f =>
        if (f.family == "utf8") 3 else 2).sum
      if (nBufs != expBufs) throw Fail
      var bi = 0
      var fi = 0
      while (fi < bFields.length) {
        val f = bFields(fi)
        val nodeLen = mfb.i64(nd0 + 16 * fi)
        val nullCount = mfb.i64(nd0 + 16 * fi + 8)
        if (nodeLen != rows || nullCount < 0 || nullCount > rows)
          throw Fail
        val nPer = if (f.family == "utf8") 3 else 2
        // buffer extents inside the body (on-wire, maybe compressed)
        val exts = Array.tabulate(nPer) { j =>
          val o = mfb.i64(bf0 + 16 * (bi + j))
          val l = mfb.i64(bf0 + 16 * (bi + j) + 8)
          // bound each term before the sum: two huge i64s wrap o+l
          // negative and would pass a sum-only check
          if (o < 0 || l < 0 || o > bodyLen || l > bodyLen ||
            o + l > bodyLen) throw Fail
          (o, l)
        }
        // data-buffer size laws, on the UNCOMPRESSED lengths
        val dataLen = bufUncompLen(b, bodyStart, exts(1)._1,
          exts(1)._2, codec)
        f.family match {
          case "int" | "float" | "dict" =>
            if (dataLen < rows * (f.bitWidth / 8)) throw Fail
          case "bool" =>
            if (dataLen < (rows + 7) / 8) throw Fail
          case "utf8" =>
            if (rows > 0 && dataLen < (rows + 1) * 4) throw Fail
          case _ =>
        }
        val summed = (f.family == "int" && f.bitWidth == 64) ||
          f.family == "dict"
        if (summed && nullCount != 0)
          bSums(fi) = None // nulls present: the sum is out of scope
        else if (summed && bSums(fi).nonEmpty) {
          val data = bufData(b, bodyStart, exts(1)._1, exts(1)._2,
            codec)
          val w = f.bitWidth / 8
          val lim = if (f.family == "dict") dictOf(f.dictId)
            else Long.MaxValue
          var r = 0
          var s = 0L
          while (r < rows) {
            var v = 0L
            var j = w - 1
            while (j >= 0) {
              v = (v << 8) | (data(r * w + j) & 0xffL)
              j -= 1
            }
            // sign-extend sub-64-bit index types
            if (w < 8) v = (v << (64 - 8 * w)) >> (64 - 8 * w)
            if (f.family == "dict" && (v < 0 || v >= lim)) throw Fail
            s += v
            r += 1
          }
          bSums(fi) = bSums(fi).map(_ + s)
        }
        bi += nPer
        fi += 1
      }
      rows
    }

    /** One DictionaryBatch: id → (size, total value chars). A batch
      * with isDelta = 1 APPENDS to an already-defined dictionary
      * (how `datasets` appends categories across batches); a second
      * definition WITHOUT the delta flag is a replacement, which the
      * file format forbids — reject. A delta before any definition
      * rejects too. */
    def dictionaryBatch(mfb: Fb, hdr: Int, bodyStart: Long,
        bodyLen: Long): Boolean = {
      val idPos = mfb.field(hdr, 0)
      val id = if (idPos == 0) 0L else mfb.i64(idPos)
      val deltaPos = mfb.field(hdr, 2)
      val isDelta = deltaPos != 0 && mfb.u8(deltaPos) != 0
      val dataPos = mfb.field(hdr, 1)
      if (dataPos == 0) throw Fail
      val rb = mfb.indirect(dataPos)
      if (isDelta != dictSizes.containsKey(id)) throw Fail
      // the dictionary payload is one non-null Utf8 column
      val valField = Array(ArrowField("", nullable = false, "utf8", 0))
      val vSums = Array[Option[Long]](None)
      val rows = walkBatch(mfb, rb, bodyStart, bodyLen, valField,
        vSums, _ => 0L)
      // total value chars = the final offsets entry (content gate)
      val codec = batchCodec(mfb, rb)
      val (bf0, _) = mfb.vec(mfb.field(rb, 2), 16)
      val offExt = (mfb.i64(bf0 + 16), mfb.i64(bf0 + 16 + 8))
      val chars =
        if (rows == 0) 0L
        else {
          val offs = bufData(b, bodyStart, offExt._1, offExt._2, codec)
          val last = (rows * 4).toInt
          if (offs.length < last + 4) throw Fail
          (offs(last) & 0xffL) | ((offs(last + 1) & 0xffL) << 8) |
            ((offs(last + 2) & 0xffL) << 16) |
            ((offs(last + 3) & 0xffL) << 24)
        }
      if (isDelta) {
        // bounds re-checked on the accumulated totals: each delta's
        // rows is already <= limit, and the running size must stay
        // a plausible dictionary (index bound for later batches)
        val nsz = dictSizes.get(id) + rows
        val nch = dictChars.get(id) + chars
        if (nsz < 0 || nsz > limit || nch < 0) throw Fail
        dictSizes.put(id, nsz)
        dictChars.put(id, nch)
      } else {
        dictSizes.put(id, rows)
        dictChars.put(id, chars)
      }
      isDelta
    }

    /** Every dictionary-encoded field must have its dictionary. */
    def requireDicts(): Unit =
      fields.foreach { f =>
        if (f.family == "dict" && !dictSizes.containsKey(f.dictId))
          throw Fail
      }

    /** One data RecordBatch. */
    def recordBatch(mfb: Fb, rb: Int, bodyStart: Long,
        bodyLen: Long): Unit = {
      bodyBytes += bodyLen
      nBatches += 1
      if (allKnown)
        totalRows += walkBatch(mfb, rb, bodyStart, bodyLen, fields,
          sums, id => dictSizes.get(id))
      else {
        val lenPos = mfb.field(rb, 0)
        val rows = if (lenPos == 0) 0L else mfb.i64(lenPos)
        if (rows < 0 || rows > limit) throw Fail
        meldCodec(batchCodec(mfb, rb))
        totalRows += rows
      }
    }

    def meta(version: Int): ArrowMeta =
      ArrowMeta(version, fields, nBatches, totalRows, bodyBytes, sums,
        codecName,
        fields.map(f => if (f.family == "dict")
          Some(dictSizes.get(f.dictId)) else None),
        fields.map(f => if (f.family == "dict")
          Some(dictChars.get(f.dictId)) else None))
  }

  // ------------------------------------------------------------------
  // file walk

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Census one Arrow IPC file; None on any violation. */
  private[graft] def parseArrow(b: Array[Byte]): Option[ArrowMeta] = {
    if (b == null || b.length < 24) return None
    if (b(0) != 'A' || b(1) != 'R' || b(2) != 'R' || b(3) != 'O' ||
        b(4) != 'W' || b(5) != '1') return None
    try {
      val n = b.length
      if (b(6) != 0 || b(7) != 0) throw Fail
      if (b(n - 6) != 'A' || b(n - 5) != 'R' || b(n - 4) != 'R' ||
          b(n - 3) != 'O' || b(n - 2) != 'W' || b(n - 1) != '1') throw Fail
      val flen = u32le(b, n - 10)
      if (flen < 1 || flen > n - 18L) throw Fail
      val fStart = n - 10 - flen.toInt
      val fb = new Fb(b, fStart, n - 10)
      val footer = fb.root
      val vPos = fb.field(footer, 0)
      val version = if (vPos == 0) 0 else fb.u16(vPos)
      val schemaPos = fb.field(footer, 1)
      if (schemaPos == 0) throw Fail
      val fields = readSchema(fb, fb.indirect(schemaPos))
      val dictPos = fb.field(footer, 2)
      val (dblk0, nDicts) =
        if (dictPos == 0) (0, 0) else fb.vec(dictPos, 24)
      if (nDicts > 4096) throw Fail
      val rbPos = fb.field(footer, 3)
      val (blk0, nBlocks) =
        if (rbPos == 0) (0, 0) else fb.vec(rbPos, 24)
      if (nBlocks > 65536) throw Fail
      // the leading Schema message must agree with the footer
      val (ht0, hdr0, bl0, sfb) = readMessage(b, 8, fStart)
      if (ht0 != 1 || bl0 != 0) throw Fail // Schema
      val streamFields = readSchema(sfb, hdr0)
      if (!java.util.Arrays.equals(
          streamFields.asInstanceOf[Array[AnyRef]],
          fields.asInstanceOf[Array[AnyRef]])) throw Fail
      val walk = new Walk(b, fStart.toLong, fields)
      /** Validate one footer Block and return its message pieces. */
      def readBlock(base: Int, k: Int): (Long, Int, Long, Int, Int, Fb) = {
        val bp = base + 24 * k
        val off = fb.i64(bp)
        val metaLen = fb.i32(bp + 8)
        val bodyLen = fb.i64(bp + 16)
        // bound each term before summing: a crafted huge offset or
        // body length would wrap the Long sum and slip past a
        // combined check (the ExifLake int-wrap lesson, 64-bit form)
        if (off < 8 || off > fStart || metaLen < 8 ||
            metaLen > fStart - off ||
            bodyLen < 0 || bodyLen > fStart - off - metaLen) throw Fail
        val (ht, hdr, mBody, mfb) =
          readMessage(b, off.toInt, off.toInt + metaLen)
        if (mBody != bodyLen) throw Fail
        (off, metaLen, bodyLen, ht, hdr, mfb)
      }
      // dictionary batches FIRST: id -> (size, total value chars)
      var dk = 0
      while (dk < nDicts) {
        val (off, metaLen, bodyLen, ht, hdr, mfb) = readBlock(dblk0, dk)
        if (ht != 2) throw Fail // DictionaryBatch
        walk.dictionaryBatch(mfb, hdr, off + metaLen, bodyLen)
        dk += 1
      }
      walk.requireDicts()
      var k = 0
      while (k < nBlocks) {
        val (off, metaLen, bodyLen, ht, rb, mfb) = readBlock(blk0, k)
        if (ht != 3) throw Fail // RecordBatch
        walk.recordBatch(mfb, rb, off + metaLen, bodyLen)
        k += 1
      }
      if (walk.nBatches != nBlocks) throw Fail
      Some(walk.meta(version))
    } catch { case Fail => None }
  }

  // ------------------------------------------------------------------
  // stream walk (`.arrows` — the IPC STREAMING format: no magic, no
  // footer; an encapsulated Schema message, dictionary batches, data
  // batches, then the 8-byte end-of-stream marker)

  private[graft] def parseArrowStream(b: Array[Byte]): Option[ArrowMeta] = {
    if (b == null || b.length < 16) return None
    // the stream form begins directly with the continuation marker
    if (b(0) != -1 || b(1) != -1 || b(2) != -1 || b(3) != -1) return None
    try {
      val n = b.length
      val (ht0, hdr0, bl0, sfb) = readMessage(b, 0, n)
      if (ht0 != 1 || bl0 != 0) throw Fail // Schema first
      // the Message's own version field (the stream has no footer)
      val msg0 = sfb.root
      val vPos = sfb.field(msg0, 0)
      val version = if (vPos == 0) 0 else sfb.u16(vPos)
      val fields = readSchema(sfb, hdr0)
      val walk = new Walk(b, n.toLong, fields)
      var off = 8L + (sfb.end - sfb.base)
      var seenRecord = false
      var eos = false
      while (!eos) {
        // the stream must CLOSE with the EOS marker — a blob that
        // just stops mid-air is a truncation, not a census subject
        if (off + 8 > n) throw Fail
        def i32At(p: Int): Int =
          (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
            ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
        if (i32At(off.toInt) != -1) throw Fail
        if (i32At(off.toInt + 4) == 0) {
          eos = true
          off += 8
        } else {
          val (ht, hdr, bodyLen, mfb) = readMessage(b, off.toInt, n)
          val metaLen = 8L + (mfb.end - mfb.base)
          val bodyStart = off + metaLen
          if (bodyLen > n - bodyStart) throw Fail
          ht match {
            case 2 =>
              // dictionaries precede the data they encode; once data
              // has begun, only DELTA batches (appends to an already
              // defined id) are legal arrivals
              val wasDelta =
                walk.dictionaryBatch(mfb, hdr, bodyStart, bodyLen)
              if (seenRecord && !wasDelta) throw Fail
            case 3 =>
              if (!seenRecord) walk.requireDicts()
              seenRecord = true
              walk.recordBatch(mfb, rb = hdr, bodyStart, bodyLen)
            case _ => throw Fail
          }
          // bodies are 8-aligned on the wire
          off = bodyStart + ((bodyLen + 7) / 8 * 8)
        }
      }
      if (off != n) throw Fail // nothing after EOS
      if (!seenRecord) walk.requireDicts()
      Some(walk.meta(version))
    } catch { case Fail => None }
  }

  // ==================================================================
  // flatbuffers builder (back-to-front, the canonical algorithm)

  private[graft] final class FbB {
    private var buf = new Array[Byte](1 << 12)
    private var head = buf.length
    private def ensure(n: Int): Unit =
      if (head < n) {
        val bigger = new Array[Byte](buf.length * 2 + n)
        System.arraycopy(buf, 0, bigger, bigger.length - buf.length,
          buf.length)
        head += bigger.length - buf.length
        buf = bigger
      }
    def offset: Int = buf.length - head
    private def push(n: Int): Int = { ensure(n); head -= n; head }
    def pad(n: Int): Unit = {
      val p = push(n)
      java.util.Arrays.fill(buf, p, p + n, 0.toByte)
    }
    /** Align so the NEXT `size`-byte write (followed by
      * `additional` bytes already planned) lands aligned. */
    def prep(size: Int, additional: Int): Unit =
      while ((offset + additional) % size != 0) pad(1)
    def putU8(v: Int): Unit = { val p = push(1); buf(p) = v.toByte }
    def putU16(v: Int): Unit = {
      prep(2, 0)
      val p = push(2)
      buf(p) = v.toByte
      buf(p + 1) = (v >> 8).toByte
    }
    def putI32(v: Int): Unit = {
      prep(4, 0)
      val p = push(4)
      var i = 0
      while (i < 4) { buf(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putI64(v: Long): Unit = {
      prep(8, 0)
      val p = push(8)
      var i = 0
      while (i < 8) { buf(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    /** u32 forward reference to an object at offset-from-end `off`. */
    def putRef(off: Int): Unit = {
      prep(4, 0)
      putI32NoAlign(offset + 4 - off)
    }
    private def putI32NoAlign(v: Int): Unit = {
      val p = push(4)
      var i = 0
      while (i < 4) { buf(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def string(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      prep(4, bytes.length + 1)
      putU8(0) // nul terminator
      val p = push(bytes.length)
      System.arraycopy(bytes, 0, buf, p, bytes.length)
      putI32NoAlign(bytes.length)
      offset
    }
    /** Vector of references: children already built at `offs`. */
    def refVector(offs: Seq[Int]): Int = {
      prep(4, offs.length * 4)
      offs.reverseIterator.foreach(putRef)
      putI32NoAlign(offs.length)
      offset
    }
    /** Raw (no-alignment) scalar writes for struct interiors, where
      * padding is part of the declared struct layout and an implicit
      * prep would corrupt it. */
    def i32Raw(v: Int): Unit = putI32NoAlign(v)
    def i64Raw(v: Long): Unit = {
      val p = push(8)
      var i = 0
      while (i < 8) { buf(p + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    /** Vector of fixed-size structs, elements supplied as a writer
      * callback invoked in REVERSE element order (raw writes only). */
    def structVector(count: Int, elemSize: Int)(
        writeReversed: Int => Unit): Int = {
      prep(8, count * elemSize)
      var i = count - 1
      while (i >= 0) { writeReversed(i); i -= 1 }
      putI32NoAlign(count)
      offset
    }
    // ---- table building
    private var slots: Array[Int] = null
    private var tableStart = 0
    def startTable(nSlots: Int): Unit = {
      slots = new Array[Int](nSlots)
      tableStart = offset
    }
    def slotU8(i: Int, v: Int): Unit = { putU8(v); slots(i) = offset }
    def slotBool(i: Int, v: Boolean): Unit = slotU8(i, if (v) 1 else 0)
    def slotU16(i: Int, v: Int): Unit = { putU16(v); slots(i) = offset }
    def slotI32(i: Int, v: Int): Unit = { putI32(v); slots(i) = offset }
    def slotI64(i: Int, v: Long): Unit = { putI64(v); slots(i) = offset }
    def slotRef(i: Int, off: Int): Unit = { putRef(off); slots(i) = offset }
    def endTable(): Int = {
      prep(4, 0)
      val p = push(4) // soffset placeholder
      val tablePos = offset
      // vtable: slots reversed, then table size, then vtable size
      slots.reverseIterator.foreach { s =>
        putU16NoPrep(if (s == 0) 0 else tablePos - s)
      }
      putU16NoPrep(tablePos - tableStart) // table size incl. soffset
      putU16NoPrep(4 + 2 * slots.length)
      val vtPos = offset
      val so = vtPos - tablePos
      var i = 0
      while (i < 4) { buf(p + i) = ((so >> (8 * i)) & 0xff).toByte; i += 1 }
      slots = null
      tablePos
    }
    private def putU16NoPrep(v: Int): Unit = {
      val p = push(2)
      buf(p) = v.toByte
      buf(p + 1) = (v >> 8).toByte
    }
    def finish(rootOff: Int): Array[Byte] = {
      prep(4, 0)
      putRef(rootOff)
      java.util.Arrays.copyOfRange(buf, head, buf.length)
    }
  }

  // ------------------------------------------------------------------
  // fixture-side flatbuffer assembly for the three message shapes

  private[graft] final case class FixField(
      name: String, nullable: Boolean, family: String, bitWidth: Int,
      dict: Option[(Long, Int)] = None) // (dictionary id, index width)

  private def buildFieldTables(fbb: FbB,
      fields: Seq[FixField]): Seq[Int] =
    fields.map { f =>
      val typeOff = f.family match {
        case "int" =>
          fbb.startTable(2)
          fbb.slotI32(0, f.bitWidth)
          fbb.slotBool(1, true)
          fbb.endTable()
        case "float" =>
          fbb.startTable(1)
          fbb.slotU16(0, if (f.bitWidth == 64) 2 else 1)
          fbb.endTable()
        case _ => // utf8 / bool: empty type tables
          fbb.startTable(0)
          fbb.endTable()
      }
      val typeTag = f.family match {
        case "int" => 2
        case "float" => 3
        case "utf8" => 5
        case "dict" => 5 // the dictionary VALUE type is Utf8
        case _ => 6
      }
      // DictionaryEncoding table (slot 4): id + signed index type
      val dictOff = f.dict.map { case (id, idxWidth) =>
        fbb.startTable(2)
        fbb.slotI32(0, idxWidth)
        fbb.slotBool(1, true)
        val idxType = fbb.endTable()
        fbb.startTable(4)
        fbb.slotI64(0, id)
        fbb.slotRef(1, idxType)
        fbb.endTable()
      }
      val nameOff = fbb.string(f.name)
      val childrenOff = fbb.refVector(Nil)
      fbb.startTable(6)
      fbb.slotRef(0, nameOff)
      if (f.nullable) fbb.slotBool(1, true)
      fbb.slotU8(2, typeTag)
      fbb.slotRef(3, typeOff)
      dictOff.foreach(d => fbb.slotRef(4, d))
      fbb.slotRef(5, childrenOff)
      fbb.endTable()
    }

  private def buildSchemaTable(fbb: FbB, fields: Seq[FixField]): Int = {
    val fieldOffs = buildFieldTables(fbb, fields)
    val vecOff = fbb.refVector(fieldOffs)
    fbb.startTable(2)
    fbb.slotRef(1, vecOff)
    fbb.endTable()
  }

  /** Message flatbuffer bytes for a Schema header. */
  private[graft] def schemaMessage(fields: Seq[FixField]): Array[Byte] = {
    val fbb = new FbB
    val schemaOff = buildSchemaTable(fbb, fields)
    fbb.startTable(4)
    fbb.slotU16(0, 4) // MetadataVersion V5
    fbb.slotU8(1, 1) // header type: Schema
    fbb.slotRef(2, schemaOff)
    val msg = fbb.endTable()
    fbb.finish(msg)
  }

  /** RecordBatch TABLE (shared by data and dictionary messages);
    * `comp` is -1 none / 0 LZ4_FRAME / 1 ZSTD. */
  private def buildRecordBatchTable(fbb: FbB, rows: Long,
      nodes: Seq[(Long, Long)], buffers: Seq[(Long, Long)],
      comp: Int): Int = {
    val compOff =
      if (comp < 0) -1
      else {
        fbb.startTable(2)
        if (comp != 0) fbb.slotU8(0, comp)
        fbb.endTable()
      }
    val bufVec = fbb.structVector(buffers.length, 16) { i =>
      fbb.i64Raw(buffers(i)._2) // reversed within the struct too:
      fbb.i64Raw(buffers(i)._1) // length pushed first => offset first
    }
    val nodeVec = fbb.structVector(nodes.length, 16) { i =>
      fbb.i64Raw(nodes(i)._2)
      fbb.i64Raw(nodes(i)._1)
    }
    fbb.startTable(4)
    fbb.slotI64(0, rows)
    fbb.slotRef(1, nodeVec)
    fbb.slotRef(2, bufVec)
    if (compOff >= 0) fbb.slotRef(3, compOff)
    fbb.endTable()
  }

  /** RecordBatch message flatbuffer; buffers laid out by the caller. */
  private[graft] def recordBatchMessage(rows: Long,
      nodes: Seq[(Long, Long)], buffers: Seq[(Long, Long)],
      bodyLen: Long, comp: Int = -1): Array[Byte] = {
    val fbb = new FbB
    val rb = buildRecordBatchTable(fbb, rows, nodes, buffers, comp)
    fbb.startTable(4)
    fbb.slotU16(0, 4)
    fbb.slotU8(1, 3) // RecordBatch
    fbb.slotRef(2, rb)
    fbb.slotI64(3, bodyLen)
    val msg = fbb.endTable()
    fbb.finish(msg)
  }

  /** DictionaryBatch message: id + the values' RecordBatch; isDelta
    * marks an APPEND to an earlier batch for the same id. */
  private[graft] def dictionaryBatchMessage(id: Long, rows: Long,
      nodes: Seq[(Long, Long)], buffers: Seq[(Long, Long)],
      bodyLen: Long, comp: Int = -1,
      isDelta: Boolean = false): Array[Byte] = {
    val fbb = new FbB
    val rb = buildRecordBatchTable(fbb, rows, nodes, buffers, comp)
    fbb.startTable(3)
    fbb.slotI64(0, id)
    fbb.slotRef(1, rb)
    if (isDelta) fbb.slotU8(2, 1)
    val db = fbb.endTable()
    fbb.startTable(4)
    fbb.slotU16(0, 4)
    fbb.slotU8(1, 2) // DictionaryBatch
    fbb.slotRef(2, db)
    fbb.slotI64(3, bodyLen)
    val msg = fbb.endTable()
    fbb.finish(msg)
  }

  private[graft] def footerFlatbuffer(fields: Seq[FixField],
      blocks: Seq[(Long, Int, Long)],
      dictBlocks: Seq[(Long, Int, Long)] = Nil): Array[Byte] = {
    val fbb = new FbB
    val schemaOff = buildSchemaTable(fbb, fields)
    val blockVec = fbb.structVector(blocks.length, 24) { i =>
      fbb.i64Raw(blocks(i)._3)
      fbb.i32Raw(0) // struct padding after metaDataLength
      fbb.i32Raw(blocks(i)._2)
      fbb.i64Raw(blocks(i)._1)
    }
    val dictVec = fbb.structVector(dictBlocks.length, 24) { i =>
      fbb.i64Raw(dictBlocks(i)._3)
      fbb.i32Raw(0)
      fbb.i32Raw(dictBlocks(i)._2)
      fbb.i64Raw(dictBlocks(i)._1)
    }
    fbb.startTable(4)
    fbb.slotU16(0, 4)
    fbb.slotRef(1, schemaOff)
    fbb.slotRef(2, dictVec)
    fbb.slotRef(3, blockVec)
    val ft = fbb.endTable()
    fbb.finish(ft)
  }

  /** Wrap a message flatbuffer in the encapsulation (continuation,
    * length, 8-byte padding); returns the padded metadata block. */
  private[graft] def encapsulate(msg: Array[Byte]): Array[Byte] = {
    val padded = (msg.length + 7) / 8 * 8
    val out = new Array[Byte](8 + padded)
    out(0) = -1; out(1) = -1; out(2) = -1; out(3) = -1
    (0 until 4).foreach(j => out(4 + j) = ((padded >> (8 * j)) & 0xff)
      .toByte)
    System.arraycopy(msg, 0, out, 8, msg.length)
    out
  }

  /** Raw (uncompressed) buffers of one column: [validity(empty),
    * data] or [validity, offsets, data] for strings. */
  private def rawColumnBuffers(f: FixField, vals: Array[Long],
      rows: Int): Seq[Array[Byte]] = {
    def le(v: Long, w: Int): Array[Byte] =
      Array.tabulate(w)(j => ((v >> (8 * j)) & 0xff).toByte)
    f.family match {
      case "int" =>
        Seq(Array.emptyByteArray,
          vals.take(rows).flatMap(le(_, 8)))
      case "float" =>
        Seq(Array.emptyByteArray, vals.take(rows).flatMap(v =>
          le(java.lang.Double.doubleToLongBits(v.toDouble / 2.0), 8)))
      case "dict" =>
        val w = f.dict.get._2 / 8
        Seq(Array.emptyByteArray, vals.take(rows).flatMap(le(_, w)))
      case "utf8" =>
        val strs = vals.take(rows).map(v => s"s$v")
        utf8Buffers(strs)
      case _ => // bool
        val nBytes = (rows + 7) / 8
        val bits = new Array[Byte](nBytes)
        vals.take(rows).zipWithIndex.foreach { case (v, i) =>
          if ((v & 1) != 0)
            bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
        }
        Seq(Array.emptyByteArray, bits)
    }
  }

  private def utf8Buffers(strs: Seq[String]): Seq[Array[Byte]] = {
    val offs = new java.io.ByteArrayOutputStream()
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0
    (0 until 4).foreach(_ => offs.write(0))
    strs.foreach { s =>
      val sb = s.getBytes("UTF-8")
      data.write(sb, 0, sb.length)
      acc += sb.length
      (0 until 4).foreach(j => offs.write((acc >> (8 * j)) & 0xff))
    }
    Seq(Array.emptyByteArray, offs.toByteArray, data.toByteArray)
  }

  /** Lay one batch body out; with a codec every non-empty buffer is
    * framed [i64 uncompressed length][compressed frame]. */
  private def layBody(raw: Seq[Array[Byte]],
      comp: Int): (Array[Byte], Seq[(Long, Long)]) = {
    val body = new java.io.ByteArrayOutputStream()
    val buffers = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def pad8(): Unit = while (body.size % 8 != 0) body.write(0)
    raw.foreach { rb =>
      val start = body.size.toLong
      if (rb.isEmpty) buffers += ((start, 0L))
      else if (comp < 0) {
        body.write(rb, 0, rb.length)
        buffers += ((start, rb.length.toLong))
      } else {
        val bos = new java.io.ByteArrayOutputStream()
        val st: java.io.OutputStream =
          if (comp == 0) new net.jpountz.lz4.LZ4FrameOutputStream(bos)
          else new com.github.luben.zstd.ZstdOutputStream(bos, 3)
        st.write(rb); st.close()
        val frame = bos.toByteArray
        (0 until 8).foreach(j =>
          body.write(((rb.length.toLong >> (8 * j)) & 0xff).toInt))
        body.write(frame, 0, frame.length)
        buffers += ((start, 8L + frame.length))
      }
      pad8()
    }
    (body.toByteArray, buffers.toSeq)
  }

  /** Write a complete IPC file: int64/float64/utf8/bool plus
    * dictionary-encoded utf8 columns (`dicts` maps dictionary id →
    * values; dict-field data arrays carry INDICES), optionally with
    * per-buffer LZ4-frame (0) / zstd (1) body compression. */
  /** Schema + dictionary batches + data batches + EOS into `out`;
    * returns the (data blocks, dictionary blocks) for a file footer.
    * This IS the stream form when `out` starts empty. */
  private def writeIpcBody(out: java.io.ByteArrayOutputStream,
      fields: Seq[FixField], batches: Seq[Map[String, Array[Long]]],
      batchRows: Seq[Int], dicts: Map[Long, Seq[String]],
      comp: Int,
      dictSplit: Map[Long, Int]): (Seq[(Long, Int, Long)], Seq[(Long, Int, Long)]) = {
    val schemaEnc = encapsulate(schemaMessage(fields))
    out.write(schemaEnc, 0, schemaEnc.length)
    // dictionary batches first (readers need them before the data);
    // a dictSplit entry ships that id as an initial batch of its
    // first k values plus a DELTA batch carrying the rest
    val dictBlocks =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    dicts.toSeq.sortBy(_._1).foreach { case (id, values) =>
      val k = dictSplit.getOrElse(id, 0)
      val pieces =
        if (k > 0 && k < values.length)
          Seq((values.take(k), false), (values.drop(k), true))
        else Seq((values, false))
      pieces.foreach { case (vs, delta) =>
        val (bodyBytes, buffers) = layBody(utf8Buffers(vs), comp)
        val meta = encapsulate(dictionaryBatchMessage(id,
          vs.length.toLong, Seq((vs.length.toLong, 0L)), buffers,
          bodyBytes.length.toLong, comp, isDelta = delta))
        dictBlocks += ((out.size.toLong, meta.length,
          bodyBytes.length.toLong))
        out.write(meta, 0, meta.length)
        out.write(bodyBytes, 0, bodyBytes.length)
      }
    }
    val blocks =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    batches.zip(batchRows).foreach { case (data, rows) =>
      val raw = fields.flatMap(f =>
        rawColumnBuffers(f, data(f.name), rows))
      val (bodyBytes, buffers) = layBody(raw, comp)
      val nodes = fields.map(_ => (rows.toLong, 0L))
      val meta = encapsulate(recordBatchMessage(rows.toLong, nodes,
        buffers, bodyBytes.length.toLong, comp))
      blocks += ((out.size.toLong, meta.length, bodyBytes.length.toLong))
      out.write(meta, 0, meta.length)
      out.write(bodyBytes, 0, bodyBytes.length)
    }
    // EOS marker
    out.write(-1); out.write(-1); out.write(-1); out.write(-1)
    out.write(0); out.write(0); out.write(0); out.write(0)
    (blocks.toSeq, dictBlocks.toSeq)
  }

  /** Write a complete IPC FILE (magic + body + footer + magic). */
  private[graft] def encodeArrowExt(fields: Seq[FixField],
      batches: Seq[Map[String, Array[Long]]], batchRows: Seq[Int],
      dicts: Map[Long, Seq[String]] = Map.empty,
      comp: Int = -1,
      dictSplit: Map[Long, Int] = Map.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("ARROW1".getBytes("US-ASCII"))
    out.write(0); out.write(0)
    val (blocks, dictBlocks) =
      writeIpcBody(out, fields, batches, batchRows, dicts, comp,
        dictSplit)
    val footer = footerFlatbuffer(fields, blocks, dictBlocks)
    out.write(footer, 0, footer.length)
    (0 until 4).foreach(j => out.write((footer.length >> (8 * j)) & 0xff))
    out.write("ARROW1".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** Write the IPC STREAM form (`.arrows`): the body alone. */
  private[graft] def encodeArrowStream(fields: Seq[FixField],
      batches: Seq[Map[String, Array[Long]]], batchRows: Seq[Int],
      dicts: Map[Long, Seq[String]] = Map.empty,
      comp: Int = -1,
      dictSplit: Map[Long, Int] = Map.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeIpcBody(out, fields, batches, batchRows, dicts, comp, dictSplit)
    out.toByteArray
  }

  /** Write a complete IPC file: int64/float64/utf8/bool columns with
    * law-driven content across `batchRows` batches. */
  private[graft] def encodeArrow(fields: Seq[FixField],
      batches: Seq[Map[String, Array[Long]]],
      batchRows: Seq[Int]): Array[Byte] =
    encodeArrowExt(fields, batches, batchRows)

  // ==================================================================
  // DataFrame surface + fixture (q228)

  /** One row per (file, field). */
  def extractArrow(df: org.apache.spark.sql.DataFrame, idCol: String,
      binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("version", IntegerType, true),
      StructField("n_fields", IntegerType, true),
      StructField("field", IntegerType, true),
      StructField("name", StringType, true),
      StructField("nullable", BooleanType, true),
      StructField("family", StringType, true),
      StructField("bit_width", IntegerType, true),
      StructField("n_batches", IntegerType, true),
      StructField("total_rows", LongType, true),
      StructField("body_bytes", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val media = r.getAs[Array[Byte]](1)
        scala.util.Try(parseArrow(media)).toOption.flatten match {
          case Some(m) =>
            m.fields.iterator.zipWithIndex.map { case (f, fi) =>
              Row(id, m.version, m.fields.length, fi, f.name,
                f.nullable, f.family,
                if (f.bitWidth == 0) null else Int.box(f.bitWidth),
                m.nBatches, m.totalRows, m.bodyBytes,
                m.intSums(fi).map(Long.box).orNull, true)
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** File-or-stream census: the 6-byte magic routes to the Feather
    * V2 file walk, anything else tries the stream form. */
  private[graft] def parseArrowAny(b: Array[Byte]): Option[ArrowMeta] =
    if (b != null && b.length >= 6 && b(0) == 'A' && b(1) == 'R' &&
        b(2) == 'R' && b(3) == 'O' && b(4) == 'W' && b(5) == '1')
      parseArrow(b)
    else parseArrowStream(b)

  /** One row per (file, field) with the dictionary/compression
    * facts: family `dict` carries the index width, its dictionary's
    * size and total value chars, and the exact INDEX sum (the
    * content gate); `int` carries the value sum as in q228. Routes
    * both the file and the stream (`.arrows`) forms. */
  def extractArrowDict(df: org.apache.spark.sql.DataFrame,
      idCol: String, binCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("field", IntegerType, true),
      StructField("name", StringType, true),
      StructField("family", StringType, true),
      StructField("bit_width", IntegerType, true),
      StructField("codec", StringType, true),
      StructField("n_batches", IntegerType, true),
      StructField("total_rows", LongType, true),
      StructField("dict_size", LongType, true),
      StructField("dict_chars", LongType, true),
      StructField("value_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseArrowAny(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(m) =>
            m.fields.iterator.zipWithIndex.map { case (f, fi) =>
              Row(id, fi, f.name, f.family,
                if (f.bitWidth == 0) null else Int.box(f.bitWidth),
                m.codec, m.nBatches, m.totalRows,
                m.dictSizes(fi).map(Long.box).orNull,
                m.dictChars(fi).map(Long.box).orNull,
                m.intSums(fi).map(Long.box).orNull, true)
            }
          case None =>
            Iterator(Row(id, null, null, null, null, null, null, null,
              null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Dictionary/compression fixture laws (file i): codec cycles
    * none/lz4/zstd by i%3; field c0 is a dictionary-encoded string
    * column (id 7, index width 8/16/32/64 by i%4, dictionary size
    * 3+i%3 with values v0..), c1 is int64, and odd files add a plain
    * utf8 c2; 1+i%2 batches of 4+i%3 (+2 for batch 1) rows; indices
    * follow (i+batch+row) % dictSize and int64 values follow
    * i·100 + 10 + batch + row·7, so both sums are closed-form. */
  def arrowDictFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val comp = i % 3 - 1
      val iw = Array(8, 16, 32, 64)(i % 4)
      val ds = 3 + i % 3
      val fields = Seq(
        FixField("c0", nullable = false, "dict", iw, Some((7L, iw))),
        FixField("c1", nullable = true, "int", 64)) ++
        (if (i % 2 == 1)
          Seq(FixField("c2", nullable = false, "utf8", 0))
        else Nil)
      val nBatches = 1 + i % 2
      val batchRows = (0 until nBatches).map(bi => 4 + i % 3 + 2 * bi)
      val batches = batchRows.zipWithIndex.map { case (rows, bi) =>
        fields.map { f =>
          f.name -> (f.family match {
            case "dict" =>
              Array.tabulate(rows)(r => ((i + bi + r) % ds).toLong)
            case _ =>
              Array.tabulate(rows)(r => i * 100L + 10L + bi + r * 7L)
          })
        }.toMap
      }
      val dict = Map(7L -> (0 until ds).map(k => s"v$k"))
      // every fifth file ships the dictionary as an initial batch of
      // its first ceil(ds/2) values plus a DELTA batch with the rest
      // (same totals, so the oracle is unchanged and the delta path
      // sits under the existing hash gate)
      val split =
        if (i % 5 == 0) Map(7L -> ((ds + 1) / 2)) else Map.empty[Long, Int]
      Row(i.toLong,
        encodeArrowExt(fields, batches, batchRows, dict, comp, split))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** The [[arrowDictFixture]] laws in the STREAM form (`.arrows`):
    * identical content (including the i%5==0 delta-split
    * dictionaries), no magic/footer — so the q237 oracle is the q235
    * oracle verbatim and any divergence between the two walks fails
    * the hash gate. */
  def arrowStreamFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0 until n).map { i =>
      val comp = i % 3 - 1
      val iw = Array(8, 16, 32, 64)(i % 4)
      val ds = 3 + i % 3
      val fields = Seq(
        FixField("c0", nullable = false, "dict", iw, Some((7L, iw))),
        FixField("c1", nullable = true, "int", 64)) ++
        (if (i % 2 == 1)
          Seq(FixField("c2", nullable = false, "utf8", 0))
        else Nil)
      val nBatches = 1 + i % 2
      val batchRows = (0 until nBatches).map(bi => 4 + i % 3 + 2 * bi)
      val batches = batchRows.zipWithIndex.map { case (rows, bi) =>
        fields.map { f =>
          f.name -> (f.family match {
            case "dict" =>
              Array.tabulate(rows)(r => ((i + bi + r) % ds).toLong)
            case _ =>
              Array.tabulate(rows)(r => i * 100L + 10L + bi + r * 7L)
          })
        }.toMap
      }
      val dict = Map(7L -> (0 until ds).map(k => s"v$k"))
      val split =
        if (i % 5 == 0) Map(7L -> ((ds + 1) / 2)) else Map.empty[Long, Int]
      Row(i.toLong,
        encodeArrowStream(fields, batches, batchRows, dict, comp,
          split))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Fixture laws (file i): 2+i%3 fields cycling int64 / float64 /
    * utf8 / bool by (i+c)%4 with names c0.., nullable on odd c;
    * 1+i%2 batches of 5+i%4 (+3 for batch 1) rows; int64 values
    * follow v = i*100 + c*10 + batch + row·7 so per-field sums are
    * closed-form; float/utf8/bool derive from the same law. */
  def arrowFixture(spark: org.apache.spark.sql.SparkSession,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val fams = Array(("int", 64), ("float", 64), ("utf8", 0), ("bool", 1))
    val rows = (0 until n).map { i =>
      val nFields = 2 + i % 3
      val fields = (0 until nFields).map { c =>
        val (fam, bw) = fams((i + c) % 4)
        FixField(s"c$c", nullable = c % 2 == 1, fam, bw)
      }
      val nBatches = 1 + i % 2
      val batchRows = (0 until nBatches).map(bi => 5 + i % 4 + 3 * bi)
      val batches = batchRows.zipWithIndex.map { case (rows, bi) =>
        fields.map { f =>
          val c = f.name.drop(1).toInt
          f.name -> Array.tabulate(rows)(r =>
            i * 100L + c * 10L + bi + r * 7L)
        }.toMap
      }
      Row(i.toLong, encodeArrow(fields, batches, batchRows))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
