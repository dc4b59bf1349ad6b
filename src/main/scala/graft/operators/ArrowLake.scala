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
  *  - strict rejects: dictionary-encoded fields, non-empty
  *    dictionary-block lists, body compression, big-endian schemas,
  *    non-RecordBatch blocks.
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
      name: String, nullable: Boolean, family: String, bitWidth: Int)

  private[graft] final case class ArrowMeta(
      version: Int, fields: Array[ArrowField], nBatches: Int,
      totalRows: Long, bodyBytes: Long, intSums: Array[Option[Long]])

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
      if (fb.field(f, 4) != 0) throw Fail // dictionary encoding: out
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
      // the flat subset: known families must be leaves
      if (family != "other" && nChildren != 0) throw Fail
      ArrowField(name, nullable, family, width)
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
      if (dictPos != 0 && fb.vec(dictPos, 24)._2 != 0) throw Fail
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
      val allKnown = fields.forall(_.family != "other")
      var totalRows = 0L
      var bodyBytes = 0L
      val sums = fields.map(f =>
        if (allKnown && f.family == "int" && f.bitWidth == 64) Some(0L)
        else None: Option[Long])
      var k = 0
      while (k < nBlocks) {
        val bp = blk0 + 24 * k
        val off = fb.i64(bp)
        val metaLen = fb.i32(bp + 8)
        val bodyLen = fb.i64(bp + 16)
        // bound each term before summing: a crafted huge offset or
        // body length would wrap the Long sum and slip past a
        // combined check (the ExifLake int-wrap lesson, 64-bit form)
        if (off < 8 || off > fStart || metaLen < 8 ||
            metaLen > fStart - off ||
            bodyLen < 0 || bodyLen > fStart - off - metaLen) throw Fail
        val (ht, rb, mBody, mfb) =
          readMessage(b, off.toInt, off.toInt + metaLen)
        if (ht != 3) throw Fail // RecordBatch
        if (mBody != bodyLen) throw Fail
        val lenPos = mfb.field(rb, 0)
        val rows = if (lenPos == 0) 0L else mfb.i64(lenPos)
        // a batch cannot hold more fixed-width rows than the file has
        // bytes — rejecting implausible counts up front keeps the
        // size-law products below (rows * width, (rows+1) * 4) from
        // wrapping Long and passing vacuously
        if (rows < 0 || rows > fStart) throw Fail
        if (mfb.field(rb, 3) != 0) throw Fail // compression: out
        totalRows += rows
        bodyBytes += bodyLen
        if (allKnown) {
          val (nd0, nNodes) = mfb.vec(mfb.field(rb, 1), 16)
          if (nNodes != fields.length) throw Fail
          val (bf0, nBufs) = mfb.vec(mfb.field(rb, 2), 16)
          val expBufs = fields.map(f =>
            if (f.family == "utf8") 3 else 2).sum
          if (nBufs != expBufs) throw Fail
          val bodyStart = off + metaLen
          var bi = 0
          var fi = 0
          while (fi < fields.length) {
            val f = fields(fi)
            val nodeLen = mfb.i64(nd0 + 16 * fi)
            val nullCount = mfb.i64(nd0 + 16 * fi + 8)
            if (nodeLen != rows || nullCount < 0 || nullCount > rows)
              throw Fail
            val nPer = if (f.family == "utf8") 3 else 2
            // buffer extents inside the body
            val exts = Array.tabulate(nPer) { j =>
              val o = mfb.i64(bf0 + 16 * (bi + j))
              val l = mfb.i64(bf0 + 16 * (bi + j) + 8)
              if (o < 0 || l < 0 || o + l > bodyLen) throw Fail
              (o, l)
            }
            // data-buffer size laws
            f.family match {
              case "int" | "float" =>
                if (exts(1)._2 < rows * (f.bitWidth / 8)) throw Fail
              case "bool" =>
                if (exts(1)._2 < (rows + 7) / 8) throw Fail
              case "utf8" =>
                if (rows > 0 && exts(1)._2 < (rows + 1) * 4) throw Fail
              case _ =>
            }
            if (f.family == "int" && f.bitWidth == 64 && nullCount != 0)
              sums(fi) = None // nulls present: the sum is out of scope
            else if (f.family == "int" && f.bitWidth == 64) {
              val dataOff = (bodyStart + exts(1)._1).toInt
              var r = 0L
              var s = 0L
              while (r < rows) {
                val p = dataOff + 8 * r.toInt
                if (p + 8 > fStart) throw Fail
                var v = 0L
                var j = 7
                while (j >= 0) { v = (v << 8) | (b(p + j) & 0xffL); j -= 1 }
                s += v
                r += 1
              }
              sums(fi) = sums(fi).map(_ + s)
            }
            bi += nPer
            fi += 1
          }
        }
        k += 1
      }
      Some(ArrowMeta(version, fields, nBlocks, totalRows, bodyBytes,
        sums))
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
      name: String, nullable: Boolean, family: String, bitWidth: Int)

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
        case _ => 6
      }
      val nameOff = fbb.string(f.name)
      val childrenOff = fbb.refVector(Nil)
      fbb.startTable(6)
      fbb.slotRef(0, nameOff)
      if (f.nullable) fbb.slotBool(1, true)
      fbb.slotU8(2, typeTag)
      fbb.slotRef(3, typeOff)
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

  /** RecordBatch message flatbuffer; buffers laid out by the caller. */
  private[graft] def recordBatchMessage(rows: Long,
      nodes: Seq[(Long, Long)], buffers: Seq[(Long, Long)],
      bodyLen: Long): Array[Byte] = {
    val fbb = new FbB
    val bufVec = fbb.structVector(buffers.length, 16) { i =>
      fbb.i64Raw(buffers(i)._2) // reversed within the struct too:
      fbb.i64Raw(buffers(i)._1) // length pushed first => offset first
    }
    val nodeVec = fbb.structVector(nodes.length, 16) { i =>
      fbb.i64Raw(nodes(i)._2)
      fbb.i64Raw(nodes(i)._1)
    }
    fbb.startTable(3)
    fbb.slotI64(0, rows)
    fbb.slotRef(1, nodeVec)
    fbb.slotRef(2, bufVec)
    val rb = fbb.endTable()
    fbb.startTable(4)
    fbb.slotU16(0, 4)
    fbb.slotU8(1, 3) // RecordBatch
    fbb.slotRef(2, rb)
    fbb.slotI64(3, bodyLen)
    val msg = fbb.endTable()
    fbb.finish(msg)
  }

  private[graft] def footerFlatbuffer(fields: Seq[FixField],
      blocks: Seq[(Long, Int, Long)]): Array[Byte] = {
    val fbb = new FbB
    val schemaOff = buildSchemaTable(fbb, fields)
    val blockVec = fbb.structVector(blocks.length, 24) { i =>
      fbb.i64Raw(blocks(i)._3)
      fbb.i32Raw(0) // struct padding after metaDataLength
      fbb.i32Raw(blocks(i)._2)
      fbb.i64Raw(blocks(i)._1)
    }
    val emptyDict = fbb.structVector(0, 24)(_ => ())
    fbb.startTable(4)
    fbb.slotU16(0, 4)
    fbb.slotRef(1, schemaOff)
    fbb.slotRef(2, emptyDict)
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

  /** Write a complete IPC file: int64/float64/utf8/bool columns with
    * law-driven content across `batchRows` batches. */
  private[graft] def encodeArrow(fields: Seq[FixField],
      batches: Seq[Map[String, Array[Long]]],
      batchRows: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("ARROW1".getBytes("US-ASCII"))
    out.write(0); out.write(0)
    out.write(encapsulate(schemaMessage(fields)), 0,
      encapsulate(schemaMessage(fields)).length)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    batches.zip(batchRows).foreach { case (data, rows) =>
      // body: per field [validity(empty), data] / [validity, offsets,
      // data] for utf8 — all zero-null so validity buffers are empty
      val body = new java.io.ByteArrayOutputStream()
      val buffers = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val nodes = fields.map(_ => (rows.toLong, 0L))
      def pad8(): Unit = while (body.size % 8 != 0) body.write(0)
      fields.foreach { f =>
        buffers += ((body.size.toLong, 0L)) // empty validity
        f.family match {
          case "int" =>
            val vals = data(f.name)
            val start = body.size
            vals.take(rows).foreach { v =>
              (0 until 8).foreach(j => body.write(((v >> (8 * j)) & 0xff)
                .toInt))
            }
            buffers += ((start.toLong, 8L * rows))
            pad8()
          case "float" =>
            val vals = data(f.name)
            val start = body.size
            vals.take(rows).foreach { v =>
              val bits =
                java.lang.Double.doubleToLongBits(v.toDouble / 2.0)
              (0 until 8).foreach(j =>
                body.write(((bits >> (8 * j)) & 0xff).toInt))
            }
            buffers += ((start.toLong, 8L * rows))
            pad8()
          case "utf8" =>
            val vals = data(f.name)
            val strs = vals.take(rows).map(v => s"s$v")
            val offStart = body.size
            var acc = 0
            body.write(0); body.write(0); body.write(0); body.write(0)
            strs.foreach { s =>
              acc += s.getBytes("UTF-8").length
              (0 until 4).foreach(j => body.write((acc >> (8 * j)) & 0xff))
            }
            buffers += ((offStart.toLong, 4L * (rows + 1)))
            pad8()
            val dataStart = body.size
            strs.foreach(s => body.write(s.getBytes("UTF-8"), 0,
              s.getBytes("UTF-8").length))
            buffers += ((dataStart.toLong, acc.toLong))
            pad8()
          case _ => // bool
            val vals = data(f.name)
            val start = body.size
            val nBytes = (rows + 7) / 8
            val bits = new Array[Byte](nBytes)
            vals.take(rows).zipWithIndex.foreach { case (v, i) =>
              if ((v & 1) != 0)
                bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
            }
            body.write(bits, 0, nBytes)
            buffers += ((start.toLong, nBytes.toLong))
            pad8()
        }
      }
      val bodyBytes = body.toByteArray
      val meta = encapsulate(recordBatchMessage(rows.toLong, nodes,
        buffers.toSeq, bodyBytes.length.toLong))
      blocks += ((out.size.toLong, meta.length, bodyBytes.length.toLong))
      out.write(meta, 0, meta.length)
      out.write(bodyBytes, 0, bodyBytes.length)
    }
    // EOS marker
    out.write(-1); out.write(-1); out.write(-1); out.write(-1)
    out.write(0); out.write(0); out.write(0); out.write(0)
    val footer = footerFlatbuffer(fields, blocks.toSeq)
    out.write(footer, 0, footer.length)
    (0 until 4).foreach(j => out.write((footer.length >> (8 * j)) & 0xff))
    out.write("ARROW1".getBytes("US-ASCII"))
    out.toByteArray
  }

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
