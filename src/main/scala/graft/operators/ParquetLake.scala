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
      totalCompressed: Long, totalUncompressed: Long, hasDict: Boolean)

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
      dataEnd: Long): PqCol = {
    var ptype = -1
    var codec = -1
    var nValues = -1L
    var tcSize = -1L
    var tuSize = -1L
    var dataOff = -1L
    var dictOff = -1L
    var path: String = null
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 1 => ptype = readI32(tc, typ); true
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
    PqCol(path, ptype, codec, nValues, tcSize, tuSize, hasDict)
  }

  private def readColumnChunk(tc: Tc, depth: Int, dataEnd: Long): PqCol = {
    var col: PqCol = null
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 3 =>
          if (typ != 12) throw Fail
          if (col != null) throw Fail
          col = readColumnMeta(tc, depth + 1, dataEnd)
          true
        case _ => false
      }
    }
    if (col == null) throw Fail // Spark/arrow always embed meta_data
    col
  }

  private def readRowGroup(tc: Tc, depth: Int, dataEnd: Long): PqRowGroup = {
    var cols: Array[PqCol] = null
    var totalBytes = -1L
    var nRows = -1L
    readStruct(tc, depth) { (id, typ) =>
      id match {
        case 1 =>
          if (typ != 9) throw Fail
          val (et, sz) = listHeader(tc)
          if (et != 12 || sz < 1 || sz > 4096) throw Fail
          val a = new Array[PqCol](sz.toInt)
          var i = 0
          while (i < sz) {
            a(i) = readColumnChunk(tc, depth + 1, dataEnd)
            i += 1
          }
          cols = a
          true
        case 2 => totalBytes = readI64(tc, typ); true
        case 3 => nRows = readI64(tc, typ); true
        case _ => false
      }
    }
    if (cols == null || nRows < 0 || totalBytes < 0) throw Fail
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
            while (i < sz) { a(i) = readRowGroup(tc, 1, fStart.toLong); i += 1 }
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
