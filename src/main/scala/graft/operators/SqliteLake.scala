package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQLite database-file extraction (the sqlite.org file-format spec,
  * "Database File Format" — how application data, browser profiles
  * and mobile dumps arrive in a scraped corpus). A real pager +
  * B-tree reader: the 100-byte header, table B-trees (interior page
  * type 5 / leaf type 13) walked in rowid order from `sqlite_master`
  * on page 1, SQLite's big-endian varints, and the record format's
  * serial-type system.
  *
  * Closed subset (strict — reject, never guess):
  *  - header: magic `SQLite format 3` + NUL; page size a power of
  *    two in [512, 32768] (the 1→65536 alias is out of subset);
  *    legacy file format 1/1; reserved-space 0; payload fractions
  *    64/32/32; header db-size × page-size == file length; no
  *    freelist, no auto-vacuum, no incremental vacuum; text
  *    encoding 1 (UTF-8); bytes 72-91 zero;
  *  - B-trees: table pages only; freeblock offset and fragmented
  *    count 0 (freshly written subset); strictly ascending rowids
  *    in traversal order with the interior-key law (every cell key
  *    bounds its left subtree); per-walk page-visit set + depth ≤ 32
  *    (cycle guard); cell pointers inside the page;
  *  - cells: payload ≤ usable − 35 (overflow chains out of subset),
  *    record header/body consumed EXACTLY; serial types NULL(0),
  *    i8..i64(1-6), f64(7, finite, big-endian), const 0/1 (8/9),
  *    TEXT(odd ≥ 13, strict UTF-8, no C0 controls); reserved 10/11
  *    and BLOBs (even ≥ 12) are out of subset;
  *  - `sqlite_master` rows must be (type,name,tbl_name,rootpage,sql)
  *    with type='table', nonempty unique names, rootpage in range.
  *
  * Emits one row per (table row, column) — the per-cell grain — so
  * the oracle hash gates every decoded value and serial-size class.
  * One blob = one task-local walk (codec-family plan shape).
  */
object SqliteLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class Cell(
      kind: String, lval: Option[Long], sval: Option[String],
      dval: Option[Double])
  private[graft] final case class Rec(rowid: Long, cells: Seq[Cell])
  private[graft] final case class SqliteDb(
      pageSize: Int, nPages: Int, tables: Seq[(String, Seq[Rec])])

  private def u16(b: Array[Byte], o: Int): Int = {
    if (o < 0 || o + 2 > b.length) throw Fail
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Int): Long = {
    if (o < 0 || o + 4 > b.length) throw Fail
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  }

  /** SQLite varint: 1-9 bytes, big-endian 7-bit groups, 9th byte
    * carries 8 bits. Returns (value, bytesConsumed). */
  private def varint(b: Array[Byte], o: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 9) {
      if (o + i >= b.length) throw Fail
      val x = b(o + i) & 0xff
      if (i == 8) return ((v << 8) | x, 9)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    throw Fail
  }

  private[graft] def beInt(b: Array[Byte], o: Int, n: Int): Long = {
    if (o < 0 || o + n > b.length) throw Fail
    var v: Long = if ((b(o) & 0x80) != 0) -1L else 0L // sign-extend
    var i = 0
    while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  private def utf8(b: Array[Byte], o: Int, n: Int): String = {
    if (o < 0 || n < 0 || o + n > b.length) throw Fail
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(b, o, n)).toString
      catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
    if (s.exists(_ < 0x20)) throw Fail
    s
  }

  /** Decode one record (payload [off, off+len)); exact-consumption law. */
  private def record(b: Array[Byte], off: Int, len: Int): Seq[Cell] = {
    if (off < 0 || len < 0 || off + len > b.length) throw Fail
    val (hdrLen, hn) = varint(b, off)
    if (hdrLen < hn || hdrLen > len) throw Fail
    // serial types fill the header exactly
    val stypes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var p = off + hn
    val hdrEnd = off + hdrLen.toInt
    while (p < hdrEnd) {
      val (st, n) = varint(b, p)
      p += n
      if (p > hdrEnd) throw Fail
      stypes += st
    }
    var q = hdrEnd
    val bodyEnd = off + len
    val cells = stypes.map { st =>
      st match {
        case 0 => Cell("null", None, None, None)
        case 1 | 2 | 3 | 4 | 5 | 6 =>
          val n = st match {
            case 1 => 1; case 2 => 2; case 3 => 3
            case 4 => 4; case 5 => 6; case 6 => 8
          }
          if (q + n > bodyEnd) throw Fail
          val v = beInt(b, q, n); q += n
          Cell("int", Some(v), None, None)
        case 7 =>
          if (q + 8 > bodyEnd) throw Fail
          var bits = 0L
          var i = 0
          while (i < 8) { bits = (bits << 8) | (b(q + i) & 0xffL); i += 1 }
          q += 8
          val d = java.lang.Double.longBitsToDouble(bits)
          if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
            throw Fail
          Cell("real", None, None, Some(d))
        case 8 => Cell("int", Some(0L), None, None)
        case 9 => Cell("int", Some(1L), None, None)
        case st if st >= 13 && st % 2 == 1 =>
          val n = ((st - 13) / 2).toInt
          if (q + n > bodyEnd) throw Fail
          val s = utf8(b, q, n); q += n
          Cell("text", None, Some(s), None)
        case _ => throw Fail // 10/11 reserved; BLOBs out of subset
      }
    }
    if (q != bodyEnd) throw Fail // body must be consumed exactly
    cells.toSeq
  }

  /** Walk one table B-tree in rowid order; enforces ascending rowids
    * + the interior-key law; returns records. */
  private def walkTable(raw: Array[Byte], ps: Int, nPages: Int,
      root: Long): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    val visited = scala.collection.mutable.HashSet.empty[Long]
    var lastRowid = Long.MinValue

    def page(pgno: Long): Int = {
      if (pgno < 1 || pgno > nPages) throw Fail
      // page 1 is sqlite_master's root; visited is per-walkTable, so a
      // docs-tree pointer back to page 1 would be accepted in a second
      // walk — only the master walk itself (root == 1) may touch it
      if (pgno == 1 && root != 1) throw Fail
      if (!visited.add(pgno)) throw Fail // cycle / shared page
      ((pgno - 1) * ps).toInt
    }

    def walk(pgno: Long, depth: Int): Unit = {
      if (depth > 32) throw Fail
      val base = page(pgno)
      val hdr = if (pgno == 1) base + 100 else base
      val ptype = raw(hdr) & 0xff
      if (u16(raw, hdr + 1) != 0) throw Fail // freeblocks: out of subset
      val nCells = u16(raw, hdr + 3)
      val contentStart0 = u16(raw, hdr + 5)
      val contentStart = if (contentStart0 == 0) 65536 else contentStart0
      if (contentStart > ps) throw Fail // 0→65536 alias needs 64K pages
      if ((raw(hdr + 7) & 0xff) != 0) throw Fail // fragmented bytes
      ptype match {
        case 13 => // table leaf
          val arr = hdr + 8
          var ci = 0
          while (ci < nCells) {
            val ptr = u16(raw, arr + 2 * ci)
            if (ptr < contentStart || ptr >= ps) throw Fail
            val co = base + ptr
            val (plen, n1) = varint(raw, co)
            if (plen < 0 || plen > ps - 35) throw Fail // overflow: out of subset
            val (rowid, n2) = varint(raw, co + n1)
            // the whole cell must live inside THIS page — a crafted cell
            // near the page end must not read into a sibling page
            if (co + n1 + n2 + plen > base + ps) throw Fail
            if (rowid <= lastRowid) throw Fail // ascending rowid law
            lastRowid = rowid
            out += Rec(rowid, record(raw, co + n1 + n2, plen.toInt))
            ci += 1
          }
        case 5 => // table interior
          if (nCells < 1) throw Fail
          val right = u32(raw, hdr + 8)
          val arr = hdr + 12
          var ci = 0
          while (ci < nCells) {
            val ptr = u16(raw, arr + 2 * ci)
            if (ptr < contentStart || ptr >= ps) throw Fail
            val co = base + ptr
            val child = u32(raw, co)
            val (key, _) = varint(raw, co + 4)
            walk(child, depth + 1)
            if (lastRowid > key) throw Fail // interior-key law
            ci += 1
          }
          walk(right, depth + 1)
        case _ => throw Fail // index pages / corrupt types: out of subset
      }
    }

    walk(root, 0)
    out.toSeq
  }

  /** Walk one database file; None on any spec or subset violation. */
  private[graft] def parseSqlite(raw: Array[Byte]): Option[SqliteDb] = {
    if (raw == null || raw.length < 512) return None // one minimum page
    try {
      val magic = "SQLite format 3".getBytes(StandardCharsets.US_ASCII)
      var i = 0
      while (i < 15) { if (raw(i) != magic(i)) return None; i += 1 }
      if (raw(15) != 0) return None
      val ps = u16(raw, 16)
      if (ps < 512 || ps > 32768 ||
          java.lang.Integer.bitCount(ps) != 1) throw Fail
      if ((raw(18) & 0xff) != 1 || (raw(19) & 0xff) != 1) throw Fail // legacy
      if ((raw(20) & 0xff) != 0) throw Fail // reserved space
      if ((raw(21) & 0xff) != 64 || (raw(22) & 0xff) != 32 ||
          (raw(23) & 0xff) != 32) throw Fail // payload fractions
      val nPages = u32(raw, 28)
      if (nPages < 1 || nPages > (1 << 20)) throw Fail
      if (nPages * ps != raw.length) throw Fail // exact size law
      if (u32(raw, 32) != 0 || u32(raw, 36) != 0) throw Fail // freelist
      val fmt = u32(raw, 44)
      if (fmt < 1 || fmt > 4) throw Fail
      if (u32(raw, 52) != 0) throw Fail // auto-vacuum
      if (u32(raw, 56) != 1) throw Fail // UTF-8 only
      if (u32(raw, 64) != 0) throw Fail // incremental vacuum
      i = 72
      while (i < 92) { if (raw(i) != 0) throw Fail; i += 1 }

      // sqlite_master on page 1
      val master = walkTable(raw, ps, nPages.toInt, 1L)
      val seen = scala.collection.mutable.HashSet.empty[String]
      val seenRoots = scala.collection.mutable.HashSet.empty[Long]
      val tables = master.map { r =>
        r.cells match {
          case Seq(Cell("text", _, Some("table"), _),
              Cell("text", _, Some(name), _),
              Cell("text", _, Some(tblName), _),
              Cell("int", Some(root), _, _),
              Cell("text", _, Some(_), _)) =>
            if (name.isEmpty || name != tblName) throw Fail
            if (!seen.add(name)) throw Fail
            if (root < 2 || root > nPages) throw Fail
            if (!seenRoots.add(root)) throw Fail
            (name, walkTable(raw, ps, nPages.toInt, root))
          case _ => throw Fail // views/indexes/triggers: out of subset
        }
      }
      Some(SqliteDb(ps, nPages.toInt, tables))
    } catch { case Fail => None }
  }

  /** One row per (table row, column); invalid file → one flagged row. */
  def extractSqlite(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tbl", StringType, true),
      StructField("rid", LongType, true),
      StructField("col", IntegerType, true),
      StructField("kind", StringType, true),
      StructField("lval", LongType, true),
      StructField("sval", StringType, true),
      StructField("dval", DoubleType, true),
      StructField("page_size", IntegerType, true),
      StructField("n_pages", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseSqlite(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(db) =>
            db.tables.flatMap { case (name, recs) =>
              recs.flatMap { rec =>
                rec.cells.zipWithIndex.map { case (c, ci) =>
                  Row(id, name, rec.rowid, ci, c.kind,
                    c.lval.map(Long.box).orNull, c.sval.orNull,
                    c.dval.map(Double.box).orNull, db.pageSize, db.nPages,
                    true)
                }
              }
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private[graft] def vi(v: Long): Array[Byte] = {
    require(v >= 0)
    if (v < 128) Array(v.toByte)
    else {
      // big-endian 7-bit groups (≤ 8 groups needed for fixture values)
      val groups = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v
      while (x != 0) { groups.prepend((x & 0x7f).toByte); x >>>= 7 }
      (0 until groups.length - 1).foreach(k =>
        groups(k) = (groups(k) | 0x80).toByte)
      groups.toArray
    }
  }

  private[graft] def be(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte)

  /** Minimal-size integer serial type for v (the encoder SQLite uses). */
  private[graft] def intSerial(v: Long): (Long, Array[Byte]) =
    if (v == 0) (8L, Array.emptyByteArray)
    else if (v == 1) (9L, Array.emptyByteArray)
    else if (v >= -128 && v < 128) (1L, be(v, 1))
    else if (v >= -32768 && v < 32768) (2L, be(v, 2))
    else if (v >= -8388608 && v < 8388608) (3L, be(v, 3))
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, be(v, 4))
    else if (v >= -140737488355328L && v < 140737488355328L) (5L, be(v, 6))
    else (6L, be(v, 8))

  private[graft] def textSerial(s: String): (Long, Array[Byte]) = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    (13L + 2 * b.length, b)
  }

  private[graft] def realSerial(d: Double): (Long, Array[Byte]) =
    (7L, be(java.lang.Double.doubleToLongBits(d), 8))

  private[graft] def encRecord(fields: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val stBytes = fields.flatMap(f => vi(f._1)).toArray
    // header length varint counts itself; 1 byte suffices here
    val hdr = vi(stBytes.length + 1L)
    require(hdr.length == 1)
    hdr ++ stBytes ++ fields.flatMap(_._2)
  }

  /** Build a table LEAF page: cells packed at the page end, pointer
    * array in rowid order. `hdrAt` 100 for page 1. */
  private[graft] def leafPage(ps: Int, hdrAt: Int,
      cells: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val page = new Array[Byte](ps)
    var top = ps
    val ptrs = cells.map { case (rowid, rec) =>
      val cell = vi(rec.length.toLong) ++ vi(rowid) ++ rec
      top -= cell.length
      System.arraycopy(cell, 0, page, top, cell.length)
      top
    }
    require(top >= hdrAt + 8 + 2 * cells.length, "leaf page overflow")
    page(hdrAt) = 13
    page(hdrAt + 3) = (cells.length >> 8).toByte
    page(hdrAt + 4) = cells.length.toByte
    page(hdrAt + 5) = (top >> 8).toByte
    page(hdrAt + 6) = top.toByte
    ptrs.zipWithIndex.foreach { case (p, k) =>
      page(hdrAt + 8 + 2 * k) = (p >> 8).toByte
      page(hdrAt + 8 + 2 * k + 1) = p.toByte
    }
    page
  }

  /** Build a table INTERIOR page over (childPage, maxRowid) cells +
    * the right-most child. */
  private[graft] def interiorPage(ps: Int,
      cells: Seq[(Long, Long)], right: Long): Array[Byte] = {
    val page = new Array[Byte](ps)
    var top = ps
    val ptrs = cells.map { case (child, key) =>
      val cell = be(child, 4) ++ vi(key)
      top -= cell.length
      System.arraycopy(cell, 0, page, top, cell.length)
      top
    }
    page(0) = 5
    page(3) = (cells.length >> 8).toByte
    page(4) = cells.length.toByte
    page(5) = (top >> 8).toByte
    page(6) = top.toByte
    page(8) = ((right >> 24) & 0xff).toByte
    page(9) = ((right >> 16) & 0xff).toByte
    page(10) = ((right >> 8) & 0xff).toByte
    page(11) = (right & 0xff).toByte
    ptrs.zipWithIndex.foreach { case (p, k) =>
      page(12 + 2 * k) = (p >> 8).toByte
      page(12 + 2 * k + 1) = p.toByte
    }
    page
  }

  private[graft] def fixtureIntVal(i: Int, g: Int): Long = {
    val muls = Array(1L, 100L, 10000L, 1000000L, 100000000L,
      1000000000000L, 10000000000000000L)
    ((i * 37 + g * 11) % 90 - 45).toLong * muls(g % 7)
  }

  /** Fixture law (replayed closed-form by the oracle): file i has
    * page size 512·2^(i%4), 4 pages: page 1 = sqlite_master leaf
    * (one `docs` table, rootpage 2), page 2 = interior over leaves
    * 3 (rowids 1..2+i%3) and 4 (the rest, total 4+i%3+(i+1)%3).
    * Row with global index g = rowid−1 carries a size-sweeping int
    * ((i·37+g·11)%90−45)·10^{[0,2,4,6,8,12,16][g%7]}, text
    * "doc-{(i+g)%9}", real ((i·13+g·7)%1000)/4, and NULL when
    * (i+g)%3==0 else the 0/1 constant g%2. */
  def sqliteFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ps = 512 << (i % 4)
      val nra = 2 + i % 3
      val nrb = 2 + (i + 1) % 3
      def rec(g: Int): Array[Byte] = {
        val f0 = intSerial(fixtureIntVal(i, g))
        val f1 = textSerial(s"doc-${(i + g) % 9}")
        val f2 = realSerial(((i * 13 + g * 7) % 1000) / 4.0)
        val f3 =
          if ((i + g) % 3 == 0) (0L, Array.emptyByteArray)
          else intSerial((g % 2).toLong)
        encRecord(Seq(f0, f1, f2, f3))
      }
      val leafA = leafPage(ps, 0,
        (0 until nra).map(g => ((g + 1).toLong, rec(g))))
      val leafB = leafPage(ps, 0,
        (0 until nrb).map(k => ((nra + k + 1).toLong, rec(nra + k))))
      val interior = interiorPage(ps, Seq((3L, nra.toLong)), 4L)
      val masterRec = encRecord(Seq(
        textSerial("table"), textSerial("docs"), textSerial("docs"),
        intSerial(2L),
        textSerial("CREATE TABLE docs(a INTEGER, b TEXT, c REAL, d)")))
      val page1 = leafPage(ps, 100, Seq((1L, masterRec)))
      // 100-byte header over page 1's front
      val magic = "SQLite format 3".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(magic, 0, page1, 0, 15)
      page1(15) = 0
      page1(16) = (ps >> 8).toByte; page1(17) = ps.toByte
      page1(18) = 1; page1(19) = 1
      page1(20) = 0
      page1(21) = 64; page1(22) = 32; page1(23) = 32
      page1(28) = 0; page1(29) = 0; page1(30) = 0; page1(31) = 4 // 4 pages
      page1(47) = 4 // schema format 4
      page1(59) = 1 // text encoding UTF-8
      Row(i.toLong, page1 ++ interior ++ leafA ++ leafB)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
