package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container extraction (Apache Avro 1.11 spec, "Object
  * Container Files" — the row-oriented interchange format data
  * engineering pipelines exchange alongside parquet). A real
  * byte-level reader: zigzag varints, the header metadata map, raw
  * deflate blocks, per-block sync-marker verification, and a strict
  * recursive-descent JSON walk of `avro.schema`.
  *
  * Closed subset (strict — reject, never guess):
  *  - magic `Obj` + 0x01; header metadata map with POSITIVE map-block
  *    counts only (negative size-prefixed map blocks are out of
  *    subset), unique keys, `avro.schema` mandatory, `avro.codec`
  *    absent or `null`/`deflate` (raw deflate, no zlib wrapper, per
  *    spec); 16-byte sync marker;
  *  - schema: a top-level record of FLAT primitive fields — `long`,
  *    `int`, `string`, `double`, `boolean`; unions, nesting and
  *    logical types are out of subset; field names nonempty, unique;
  *  - varints: ≤ 10 bytes (a value that doesn't terminate there is
  *    corrupt); `int` fields must fit i32; strings strict UTF-8
  *    without C0 controls (≤ 64 KiB); doubles are 8-byte LE IEEE,
  *    finite only; booleans are exactly 0 or 1;
  *  - data blocks: count ≥ 1, byte size ≤ 4 MiB (decompressed cap
  *    8 MiB — bomb guard), records must consume the block EXACTLY,
  *    each block's trailing sync must equal the header's, and the
  *    file must end exactly at the last sync byte.
  *
  * Emits one row per (record, field) — the per-cell grain XLSX uses
  * — so the oracle hash gates every decoded value of every type.
  * One blob = one task-local walk (codec-family plan shape).
  */
object AvroLake {

  private object Fail extends scala.util.control.ControlThrowable

  // ------------------------------------------------------------------
  // minimal strict JSON (the schema document)

  private final class JCur(val s: String) {
    var p = 0
    def ws(): Unit = { while (p < s.length && s(p).isWhitespace) p += 1 }
    def eof: Boolean = p >= s.length
    def peek: Char = { if (eof) throw Fail; s(p) }
    def take(c: Char): Unit = { if (eof || s(p) != c) throw Fail; p += 1 }
  }

  private def jString(c: JCur): String = {
    c.take('"')
    val sb = new StringBuilder
    var done = false
    while (!done) {
      if (c.eof) throw Fail
      val ch = c.s(c.p); c.p += 1
      ch match {
        case '"' => done = true
        case '\\' =>
          if (c.eof) throw Fail
          val e = c.s(c.p); c.p += 1
          e match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              if (c.p + 4 > c.s.length) throw Fail
              val h = c.s.substring(c.p, c.p + 4)
              if (!h.forall(x => x.isDigit || ('a' <= x && x <= 'f') ||
                ('A' <= x && x <= 'F'))) throw Fail
              sb += Integer.parseInt(h, 16).toChar
              c.p += 4
            case _ => throw Fail
          }
        case x if x < 0x20 => throw Fail // raw control in a string
        case x => sb += x
      }
    }
    sb.toString
  }

  private def jValue(c: JCur, depth: Int): Any = {
    if (depth > 16) throw Fail
    c.ws()
    c.peek match {
      case '"' => jString(c)
      case '{' =>
        c.take('{'); c.ws()
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        if (c.peek == '}') { c.take('}'); return m }
        var more = true
        while (more) {
          c.ws()
          val k = jString(c)
          if (m.contains(k)) throw Fail // duplicate key
          c.ws(); c.take(':')
          m(k) = jValue(c, depth + 1)
          c.ws()
          if (c.peek == ',') c.take(',')
          else { c.take('}'); more = false }
        }
        m
      case '[' =>
        c.take('['); c.ws()
        val l = scala.collection.mutable.ArrayBuffer.empty[Any]
        if (c.peek == ']') { c.take(']'); return l }
        var more = true
        while (more) {
          l += jValue(c, depth + 1)
          c.ws()
          if (c.peek == ',') c.take(',')
          else { c.take(']'); more = false }
        }
        l
      case 't' =>
        if (!c.s.startsWith("true", c.p)) throw Fail; c.p += 4; true
      case 'f' =>
        if (!c.s.startsWith("false", c.p)) throw Fail; c.p += 5; false
      case 'n' =>
        if (!c.s.startsWith("null", c.p)) throw Fail; c.p += 4; null
      case ch if ch == '-' || ch.isDigit =>
        val st = c.p
        if (c.peek == '-') c.p += 1
        while (!c.eof && c.s(c.p).isDigit) c.p += 1
        if (c.p == st || (c.s(st) == '-' && c.p == st + 1)) throw Fail
        java.lang.Long.parseLong(c.s.substring(st, c.p))
      case _ => throw Fail
    }
  }

  private def parseJson(s: String): Any = {
    val c = new JCur(s)
    val v = jValue(c, 0)
    c.ws()
    if (!c.eof) throw Fail // trailing content
    v
  }

  // ------------------------------------------------------------------
  // avro primitives

  private final class Cur(val b: Array[Byte]) {
    var p = 0
    def need(n: Long): Unit =
      if (n < 0 || p + n > b.length) throw Fail
    def u8(): Int = { need(1); val v = b(p) & 0xff; p += 1; v }
  }

  /** Zigzag-encoded long varint, ≤ 10 bytes. */
  private def vlong(c: Cur): Long = {
    var raw = 0L
    var shift = 0
    var more = true
    while (more) {
      if (shift > 63) throw Fail // > 10 bytes / overflow
      val x = c.u8()
      raw |= (x & 0x7fL) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    (raw >>> 1) ^ -(raw & 1L)
  }

  private def vstr(c: Cur, maxLen: Int = 1 << 16): String = {
    val n = vlong(c)
    if (n < 0 || n > maxLen) throw Fail
    c.need(n)
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(c.b, c.p, n.toInt)).toString
      catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
    if (s.exists(_ < 0x20)) throw Fail
    c.p += n.toInt
    s
  }

  private def vbytes(c: Cur, maxLen: Int): Array[Byte] = {
    val n = vlong(c)
    if (n < 0 || n > maxLen) throw Fail
    c.need(n)
    val out = java.util.Arrays.copyOfRange(c.b, c.p, c.p + n.toInt)
    c.p += n.toInt
    out
  }

  private def rawInflate(data: Array[Byte], cap: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate per spec
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(cap, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => throw Fail }
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw Fail // truncated stream / preset-dictionary (out of subset)
        if (out.size() + n > cap) throw Fail // decompression bomb
        out.write(buf, 0, n)
      }
      if (inf.getRemaining != 0) throw Fail // trailing garbage in the block
      out.toByteArray
    } finally inf.end()
  }

  private[graft] final case class AvroField(name: String, ftype: String)
  private[graft] final case class AvroCell(
      blk: Int, rec: Int, fld: Int, lval: Option[Long],
      sval: Option[String], dval: Option[Double])
  private[graft] final case class AvroFile(
      codec: String, recName: String, fields: Seq[AvroField],
      nBlocks: Int, cells: Seq[AvroCell])

  private val Primitives = Set("long", "int", "string", "double", "boolean")

  private def schemaOf(json: String): (String, Seq[AvroField]) = {
    val m = parseJson(json) match {
      case m: scala.collection.mutable.LinkedHashMap[String @unchecked,
        Any @unchecked] => m
      case _ => throw Fail
    }
    if (!m.get("type").contains("record")) throw Fail
    val name = m.get("name") match {
      case Some(s: String) if s.nonEmpty => s
      case _ => throw Fail
    }
    val fields = m.get("fields") match {
      case Some(l: scala.collection.mutable.ArrayBuffer[Any @unchecked]) =>
        if (l.isEmpty) throw Fail
        val seen = scala.collection.mutable.HashSet.empty[String]
        l.map {
          case fm: scala.collection.mutable.LinkedHashMap[String @unchecked,
            Any @unchecked] =>
            val fn = fm.get("name") match {
              case Some(s: String) if s.nonEmpty => s
              case _ => throw Fail
            }
            if (!seen.add(fn)) throw Fail
            val ft = fm.get("type") match {
              case Some(s: String) if Primitives(s) => s
              case _ => throw Fail // unions/nesting: out of subset
            }
            AvroField(fn, ft)
          case _ => throw Fail
        }.toSeq
      case _ => throw Fail
    }
    (name, fields)
  }

  /** Walk one container; None on any spec or subset violation. */
  private[graft] def parseAvro(raw: Array[Byte]): Option[AvroFile] = {
    if (raw == null || raw.length < 4) return None
    try {
      if (raw(0) != 'O' || raw(1) != 'b' || raw(2) != 'j' || raw(3) != 1)
        return None
      val c = new Cur(raw)
      c.p = 4
      // header metadata map (positive block counts only)
      val meta = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
      var n = vlong(c)
      while (n != 0) {
        if (n < 0 || n > 1024) throw Fail // negative map blocks: out of subset
        var i = 0L
        while (i < n) {
          val k = vstr(c, 1 << 10)
          if (k.isEmpty || meta.contains(k)) throw Fail
          meta(k) = vbytes(c, 1 << 20)
          i += 1
        }
        n = vlong(c)
      }
      val schemaJson = meta.getOrElse("avro.schema", throw Fail)
      val (recName, fields) = schemaOf(
        new String(schemaJson, StandardCharsets.UTF_8))
      val codec = meta.get("avro.codec")
        .map(b => new String(b, StandardCharsets.UTF_8))
        .getOrElse("null")
      if (codec != "null" && codec != "deflate") throw Fail
      c.need(16)
      val sync = java.util.Arrays.copyOfRange(raw, c.p, c.p + 16)
      c.p += 16

      // data blocks
      val cells = scala.collection.mutable.ArrayBuffer.empty[AvroCell]
      var blk = 0
      while (c.p < raw.length) {
        val count = vlong(c)
        if (count < 1 || count > (1 << 20)) throw Fail
        val size = vlong(c)
        if (size < 0 || size > (1 << 22)) throw Fail
        c.need(size)
        val packed = java.util.Arrays.copyOfRange(raw, c.p, c.p + size.toInt)
        c.p += size.toInt
        val body =
          if (codec == "deflate") rawInflate(packed, 1 << 23) else packed
        val bc = new Cur(body)
        var r = 0L
        while (r < count) {
          fields.zipWithIndex.foreach { case (f, fi) =>
            f.ftype match {
              case "long" =>
                cells += AvroCell(blk, r.toInt, fi, Some(vlong(bc)), None, None)
              case "int" =>
                val v = vlong(bc)
                if (v < Int.MinValue || v > Int.MaxValue) throw Fail
                cells += AvroCell(blk, r.toInt, fi, Some(v), None, None)
              case "boolean" =>
                val v = bc.u8()
                if (v > 1) throw Fail
                cells += AvroCell(blk, r.toInt, fi, Some(v.toLong), None, None)
              case "string" =>
                cells += AvroCell(blk, r.toInt, fi, None, Some(vstr(bc)), None)
              case "double" =>
                bc.need(8)
                var bits = 0L
                var k = 7
                while (k >= 0) { bits = (bits << 8) | (body(bc.p + k) & 0xffL); k -= 1 }
                bc.p += 8
                val d = java.lang.Double.longBitsToDouble(bits)
                if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
                  throw Fail
                cells += AvroCell(blk, r.toInt, fi, None, None, Some(d))
            }
          }
          r += 1
        }
        if (bc.p != body.length) throw Fail // records must tile the block
        c.need(16)
        if (!java.util.Arrays.equals(sync,
          java.util.Arrays.copyOfRange(raw, c.p, c.p + 16))) throw Fail
        c.p += 16
        blk += 1
      }
      if (blk == 0) throw Fail // a container with no data blocks
      Some(AvroFile(codec, recName, fields, blk, cells.toSeq))
    } catch { case Fail => None }
  }

  /** One row per (record, field); an invalid file yields one flagged row. */
  def extractAvro(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("blk", IntegerType, true),
      StructField("rec", IntegerType, true),
      StructField("fld", IntegerType, true),
      StructField("fname", StringType, true),
      StructField("ftype", StringType, true),
      StructField("lval", LongType, true),
      StructField("sval", StringType, true),
      StructField("dval", DoubleType, true),
      StructField("codec", StringType, true),
      StructField("rec_name", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseAvro(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(f) =>
            f.cells.map { cl =>
              val fd = f.fields(cl.fld)
              Row(id, cl.blk, cl.rec, cl.fld, fd.name, fd.ftype,
                cl.lval.map(Long.box).orNull, cl.sval.orNull,
                cl.dval.map(Double.box).orNull, f.codec, f.recName, true)
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private def zz(v: Long): Array[Byte] = {
    var raw = (v << 1) ^ (v >> 63)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var more = true
    while (more) {
      val x = (raw & 0x7f).toInt
      raw >>>= 7
      if (raw == 0) { out += x.toByte; more = false }
      else out += (x | 0x80).toByte
    }
    out.toArray
  }

  private def estr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    zz(b.length.toLong) ++ b
  }

  private def rawDeflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private val FixtureSchema =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"k","type":"long"},{"name":"name","type":"string"},
      |{"name":"n","type":"int"},{"name":"price","type":"double"},
      |{"name":"flag","type":"boolean"}]}""".stripMargin.replace("\n", "")

  /** Fixture law (replayed closed-form by the oracle): file i has 2
    * blocks; block b has 2+(i+b)%3 records; record with GLOBAL index
    * g carries k = i·1000 + g·7 − 500, name = "rec-{(i+g)%9}",
    * n = (i·3+g)%100 − 50, price = ((i·13+g·7)%1000)/4 (exact
    * quarters), flag = (i+g)%2==0; codec alternates null/deflate on
    * file parity; sync bytes are (i·31+j·7)%256. */
  def avroFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val codec = if (i % 2 == 0) "null" else "deflate"
      val sync = Array.tabulate(16)(j => ((i * 31 + j * 7) % 256).toByte)
      val header = "Obj".getBytes(StandardCharsets.US_ASCII) ++
        Array[Byte](1) ++
        zz(2) ++ // one metadata map block with two entries
        estr("avro.schema") ++ estr(FixtureSchema) ++
        estr("avro.codec") ++ estr(codec) ++
        zz(0) ++ sync
      var g = 0
      val blocks = (0 until 2).flatMap { b =>
        val nr = 2 + (i + b) % 3
        val body = (0 until nr).flatMap { _ =>
          val bytes = zz(i * 1000L + g * 7L - 500L) ++
            estr(s"rec-${(i + g) % 9}") ++
            zz(((i * 3 + g) % 100 - 50).toLong) ++ {
              val bits = java.lang.Double.doubleToLongBits(
                ((i * 13 + g * 7) % 1000) / 4.0)
              Array.tabulate(8)(k => ((bits >> (8 * k)) & 0xff).toByte)
            } ++ Array[Byte](if ((i + g) % 2 == 0) 1 else 0)
          g += 1
          bytes
        }.toArray
        val packed = if (codec == "deflate") rawDeflate(body) else body
        zz(nr.toLong) ++ zz(packed.length.toLong) ++ packed ++ sync
      }.toArray
      Row(i.toLong, header ++ blocks)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
