package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MessagePack record-shard extraction (the msgpack.org format spec
  * — the binary JSONL of log pipelines and scraped-data shards: a
  * blob is a concatenation of map objects, one per record).
  *
  * Closed subset (strict — reject, never guess):
  *  - records: fixmap/map16 with UNIQUE string keys (fixstr/str8/
  *    str16, strict UTF-8, no C0 controls, ≤ 64 KiB);
  *  - values: nil, bool, all int families (positive/negative fixint,
  *    uint8-64, int8-64 — uint64 above 2^63−1 rejects), float64
  *    (finite, big-endian per spec), strings, and FLAT fixarrays of
  *    strings (token/tag lists); nested maps, bin/ext families and
  *    float32 are out of subset;
  *  - CANONICAL MINIMAL ENCODING enforced: a value carried in a
  *    wider family than needed (e.g. uint32 holding 5) rejects —
  *    the determinism posture the whole oracle family relies on
  *    (one value, one byte sequence);
  *  - the stream must tile the blob EXACTLY (a trailing partial
  *    object rejects), 1 ≤ records ≤ 2^20, map size ≤ 64.
  *
  * Emits one row per (record, key) in WRITTEN key order, so both
  * values and layout are hash-gated. One blob = one task-local walk.
  */
object MsgpackLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class MCell(
      kind: String, lval: Option[Long], sval: Option[String],
      dval: Option[Double])

  private final class Cur(val b: Array[Byte]) {
    var p = 0
    def u8(): Int = {
      if (p >= b.length) throw Fail
      val v = b(p) & 0xff; p += 1; v
    }
    def beN(n: Int): Long = {
      if (p + n > b.length) throw Fail
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
      p += n
      v
    }
  }

  private def utf8(c: Cur, n: Long): String = {
    if (n < 0 || n > (1 << 16) || c.p + n > c.b.length) throw Fail
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

  /** Strings only (keys + array elements); minimal-length law. */
  private def str(c: Cur): String = {
    val tag = c.u8()
    if (tag >= 0xa0 && tag <= 0xbf) utf8(c, (tag - 0xa0).toLong)
    else if (tag == 0xd9) { // str8: len must need it (> 31)
      val n = c.u8()
      if (n <= 31) throw Fail
      utf8(c, n.toLong)
    } else if (tag == 0xda) { // str16
      val n = c.beN(2)
      if (n <= 255) throw Fail
      utf8(c, n)
    } else throw Fail
  }

  /** One scalar/array value; enforces the minimal-encoding law. */
  private def value(c: Cur): MCell = {
    val tag = c.u8()
    tag match {
      case 0xc0 => MCell("nil", None, None, None)
      case 0xc2 => MCell("bool", Some(0L), None, None)
      case 0xc3 => MCell("bool", Some(1L), None, None)
      case t if t <= 0x7f => // positive fixint
        MCell("int", Some(t.toLong), None, None)
      case t if t >= 0xe0 => // negative fixint −32..−1
        MCell("int", Some((t - 256).toLong), None, None)
      case 0xcc => // uint8
        val v = c.u8().toLong
        if (v < 128) throw Fail
        MCell("int", Some(v), None, None)
      case 0xcd => // uint16
        val v = c.beN(2)
        if (v < 256) throw Fail
        MCell("int", Some(v), None, None)
      case 0xce => // uint32
        val v = c.beN(4)
        if (v < 65536) throw Fail
        MCell("int", Some(v), None, None)
      case 0xcf => // uint64 (must fit a signed long)
        val v = c.beN(8)
        if (v < 0 || v < (1L << 32)) throw Fail
        MCell("int", Some(v), None, None)
      case 0xd0 => // int8 (−128..−33; −32..−1 are fixint, ≥0 positive)
        val v = c.u8().toByte.toLong
        if (v >= -32) throw Fail
        MCell("int", Some(v), None, None)
      case 0xd1 => // int16
        val v = c.beN(2).toShort.toLong
        if (v >= -128) throw Fail
        MCell("int", Some(v), None, None)
      case 0xd2 => // int32
        val v = c.beN(4).toInt.toLong
        if (v >= -32768) throw Fail
        MCell("int", Some(v), None, None)
      case 0xd3 => // int64
        val v = c.beN(8)
        if (v >= Int.MinValue.toLong) throw Fail
        MCell("int", Some(v), None, None)
      case 0xcb => // float64, big-endian, finite
        val d = java.lang.Double.longBitsToDouble(c.beN(8))
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          throw Fail
        MCell("float", None, None, Some(d))
      case t if t >= 0xa0 && t <= 0xbf =>
        MCell("str", None, Some(utf8(c, (t - 0xa0).toLong)), None)
      case 0xd9 =>
        val n = c.u8()
        if (n <= 31) throw Fail
        MCell("str", None, Some(utf8(c, n.toLong)), None)
      case 0xda =>
        val n = c.beN(2)
        if (n <= 255) throw Fail
        MCell("str", None, Some(utf8(c, n)), None)
      case t if t >= 0x90 && t <= 0x9f => // fixarray of strings
        val n = t - 0x90
        val items = (0 until n).map(_ => str(c))
        MCell("arr", Some(n.toLong), Some(items.mkString("|")), None)
      case _ => throw Fail // bin/ext/float32/nested containers: out of subset
    }
  }

  /** Walk one shard; None on any spec or subset violation. */
  private[graft] def parseMsgpack(raw: Array[Byte])
    : Option[Seq[Seq[(String, MCell)]]] = {
    if (raw == null || raw.length < 1) return None
    try {
      val c = new Cur(raw)
      val recs = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(String, MCell)]]
      while (c.p < raw.length) {
        if (recs.length >= (1 << 20)) throw Fail
        val tag = c.u8()
        val n =
          if (tag >= 0x80 && tag <= 0x8f) (tag - 0x80).toLong
          else if (tag == 0xde) { // map16: size must need it (> 15)
            val v = c.beN(2)
            if (v <= 15) throw Fail
            v
          } else throw Fail // records must be maps
        if (n < 1 || n > 64) throw Fail
        val seen = scala.collection.mutable.HashSet.empty[String]
        val rec = (0L until n).map { _ =>
          val k = str(c)
          if (k.isEmpty || !seen.add(k)) throw Fail
          (k, value(c))
        }
        recs += rec
      }
      if (recs.isEmpty) throw Fail
      Some(recs.toSeq)
    } catch { case Fail => None }
  }

  /** One row per (record, key); an invalid shard → one flagged row. */
  def extractMsgpack(df: DataFrame, idCol: String, binCol: String)
    : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rec", IntegerType, true),
      StructField("kidx", IntegerType, true),
      StructField("key", StringType, true),
      StructField("kind", StringType, true),
      StructField("lval", LongType, true),
      StructField("sval", StringType, true),
      StructField("dval", DoubleType, true),
      StructField("n_keys", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseMsgpack(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(recs) =>
            recs.zipWithIndex.flatMap { case (rec, ri) =>
              rec.zipWithIndex.map { case ((k, cl), ki) =>
                Row(id, ri, ki, k, cl.kind,
                  cl.lval.map(Long.box).orNull, cl.sval.orNull,
                  cl.dval.map(Double.box).orNull, rec.length, true)
              }
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private def be(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * (n - 1 - k))) & 0xff).toByte)

  private[graft] def encStr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    if (b.length <= 31) Array((0xa0 + b.length).toByte) ++ b
    else if (b.length <= 255) Array(0xd9.toByte, b.length.toByte) ++ b
    else Array(0xda.toByte) ++ be(b.length.toLong, 2) ++ b
  }

  /** Minimal-encoding integer (the canonical law the parser pins). */
  private[graft] def encInt(v: Long): Array[Byte] =
    if (v >= 0 && v <= 127) Array(v.toByte)
    else if (v < 0 && v >= -32) Array((v & 0xff).toByte)
    else if (v >= 128 && v <= 255) Array(0xcc.toByte, v.toByte)
    else if (v >= 256 && v <= 65535) Array(0xcd.toByte) ++ be(v, 2)
    else if (v >= 65536 && v <= 0xffffffffL) Array(0xce.toByte) ++ be(v, 4)
    else if (v >= (1L << 32)) Array(0xcf.toByte) ++ be(v, 8)
    else if (v >= -128) Array(0xd0.toByte, (v & 0xff).toByte)
    else if (v >= -32768) Array(0xd1.toByte) ++ be(v, 2)
    else if (v >= Int.MinValue.toLong) Array(0xd2.toByte) ++ be(v, 4)
    else Array(0xd3.toByte) ++ be(v, 8)

  private[graft] def fixtureIdVal(i: Int, r: Int): Long = {
    val muls = Array(1L, 1000L, 100000000L, 10000000000000L)
    val sign = if ((i + r) % 5 == 0) -1L else 1L
    (i * 100L + r + 1L) * muls(r % 4) * sign
  }

  /** Fixture law (replayed closed-form by the oracle): file i has
    * 3+i%4 records; record r carries id (size-sweeping signed int),
    * text "doc {(i+r)%7} body", score ((i·13+r·7)%1000)/4, ok
    * (i+r)%2==0, tags = r%3 strings "t{(i+j)%5}", and a nil key
    * present only when (i+r)%3==0 (map size 5 or 6). */
  def msgpackFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nr = 3 + i % 4
      val blob = (0 until nr).flatMap { r =>
        val hasNil = (i + r) % 3 == 0
        val nk = if (hasNil) 6 else 5
        val tags = (0 until r % 3).map(j => s"t${(i + j) % 5}")
        Array((0x80 + nk).toByte) ++
          encStr("id") ++ encInt(fixtureIdVal(i, r)) ++
          encStr("text") ++ encStr(s"doc ${(i + r) % 7} body") ++
          encStr("score") ++ (Array(0xcb.toByte) ++
            be(java.lang.Double.doubleToLongBits(
              ((i * 13 + r * 7) % 1000) / 4.0), 8)) ++
          encStr("ok") ++
          Array(if ((i + r) % 2 == 0) 0xc3.toByte else 0xc2.toByte) ++
          encStr("tags") ++ (Array((0x90 + tags.length).toByte) ++
            tags.flatMap(encStr)) ++
          (if (hasNil) encStr("n") ++ Array(0xc0.toByte)
           else Array.emptyByteArray)
      }.toArray
      Row(i.toLong, blob)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
