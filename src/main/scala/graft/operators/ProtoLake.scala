package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-less protobuf wire-format census (the protobuf encoding
  * spec — corpus forensics over blobs whose `.proto` is lost, the
  * complement of TFRecordLake's schema-bound tf.Example decode).
  * Walks the tag/value stream without any schema: one row per field
  * occurrence with its wire type and raw value — what an unknown-
  * binary triage pass actually computes.
  *
  * Closed subset (strict — reject, never guess):
  *  - tags: varint, field number in [1, 2^29−1], wire types
  *    VARINT(0), I64(1), LEN(2), I32(5); the deprecated group
  *    markers (3/4) reject;
  *  - varints: ≤ 10 bytes and MINIMALLY encoded (a trailing 0x00
  *    continuation byte is an overlong form — reject, the msgpack
  *    posture); values land in a signed long (top-bit-set 64-bit
  *    varints reinterpret, as protobuf itself does);
  *  - LEN payloads ≤ 1 MiB; classified `utf8` (strict decode,
  *    printable ASCII-range only in subset) with the text carried,
  *    else `bytes` with the byte sum carried — both deterministic;
  *  - the stream must tile the blob exactly; ≤ 4096 fields.
  *
  * One blob = one task-local walk (codec-family plan shape). */
object ProtoLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class PField(
      fno: Int, wire: Int, lval: Option[Long], len: Option[Long],
      sval: Option[String])

  /** Walk one message; None on any spec or subset violation. */
  private[graft] def parseProto(raw: Array[Byte]): Option[Seq[PField]] = {
    if (raw == null || raw.length < 1) return None
    try {
      var p = 0
      def u8(): Int = {
        if (p >= raw.length) throw Fail
        val v = raw(p) & 0xff; p += 1; v
      }
      def varint(): Long = {
        var v = 0L
        var shift = 0
        var last = 0
        var n = 0
        var more = true
        while (more) {
          if (n == 10) throw Fail
          val x = u8()
          if (shift == 63 && (x & 0x7e) != 0) throw Fail // 64-bit overflow
          v |= (x & 0x7fL) << shift
          shift += 7
          last = x
          n += 1
          more = (x & 0x80) != 0
        }
        if (n > 1 && (last & 0x7f) == 0) throw Fail // overlong encoding
        v
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[PField]
      while (p < raw.length) {
        if (out.length >= 4096) throw Fail
        val tag = varint()
        val wire = (tag & 7L).toInt
        val fno = tag >>> 3
        if (fno < 1 || fno > ((1L << 29) - 1)) throw Fail
        wire match {
          case 0 =>
            out += PField(fno.toInt, 0, Some(varint()), None, None)
          case 1 =>
            if (p + 8 > raw.length) throw Fail
            var v = 0L
            var i = 7
            while (i >= 0) { v = (v << 8) | (raw(p + i) & 0xffL); i -= 1 }
            p += 8
            out += PField(fno.toInt, 1, Some(v), None, None)
          case 5 =>
            if (p + 4 > raw.length) throw Fail
            var v = 0L
            var i = 3
            while (i >= 0) { v = (v << 8) | (raw(p + i) & 0xffL); i -= 1 }
            p += 4
            out += PField(fno.toInt, 5, Some(v), None, None)
          case 2 =>
            val n = varint()
            if (n < 0 || n > (1 << 20) || p + n > raw.length) throw Fail
            val body = java.util.Arrays.copyOfRange(raw, p, p + n.toInt)
            p += n.toInt
            // classify: strict printable-ASCII text vs opaque bytes
            val printable = body.forall(b => (b & 0xff) >= 0x20 &&
              (b & 0xff) <= 0x7e)
            if (printable) {
              val dec = StandardCharsets.UTF_8.newDecoder()
                .onMalformedInput(CodingErrorAction.REPORT)
                .onUnmappableCharacter(CodingErrorAction.REPORT)
              val s = dec.decode(java.nio.ByteBuffer.wrap(body)).toString
              out += PField(fno.toInt, 2, None, Some(n), Some(s))
            } else {
              var sum = 0L
              body.foreach(b => sum += (b & 0xff))
              out += PField(fno.toInt, 2, Some(sum), Some(n), None)
            }
          case _ => throw Fail // groups (3/4) and reserved types
        }
      }
      if (out.isEmpty) throw Fail
      Some(out.toSeq)
    } catch { case Fail => None }
  }

  /** One row per field occurrence; invalid blob → one flagged row. */
  def extractProto(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seq", IntegerType, true),
      StructField("fno", IntegerType, true),
      StructField("wire", IntegerType, true),
      StructField("lval", LongType, true),
      StructField("len", LongType, true),
      StructField("sval", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseProto(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(fs) =>
            fs.zipWithIndex.map { case (f, i) =>
              Row(id, i, f.fno, f.wire, f.lval.map(Long.box).orNull,
                f.len.map(Long.box).orNull, f.sval.orNull, true)
            }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private[graft] def vint(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt
      x >>>= 7
      if (x == 0) { out += b.toByte; more = false }
      else out += (b | 0x80).toByte
    }
    out.toArray
  }
  private def tag(fno: Int, wire: Int): Array[Byte] =
    vint((fno.toLong << 3) | wire)
  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * k)) & 0xff).toByte)

  /** Fixture law (replayed closed-form by the oracle): message i is
    * field 1 varint (i·97+13)·2^(4·(i%8)) (size-sweeping), field 2
    * text "msg {i%7} of {i%5}", field 3 fixed32 i·1000+7, field 4
    * fixed64 i·10^9+3, then i%3 repeated field-5 BYTES payloads
    * (length 3+j, bytes 0x80+(i+j+k)%64 — never printable) whose
    * byte sums census. */
  def protoFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val blob =
        tag(1, 0) ++ vint((i * 97L + 13L) << (4 * (i % 8))) ++
          tag(2, 2) ++ {
            val s = s"msg ${i % 7} of ${i % 5}"
              .getBytes(StandardCharsets.US_ASCII)
            vint(s.length.toLong) ++ s
          } ++
          tag(3, 5) ++ le(i * 1000L + 7L, 4) ++
          tag(4, 1) ++ le(i * 1000000000L + 3L, 8) ++
          (0 until i % 3).flatMap { j =>
            val body = Array.tabulate(3 + j)(k =>
              (0x80 + (i + j + k) % 64).toByte)
            tag(5, 2) ++ vint(body.length.toLong) ++ body
          }
      Row(i.toLong, blob)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
