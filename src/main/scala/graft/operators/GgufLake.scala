package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GGUF model-container extraction (the ggml/llama.cpp exchange
  * format — how quantized LLM weights circulate; public spec:
  * ggml project `docs/gguf.md`, version 3). Completes the tensor-
  * container trio next to SafeTensors (q203) and NPY (q204): a
  * curation pipeline over a model hub sees all three.
  *
  * Closed subset (strict — reject, never guess):
  *  - header: magic `GGUF`, u32-LE version == 3, u64 tensor count
  *    and metadata-kv count (each capped at 1024 — allocation-bomb
  *    guard, documented);
  *  - strings: u64 length + UTF-8 bytes, strictly decoded, no
  *    embedded NUL/C0 controls;
  *  - metadata values: UINT32(4), FLOAT32(6, finite), BOOL(7, byte
  *    0/1 only), STRING(8), ARRAY(9, element type STRING or UINT32,
  *    count ≤ 4096), UINT64(10). Other type tags are out of subset.
  *    Keys are nonempty `[a-z0-9._-]`, unique per file;
  *    `general.alignment`, when present, must be a power-of-two
  *    UINT32 in [8, 4096] (default 32 per spec);
  *  - tensor infos: nonempty unique name, n_dims in [1,4], each dim
  *    in [1, 2^20] with element count capped at 2^22, ggml type
  *    F32(0) or F16(1) — quantized block types are out of subset;
  *    offsets must be alignment-multiples, ascending, and exactly
  *    contiguous (offset(k) = align(offset(k−1) + size(k−1)));
  *  - tensor data: begins at align(header end); the file must end
  *    exactly at the last tensor's last byte (no trailing pad in
  *    subset); F16 decodes exactly (subnormals included, Inf/NaN
  *    reject), F32 must be finite.
  *
  * Emits one row per tensor (file-level columns repeated) with the
  * decoded `value_sum` pinning content, not just structure. One
  * blob = one task-local walk (codec-family plan shape).
  */
object GgufLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class GgufTensor(
      name: String, nDims: Int, numel: Long, dtype: String, off: Long,
      valueSum: Double)

  private[graft] final case class GgufFile(
      nKv: Int, align: Int, modelName: Option[String],
      tensors: Seq[GgufTensor])

  private final class Cur(val b: Array[Byte]) {
    var p: Int = 0
    def need(n: Long): Unit =
      if (n < 0 || p + n > b.length) throw Fail
    def u8(): Int = { need(1); val v = b(p) & 0xff; p += 1; v }
    def u32(): Long = {
      need(4)
      val v = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      p += 4
      v
    }
    /** u64 whose value must fit a nonnegative Long (larger is a bomb). */
    def u64(): Long = {
      need(8)
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
      if (v < 0) throw Fail
      p += 8
      v
    }
  }

  private def str(c: Cur, maxLen: Int = 1 << 16): String = {
    val n = c.u64()
    if (n > maxLen) throw Fail
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

  private def f32(c: Cur): Double = {
    val v = java.lang.Float.intBitsToFloat(c.u32().toInt)
    if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v)) throw Fail
    v.toDouble
  }

  /** Exact IEEE-754 half → double (subnormals included); Inf/NaN reject. */
  private[graft] def halfToDouble(bits: Int): Double = {
    val sign = if ((bits & 0x8000) != 0) -1.0 else 1.0
    val e = (bits >> 10) & 0x1f
    val m = bits & 0x3ff
    if (e == 0x1f) throw Fail // Inf/NaN out of subset
    if (e == 0) sign * m * math.pow(2.0, -24)
    else sign * (1.0 + m / 1024.0) * math.pow(2.0, e - 15)
  }

  /** Skip-validate one metadata value; returns the string payload
    * when the value IS a string (for key projection), else None. */
  private def value(c: Cur, vtype: Long): Option[String] = vtype match {
    case 4 => c.u32(); None // UINT32
    case 6 => f32(c); None // FLOAT32, finiteness enforced
    case 7 => // BOOL: exactly 0 or 1
      val v = c.u8(); if (v > 1) throw Fail; None
    case 8 => Some(str(c))
    case 9 => // ARRAY of STRING or UINT32
      val et = c.u32()
      val n = c.u64()
      if (n > 4096) throw Fail
      var i = 0L
      et match {
        case 8 => while (i < n) { str(c); i += 1 }
        case 4 => while (i < n) { c.u32(); i += 1 }
        case _ => throw Fail
      }
      None
    case 10 => c.u64(); None // UINT64
    case _ => throw Fail // out of subset
  }

  private val KeyChars = "abcdefghijklmnopqrstuvwxyz0123456789._-".toSet

  /** Walk one GGUF blob; None on any spec or subset violation. */
  private[graft] def parseGguf(raw: Array[Byte]): Option[GgufFile] = {
    if (raw == null || raw.length < 24) return None
    try {
      val c = new Cur(raw)
      if (raw(0) != 'G' || raw(1) != 'G' || raw(2) != 'U' || raw(3) != 'F')
        return None
      c.p = 4
      if (c.u32() != 3L) return None // version
      val nTensors = c.u64()
      val nKv = c.u64()
      if (nTensors > 1024 || nKv > 1024) throw Fail

      // metadata
      var align = 32L
      var modelName: Option[String] = None
      val seenKeys = scala.collection.mutable.HashSet.empty[String]
      var k = 0L
      while (k < nKv) {
        val key = str(c, 1 << 10)
        if (key.isEmpty || !key.forall(KeyChars)) throw Fail
        if (!seenKeys.add(key)) throw Fail
        val vtype = c.u32()
        if (key == "general.alignment") {
          if (vtype != 4) throw Fail
          align = c.u32()
          if (align < 8 || align > 4096 ||
              java.lang.Long.bitCount(align) != 1) throw Fail
        } else {
          val sv = value(c, vtype)
          if (key == "general.name") {
            if (sv.isEmpty) throw Fail // must be a STRING value
            modelName = sv
          }
        }
        k += 1
      }

      // tensor infos
      val seenNames = scala.collection.mutable.HashSet.empty[String]
      val infos = new scala.collection.mutable.ArrayBuffer[
        (String, Int, Long, Int, Long)] // name, nd, numel, esz, off
      var expectedOff = 0L
      var t = 0L
      while (t < nTensors) {
        val name = str(c, 256)
        if (name.isEmpty || !seenNames.add(name)) throw Fail
        val nd = c.u32()
        if (nd < 1 || nd > 4) throw Fail
        var numel = 1L
        var d = 0L
        while (d < nd) {
          val dim = c.u64()
          if (dim < 1 || dim > (1L << 20)) throw Fail
          numel *= dim
          if (numel > (1L << 22)) throw Fail // bomb guard
          d += 1
        }
        val gtype = c.u32()
        val esz = gtype match {
          case 0 => 4 // F32
          case 1 => 2 // F16
          case _ => throw Fail // quantized blocks: out of subset
        }
        val off = c.u64()
        if (off != expectedOff || off % align != 0) throw Fail
        val size = numel * esz
        expectedOff = ((off + size + align - 1) / align) * align
        infos += ((name, nd.toInt, numel, esz, off))
        t += 1
      }

      // data section: aligned header end, exact file-end law
      val dataStart = ((c.p + align - 1) / align) * align
      val (lastOff, lastSize) =
        if (infos.isEmpty) (0L, 0L)
        else { val l = infos.last; (l._5, l._3 * l._4) }
      if (dataStart + lastOff + lastSize != raw.length) throw Fail

      val tensors = infos.map { case (name, nd, numel, esz, off) =>
        val base = dataStart + off
        if (base + numel * esz > raw.length) throw Fail
        var sum = 0.0
        var j = 0L
        var p = base.toInt
        if (esz == 4) {
          while (j < numel) {
            val bits = (raw(p) & 0xff) | ((raw(p + 1) & 0xff) << 8) |
              ((raw(p + 2) & 0xff) << 16) | ((raw(p + 3) & 0xff) << 24)
            val v = java.lang.Float.intBitsToFloat(bits)
            if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
              throw Fail
            sum += v
            p += 4; j += 1
          }
          GgufTensor(name, nd, numel, "F32", off, sum)
        } else {
          while (j < numel) {
            val bits = (raw(p) & 0xff) | ((raw(p + 1) & 0xff) << 8)
            sum += halfToDouble(bits)
            p += 2; j += 1
          }
          GgufTensor(name, nd, numel, "F16", off, sum)
        }
      }
      Some(GgufFile(nKv.toInt, align.toInt, modelName, tensors.toSeq))
    } catch { case Fail => None }
  }

  /** One row per tensor; an invalid file yields one flagged row. */
  def extractGguf(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tidx", IntegerType, true),
      StructField("name", StringType, true),
      StructField("dtype", StringType, true),
      StructField("n_dims", IntegerType, true),
      StructField("numel", LongType, true),
      StructField("off", LongType, true),
      StructField("value_sum", DoubleType, true),
      StructField("n_kv", IntegerType, true),
      StructField("align", IntegerType, true),
      StructField("model_name", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseGguf(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(f) if f.tensors.nonEmpty =>
            f.tensors.zipWithIndex.map { case (t, i) =>
              Row(id, i, t.name, t.dtype, t.nDims, t.numel, t.off,
                t.valueSum, f.nKv, f.align, f.modelName.orNull, true)
            }
          case Some(f) => // tensor-less but well-formed file
            Seq(Row(id, null, null, null, null, null, null, null,
              f.nKv, f.align, f.modelName.orNull, true))
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (encode side — test/oracle contract)

  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def encStr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    leBytes(b.length.toLong, 8) ++ b
  }

  /** Exact small-integer → IEEE half bits (fixture values only). */
  private[graft] def halfBits(v: Int): Int = {
    require(v >= -1024 && v <= 1024, "fixture halves must be exact")
    if (v == 0) return 0
    val sign = if (v < 0) 0x8000 else 0
    val a = math.abs(v)
    val e = 31 - Integer.numberOfLeadingZeros(a) // floor(log2 a), ≤ 10
    val m = (a << (10 - e)) - 1024 // a = (1 + m/1024)·2^e exactly
    sign | ((e + 15) << 10) | m
  }

  private def encKv(key: String, vtype: Int, body: Array[Byte]): Array[Byte] =
    encStr(key) ++ leBytes(vtype.toLong, 4) ++ body

  /** Fixture law (replayed closed-form by the oracle):
    * file i: alignment 8·2^(i%4); 6 metadata kvs incl. the alignment,
    * `general.name` = "model-{i%7}", a bool, an f32, a string array;
    * 2+i%3 tensors, tensor t: name "blk.{t}.w", 1+(i+t)%2 dims,
    * d0 = 3+(i+t)%4, d1 = 2+t%3, F32 when (i+t)%2==0 else F16,
    * values v(j) = (i·37 + t·11 + j·3) % 100 − 50, contiguous
    * aligned offsets, file ends at the last tensor byte. */
  def ggufFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val align = 1 << (3 + i % 4)
      val nt = 2 + i % 3
      val kvs: Array[Byte] =
        encKv("general.alignment", 4, leBytes(align.toLong, 4)) ++
          encKv("general.name", 8, encStr(s"model-${i % 7}")) ++
          encKv("general.layer_count", 4, leBytes((2 + i % 3).toLong, 4)) ++
          encKv("graft.flag", 7, Array((i % 2).toByte)) ++
          encKv("graft.scale", 6,
            leBytes(java.lang.Float.floatToIntBits((i % 5).toFloat) & 0xffffffffL, 4)) ++
          encKv("graft.tags", 9,
            leBytes(8L, 4) ++ leBytes(2L, 8) ++ encStr("t0") ++
              encStr(s"t${i % 3}"))
      var off = 0L
      val infos = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
      val datas = new scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]
      (0 until nt).foreach { t =>
        val nd = 1 + (i + t) % 2
        val d0 = 3 + (i + t) % 4
        val d1 = 2 + t % 3
        val numel = if (nd == 1) d0 else d0 * d1
        val f32T = (i + t) % 2 == 0
        val data: Array[Byte] = (0 until numel).flatMap { j =>
          val v = (i * 37 + t * 11 + j * 3) % 100 - 50
          if (f32T) leBytes(java.lang.Float.floatToIntBits(v.toFloat) & 0xffffffffL, 4)
          else leBytes(halfBits(v).toLong, 2)
        }.toArray
        val dims = (if (nd == 1) Seq(d0) else Seq(d0, d1))
          .flatMap(d => leBytes(d.toLong, 8)).toArray
        infos += (encStr(s"blk.$t.w") ++ leBytes(nd.toLong, 4) ++ dims ++
          leBytes(if (f32T) 0L else 1L, 4) ++ leBytes(off, 8))
        datas += ((off, data))
        off = ((off + data.length + align - 1) / align) * align
      }
      val header = "GGUF".getBytes(StandardCharsets.US_ASCII) ++
        leBytes(3L, 4) ++ leBytes(nt.toLong, 8) ++ leBytes(6L, 8) ++
        kvs ++ infos.flatten
      val dataStart = ((header.length + align - 1) / align) * align
      val total = dataStart + datas.last._1 + datas.last._2.length
      val blob = new Array[Byte](total.toInt)
      System.arraycopy(header, 0, blob, 0, header.length)
      datas.foreach { case (o, d) =>
        System.arraycopy(d, 0, blob, (dataStart + o).toInt, d.length)
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
