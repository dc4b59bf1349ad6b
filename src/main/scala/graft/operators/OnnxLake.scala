package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ONNX model-container extraction (onnx.proto, proto3) — the fourth
  * weight format a model-hub crawl yields next to GGUF / SafeTensors /
  * PyTorch checkpoints. A SCHEMA-BOUND closed-subset walk of the
  * ModelProto: initializer tensors are decoded exactly (name / dims /
  * data_type / raw_data with float32 value sums), sibling graph
  * payloads (nodes, inputs, outputs, value_info) are skipped by their
  * LEN framing — wire-validated, never interpreted — and UNKNOWN field
  * numbers reject. Reuses the strict varint discipline proven in
  * [[ProtoLake]] (minimal encodings, 10-byte bound).
  *
  * Closed subset (strict — reject, never guess):
  *  - ModelProto: ir_version (1, varint >= 1, required, at most once),
  *    producer_name/producer_version/domain/doc_string (2/3/4/6,
  *    strict-UTF-8 strings, validated but not carried), model_version
  *    (5, varint), exactly ONE graph (7), opset_import (8, >= 1 entry;
  *    each entry domain (1, string, at most once) + version (2, varint
  *    >= 1, required)); any other field number rejects;
  *  - GraphProto: initializer (5) decoded; name (2, strict UTF-8, at
  *    most once, required); node (1) / doc_string (10) / input (11) /
  *    output (12) / value_info (13) skipped by LEN framing; anything
  *    else rejects;
  *  - TensorProto: dims (1) accepted BOTH packed (proto3's default
  *    LEN-of-varints) and unpacked (repeated varint), each dim in
  *    [1, 2^16], at most 8 dims; data_type (2) must be 1 = FLOAT;
  *    name (8, required, at most once, strict UTF-8); raw_data (9,
  *    required, exactly 4·prod(dims) little-endian float32 bytes, all
  *    values FINITE). float_data (4), segment (3), external
  *    data_location (14) and every other field REJECT — a weights
  *    catalog must not guess at alternative storage encodings;
  *  - every varint minimal and <= 10 bytes; every LEN <= 1 MiB and
  *    tiling its scope exactly; numel <= 2^18 per tensor; a graph with
  *    ZERO initializers rejects (nothing to catalog is a lie in a
  *    weights lake).
  *
  * value_sum is a sequential little-endian-order double sum — the
  * task-local walk is deterministic, so the sum is reproducible and
  * (for integer-valued floats, as all fixtures use) exact.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object OnnxLake {

  private object Fail extends scala.util.control.ControlThrowable

  /** Bounded cursor over one wire scope; children get sub-scopes. */
  private final class Cur(val b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def u8(): Int = {
      if (p >= end) throw Fail
      val v = b(p) & 0xff
      p += 1
      v
    }
    /** ProtoLake's strict varint: <= 10 bytes, minimal, no 64-bit
      * overflow. */
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var last = 0
      var n = 0
      var more = true
      while (more) {
        if (n == 10) throw Fail
        val x = u8()
        if (shift == 63 && (x & 0x7e) != 0) throw Fail
        v |= (x & 0x7fL) << shift
        shift += 7
        last = x
        n += 1
        more = (x & 0x80) != 0
      }
      if (n > 1 && (last & 0x7f) == 0) throw Fail // overlong encoding
      v
    }
    /** LEN field body as a sub-scope (<= 1 MiB, in bounds). */
    def lenBody(): Cur = {
      val n = varint()
      if (n < 0 || n > (1 << 20) || p + n > end) throw Fail
      val c = new Cur(b, p, p + n.toInt)
      p += n.toInt
      c
    }
    /** Whole remaining scope as strict UTF-8. */
    def utf8All(): String = {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val s =
        try dec.decode(java.nio.ByteBuffer.wrap(b, p, end - p)).toString
        catch { case _: java.nio.charset.CharacterCodingException =>
          throw Fail
        }
      p = end
      s
    }
  }

  private[graft] final case class OnnxTensor(
      name: String, nDims: Int, numel: Long, valueSum: Double)
  private[graft] final case class OnnxModel(
      ir: Long, nOpsets: Int, graphName: String, tensors: Seq[OnnxTensor])

  private def opset(c: Cur): Unit = {
    var domain = false
    var version = -1L
    while (c.hasMore) {
      val tag = c.varint()
      ((tag >>> 3), (tag & 7L).toInt) match {
        case (1L, 2) =>
          if (domain) throw Fail
          domain = true
          c.lenBody().utf8All()
        case (2L, 0) =>
          if (version >= 0) throw Fail
          version = c.varint()
          if (version < 1) throw Fail
        case _ => throw Fail
      }
    }
    if (version < 1) throw Fail // version is required
  }

  private def tensor(c: Cur): OnnxTensor = {
    val dims = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dtype = -1L
    var name: Option[String] = None
    var rawOff = -1
    var rawLen = -1
    while (c.hasMore) {
      val tag = c.varint()
      ((tag >>> 3), (tag & 7L).toInt) match {
        case (1L, 0) => // unpacked dim
          val d = c.varint()
          if (d < 1 || d > (1 << 16)) throw Fail
          dims += d
        case (1L, 2) => // packed dims (proto3 default)
          val body = c.lenBody()
          if (!body.hasMore) throw Fail // empty packed run
          while (body.hasMore) {
            val d = body.varint()
            if (d < 1 || d > (1 << 16)) throw Fail
            dims += d
          }
        case (2L, 0) =>
          if (dtype >= 0) throw Fail
          dtype = c.varint()
        case (8L, 2) =>
          if (name.nonEmpty) throw Fail
          name = Some(c.lenBody().utf8All())
        case (9L, 2) =>
          if (rawOff >= 0) throw Fail
          val body = c.lenBody()
          rawOff = body.p
          rawLen = body.end - body.p
        case _ => throw Fail // float_data/segment/external: out of subset
      }
    }
    if (dtype != 1L) throw Fail // FLOAT only
    if (dims.length > 8) throw Fail
    var numel = 1L
    dims.foreach(d => numel *= d) // each <= 2^16, <= 8 dims: no overflow
    if (numel > (1 << 18)) throw Fail
    val nm = name.getOrElse(throw Fail)
    if (nm.isEmpty) throw Fail
    if (rawOff < 0 || rawLen.toLong != 4L * numel) throw Fail
    var sum = 0.0
    var j = 0
    while (j < rawLen) {
      val bits = (c.b(rawOff + j) & 0xff) |
        ((c.b(rawOff + j + 1) & 0xff) << 8) |
        ((c.b(rawOff + j + 2) & 0xff) << 16) |
        ((c.b(rawOff + j + 3) & 0xff) << 24)
      val v = java.lang.Float.intBitsToFloat(bits)
      if (java.lang.Float.isNaN(v) || java.lang.Float.isInfinite(v))
        throw Fail
      sum += v.toDouble
      j += 4
    }
    OnnxTensor(nm, dims.length, numel, sum)
  }

  private def graph(c: Cur): (String, Seq[OnnxTensor]) = {
    var name: Option[String] = None
    val tensors = scala.collection.mutable.ArrayBuffer.empty[OnnxTensor]
    while (c.hasMore) {
      val tag = c.varint()
      ((tag >>> 3), (tag & 7L).toInt) match {
        case (2L, 2) =>
          if (name.nonEmpty) throw Fail
          name = Some(c.lenBody().utf8All())
        case (5L, 2) => tensors += tensor(c.lenBody())
        case (1L, 2) | (10L, 2) | (11L, 2) | (12L, 2) | (13L, 2) =>
          c.lenBody() // node/doc/input/output/value_info: framed skip
        case _ => throw Fail
      }
    }
    val nm = name.getOrElse(throw Fail)
    if (tensors.isEmpty) throw Fail // a weights catalog needs weights
    (nm, tensors.toSeq)
  }

  /** Walk one model; None on any spec or subset violation. */
  private[graft] def parseOnnx(raw: Array[Byte]): Option[OnnxModel] = {
    if (raw == null || raw.length < 4) return None
    try {
      val c = new Cur(raw, 0, raw.length)
      var ir = -1L
      var modelVersion = false
      var nOpsets = 0
      var g: Option[(String, Seq[OnnxTensor])] = None
      val seenStr = scala.collection.mutable.HashSet.empty[Long]
      while (c.hasMore) {
        val tag = c.varint()
        ((tag >>> 3), (tag & 7L).toInt) match {
          case (1L, 0) =>
            if (ir >= 0) throw Fail
            ir = c.varint()
            if (ir < 1) throw Fail
          case (f @ (2L | 3L | 4L | 6L), 2) =>
            if (!seenStr.add(f)) throw Fail
            c.lenBody().utf8All() // validated, not carried
          case (5L, 0) =>
            if (modelVersion) throw Fail
            modelVersion = true
            c.varint()
          case (7L, 2) =>
            if (g.nonEmpty) throw Fail
            g = Some(graph(c.lenBody()))
          case (8L, 2) =>
            opset(c.lenBody())
            nOpsets += 1
          case _ => throw Fail
        }
      }
      if (ir < 1 || nOpsets < 1) throw Fail
      val (gname, tensors) = g.getOrElse(throw Fail)
      Some(OnnxModel(ir, nOpsets, gname, tensors))
    } catch { case Fail => None }
  }

  /** One row per initializer tensor; invalid model → one flagged row. */
  def extractOnnx(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tidx", IntegerType, true),
      StructField("tname", StringType, true),
      StructField("n_dims", IntegerType, true),
      StructField("nelem", LongType, true),
      StructField("value_sum", DoubleType, true),
      StructField("ir", LongType, true),
      StructField("n_opsets", IntegerType, true),
      StructField("gname", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseOnnx(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(m) =>
            m.tensors.zipWithIndex.map { case (t, i) =>
              Row(id, i, t.name, t.nDims, t.numel, t.valueSum, m.ir,
                m.nOpsets, m.graphName, true)
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

  private def vint(v: Long): Array[Byte] = ProtoLake.vint(v)
  private def tagB(fno: Int, wire: Int): Array[Byte] =
    vint((fno.toLong << 3) | wire)
  private def lenField(fno: Int, body: Array[Byte]): Array[Byte] =
    tagB(fno, 2) ++ vint(body.length.toLong) ++ body
  private def strField(fno: Int, s: String): Array[Byte] =
    lenField(fno, s.getBytes(StandardCharsets.UTF_8))
  private def f32le(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array.tabulate(4)(k => ((bits >> (8 * k)) & 0xff).toByte)
  }

  private[graft] def fixtureVal(i: Int, t: Int, j: Long): Int =
    (i * 29 + t * 13 + j.toInt * 5) % 256 - 128

  /** Encode one TensorProto; dims packed or unpacked routes by flag. */
  private[graft] def encTensor(name: String, dims: Seq[Long],
      values: Seq[Float], packedDims: Boolean): Array[Byte] = {
    val dimBytes =
      if (packedDims) lenField(1, dims.flatMap(vint).toArray)
      else dims.flatMap(d => tagB(1, 0) ++ vint(d)).toArray
    dimBytes ++
      (tagB(2, 0) ++ vint(1L)) ++ // data_type FLOAT
      strField(8, name) ++
      lenField(9, values.flatMap(f32le).toArray)
  }

  /** Encode one ModelProto around the given graph fields. */
  private[graft] def encModel(ir: Long, opsets: Seq[(String, Long)],
      gname: String, tensors: Seq[Array[Byte]],
      nodes: Seq[Array[Byte]] = Nil,
      producer: Option[String] = Some("graft")): Array[Byte] = {
    val graphBody =
      nodes.flatMap(lenField(1, _)).toArray ++
        strField(2, gname) ++
        tensors.flatMap(lenField(5, _))
    (tagB(1, 0) ++ vint(ir)) ++
      producer.map(strField(2, _)).getOrElse(Array.emptyByteArray) ++
      lenField(7, graphBody) ++
      opsets.flatMap { case (dom, ver) =>
        lenField(8,
          (if (dom.isEmpty) Array.emptyByteArray else strField(1, dom)) ++
            tagB(2, 0) ++ vint(ver))
      }
  }

  /** Fixture law (replayed closed-form by the oracle): model i has
    * ir = 7+i%3, 1+i%2 opsets, graph "g<i>", 2+i%3 tensors; tensor t
    * has 1+(i+t)%3 dims d0=2+(i+t)%3, d1=1+t%3, d2=2 (the torch
    * shape law, so catalogs can diff the families), name "w.<t>",
    * float32 value j = (i·29+t·13+j·5)%256−128; dims are PACKED for
    * even i+t, unpacked for odd — same decode either way. A skipped
    * NodeProto payload rides along in every graph. */
  def onnxFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nt = 2 + i % 3
      val tensors = (0 until nt).map { t =>
        val nd = 1 + (i + t) % 3
        val dims = Seq(2L + (i + t) % 3, 1L + t % 3, 2L).take(nd)
        val numel = dims.product
        encTensor(s"w.$t", dims,
          (0L until numel).map(j => fixtureVal(i, t, j).toFloat),
          packedDims = (i + t) % 2 == 0)
      }
      val node = strField(1, s"in$i") ++ strField(4, "MatMul")
      val opsets =
        ("", 17L) +: (if (i % 2 == 1) Seq(("ai.graft", 1L + i % 4))
                      else Nil)
      val blob = encModel(7L + i % 3, opsets, s"g$i", tensors,
        nodes = Seq(node))
      Row(i.toLong, blob)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
