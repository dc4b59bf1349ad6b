package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord + tf.Example ingestion — the canonical ML training-data
  * container (TensorFlow's `tf.data.TFRecordDataset` format; the
  * framing and proto schemas are published in the TensorFlow repo:
  * `tensorflow/core/lib/io/record_writer.cc` for the record layout,
  * `tensorflow/core/example/example.proto` + `feature.proto` for the
  * payload). A 100 TB pretraining corpus routinely arrives as shards
  * of exactly this shape, so decoding it inside the engine — one
  * blob = one task-local walk, no Python round-trip — is a
  * first-class lake operator, not glue.
  *
  * Framing (verified, never assumed):
  *
  *  - each record is `len:u64le  masked_crc32c(len):u32le  data[len]
  *    masked_crc32c(data):u32le`, where the mask is the published
  *    `((crc >> 15) | (crc << 17)) + 0xa282ead8` rotation — BOTH
  *    CRCs are checked (flip any byte of data or header and the
  *    whole blob rejects), the walk must land exactly on EOF, and
  *    at least one record must be present;
  *
  * Payload: a STRICT protobuf wire-format subset tuned to
  * `tf.train.Example`:
  *
  *  - varints are canonical (minimal length, ≤10 bytes) — proto
  *    serializers never emit redundant continuation groups, so a
  *    non-minimal varint is corruption, not style;
  *  - wire types 3/4 (groups, removed in proto3) reject; UNKNOWN
  *    field numbers reject (the schema is closed — a stray field in
  *    a corpus shard means the shard is not tf.Example);
  *  - `Example.features` at most once; map entries carry key
  *    (strict UTF-8) and Feature value each exactly once; DUPLICATE
  *    map keys reject (proto map semantics would last-wins them —
  *    silent data loss in a provenance-sensitive pipeline);
  *  - `Feature` is a oneof: exactly one of bytes_list / float_list /
  *    int64_list; scalar lists accept both PACKED (wire 2) and
  *    per-element encodings (wire 5 floats / wire 0 int64s),
  *    concatenated in order, per the proto3 parse rules.
  *
  * The well-known pretraining keys (`text` bytes, `tokens` int64
  * list, `embedding` float list, `label` int64) are projected to
  * typed columns; a key of the wrong kind yields NULL for its
  * column, never a guess. Embedding checksums leave the engine as
  * exact integers (the fixture's floats are eighths, so ×8 is
  * integer-exact in both engines — the codec-family cross-engine
  * float discipline).
  */
object TfRecordLake {

  // ------------------------------------------------------------------
  // TFRecord framing

  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt // CRC32C is 32-bit; wrap-around math below is intended
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def u32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def u64le(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }

  /** Split one TFRecord blob into its record payloads; None on any
    * framing or checksum violation. */
  private[graft] def parseTfRecord(raw: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (raw == null || raw.length < 16) return None
    val out = Seq.newBuilder[Array[Byte]]
    var p = 0
    var n = 0
    while (p < raw.length) {
      if (raw.length - p < 12) return None
      val len = u64le(raw, p)
      if (len < 0 || len > raw.length - p - 16) return None
      if (u32le(raw, p + 8) != maskedCrc(raw, p, 8)) return None
      val l = len.toInt
      if (u32le(raw, p + 12 + l) != maskedCrc(raw, p + 12, l)) return None
      out += java.util.Arrays.copyOfRange(raw, p + 12, p + 12 + l)
      p += 16 + l
      n += 1
    }
    if (n == 0) None else Some(out.result())
  }

  /** Frame payloads as a TFRecord blob (fixture/round-trip side). */
  private[graft] def writeTfRecord(recs: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    recs.foreach { r =>
      val hdr = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putLong(r.length.toLong)
      hdr.putInt(8, maskedCrc(hdr.array(), 0, 8))
      bos.write(hdr.array())
      bos.write(r)
      val ftr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      ftr.putInt(maskedCrc(r, 0, r.length))
      bos.write(ftr.array())
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // strict protobuf wire reader

  private object Fail extends scala.util.control.ControlThrowable

  private final class PReader(b: Array[Byte], var p: Int, val end: Int) {
    def backing: Array[Byte] = b
    def fail(): Nothing = throw Fail
    def atEnd: Boolean = p >= end
    /** Canonical varint: minimal encoding, ≤10 bytes. */
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var nb = 0
      var last = 0
      var more = true
      while (more) {
        if (p >= end || nb == 10) fail()
        val x = b(p) & 0xff
        p += 1
        nb += 1
        last = x & 0x7f
        if (nb == 10 && last > 1) fail() // only bit 63 fits in byte 10
        v |= (last.toLong << shift)
        shift += 7
        more = (x & 0x80) != 0
      }
      if (nb > 1 && last == 0) fail() // non-minimal
      v
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || n > end - p) fail()
      val r = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n
      r
    }
    def lenDelim(): (Int, Int) = { // (start, end) without copying
      val n = varint()
      if (n < 0 || n > end - p) fail()
      val s = p
      p += n.toInt
      (s, p)
    }
    def f32(): Float = {
      if (end - p < 4) fail()
      val v = java.lang.Float.intBitsToFloat(u32le(b, p))
      p += 4
      v
    }
    def key(): (Int, Int) = { // (fieldNo, wireType)
      val k = varint()
      val w = (k & 7).toInt
      val f = (k >>> 3).toInt
      if (f <= 0 || w == 3 || w == 4 || w == 1) fail()
      (f, w)
    }
    def sub(): PReader = {
      val (s, e) = lenDelim()
      new PReader(b, s, e)
    }
  }

  private def strictUtf8(b: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(ByteBuffer.wrap(b)).toString
    catch { case _: java.nio.charset.CharacterCodingException => throw Fail }
  }

  // ------------------------------------------------------------------
  // tf.Example walk

  private[graft] sealed trait FeatureVal
  private[graft] final case class BytesVals(v: Vector[Array[Byte]]) extends FeatureVal
  private[graft] final case class FloatVals(v: Vector[Float]) extends FeatureVal
  private[graft] final case class Int64Vals(v: Vector[Long]) extends FeatureVal

  private def parseExampleFeatures(r: PReader): Vector[(String, FeatureVal)] = {
    // Example { Features features = 1; }
    var features: Option[PReader] = None
    while (!r.atEnd) {
      val (f, w) = r.key()
      if (f != 1 || w != 2) r.fail()
      if (features.nonEmpty) r.fail() // singular field twice
      features = Some(r.sub())
    }
    val out = Vector.newBuilder[(String, FeatureVal)]
    val seen = scala.collection.mutable.HashSet.empty[String]
    features.foreach { fr =>
      // Features { map<string, Feature> feature = 1; }
      while (!fr.atEnd) {
        val (f, w) = fr.key()
        if (f != 1 || w != 2) fr.fail()
        val er = fr.sub()
        // MapEntry { string key = 1; Feature value = 2; }
        var k: Option[String] = None
        var v: Option[FeatureVal] = None
        while (!er.atEnd) {
          val (ef, ew) = er.key()
          if (ew != 2) er.fail()
          ef match {
            case 1 =>
              if (k.nonEmpty) er.fail()
              val (s, e) = er.lenDelim()
              k = Some(strictUtf8(java.util.Arrays.copyOfRange(
                er.backing, s, e)))
            case 2 =>
              if (v.nonEmpty) er.fail()
              v = Some(parseFeature(er.sub()))
            case _ => er.fail()
          }
        }
        val kk = k.getOrElse(er.fail())
        val vv = v.getOrElse(er.fail())
        if (!seen.add(kk)) er.fail() // duplicate map key
        out += ((kk, vv))
      }
    }
    out.result()
  }

  private def parseFeature(r: PReader): FeatureVal = {
    // Feature { oneof { BytesList 1; FloatList 2; Int64List 3; } }
    var kind = 0
    var sub: PReader = null
    while (!r.atEnd) {
      val (f, w) = r.key()
      if (w != 2 || f < 1 || f > 3) r.fail()
      if (kind != 0) r.fail() // oneof set twice
      kind = f
      sub = r.sub()
    }
    kind match {
      case 1 =>
        val out = Vector.newBuilder[Array[Byte]]
        while (!sub.atEnd) {
          val (f, w) = sub.key()
          if (f != 1 || w != 2) sub.fail()
          val (s, e) = sub.lenDelim()
          out += java.util.Arrays.copyOfRange(sub.backing, s, e)
        }
        BytesVals(out.result())
      case 2 =>
        val out = Vector.newBuilder[Float]
        while (!sub.atEnd) {
          val (f, w) = sub.key()
          if (f != 1) sub.fail()
          if (w == 2) { // packed
            val (s, e) = sub.lenDelim()
            if (e == s || (e - s) % 4 != 0) sub.fail() // empty run is non-canonical
            var q = s
            while (q < e) {
              out += java.lang.Float.intBitsToFloat(u32le(sub.backing, q))
              q += 4
            }
          } else if (w == 5) out += sub.f32()
          else sub.fail()
        }
        FloatVals(out.result())
      case 3 =>
        val out = Vector.newBuilder[Long]
        while (!sub.atEnd) {
          val (f, w) = sub.key()
          if (f != 1) sub.fail()
          if (w == 2) { // packed
            val (s, e) = sub.lenDelim()
            val pr = new PReader(sub.backing, s, e)
            if (pr.atEnd) sub.fail() // empty packed run is non-canonical
            while (!pr.atEnd) out += pr.varint()
          } else if (w == 0) out += sub.varint()
          else sub.fail()
        }
        Int64Vals(out.result())
      case _ => r.fail() // empty Feature: oneof unset
    }
  }

  /** Decode one tf.Example payload into its ordered feature map;
    * None on any wire or schema violation. */
  private[graft] def parseExample(rec: Array[Byte]): Option[Vector[(String, FeatureVal)]] =
    try Some(parseExampleFeatures(new PReader(rec, 0, rec.length)))
    catch { case Fail => None }

  // ------------------------------------------------------------------
  // lake operator

  /** Explode a TFRecord-media table into per-example rows with the
    * well-known pretraining keys projected to typed columns. */
  def extractTfExamples(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rec", IntegerType, true),
      StructField("n_feat", IntegerType, true),
      StructField("text", StringType, true),
      StructField("n_tokens", LongType, true),
      StructField("tok_sum", LongType, true),
      StructField("emb_dim", IntegerType, true),
      StructField("emb_sum_x8", LongType, true),
      StructField("label", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        val parsed = scala.util.Try {
          parseTfRecord(r.getAs[Array[Byte]](1)).flatMap { recs =>
            val exs = recs.map(parseExample)
            if (exs.exists(_.isEmpty)) None else Some(exs.map(_.get))
          }
        }.toOption.flatten
        parsed match {
          case Some(exs) => exs.zipWithIndex.map { case (fs, k) =>
            val m = fs.toMap
            val text = m.get("text") match {
              case Some(BytesVals(Vector(one))) =>
                try strictUtf8(one) catch { case Fail => null }
              case _ => null
            }
            val (nTok, tokSum) = m.get("tokens") match {
              case Some(Int64Vals(v)) => (Long.box(v.size.toLong), Long.box(v.sum))
              case _ => (null, null)
            }
            val (embDim, embSum) = m.get("embedding") match {
              case Some(FloatVals(v)) =>
                (Int.box(v.size),
                  Long.box(v.map(f => math.round(f * 8f).toLong).sum))
              case _ => (null, null)
            }
            val label = m.get("label") match {
              case Some(Int64Vals(Vector(one))) => Long.box(one)
              case _ => null
            }
            Row(id, k, fs.size, text, nTok, tokSum, embDim, embSum,
              label, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // proto encoder + fixture (test side)

  private def vEnc(bos: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    var more = true
    while (more) {
      val b = (v & 0x7f).toInt
      v = v >>> 7
      more = v != 0
      bos.write(if (more) b | 0x80 else b)
    }
  }

  private def lenField(bos: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    vEnc(bos, (field.toLong << 3) | 2)
    vEnc(bos, body.length.toLong)
    bos.write(body)
  }

  private def msg(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    f(bos)
    bos.toByteArray
  }

  private[graft] def encBytesFeature(v: Seq[Array[Byte]]): Array[Byte] =
    msg { bos =>
      lenField(bos, 1, msg(b => v.foreach(x => lenField(b, 1, x))))
    }

  private[graft] def encFloatFeature(v: Seq[Float]): Array[Byte] =
    msg { bos =>
      lenField(bos, 2, msg { b =>
        val pk = ByteBuffer.allocate(4 * v.size).order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(pk.putFloat)
        lenField(b, 1, pk.array())
      })
    }

  private[graft] def encInt64Feature(v: Seq[Long]): Array[Byte] =
    msg { bos =>
      lenField(bos, 3, msg { b =>
        lenField(b, 1, msg(pb => v.foreach(x => vEnc(pb, x))))
      })
    }

  private[graft] def encExample(fs: Seq[(String, Array[Byte])]): Array[Byte] =
    msg { bos =>
      lenField(bos, 1, msg { fb =>
        fs.foreach { case (k, feat) =>
          lenField(fb, 1, msg { eb =>
            lenField(eb, 1, k.getBytes(StandardCharsets.UTF_8))
            lenField(eb, 2, feat)
          })
        }
      })
    }

  /** Fixture: shard i carries 3 + i%4 examples. Text tokens follow
    * the feed/tar word law; the int64 `tokens` list plants a NEGATIVE
    * value every fourth example (the 10-byte varint path); embeddings
    * are exact eighths so the ×8 checksum is integer; `label` is
    * absent every fifth example (nullable-column coverage); map-entry
    * order rotates per example so decode order ≠ key order. */
  def tfExampleFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nr = 3 + i % 4
      val recs = (0 until nr).map { k =>
        val nt = 8 + (i + k) % 5
        val text = (0 until nt).map(j => s"w${(i * 7 + k * 3 + j) % 10}")
          .mkString(" ")
        val nk = 4 + (i + k) % 3
        val toks = (0 until nk).map { j =>
          if (j == 0 && (i + k) % 4 == 0) -(i + k + 1).toLong
          else ((i * 5 + k * 11 + j * 3) % 1000).toLong
        }
        val d = 8 + (i % 3) * 4
        val emb = (0 until d).map(j => ((j * 3 + i + k) % 17) / 8.0f)
        val base = Vector(
          "text" -> encBytesFeature(Seq(text.getBytes(StandardCharsets.UTF_8))),
          "tokens" -> encInt64Feature(toks),
          "embedding" -> encFloatFeature(emb)) ++
          (if ((i + k) % 5 != 4)
            Vector("label" -> encInt64Feature(Seq(((i + 2 * k) % 7).toLong)))
          else Vector.empty)
        val rot = k % base.size
        encExample(base.drop(rot) ++ base.take(rot))
      }
      Row(i.toLong, writeTfRecord(recs))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
