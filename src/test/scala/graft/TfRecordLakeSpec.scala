package graft

import graft.operators.TfRecordLake
import graft.operators.TfRecordLake._

/** TFRecord framing (masked CRC32C, exact-EOF walk) + strict
  * tf.Example proto walk: round-trip, the every-single-bit-flip
  * rejection law the double CRC buys, wire/schema strictness matrix,
  * packed≡unpacked scalar lists, wrong-kind projection, fixture-law
  * equality. */
class TfRecordLakeSpec extends SparkSpec {

  // local wire builders for corruption crafting
  private def vEnc(v0: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    var v = v0
    var more = true
    while (more) {
      val b = (v & 0x7f).toInt
      v = v >>> 7
      more = v != 0
      bos.write(if (more) b | 0x80 else b)
    }
    bos.toByteArray
  }
  private def len(field: Int, body: Array[Byte]): Array[Byte] =
    vEnc((field.toLong << 3) | 2) ++ vEnc(body.length.toLong) ++ body
  private def s8(s: String) = s.getBytes("UTF-8")

  private def example(fs: (String, Array[Byte])*): Array[Byte] =
    encExample(fs)

  // ----------------------------------------------------------------
  // framing

  test("round-trip: write → parse → write is byte-identical") {
    val recs = Seq(Array[Byte](1, 2, 3), Array[Byte](), s8("payload"))
    val blob = writeTfRecord(recs)
    val back = parseTfRecord(blob).get
    assert(back.map(_.toSeq) == recs.map(_.toSeq))
    assert(writeTfRecord(back).toSeq == blob.toSeq)
  }

  test("every single-bit flip anywhere in the blob rejects") {
    // the double masked-CRC32C covers length, data and (trivially)
    // the CRC fields themselves — corruption is never localized to
    // one record silently, the whole blob rejects
    val blob = writeTfRecord(Seq(s8("abc"), s8("defgh")))
    for (i <- blob.indices; bit <- 0 until 8) {
      val c = blob.clone(); c(i) = (c(i) ^ (1 << bit)).toByte
      assert(parseTfRecord(c).isEmpty, s"flip byte $i bit $bit")
    }
  }

  test("framing corruption matrix") {
    val blob = writeTfRecord(Seq(s8("abcdef")))
    assert(parseTfRecord(null).isEmpty)
    assert(parseTfRecord(Array[Byte]()).isEmpty)
    assert(parseTfRecord(blob.dropRight(1)).isEmpty, "truncated footer")
    assert(parseTfRecord(blob.take(11)).isEmpty, "truncated header")
    assert(parseTfRecord(blob.take(14)).isEmpty, "truncated data")
    assert(parseTfRecord(blob ++ Array[Byte](0)).isEmpty, "trailing byte")
    assert(parseTfRecord(blob ++ blob.take(12)).isEmpty,
      "second record truncated")
    assert(parseTfRecord(blob ++ blob).get.size == 2, "concatenation ok")
  }

  // ----------------------------------------------------------------
  // proto strictness

  test("wire/schema strictness matrix: every violation rejects") {
    val okFeat = encInt64Feature(Seq(7L))
    val ok = example("a" -> okFeat)
    assert(parseExample(ok).exists(_.map(_._1) == Vector("a")))

    val entry = len(1, s8("a")) ++ len(2, okFeat)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "unknown field in Example" -> (ok ++ len(2, s8("x"))),
      "features field twice" -> (ok ++ ok),
      "varint wire type on features" -> (vEnc((1L << 3) | 0) ++ vEnc(1)),
      "fixed64 wire type" -> (vEnc((1L << 3) | 1) ++ Array.fill[Byte](8)(0)),
      "group wire type" -> vEnc((1L << 3) | 3),
      "field number zero" -> (vEnc(2L) ++ vEnc(0)),
      "map entry missing key" -> len(1, len(1, len(2, okFeat))),
      "map entry missing value" -> len(1, len(1, len(1, s8("a")))),
      "map entry key twice" ->
        len(1, len(1, len(1, s8("a")) ++ len(1, s8("a")) ++ len(2, okFeat))),
      "duplicate map key" -> len(1, len(1, entry) ++ len(1, entry)),
      "bad UTF-8 key" ->
        len(1, len(1, len(1, Array(0xc3.toByte, 0x28.toByte)) ++ len(2, okFeat))),
      "Feature with two kinds" ->
        example("a" -> (encInt64Feature(Seq(1L)) ++ encFloatFeature(Seq(1f)))),
      "empty Feature (oneof unset)" -> example("a" -> Array[Byte]()),
      "unknown Feature field" -> example("a" -> len(4, s8("x"))),
      "packed float length % 4" ->
        example("a" -> len(2, len(1, Array[Byte](0, 0, 0)))),
      "empty packed float run" -> example("a" -> len(2, len(1, Array[Byte]()))),
      "empty packed int64 run" -> example("a" -> len(3, len(1, Array[Byte]()))),
      "non-minimal varint" ->
        example("a" -> len(3, len(1, Array(0x80.toByte, 0x00.toByte)))),
      "11-byte varint" ->
        example("a" -> len(3, len(1, Array.fill[Byte](10)(0x80.toByte) :+ 1.toByte))),
      "10th varint byte > 1" ->
        example("a" -> len(3, len(1, Array.fill[Byte](9)(0x80.toByte) :+ 0x02.toByte))),
      "truncated varint" ->
        example("a" -> len(3, len(1, Array(0x80.toByte)))),
      "length overruns message" -> (vEnc((1L << 3) | 2) ++ vEnc(99)))
    cases.foreach { case (name, rec) =>
      assert(parseExample(rec).isEmpty, name)
    }
  }

  test("packed and per-element scalar encodings decode identically") {
    // unpacked int64: repeated (field 1, wire 0)
    val unpackedI = len(3, vEnc((1L << 3) | 0) ++ vEnc(5) ++
      vEnc((1L << 3) | 0) ++ vEnc(600))
    val pi = parseExample(example("t" -> unpackedI)).get
    assert(pi == Vector("t" -> Int64Vals(Vector(5L, 600L))))
    assert(parseExample(example("t" -> encInt64Feature(Seq(5L, 600L)))).get == pi)
    // unpacked float: repeated (field 1, wire 5)
    def f32(f: Float) = {
      val bb = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putFloat(f); bb.array()
    }
    val unpackedF = len(2, vEnc((1L << 3) | 5) ++ f32(1.5f) ++
      vEnc((1L << 3) | 5) ++ f32(-2.25f))
    val pf = parseExample(example("e" -> unpackedF)).get
    assert(pf == Vector("e" -> FloatVals(Vector(1.5f, -2.25f))))
    assert(parseExample(
      example("e" -> encFloatFeature(Seq(1.5f, -2.25f)))).get == pf)
  }

  test("negative int64 rides the 10-byte varint path exactly") {
    val vals = Seq(-1L, -1000L, Long.MinValue, Long.MaxValue, 0L)
    val got = parseExample(example("t" -> encInt64Feature(vals))).get
    assert(got == Vector("t" -> Int64Vals(vals.toVector)))
  }

  // ----------------------------------------------------------------
  // lake operator

  test("wrong-kind keys project to NULL, not a guess; extras counted") {
    val rec = example(
      "text" -> encInt64Feature(Seq(1L)), // wrong kind
      "tokens" -> encInt64Feature(Seq(2L, 3L)),
      "extra" -> encBytesFeature(Seq(s8("z"))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, writeTfRecord(Seq(rec)))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("media",
          org.apache.spark.sql.types.BinaryType, true))))
    val r = TfRecordLake.extractTfExamples(df, "id", "media").collect().head
    assert(r.getBoolean(9) && r.getInt(2) == 3)
    assert(r.isNullAt(3), "text wrong kind → null")
    assert(r.getLong(4) == 2L && r.getLong(5) == 5L)
    assert(r.isNullAt(6) && r.isNullAt(8))
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = TfRecordLake.extractTfExamples(
      TfRecordLake.tfExampleFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(9)))
    assert(out.length == (0 until 12).map(i => 3 + i % 4).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      val nt = 8 + (i + k) % 5
      assert(r.getString(3) ==
        (0L until nt).map(j => s"w${(i * 7 + k * 3 + j) % 10}").mkString(" "))
      val nk = 4 + (i + k) % 3
      val toks = (0L until nk).map { j =>
        if (j == 0 && (i + k) % 4 == 0) -(i + k + 1) else (i * 5 + k * 11 + j * 3) % 1000
      }
      assert(r.getLong(4) == nk && r.getLong(5) == toks.sum, s"tokens ($i,$k)")
      val d = 8 + (i % 3) * 4
      assert(r.getInt(6) == d)
      assert(r.getLong(7) == (0L until d).map(j => (j * 3 + i + k) % 17).sum)
      if ((i + k) % 5 != 4) {
        assert(r.getInt(2) == 4 && r.getLong(8) == (i + 2 * k) % 7)
      } else assert(r.getInt(2) == 3 && r.isNullAt(8))
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = TfRecordLake.tfExampleFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      parseTfRecord(c).foreach(_.foreach(parseExample)) // must not throw
    }
  }
}
