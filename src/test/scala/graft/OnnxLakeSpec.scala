package graft

import graft.operators.{OnnxLake, ProtoLake}

/** ONNX ModelProto closed-subset walk: fixture laws, packed/unpacked
  * dim equivalence, framed skips, strictness matrix, fuzz sweeps. */
class OnnxLakeSpec extends SparkSpec {

  // wire helpers (the lie-building side; the operator's own encoders
  // cover the healthy shapes)
  private def vint(v: Long): Array[Byte] = ProtoLake.vint(v)
  private def tag(f: Int, w: Int): Array[Byte] = vint((f.toLong << 3) | w)
  private def lenf(f: Int, b: Array[Byte]): Array[Byte] =
    tag(f, 2) ++ vint(b.length.toLong) ++ b
  private def sf(f: Int, s: String): Array[Byte] =
    lenf(f, s.getBytes("UTF-8"))
  private def f32(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array.tabulate(4)(k => ((bits >> (8 * k)) & 0xff).toByte)
  }
  private def ir(v: Long): Array[Byte] = tag(1, 0) ++ vint(v)
  private def opset(ver: Long): Array[Byte] =
    lenf(8, tag(2, 0) ++ vint(ver))
  // minimal healthy tensor: name "t", scalar value 3.0
  private def okTensor: Array[Byte] =
    (tag(2, 0) ++ vint(1L)) ++ sf(8, "t") ++ lenf(9, f32(3f))
  private def model(graphBody: Array[Byte]): Array[Byte] =
    ir(8) ++ lenf(7, graphBody) ++ opset(17)
  private def okGraph(tensors: Array[Byte]*): Array[Byte] =
    sf(2, "g") ++ tensors.flatMap(lenf(5, _))

  test("fixture laws replay through the DataFrame surface") {
    val out = OnnxLake.extractOnnx(OnnxLake.onnxFixture(spark, 6),
      "id", "media").orderBy("id", "tidx").collect()
    var idx = 0
    for (i <- 0 until 6; t <- 0 until (2 + i % 3)) {
      val r = out(idx); idx += 1
      val nd = 1 + (i + t) % 3
      val dims = Seq(2L + (i + t) % 3, 1L + t % 3, 2L).take(nd)
      val nelem = dims.product
      assert(r.getAs[Boolean]("valid"))
      assert(r.getAs[String]("tname") == s"w.$t")
      assert(r.getAs[Int]("n_dims") == nd)
      assert(r.getAs[Long]("nelem") == nelem)
      assert(r.getAs[Double]("value_sum") ==
        (0L until nelem).map(j => OnnxLake.fixtureVal(i, t, j)).sum.toDouble)
      assert(r.getAs[Long]("ir") == 7L + i % 3)
      assert(r.getAs[Int]("n_opsets") == 1 + i % 2)
      assert(r.getAs[String]("gname") == s"g$i")
    }
    assert(idx == out.length)
  }

  test("packed and unpacked dims decode identically; scalars parse") {
    val vals = Seq(1f, -2f, 3f, 4f, -5f, 6f)
    val packed = OnnxLake.encTensor("w", Seq(2L, 3L), vals,
      packedDims = true)
    val unpacked = OnnxLake.encTensor("w", Seq(2L, 3L), vals,
      packedDims = false)
    val mp = OnnxLake.parseOnnx(model(okGraph(packed))).get
    val mu = OnnxLake.parseOnnx(model(okGraph(unpacked))).get
    assert(mp.tensors == mu.tensors)
    assert(mp.tensors.head.numel == 6L && mp.tensors.head.valueSum == 7.0)
    // a scalar (zero dims) is one float
    val sc = OnnxLake.parseOnnx(model(okGraph(okTensor))).get
    assert(sc.tensors.head.numel == 1L && sc.tensors.head.valueSum == 3.0)
    assert(sc.ir == 8L && sc.nOpsets == 1 && sc.graphName == "g")
  }

  test("graph payloads are skipped by LEN framing, never interpreted") {
    // node/input/output/value_info/doc carry arbitrary bytes — even
    // bytes that would be invalid protobuf — and the walk still lands
    val junk = Array[Byte](0xff.toByte, 0xff.toByte, 7, 0)
    val g = lenf(1, junk) ++ sf(2, "g") ++ lenf(5, okTensor) ++
      lenf(10, junk) ++ lenf(11, junk) ++ lenf(12, junk) ++ lenf(13, junk)
    assert(OnnxLake.parseOnnx(model(g)).nonEmpty)
  }

  test("strictness matrix: every subset lie rejects, never throws") {
    val cases: Seq[(String, Array[Byte])] = Seq(
      "no graph" -> (ir(8) ++ opset(17)),
      "two graphs" -> (ir(8) ++ lenf(7, okGraph(okTensor)) ++
        lenf(7, okGraph(okTensor)) ++ opset(17)),
      "no opset" -> (ir(8) ++ lenf(7, okGraph(okTensor))),
      "opset without version" -> (ir(8) ++ lenf(7, okGraph(okTensor)) ++
        lenf(8, sf(1, "d"))),
      "opset version zero" -> (ir(8) ++ lenf(7, okGraph(okTensor)) ++
        lenf(8, tag(2, 0) ++ vint(0L))),
      "no ir_version" -> (lenf(7, okGraph(okTensor)) ++ opset(17)),
      "ir_version twice" -> (ir(8) ++ ir(8) ++
        lenf(7, okGraph(okTensor)) ++ opset(17)),
      "ir_version zero" -> (ir(0) ++ lenf(7, okGraph(okTensor)) ++
        opset(17)),
      "unknown model field" -> (ir(8) ++ lenf(7, okGraph(okTensor)) ++
        opset(17) ++ lenf(20, Array[Byte](1))),
      "unknown graph field" ->
        model(okGraph(okTensor) ++ lenf(14, Array[Byte](1))),
      "graph without name" -> model(lenf(5, okTensor)),
      "graph with zero initializers" -> model(sf(2, "g")),
      "non-FLOAT dtype" -> model(okGraph(
        (tag(2, 0) ++ vint(7L)) ++ sf(8, "t") ++
          lenf(9, Array.fill[Byte](8)(0)))),
      "missing dtype" -> model(okGraph(sf(8, "t") ++ lenf(9, f32(1f)))),
      "float_data out of subset" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ lenf(4, f32(1f)) ++ sf(8, "t"))),
      "segment out of subset" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ lenf(3, Array[Byte](8, 0)) ++
          sf(8, "t") ++ lenf(9, f32(1f)))),
      "external data_location" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ sf(8, "t") ++ lenf(9, f32(1f)) ++
          tag(14, 0) ++ vint(1L))),
      "tensor without name" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ lenf(9, f32(1f)))),
      "tensor name twice" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ sf(8, "t") ++ sf(8, "t") ++
          lenf(9, f32(1f)))),
      "empty tensor name" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ sf(8, "") ++ lenf(9, f32(1f)))),
      "raw_data length mismatch" -> model(okGraph(
        (tag(1, 0) ++ vint(2L)) ++ (tag(2, 0) ++ vint(1L)) ++
          sf(8, "t") ++ lenf(9, f32(1f)))),
      "NaN value" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ sf(8, "t") ++
          lenf(9, f32(Float.NaN)))),
      "infinite value" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++ sf(8, "t") ++
          lenf(9, f32(Float.PositiveInfinity)))),
      "zero dim" -> model(okGraph(
        (tag(1, 0) ++ vint(0L)) ++ (tag(2, 0) ++ vint(1L)) ++
          sf(8, "t") ++ lenf(9, Array.emptyByteArray))),
      "empty packed dims run" -> model(okGraph(
        lenf(1, Array.emptyByteArray) ++ (tag(2, 0) ++ vint(1L)) ++
          sf(8, "t") ++ lenf(9, f32(1f)))),
      "overlong varint" -> (Array[Byte](0x08, 0x88.toByte, 0x00) ++
        lenf(7, okGraph(okTensor)) ++ opset(17)),
      "LEN overruns scope" -> (ir(8) ++ tag(7, 2) ++ vint(9999L)),
      "trailing garbage" -> (model(okGraph(okTensor)) ++
        Array[Byte](0xff.toByte)),
      "non-UTF8 tensor name" -> model(okGraph(
        (tag(2, 0) ++ vint(1L)) ++
          lenf(8, Array[Byte](0xff.toByte)) ++ lenf(9, f32(1f)))),
      "wire type 5 in model" -> (ir(8) ++ lenf(7, okGraph(okTensor)) ++
        opset(17) ++ tag(5, 5) ++ Array[Byte](1, 2, 3, 4)),
      "group wire type" -> (tag(1, 3) ++ lenf(7, okGraph(okTensor))))
    cases.foreach { case (name, b) =>
      assert(OnnxLake.parseOnnx(b).isEmpty, name)
    }
    assert(OnnxLake.parseOnnx(null).isEmpty)
    assert(OnnxLake.parseOnnx(Array.emptyByteArray).isEmpty)
    assert(OnnxLake.parseOnnx(model(okGraph(okTensor))).nonEmpty,
      "control: healthy model parses")
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = OnnxLake.onnxFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      OnnxLake.parseOnnx(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => OnnxLake.parseOnnx(s0.take(n)))
  }
}
