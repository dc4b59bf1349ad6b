package graft

import org.apache.spark.sql.functions._

import graft.operators.{GgufLake, OnnxLake, TensorCatalog, TensorLake, TorchLake}

/** Tensor-catalog dispatch: path equality vs the dedicated
  * extractors per format, unknown/corrupt routing census,
  * cross-format discrimination. */
class TensorCatalogSpec extends SparkSpec {

  test("path equality: catalog rows equal the dedicated extractors") {
    val out = TensorCatalog.catalogTensors(
      TensorCatalog.tensorCatalogFixture(spark, 6), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(6)))
    // gguf ids (5m): name/numel/sig equal extractGguf's
    val gguf = out.filter(_.getString(1) == "gguf")
    val direct = GgufLake.extractGguf(
      GgufLake.ggufFixture(spark, 6), "id", "media")
      .orderBy("id", "tidx").collect()
    assert(gguf.length == direct.length)
    gguf.zip(direct).foreach { case (c, d) =>
      assert(c.getLong(0) == d.getLong(0) * 5)
      assert(c.getString(3) == d.getString(2)) // name
      assert(c.getLong(4) == d.getLong(5)) // numel
      assert(c.getString(5) == d.getDouble(7).toLong.toString) // sig
    }
    // torch ids (5m+3): sig equals the decoded view sum
    val th = out.filter(_.getString(1) == "torch")
    val thd = TorchLake.extractCheckpoint(
      TorchLake.torchFixture(spark, 6), "id", "media")
      .orderBy("id", "tidx").collect()
    assert(th.length == thd.length)
    th.zip(thd).foreach { case (c, d) =>
      assert(c.getLong(0) == d.getLong(0) * 5 + 3)
      assert(c.getString(3) == d.getString(2))
      assert(c.getString(5) == d.getDouble(9).toLong.toString)
    }
    // safetensors (5m+1) and npy (5m+2): digests equal the Catalyst
    // extractors'
    val st = out.filter(_.getString(1) == "safetensors")
    val std = TensorLake.extractSafetensors(
      TensorLake.safetensorsFixture(spark, 6), "id", "media")
      .orderBy("id", "name").collect()
    assert(st.map(r => (r.getLong(0), r.getString(3), r.getString(5)))
      .toSeq ==
      std.map(r => (r.getLong(0) * 5 + 1, r.getString(1),
        r.getString(8))).toSeq)
    val np = out.filter(_.getString(1) == "npy")
    assert(np.length == 6 && np.forall(r => r.getInt(2) == 0))
    // onnx ids (5m+4): sig equals the decoded float32 value sum
    val ox = out.filter(_.getString(1) == "onnx")
    val oxd = OnnxLake.extractOnnx(
      OnnxLake.onnxFixture(spark, 6), "id", "media")
      .orderBy("id", "tidx").collect()
    assert(ox.length == oxd.length)
    ox.zip(oxd).foreach { case (c, d) =>
      assert(c.getLong(0) == d.getLong(0) * 5 + 4)
      assert(c.getString(3) == d.getString(2)) // name
      assert(c.getLong(4) == d.getLong(4)) // nelem
      assert(c.getString(5) == d.getDouble(5).toLong.toString) // sig
    }
  }

  test("unknown and corrupt blobs census as valid=false, never error") {
    import spark.implicits._
    val junk = Seq(
      (0L, "not a tensor at all".getBytes("UTF-8")),
      (1L, Array.fill[Byte](64)(0x41)), // 'A'*64: no magic, 9th != '{'
      (2L, "GGUF".getBytes("UTF-8") ++ Array.fill[Byte](20)(7)), // bad gguf
      (3L, "PK".getBytes("UTF-8") ++ Array.fill[Byte](30)(1)), // bad zip
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "media")
    val out = TensorCatalog.catalogTensors(junk, "id", "media")
      .orderBy("id").collect()
    assert(out.length == 5 && out.forall(!_.getBoolean(6)))
    // sniff still classifies the magic-bearing corrupt blobs
    assert(out(2).getString(1) == "gguf" && out(3).getString(1) == "torch")
    assert(out(0).getString(1) == "unknown")
  }

  test("cross-format discrimination: no blob reaches a wrong branch") {
    // every fixture blob must be routed to its own family — count per
    // (id % 5, fmt) is diagonal
    val fx = TensorCatalog.tensorCatalogFixture(spark, 8)
    val routed = TensorCatalog.catalogTensors(fx, "id", "media")
      .select(pmod(col("id"), lit(5)).as("f"), col("fmt"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(routed == Set((0L, "gguf"), (1L, "safetensors"),
      (2L, "npy"), (3L, "torch"), (4L, "onnx")))
  }
}
