package graft

import graft.operators.GgufLake

/** GGUF walk: fixture-law equality (independent value-sum replay),
  * default-alignment path, subset strictness matrix over hand-built
  * files, byte-flip + truncation sweeps. */
class GgufLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = GgufLake.extractGguf(
      GgufLake.ggufFixture(spark, 12), "id", "media")
      .orderBy("id", "tidx").collect()
    assert(out.forall(_.getBoolean(11)))
    var k = 0
    (0 until 12).foreach { i =>
      val al = 1 << (3 + i % 4)
      val nt = 2 + i % 3
      var off = 0L
      (0 until nt).foreach { t =>
        val r = out(k); k += 1
        val nd = 1 + (i + t) % 2
        val d0 = 3 + (i + t) % 4
        val numel = if (nd == 1) d0 else d0 * (2 + t % 3)
        val esz = if ((i + t) % 2 == 0) 4 else 2
        assert(r.getLong(0) == i && r.getInt(1) == t)
        assert(r.getString(2) == s"blk.$t.w")
        assert(r.getString(3) == (if (esz == 4) "F32" else "F16"))
        assert(r.getInt(4) == nd && r.getLong(5) == numel)
        assert(r.getLong(6) == off, s"offset law file $i tensor $t")
        val want = (0 until numel)
          .map(j => (i * 37 + t * 11 + j * 3) % 100 - 50).sum.toDouble
        assert(r.getDouble(7) == want, s"value sum file $i tensor $t")
        assert(r.getInt(8) == 6 && r.getInt(9) == al)
        assert(r.getString(10) == s"model-${i % 7}")
        off = ((off + numel.toLong * esz + al - 1) / al) * al
      }
    }
    assert(k == out.length)
  }

  // ------------------------------------------------------------------
  // independent mini-encoder (spec-side, NOT the fixture's)

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def s8(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8"); le(b.length.toLong, 8) ++ b
  }
  /** One F32 tensor "w" of the given values, one general.name kv,
    * DEFAULT 32 alignment (no alignment kv — exercises the default). */
  private def tiny(values: Seq[Int],
      nameKv: String = "general.name"): Array[Byte] = {
    val kv = s8(nameKv) ++ le(8, 4) ++ s8("m")
    val info = s8("w") ++ le(1, 4) ++ le(values.length.toLong, 8) ++
      le(0, 4) ++ le(0, 8)
    val header = "GGUF".getBytes("US-ASCII") ++ le(3, 4) ++ le(1, 8) ++
      le(1, 8) ++ kv ++ info
    val dataStart = ((header.length + 31) / 32) * 32
    val data = values.flatMap(v =>
      le(java.lang.Float.floatToIntBits(v.toFloat) & 0xffffffffL, 4))
    val blob = new Array[Byte](dataStart + data.length)
    System.arraycopy(header, 0, blob, 0, header.length)
    System.arraycopy(data.toArray, 0, blob, dataStart, data.length)
    blob
  }

  test("default alignment (no general.alignment kv) parses at 32") {
    val f = GgufLake.parseGguf(tiny(Seq(1, 2, 3))).get
    assert(f.align == 32 && f.nKv == 1 && f.modelName.contains("m"))
    assert(f.tensors.map(_.valueSum) == Seq(6.0))
  }

  test("strictness matrix: every subset lie rejects, never throws") {
    val ok = tiny(Seq(1, 2))
    assert(GgufLake.parseGguf(ok).nonEmpty)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = ok.clone(); f(c); c
    }
    // header end (kv: 8+12 name +4 type +8+1 val = 33; after magic+counts 24)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> mut(_(0) = 'g'),
      "version 2" -> mut(_(4) = 2),
      "version 4" -> mut(_(4) = 4),
      "tensor-count bomb" -> mut(_(14) = 1), // 1 + (1<<48)
      "kv-count bomb" -> mut(_(22) = 1),
      "truncated header" -> ok.take(30),
      "truncated data" -> ok.take(ok.length - 1),
      "trailing byte" -> (ok ++ Array[Byte](0)),
      "empty file" -> Array.emptyByteArray,
      // key "General.name": uppercase G is outside [a-z0-9._-]
      "bad key char" -> mut(_(32) = 'G'),
      "NaN payload" -> mut { c =>
        val ds = ((c.length - 8) / 32) * 32 // dataStart for 2 floats
        c(ds + 2) = 0xc0.toByte; c(ds + 3) = 0x7f.toByte // 0x7fc0_0000
      })
    cases.foreach { case (name, b) =>
      assert(GgufLake.parseGguf(b).isEmpty, name)
    }
    assert(GgufLake.parseGguf(null).isEmpty)
  }

  test("hand-built lies: value types, alignment, dims, offsets") {
    def file(kvs: Seq[Array[Byte]], infos: Seq[Array[Byte]],
        data: Array[Byte], align: Int = 32): Array[Byte] = {
      val header = "GGUF".getBytes("US-ASCII") ++ le(3, 4) ++
        le(infos.length.toLong, 8) ++ le(kvs.length.toLong, 8) ++
        kvs.flatten ++ infos.flatten
      val dataStart = ((header.length + align - 1) / align) * align
      val blob = new Array[Byte](dataStart + data.length)
      System.arraycopy(header, 0, blob, 0, header.length)
      System.arraycopy(data, 0, blob, dataStart, data.length)
      blob
    }
    def kv(key: String, t: Int, body: Array[Byte]) =
      s8(key) ++ le(t.toLong, 4) ++ body
    def info(name: String, dims: Seq[Long], gt: Int, off: Long) =
      s8(name) ++ le(dims.length.toLong, 4) ++
        dims.flatMap(d => le(d, 8)).toArray ++ le(gt.toLong, 4) ++ le(off, 8)
    val f32x2 = le(java.lang.Float.floatToIntBits(1f) & 0xffffffffL, 4) ++
      le(java.lang.Float.floatToIntBits(2f) & 0xffffffffL, 4)

    // sanity: the builder itself produces a parseable file
    assert(GgufLake.parseGguf(file(Seq(kv("k", 10, le(7, 8))),
      Seq(info("w", Seq(2), 0, 0)), f32x2)).nonEmpty)

    val cases: Seq[(String, Array[Byte])] = Seq(
      "i32 value type (5) out of subset" ->
        file(Seq(kv("k", 5, le(7, 4))), Seq(info("w", Seq(2), 0, 0)), f32x2),
      "f64 value type (12) out of subset" ->
        file(Seq(kv("k", 12, le(0, 8))), Seq(info("w", Seq(2), 0, 0)), f32x2),
      "bool byte 2" ->
        file(Seq(kv("k", 7, Array[Byte](2))), Seq(info("w", Seq(2), 0, 0)), f32x2),
      "array of bools out of subset" ->
        file(Seq(kv("k", 9, le(7, 4) ++ le(1, 8) ++ Array[Byte](1))),
          Seq(info("w", Seq(2), 0, 0)), f32x2),
      "duplicate key" ->
        file(Seq(kv("k", 10, le(1, 8)), kv("k", 10, le(2, 8))),
          Seq(info("w", Seq(2), 0, 0)), f32x2),
      "empty key" ->
        file(Seq(kv("", 10, le(1, 8))), Seq(info("w", Seq(2), 0, 0)), f32x2),
      "alignment 4 (< 8)" ->
        file(Seq(kv("general.alignment", 4, le(4, 4))),
          Seq(info("w", Seq(2), 0, 0)), f32x2, align = 4),
      "alignment 24 (not a power of two)" ->
        file(Seq(kv("general.alignment", 4, le(24, 4))),
          Seq(info("w", Seq(2), 0, 0)), f32x2, align = 24),
      "alignment typed u64 not u32" ->
        file(Seq(kv("general.alignment", 10, le(32, 8))),
          Seq(info("w", Seq(2), 0, 0)), f32x2),
      "general.name typed u32" ->
        file(Seq(kv("general.name", 4, le(7, 4))),
          Seq(info("w", Seq(2), 0, 0)), f32x2),
      "n_dims 0" ->
        file(Seq(kv("k", 10, le(1, 8))), Seq(info("w", Seq(), 0, 0)), f32x2),
      "n_dims 5" ->
        file(Seq(kv("k", 10, le(1, 8))),
          Seq(info("w", Seq(1, 1, 1, 1, 2), 0, 0)), f32x2),
      "dim 0" ->
        file(Seq(kv("k", 10, le(1, 8))), Seq(info("w", Seq(0), 0, 0)),
          Array.emptyByteArray),
      "numel bomb (2^21 × 2^21)" ->
        file(Seq(kv("k", 10, le(1, 8))),
          Seq(info("w", Seq(1L << 21, 1L << 21), 0, 0)), f32x2),
      "quantized ggml type (2) out of subset" ->
        file(Seq(kv("k", 10, le(1, 8))), Seq(info("w", Seq(2), 2, 0)), f32x2),
      "duplicate tensor name" ->
        file(Seq(kv("k", 10, le(1, 8))),
          Seq(info("w", Seq(2), 0, 0), info("w", Seq(2), 0, 64)),
          f32x2 ++ new Array[Byte](24) ++ f32x2),
      "empty tensor name" ->
        file(Seq(kv("k", 10, le(1, 8))), Seq(info("", Seq(2), 0, 0)), f32x2),
      "first offset nonzero" ->
        file(Seq(kv("k", 10, le(1, 8))), Seq(info("w", Seq(2), 0, 32)),
          new Array[Byte](32) ++ f32x2),
      "second offset leaves a gap" ->
        file(Seq(kv("k", 10, le(1, 8))),
          Seq(info("a", Seq(2), 0, 0), info("b", Seq(2), 0, 64)),
          f32x2 ++ new Array[Byte](24) ++ f32x2 ++ new Array[Byte](24)))
    cases.foreach { case (name, b) =>
      assert(GgufLake.parseGguf(b).isEmpty, name)
    }

    // contiguous second tensor at the ALIGNED offset parses
    val good2 = file(Seq(kv("k", 10, le(1, 8))),
      Seq(info("a", Seq(2), 0, 0), info("b", Seq(2), 0, 32)),
      f32x2 ++ new Array[Byte](24) ++ f32x2)
    val f2 = GgufLake.parseGguf(good2).get
    assert(f2.tensors.map(_.off) == Seq(0L, 32L))
    // F16 path: two halves 3, -4 at the aligned second slot
    val h = le(GgufLake.halfBits(3).toLong, 2) ++
      le(GgufLake.halfBits(-4).toLong, 2)
    val fh = GgufLake.parseGguf(file(Seq(kv("k", 10, le(1, 8))),
      Seq(info("h", Seq(2), 1, 0)), h)).get
    assert(fh.tensors.head.dtype == "F16" && fh.tensors.head.valueSum == -1.0)
    // F16 Inf rejects (exp all-ones)
    val hinf = le(0x7c00L, 2) ++ le(0L, 2)
    assert(GgufLake.parseGguf(file(Seq(kv("k", 10, le(1, 8))),
      Seq(info("h", Seq(2), 1, 0)), hinf)).isEmpty, "F16 Inf")
  }

  test("F16 subnormals decode exactly") {
    assert(GgufLake.halfToDouble(1) == math.pow(2, -24))
    assert(GgufLake.halfToDouble(0x03ff) == 1023 * math.pow(2, -24))
    assert(GgufLake.halfToDouble(0x8001) == -math.pow(2, -24))
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = GgufLake.ggufFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 3; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      GgufLake.parseGguf(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 7).foreach(n => GgufLake.parseGguf(s0.take(n)))
  }
}
