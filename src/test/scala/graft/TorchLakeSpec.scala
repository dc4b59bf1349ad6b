package graft

import graft.operators.TorchLake

/** Torch-checkpoint walk: fixture-law equality, the no-execution
  * whitelist posture (os.system-style globals and unknown opcodes
  * reject), stack/memo/view/storage strictness, shared-storage
  * views, byte-flip + truncation sweeps. */
class TorchLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = TorchLake.extractCheckpoint(
      TorchLake.torchFixture(spark, 12), "id", "media")
      .orderBy("id", "tidx").collect()
    assert(out.forall(_.getBoolean(11)))
    var k = 0
    (0 until 12).foreach { i =>
      val nt = 2 + i % 3
      (0 until nt).foreach { t =>
        val r = out(k); k += 1
        val nd = 1 + (i + t) % 3
        val shape = Seq(2L + (i + t) % 3, 1L + t % 3, 2L).take(nd)
        val nelem = shape.product
        val (off, pad) = if ((i + t) % 3 == 0) (2L, 4L) else (0L, 0L)
        assert(r.getLong(0) == i && r.getInt(1) == t)
        assert(r.getString(2) == s"layer.$t.weight")
        assert(r.getString(3) == t.toString)
        assert(r.getLong(4) == nelem + pad && r.getInt(5) == nd)
        assert(r.getLong(6) == nelem && r.getLong(7) == off)
        assert(r.getBoolean(8) == ((i + t) % 2 == 0))
        val want = (off until off + nelem)
          .map(j => TorchLake.fixtureVal(i, t, j)).sum.toDouble
        assert(r.getDouble(9) == want, s"value sum file $i tensor $t")
        assert(r.getInt(10) == nt)
      }
    }
    assert(k == out.length)
  }

  // ------------------------------------------------------------------
  // independent spec-side builders

  private def zipOf(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (n, d) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(d); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }
  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def S(s: String): Array[Byte] =
    Array[Byte](0x58) ++ le32(s.getBytes("UTF-8").length.toLong) ++
      s.getBytes("UTF-8")
  private def I(v: Long): Array[Byte] =
    Array[Byte](0x4a) ++ le32(v & 0xffffffffL)
  private def G(m: String, n: String): Array[Byte] =
    Array[Byte](0x63) ++ (m + "\n" + n + "\n").getBytes("US-ASCII")
  private def T(items: Array[Byte]*): Array[Byte] =
    Array[Byte](0x28) ++ items.flatten ++ Array[Byte](0x74)
  private val Proto: Array[Byte] = Array(0x80.toByte, 2)
  private val NewDict: Array[Byte] =
    G("collections", "OrderedDict") ++ Array[Byte](0x29, 0x52)
  private def persid(key: String, numel: Long): Array[Byte] =
    T(S("storage"), G("torch", "FloatStorage"), S(key), S("cpu"),
      I(numel)) ++ Array[Byte](0x51)
  private def tensor(key: String, numel: Long, off: Long,
      shape: Seq[Long], strides: Seq[Long]): Array[Byte] =
    G("torch._utils", "_rebuild_tensor_v2") ++
      T(persid(key, numel), I(off), T(shape.map(I): _*),
        T(strides.map(I): _*),
        Array[Byte](0x89.toByte), NewDict) ++ Array[Byte](0x52)
  private def statePkl(items: Seq[(String, Array[Byte])]): Array[Byte] =
    Proto ++ NewDict ++ Array[Byte](0x28) ++
      items.flatMap { case (n, t) => S(n) ++ t } ++ Array[Byte](0x75, 0x2e)
  private def storage(vals: Seq[Float]): Array[Byte] =
    vals.flatMap(v =>
      le32(java.lang.Float.floatToIntBits(v) & 0xffffffffL)).toArray
  private def ckpt(pkl: Array[Byte],
      storages: Seq[(String, Array[Byte])],
      version: String = "3\n", root: String = "a"): Array[Byte] =
    zipOf(Seq((s"$root/data.pkl", pkl)) ++
      storages.map { case (k, d) => (s"$root/data/$k", d) } ++
      Seq((s"$root/version", version.getBytes("US-ASCII"))))

  test("independent builder round-trip + shared-storage views") {
    val pkl = statePkl(Seq(
      ("a", tensor("0", 6, 0, Seq(2, 3), Seq(3, 1))),
      ("b", tensor("0", 6, 2, Seq(4), Seq(1))))) // same storage, a view
    val st = storage(Seq(1f, 2f, 3f, 4f, 5f, 6f))
    val c = TorchLake.parseCheckpoint(ckpt(pkl, Seq(("0", st)))).get
    assert(c.nStorages == 1)
    assert(c.tensors.map(x => (x._1, x._3)) ==
      Seq(("a", 21.0), ("b", 18.0))) // 1..6 and 3..6
  }

  test("the closed-world whitelist: no execution surface") {
    val st = storage(Seq(1f, 2f))
    // an os.system GLOBAL — the classic pickle payload — must reject
    val evil = Proto ++ G("os", "system") ++ S("rm -rf /") ++
      Array[Byte](0x85.toByte, 0x52, 0x2e)
    assert(TorchLake.parseCheckpoint(ckpt(evil, Seq(("0", st)))).isEmpty,
      "os.system global")
    // builtins.eval via STACK_GLOBAL-style strings is just as dead:
    // STACK_GLOBAL (0x93) is not even a known opcode here
    val sg = Proto ++ S("builtins") ++ S("eval") ++
      Array[Byte](0x93.toByte, 0x2e)
    assert(TorchLake.parseCheckpoint(ckpt(sg, Seq(("0", st)))).isEmpty,
      "STACK_GLOBAL opcode out of subset")
    // torch.DoubleStorage is outside the whitelist too
    val pkl = statePkl(Seq(("a",
      G("torch._utils", "_rebuild_tensor_v2") ++
        T(T(S("storage"), G("torch", "FloatStorage"), S("0"), S("cpu"),
          I(2)) ++ Array[Byte](0x51), I(0), T(I(2)), T(I(1)),
          Array[Byte](0x89.toByte), NewDict) ++ Array[Byte](0x52))))
    assert(TorchLake.parseCheckpoint(ckpt(pkl, Seq(("0", st)))).nonEmpty,
      "control: FloatStorage parses")
    val dbl = new String(pkl, "ISO-8859-1")
      .replace("FloatStorage", "Doub1Storage").getBytes("ISO-8859-1")
    assert(TorchLake.parseCheckpoint(ckpt(dbl, Seq(("0", st)))).isEmpty,
      "non-whitelisted storage class")
  }

  test("strictness matrix: pickle, view and container lies reject") {
    val st = storage(Seq(1f, 2f, 3f, 4f, 5f, 6f))
    def good = statePkl(Seq(("a", tensor("0", 6, 0, Seq(2, 3), Seq(3, 1)))))
    assert(TorchLake.parseCheckpoint(ckpt(good, Seq(("0", st)))).nonEmpty)
    val cases: Seq[(String, Array[Byte], Seq[(String, Array[Byte])])] = Seq(
      ("protocol 3", Array[Byte](0x80.toByte, 3) ++ good.drop(2),
        Seq(("0", st))),
      ("non-contiguous stride",
        statePkl(Seq(("a", tensor("0", 6, 0, Seq(2, 3), Seq(1, 2))))),
        Seq(("0", st))),
      ("view overruns storage",
        statePkl(Seq(("a", tensor("0", 6, 2, Seq(2, 3), Seq(3, 1))))),
        Seq(("0", st))),
      ("negative offset",
        statePkl(Seq(("a", tensor("0", 6, -1, Seq(2, 3), Seq(3, 1))))),
        Seq(("0", st))),
      ("missing storage entry", good, Seq(("1", st))),
      ("orphan storage entry", good, Seq(("0", st), ("7", st))),
      ("storage size lie (5 floats for numel 6)", good,
        Seq(("0", storage(Seq(1f, 2f, 3f, 4f, 5f))))),
      ("NaN in storage", good,
        Seq(("0", storage(Seq(1f, 2f, 3f, Float.NaN, 5f, 6f))))),
      ("duplicate dict key",
        statePkl(Seq(("a", tensor("0", 6, 0, Seq(2, 3), Seq(3, 1))),
          ("a", tensor("0", 6, 0, Seq(2, 3), Seq(3, 1))))),
        Seq(("0", st))),
      ("empty state dict", statePkl(Seq()), Seq(("0", st))),
      ("non-tensor dict value",
        statePkl(Seq(("a", I(7)))), Seq(("0", st))),
      ("bad persistent-id shape",
        Proto ++ NewDict ++ Array[Byte](0x28) ++ S("a") ++
          T(S("storage"), S("0")) ++ Array[Byte](0x51) ++
          Array[Byte](0x75, 0x2e),
        Seq(("0", st))),
      ("stack underflow at STOP", Proto ++ Array[Byte](0x2e),
        Seq(("0", st))),
      ("memo get of absent slot",
        Proto ++ Array[Byte](0x68, 9, 0x2e), Seq(("0", st))),
      ("trailing ops after STOP-less stream", Proto ++ S("x"),
        Seq(("0", st))))
    cases.foreach { case (name, pkl, sts) =>
      assert(TorchLake.parseCheckpoint(ckpt(pkl, sts)).isEmpty, name)
    }
    // container-level lies
    assert(TorchLake.parseCheckpoint(
      ckpt(good, Seq(("0", st)), version = "2\n")).isEmpty, "version 2")
    assert(TorchLake.parseCheckpoint(zipOf(Seq(
      ("a/data.pkl", good), ("b/data/0", st),
      ("a/version", "3\n".getBytes("US-ASCII"))))).isEmpty, "two roots")
    assert(TorchLake.parseCheckpoint(zipOf(Seq(
      ("a/data.pkl", good), ("a/data/0", st)))).isEmpty, "missing version")
    assert(TorchLake.parseCheckpoint(zipOf(Seq(
      ("a/data.pkl", good), ("a/data/0", st), ("a/extra.txt", st),
      ("a/version", "3\n".getBytes("US-ASCII"))))).isEmpty,
      "unexpected entry")
    assert(TorchLake.parseCheckpoint(null).isEmpty)
    assert(TorchLake.parseCheckpoint(Array.emptyByteArray).isEmpty)
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = TorchLake.torchFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 3; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      TorchLake.parseCheckpoint(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 11).foreach(n =>
      TorchLake.parseCheckpoint(s0.take(n)))
  }
}
