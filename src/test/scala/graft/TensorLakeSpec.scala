package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.TensorLake

/** Tensor-container lakes (q203 safetensors / q204 npy): law replay
  * incl. an independent JVM digest, the corruption matrix, the
  * ANSI-overflow strictness (crafted headers must flag, never throw —
  * the declarative analog of the byte-walk parsers' no-throw
  * contract), and a full single-byte corruption sweep. */
class TensorLakeSpec extends SparkSpec {

  private def df(blobs: Seq[Array[Byte]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        blobs.zipWithIndex.map { case (b, i) => Row(i.toLong, b) }, 2),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))

  private def hexUpper(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII")).map(x => f"${x & 0xff}%02x").mkString

  test("safetensors: fixture law replay with an independent digest") {
    val got = TensorLake.extractSafetensors(
        TensorLake.safetensorsFixture(spark, 6), "id", "media")
      .orderBy("id", "name").collect()
    val dts = Seq(("F32", 4), ("F16", 2), ("BF16", 2), ("I64", 8), ("U8", 1))
    var gi = 0
    for (id <- 0 until 6) {
      val t = 3 + id % 4
      var begin = 0L
      for (k <- 0 until t) {
        val row = got(gi); gi += 1
        val (dt, sz) = dts((id + k) % 5)
        val rank = 1 + (id + k) % 3
        val dims = (0 until rank).map(i => 1 + (id + 2 * k + 3 * i) % 4)
        val bytes = dims.product.toLong * sz
        assert(row.getAs[Boolean]("valid"), s"id $id t$k")
        assert(row.getAs[String]("name") == s"t$k")
        assert(row.getAs[String]("dtype") == dt)
        assert(row.getAs[Int]("rank") == rank)
        assert(row.getAs[Long]("n_elems") == dims.product.toLong)
        assert(row.getAs[Long]("byte_len") == bytes)
        assert(row.getAs[Long]("begin") == begin)
        assert(row.getAs[Long]("end_off") == begin + bytes)
        val lawBytes = (0 until bytes.toInt)
          .map(j => ((id * 7 + k * 11 + j * 13) % 256).toByte).toArray
        assert(row.getAs[String]("digest") == md5hex(hexUpper(lawBytes)),
          s"digest id $id t$k")
        assert(row.getAs[String]("meta") ==
          (if (id % 3 == 0) s"src=fixture;v=$id" else ""))
        begin += bytes
      }
    }
    assert(gi == got.length)
  }

  test("npy: fixture law replay incl. the rank-0 scalar and fortran_order") {
    val got = TensorLake.extractNpy(
        TensorLake.npyFixture(spark, 10), "id", "media")
      .orderBy("id").collect()
    val descrs = Seq(("<f4", 4), ("<i8", 8), ("|u1", 1), ("<f8", 8), ("<i2", 2))
    for (id <- 0 until 10) {
      val row = got(id)
      val (descr, sz) = descrs(id % 5)
      val rank = id % 4
      val dims = (0 until rank).map(i => 1 + (id + 3 * i) % 5)
      val n = dims.product.toLong
      assert(row.getAs[Boolean]("valid"), s"id $id")
      assert(row.getAs[String]("descr") == descr)
      assert(row.getAs[Boolean]("fortran_order") == (id % 7 == 0))
      assert(row.getAs[Int]("rank") == rank)
      assert(row.getAs[Long]("n_elems") == n)
      val lawBytes = (0 until (n * sz).toInt)
        .map(j => ((id * 5 + j * 17) % 256).toByte).toArray
      assert(row.getAs[String]("digest") == md5hex(hexUpper(lawBytes)))
    }
  }

  /** One hand-built minimal safetensors blob: a single U8 [4] tensor. */
  private def miniSafetensors(
      hdr: String, dataLen: Int, hlenOverride: Option[Long] = None)
    : Array[Byte] = {
    val hb = hdr.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream()
    val hl = hlenOverride.getOrElse(hb.length.toLong)
    (0 until 8).foreach(i => out.write(((hl >> (8 * i)) & 0xffL).toInt))
    out.write(hb)
    (0 until dataLen).foreach(j => out.write(j * 31 % 256))
    out.toByteArray
  }

  test("safetensors: corruption matrix flags, never throws") {
    def run(b: Array[Byte]): Seq[Row] =
      TensorLake.extractSafetensors(df(Seq(b)), "id", "media")
        .collect().toSeq
    def allInvalid(b: Array[Byte]): Unit =
      assert(run(b).forall(r => !r.getAs[Boolean]("valid")))
    val goodHdr =
      """{"a":{"dtype":"U8","shape":[4],"data_offsets":[0,4]}}"""
    assert(run(miniSafetensors(goodHdr, 4))
      .forall(_.getAs[Boolean]("valid")))
    // header length lies past the blob
    allInvalid(miniSafetensors(goodHdr, 4, hlenOverride = Some(100000L)))
    // header length with a high u64 bit (would wrap an Int)
    allInvalid(miniSafetensors(goodHdr, 4,
      hlenOverride = Some(0x8000000000000037L)))
    // garbage JSON
    allInvalid(miniSafetensors("{not json", 4))
    // offsets do not cover the buffer (trailing slack)
    allInvalid(miniSafetensors(goodHdr, 5))
    // offsets overlap / gap between tensors
    allInvalid(miniSafetensors(
      """{"a":{"dtype":"U8","shape":[4],"data_offsets":[0,4]},""" +
        """"b":{"dtype":"U8","shape":[2],"data_offsets":[5,7]}}""", 7))
    // byte length contradicts shape x dtype
    allInvalid(miniSafetensors(
      """{"a":{"dtype":"F32","shape":[4],"data_offsets":[0,4]}}""", 4))
    // unknown dtype
    allInvalid(miniSafetensors(
      """{"a":{"dtype":"Q4","shape":[4],"data_offsets":[0,4]}}""", 4))
    // ANSI-overflow crafts: giant shape product, 2^62 offsets — must
    // flag invalid, never raise ArithmeticException
    allInvalid(miniSafetensors(
      """{"a":{"dtype":"U8","shape":[999999,999999,999999,999999],""" +
        """"data_offsets":[0,4]}}""", 4))
    allInvalid(miniSafetensors(
      """{"a":{"dtype":"U8","shape":[4],""" +
        """"data_offsets":[-4611686018427387904,4611686018427387904]}}""",
      4))
    // zero / negative dims
    allInvalid(miniSafetensors(
      """{"a":{"dtype":"U8","shape":[0],"data_offsets":[0,0]}}""", 0))
    // null / empty / random
    assert(TensorLake.extractSafetensors(
      df(Seq(Array.emptyByteArray,
        Array.tabulate[Byte](64)(i => (i * 41).toByte))), "id", "media")
      .collect().forall(r => !r.getAs[Boolean]("valid")))
  }

  test("npy: corruption matrix flags, never throws") {
    def build(dict: String, dataLen: Int, magicOk: Boolean = true,
        ver: (Int, Int) = (1, 0)): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      if (magicOk) { out.write(0x93); out.write("NUMPY".getBytes("US-ASCII")) }
      else out.write("XNUMPY".getBytes("US-ASCII"))
      out.write(ver._1); out.write(ver._2)
      val hdr = dict + "\n"
      out.write(hdr.length & 0xff); out.write((hdr.length >> 8) & 0xff)
      out.write(hdr.getBytes("US-ASCII"))
      (0 until dataLen).foreach(j => out.write(j * 13 % 256))
      out.toByteArray
    }
    def valid(b: Array[Byte]): Boolean =
      TensorLake.extractNpy(df(Seq(b)), "id", "media")
        .collect()(0).getAs[Boolean]("valid")
    val good = "{'descr': '<i2', 'fortran_order': False, 'shape': (3,), }"
    assert(valid(build(good, 6)))
    assert(!valid(build(good, 6, magicOk = false)))
    assert(!valid(build(good, 6, ver = (2, 0)))) // v2 headers out of subset
    assert(!valid(build(good, 5))) // size law broken
    assert(!valid(build("{'descr': 'i2', 'shape': (3,), }", 6))) // no order ch
    assert(!valid(build(
      "{'descr': '<i2', 'fortran_order': Maybe, 'shape': (3,), }", 6)))
    // overflow craft: 20-digit dim must flag, never throw on the cast
    assert(!valid(build("{'descr': '<i2', 'fortran_order': False, " +
      "'shape': (99999999999999999999,), }", 6)))
    assert(!valid(build("{'descr': '<i2', 'fortran_order': False, " +
      "'shape': (0,), }", 0)))
  }

  test("every single-byte corruption of valid blobs flags or parses, never throws") {
    val st = TensorLake.safetensorsFixture(spark, 1)
      .collect()(0).getAs[Array[Byte]]("media")
    val np = TensorLake.npyFixture(spark, 3)
      .collect().map(_.getAs[Array[Byte]]("media")).apply(2)
    val stVariants = st.indices.map { i =>
      val c = st.clone(); c(i) = (c(i) ^ 0x55).toByte; c
    }
    val npVariants = np.indices.map { i =>
      val c = np.clone(); c(i) = (c(i) ^ 0x55).toByte; c
    }
    // one job per family: any throw fails the collect
    assert(TensorLake.extractSafetensors(df(stVariants), "id", "media")
      .collect().length >= stVariants.length)
    assert(TensorLake.extractNpy(df(npVariants), "id", "media")
      .collect().length == npVariants.length)
    // truncation sweeps
    val stTrunc = (1 until st.length).map(java.util.Arrays.copyOf(st, _))
    val npTrunc = (1 until np.length).map(java.util.Arrays.copyOf(np, _))
    assert(TensorLake.extractSafetensors(df(stTrunc), "id", "media")
      .collect().length >= stTrunc.length)
    assert(TensorLake.extractNpy(df(npTrunc), "id", "media")
      .collect().forall(r => !r.getAs[Boolean]("valid")))
  }
}
