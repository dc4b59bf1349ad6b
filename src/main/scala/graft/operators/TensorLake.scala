package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tensor-container lakes (q203/q204) — the weight/dataset shard
  * formats an ML corpus actually ships:
  *
  *  - SAFETENSORS (the Hugging Face exchange format): 8-byte LE
  *    header length, a JSON header mapping tensor name →
  *    {dtype, shape, data_offsets}, plus an optional `__metadata__`
  *    string map, then one contiguous data buffer the offsets must
  *    tile exactly.
  *  - NPY v1.0 (the NumPy array format): `\\x93NUMPY`, version,
  *    u16-LE header length, a Python-dict-literal header
  *    (descr / fortran_order / shape), then raw array bytes.
  *
  * Deliberately the ipynb architecture, not the byte-walk one: both
  * headers are text (JSON / dict literal) over a flat buffer, so the
  * whole extraction is pure Catalyst — `from_json` (map + struct
  * schemas), `regexp_extract`, dynamic `substr` on the binary,
  * window functions for the offset-tiling validation, and
  * `md5(hex(...))` as the content pin — all whole-stage-codegen
  * built-ins, no custom parser, no mapPartitions, no UDF. Malformed
  * blobs degrade declaratively (from_json/regexp null out, guards
  * flag valid=false). ANSI discipline: every arithmetic step that a
  * crafted header could overflow (shape products, offset
  * differences, int downcasts) is evaluated only under a CaseWhen
  * guard that bounds it first — CaseWhen branches are lazy, so the
  * overflow is unreachable, same posture as the byte-walk parsers'
  * no-throw contract.
  */
object TensorLake {

  /** Little-endian unsigned integer from `len` bytes of a binary
    * column starting at 1-based `pos` — built from hex/conv
    * built-ins (Spark has no binary byte accessor; a few codegen'd
    * terms beat a UDF). NULL-safe: short blobs yield NULL (empty
    * substring → conv(null)), never throw. */
  private def leLong(bin: Column, pos: Int, len: Int): Column =
    (0 until len).map { i =>
      // shiftleft + OR, not multiply + add: a top byte of 0x80 times
      // 2^56 is an ANSI long overflow; shifts are bitwise (a u64 with
      // the sign bit set comes back negative and fails the callers'
      // range guards)
      shiftleft(
        conv(hex(substring(bin, pos + i, 1)), 16, 10).cast(LongType), 8 * i)
    }.reduce(_ bitwiseOR _)

  private val tensorSchema = MapType(StringType, StructType(Seq(
    StructField("dtype", StringType, true),
    StructField("shape", ArrayType(LongType, true), true),
    StructField("data_offsets", ArrayType(LongType, true), true))))

  private val metaSchema = StructType(Seq(
    StructField("__metadata__", MapType(StringType, StringType, true), true)))

  /** dtype → bytes per element (the published safetensors dtype
    * table subset; unknown dtypes yield NULL and flag the row). */
  private def dtypeSize(dt: Column): Column =
    when(dt.isin("U8", "I8", "BOOL", "F8_E4M3", "F8_E5M2"), 1L)
      .when(dt.isin("F16", "BF16", "I16", "U16"), 2L)
      .when(dt.isin("F32", "I32", "U32"), 4L)
      .when(dt.isin("F64", "I64", "U64"), 8L)

  /** Bounded positive-array product: NULL unless every element is in
    * [1, 10^6], rank ≤ 8 and the (overflow-free) double product is
    * ≤ 10^15 — then the exact long product, whose prefix products
    * are monotone and therefore all inside the bound. */
  private def boundedProduct(arr: Column): Column = {
    val sane = arr.isNotNull && size(arr).between(1, 8) &&
      forall(arr, x => x.isNotNull && x >= 1L && x <= 1000000L)
    when(sane &&
      aggregate(arr, lit(1.0), (a, x) => a * x.cast(DoubleType)) <= 1e15,
      aggregate(arr, lit(1L), (a, x) => a * x))
  }

  /** SafeTensors extraction: one row per tensor (+ one valid=false
    * row for an unparseable blob). The md5 content pin hashes the
    * UPPERCASE HEX of the tensor's bytes (text, so the DuckDB oracle
    * can replay it — its md5 is VARCHAR-only). Blob validity demands
    * the published tiling law: offsets ascending, contiguous, and
    * covering the data buffer exactly. */
  def extractSafetensors(
      df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val bin = col(binCol)
    val hlen = leLong(bin, 1, 8)
    val base = df.select(
      col(idCol).cast(LongType).as("id"),
      bin.as("bin"),
      length(bin).cast(LongType).as("blen"),
      hlen.as("hlen"))
      .withColumn("hdr_ok",
        col("hlen").isNotNull && col("hlen") >= 2L &&
          col("hlen") <= col("blen") - 8L && col("hlen") <= 1000000L)
      .withColumn("hdr",
        when(col("hdr_ok"),
          col("bin").substr(lit(9), col("hlen").cast(IntegerType))
            .cast(StringType)))
      .withColumn("tens", from_json(col("hdr"), tensorSchema))
      .withColumn("meta",
        from_json(col("hdr"), metaSchema).getField("__metadata__"))
      // guarded: hdr_ok bounds hlen to [2, 10^6] — unguarded, a
      // negative u64 hlen makes this subtraction itself overflow
      .withColumn("buf_len",
        when(col("hdr_ok"), col("blen") - 8L - col("hlen")))
    // per-tensor rows; __metadata__ is not a tensor
    val rows = base.select(
      col("id"), col("bin"), col("hlen"), col("buf_len"), col("meta"),
      explode_outer(when(col("tens").isNotNull,
        map_filter(col("tens"), (k, _) => k =!= "__metadata__")))
        .as(Seq("name", "t")))
    val w = Window.partitionBy("id")
    val wo = Window.partitionBy("id").orderBy("begin")
    rows
      .withColumn("dtype", col("t.dtype"))
      .withColumn("begin", col("t.data_offsets").getItem(0))
      .withColumn("end_off", col("t.data_offsets").getItem(1))
      .withColumn("n_elems", boundedProduct(col("t.shape")))
      .withColumn("off_ok",
        size(col("t.data_offsets")) === 2 &&
          col("begin").isNotNull && col("end_off").isNotNull &&
          col("begin") >= 0L && col("end_off") >= col("begin") &&
          col("end_off") <= col("buf_len"))
      .withColumn("byte_len",
        when(col("off_ok"), col("end_off") - col("begin")))
      .withColumn("row_ok",
        col("name").isNotNull && dtypeSize(col("dtype")).isNotNull &&
          col("n_elems").isNotNull && col("off_ok") &&
          col("byte_len") === col("n_elems") * dtypeSize(col("dtype")))
      // the tiling law: ascending contiguous offsets covering the
      // whole buffer (first begins at 0, each begins at the previous
      // end, the last ends at buf_len)
      .withColumn("prev_end", lag(col("end_off"), 1, 0L).over(wo))
      .withColumn("blob_ok",
        min(when(col("row_ok") && col("begin") === col("prev_end"), 1)
          .otherwise(0)).over(w) === 1 &&
          max(col("end_off")).over(w) === col("buf_len"))
      .select(
        col("id"),
        col("name"),
        when(col("blob_ok"), col("dtype")).as("dtype"),
        when(col("blob_ok"), size(col("t.shape"))).as("rank"),
        when(col("blob_ok"), col("n_elems")).as("n_elems"),
        when(col("blob_ok"), col("byte_len")).as("byte_len"),
        when(col("blob_ok"), col("begin")).as("begin"),
        when(col("blob_ok"), col("end_off")).as("end_off"),
        when(col("blob_ok"),
          md5(hex(col("bin").substr(
            (lit(9L) + col("hlen") + col("begin")).cast(IntegerType),
            col("byte_len").cast(IntegerType))))).as("digest"),
        when(col("blob_ok"),
          when(col("meta").isNotNull,
            array_join(sort_array(transform(map_entries(col("meta")),
              e => concat(e.getField("key"), lit("="),
                e.getField("value")))), ";"))
            .otherwise(lit(""))).as("meta"),
        coalesce(col("blob_ok"), lit(false)).as("valid"))
  }

  /** Deterministic SafeTensors fixture — the laws the q203 oracle
    * replays (tensor count / dtype / shape / offsets / byte values /
    * metadata all closed-form in (id, k, i, j)). */
  def safetensorsFixture(spark: SparkSession, n: Int): DataFrame = {
    val dts = Seq(("F32", 4), ("F16", 2), ("BF16", 2), ("I64", 8), ("U8", 1))
    val rows = (0 until n).map { id =>
      val t = 3 + id % 4
      val specs = (0 until t).map { k =>
        val (dt, sz) = dts((id + k) % 5)
        val rank = 1 + (id + k) % 3
        val dims = (0 until rank).map(i => 1 + (id + 2 * k + 3 * i) % 4)
        val bytes = dims.product * sz
        (s"t$k", dt, dims, bytes)
      }
      val begins = specs.scanLeft(0)((acc, s) => acc + s._4)
      val metaJson =
        if (id % 3 == 0) s""""__metadata__":{"src":"fixture","v":"$id"},"""
        else ""
      val hdr = "{" + metaJson + specs.zipWithIndex.map {
        case ((name, dt, dims, bytes), k) =>
          s""""$name":{"dtype":"$dt","shape":[${dims.mkString(",")}],""" +
            s""""data_offsets":[${begins(k)},${begins(k) + bytes}]}"""
      }.mkString(",") + "}"
      val hb = hdr.getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream()
      // Long shift: an Int >> 32 silently wraps to >> 0 in Scala/JVM
      (0 until 8).foreach(i =>
        out.write(((hb.length.toLong >> (8 * i)) & 0xffL).toInt))
      out.write(hb)
      specs.zipWithIndex.foreach { case ((_, _, _, bytes), k) =>
        (0 until bytes).foreach(j =>
          out.write((id * 7 + k * 11 + j * 13) % 256))
      }
      Row(id.toLong, out.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** NPY v1.0 extraction: one row per blob — magic + version check,
    * u16-LE header length, the dict-literal header fields via
    * regexp (descr byte order/kind/width, fortran_order, shape
    * tuple), element count from the shape (a `()` scalar is rank 0
    * with one element), and the exact size law
    * 10 + hlen + n_elems·width == blob length. Same md5-of-hex
    * content pin as safetensors. Pure Catalyst. */
  def extractNpy(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val bin = col(binCol)
    val base = df.select(
      col(idCol).cast(LongType).as("id"),
      bin.as("bin"),
      length(bin).cast(LongType).as("blen"),
      (hex(substring(bin, 1, 6)) === "934E554D5059" &&
        hex(substring(bin, 7, 2)) === "0100").as("magic_ok"),
      leLong(bin, 9, 2).as("hlen"))
      .withColumn("hdr_ok",
        col("magic_ok") && col("hlen").isNotNull &&
          col("hlen") >= 1L && col("hlen") <= col("blen") - 10L)
      .withColumn("hdr", when(col("hdr_ok"),
        col("bin").substr(lit(11), col("hlen").cast(IntegerType))
          .cast(StringType)))
    base
      .withColumn("descr",
        regexp_extract(col("hdr"), "'descr':\\s*'([<>|][a-z][0-9]+)'", 1))
      .withColumn("fortran",
        regexp_extract(col("hdr"), "'fortran_order':\\s*(True|False)", 1))
      .withColumn("shape_s",
        regexp_extract(col("hdr"), "'shape':\\s*\\(([0-9, ]*)\\)", 1))
      .withColumn("dims_s",
        filter(transform(split(col("shape_s"), ","), s => trim(s)),
          s => s =!= ""))
      // guarded cast: digits only by regexp, length-bounded before the
      // ANSI string→long cast can see an overflowing literal
      .withColumn("dims",
        when(forall(col("dims_s"), s => length(s) <= 6),
          col("dims_s").cast(ArrayType(LongType))))
      .withColumn("n_elems",
        when(size(col("dims")) === 0, 1L)
          .otherwise(boundedProduct(col("dims"))))
      .withColumn("width",
        when(regexp_extract(col("descr"), "([0-9]+)$", 1) =!= "",
          when(length(regexp_extract(col("descr"), "([0-9]+)$", 1)) <= 2,
            regexp_extract(col("descr"), "([0-9]+)$", 1).cast(LongType))))
      .withColumn("ok",
        col("hdr_ok") && col("descr") =!= "" && col("fortran") =!= "" &&
          col("width").isNotNull && col("width").between(1L, 16L) &&
          col("n_elems").isNotNull &&
          col("blen") === lit(10L) + col("hlen") +
            col("n_elems") * col("width"))
      .select(
        col("id"),
        when(col("ok"), col("descr")).as("descr"),
        when(col("ok"), col("fortran") === "True").as("fortran_order"),
        when(col("ok"), size(col("dims"))).as("rank"),
        when(col("ok"), col("n_elems")).as("n_elems"),
        when(col("ok"), col("n_elems") * col("width")).as("byte_len"),
        when(col("ok"),
          md5(hex(col("bin").substr(
            (lit(11L) + col("hlen")).cast(IntegerType),
            (col("n_elems") * col("width")).cast(IntegerType)))))
          .as("digest"),
        col("ok").as("valid"))
  }

  /** Deterministic NPY fixture — the q204 oracle's laws; headers are
    * REAL NumPy v1.0 (64-byte-aligned, trailing newline). */
  def npyFixture(spark: SparkSession, n: Int): DataFrame = {
    val descrs = Seq(("<f4", 4), ("<i8", 8), ("|u1", 1), ("<f8", 8), ("<i2", 2))
    val rows = (0 until n).map { id =>
      val (descr, sz) = descrs(id % 5)
      val rank = id % 4 // 0..3 — rank 0 is a scalar, shape ()
      val dims = (0 until rank).map(i => 1 + (id + 3 * i) % 5)
      val shapeS = rank match {
        case 0 => "()"
        case 1 => s"(${dims.head},)"
        case _ => s"(${dims.mkString(", ")})"
      }
      val fortran = if (id % 7 == 0) "True" else "False"
      val dict = s"{'descr': '$descr', 'fortran_order': $fortran, " +
        s"'shape': $shapeS, }"
      // pad with spaces so 10 + hlen is a multiple of 64, newline last
      val padTo = ((10 + dict.length + 1 + 63) / 64) * 64
      val hdr = dict + (" " * (padTo - 10 - dict.length - 1)) + "\n"
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x93); out.write('N'); out.write('U'); out.write('M')
      out.write('P'); out.write('Y'); out.write(1); out.write(0)
      out.write(hdr.length & 0xff); out.write((hdr.length >> 8) & 0xff)
      out.write(hdr.getBytes("US-ASCII"))
      val bytes = dims.product * sz
      (0 until bytes).foreach(j => out.write((id * 5 + j * 17) % 256))
      Row(id.toLong, out.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
