package graft

import graft.operators.CompressedLake

/** Compressed-shard ingestion (q194): per-codec roundtrips, the
  * decompression-bomb cap with a REAL bomb, and corruption
  * strictness across every router branch. */
class CompressedLakeSpec extends SparkSpec {

  private val text = ("w1 w2 w3 " * 40).trim
  private val payload = text.getBytes("UTF-8")

  test("all five codecs roundtrip and report the right identity") {
    CompressedLake.Codecs.foreach { c =>
      val blob = CompressedLake.compress(c, payload)
      val out = CompressedLake.decompress(blob, 1 << 20)
      assert(out.isDefined, c)
      assert(out.get._1 == c && java.util.Arrays.equals(out.get._2, payload), c)
    }
  }

  test("a real 25000:1 zstd bomb rejects at the cap instead of materializing") {
    // 100 MB of zeros compresses to ~4 KB; with a 4 MB cap the read
    // must reject without ever holding the 100 MB
    val bomb = CompressedLake.compress("zstd", new Array[Byte](100 << 20))
    assert(bomb.length < 64 * 1024, s"bomb is ${bomb.length} B on disk")
    assert(CompressedLake.decompress(bomb, 4 << 20).isEmpty)
    // the same stream is fine under a big-enough cap
    assert(CompressedLake.decompress(bomb, 128 << 20).isDefined)
  }

  test("truncation rejects on every codec") {
    CompressedLake.Codecs.foreach { c =>
      val blob = CompressedLake.compress(c, payload)
      for (cut <- Seq(1, blob.length / 2, blob.length - 7))
        assert(CompressedLake.decompress(
          java.util.Arrays.copyOf(blob, blob.length - cut), 1 << 20).isEmpty,
          s"$c cut $cut")
    }
  }

  test("tail bit flips reject on the integrity-checked codecs") {
    // gzip/bzip2/xz/zstd all carry payload checksums; flip a byte in
    // the compressed body (past the magic) and expect a reject
    Seq("zstd", "bzip2", "xz", "gzip").foreach { c =>
      val blob = CompressedLake.compress(c, payload)
      val pos = blob.length / 2
      val bad = blob.clone(); bad(pos) = (bad(pos) ^ 0x5a).toByte
      assert(CompressedLake.decompress(bad, 1 << 20).isEmpty, c)
    }
  }

  test("magic confusion and junk reject") {
    assert(CompressedLake.sniff("plain text".getBytes("UTF-8")).isEmpty)
    assert(CompressedLake.decompress("plain text here".getBytes("UTF-8"),
      1 << 20).isEmpty)
    // real magic, garbage body
    val junk = Array(0x28, 0xb5, 0x2f, 0xfd).map(_.toByte) ++
      Array.tabulate[Byte](64)(i => (i * 41).toByte)
    assert(CompressedLake.decompress(junk, 1 << 20).isEmpty)
    assert(CompressedLake.decompress(null, 1 << 20).isEmpty)
  }

  test("jsonl shards: law fields survive the decompress + from_json path; malformed lines null out") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fx = CompressedLake.jsonlShardFixture(spark, 6)
    val txt = CompressedLake.extractText(fx, "id", "media")
    assert(txt.where(col("valid")).count() == 6)
    // a shard whose second line is not JSON: from_json yields a null
    // struct for that line, the others parse — per-line isolation
    val mixed = CompressedLake.compress("zstd",
      "{\"doc_id\": 7, \"text\": \"a b\"}\nnot json at all".getBytes("UTF-8"))
    val rows = CompressedLake.extractText(
        Seq((0L, mixed)).toDF("id", "media"), "id", "media")
      .select(posexplode(split(col("text"), "\n")).as(Seq("line", "doc")))
      .select(col("line"), from_json(col("doc"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, text STRING")).as("j"))
      .orderBy("line").collect()
    assert(rows.length == 2)
    assert(rows(0).getStruct(1).getLong(0) == 7L)
    assert(rows(1).getStruct(1) == null || rows(1).getStruct(1).isNullAt(0))
  }

  test("DataFrame op: invalid rows flag, valid rows carry both sizes") {
    import spark.implicits._
    val good = CompressedLake.compress("lz4", payload)
    val out = graft.operators.CompressedLake.extractCompressed(
        Seq((0L, good), (1L, "nope".getBytes("UTF-8"))).toDF("id", "media"),
        "id", "media")
      .orderBy("id").collect()
    assert(out(0).getAs[Boolean]("valid") &&
      out(0).getAs[String]("codec") == "lz4" &&
      out(0).getAs[Long]("uncomp_bytes") == payload.length &&
      out(0).getAs[Long]("comp_bytes") == good.length)
    assert(!out(1).getAs[Boolean]("valid"))
  }
}
