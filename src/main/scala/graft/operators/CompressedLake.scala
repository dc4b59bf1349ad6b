package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compressed corpus-shard ingestion (q194): the container formats
  * text corpora actually ship in — `.zst` (Common Crawl / RedPajama /
  * most modern dumps), `.lz4`, `.bz2` (Wikipedia dumps), `.xz`
  * (Debian-world corpora) and `.gz` — routed by magic and
  * decompressed through the codecs ALREADY ON EVERY SPARK CLASSPATH
  * (zstd-jni, lz4-java, commons-compress, xz, JDK zlib; Spark itself
  * depends on them — zero new dependencies).
  *
  * The 100 TB contract is the DECOMPRESSION-BOMB CAP: untrusted
  * blobs go through a bounded-output read that REJECTS (valid=false)
  * any stream expanding past `maxOut` instead of materializing it —
  * a 10 000:1 zstd bomb is a few KB on disk and an OOM-killed
  * executor without the cap (spec-gated with a real bomb). Truncated
  * or bit-flipped streams reject through each codec's own integrity
  * checking; every router branch sits in ParserFuzzSpec's no-throw
  * gate. One blob = one task-local walk (codec-family plan shape). */
object CompressedLake {

  /** Identified codec of a blob, by magic. */
  private[graft] def sniff(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 6) None
    else if ((b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd) Some("zstd")
    else if ((b(0) & 0xff) == 0x04 && (b(1) & 0xff) == 0x22 &&
      (b(2) & 0xff) == 0x4d && (b(3) & 0xff) == 0x18) Some("lz4")
    else if (b(0) == 'B' && b(1) == 'Z' && b(2) == 'h' &&
      b(3) >= '1' && b(3) <= '9') Some("bzip2")
    else if ((b(0) & 0xff) == 0xfd && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0) Some("xz")
    else if ((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b &&
      (b(2) & 0xff) == 8) Some("gzip")
    else None
  }

  /** Bounded decompression: the full payload if it fits in `maxOut`
    * bytes, None on any codec error OR on expansion past the cap
    * (the bomb guard — the overflow is detected after at most one
    * extra buffer, never by materializing the bomb). */
  private[graft] def decompress(
      b: Array[Byte], maxOut: Int): Option[(String, Array[Byte])] = {
    val codec = sniff(b) match {
      case Some(c) => c
      case None => return None
    }
    val in = new java.io.ByteArrayInputStream(b)
    val stream: java.io.InputStream =
      try codec match {
        case "zstd" => new com.github.luben.zstd.ZstdInputStream(in)
        case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(in)
        case "bzip2" =>
          new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorInputStream(in)
        case "xz" => new org.tukaani.xz.XZInputStream(in)
        case _ => new java.util.zip.GZIPInputStream(in)
      } catch { case _: Exception => return None }
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = stream.read(buf)
      while (n >= 0) {
        if (out.size() + n > maxOut) return None // bomb guard
        out.write(buf, 0, n)
        n = stream.read(buf)
      }
      // Trailing-bytes posture is CODEC-DEPENDENT, not uniform: each
      // library stream decides how it treats data past the first
      // member (JDK gzip silently stops, xz/zstd error on garbage,
      // concatenated members may decode as one payload). A uniform
      // leftover-byte reject is not soundly implementable here — the
      // codec streams read the source through internal buffers, so
      // source-side accounting cannot distinguish bytes consumed from
      // bytes merely buffered. Corrupt/truncated members still reject
      // via the codec error paths (fuzz-gated in ParserFuzzSpec).
      Some((codec, out.toByteArray))
    } catch { case _: Exception => None }
    finally stream.close()
  }

  /** Extraction as a DataFrame op: codec, sizes and the decoded-text
    * stats (same payload-stat law as the WARC family — one stats
    * definition across the ingestion layer). */
  def extractCompressed(
      df: DataFrame, idCol: String, binCol: String,
      maxOut: Int = 64 * 1024 * 1024): DataFrame = {
    require(maxOut > 0)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("codec", StringType, true),
      StructField("comp_bytes", LongType, true),
      StructField("uncomp_bytes", LongType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val b = r.getAs[Array[Byte]](1)
        scala.util.Try(decompress(b, maxOut)).toOption.flatten match {
          case Some((codec, payload)) =>
            val (nWords, digitSum) = Warc.payloadStats(payload)
            Row(r.getLong(0), codec, b.length.toLong, payload.length.toLong,
              nWords, digitSum, true)
          case None =>
            Row(r.getLong(0), null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Bounded decompression to TEXT: the shard's decoded UTF-8 payload
    * as a string column, for downstream Catalyst-native parsing
    * (split/from_json/explode — the q195 JSONL path keeps everything
    * after this op inside whole-stage codegen; no UDFs). */
  def extractText(
      df: DataFrame, idCol: String, binCol: String,
      maxOut: Int = 64 * 1024 * 1024): DataFrame = {
    require(maxOut > 0)
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("codec", StringType, true),
      StructField("text", StringType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(decompress(r.getAs[Array[Byte]](1), maxOut))
          .toOption.flatten match {
          case Some((codec, payload)) =>
            Row(r.getLong(0), codec, new String(payload, "UTF-8"), true)
          case None => Row(r.getLong(0), null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic JSONL-shard fixture (the RedPajama/Dolma shape —
    * one JSON document per line, zstd-framed): the laws the q195
    * oracle replays. */
  def jsonlShardFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val nd = 3 + r % 4
      val lines = (0 until nd).map { k =>
        val nt = 5 + (r + k) % 4
        val text = (0 until nt).map(j => s"w${(r * 3 + k * 5 + j) % 10}")
          .mkString(" ")
        val lang = Seq("en", "de", "fr")((r + k) % 3)
        s"""{"doc_id": ${r * 100 + k}, "lang": "$lang", """ +
          s""""score": ${(r * 13 + k * 7) % 100}, "text": "$text"}"""
      }
      Row(r.toLong, compress(Codecs(r % 5), lines.mkString("\n")
        .getBytes("UTF-8")))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }

  /** Compress law bytes with each codec (fixture / test side). The
    * zstd frame carries the OPTIONAL content checksum — `Zstd
    * .compress` omits it by default, and without it a bit-flipped
    * literal block can decode to silently corrupt text (observed in
    * the spec's flip sweep); corpus shards should always ship
    * checksummed frames. */
  def compress(codec: String, payload: Array[Byte]): Array[Byte] =
    codec match {
      case "zstd" =>
        val bos = new java.io.ByteArrayOutputStream()
        val s = new com.github.luben.zstd.ZstdOutputStream(bos, 3)
        s.setChecksum(true)
        s.write(payload); s.close()
        bos.toByteArray
      case "lz4" =>
        val bos = new java.io.ByteArrayOutputStream()
        val s = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        s.write(payload); s.close()
        bos.toByteArray
      case "bzip2" =>
        val bos = new java.io.ByteArrayOutputStream()
        val s = new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorOutputStream(bos)
        s.write(payload); s.close()
        bos.toByteArray
      case "xz" =>
        val bos = new java.io.ByteArrayOutputStream()
        val s = new org.tukaani.xz.XZOutputStream(
          bos, new org.tukaani.xz.LZMA2Options(3))
        s.write(payload); s.close()
        bos.toByteArray
      case "gzip" =>
        val bos = new java.io.ByteArrayOutputStream()
        val s = new java.util.zip.GZIPOutputStream(bos)
        s.write(payload); s.close()
        bos.toByteArray
      case other => sys.error(s"unknown codec $other")
    }

  val Codecs: Seq[String] = Seq("zstd", "lz4", "bzip2", "xz", "gzip")

  /** Deterministic fixture — the text law the q194 oracle replays:
    * id r carries 10 + r % 6 whitespace words `t<digit>` with digit
    * (r·7 + j·3) % 10, rotated through all five codecs. */
  def compressedFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { r =>
      val nt = 10 + r % 6
      val text = (0 until nt).map(j => s"t${(r * 7 + j * 3) % 10}")
        .mkString(" ")
      Row(r.toLong, compress(Codecs(r % 5), text.getBytes("UTF-8")))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
