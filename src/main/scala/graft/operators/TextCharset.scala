package graft.operators

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Charset detection + decode — the byte→text step of web ingestion
  * (an HTTP body is BYTES; every downstream text operator needs a
  * deterministic decode). The detection ladder is the one real
  * pipelines converge on, deterministic and documented:
  *
  *  1. Byte-order mark: EF BB BF → UTF-8, FF FE → UTF-16LE, FE FF →
  *     UTF-16BE (BOM stripped from the text). A BOM'd buffer that
  *     fails STRICT decode in its declared encoding is invalid —
  *     never silently re-guessed.
  *  2. No BOM: strict RFC 3629 UTF-8 validation over the whole
  *     buffer (JDK CharsetDecoder with REPORT on malformed AND
  *     unmappable — overlongs, surrogates, truncated sequences all
  *     reject). Valid → UTF-8.
  *  3. Else: windows-1252 fallback (the WHATWG default for legacy
  *     web content — a superset of ISO-8859-1 on the 0x80-0x9F row).
  *     Strict here too: the five UNDEFINED cp1252 bytes (0x81 0x8D
  *     0x8F 0x90 0x9D) reject the buffer as undecodable rather than
  *     smuggling C1 controls into the corpus.
  *
  * UTF-16 without a BOM is out of scope by design (detection would
  * be a heuristic; WHATWG requires the BOM or a transport label).
  * Scale posture: per-row kernel inside one mapPartitions pass —
  * embarrassingly parallel, same shape as the codec family.
  */
object TextCharset {

  private val Cp1252: Charset = Charset.forName("windows-1252")

  /** Strict decode: throws on ANY malformed/unmappable input. */
  private def strict(cs: Charset, b: ByteBuffer): String =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
      .decode(b).toString

  /** Detect + decode one buffer → (charsetName, text), or None for a
    * buffer that lies about itself (BOM + malformed payload). */
  private[graft] def sniffDecode(b: Array[Byte]): Option[(String, String)] = {
    if (b == null) return None
    try {
      if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
          (b(2) & 0xff) == 0xbf)
        Some(("utf-8", strict(StandardCharsets.UTF_8,
          ByteBuffer.wrap(b, 3, b.length - 3))))
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
        Some(("utf-16le", strict(StandardCharsets.UTF_16LE,
          ByteBuffer.wrap(b, 2, b.length - 2))))
      else if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
        Some(("utf-16be", strict(StandardCharsets.UTF_16BE,
          ByteBuffer.wrap(b, 2, b.length - 2))))
      else {
        try Some(("utf-8", strict(StandardCharsets.UTF_8, ByteBuffer.wrap(b))))
        catch {
          case _: CharacterCodingException =>
            Some(("windows-1252", strict(Cp1252, ByteBuffer.wrap(b))))
        }
      }
    } catch { case _: CharacterCodingException => None }
  }

  /** Detect + decode a binary column to text rows. Undetectable /
    * self-contradicting buffers yield valid=false, never throw. */
  def decodeText(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("charset", StringType, true),
      StructField("text", StringType, true),
      StructField("n_chars", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        scala.util.Try(sniffDecode(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((cs, text)) =>
            Row(r.getLong(0), cs, text, text.length.toLong, true)
          case None => Row(r.getLong(0), null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic fixture replayed closed-form by the q161 oracle:
    * ids cycle BOM'd UTF-8 / UTF-16LE / UTF-16BE / raw cp1252 /
    * BOM-less UTF-8, each with a per-id text law mixing ASCII with
    * multi-byte and (for cp1252) 0x80-0x9F-row characters. */
  def charsetFixture(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = i % 5
      val text = kind match {
        case 0 => s"café € menu $i" // é + €
        case 1 => s"日本語 text $i" // 日本語
        case 2 => s"snowman ☃ row $i"
        case 3 => s"quote “w$i” dash – eur €"
        case _ => s"plain ascii line $i"
      }
      val bytes: Array[Byte] = kind match {
        case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
          text.getBytes(StandardCharsets.UTF_8)
        case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++
          text.getBytes(StandardCharsets.UTF_16LE)
        case 2 => Array[Byte](0xfe.toByte, 0xff.toByte) ++
          text.getBytes(StandardCharsets.UTF_16BE)
        case 3 => text.getBytes(Cp1252) // “ ” – € land on 0x80-0x9F row
        case _ => text.getBytes(StandardCharsets.UTF_8)
      }
      Row(i.toLong, bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
