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
  *  2. No BOM: the BOM-less UTF-16 parity sniff (WHATWG wants a BOM
  *     or a transport label, but Windows-origin corpora ship BOM-less
  *     UTF-16 constantly — and BOM-less UTF-16LE ASCII is bytewise
  *     VALID UTF-8, so this must run BEFORE the UTF-8 validator).
  *     Over an even-length buffer (>= 4 bytes) of n/2 code units,
  *     count units whose high byte is zero and low byte nonzero (LE
  *     evidence) and the mirror (BE evidence). A MAJORITY (>= half
  *     the units) of exactly one kind makes that endianness the
  *     candidate; the candidate must then decode STRICTLY (unpaired
  *     surrogates reject) and contain no NUL character. Majorities of
  *     BOTH kinds (interleaved zeros) are ambiguous — the buffer is
  *     REJECTED, never guessed; no majority at all falls through (a
  *     zero byte never occurs in real UTF-8/cp1252 text, so genuine
  *     single-byte buffers score 0/0).
  *  3. Strict RFC 3629 UTF-8 validation over the whole buffer (JDK
  *     CharsetDecoder with REPORT on malformed AND unmappable —
  *     overlongs, surrogates, truncated sequences all reject).
  *     Valid → UTF-8.
  *  4. Else: windows-1252 fallback (the WHATWG default for legacy
  *     web content — a superset of ISO-8859-1 on the 0x80-0x9F row).
  *     Strict here too: the five UNDEFINED cp1252 bytes (0x81 0x8D
  *     0x8F 0x90 0x9D) reject the buffer as undecodable rather than
  *     smuggling C1 controls into the corpus.
  *
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
        // BOM-less UTF-16 parity sniff (see the ladder doc above) —
        // must run before UTF-8 validation: BOM-less UTF-16LE ASCII
        // is bytewise valid UTF-8
        if (b.length >= 4 && b.length % 2 == 0) {
          var le = 0
          var be = 0
          var i = 0
          while (i < b.length) {
            val loZero = b(i) == 0
            val hiZero = b(i + 1) == 0
            if (hiZero && !loZero) le += 1
            if (loZero && !hiZero) be += 1
            i += 2
          }
          val thr = (b.length / 2 + 1) / 2 // ceil(units / 2): a majority
          if (le >= thr && be >= thr) return None // ambiguous: reject
          if (le >= thr || be >= thr) {
            val (name, cs) =
              if (le >= thr) ("utf-16le", StandardCharsets.UTF_16LE)
              else ("utf-16be", StandardCharsets.UTF_16BE)
            // a candidate that fails strict decode (or smuggles NUL
            // characters) lied about itself — reject, never re-guess
            val t = strict(cs, ByteBuffer.wrap(b))
            if (t.indexOf(0.toChar) >= 0) return None
            return Some((name, t))
          }
        }
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
    * BOM-less UTF-8 / BOM-less UTF-16LE / BOM-less UTF-16BE, each
    * with a per-id text law mixing ASCII with multi-byte (and, for
    * the BOM-less UTF-16 kinds, a non-zero-high-byte character the
    * parity rule must NOT need). */
  def charsetFixture(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = i % 7
      val text = kind match {
        case 0 => s"café € menu $i" // é + €
        case 1 => s"日本語 text $i" // 日本語
        case 2 => s"snowman ☃ row $i"
        case 3 => s"quote “w$i” dash – eur €"
        case 4 => s"plain ascii line $i"
        case 5 => s"win export $i é☃" // BOM-less LE: majority-ASCII
        case _ => s"be dump $i Ω" // BOM-less BE
      }
      val bytes: Array[Byte] = kind match {
        case 0 => Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
          text.getBytes(StandardCharsets.UTF_8)
        case 1 => Array[Byte](0xff.toByte, 0xfe.toByte) ++
          text.getBytes(StandardCharsets.UTF_16LE)
        case 2 => Array[Byte](0xfe.toByte, 0xff.toByte) ++
          text.getBytes(StandardCharsets.UTF_16BE)
        case 3 => text.getBytes(Cp1252) // “ ” – € land on 0x80-0x9F row
        case 4 => text.getBytes(StandardCharsets.UTF_8)
        case 5 => text.getBytes(StandardCharsets.UTF_16LE)
        case _ => text.getBytes(StandardCharsets.UTF_16BE)
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
