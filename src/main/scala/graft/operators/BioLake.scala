package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FASTA / FASTQ sequence extraction (the NCBI/Sanger interchange
  * formats — genomics corpora for bio LLMs). Strict by the same
  * codec-family law: a record the walk can't fully account for
  * flags the file, never a half-read:
  *
  *  - FASTA: `>name [description]` header, one-or-more sequence
  *    lines ASSEMBLED per record (the multi-line law), alphabet
  *    strictly uppercase `ACGTN`;
  *  - FASTQ: `@name` / sequence / `+` (bare, or repeating the exact
  *    name) / quality, with |quality| ≡ |sequence| enforced and
  *    Phred+33 quality chars in `!`..`~`; sequence stays on ONE
  *    line per the de-facto four-line convention;
  *  - a file is one format, dispatched on its first byte; empty
  *    records, blank lines, CR line endings and lowercase bases are
  *    all out of subset;
  *  - census per record: length, GC count, N count, and (FASTQ) the
  *    exact integer Phred sum — the columns a quality-filter stage
  *    consumes.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object BioLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class BioRec(
      rec: Int, name: String, length: Int, gc: Int, nCount: Int,
      qualSum: Option[Long])

  private def isBase(c: Char): Boolean =
    c == 'A' || c == 'C' || c == 'G' || c == 'T' || c == 'N'

  /** Walk one file; None on any violation. Returns (fmt, records). */
  private[graft] def parseBio(raw: Array[Byte]): Option[(String, Seq[BioRec])] = {
    if (raw == null || raw.length == 0) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    if (s.contains('\r')) return None // CR endings: out of subset
    val lines = s.split("\n", -1)
    val n = if (lines.nonEmpty && lines.last.isEmpty) lines.length - 1
            else return None // the file must end with a newline
    try {
      def census(seq: String, rec: Int, name: String,
          qual: Option[String]): BioRec = {
        if (seq.isEmpty || !seq.forall(isBase)) throw Fail
        var gc = 0
        var nc = 0
        seq.foreach { c =>
          if (c == 'G' || c == 'C') gc += 1
          else if (c == 'N') nc += 1
        }
        val qs = qual.map { q =>
          if (q.length != seq.length) throw Fail // the FASTQ length law
          var acc = 0L
          q.foreach { c =>
            if (c < '!' || c > '~') throw Fail // Phred+33 domain
            acc += (c - '!')
          }
          acc
        }
        BioRec(rec, name, seq.length, gc, nc, qs)
      }
      val out = Vector.newBuilder[BioRec]
      if (lines(0).startsWith(">")) { // FASTA
        var p = 0
        var rec = 0
        while (p < n) {
          val hdr = lines(p)
          if (!hdr.startsWith(">") || hdr.length < 2) throw Fail
          val name = hdr.substring(1).split(" ", 2)(0)
          if (name.isEmpty) throw Fail
          p += 1
          val sb = new StringBuilder
          while (p < n && !lines(p).startsWith(">")) {
            if (lines(p).isEmpty) throw Fail // blank lines out of subset
            sb.append(lines(p))
            p += 1
          }
          out += census(sb.toString, rec, name, None)
          rec += 1
        }
        Some(("fasta", out.result()))
      } else if (lines(0).startsWith("@")) { // FASTQ: strict 4-line records
        if (n % 4 != 0) throw Fail
        var rec = 0
        var p = 0
        while (p < n) {
          val hdr = lines(p)
          if (!hdr.startsWith("@") || hdr.length < 2) throw Fail
          val name = hdr.substring(1)
          if (name.isEmpty || name.contains(' ')) throw Fail
          val sep = lines(p + 2)
          if (sep != "+" && sep != "+" + name) throw Fail
          out += census(lines(p + 1), rec, name, Some(lines(p + 3)))
          rec += 1
          p += 4
        }
        Some(("fastq", out.result()))
      } else None
    } catch { case Fail => None }
  }

  /** Explode a sequence-media table into per-record rows. */
  def extractBio(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("rec", IntegerType, true),
      StructField("fmt", StringType, true),
      StructField("name", StringType, true),
      StructField("length", IntegerType, true),
      StructField("gc", IntegerType, true),
      StructField("n_count", IntegerType, true),
      StructField("qual_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseBio(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((fmt, recs)) => recs.map { b =>
            Row(id, b.rec, fmt, b.name, b.length, b.gc, b.nCount,
              b.qualSum.map(Long.box).orNull, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  private[graft] def baseAt(i: Long, k: Long, j: Long): Char =
    "ACGTN".charAt(((i * 3 + k * 5 + j) % 5).toInt)

  /** Fixture: even ids FASTA (sequences split across two lines — the
    * assembly law), odd ids FASTQ (every second separator repeats the
    * name); 2-4 records of 20-49 bases; base and quality laws are
    * closed-form in (i, k, j). */
  def bioFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nrec = 2 + i % 3
      val sb = new StringBuilder
      (0 until nrec).foreach { k =>
        val len = 20 + (i + k * 7) % 30
        val seq = (0 until len).map(j => baseAt(i, k, j)).mkString
        if (i % 2 == 0) {
          sb.append(s">seq_${i}_$k desc ${(i + k) % 9}\n")
          val (a, b) = seq.splitAt(len / 2)
          sb.append(a).append('\n').append(b).append('\n')
        } else {
          val qual = (0 until len)
            .map(j => (33 + (i + k + j) % 40).toChar).mkString
          sb.append(s"@seq_${i}_$k\n").append(seq).append('\n')
          sb.append(if (k % 2 == 0) "+" else s"+seq_${i}_$k").append('\n')
          sb.append(qual).append('\n')
        }
      }
      Row(i.toLong, sb.toString.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
