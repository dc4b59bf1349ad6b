package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unified-diff / git-patch extraction — the commit side of a code
  * corpus (the `diff --git` format is the published git interchange
  * format; the hunk grammar is POSIX `diff -u`). The strictness
  * posture has real teeth here because the format carries its OWN
  * redundancy, which this walk VERIFIES instead of trusting:
  *
  *  - `@@ -a,b +c,d @@` hunk counts must equal the actual number of
  *    old-side (` `/`-`) and new-side (` `/`+`) body lines — a
  *    truncated or hand-edited patch lies exactly here;
  *  - across hunks, the new-side start must equal the old-side start
  *    plus the CUMULATIVE line delta of all prior hunks (the
  *    arithmetic `git apply` relies on), and hunk starts must be
  *    strictly increasing;
  *  - per file: `--- a/<path>` / `+++ b/<path>` must name the same
  *    path as the `diff --git` line; the `index <hex>..<hex> <mode>`
  *    line requires well-formed blob hashes;
  *  - any line outside the grammar (incl. `\\ No newline` markers —
  *    out of subset) rejects the patch.
  *
  * Output is per FILE with the added-side text assembled (the code a
  * training mix actually ingests from a patch) plus the add/remove/
  * context census. One blob = one task-local walk.
  */
object DiffLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class DiffFile(
      seq: Int, path: String, nHunks: Int, nAdded: Int, nRemoved: Int,
      nContext: Int, addedText: String)

  private val GitRe = """^diff --git a/(\S+) b/(\S+)$""".r
  private val IndexRe = """^index [0-9a-f]{7,40}\.\.[0-9a-f]{7,40}( \d{6})?$""".r
  private val HunkRe = """^@@ -(\d+),(\d+) \+(\d+),(\d+) @@.*$""".r

  /** Walk one patch; None on any grammar or arithmetic violation. */
  private[graft] def parsePatch(raw: Array[Byte]): Option[Seq[DiffFile]] = {
    if (raw == null || raw.length == 0) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    val lines = s.split("\n", -1)
    // a trailing newline leaves one empty tail element; anything else
    // after the last hunk is out of grammar
    val n = if (lines.nonEmpty && lines.last.isEmpty) lines.length - 1
            else lines.length
    var p = 0
    def line(): String = { if (p >= n) throw Fail; val l = lines(p); p += 1; l }
    def peek: Option[String] = if (p < n) Some(lines(p)) else None

    try {
      val out = Vector.newBuilder[DiffFile]
      var seq = 0
      if (n == 0) throw Fail
      while (p < n) {
        val path = line() match {
          case GitRe(a, b) => if (a != b) throw Fail else a
          case _ => throw Fail
        }
        if (IndexRe.findFirstIn(line()).isEmpty) throw Fail
        if (line() != s"--- a/$path") throw Fail
        if (line() != s"+++ b/$path") throw Fail
        var nHunks = 0
        var nAdd = 0
        var nDel = 0
        var nCtx = 0
        var delta = 0 // cumulative (new − old) lines of prior hunks
        var lastOldStart = 0
        val added = Vector.newBuilder[String]
        var more = peek.exists(_.startsWith("@@"))
        if (!more) throw Fail // a file entry without hunks
        while (more) {
          val (os, ob, ns, nd) = line() match {
            case HunkRe(a, b, c, d) =>
              (a.toLong, b.toLong, c.toLong, d.toLong)
            case _ => throw Fail
          }
          if (os <= lastOldStart) throw Fail // hunks must advance
          if (ns != os + delta) throw Fail // the git-apply arithmetic
          lastOldStart = os.toInt
          var oldSeen = 0L
          var newSeen = 0L
          while (oldSeen < ob || newSeen < nd) {
            val l = line()
            if (l.startsWith(" ")) { oldSeen += 1; newSeen += 1; nCtx += 1 }
            else if (l.startsWith("-")) { oldSeen += 1; nDel += 1 }
            else if (l.startsWith("+")) {
              newSeen += 1; nAdd += 1; added += l.substring(1)
            } else throw Fail // incl. "\ No newline": out of subset
            if (oldSeen > ob || newSeen > nd) throw Fail // count lies
          }
          nHunks += 1
          delta += (nd - ob).toInt
          more = peek.exists(_.startsWith("@@"))
        }
        out += DiffFile(seq, path, nHunks, nAdd, nDel, nCtx,
          added.result().mkString("\n"))
        seq += 1
      }
      Some(out.result())
    } catch { case Fail => None }
  }

  /** Explode a patch-media table into per-file rows. */
  def extractDiffs(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("file", IntegerType, true),
      StructField("path", StringType, true),
      StructField("n_hunks", IntegerType, true),
      StructField("n_added", IntegerType, true),
      StructField("n_removed", IntegerType, true),
      StructField("n_context", IntegerType, true),
      StructField("added_text", StringType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parsePatch(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(fs) => fs.map { f =>
            val (_, digitSum) = Warc.payloadStats(f.addedText.getBytes("UTF-8"))
            Row(id, f.seq, f.path, f.nHunks, f.nAdded, f.nRemoved,
              f.nContext, f.addedText, digitSum, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: patch i touches 1 + i%3 files of 1-2 hunks; each hunk
    * removes one line and adds 1-2; new-side starts carry the real
    * cumulative delta so the arithmetic law is exercised, and hex
    * blob ids derive from the ids. */
  def diffFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nf = 1 + i % 3
      val sb = new StringBuilder
      (0 until nf).foreach { f =>
        val path = s"src/f${i}_$f.scala"
        sb.append(s"diff --git a/$path b/$path\n")
        sb.append(f"index ${i * 31 + f}%07x..${i * 37 + f + 1}%07x 100644\n")
        sb.append(s"--- a/$path\n")
        sb.append(s"+++ b/$path\n")
        val nh = 1 + (i + f) % 2
        var delta = 0
        (0 until nh).foreach { h =>
          val na = 1 + (i + f + h) % 2
          val ob = 3L // ctx + del + ctx
          val nd = 2L + na
          val os = 1 + h * 10
          sb.append(s"@@ -$os,$ob +${os + delta},$nd @@\n")
          sb.append(s" ctx c${(i + f + h) % 10}\n")
          sb.append(s"-old o${(i * 3 + f + h) % 10}\n")
          (0 until na).foreach { j =>
            sb.append(s"+new a${(i * 5 + f * 3 + h * 2 + j) % 10} " +
              s"b${(i + f + h + j) % 7}\n")
          }
          sb.append(s" ctx d${(i + f + h) % 6}\n")
          delta += (nd - ob).toInt
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
