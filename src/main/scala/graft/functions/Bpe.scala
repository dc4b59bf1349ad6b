package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.{col, count, explode, lit, split}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the REAL subword
  * tokenizer behind token counting: token budgets, mixing rates and
  * repetition thresholds in LLM data pipelines are defined in
  * tokenizer pieces, not letter runs (the prior `bpeishTokenCount`
  * regex stand-in).
  *
  * Training (the classic formulation, over the word-frequency dict —
  * not the corpus): one distributed word-count shuffle bounds the
  * vocabulary, the top `maxVocab` (by frequency, then value) words
  * are collected, and merges are learned driver-side: repeatedly
  * merge the most frequent adjacent symbol pair (ties → smallest
  * (left, right) pair — fully deterministic, no RNG needed). At
  * 100 TB the word-count is the only corpus-sized step and it is one
  * partial-aggregated groupBy; the dict fits any driver.
  *
  * Encoding replays a FIXED, checked-in merge table
  * (`graft/bpe_merges.txt` on the classpath, regenerate via
  * `runMain graft.BpeTrain`): per word, repeatedly find the
  * lowest-rank adjacent pair present in the table and merge its
  * LEFTMOST occurrence, until no pair is in the table. One merge per
  * step keeps the procedure exactly replayable as a DuckDB recursive
  * CTE — the q57 oracle re-runs the same algebra from the same table.
  *
  * Words are `split(text, " ")` (single space, the suite-wide
  * convention); symbols are Unicode code points, matching DuckDB's
  * substr semantics.
  */
object Bpe {

  /** The checked-in merge table, rank order = line order. */
  lazy val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "graft/bpe_merges.txt missing from classpath — " +
      "regenerate with `runMain graft.BpeTrain`")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        (line.substring(0, i), line.substring(i + 1))
      }.toIndexedSeq
    finally in.close()
  }

  private lazy val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) => m.put(l + "\t" + r, i) }
    m
  }

  /** Greedy merge-table replay for one word → subword pieces. */
  def encodeWord(word: String): Array[String] =
    encodeWith(word, rankOf)

  private[graft] def encodeWith(
      word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    // symbols = code points (DuckDB substr is per code point)
    var syms = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf.toArray
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + "\t" + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        val merged = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, merged, 0, bestPos)
        merged(bestPos) = syms(bestPos) + syms(bestPos + 1)
        System.arraycopy(syms, bestPos + 2, merged, bestPos + 1,
          syms.length - bestPos - 2)
        syms = merged
      }
    }
    syms
  }

  /** Per-word piece counts for a whole document (split on single
    * space, empties kept — the empty word encodes to 0 pieces). */
  def pieceCountsOf(text: String): Array[Long] = {
    val words = text.split(" ", -1)
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { out(i) = encodeWord(words(i)).length.toLong; i += 1 }
    out
  }

  /** Entry point for codegen ([[BpePieceCounts.doGenCode]]). */
  def computePieceCounts(text: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(pieceCountsOf(text.toString))

  /** Column API: per-word BPE piece counts, aligned with
    * `split(text, " ")` positions. */
  def pieceCounts(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      BpePieceCounts(org.apache.spark.sql.graftshim.ColumnShim.expression(c)))

  // ----------------------------------------------------------------
  // training

  /** Distributed word-count → driver-side merge learning. */
  def train(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 65536): IndexedSeq[(String, String)] = {
    val wc = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(wc, numMerges)
  }

  /** Classic BPE merge learning over a (word, frequency) dict:
    * each round counts adjacent symbol pairs weighted by word
    * frequency, merges the most frequent (ties → lexicographically
    * smallest pair), and rewrites the dict. Stops early when no pair
    * occurs at weight ≥ 2. Deterministic — no RNG. */
  def trainFromCounts(
      wordCounts: Array[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var exhausted = false
    while (rounds < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), best) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (best < 2) exhausted = true
        else {
          out += ((l, r))
          words = words.map { case (syms, c) =>
            var i = 0
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                buf += l + r; i += 2
              } else { buf += syms(i); i += 1 }
            }
            (buf.toArray, c)
          }
        }
      }
      rounds += 1
    }
    out.toIndexedSeq
  }
}

/** `array<long>` of per-word BPE piece counts, one O(word²·merges)
  * worst-case (tiny in practice) replay of the checked-in merge table
  * per row — a native codegen Expression, no UDF. */
case class BpePieceCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_piece_counts requires a string argument, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_piece_counts"

  protected override def nullSafeEval(input: Any): Any =
    Bpe.computePieceCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.computePieceCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): BpePieceCounts =
    copy(child = newChild)
}
