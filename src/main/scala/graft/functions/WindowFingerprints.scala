package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `windowTokens`-token window fingerprints of a document in ONE
  * O(bytes) pass — the kernel of substring-level dedup (Lee et al.
  * 2022: two docs are substring dups when they share any contiguous
  * n-token run).
  *
  * Value semantics: element w equals
  * `rolling_hash(concat_ws(" ", tokens[w ... w+n-1]))` under the
  * single-space tokenization `split(text, " ")` — same polynomial
  * (B = 257, M = 2^61 − 1, Horner over UTF-8 bytes) as
  * [[RollingHash]]. Splitting on single space and re-joining with
  * single space is the identity on any string, so each window IS a
  * substring of the original bytes; with prefix hashes
  * `fp(s[l..r)) = H(r) − H(l)·B^(r−l) mod M`, each window costs O(1)
  * instead of re-hashing ~n tokens — a naive per-window hash would
  * re-read every byte `windowTokens` times (50× CPU at the Lee et al.
  * window size, on 100 TB of text).
  */
case class WindowFingerprints(child: Expression, windowTokens: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"window_fingerprints requires a string argument, got ${child.dataType}")
    else if (windowTokens < 1)
      TypeCheckResult.TypeCheckFailure(
        s"window_fingerprints requires windowTokens >= 1, got $windowTokens")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_fingerprints"

  protected override def nullSafeEval(input: Any): Any =
    WindowFingerprints.compute(
      input.asInstanceOf[UTF8String].getBytes, windowTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowFingerprints.compute($c.getBytes(), $windowTokens)")

  override protected def withNewChildInternal(newChild: Expression): WindowFingerprints =
    copy(child = newChild)
}

object WindowFingerprints {
  import RollingHash.{Mod, Base, mulMod}

  // B^i mod M depends only on constants — share one lazily-grown
  // table across rows/threads instead of rebuilding the mulMods per
  // row (halves the kernel's modular multiplies). Volatile snapshot
  // read; growth (doubling, to the largest WINDOW SPAN seen — the
  // kernel only ever indexes pow(r − l), so the table is bounded by
  // ~windowTokens × max token length, NOT document length: one 100 MB
  // document must not pin an 800 MB long[] per executor JVM) under
  // lock. A pathological span past the cap (a single multi-MB token)
  // gets a transient local table instead of growing the shared one.
  private val MaxSharedPow = 1 << 20 // 8 MB of longs per executor JVM
  @volatile private var powTable: Array[Long] = Array(1L)
  private def powers(upTo: Int): Array[Long] = {
    if (upTo >= MaxSharedPow) {
      val np = new Array[Long](upTo + 1)
      np(0) = 1L
      var i = 1
      while (i <= upTo) { np(i) = mulMod(np(i - 1), Base); i += 1 }
      return np
    }
    val p = powTable
    if (p.length > upTo) p
    else synchronized {
      var cur = powTable
      if (cur.length <= upTo) {
        val n = math.max(upTo + 1, math.min(MaxSharedPow, cur.length * 2))
        val np = java.util.Arrays.copyOf(cur, n)
        var i = cur.length
        while (i < n) { np(i) = mulMod(np(i - 1), Base); i += 1 }
        powTable = np
        cur = np
      }
      cur
    }
  }

  /** Test hook: current shared-table length (bounded-growth spec). */
  private[graft] def sharedPowLength: Int = powTable.length

  /** Prefix-hash pass: H(i) = hash of bytes[0, i), pow(i) = B^i mod M;
    * token starts = 0 plus every index after a 0x20 byte (matching
    * `split(text, " ")`, where consecutive spaces yield empty
    * tokens). Window w spans [starts(w), starts(w+n) − 1) — the byte
    * form of joining its n tokens with single spaces. */
  def compute(bytes: Array[Byte], n: Int): ArrayData = {
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val nWin = nTok - n + 1
    if (nWin <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    val h = new Array[Long](len + 1)
    // the hash-difference step only indexes pow(r − l) for window
    // spans, so size the (shared) table by the max span, not len
    var maxSpan = 0
    var w0 = 0
    while (w0 < nWin) {
      val l = starts(w0)
      val r = if (w0 + n < nTok) starts(w0 + n) - 1 else len
      if (r - l > maxSpan) maxSpan = r - l
      w0 += 1
    }
    val pow = powers(maxSpan)
    i = 0
    while (i < len) {
      val s = mulMod(h(i), Base) + (bytes(i) & 0xff).toLong
      h(i + 1) = if (s >= Mod) s - Mod else s
      i += 1
    }
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val l = starts(w)
      val r = if (w + n < nTok) starts(w + n) - 1 else len
      val d = h(r) - mulMod(h(l), pow(r - l))
      out(w) = if (d < 0) d + Mod else d
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column API: `windowFingerprints($"text", 50)`. */
  def windowFingerprints(c: Column, windowTokens: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      WindowFingerprints(
        org.apache.spark.sql.graftshim.ColumnShim.expression(c), windowTokens))
}
