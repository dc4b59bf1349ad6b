package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted-distinct word n-gram shingle set as ONE native codegen
  * kernel — replaces the HOF chain
  * `sort_array(array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(split(text," "), i+1, n)))))`, which
  * allocates a sliced array + a concat buffer PER POSITION per row
  * and was the dominant cost of every shingle-family query whose
  * oracle-side join work is small (q124's profile). Semantics are
  * bit-identical to the HOF chain:
  *
  *  - words = split on EVERY single 0x20 byte, trailing/leading/empty
  *    segments kept (Java `split(" ", -1)` semantics — and 0x20 never
  *    occurs inside a multi-byte UTF-8 sequence, so the byte scan is
  *    exact);
  *  - fewer than n words → empty array;
  *  - shingle i = words[i..i+n-1] joined by single spaces (empty
  *    words contribute empty segments, exactly like concat_ws);
  *  - result sorted ascending in binary UTF8 order (sort_array's
  *    StringType ordering) with duplicates removed.
  *
  * One pass over the text bytes + one sort of the shingle slice
  * views; shingle bytes are copied once each from the original
  * buffer.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 16, s"shingle_set: n in [1, 16], got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_set requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_set"

  protected override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleSet.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  /** Sorted-distinct n-gram shingles of `text`'s single-space-split
    * words, as ArrayData of UTF8String. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // word boundaries: starts(i)..ends(i) delimit word i (exclusive
    // end); k spaces → k+1 words, empties included
    var words = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) words += 1
      i += 1
    }
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = bytes.length
    val m = words - n + 1
    val out = new Array[UTF8String](m)
    var s = 0
    while (s < m) {
      // shingle s spans words s..s+n-1: in the ORIGINAL byte buffer
      // those words are already separated by exactly one space each,
      // so the shingle is the contiguous slice starts(s)..ends(s+n-1)
      // — concat_ws(" ", ...) reproduced without any joining
      val from = starts(s)
      val until = ends(s + n - 1)
      out(s) = UTF8String.fromBytes(Arrays.copyOfRange(bytes, from, until))
      s += 1
    }
    Arrays.sort(out.asInstanceOf[Array[AnyRef]])
    // adjacent dedupe post-sort
    var uniq = 0
    i = 0
    while (i < m) {
      if (uniq == 0 || !out(i).equals(out(uniq - 1))) {
        out(uniq) = out(i); uniq += 1
      }
      i += 1
    }
    val res = new Array[Any](uniq)
    i = 0
    while (i < uniq) { res(i) = out(i); i += 1 }
    new GenericArrayData(res)
  }

  /** Column API: `shingleSet($"text", 3)`. */
  def shingleSet(c: Column, n: Int): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      ShingleSet(org.apache.spark.sql.graftshim.ColumnShim.expression(c), n))
}
