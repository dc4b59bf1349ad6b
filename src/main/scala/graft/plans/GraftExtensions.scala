package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BpePieceCounts, DotProduct, RollingHash, WindowFingerprints}

/** `SparkSessionExtensions` installer: registers the engine's native
  * Catalyst expressions as SQL functions, so `spark.sql` users get
  * them too:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *   ...
  *   spark.sql("SELECT rolling_hash(text), dot_product(a, b) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (new FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "rolling_hash(str)")
          RollingHash(children.head)
        }),
      (new FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "dot_product(arr, arr)")
          DotProduct(children(0), children(1))
        }),
      (new FunctionIdentifier("window_fingerprints"),
        new ExpressionInfo(classOf[WindowFingerprints].getName, "window_fingerprints"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "window_fingerprints(str, nTokens) — nTokens a constant int")
          // accept any FOLDABLE int expression (CAST(20 AS INT), 2*10,
          // …), not just a bare parsed literal
          val n = children(1) match {
            case e if e.foldable && e.dataType == IntegerType =>
              val v = e.eval()
              if (v == null) throw new IllegalArgumentException(
                "window_fingerprints: nTokens must not be null")
              v.asInstanceOf[Int]
            case other => throw new IllegalArgumentException(
              s"window_fingerprints: nTokens must be a constant int, got $other")
          }
          WindowFingerprints(children.head, n)
        }),
      (new FunctionIdentifier("html_to_text"),
        new ExpressionInfo(classOf[graft.functions.HtmlToText].getName,
          "html_to_text"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "html_to_text(str)")
          graft.functions.HtmlToText(children.head)
        }),
      (new FunctionIdentifier("main_content"),
        new ExpressionInfo(classOf[graft.functions.MainContent].getName,
          "main_content"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "main_content(str)")
          graft.functions.MainContent(children.head)
        }),
      (new FunctionIdentifier("unicode_norm"),
        new ExpressionInfo(classOf[graft.functions.UnicodeNorm].getName,
          "unicode_norm"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "unicode_norm(str, 'nfc'|'nfkc'|'strip')")
          val form = children(1) match {
            case e if e.foldable &&
                e.dataType == org.apache.spark.sql.types.StringType =>
              String.valueOf(e.eval())
            case other => throw new IllegalArgumentException(
              s"unicode_norm: form must be a constant string, got $other")
          }
          graft.functions.UnicodeNorm(children.head, form)
        }),
      (new FunctionIdentifier("bpe_piece_counts"),
        new ExpressionInfo(classOf[BpePieceCounts].getName, "bpe_piece_counts"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "bpe_piece_counts(str)")
          BpePieceCounts(children.head)
        }),
      (new FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[graft.functions.SortedIntersectCount].getName,
          "sorted_intersect_count"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "sorted_intersect_count(sorted array<string>, sorted array<string>)")
          graft.functions.SortedIntersectCount(children(0), children(1))
        }),
      (new FunctionIdentifier("sorted_intersect_count_long"),
        new ExpressionInfo(
          classOf[graft.functions.SortedIntersectCountLong].getName,
          "sorted_intersect_count_long"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "sorted_intersect_count_long(sorted array<bigint>, sorted array<bigint>)")
          graft.functions.SortedIntersectCountLong(children(0), children(1))
        }))

  /** Register on a live session (REPL/notebook path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftshim.ColumnShim.registerFunction(spark, id, info, builder)
    }
}
