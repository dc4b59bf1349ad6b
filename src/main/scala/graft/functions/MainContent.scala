package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate removal — main-content extraction by link density, the
  * jusText/trafilatura-class heuristic every web-corpus pipeline runs
  * between raw HTML and the quality/dedup stages (navigation bars,
  * footers and link farms poison n-gram statistics and dedup keys if
  * they survive).
  *
  * Deterministic, integer-only keep rule (documented so the DuckDB
  * oracle can replay it exactly — no floats):
  *
  *  - the page is split into BLOCKS at block-tag boundaries (the
  *    [[HtmlToText]] block set);
  *  - per block, count non-whitespace TEXT chars and the subset
  *    contributed inside `<a>` elements (LINK chars), plus words;
  *  - a block survives iff `words >= 3` AND `2·linkChars <=
  *    textChars` (link density ≤ 1/2) — short fragments and
  *    link-dominated navigation/footer blocks drop;
  *  - surviving blocks join with '\n', each whitespace-collapsed
  *    under [[HtmlToText]]'s rules.
  *
  * Everything else (tag/entity/script/comment handling) is inherited
  * from the [[HtmlToText]] kernel semantics. Null-intolerant,
  * string → string, whole-stage codegen.
  */
case class MainContent(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"main_content requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "main_content"

  protected override def nullSafeEval(input: Any): Any =
    MainContent.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MainContent.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): MainContent =
    copy(child = newChild)
}

object MainContent {

  /** Column-API entry point. */
  def mainContent(c: Column): Column =
    ColumnShim.column(MainContent(ColumnShim.expression(c)))

  private final val MinWords = 3

  def extract(s: UTF8String): UTF8String =
    UTF8String.fromString(extractStr(s.toString))

  /** One block: visible text (pre-collapse) + link-char accounting. */
  private final class Block {
    val text = new java.lang.StringBuilder(64)
    var linkChars = 0
    def appendVisible(c: Char, inLink: Boolean): Unit = {
      text.append(c)
      if (inLink && !HtmlToText.isSpace(c) && c != '\n') linkChars += 1
    }
  }

  def extractStr(html: String): String = {
    val blocks = new scala.collection.mutable.ArrayBuffer[Block]()
    var cur = new Block
    def closeBlock(): Unit =
      if (cur.text.length > 0) { blocks += cur; cur = new Block }
    var aDepth = 0
    HtmlToText.walk(html, new HtmlToText.Sink {
      def visible(c: Char): Unit = cur.appendVisible(c, aDepth > 0)
      def break(): Unit = closeBlock()
      def tag(name: String, closing: Boolean): Unit =
        if (name == "a") {
          if (closing) { if (aDepth > 0) aDepth -= 1 } else aDepth += 1
        }
    })
    closeBlock()
    val out = new java.lang.StringBuilder(html.length / 4)
    blocks.foreach { b =>
      val collapsed = HtmlToText.collapse(b.text)
      if (collapsed.nonEmpty) {
        var words = 1; var textChars = 0
        var i = 0
        while (i < collapsed.length) {
          val c = collapsed.charAt(i)
          if (c == ' ' || c == '\n') words += 1 else textChars += 1
          i += 1
        }
        if (words >= MinWords && 2 * b.linkChars <= textChars) {
          if (out.length > 0) out.append('\n')
          out.append(collapsed)
        }
      }
    }
    out.toString
  }
}
