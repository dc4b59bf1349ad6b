package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → visible-text extraction as a native codegen Catalyst
  * expression — the step between a web archive (q157) and every text
  * operator in the engine (quality, langid, dedup). One pass, no
  * DOM: a web-scale corpus cannot afford tree-building per document,
  * and boilerplate-free TEXT is all the downstream pipeline reads.
  *
  * Deterministic, documented semantics (the subset every extractor
  * agrees on — this is a text-mining normalization, not a browser):
  *
  *  - `<script>`/`<style>` elements are elided WITH their content
  *    (scan to the matching case-insensitive close tag; unterminated
  *    → rest of document dropped, matching browser source handling).
  *  - comments `<!-- -->`, doctypes/PIs `<! >` `<? >` are elided.
  *  - tags are elided; attribute values may contain `>` inside
  *    quotes (scanned quote-aware). BLOCK-level tags (p, div, li,
  *    h1-h6, tr, …) contribute a line break; inline tags (b, a,
  *    span, …) contribute nothing so words they split stay joined.
  *  - a `<` not opening a tag (`a < b`, `<3`) is literal text.
  *  - character references: the five XML named entities + nbsp, and
  *    numeric `&#123;` / `&#x1F;` forms (surrogate/overflow-safe);
  *    anything malformed stays literal.
  *  - whitespace (incl. NBSP) collapses: runs → one space, runs
  *    containing a block-tag line break → one '\n', leading/trailing
  *    trimmed. Source newlines are ordinary whitespace (rendering
  *    semantics) — only block tags break lines.
  *
  * Null-intolerant, string → string, whole-stage-codegen'd via a
  * static kernel like [[RollingHash]].
  */
case class HtmlToText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_to_text requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_to_text"

  protected override def nullSafeEval(input: Any): Any =
    HtmlToText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlToText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlToText =
    copy(child = newChild)
}

object HtmlToText {

  /** Column-API entry point. */
  def htmlToText(c: Column): Column =
    ColumnShim.column(HtmlToText(ColumnShim.expression(c)))

  /** Tags whose boundaries break lines in the extracted text. */
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "br", "hr",
      "ul", "ol", "li", "dl", "dt", "dd",
      "h1", "h2", "h3", "h4", "h5", "h6",
      "table", "thead", "tbody", "tfoot", "tr", "td", "th",
      "blockquote", "pre", "section", "article", "aside",
      "header", "footer", "nav", "form", "fieldset",
      "figure", "figcaption", "main", "address").foreach(s.add)
    s
  }

  def extract(s: UTF8String): UTF8String =
    UTF8String.fromString(extractStr(s.toString))

  /** Tokenizer callbacks — the one HTML walk feeding both this kernel
    * and [[MainContent]]'s block/link accounting. */
  private[functions] trait Sink {
    /** One visible character (entities decoded; source newlines
      * already mapped to spaces — rendering semantics). */
    def visible(c: Char): Unit
    /** A block-tag boundary (line-break marker). */
    def break(): Unit
    /** Any element tag (after eliding it); self-closed tags fire
      * open-then-close. */
    def tag(name: String, closing: Boolean): Unit
  }

  /** The kernel: single forward pass + whitespace-collapse pass. */
  def extractStr(html: String): String = {
    val raw = new java.lang.StringBuilder(math.min(html.length, 1 << 16))
    walk(html, new Sink {
      def visible(c: Char): Unit = raw.append(c)
      def break(): Unit = raw.append('\n')
      def tag(name: String, closing: Boolean): Unit = ()
    })
    collapse(raw)
  }

  /** Single forward pass over the markup, emitting visible chars /
    * block breaks / tag events into `sink`. */
  private[functions] def walk(html: String, sink: Sink): Unit = {
    val n = html.length
    val ent = new java.lang.StringBuilder(8) // entity scratch
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          var closing = false
          if (j < n && html.charAt(j) == '/') { closing = true; j += 1 }
          val ns = j
          while (j < n && (isLetter(html.charAt(j)) ||
              (j > ns && isDigit(html.charAt(j))))) j += 1
          if (j == ns) { // stray '<': literal text
            sink.visible(c); i += 1
          } else {
            val name = lower(html, ns, j)
            // scan to the tag's '>' honoring quoted attribute values
            var k = j; var quote = 0.toChar; var done = false
            while (k < n && !done) {
              val ch = html.charAt(k)
              if (quote != 0) { if (ch == quote) quote = 0 }
              else if (ch == '"' || ch == '\'') quote = ch
              else if (ch == '>') done = true
              k += 1
            }
            if (!done) i = n // unterminated tag: drop the tail
            else {
              i = k
              // `</name>` (closing) and `<name/>` (self-closed) have
              // no content to skip
              val selfClosed = k - 2 >= ns && html.charAt(k - 2) == '/'
              if (!closing && !selfClosed &&
                  (name == "script" || name == "style")) {
                val e = indexOfIgnoreCase(html, "</" + name, i)
                if (e < 0) i = n
                else {
                  val e2 = html.indexOf('>', e)
                  i = if (e2 < 0) n else e2 + 1
                }
              }
              sink.tag(name, closing)
              if (selfClosed && !closing) sink.tag(name, closing = true)
              if (BlockTags.contains(name)) sink.break()
            }
          }
        }
      } else if (c == '&') {
        ent.setLength(0)
        i += appendEntity(html, i, ent)
        var k = 0
        while (k < ent.length) { sink.visible(ent.charAt(k)); k += 1 }
      } else {
        // source line breaks are ordinary whitespace (HTML rendering
        // semantics) — only BLOCK tags produce the '\n' break marker
        sink.visible(if (c == '\n') ' ' else c); i += 1
      }
    }
  }

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  private def lower(s: String, from: Int, until: Int): String = {
    val b = new java.lang.StringBuilder(until - from)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    b.toString
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val nl = needle.length
    var i = math.max(from, 0)
    val last = s.length - nl
    while (i <= last) {
      var k = 0
      while (k < nl && java.lang.Character.toLowerCase(s.charAt(i + k)) ==
        java.lang.Character.toLowerCase(needle.charAt(k))) k += 1
      if (k == nl) return i
      i += 1
    }
    -1
  }

  /** Decode one character reference at `i` (s(i) == '&'); appends the
    * decoded char(s) or the literal '&' and returns chars consumed. */
  private def appendEntity(
      s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    var sc = i + 1
    val limit = math.min(n, i + 12) // longest accepted form: &#x10FFFF;
    while (sc < limit && s.charAt(sc) != ';') sc += 1
    if (sc >= limit || sc >= n || s.charAt(sc) != ';' || sc == i + 1) {
      out.append('&'); return 1
    }
    val body = s.substring(i + 1, sc)
    val consumed = sc - i + 1
    if (body.charAt(0) == '#') {
      val hex = body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
      val digits = body.substring(if (hex) 2 else 1)
      if (digits.isEmpty) { out.append('&'); return 1 }
      var cp = 0L
      var k = 0
      while (k < digits.length) {
        val d = java.lang.Character.digit(digits.charAt(k), if (hex) 16 else 10)
        if (d < 0) { out.append('&'); return 1 }
        cp = cp * (if (hex) 16 else 10) + d
        if (cp > 0x10ffffL) { out.append('&'); return 1 }
        k += 1
      }
      if (cp == 0 || (cp >= 0xd800L && cp <= 0xdfffL)) {
        out.append('&'); return 1
      }
      out.appendCodePoint(cp.toInt)
      consumed
    } else body match {
      case "amp"  => out.append('&'); consumed
      case "lt"   => out.append('<'); consumed
      case "gt"   => out.append('>'); consumed
      case "quot" => out.append('"'); consumed
      case "apos" => out.append('\''); consumed
      case "nbsp" => out.append(' '); consumed
      case _      => out.append('&'); 1 // unknown entity: literal
    }
  }

  private[functions] def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\f' || c == '\u00a0'

  /** Collapse whitespace runs: any run with a '\n' → one '\n', else
    * one ' '; leading/trailing runs dropped. */
  private[functions] def collapse(raw: java.lang.StringBuilder): String = {
    val n = raw.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var pendingBreak = false
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '\n') pendingBreak = true
      else if (isSpace(c)) pendingSpace = true
      else {
        if (out.length > 0) {
          if (pendingBreak) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingSpace = false; pendingBreak = false
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
