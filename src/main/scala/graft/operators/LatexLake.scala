package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LaTeX→plaintext extraction (the arXiv side of a pretraining
  * corpus; the grammar subset is the published LaTeX2e command set).
  * Whole-construct kernel under the wiki/markdown posture — a source
  * the cleaner can't fully account for is FLAGGED, never
  * half-cleaned:
  *
  *  - document shape: `\documentclass{…}` preamble with optional
  *    `\usepackage`/`\title`/`\author`, body inside
  *    `\begin{document}…\end{document}`, nothing after;
  *  - prose constructs: `\section`/`\subsection` (counted, emitted),
  *    `\emph`/`\textbf`/`\textit` (content kept), bare `{…}` groups
  *    (transparent, balance enforced), `~` → space, `\\` → break,
  *    the character escapes `\%`, `\&`, `\_`, `\$`, `\#`;
  *  - censused-and-excluded: `$…$` inline and `\[…\]` /
  *    `\begin{equation}…\end{equation}` display math (count + chars
  *    — the math/prose split mirrors markdown's code/prose split),
  *    `\cite{…}` keys (counted, dropped), `\label`/`\ref` (dropped);
  *  - `%` comments stripped to EOL (except the `\%` escape);
  *    itemize/enumerate environments with `\item`;
  *  - ANY other command, bare special (`&`, `_`, `^`, `#`),
  *    unbalanced group/math, or unknown environment rejects.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object LatexLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class TexDoc(
      title: String, author: String, text: String, nSections: Int,
      nMath: Int, mathChars: Long, nCites: Int)

  /** Strict parse of one source; None on any violation. */
  private[graft] def parseTex(raw: Array[Byte]): Option[TexDoc] = {
    if (raw == null) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val src =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }

    var p = 0
    var nSections = 0
    var nMath = 0
    var mathChars = 0L
    var nCites = 0

    def fail(): Nothing = throw Fail
    def eof: Boolean = p >= src.length
    def cur: Char = { if (eof) fail(); src.charAt(p) }
    def skipComment(): Unit = { // cursor ON '%'
      while (!eof && cur != '\n') p += 1
    }
    def cmdName(): String = { // cursor past '\'
      if (eof) fail()
      val c = cur
      if (!c.isLetter) { p += 1; return c.toString } // control symbol
      val a = p
      while (!eof && cur.isLetter) p += 1
      src.substring(a, p)
    }
    /** Balanced brace group, RAW text (comments still stripped). */
    def rawGroup(): String = {
      if (cur != '{') fail()
      p += 1
      val sb = new StringBuilder
      var depth = 1
      while (depth > 0) {
        val c = cur
        if (c == '{') { depth += 1; sb.append(c); p += 1 }
        else if (c == '}') { depth -= 1; if (depth > 0) sb.append(c); p += 1 }
        else if (c == '%') skipComment()
        else { sb.append(c); p += 1 }
      }
      sb.toString
    }

    /** Inline-parse prose content. `stopEnv` names the terminator
      * this level consumes: "document"/"itemize"/"enumerate" end at
      * their `\end{…}`; null ends at a bare `}` (left unconsumed for
      * the caller). EOF before the terminator always rejects. */
    def flow(sb: StringBuilder, stopEnv: String): Unit = {
      var done = false
      while (!done) {
        if (eof) fail() // every level has an explicit terminator
        else cur match {
          case '%' => skipComment()
          case '~' => sb.append(' '); p += 1
          case '{' =>
            p += 1
            flow(sb, null)
            if (eof || cur != '}') fail()
            p += 1
          case '}' =>
            if (stopEnv != null) fail() // unbalanced inside an env
            done = true // caller consumes
          case '$' =>
            p += 1
            val display = !eof && cur == '$'
            if (display) p += 1
            val close = if (display) "$$" else "$"
            val at = src.indexOf(close, p)
            if (at < 0) fail()
            mathChars += (at - p)
            nMath += 1
            sb.append(' ')
            p = at + close.length
          case '&' | '_' | '^' | '#' => fail() // bare specials
          case '\\' =>
            p += 1
            cmdName() match {
              case "%" | "&" | "_" | "$" | "#" =>
                sb.append(src.charAt(p - 1))
              case "\\" => sb.append(' ') // line break
              case "[" => // display math \[ … \]
                val at = src.indexOf("\\]", p)
                if (at < 0) fail()
                mathChars += (at - p)
                nMath += 1
                sb.append(' ')
                p = at + 2
              case "section" | "subsection" =>
                nSections += 1
                sb.append(' ')
                inlineSub(sb, new Lx2(rawGroup()))
                sb.append(' ')
              case "emph" | "textbf" | "textit" =>
                inlineSub(sb, new Lx2(rawGroup()))
              case "cite" =>
                nCites += 1
                rawGroup()
              case "label" | "ref" => rawGroup()
              case "item" =>
                if (stopEnv != "itemize" && stopEnv != "enumerate") fail()
                sb.append(' ')
              case "maketitle" => sb.append(' ')
              case "begin" =>
                rawGroup() match {
                  case env @ ("itemize" | "enumerate") =>
                    sb.append(' ')
                    flow(sb, env)
                    sb.append(' ')
                  case "equation" =>
                    val at = src.indexOf("\\end{equation}", p)
                    if (at < 0) fail()
                    mathChars += (at - p)
                    nMath += 1
                    sb.append(' ')
                    p = at + "\\end{equation}".length
                  case _ => fail() // unknown environment
                }
              case "end" =>
                if (rawGroup() != stopEnv || stopEnv == null) fail()
                else done = true
              case _ => fail() // command outside the subset
            }
          case c => sb.append(c); p += 1
        }
      }
    }

    /** Group-content inline parser over an extracted raw string —
      * supports the escapes/styles legal inside titles/headings. */
    final class Lx2(val s: String) { var q = 0 }
    def inlineSub(sb: StringBuilder, g: Lx2): Unit = {
      while (g.q < g.s.length) {
        val c = g.s.charAt(g.q)
        if (c == '\\') {
          g.q += 1
          if (g.q >= g.s.length) fail()
          val e = g.s.charAt(g.q)
          if (e == '%' || e == '&' || e == '_' || e == '$' || e == '#') {
            sb.append(e)
            g.q += 1
          } else fail() // commands inside headings: out of subset
        } else if (c == '&' || c == '_' || c == '^' || c == '#' ||
            c == '{' || c == '}' || c == '$') fail()
        else { sb.append(c); g.q += 1 }
      }
    }

    try {
      def skipWsComments(): Unit = {
        var more = true
        while (more && !eof) {
          if (cur == '%') skipComment()
          else if (cur.isWhitespace) p += 1
          else more = false
        }
      }
      skipWsComments()
      if (!src.startsWith("\\documentclass", p)) fail()
      p += "\\documentclass".length
      rawGroup()
      var title = ""
      var author = ""
      var inPreamble = true
      while (inPreamble) {
        skipWsComments()
        if (eof || cur != '\\') fail()
        p += 1
        cmdName() match {
          case "usepackage" => rawGroup()
          case "title" =>
            val sb = new StringBuilder
            inlineSub(sb, new Lx2(rawGroup()))
            title = sb.toString
          case "author" =>
            val sb = new StringBuilder
            inlineSub(sb, new Lx2(rawGroup()))
            author = sb.toString
          case "begin" =>
            if (rawGroup() != "document") fail()
            inPreamble = false
          case _ => fail()
        }
      }
      val sb = new StringBuilder
      flow(sb, "document")
      skipWsComments()
      if (!eof) fail() // content after \end{document}
      val text = sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
      Some(TexDoc(title, author, text, nSections, nMath, mathChars, nCites))
    } catch { case Fail => None }
  }

  /** One row per document: title/author, cleaned prose, math/prose
    * split, citation census. */
  def extractLatex(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("title", StringType, true),
      StructField("author", StringType, true),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("n_sections", IntegerType, true),
      StructField("n_math", IntegerType, true),
      StructField("math_chars", LongType, true),
      StructField("n_cites", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        scala.util.Try(parseTex(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) =>
            val (nWords, digitSum) = Warc.payloadStats(d.text.getBytes("UTF-8"))
            Row(id, d.title, d.author, d.text, nWords, digitSum,
              d.nSections, d.nMath, d.mathChars, d.nCites, true)
          case None =>
            Row(id, null, null, null, null, null, null, null, null, null,
              false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: doc i has 1 + i%3 sections; each carries emphasis and
    * bold spans, a `~` tie, inline math (excluded + censused), a
    * dropped `\cite`, an escaped `\&`, an itemize pair, and every
    * second section a display `\[…\]`; titles carry `\&`; a `%`
    * comment is planted per section. */
  def latexFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ns = 1 + i % 3
      val body = (0 until ns).map { sct =>
        def w(j: Int) = (i * 7 + sct * 3 + j) % 10
        val disp =
          if (sct % 2 == 1) s"\\[z${(i + sct) % 10}=q\\]\n"
          else ""
        s"\\section{S$sct h${(i + sct) % 10}}\n" +
          s"w${w(0)} \\emph{w${w(1)}} \\textbf{w${w(2)}}~w${w(3)} % trailing\n" +
          s"$$x${(i + sct) % 7}+y${(i * 3 + sct) % 5}$$ \\cite{k$i} e\\&f\n" +
          "\\begin{itemize}\n" +
          s"\\item li${(i + sct) % 8}\n" +
          s"\\item lj${(i + sct) % 6}\n" +
          "\\end{itemize}\n" + disp
      }.mkString
      val tex =
        "\\documentclass{article}\n" +
          "\\usepackage{amsmath}\n" +
          s"\\title{T$i \\& co}\n" +
          s"\\author{A${i % 7}}\n" +
          "\\begin{document}\n\\maketitle\n" +
          body + "\\end{document}\n"
      Row(i.toLong, tex.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
