package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markdown + YAML-front-matter extraction (CommonMark ATX subset +
  * the static-site-generator front-matter convention) — README /
  * documentation / blog corpora. The kernel is whole-construct like
  * [[WikiLake]]'s: every marker is either fully accounted for or the
  * document rejects — a page the cleaner can't fully parse is
  * FLAGGED, not half-cleaned:
  *
  *  - front matter: a leading `---` line opens a strict `key: value`
    * block (snake_case keys, unique; scalar values; `[a, b]` flow
  *    lists) closed by `---`; `title` (scalar), `date` (strict
  *    `YYYY-MM-DD` → epoch) and `tags` (flow list, counted) are
  *    projected; absence of the whole block is legal (nullable
  *    columns) — absence of the CLOSER is not;
  *  - blocks: ATX headings (`#{1,6} ` — the space is required by
  *    spec), `-`/`*`/`N.` list markers, `>` quotes, and fenced
  *    ``` code blocks, whose contents are EXCLUDED from prose text
  *    but censused (count + chars) — the code/prose split every
  *    training mix wants;
  *  - inline: `**bold**` / `*italic*` markers stripped (must balance
  *    within their line), `` `code` `` spans kept verbatim,
  *    `[label](url)` → label and `![alt](url)` → alt; a stray `]`
  *    or an unclosed span rejects;
  *  - prose joins under the whitespace law shared with EPUB/wiki.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object MarkdownLake {

  private object Fail extends scala.util.control.ControlThrowable

  private val KeyRe = """^[a-z_][a-z0-9_]*$""".r
  private val DateRe = """^(\d{4})-(\d{2})-(\d{2})$""".r

  private[graft] final case class MdDoc(
      title: Option[String], dateEpoch: Option[Long], nTags: Option[Int],
      text: String, nHeadings: Int, nLinks: Int, nCodeBlocks: Int,
      codeChars: Long)

  /** Strict parse of one document; None on any violation. */
  private[graft] def parseMd(raw: Array[Byte]): Option[MdDoc] = {
    if (raw == null) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }

    var nHead = 0
    var nLink = 0
    var nCode = 0
    var codeChars = 0L

    def inline(line: String): String = {
      val sb = new StringBuilder
      var p = 0
      var bold = false
      var ital = false
      while (p < line.length) {
        if (line.startsWith("**", p)) { bold = !bold; p += 2 }
        else if (line.charAt(p) == '*') { ital = !ital; p += 1 }
        else if (line.charAt(p) == '`') {
          val close = line.indexOf('`', p + 1)
          if (close < 0) throw Fail
          sb.append(line.substring(p + 1, close)) // verbatim span
          p = close + 1
        } else if (line.charAt(p) == '[' ||
            line.startsWith("![", p)) {
          val open = if (line.charAt(p) == '[') p else p + 1
          val rb = line.indexOf(']', open + 1)
          if (rb < 0 || rb + 1 >= line.length || line.charAt(rb + 1) != '(')
            throw Fail
          val close = line.indexOf(')', rb + 2)
          if (close < 0) throw Fail
          sb.append(line.substring(open + 1, rb)).append(' ')
          nLink += 1
          p = close + 1
        } else if (line.charAt(p) == ']') throw Fail // stray close
        else { sb.append(line.charAt(p)); p += 1 }
      }
      if (bold || ital) throw Fail // unbalanced span
      sb.toString
    }

    try {
      var lines = s.split("\n", -1).toList
      var title: Option[String] = None
      var date: Option[Long] = None
      var nTags: Option[Int] = None
      // front matter
      if (lines.headOption.contains("---")) {
        var rest = lines.tail
        val seen = scala.collection.mutable.HashSet.empty[String]
        var open = true
        while (open) {
          rest match {
            case Nil => throw Fail // unterminated block
            case "---" :: tl => rest = tl; open = false
            case ln :: tl =>
              val colon = ln.indexOf(": ")
              if (colon <= 0) throw Fail
              val k = ln.substring(0, colon)
              val v = ln.substring(colon + 2).trim
              if (KeyRe.findFirstIn(k).isEmpty || v.isEmpty || !seen.add(k))
                throw Fail
              k match {
                case "title" => title = Some(v)
                case "date" => v match {
                  case DateRe(y, m, d) =>
                    val epoch =
                      try java.time.LocalDate.of(y.toInt, m.toInt, d.toInt)
                        .toEpochDay * 86400L
                      catch { case _: java.time.DateTimeException => throw Fail }
                    date = Some(epoch)
                  case _ => throw Fail
                }
                case "tags" =>
                  if (!v.startsWith("[") || !v.endsWith("]")) throw Fail
                  val body = v.substring(1, v.length - 1)
                  if (body.isEmpty) nTags = Some(0)
                  else {
                    val parts = body.split(", ", -1)
                    if (parts.exists(t => t.isEmpty || t.contains(',')))
                      throw Fail
                    nTags = Some(parts.length)
                  }
                case _ => () // unknown scalar keys are legal metadata
              }
              rest = tl
          }
        }
        lines = rest
      }

      val pieces = Vector.newBuilder[String]
      var it = lines
      while (it.nonEmpty) {
        val line = it.head
        it = it.tail
        if (line.startsWith("```")) {
          nCode += 1
          val body = new StringBuilder
          var closed = false
          while (!closed) {
            it match {
              case Nil => throw Fail // unclosed fence
              case "```" :: tl => it = tl; closed = true
              case ln :: tl =>
                if (body.nonEmpty) body.append('\n')
                body.append(ln)
                it = tl
            }
          }
          codeChars += body.length
        } else if (line.startsWith("#")) {
          var c = 0
          while (c < line.length && line.charAt(c) == '#') c += 1
          if (c > 6 || c >= line.length || line.charAt(c) != ' ') throw Fail
          nHead += 1
          pieces += inline(line.substring(c + 1))
        } else if (line.startsWith("- ") || line.startsWith("* ")) {
          pieces += inline(line.substring(2))
        } else if (line.startsWith("> ")) {
          pieces += inline(line.substring(2))
        } else if (line.matches("^\\d+\\. .*")) {
          pieces += inline(line.substring(line.indexOf(". ") + 2))
        } else pieces += inline(line)
      }
      val text = pieces.result().mkString(" ")
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      Some(MdDoc(title, date, nTags, text, nHead, nLink, nCode, codeChars))
    } catch { case Fail => None }
  }

  /** One row per document: front-matter projection, cleaned prose,
    * markup census, code/prose split. */
  def extractMarkdown(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("title", StringType, true),
      StructField("date_epoch", LongType, true),
      StructField("n_tags", IntegerType, true),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("n_headings", IntegerType, true),
      StructField("n_links", IntegerType, true),
      StructField("n_code_blocks", IntegerType, true),
      StructField("code_chars", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        scala.util.Try(parseMd(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) =>
            val (nWords, digitSum) = Warc.payloadStats(d.text.getBytes("UTF-8"))
            Row(id, d.title.orNull, d.dateEpoch.map(Long.box).orNull,
              d.nTags.map(Int.box).orNull, d.text, nWords, digitSum,
              d.nHeadings, d.nLinks, d.nCodeBlocks, d.codeChars, true)
          case None =>
            Row(id, null, null, null, null, null, null, null, null, null,
              null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: doc i carries 1 + i%3 sections (heading, a paragraph
    * with bold/italic/inline-code/link spans, a list item, a quote,
    * and a fenced code block on even sections); every fourth doc has
    * NO front matter (nullable projection). */
  def markdownFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val ns = 1 + i % 3
      val fm =
        if (i % 4 == 3) ""
        else
          "---\n" +
            s"title: Post $i and co\n" +
            f"date: 2024-${1 + i % 12}%02d-${1 + (i * 3) % 28}%02d\n" +
            s"tags: [t${i % 5}, u${(i + 3) % 7}]\n" +
            s"draft: false\n---\n"
      val body = (0 until ns).map { sct =>
        def b(j: Int) = (i * 7 + sct * 3 + j) % 10
        val code =
          if (sct % 2 == 0)
            s"```\ncode_${i}_$sct()\nx = $i\n```\n"
          else ""
        s"## H$sct k${(i + sct) % 10}\n" +
          s"p${b(0)} **p${b(1)}** *p${b(2)}* `p${b(3)}` " +
          s"[lk${(i + sct) % 8}](http://e$i.org/$sct)\n" +
          s"- li${(i + sct) % 10}\n" +
          s"> q${(i + sct) % 6}\n" +
          code
      }.mkString
      Row(i.toLong, (fm + body).getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
