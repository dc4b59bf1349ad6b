package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.XmlLake.XElem

/** MediaWiki export-dump ingestion + wikitext→plaintext — the
  * Wikipedia side of a pretraining corpus (the `<mediawiki>` export
  * schema is published at mediawiki.org/xml/export-0.11.xsd; the
  * wikitext grammar is the published MediaWiki markup spec). Rides
  * [[XmlLake.parseXml]] for the dump container (same strict
  * well-formedness / XXE posture), then a STRICT wikitext kernel —
  * the two-stage shape real dumps force: markup arrives XML-escaped
  * inside `<text>`, so entity decode feeds a second parser:
  *
  *  - dump walk: `mediawiki` root in the export namespace, optional
  *    leading `siteinfo` (opaque), then `page` elements with
  *    title / integer ns / integer id each exactly once and exactly
  *    one `revision` ("current" dumps); revision requires integer
  *    id, RFC 3339 UTC `timestamp`, `model` == `wikitext`,
  *    `format` == `text/x-wiki`, and the `text` body;
  *  - wikitext kernel (whole-construct, never regex-over-the-blob):
  *    `{{templates}}` dropped with nesting, `[[link|label]]` → label
  *    / `[[link]]` → target with File:/Image:/Category: namespace
  *    links dropped whole, `[url label]` external links → label,
  *    `'''`/`''` emphasis markers stripped, `<ref …>…</ref>` and
  *    `<ref …/>` dropped, `<!-- -->` comments dropped, `== H ==`
  *    headings (2-6, symmetric) emitted as text, `*#:;` list
  *    prefixes stripped; ANY other HTML-ish `<`, stray bracket, or
  *    unclosed construct REJECTS the page (strictness = the corpus
  *    QA posture: a page the kernel can't fully account for is
  *    flagged, not half-cleaned);
  *  - output text is whitespace-normalized (markup boundaries become
  *    single spaces — the training-corpus law shared with EPUB/HTML).
  *
  * One blob = one task-local walk (codec-family plan shape). At
  * 100 TB the unit of parallelism is the dump FILE (multistream
  * exports ship as many independent members), which this table shape
  * already models — one row per member.
  */
object WikiLake {

  private val ExportNs = "http://www.mediawiki.org/xml/export-0.11/"

  private[graft] final case class WikiPage(
      seq: Int, title: String, ns: Int, pageId: Long, revTs: Long,
      text: String, nLinks: Int, nTemplates: Int, nSections: Int)

  private object Fail extends scala.util.control.ControlThrowable

  // ------------------------------------------------------------------
  // wikitext kernel

  /** Strict wikitext→plaintext; None on any construct the grammar
    * subset can't fully account for. Returns (normalized text,
    * links, templates, sections). */
  private[graft] def wikiPlain(src: String): Option[(String, Int, Int, Int)] = {
    var links = 0
    var templates = 0
    var sections = 0

    def skipTemplate(s: String, open: Int): Int = { // past "{{", returns past "}}"
      var p = open + 2
      var depth = 1
      while (depth > 0) {
        if (p >= s.length) throw Fail
        if (s.startsWith("{{", p)) { depth += 1; p += 2 }
        else if (s.startsWith("}}", p)) { depth -= 1; p += 2 }
        else p += 1
      }
      p
    }

    def inline(s: String): String = {
      val sb = new StringBuilder
      var p = 0
      while (p < s.length) {
        val c = s.charAt(p)
        if (s.startsWith("{{", p)) { templates += 1; p = skipTemplate(s, p) }
        else if (s.startsWith("[[", p)) {
          links += 1
          var q = p + 2
          var depth = 1
          while (depth > 0) {
            if (q >= s.length) throw Fail
            if (s.startsWith("[[", q)) { depth += 1; q += 2 }
            else if (s.startsWith("]]", q)) { depth -= 1; q += 2 }
            else q += 1
          }
          val inner = s.substring(p + 2, q - 2)
          val nsPrefix = inner.indexOf(':') match {
            case i if i > 0 && inner.lastIndexOf('|', i) < 0 =>
              Some(inner.substring(0, i))
            case _ => None
          }
          if (!nsPrefix.exists(Set("File", "Image", "Category"))) {
            val label = inner.indexOf('|') match {
              case -1 => inner
              case i => inner.substring(i + 1)
            }
            if (label.isEmpty) throw Fail
            sb.append(inline(label)).append(' ')
          }
          p = q
        } else if (s.startsWith("[http://", p) || s.startsWith("[https://", p)) {
          val close = s.indexOf(']', p)
          if (close < 0) throw Fail
          val body = s.substring(p + 1, close)
          body.indexOf(' ') match {
            case -1 => // bare external link renders as a marker; emit nothing
            case i => sb.append(body.substring(i + 1)).append(' ')
          }
          p = close + 1
        } else if (s.startsWith("'''", p)) p += 3
        else if (s.startsWith("''", p)) p += 2
        else if (s.startsWith("<!--", p)) {
          val close = s.indexOf("-->", p)
          if (close < 0) throw Fail
          p = close + 3
        } else if (s.startsWith("<ref", p)) {
          val gt = s.indexOf('>', p)
          if (gt < 0) throw Fail
          if (s.charAt(gt - 1) == '/') p = gt + 1
          else {
            val close = s.indexOf("</ref>", gt)
            if (close < 0) throw Fail
            p = close + 6
          }
        } else if (c == '<' || c == '[' || c == ']' || c == '{' || c == '}')
          throw Fail // construct the subset can't account for
        else { sb.append(c); p += 1 }
      }
      sb.toString
    }

    try {
      val pieces = Vector.newBuilder[String]
      src.split("\n", -1).foreach { line =>
        if (line.nonEmpty && line.charAt(0) == '=') {
          var c = 0
          while (c < line.length && line.charAt(c) == '=') c += 1
          if (c < 2 || c > 6) throw Fail
          // symmetric heading: "== title ==" with a nonempty,
          // '='-free title between single spaces
          val marks = "=" * c
          if (!line.endsWith(" " + marks) || line.length < 2 * c + 3 ||
              line.charAt(c) != ' ') throw Fail
          val title = line.substring(c + 1, line.length - c - 1)
          if (title.isEmpty || title.contains('=')) throw Fail
          sections += 1
          pieces += inline(title)
        } else {
          var body = line
          var k = 0
          while (k < body.length && "*#:;".indexOf(body.charAt(k)) >= 0)
            k += 1
          if (k > 0) {
            if (k >= body.length || body.charAt(k) != ' ') throw Fail
            body = body.substring(k + 1)
          }
          pieces += inline(body)
        }
      }
      val text = pieces.result().mkString(" ")
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      Some((text, links, templates, sections))
    } catch { case Fail => None }
  }

  // ------------------------------------------------------------------
  // dump walk

  private def single(e: XElem, n: String): Option[XElem] =
    e.elems.filter(_.name == n) match {
      case Vector(one) => Some(one)
      case _ => None
    }

  private def intLeaf(e: XElem, n: String): Option[Long] =
    single(e, n).flatMap(_.leafText).flatMap { t =>
      if (t.isEmpty || !t.forall(c => c >= '0' && c <= '9') ||
          t.length > 18) None
      else Some(t.toLong)
    }

  private val Rfc3339Z =
    """^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$""".r

  /** Walk one export dump; None on any schema/markup violation. */
  private[graft] def parseDump(raw: Array[Byte]): Option[Seq[WikiPage]] = {
    val root = XmlLake.parseXml(raw).getOrElse(return None)
    if (root.name != "mediawiki" || !root.attr("xmlns").contains(ExportNs) ||
        !root.wsOnlyText) return None
    val kids = root.elems
    val pages = kids.headOption match {
      case Some(si) if si.name == "siteinfo" => kids.tail // opaque subtree
      case _ => kids
    }
    if (pages.exists(_.name != "page")) return None
    val out = pages.zipWithIndex.map { case (pg, seq) =>
      if (!pg.wsOnlyText) return None
      if (!pg.elems.map(_.name).toSet.subsetOf(Set("title", "ns", "id",
          "revision"))) return None
      val title = single(pg, "title").flatMap(_.leafText).getOrElse(return None)
      val ns = intLeaf(pg, "ns").getOrElse(return None)
      val pageId = intLeaf(pg, "id").getOrElse(return None)
      val rev = single(pg, "revision").getOrElse(return None)
      if (!rev.wsOnlyText) return None
      intLeaf(rev, "id").getOrElse(return None)
      val ts = single(rev, "timestamp").flatMap(_.leafText)
        .getOrElse(return None)
      val epoch = ts match {
        case Rfc3339Z(_, _, _, _, _, _) =>
          XmlLake.w3cEpoch(ts).getOrElse(return None)
        case _ => return None
      }
      if (!single(rev, "model").flatMap(_.leafText).contains("wikitext"))
        return None
      if (!single(rev, "format").flatMap(_.leafText).contains("text/x-wiki"))
        return None
      val body = single(rev, "text").flatMap(_.leafText).getOrElse(return None)
      val (text, nl, ntp, nsec) = wikiPlain(body).getOrElse(return None)
      WikiPage(seq, title, ns.toInt, pageId, epoch, text, nl, ntp, nsec)
    }
    Some(out)
  }

  /** Explode a dump-media table into per-page rows with the cleaned
    * plaintext and markup census. */
  def extractWiki(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("page", IntegerType, true),
      StructField("title", StringType, true),
      StructField("ns", IntegerType, true),
      StructField("page_id", LongType, true),
      StructField("rev_epoch", LongType, true),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("n_links", IntegerType, true),
      StructField("n_templates", IntegerType, true),
      StructField("n_sections", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseDump(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(pgs) => pgs.map { p =>
            val (nWords, digitSum) = Warc.payloadStats(p.text.getBytes("UTF-8"))
            Row(id, p.seq, p.title, p.ns, p.pageId, p.revTs, p.text,
              nWords, digitSum, p.nLinks, p.nTemplates, p.nSections, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: dump i carries 2 + i%3 pages of 1-2 sections. Every
    * wikitext construct the kernel owns appears with a known
    * plaintext residue: wiki links with labels, a namespace Category
    * link (dropped whole), templates with nested braces every third
    * page, refs, emphasis, an external link, a list line. Titles
    * plant `&`. */
  def wikiFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val np = 2 + i % 3
      val pages = (0 until np).map { p =>
        val nsec = 1 + (i + p) % 2
        val bodyWiki = (0 until nsec).map { s =>
          def m(j: Int) = s"m${(i * 3 + p * 5 + s * 7 + j) % 10}"
          val tmpl =
            if ((i + p) % 3 == 0) s"{{cite|x=$i|inner={{sub|$s}}}}"
            else s"{{cite|x=$i}}"
          s"== Sec $s ==\n" +
            s"${m(0)} ${m(1)} ${m(2)} [[T${i}_${p}_$s|L${(i + p + s) % 7}]] " +
            s"'''b${(i + s) % 5}''' $tmpl${m(3)}<ref>drop $s</ref>\n" +
            s"[http://e$i.org/$s x${(p + s) % 9}]\n" +
            s"* ${m(4)}\n"
        }.mkString + s"[[Category:Cat$i]]\n"
        val epoch = 1704067200L + i * 86400L + p * 3600L
        val ts = java.time.Instant.ofEpochSecond(epoch).toString
        s"  <page>\n    <title>${XmlLake.esc(s"Page $i.$p & co")}</title>\n" +
          s"    <ns>${(p % 3) * 2}</ns>\n    <id>${i * 100 + p}</id>\n" +
          s"    <revision>\n      <id>${i * 1000 + p}</id>\n" +
          s"      <timestamp>$ts</timestamp>\n" +
          "      <model>wikitext</model>\n" +
          "      <format>text/x-wiki</format>\n" +
          s"""      <text xml:space="preserve">${XmlLake.esc(bodyWiki)}</text>\n""" +
          "    </revision>\n  </page>\n"
      }.mkString
      val xml = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        s"""<mediawiki xmlns="$ExportNs" version="0.11">\n""" +
        "  <siteinfo>\n    <sitename>graftwiki</sitename>\n" +
        s"    <dbname>gw$i</dbname>\n  </siteinfo>\n" +
        pages + "</mediawiki>\n"
      Row(i.toLong, xml.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
