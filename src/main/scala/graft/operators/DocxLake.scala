package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.XmlLake.XElem

/** DOCX text extraction (ISO/IEC 29500 OOXML wordprocessing subset)
  * — office documents in a corpus. Like [[EpubLake]], a COMPOSITION
  * of trusted parsers: [[ZipLake.parseZip]] walks the OPC container,
  * [[XmlLake.parseXml]] parses the parts, and only the
  * wordprocessing semantic walk is new:
  *
  *  - OPC shape: `[Content_Types].xml` must register the
  *    wordprocessing main-part content type, `_rels/.rels` must
  *    target `word/document.xml` with the officeDocument relationship
  *    type, and that part must exist (unique entry names via the
  *    ZIP walk);
  *  - document: `w:document` in the wordprocessingml namespace →
  *    single `w:body` → `w:p` paragraphs (an optional trailing
  *    `w:sectPr` is layout, skipped); tables/fields/drawings are OUT
  *    of subset and reject;
  *  - paragraph: optional `w:pPr` (whose optional `w:pStyle w:val`
  *    beginning `Heading` is censused), then `w:r` runs; each run:
  *    optional `w:rPr` (opaque formatting), `w:t` text nodes and
  *    `w:br` breaks; RUN TEXTS CONCATENATE WITH NO SEPARATOR (the
  *    OOXML law every naive extractor gets wrong — a word split
  *    across runs must reassemble), paragraphs separate under the
  *    whitespace law shared with EPUB/wiki/markdown.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object DocxLake {

  private val WNs =
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
  private val RelNs =
    "http://schemas.openxmlformats.org/package/2006/relationships"
  private val CtNs =
    "http://schemas.openxmlformats.org/package/2006/content-types"
  private val DocRelType = "http://schemas.openxmlformats.org/" +
    "officeDocument/2006/relationships/officeDocument"
  private val MainCt = "application/vnd.openxmlformats-officedocument" +
    ".wordprocessingml.document.main+xml"

  private[graft] final case class Docx(
      text: String, nParas: Int, nRuns: Int, nHeadings: Int)

  private def single(e: XElem, n: String): Option[XElem] =
    e.elems.filter(_.name == n) match {
      case Vector(one) => Some(one)
      case _ => None
    }

  /** Walk one document; None on any OPC/OOXML violation. */
  private[graft] def parseDocx(raw: Array[Byte]): Option[Docx] = {
    val entries = ZipLake.parseZip(raw).getOrElse(return None)
    val byName = entries.map(e => e.name -> e).toMap
    if (byName.size != entries.size) return None

    // [Content_Types].xml must register the main part
    val ct = byName.get("[Content_Types].xml").getOrElse(return None)
    val croot = XmlLake.parseXml(ct.payload).getOrElse(return None)
    if (croot.name != "Types" || !croot.attr("xmlns").contains(CtNs) ||
        !croot.wsOnlyText) return None
    val registered = croot.elems.exists { e =>
      e.name == "Override" &&
        e.attr("PartName").contains("/word/document.xml") &&
        e.attr("ContentType").contains(MainCt)
    }
    if (!registered) return None

    // _rels/.rels must target the main part
    val rels = byName.get("_rels/.rels").getOrElse(return None)
    val rroot = XmlLake.parseXml(rels.payload).getOrElse(return None)
    if (rroot.name != "Relationships" || !rroot.attr("xmlns").contains(RelNs))
      return None
    val targets = rroot.elems.exists { e =>
      e.name == "Relationship" && e.attr("Type").contains(DocRelType) &&
        e.attr("Target").contains("word/document.xml")
    }
    if (!targets) return None

    val main = byName.get("word/document.xml").getOrElse(return None)
    val droot = XmlLake.parseXml(main.payload).getOrElse(return None)
    if (droot.name != "w:document" || !droot.attr("xmlns:w").contains(WNs) ||
        !droot.wsOnlyText) return None
    val body = single(droot, "w:body").getOrElse(return None)
    if (!body.wsOnlyText) return None

    var nRuns = 0
    var nHeadings = 0
    val paras = Vector.newBuilder[String]
    val kids = body.elems
    val (paraElems, tail) = kids.span(_.name == "w:p")
    // optional trailing section properties; anything else rejects
    if (!(tail.isEmpty || (tail.size == 1 && tail.head.name == "w:sectPr")))
      return None
    if (paraElems.isEmpty) return None
    paraElems.foreach { p =>
      if (!p.wsOnlyText) return None
      val sb = new StringBuilder
      var at = 0
      val pk = p.elems
      // optional leading w:pPr
      if (at < pk.size && pk(at).name == "w:pPr") {
        val ppr = pk(at)
        // heading census via w:pStyle w:val
        ppr.elems.foreach { pr =>
          if (pr.name == "w:pStyle" &&
              pr.attr("w:val").exists(_.startsWith("Heading")))
            nHeadings += 1
        }
        at += 1
      }
      while (at < pk.size) {
        val r = pk(at)
        if (r.name != "w:r") return None // tables/fields: out of subset
        if (!r.wsOnlyText) return None
        nRuns += 1
        r.elems.foreach { c =>
          c.name match {
            case "w:rPr" => () // formatting: opaque
            case "w:t" =>
              // runs concatenate with NO separator
              sb.append(c.leafText.getOrElse(return None))
            case "w:br" => sb.append(' ')
            case _ => return None
          }
        }
        at += 1
      }
      paras += sb.toString
    }
    val text = paras.result().mkString(" ")
      .split("\\s+").filter(_.nonEmpty).mkString(" ")
    Some(Docx(text, paraElems.size, nRuns, nHeadings))
  }

  /** One row per document. */
  def extractDocx(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("n_paras", IntegerType, true),
      StructField("n_runs", IntegerType, true),
      StructField("n_headings", IntegerType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        scala.util.Try(parseDocx(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some(d) =>
            val (nWords, digitSum) = Warc.payloadStats(d.text.getBytes("UTF-8"))
            Row(id, d.text, nWords, digitSum, d.nParas, d.nRuns,
              d.nHeadings, true)
          case None => Row(id, null, null, null, null, null, null, false)
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: doc i carries 2 + i%3 paragraphs; paragraph 0 is a
    * Heading1; every paragraph splits a WORD across two runs (the
    * no-separator law is hash-gated via the text column) and plants
    * an entity + a w:br; a trailing w:sectPr rides along. */
  def docxFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val np = 2 + i % 3
      val paras = (0 until np).map { p =>
        def a(j: Int) = (i * 7 + p * 3 + j) % 10
        val style =
          if (p == 0)
            "<w:pPr><w:pStyle w:val=\"Heading1\"/></w:pPr>"
          else ""
        // run 1 ends mid-word; run 2 completes it: "ha{a0}" + "lf{a1}"
        s"<w:p>$style" +
          s"<w:r><w:rPr><w:b/></w:rPr><w:t>ha${a(0)}</w:t></w:r>" +
          s"<w:r><w:t>lf${a(1)} amp&amp;${a(2)}</w:t>" +
          s"<w:br/><w:t>tail${a(3)}</w:t></w:r>" +
          "</w:p>"
      }.mkString
      val doc =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<w:document xmlns:w="$WNs"><w:body>$paras""" +
          "<w:sectPr></w:sectPr></w:body></w:document>"
      val ctXml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<Types xmlns="$CtNs">""" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          s"""<Override PartName="/word/document.xml" ContentType="$MainCt"/>""" +
          "</Types>"
      val relsXml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<Relationships xmlns="$RelNs">""" +
          s"""<Relationship Id="rId1" Type="$DocRelType" Target="word/document.xml"/>""" +
          "</Relationships>"
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      def put(name: String, body: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(body.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", ctXml)
      put("_rels/.rels", relsXml)
      put("word/document.xml", doc)
      zos.close()
      Row(i.toLong, bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
