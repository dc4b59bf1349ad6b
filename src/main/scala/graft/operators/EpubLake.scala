package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.XmlLake.XElem

/** EPUB e-book extraction (IDPF OCF 3.0 container + OPF package +
  * XHTML content documents) — the book side of a pretraining corpus.
  * Deliberately a COMPOSITION of two parsers this engine already
  * trusts: [[ZipLake.parseZip]] walks the OCF container (CRC-verified
  * STORED/DEFLATE entries) and [[XmlLake.parseXml]] parses every XML
  * payload under the same strict well-formedness/XXE posture — no new
  * byte-level surface, just the OCF/OPF semantic walk on top:
  *
  *  - OCF: the FIRST zip entry must be `mimetype`, STORED, exactly
  *    `application/epub+zip` (the spec's magic-sniffing affordance);
  *    entry names must be unique; `META-INF/container.xml` (OCF
  *    namespace) carries exactly one `rootfile` whose `media-type` is
  *    `application/oebps-package+xml` and whose `full-path` resolves
  *    inside the container (no `..`/absolute escapes — zip-slip is a
  *    parse error here, not a courtesy);
  *  - OPF: `package` in the IDPF namespace, children in the spec's
  *    `metadata`, `manifest`, `spine` order; Dublin Core `dc:title` /
  *    `dc:language` exactly once; manifest ids and hrefs duplicate-
  *    free; every spine `idref` resolves to a manifest item of
  *    media-type `application/xhtml+xml`, each referenced at most
  *    once (non-spine assets — stylesheets, images — may ride along
  *    in manifest + container untouched);
  *  - content: XHTML-namespace `html` with `head`/`body` in order,
  *    `head` holding exactly one `title`; chapter text is the body's
  *    text nodes in document order, whitespace-normalized (the
  *    training-corpus law: markup boundaries become single spaces).
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object EpubLake {

  private val OcfNs = "urn:oasis:names:tc:opendocument:xmlns:container"
  private val OpfNs = "http://www.idpf.org/2007/opf"
  private val DcNs = "http://purl.org/dc/elements/1.1/"
  private val XhtmlNs = "http://www.w3.org/1999/xhtml"

  private[graft] final case class Chapter(
      seq: Int, href: String, title: String, text: String)

  private def single(e: XElem, n: String): Option[XElem] =
    e.elems.filter(_.name == n) match {
      case Vector(one) => Some(one)
      case _ => None
    }

  /** Container-relative path resolution; rejects escapes. */
  private def resolve(opfDir: String, href: String): Option[String] =
    if (href.isEmpty || href.startsWith("/") || href.contains("\\") ||
        href.split("/", -1).exists(s => s.isEmpty || s == "." || s == ".."))
      None
    else Some(opfDir + href)

  /** Body text nodes in document order, whitespace-normalized. */
  private def bodyText(e: XElem): String = {
    val sb = new StringBuilder
    def walk(x: XElem): Unit = x.kids.foreach {
      case XmlLake.XText(t) => sb.append(t).append(' ')
      case c: XElem => walk(c)
    }
    walk(e)
    sb.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  private def parseChapter(bytes: Array[Byte]): Option[(String, String)] = {
    val root = XmlLake.parseXml(bytes).getOrElse(return None)
    if (root.name != "html" || !root.attr("xmlns").contains(XhtmlNs))
      return None
    if (!root.wsOnlyText || root.elems.map(_.name) != Vector("head", "body"))
      return None
    val head = root.elems(0)
    if (!head.wsOnlyText || head.elems.map(_.name) != Vector("title"))
      return None
    val title = head.elems.head.leafText.getOrElse(return None)
    Some((title, bodyText(root.elems(1))))
  }

  /** Walk one EPUB; None on any OCF/OPF/XHTML violation. */
  private[graft] def parseEpub(raw: Array[Byte])
    : Option[(String, String, Seq[Chapter])] = {
    val entries = ZipLake.parseZip(raw).getOrElse(return None)
    if (entries.isEmpty) return None
    val first = entries.head
    if (first.name != "mimetype" || first.method != "stored" ||
        new String(first.payload, "US-ASCII") != "application/epub+zip")
      return None
    val byName = entries.map(e => e.name -> e).toMap
    if (byName.size != entries.size) return None // duplicate entry names

    // OCF container.xml → the package document's path
    val cx = byName.get("META-INF/container.xml").getOrElse(return None)
    val croot = XmlLake.parseXml(cx.payload).getOrElse(return None)
    if (croot.name != "container" || !croot.attr("xmlns").contains(OcfNs) ||
        !croot.attr("version").contains("1.0") || !croot.wsOnlyText)
      return None
    val rootfiles = single(croot, "rootfiles").getOrElse(return None)
    if (!rootfiles.wsOnlyText) return None
    val rootfile = single(rootfiles, "rootfile").getOrElse(return None)
    if (!rootfile.attr("media-type").contains("application/oebps-package+xml"))
      return None
    val opfPath = rootfile.attr("full-path").getOrElse(return None)
    if (opfPath.isEmpty || opfPath.startsWith("/") ||
        opfPath.split("/", -1).exists(s => s.isEmpty || s == "." || s == ".."))
      return None
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case i => opfPath.substring(0, i + 1)
    }

    // OPF package document
    val opf = byName.get(opfPath).getOrElse(return None)
    val proot = XmlLake.parseXml(opf.payload).getOrElse(return None)
    if (proot.name != "package" || !proot.attr("xmlns").contains(OpfNs) ||
        !proot.wsOnlyText) return None
    if (!proot.attr("version").exists(v => v == "2.0" || v == "3.0"))
      return None
    if (proot.elems.map(_.name) != Vector("metadata", "manifest", "spine"))
      return None
    val (metadata, manifest, spine) =
      (proot.elems(0), proot.elems(1), proot.elems(2))

    if (!metadata.attr("xmlns:dc").contains(DcNs) || !metadata.wsOnlyText)
      return None
    val bookTitle = single(metadata, "dc:title")
      .flatMap(_.leafText).getOrElse(return None)
    val language = single(metadata, "dc:language")
      .flatMap(_.leafText).getOrElse(return None)

    if (!manifest.wsOnlyText ||
        manifest.elems.exists(e => e.name != "item" || e.kids.nonEmpty))
      return None
    val items = manifest.elems.map { it =>
      val id = it.attr("id").getOrElse(return None)
      val href = it.attr("href").getOrElse(return None)
      val mt = it.attr("media-type").getOrElse(return None)
      (id, (href, mt))
    }
    if (items.map(_._1).distinct.size != items.size ||
        items.map(_._2._1).distinct.size != items.size) return None
    val byId = items.toMap

    if (!spine.wsOnlyText ||
        spine.elems.exists(e => e.name != "itemref" || e.kids.nonEmpty))
      return None
    val idrefs = spine.elems.map(_.attr("idref").getOrElse(return None))
    if (idrefs.isEmpty || idrefs.distinct.size != idrefs.size) return None

    val chapters = idrefs.zipWithIndex.map { case (idref, seq) =>
      val (href, mt) = byId.getOrElse(idref, return None)
      if (mt != "application/xhtml+xml") return None
      val path = resolve(opfDir, href).getOrElse(return None)
      val entry = byName.getOrElse(path, return None)
      val (title, text) = parseChapter(entry.payload).getOrElse(return None)
      Chapter(seq, href, title, text)
    }
    Some((bookTitle, language, chapters))
  }

  /** Explode an EPUB-media table into per-chapter rows (spine order)
    * with text stats from the assembled chapter text. */
  def extractEpub(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seq", IntegerType, true),
      StructField("href", StringType, true),
      StructField("chapter_title", StringType, true),
      StructField("book_title", StringType, true),
      StructField("language", StringType, true),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseEpub(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((bt, lang, chs)) => chs.map { c =>
            val (nWords, digitSum) = Warc.payloadStats(c.text.getBytes("UTF-8"))
            Row(id, c.seq, c.href, c.title, bt, lang, c.text,
              nWords, digitSum, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side) — the JDK's ZipOutputStream as the
  // independent container encoder, same posture as ZipLake's fixture

  /** Fixture: book i carries 2 + i%3 chapters; chapter text is two
    * `<p>` runs whose normalized join restores the word law (markup-
    * boundary whitespace law hash-gated via the text column); titles
    * plant `&`; a non-spine stylesheet asset rides in manifest +
    * container; language cycles en/fr/de. */
  def epubFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nc = 2 + i % 3
      val lang = Seq("en", "fr", "de")(i % 3)
      val chapters = (0 until nc).map { k =>
        val nt = 8 + (i + k) % 5
        val words = (0 until nt).map(j => s"e${(i * 7 + k * 3 + j) % 10}")
        val (p1, p2) = words.splitAt(nt / 2)
        val xhtml =
          "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            s"""<html xmlns="$XhtmlNs">\n""" +
            s"  <head><title>Chapter $i.$k</title></head>\n" +
            s"  <body>\n    <p>${p1.mkString(" ")}</p>\n" +
            s"    <p><em>${p2.head}</em> ${p2.tail.mkString(" ")}</p>\n" +
            "  </body>\n</html>\n"
        (s"ch_$k.xhtml", xhtml)
      }
      val manifest = chapters.zipWithIndex.map { case ((href, _), k) =>
        s"""    <item id="c$k" href="$href" media-type="application/xhtml+xml"/>\n"""
      }.mkString +
        "    <item id=\"css\" href=\"style.css\" media-type=\"text/css\"/>\n"
      val spine = chapters.indices
        .map(k => s"""    <itemref idref="c$k"/>\n""").mkString
      val opf =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<package xmlns="$OpfNs" version="3.0">\n""" +
          s"""  <metadata xmlns:dc="$DcNs">\n""" +
          s"    <dc:title>Book $i ${XmlLake.esc("&")} co</dc:title>\n" +
          s"    <dc:language>$lang</dc:language>\n" +
          "  </metadata>\n" +
          s"  <manifest>\n$manifest  </manifest>\n" +
          s"  <spine>\n$spine  </spine>\n</package>\n"
      val container =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<container xmlns="$OcfNs" version="1.0">\n""" +
          "  <rootfiles>\n" +
          "    <rootfile full-path=\"OEBPS/content.opf\" " +
          "media-type=\"application/oebps-package+xml\"/>\n" +
          "  </rootfiles>\n</container>\n"

      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      val mime = "application/epub+zip".getBytes("US-ASCII")
      val me = new java.util.zip.ZipEntry("mimetype")
      me.setMethod(java.util.zip.ZipOutputStream.STORED)
      me.setSize(mime.length)
      me.setCompressedSize(mime.length)
      val crc = new java.util.zip.CRC32
      crc.update(mime)
      me.setCrc(crc.getValue)
      zos.putNextEntry(me)
      zos.write(mime)
      zos.closeEntry()
      def put(name: String, body: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(body.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("META-INF/container.xml", container)
      put("OEBPS/content.opf", opf)
      chapters.foreach { case (href, xhtml) => put(s"OEBPS/$href", xhtml) }
      put("OEBPS/style.css", s"body { margin: ${i % 4}em; }")
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
