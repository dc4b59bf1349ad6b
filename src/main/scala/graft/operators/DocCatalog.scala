package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mixed-format document catalog — the dispatch operator a real
  * 100 TB document lake needs FIRST: blobs arrive without trusted
  * format labels, so the engine sniffs magic bytes / structure and
  * routes each blob to the right extractor, unifying every format
  * onto one (id, seq, fmt, text, census) schema. The audio twin is
  * q154's catalog; this is the document side, composed entirely from
  * parsers this engine already trusts:
  *
  *  - `%PDF-` → [[PdfLake]] (per page);
  *  - `PK␃␄` → [[ZipLake]] once, then the CONTAINER disambiguates:
  *    a first-entry `mimetype` of `application/epub+zip` →
  *    [[EpubLake]] (per chapter), a `word/document.xml` part →
  *    [[DocxLake]] (whole doc) — the zip is parsed ONCE and the
  *    payload walk reuses it, never re-inflated;
  *  - `\documentclass` → [[LatexLake]]; `<?xml` with a `mediawiki`
  *    root → [[WikiLake]] (per page); a `---` front-matter opener or
  *    ATX heading → [[MarkdownLake]]; `{\rtf` → [[RtfLake]] (r14);
  *  - anything else (or a sniffed format whose strict parse then
  *    fails) → one valid=false row: mislabeled/corrupt blobs are a
  *    CENSUS, not an error.
  *
  * One blob = one task-local sniff+walk (codec-family plan shape;
  * at scale the fan-out is pure per-partition work).
  */
object DocCatalog {

  private def startsWith(raw: Array[Byte], s: String): Boolean = {
    if (raw.length < s.length) return false
    var i = 0
    while (i < s.length) {
      if ((raw(i) & 0xff) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** (fmt, per-sequence text rows); None for unknown/corrupt. */
  private[graft] def route(raw: Array[Byte]): Option[(String, Seq[(Int, String)])] = {
    if (raw == null || raw.length < 4) return None
    if (startsWith(raw, "%PDF-"))
      PdfLake.parsePdf(raw).map { case (_, pgs) =>
        ("pdf", pgs.map(p => (p.seq, p.text)))
      }
    else if (raw(0) == 'P' && raw(1) == 'K' && raw(2) == 3 && raw(3) == 4) {
      // one container walk; the structure disambiguates the family
      val entries = ZipLake.parseZip(raw).getOrElse(return None)
      val names = entries.map(_.name).toSet
      if (entries.headOption.exists(e => e.name == "mimetype" &&
          new String(e.payload, "US-ASCII") == "application/epub+zip"))
        EpubLake.parseEpub(raw).map { case (_, _, chs) =>
          ("epub", chs.map(c => (c.seq, c.text)))
        }
      else if (names.contains("word/document.xml"))
        DocxLake.parseDocx(raw).map(d => ("docx", Seq((0, d.text))))
      else None
    }
    else if (startsWith(raw, "\\documentclass"))
      LatexLake.parseTex(raw).map(d => ("latex", Seq((0, d.text))))
    else if (startsWith(raw, "<?xml") &&
        new String(raw, 0, math.min(raw.length, 256), "ISO-8859-1")
          .contains("<mediawiki"))
      WikiLake.parseDump(raw).map { pgs =>
        ("wiki", pgs.map(p => (p.seq, p.text)))
      }
    else if (startsWith(raw, "---\n") || startsWith(raw, "# ") ||
        startsWith(raw, "## "))
      MarkdownLake.parseMd(raw).map(d => ("markdown", Seq((0, d.text))))
    else if (startsWith(raw, "{\\rtf"))
      RtfLake.parseRtf(raw).map(d => ("rtf", Seq((0, d.text))))
    else None
  }

  /** Explode a mixed document-media table into unified text rows. */
  def extractDocs(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("seq", IntegerType, true),
      StructField("fmt", StringType, true),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(route(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((fmt, texts)) => texts.map { case (seq, t) =>
            val (nw, dsum) = Warc.payloadStats(t.getBytes("UTF-8"))
            Row(id, seq, fmt, t, nw, dsum, true)
          }
          case None => Seq(Row(id, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Fixture: interleave six trusted fixtures — global id = 6·m + f
    * for format index f ∈ pdf(0), docx(1), epub(2), markdown(3),
    * latex(4), wiki(5) — so the mixed table carries every format in
    * every partition. */
  def docCatalogFixture(spark: SparkSession, perFormat: Int): DataFrame = {
    val parts = Seq(
      PdfLake.pdfFixture(spark, perFormat) -> 0,
      DocxLake.docxFixture(spark, perFormat) -> 1,
      EpubLake.epubFixture(spark, perFormat) -> 2,
      MarkdownLake.markdownFixture(spark, perFormat) -> 3,
      LatexLake.latexFixture(spark, perFormat) -> 4,
      WikiLake.wikiFixture(spark, perFormat) -> 5)
    parts.map { case (fx, f) =>
      fx.select((col("id") * 6 + f).as("id"), col("media"))
    }.reduce(_ unionByName _)
  }
}
