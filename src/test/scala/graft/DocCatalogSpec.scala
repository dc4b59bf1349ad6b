package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.DocCatalog

/** Sniff+dispatch catalog: routing correctness (path equality vs
  * the dedicated extractors), unknown/corrupt census, flip sweep. */
class DocCatalogSpec extends SparkSpec {

  test("every format routes and matches its dedicated extractor") {
    import org.apache.spark.sql.functions._
    val fx = DocCatalog.docCatalogFixture(spark, 6)
    val got = DocCatalog.extractDocs(fx, "id", "media")
      .orderBy("id", "seq").collect()
    assert(got.forall(_.getBoolean(6)))
    // format census: ids ≡ f (mod 6)
    got.foreach { r =>
      val f = (r.getLong(0) % 6).toInt
      assert(r.getString(2) ==
        Seq("pdf", "docx", "epub", "markdown", "latex", "wiki")(f))
    }
    // path equality for the multi-row formats: texts must equal the
    // dedicated extractors' outputs on the same inner fixtures
    val viaPdf = graft.operators.PdfLake.extractPdf(
      graft.operators.PdfLake.pdfFixture(spark, 6), "id", "media")
      .select((col("id") * 6).as("id"), col("page").as("seq"), col("text"))
      .orderBy("id", "seq").collect().map(r => (r.getLong(0), r.getInt(1),
        r.getString(2)))
    val gotPdf = got.filter(_.getLong(0) % 6 == 0)
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(gotPdf.toSeq == viaPdf.toSeq, "pdf path equality")
    val viaWiki = graft.operators.WikiLake.extractWiki(
      graft.operators.WikiLake.wikiFixture(spark, 6), "id", "media")
      .select((col("id") * 6 + 5).as("id"), col("page").as("seq"), col("text"))
      .orderBy("id", "seq").collect().map(r => (r.getLong(0), r.getInt(1),
        r.getString(2)))
    val gotWiki = got.filter(_.getLong(0) % 6 == 5)
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(gotWiki.toSeq == viaWiki.toSeq, "wiki path equality")
  }

  test("rtf routes through the catalog and equals RtfLake's render") {
    // r14: the `{\rtf` magic joins the dispatch; q186's fixture and
    // oracle are untouched (no rtf blobs there) — this pins the new
    // branch at the unit level
    val blobs = graft.operators.RtfLake.rtfFixture(spark, 4).collect()
      .map(_.getAs[Array[Byte]](1))
    blobs.foreach { b =>
      val routed = DocCatalog.route(b)
      assert(routed.exists(_._1 == "rtf"))
      assert(routed.get._2 ==
        Seq((0, graft.operators.RtfLake.parseRtf(b).get.text)))
    }
    // a corrupt rtf (unknown control word) censuses as None
    assert(DocCatalog.route(
      "{\\rtf1\\ansi \\frobnicate}".getBytes("ISO-8859-1")).isEmpty)
  }

  test("unknown and corrupt blobs census as invalid") {
    def mediaDf(blobs: Seq[(Long, Array[Byte])]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          blobs.map { case (i, b) => Row(i, b) }, 2),
        StructType(Seq(
          StructField("id", LongType, false),
          StructField("media", BinaryType, true))))
    val pdfish = "%PDF-1.7 then garbage".getBytes("ISO-8859-1")
    val zipish = Array[Byte]('P', 'K', 3, 4, 9, 9)
    val xmlish = "<?xml version=\"1.0\"?><notwiki/>".getBytes("UTF-8")
    val plain = "just some plain text with no magic".getBytes("UTF-8")
    val rows = DocCatalog.extractDocs(mediaDf(Seq(
      (0L, pdfish), (1L, zipish), (2L, xmlish), (3L, plain),
      (4L, null))), "id", "media").collect()
    assert(rows.length == 5 && rows.forall(!_.getBoolean(6)))
  }

  test("byte-flip sweep never throws") {
    val seeds = DocCatalog.docCatalogFixture(spark, 6).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 11; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      DocCatalog.route(c) // must not throw
    }
  }
}
