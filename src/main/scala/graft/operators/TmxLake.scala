package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.XmlLake.XElem

/** TMX translation-memory extraction (LISA TMX 1.4 — THE standard
  * interchange for aligned translation pairs; with [[PoLake]] this
  * covers both halves of how parallel corpora actually ship). Rides
  * the strict XML core ([[XmlLake.parseXml]] — same well-formedness
  * and XXE posture); the dialect walk:
  *
  *  - `tmx version="1.4"` → empty `header` carrying the REQUIRED
  *    attributes (`srclang`, `segtype` from the spec's four-word
  *    enum, `datatype`, `adminlang`) → single `body`;
  *  - each `tu` (optional `tuid`) holds exactly TWO `tuv` variants
  *    in subset: the first must carry the header's `srclang` (the
  *    alignment law), the second a DIFFERENT target language; each
  *    `tuv` holds exactly one `seg` leaf (entities/CDATA decode
  *    through the XML core);
  *  - `srclang="*all*"`, inline markup inside `seg` (`<bpt>`/`<ph>`
  *    …), and >2 variants are OUT of subset and reject.
  */
object TmxLake {

  private val Segtypes = Set("block", "paragraph", "sentence", "phrase")

  private[graft] final case class Tu(
      seq: Int, tuid: Option[String], tgtLang: String,
      srcText: String, tgtText: String)

  private def single(e: XElem, n: String): Option[XElem] =
    e.elems.filter(_.name == n) match {
      case Vector(one) => Some(one)
      case _ => None
    }

  /** Walk one memory; None on any violation. Returns (srclang, tus). */
  private[graft] def parseTmx(raw: Array[Byte]): Option[(String, Seq[Tu])] = {
    val root = XmlLake.parseXml(raw).getOrElse(return None)
    if (root.name != "tmx" || !root.attr("version").contains("1.4") ||
        !root.wsOnlyText) return None
    val header = single(root, "header").getOrElse(return None)
    if (header.kids.nonEmpty) return None // header is an EMPTY element
    val srclang = header.attr("srclang").getOrElse(return None)
    if (srclang == "*all*" || srclang.isEmpty) return None
    if (!header.attr("segtype").exists(Segtypes)) return None
    for (req <- Seq("datatype", "adminlang", "creationtool"))
      header.attr(req).getOrElse(return None)
    val body = single(root, "body").getOrElse(return None)
    if (root.elems.size != 2 || !body.wsOnlyText) return None
    if (body.elems.exists(_.name != "tu")) return None

    val out = body.elems.zipWithIndex.map { case (tu, seq) =>
      if (!tu.wsOnlyText) return None
      val tuid = tu.attr("tuid")
      val tuvs = tu.elems
      if (tuvs.size != 2 || tuvs.exists(_.name != "tuv")) return None
      def variant(v: XElem): Option[(String, String)] =
        for {
          _ <- Option.when(v.wsOnlyText && v.elems.size == 1)(())
          lang <- v.attr("xml:lang")
          seg <- single(v, "seg")
          if seg.attrs.isEmpty
          text <- seg.leafText // inline markup (bpt/ph/…) rejects
        } yield (lang, text)
      val (l0, t0) = variant(tuvs(0)).getOrElse(return None)
      val (l1, t1) = variant(tuvs(1)).getOrElse(return None)
      if (l0 != srclang || l1 == srclang || l1.isEmpty) return None
      Tu(seq, tuid, l1, t0, t1)
    }
    Some((srclang, out))
  }

  /** Explode a memory-media table into per-pair rows. */
  def extractTmx(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("tu", IntegerType, true),
      StructField("tuid", StringType, true),
      StructField("src_lang", StringType, true),
      StructField("tgt_lang", StringType, true),
      StructField("src_text", StringType, true),
      StructField("tgt_text", StringType, true),
      StructField("src_words", LongType, true),
      StructField("tgt_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseTmx(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((src, tus)) => tus.map { t =>
            val (sw, _) = Warc.payloadStats(t.srcText.getBytes("UTF-8"))
            val (tw, dsum) = Warc.payloadStats(t.tgtText.getBytes("UTF-8"))
            Row(id, t.seq, t.tuid.orNull, src, t.tgtLang, t.srcText,
              t.tgtText, sw, tw, dsum, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: memory i targets a cycling language, 3 + i%3 pairs;
    * source texts plant `&` entities every third pair, target texts
    * ride CDATA every fourth; tuids absent every fifth pair. */
  def tmxFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val tgt = Seq("de", "fr", "ja")(i % 3)
      val nt = 3 + i % 3
      val tus = (0 until nt).map { k =>
        def a(j: Int) = (i * 7 + k * 3 + j) % 10
        val srcRaw = s"s${a(0)} and s${a(1)}"
        val src = if (k % 3 == 2) srcRaw.replace("and", "&amp;")
                  else srcRaw
        val tgtTxt =
          if (k % 4 == 3) s"<![CDATA[z${a(2)} zz z${a(3)}]]>"
          else s"z${a(2)} zz z${a(3)}"
        val tuid = if (k % 5 == 4) "" else s""" tuid="u${i}_$k""""
        s"""  <tu$tuid>
           |    <tuv xml:lang="en"><seg>$src</seg></tuv>
           |    <tuv xml:lang="$tgt"><seg>$tgtTxt</seg></tuv>
           |  </tu>
           |""".stripMargin
      }.mkString
      val xml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          "<tmx version=\"1.4\">\n" +
          "  <header creationtool=\"graft\" creationtoolversion=\"1\" " +
          "segtype=\"sentence\" o-tmf=\"x\" adminlang=\"en\" " +
          "srclang=\"en\" datatype=\"plaintext\"/>\n" +
          s"  <body>\n$tus  </body>\n</tmx>\n"
      Row(i.toLong, xml.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
