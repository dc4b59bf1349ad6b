package graft.operators

import java.nio.charset.{CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** gettext PO catalog extraction (the GNU gettext file format — the
  * de-facto interchange for human translation pairs, i.e. PARALLEL
  * TEXT, the aligned-corpus side of a multilingual training mix).
  * Whole-construct and strict:
  *
  *  - entries separated by blank lines; `#`-comments (all flavors)
  *    skipped; the FIRST entry must be the header (`msgid ""`) whose
  *    msgstr carries `Key: value\n` metadata lines — `Language:` is
  *    projected onto every row;
  *  - `msgid` / `msgstr` each take one-or-more ADJACENT quoted
  *    pieces which CONCATENATE (the multi-line law every PO tool
  *    relies on); C escapes `\n \t \" \\` decode, anything else
  *    rejects;
  *  - plural entries: `msgid_plural` followed by `msgstr[0..n-1]`
  *    with indices strictly sequential from 0 — the singular
  *    translation (`msgstr[0]`) is projected, the form count
  *    censused;
  *  - non-header entries with empty msgid, duplicate msgids, or
  *    stray non-entry lines reject the file.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object PoLake {

  private object Fail extends scala.util.control.ControlThrowable

  private[graft] final case class PoEntry(
      entry: Int, msgid: String, msgstr: String, nPlural: Int)

  private def unquote(line: String): String = {
    if (line.length < 2 || line.charAt(0) != '"' || !line.endsWith("\""))
      throw Fail
    val body = line.substring(1, line.length - 1)
    val sb = new StringBuilder
    var p = 0
    while (p < body.length) {
      val c = body.charAt(p)
      if (c == '"') throw Fail // unescaped quote inside
      else if (c == '\\') {
        if (p + 1 >= body.length) throw Fail
        body.charAt(p + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case _ => throw Fail
        }
        p += 2
      } else { sb.append(c); p += 1 }
    }
    sb.toString
  }

  /** Walk one catalog; None on any violation. Returns (language,
    * entries). */
  private[graft] def parsePo(raw: Array[Byte]): Option[(String, Seq[PoEntry])] = {
    if (raw == null || raw.length == 0) return None
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val s =
      try dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
      catch { case _: java.nio.charset.CharacterCodingException => return None }
    if (s.contains('\r')) return None
    val lines = s.split("\n", -1)
    try {
      var p = 0
      def atEnd: Boolean = p >= lines.length ||
        (p == lines.length - 1 && lines(p).isEmpty)
      def skipSeparators(): Unit = {
        var more = true
        while (more && !atEnd) {
          val l = lines(p)
          if (l.isEmpty || l.startsWith("#")) p += 1 else more = false
        }
      }
      /** One keyword + its concatenated string pieces. */
      def keyed(kw: String): String = {
        if (atEnd || !lines(p).startsWith(kw + " ")) throw Fail
        val sb = new StringBuilder
        sb.append(unquote(lines(p).substring(kw.length + 1)))
        p += 1
        while (!atEnd && lines(p).startsWith("\"")) {
          sb.append(unquote(lines(p)))
          p += 1
        }
        sb.toString
      }
      def peekKw(kw: String): Boolean = !atEnd && lines(p).startsWith(kw)

      // header entry
      skipSeparators()
      val hid = keyed("msgid")
      if (hid.nonEmpty) throw Fail // first entry must be the header
      val header = keyed("msgstr")
      val language = header.split("\n").collectFirst {
        case l if l.startsWith("Language: ") => l.substring(10)
      }.getOrElse(throw Fail)

      val out = Vector.newBuilder[PoEntry]
      val seen = scala.collection.mutable.HashSet.empty[String]
      var entry = 0
      skipSeparators()
      while (!atEnd) {
        val mid = keyed("msgid")
        if (mid.isEmpty) throw Fail // only the header may be empty
        if (!seen.add(mid)) throw Fail // duplicate msgid
        if (peekKw("msgid_plural")) {
          keyed("msgid_plural")
          var idx = 0
          var first: Option[String] = None
          while (peekKw(s"msgstr[")) {
            if (!lines(p).startsWith(s"msgstr[$idx] ")) throw Fail
            val v = keyed(s"msgstr[$idx]")
            if (idx == 0) first = Some(v)
            idx += 1
          }
          if (idx < 2) throw Fail // plurals need ≥2 forms
          out += PoEntry(entry, mid, first.get, idx)
        } else {
          out += PoEntry(entry, mid, keyed("msgstr"), 0)
        }
        entry += 1
        // entries must be separated by a blank line (or end the file)
        if (!atEnd) {
          if (lines(p).nonEmpty) throw Fail
          skipSeparators()
        }
      }
      if (entry == 0) throw Fail
      Some((language, out.result()))
    } catch { case Fail => None }
  }

  /** Explode a catalog-media table into per-entry rows. */
  def extractPo(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("entry", IntegerType, true),
      StructField("language", StringType, true),
      StructField("msgid", StringType, true),
      StructField("msgstr", StringType, true),
      StructField("n_plural", IntegerType, true),
      StructField("src_words", LongType, true),
      StructField("tgt_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parsePo(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((lang, es)) => es.map { e =>
            val (sw, _) = Warc.payloadStats(e.msgid.getBytes("UTF-8"))
            val (tw, dsum) = Warc.payloadStats(e.msgstr.getBytes("UTF-8"))
            Row(id, e.entry, lang, e.msgid, e.msgstr, e.nPlural, sw, tw,
              dsum, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, null, null,
              false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: catalog i in a cycling language; 3 + i%3 entries; odd
    * entries split their msgid across two adjacent pieces (the
    * concatenation law); every third msgstr plants `\"` and `\n`
    * escapes; every fourth entry is plural with 2 forms. */
  def poFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val lang = Seq("de", "fr", "ja", "pt")(i % 4)
      val ne = 3 + i % 3
      val sb = new StringBuilder
      sb.append("# graft fixture catalog\n")
      sb.append("msgid \"\"\n")
      sb.append("msgstr \"\"\n\"Language: ").append(lang).append("\\n\"\n")
      sb.append("\"MIME-Version: 1.0\\n\"\n\n")
      (0 until ne).foreach { k =>
        def a(j: Int) = (i * 7 + k * 3 + j) % 10
        sb.append(s"#: src/mod$i.c:${10 + k}\n")
        if (k % 2 == 1) {
          sb.append("msgid \"source s" + a(0) + " \"\n")
          sb.append("\"s" + a(1) + " tail\"\n")
        } else {
          sb.append(s"""msgid "source s${a(0)} s${a(1)} tail"\n""")
        }
        val strBody =
          if (k % 3 == 2) s"""ziel \\"t${a(2)}\\"\\nt${a(3)}"""
          else s"ziel t${a(2)} t${a(3)}"
        if (k % 4 == 3) {
          sb.append(s"""msgid_plural "sources s${a(0)}"\n""")
          sb.append(s"""msgstr[0] "$strBody"\n""")
          sb.append(s"""msgstr[1] "$strBody mehr"\n""")
        } else {
          sb.append(s"""msgstr "$strBody"\n""")
        }
        sb.append('\n')
      }
      Row(i.toLong, sb.toString.getBytes("UTF-8"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
