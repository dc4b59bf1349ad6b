package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF text extraction (ISO 32000-1 subset) — the single most common
  * document format a pretraining corpus ingests. REAL parse end to
  * end, written against the published spec with the codec-family
  * strictness posture (verify, never guess):
  *
  *  - physical layout: `%PDF-1.x` header (binary comment line
  *    allowed), classic cross-reference TABLE located via the
  *    trailing `startxref … %%EOF`, exactly-20-byte xref entries,
  *    `/Size` consistency, and EVERY object parsed at its declared
  *    byte offset with its object number cross-checked — a lying
  *    xref is corruption, not a hint (real-world extractors that
  *    rebuild by scanning hide exactly the truncations a corpus QA
  *    gate wants to see);
  *  - object model: dicts/arrays/names/literal strings (nesting +
  *    the spec's escapes incl. octal), integers/reals, indirect
  *    references, booleans/null; hex strings, object streams and
  *    incremental updates are OUT of subset and reject;
  *  - document graph: trailer `/Root` → `/Type /Catalog` →
  *    single-level `/Type /Pages` tree (`/Count` must equal the kid
  *    count) → `/Type /Page` with `/Parent` back-pointer verified,
  *    one direct `/Contents` stream each; optional trailer `/Info`
  *    `/Title`;
  *  - content streams: `/Length` exact (direct int), optional
  *    `/Filter /FlateDecode` (raw Inflater, full-buffer consumption
  *    enforced); the text operator subset `BT/ET`, `Tf`, `Td`,
  *    `Tj`, `TJ` with a typed operand stack — ANY unknown operator,
  *    type-mismatched operand, text op outside BT/ET, or leftover
  *    operand rejects the document;
  *  - text assembly: `Tj` emits its string, `TJ` concatenates its
  *    array's strings (kern numbers are layout, not text), `Td`
  *    starts a new run; runs join under the whitespace law shared
  *    with EPUB/HTML/wiki.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object PdfLake {

  private object Fail extends scala.util.control.ControlThrowable

  // ------------------------------------------------------------------
  // object model

  private[graft] sealed trait PObj
  private[graft] final case class PInt(v: Long) extends PObj
  private[graft] final case class PReal(v: Double) extends PObj
  private[graft] final case class PName(s: String) extends PObj
  private[graft] final case class PStr(s: String) extends PObj
  private[graft] final case class PArr(v: Vector[PObj]) extends PObj
  private[graft] final case class PDict(m: Map[String, PObj]) extends PObj
  private[graft] final case class PRef(n: Int, g: Int) extends PObj
  private[graft] final case class PBool(v: Boolean) extends PObj
  private[graft] case object PNull extends PObj

  // ------------------------------------------------------------------
  // lexer

  private final class Lx(val b: Array[Byte], var p: Int) {
    def fail(): Nothing = throw Fail
    def eof: Boolean = p >= b.length
    def cur: Int = { if (eof) fail(); b(p) & 0xff }
    def isWs(c: Int): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
    def isDelim(c: Int): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
        c == ']' || c == '{' || c == '}' || c == '/' || c == '%'
    def skipWs(): Unit = {
      var more = true
      while (more && !eof) {
        if (isWs(cur)) p += 1
        else if (cur == '%') { // comment to EOL
          while (!eof && cur != '\n' && cur != '\r') p += 1
        } else more = false
      }
    }
    def startsWith(s: String): Boolean = {
      if (p + s.length > b.length) return false
      var i = 0
      while (i < s.length) {
        if ((b(p + i) & 0xff) != s.charAt(i)) return false
        i += 1
      }
      true
    }
    def expect(s: String): Unit = { if (!startsWith(s)) fail(); p += s.length }
    /** Whitespace only — no comment semantics (the `%%EOF` /
      * `startxref` area, where `%` is a keyword, not a comment). */
    def skipPlainWs(): Unit = while (!eof && isWs(cur)) p += 1
    /** Bare token: run of regular characters. */
    def token(): String = {
      val a = p
      while (!eof && !isWs(cur) && !isDelim(cur)) p += 1
      if (p == a) fail()
      new String(b, a, p - a, "ISO-8859-1")
    }
  }

  private def parseNumberToken(t: String): PObj = {
    if (t.isEmpty) throw Fail
    val neg = t.startsWith("-")
    val body = if (neg || t.startsWith("+")) t.substring(1) else t
    if (body.isEmpty) throw Fail
    if (body.forall(_.isDigit)) {
      if (body.length > 18) throw Fail
      PInt(if (neg) -body.toLong else body.toLong)
    } else {
      val dot = body.indexOf('.')
      if (dot < 0 || body.indexOf('.', dot + 1) >= 0 ||
          !body.filter(_ != '.').forall(_.isDigit) ||
          body.length < 2 || body.length > 18) throw Fail
      val v = body.toDouble
      PReal(if (neg) -v else v)
    }
  }

  /** Literal string per the spec: nesting, escapes incl. octal. */
  private def parseString(lx: Lx): PStr = {
    lx.expect("(")
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0) {
      val c = lx.cur
      lx.p += 1
      c match {
        case '(' => depth += 1; sb.append('(')
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
        case '\\' =>
          val e = lx.cur
          lx.p += 1
          e match {
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case '(' => sb.append('(')
            case ')' => sb.append(')')
            case '\\' => sb.append('\\')
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && !lx.eof && lx.cur >= '0' && lx.cur <= '7') {
                v = v * 8 + (lx.cur - '0')
                lx.p += 1
                k += 1
              }
              if (v > 0xff) lx.fail()
              sb.append(v.toChar)
            case _ => lx.fail() // unknown escape: strict
          }
        case '\n' | '\r' => lx.fail() // raw EOL in string: out of subset
        case other => sb.append(other.toChar)
      }
    }
    PStr(sb.toString)
  }

  private def parseName(lx: Lx): PName = {
    lx.expect("/")
    val a = lx.p
    while (!lx.eof && !lx.isWs(lx.cur) && !lx.isDelim(lx.cur)) {
      if (lx.cur == '#') lx.fail() // name escapes: out of subset
      lx.p += 1
    }
    if (lx.p == a) lx.fail()
    PName(new String(lx.b, a, lx.p - a, "ISO-8859-1"))
  }

  /** One object; resolves the `N G R` reference lookahead. */
  private def parseObj(lx: Lx): PObj = {
    lx.skipWs()
    val c = lx.cur
    if (lx.startsWith("<<")) {
      lx.p += 2
      val m = scala.collection.mutable.LinkedHashMap.empty[String, PObj]
      var open = true
      while (open) {
        lx.skipWs()
        if (lx.startsWith(">>")) { lx.p += 2; open = false }
        else {
          val k = parseName(lx).s
          if (m.contains(k)) lx.fail()
          m(k) = parseObj(lx)
        }
      }
      PDict(m.toMap)
    } else if (c == '<') lx.fail() // hex string: out of subset
    else if (c == '/') parseName(lx)
    else if (c == '(') parseString(lx)
    else if (c == '[') {
      lx.p += 1
      val out = Vector.newBuilder[PObj]
      var open = true
      while (open) {
        lx.skipWs()
        if (lx.cur == ']') { lx.p += 1; open = false }
        else out += parseObj(lx)
      }
      PArr(out.result())
    } else if (c == 't') { lx.expect("true"); PBool(true) }
    else if (c == 'f') { lx.expect("false"); PBool(false) }
    else if (c == 'n') { lx.expect("null"); PNull }
    else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
      val first = parseNumberToken(lx.token())
      first match {
        case PInt(n) if n >= 0 =>
          // lookahead for "G R"
          val save = lx.p
          lx.skipWs()
          if (!lx.eof && lx.cur >= '0' && lx.cur <= '9') {
            val a = lx.p
            while (!lx.eof && lx.cur >= '0' && lx.cur <= '9') lx.p += 1
            val g = new String(lx.b, a, lx.p - a, "ISO-8859-1")
            lx.skipWs()
            if (!lx.eof && lx.cur == 'R' &&
                (lx.p + 1 >= lx.b.length || lx.isWs(lx.b(lx.p + 1) & 0xff) ||
                  lx.isDelim(lx.b(lx.p + 1) & 0xff))) {
              lx.p += 1
              return PRef(n.toInt, g.toInt)
            }
          }
          lx.p = save
          first
        case other => other
      }
    } else lx.fail()
  }

  // ------------------------------------------------------------------
  // document walk

  private[graft] final case class PdfPage(seq: Int, text: String)

  private def asDict(o: PObj): PDict = o match {
    case d: PDict => d; case _ => throw Fail
  }
  private def asInt(o: PObj): Long = o match {
    case PInt(v) => v; case _ => throw Fail
  }
  private def asRef(o: PObj): PRef = o match {
    case r: PRef => r; case _ => throw Fail
  }

  /** Walk one document; None on any violation of the subset. */
  private[graft] def parsePdf(raw: Array[Byte]): Option[(String, Seq[PdfPage])] = {
    if (raw == null || raw.length < 64) return None
    try {
      val lx = new Lx(raw, 0)
      // header
      if (!lx.startsWith("%PDF-1.")) return None
      val vc = raw(7) & 0xff
      if (vc < '0' || vc > '7') return None

      // trailing startxref … %%EOF
      val tailStr = new String(raw, math.max(0, raw.length - 64),
        math.min(64, raw.length), "ISO-8859-1")
      val sxAt = tailStr.lastIndexOf("startxref")
      if (sxAt < 0) return None
      val sxLx = new Lx(raw, math.max(0, raw.length - 64) + sxAt)
      sxLx.expect("startxref")
      sxLx.skipPlainWs()
      val xrefOff = asInt(parseNumberToken(sxLx.token()))
      sxLx.skipPlainWs()
      sxLx.expect("%%EOF")
      if (xrefOff < 0 || xrefOff >= raw.length) return None

      // classic xref table
      val xl = new Lx(raw, xrefOff.toInt)
      xl.expect("xref")
      xl.skipWs()
      if (asInt(parseNumberToken(xl.token())) != 0L) return None // single section at 0
      xl.skipWs()
      val count = asInt(parseNumberToken(xl.token())).toInt
      if (count < 2 || count > (1 << 20)) return None
      // exactly one EOL then 20-byte entries
      if (xl.cur == '\r') xl.p += 1
      if (xl.cur != '\n') return None
      xl.p += 1
      val offsets = new Array[Int](count)
      var i = 0
      while (i < count) {
        if (xl.p + 20 > raw.length) return None
        val e = new String(raw, xl.p, 20, "ISO-8859-1")
        if (e(10) != ' ' || e(16) != ' ') return None
        val off = e.substring(0, 10)
        val gen = e.substring(11, 16)
        if (!off.forall(_.isDigit) || !gen.forall(_.isDigit)) return None
        val kind = e(17)
        if (i == 0) {
          if (kind != 'f' || gen != "65535") return None
        } else {
          if (kind != 'n' || gen != "00000") return None
          offsets(i) = off.toInt
          if (offsets(i) <= 0 || offsets(i) >= raw.length) return None
        }
        xl.p += 20
        i += 1
      }
      xl.skipWs()
      xl.expect("trailer")
      val trailer = asDict(parseObj(xl)).m
      if (asInt(trailer.getOrElse("Size", return None)) != count) return None

      // EVERY xref entry is verified up front — object number and
      // generation at the declared offset — even for objects the
      // graph walk below never dereferences (a lying entry is
      // corruption wherever it points)
      var oi = 1
      while (oi < count) {
        val ol = new Lx(raw, offsets(oi))
        ol.skipWs()
        if (asInt(parseNumberToken(ol.token())) != oi) return None
        ol.skipWs()
        if (asInt(parseNumberToken(ol.token())) != 0L) return None
        ol.skipWs()
        ol.expect("obj")
        oi += 1
      }

      // indirect-object fetch with the xref offset VERIFIED
      val cache = scala.collection.mutable.HashMap.empty[Int, (PObj, Option[Array[Byte]])]
      def fetch(ref: PRef): (PObj, Option[Array[Byte]]) =
        cache.getOrElseUpdate(ref.n, {
          if (ref.g != 0 || ref.n <= 0 || ref.n >= count) throw Fail
          val ol = new Lx(raw, offsets(ref.n))
          ol.skipWs()
          if (asInt(parseNumberToken(ol.token())) != ref.n) throw Fail
          ol.skipWs()
          if (asInt(parseNumberToken(ol.token())) != 0L) throw Fail
          ol.skipWs()
          ol.expect("obj")
          val obj = parseObj(ol)
          ol.skipWs()
          val payload =
            if (ol.startsWith("stream")) {
              val d = asDict(obj).m
              val len = asInt(d.getOrElse("Length", throw Fail))
              if (len < 0 || len > raw.length) throw Fail
              ol.p += 6
              if (ol.cur == '\r') ol.p += 1
              if (ol.cur != '\n') throw Fail
              ol.p += 1
              if (ol.p + len > raw.length) throw Fail
              val enc = java.util.Arrays.copyOfRange(raw, ol.p,
                ol.p + len.toInt)
              ol.p += len.toInt
              // exactly one EOL, then endstream — the lenient
              // skipWs here would make /Length off-by-one invisible
              if (ol.cur == '\r') ol.p += 1
              if (ol.cur != '\n') throw Fail
              ol.p += 1
              ol.expect("endstream")
              val dec = d.get("Filter") match {
                case None => enc
                case Some(PName("FlateDecode")) =>
                  val inf = new java.util.zip.Inflater()
                  try {
                    inf.setInput(enc)
                    val buf = new java.io.ByteArrayOutputStream(enc.length * 2)
                    val tmp = new Array[Byte](8192)
                    while (!inf.finished()) {
                      val k =
                        try inf.inflate(tmp)
                        catch {
                          case _: java.util.zip.DataFormatException => throw Fail
                        }
                      if (k > 0) buf.write(tmp, 0, k)
                      else if (!inf.finished()) throw Fail // truncated
                    }
                    if (inf.getRemaining != 0) throw Fail // trailing garbage
                    buf.toByteArray
                  } finally inf.end()
                case _ => throw Fail
              }
              Some(dec)
            } else None
          ol.skipWs()
          ol.expect("endobj")
          (obj, payload)
        })

      // graph: Root → Catalog → Pages → Page*
      val rootRef = asRef(trailer.getOrElse("Root", return None))
      val (catObj, _) = fetch(rootRef)
      val cat = asDict(catObj).m
      if (!cat.get("Type").contains(PName("Catalog"))) return None
      val pagesRef = asRef(cat.getOrElse("Pages", return None))
      val (pagesObj, _) = fetch(pagesRef)
      val pages = asDict(pagesObj).m
      if (!pages.get("Type").contains(PName("Pages"))) return None
      val kids = pages.getOrElse("Kids", return None) match {
        case PArr(v) => v.map(asRef)
        case _ => return None
      }
      if (asInt(pages.getOrElse("Count", return None)) != kids.size ||
          kids.isEmpty) return None

      val title = trailer.get("Info") match {
        case Some(r: PRef) =>
          asDict(fetch(r)._1).m.get("Title") match {
            case Some(PStr(s)) => s
            case Some(_) => return None
            case None => ""
          }
        case Some(_) => return None
        case None => ""
      }

      val out = kids.zipWithIndex.map { case (kidRef, seq) =>
        val (pgObj, _) = fetch(kidRef)
        val pg = asDict(pgObj).m
        if (!pg.get("Type").contains(PName("Page"))) throw Fail
        if (pg.get("Parent") != Some(pagesRef)) throw Fail // back-pointer
        val contentsRef = asRef(pg.getOrElse("Contents", throw Fail))
        val (_, payload) = fetch(contentsRef)
        val content = payload.getOrElse(throw Fail)
        PdfPage(seq, extractText(content))
      }
      Some((title, out))
    } catch { case Fail => None }
  }

  /** Content-stream interpreter for the text subset. */
  private def extractText(content: Array[Byte]): String = {
    val lx = new Lx(content, 0)
    val stack = scala.collection.mutable.ArrayBuffer.empty[PObj]
    val runs = Vector.newBuilder[String]
    var inText = false
    while ({ lx.skipWs(); !lx.eof }) {
      val c = lx.cur
      if (c == '(' ) stack += parseString(lx)
      else if (c == '[') stack += parseObj(lx)
      else if (c == '/') stack += parseName(lx)
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9'))
        stack += parseNumberToken(lx.token())
      else {
        val op = lx.token()
        def popNum(): Unit = stack.remove(stack.length - 1) match {
          case _: PInt | _: PReal => ()
          case _ => throw Fail
        }
        op match {
          case "BT" =>
            if (inText || stack.nonEmpty) throw Fail
            inText = true
          case "ET" =>
            if (!inText || stack.nonEmpty) throw Fail
            inText = false
          case "Tf" =>
            if (!inText || stack.length != 2) throw Fail
            popNum()
            stack.remove(0) match { case _: PName => (); case _ => throw Fail }
          case "Td" =>
            if (!inText || stack.length != 2) throw Fail
            popNum(); popNum()
          case "Tj" =>
            if (!inText || stack.length != 1) throw Fail
            stack.remove(0) match {
              case PStr(s) => runs += s
              case _ => throw Fail
            }
          case "TJ" =>
            if (!inText || stack.length != 1) throw Fail
            stack.remove(0) match {
              case PArr(v) =>
                val sb = new StringBuilder
                v.foreach {
                  case PStr(s) => sb.append(s)
                  case _: PInt | _: PReal => () // kern: layout, not text
                  case _ => throw Fail
                }
                runs += sb.toString
              case _ => throw Fail
            }
          case _ => throw Fail // operator outside the subset
        }
      }
    }
    if (inText || stack.nonEmpty) throw Fail
    runs.result().mkString(" ").split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  // ------------------------------------------------------------------
  // lake operator

  /** Explode a PDF-media table into per-page rows with the extracted
    * text and its stats. */
  def extractPdf(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("page", IntegerType, true),
      StructField("title", StringType, true),
      StructField("text", StringType, true),
      StructField("n_words", LongType, true),
      StructField("digit_sum", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parsePdf(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((title, pgs)) => pgs.map { p =>
            val (nWords, digitSum) = Warc.payloadStats(p.text.getBytes("UTF-8"))
            Row(id, p.seq, title, p.text, nWords, digitSum, true)
          }
          case None => Seq(Row(id, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side) — a from-scratch writer with REAL offsets

  private def esc(s: String): String = s
    .replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Fixture: document i carries 1 + i%4 pages; each page shows two
    * BT blocks — Tj runs with escaped parens and an octal `\101`
    * ('A'), then a TJ array whose kern numbers must vanish; every
    * second document's content streams are FlateDecoded. Titles
    * carry escaped parens. */
  def pdfFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val np = 1 + i % 4
      def a(p: Int, j: Int) = (i * 3 + p * 7 + j) % 10
      val contents = (0 until np).map { p =>
        ("BT /F1 12 Tf 72 720 Td " +
          s"(Pg $p d${a(p, 0)} d${a(p, 1)}) Tj 0 -14 Td " +
          s"(\\(q${a(p, 2)}\\) \\101x${a(p, 3)}) Tj ET\n" +
          "BT /F1 10 Tf 72 600 Td " +
          s"[(ke) -250 (rn${a(p, 4)}) 333 ( z${a(p, 5)})] TJ ET\n")
          .getBytes("ISO-8859-1")
      }
      val flate = i % 2 == 1
      val encoded = contents.map { c =>
        if (!flate) c
        else {
          val d = new java.util.zip.Deflater()
          d.setInput(c); d.finish()
          val buf = new Array[Byte](c.length * 2 + 64)
          val m = d.deflate(buf)
          d.end()
          java.util.Arrays.copyOf(buf, m)
        }
      }
      // objects: 1 catalog, 2 pages, 3 font, 4 info, 5.. page+content
      val objs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def obj(n0: Int, body: String): Array[Byte] =
        s"$n0 0 obj\n$body\nendobj\n".getBytes("ISO-8859-1")
      val kidsRefs = (0 until np).map(p => s"${5 + 2 * p} 0 R").mkString(" ")
      objs += obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
      objs += obj(2, s"<< /Type /Pages /Kids [ $kidsRefs ] /Count $np >>")
      objs += obj(3,
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
      objs += obj(4, s"<< /Title (${esc(s"Doc $i (rev ${i % 3})")}) >>")
      (0 until np).foreach { p =>
        objs += obj(5 + 2 * p,
          s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] " +
            s"/Resources << /Font << /F1 3 0 R >> >> " +
            s"/Contents ${6 + 2 * p} 0 R >>")
        val enc = encoded(p)
        val filter = if (flate) " /Filter /FlateDecode" else ""
        val head = s"${6 + 2 * p} 0 obj\n<< /Length ${enc.length}$filter >>\nstream\n"
          .getBytes("ISO-8859-1")
        objs += (head ++ enc ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1"))
      }
      val header =
        "%PDF-1.7\n%âãÏÓ\n".getBytes("ISO-8859-1")
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(header)
      val offsets = objs.map { o =>
        val off = bos.size(); bos.write(o); off
      }
      val xrefOff = bos.size()
      val sb = new StringBuilder
      sb.append("xref\n0 ").append(objs.size + 1).append('\n')
      sb.append("0000000000 65535 f \n")
      offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
      sb.append("trailer\n<< /Size ").append(objs.size + 1)
        .append(" /Root 1 0 R /Info 4 0 R >>\n")
      sb.append("startxref\n").append(xrefOff).append("\n%%EOF\n")
      bos.write(sb.toString.getBytes("ISO-8859-1"))
      Row(i.toLong, bos.toByteArray)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
