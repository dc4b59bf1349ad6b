package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.XmlLake.XElem

/** XLSX cell extraction (ISO/IEC 29500 OOXML spreadsheet subset) —
  * tabular data arriving as spreadsheets, the long tail of every
  * enterprise corpus. Same composition posture as [[DocxLake]]
  * (ZIP + XML already trusted); what's new — and verified, never
  * assumed — is the spreadsheet's cross-part redundancy:
  *
  *  - OPC: `[Content_Types].xml` registers the workbook main part;
  *    `xl/workbook.xml` (spreadsheetml namespace) declares exactly
  *    one sheet whose name is projected; `xl/worksheets/sheet1.xml`
  *    and `xl/sharedStrings.xml` must exist;
  *  - shared strings: `sst` whose `uniqueCount` must equal the
  *    number of `si` items AND whose `count` must equal the number
  *    of shared-string CELL REFERENCES actually found in the sheet —
  *    the cross-part consistency law a truncated or hand-edited
  *    workbook breaks first;
  *  - sheet: `row r` indices strictly increasing and 1-based; cell
  *    `r` references must parse as `<colLetters><rowNum>`, match
  *    their row, and advance strictly left-to-right; `t="s"` cells
  *    hold a bounds-checked sst index; untyped cells hold a strict
  *    number — integer or ≤2-decimal fraction, projected as an EXACT
  *    ×100 integer (the cents convention; no doubles cross the
  *    engine boundary); formulas/dates/inline strings are OUT of
  *    subset and reject.
  *
  * One blob = one task-local walk (codec-family plan shape).
  */
object XlsxLake {

  private val MainNs =
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
  private val CtNs =
    "http://schemas.openxmlformats.org/package/2006/content-types"
  private val WorkbookCt = "application/vnd.openxmlformats-officedocument" +
    ".spreadsheetml.sheet.main+xml"

  private[graft] final case class Cell(
      row: Int, colIdx: Int, kind: String, sval: Option[String],
      nvalX100: Option[Long])

  private def single(e: XElem, n: String): Option[XElem] =
    e.elems.filter(_.name == n) match {
      case Vector(one) => Some(one)
      case _ => None
    }

  private val CellRef = """^([A-Z]{1,3})(\d{1,7})$""".r
  private def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private val NumRe = """^-?\d{1,15}(\.\d{1,2})?$""".r

  /** Walk one workbook; None on any OPC/spreadsheet violation. */
  private[graft] def parseXlsx(raw: Array[Byte]): Option[(String, Seq[Cell])] = {
    val entries = ZipLake.parseZip(raw).getOrElse(return None)
    val byName = entries.map(e => e.name -> e).toMap
    if (byName.size != entries.size) return None

    val ct = byName.get("[Content_Types].xml").getOrElse(return None)
    val croot = XmlLake.parseXml(ct.payload).getOrElse(return None)
    if (croot.name != "Types" || !croot.attr("xmlns").contains(CtNs))
      return None
    if (!croot.elems.exists(e => e.name == "Override" &&
        e.attr("PartName").contains("/xl/workbook.xml") &&
        e.attr("ContentType").contains(WorkbookCt))) return None

    val wb = byName.get("xl/workbook.xml").getOrElse(return None)
    val wroot = XmlLake.parseXml(wb.payload).getOrElse(return None)
    if (wroot.name != "workbook" || !wroot.attr("xmlns").contains(MainNs))
      return None
    val sheets = single(wroot, "sheets").getOrElse(return None)
    val sheet = sheets.elems match {
      case Vector(one) if one.name == "sheet" => one
      case _ => return None // exactly one sheet in subset
    }
    val sheetName = sheet.attr("name").getOrElse(return None)

    // shared strings
    val sstPart = byName.get("xl/sharedStrings.xml").getOrElse(return None)
    val sroot = XmlLake.parseXml(sstPart.payload).getOrElse(return None)
    if (sroot.name != "sst" || !sroot.attr("xmlns").contains(MainNs))
      return None
    val sis = sroot.elems
    if (sis.exists(_.name != "si")) return None
    val shared = sis.map { si =>
      single(si, "t").flatMap(_.leafText).getOrElse(return None)
    }
    val declaredUnique = sroot.attr("uniqueCount")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(return None)
    val declaredCount = sroot.attr("count")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(return None)
    if (declaredUnique != shared.size) return None

    // the sheet
    val ws = byName.get("xl/worksheets/sheet1.xml").getOrElse(return None)
    val wsroot = XmlLake.parseXml(ws.payload).getOrElse(return None)
    if (wsroot.name != "worksheet" || !wsroot.attr("xmlns").contains(MainNs))
      return None
    val data = single(wsroot, "sheetData").getOrElse(return None)
    if (data.elems.exists(_.name != "row") || !data.wsOnlyText) return None

    var sharedRefs = 0
    var lastRow = 0
    val out = Vector.newBuilder[Cell]
    data.elems.foreach { row =>
      val rIdx = row.attr("r")
        .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(return None)
      if (rIdx <= lastRow) return None // rows 1-based, strictly increasing
      lastRow = rIdx
      if (row.elems.exists(_.name != "c") || !row.wsOnlyText) return None
      var lastCol = -1
      row.elems.foreach { c =>
        val (colLetters, refRow) = c.attr("r").getOrElse(return None) match {
          case CellRef(l, n) => (l, n.toInt)
          case _ => return None
        }
        if (refRow != rIdx) return None // ref must match its row
        val ci = colIndex(colLetters)
        if (ci <= lastCol) return None // strictly left-to-right
        lastCol = ci
        val v = single(c, "v").flatMap(_.leafText).getOrElse(return None)
        c.attr("t") match {
          case Some("s") =>
            val idx = scala.util.Try(v.toInt).toOption.getOrElse(return None)
            if (idx < 0 || idx >= shared.size) return None
            sharedRefs += 1
            out += Cell(rIdx, ci, "s", Some(shared(idx)), None)
          case None =>
            if (NumRe.findFirstIn(v).isEmpty) return None
            val neg = v.startsWith("-")
            val body = if (neg) v.substring(1) else v
            val (whole, frac) = body.indexOf('.') match {
              case -1 => (body, "00")
              case d => (body.substring(0, d), body.substring(d + 1).padTo(2, '0'))
            }
            val x100 = whole.toLong * 100 + frac.toLong
            out += Cell(rIdx, ci, "n", None,
              Some(if (neg) -x100 else x100))
          case Some(_) => return None // inline str/bool/date: out of subset
        }
      }
    }
    if (declaredCount != sharedRefs) return None // cross-part law
    Some((sheetName, out.result()))
  }

  /** Explode a workbook-media table into per-cell rows. */
  def extractXlsx(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("sheet", StringType, true),
      StructField("row_idx", IntegerType, true),
      StructField("col_idx", IntegerType, true),
      StructField("kind", StringType, true),
      StructField("sval", StringType, true),
      StructField("nval_x100", LongType, true),
      StructField("valid", BooleanType, false)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val id = r.getLong(0)
        scala.util.Try(parseXlsx(r.getAs[Array[Byte]](1))).toOption
          .flatten match {
          case Some((name, cells)) => cells.map { c =>
            Row(id, name, c.row, c.colIdx, c.kind, c.sval.orNull,
              c.nvalX100.map(Long.box).orNull, true)
          }
          case None =>
            Seq(Row(id, null, null, null, null, null, null, false))
        }
      })
    spark.createDataFrame(rows, outSchema)
  }

  // ------------------------------------------------------------------
  // fixture (test side)

  /** Fixture: workbook i carries 3 + i%3 rows × columns A/B/C —
    * A a shared string drawn from a 3-value pool (the sst DEDUPs:
    * uniqueCount 3 < count nr), B a signed integer, C a 2-decimal
    * price whose ×100 projection is exact. */
  def xlsxFixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val nr = 3 + i % 3
      // shared pool in first-appearance order, with dedup
      val names = (1 to nr).map(r => s"name${(i + r) % 3}")
      val pool = names.distinct
      val idx = names.map(pool.indexOf)
      val priceX100 = (1 to nr).map(r => i * 50 + r * 13)
      val rowXml = (1 to nr).map { r =>
        val b = (if ((i + r) % 4 == 0) -1 else 1) * (i * 100 + r * 7)
        val p = priceX100(r - 1)
        s"""<row r="$r">""" +
          s"""<c r="A$r" t="s"><v>${idx(r - 1)}</v></c>""" +
          s"""<c r="B$r"><v>$b</v></c>""" +
          s"""<c r="C$r"><v>${p / 100}.${f"${p % 100}%02d"}</v></c>""" +
          "</row>"
      }.mkString
      val sheetXml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<worksheet xmlns="$MainNs"><sheetData>$rowXml</sheetData></worksheet>"""
      val sstXml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<sst xmlns="$MainNs" count="$nr" uniqueCount="${pool.size}">""" +
          pool.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"
      val wbXml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<workbook xmlns="$MainNs"><sheets>""" +
          s"""<sheet name="S${i % 4}" sheetId="1"/></sheets></workbook>"""
      val ctXml =
        "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
          s"""<Types xmlns="$CtNs">""" +
          "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
          s"""<Override PartName="/xl/workbook.xml" ContentType="$WorkbookCt"/>""" +
          "</Types>"
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      def put(name: String, body: String): Unit = {
        zos.putNextEntry(new java.util.zip.ZipEntry(name))
        zos.write(body.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", ctXml)
      put("xl/workbook.xml", wbXml)
      put("xl/sharedStrings.xml", sstXml)
      put("xl/worksheets/sheet1.xml", sheetXml)
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
