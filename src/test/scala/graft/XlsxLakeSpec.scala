package graft

import graft.operators.XlsxLake

/** OOXML spreadsheet walk: the sst cross-part count laws, cell-ref
  * grammar, exact ×100 numbers, strictness matrix, fixture-law
  * equality, byte-flip sweep. */
class XlsxLakeSpec extends SparkSpec {

  private def blob(i: Int): Array[Byte] =
    XlsxLake.xlsxFixture(spark, i + 1).collect().last.getAs[Array[Byte]](1)

  test("fixture laws: extract output matches the closed forms") {
    val out = XlsxLake.extractXlsx(
      XlsxLake.xlsxFixture(spark, 12), "id", "media")
      .orderBy("id", "row_idx", "col_idx").collect()
    assert(out.forall(_.getBoolean(7)))
    assert(out.length == (0 until 12).map(i => (3 + i % 3) * 3).sum)
    out.foreach { r =>
      val (i, rw, cl) = (r.getLong(0), r.getInt(2), r.getInt(3))
      assert(r.getString(1) == s"S${i % 4}")
      cl match {
        case 0 =>
          assert(r.getString(4) == "s" &&
            r.getString(5) == s"name${(i + rw) % 3}")
          assert(r.isNullAt(6))
        case 1 =>
          val sign = if ((i + rw) % 4 == 0) -1L else 1L
          assert(r.getString(4) == "n" &&
            r.getLong(6) == sign * (i * 100 + rw * 7) * 100)
        case 2 =>
          assert(r.getLong(6) == i * 50 + rw * 13)
      }
    }
  }

  test("strictness matrix: every spreadsheet lie rejects") {
    val good = blob(0)
    def rebuild(edit: (String, String) => Option[(String, String)]): Array[Byte] = {
      val entries = graft.operators.ZipLake.parseZip(good).get
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { e =>
        edit(e.name, new String(e.payload, "UTF-8")).foreach {
          case (n2, b2) =>
            zos.putNextEntry(new java.util.zip.ZipEntry(n2))
            zos.write(b2.getBytes("UTF-8"))
            zos.closeEntry()
        }
      }
      zos.close()
      bos.toByteArray
    }
    val keep = (n: String, b: String) => Some((n, b))
    assert(XlsxLake.parseXlsx(rebuild(keep)).nonEmpty, "rebuild sanity")

    def editPart(part: String)(f: String => String): Array[Byte] =
      rebuild((n, b) => Some((n, if (n == part) f(b) else b)))
    val sheetPart = "xl/worksheets/sheet1.xml"
    val cases: Seq[(String, Array[Byte])] = Seq(
      "sst count lies (cross-part)" -> editPart("xl/sharedStrings.xml")(
        _.replace("count=\"3\"", "count=\"4\"")),
      "sst uniqueCount lies" -> editPart("xl/sharedStrings.xml")(
        _.replace("uniqueCount=\"3\"", "uniqueCount=\"2\"")),
      "shared index out of bounds" -> editPart(sheetPart)(
        _.replace("<c r=\"A1\" t=\"s\"><v>0</v></c>",
          "<c r=\"A1\" t=\"s\"><v>9</v></c>")),
      "cell ref in wrong row" -> editPart(sheetPart)(
        _.replace("<c r=\"B1\">", "<c r=\"B2\">")),
      "columns out of order" -> editPart(sheetPart)(
        _.replace("<c r=\"A2\" t=\"s\"><v>", "<c r=\"D2\" t=\"s\"><v>")),
      "rows out of order" -> editPart(sheetPart)(
        _.replace("<row r=\"2\">", "<row r=\"1\">")),
      "three-decimal number" -> editPart(sheetPart)(
        _.replaceFirst("<c r=\"C1\"><v>[0-9.]+</v></c>",
          "<c r=\"C1\"><v>1.234</v></c>")),
      "inline string type" -> editPart(sheetPart)(
        _.replace("<c r=\"B1\">", "<c r=\"B1\" t=\"str\">")),
      "workbook with two sheets" -> editPart("xl/workbook.xml")(
        _.replace("</sheets>", "<sheet name=\"X\" sheetId=\"2\"/></sheets>")),
      "workbook unregistered" -> editPart("[Content_Types].xml")(
        _.replace("/xl/workbook.xml", "/xl/other.xml")),
      "shared strings part missing" ->
        rebuild((n, b) => if (n == "xl/sharedStrings.xml") None else Some((n, b))))
    cases.foreach { case (name, b) =>
      assert(XlsxLake.parseXlsx(b).isEmpty, name)
    }
    assert(XlsxLake.parseXlsx(null).isEmpty)
  }

  test("x100 projection is exact for signed and short-fraction forms") {
    // exercised through a rebuilt sheet: -3.5 → -350, 7 → 700, 0.05 → 5
    val good = blob(0)
    val entries = graft.operators.ZipLake.parseZip(good).get
    val sheet = entries.find(_.name == "xl/worksheets/sheet1.xml").get
    val edited = new String(sheet.payload, "UTF-8")
      .replaceFirst("<c r=\"C1\"><v>[0-9.]+</v></c>",
        "<c r=\"C1\"><v>-3.5</v></c>")
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { e =>
      zos.putNextEntry(new java.util.zip.ZipEntry(e.name))
      zos.write(if (e.name == sheet.name) edited.getBytes("UTF-8")
        else e.payload)
      zos.closeEntry()
    }
    zos.close()
    val cells = XlsxLake.parseXlsx(bos.toByteArray).get._2
    assert(cells.find(c => c.row == 1 && c.colIdx == 2)
      .flatMap(_.nvalX100).contains(-350L))
  }

  test("byte-flip sweep never throws") {
    val src = blob(1)
    for (i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      XlsxLake.parseXlsx(c) // must not throw
    }
  }
}
