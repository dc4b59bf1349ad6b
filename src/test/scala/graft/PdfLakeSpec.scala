package graft

import graft.operators.PdfLake

/** ISO 32000 subset walk: fixture-law equality, xref-offset
  * verification, the object/stream/operator strictness matrix,
  * string-escape decode, byte-flip sweep. */
class PdfLakeSpec extends SparkSpec {

  private def blob(i: Int): Array[Byte] =
    PdfLake.pdfFixture(spark, i + 1).collect().last.getAs[Array[Byte]](1)

  test("fixture laws: extract output matches the closed forms") {
    val out = PdfLake.extractPdf(
      PdfLake.pdfFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(6)))
    assert(out.length == (0 until 12).map(i => 1 + i % 4).sum)
    out.foreach { r =>
      val (i, p) = (r.getLong(0), r.getInt(1))
      def a(j: Long) = (i * 3 + p * 7 + j) % 10
      assert(r.getString(2) == s"Doc $i (rev ${i % 3})")
      assert(r.getString(3) ==
        s"Pg $p d${a(0)} d${a(1)} (q${a(2)}) Ax${a(3)} kern${a(4)} z${a(5)}",
        s"text ($i,$p)")
      assert(r.getLong(4) == 8)
      assert(r.getLong(5) == p + (0L until 6).map(a).sum)
    }
  }

  test("both filters parse: raw (even ids) and FlateDecode (odd ids)") {
    val raw0 = new String(blob(0), "ISO-8859-1")
    val raw1 = new String(blob(1), "ISO-8859-1")
    assert(!raw0.contains("FlateDecode") && raw0.contains("(Pg 0"))
    assert(raw1.contains("FlateDecode") && !raw1.contains("(Pg 0"))
    assert(PdfLake.parsePdf(blob(0)).nonEmpty)
    assert(PdfLake.parsePdf(blob(1)).nonEmpty)
  }

  test("strictness matrix: every structural lie rejects") {
    val good = blob(0) // raw streams → text edits are safe
    val s = new String(good, "ISO-8859-1")
    def edited(from: String, to: String): Array[Byte] = {
      assert(s.contains(from), s"fixture lacks '$from'")
      s.replace(from, to).getBytes("ISO-8859-1")
    }
    // same-length edits keep xref offsets true; the matrix then
    // isolates exactly one lie per case
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad header" -> edited("%PDF-1.7", "%PDF-2.0"),
      "missing %%EOF" -> edited("%%EOF", "%%EOX"),
      "xref offset off by one" -> {
        val at = s.lastIndexOf("startxref")
        val numStart = at + 10
        val numEnd = s.indexOf('\n', numStart)
        (s.substring(0, numStart) +
          (s.substring(numStart, numEnd).trim.toInt + 1) +
          s.substring(numEnd)).getBytes("ISO-8859-1")
      },
      "Size lies" -> edited("/Size 7", "/Size 8"),
      "missing Root" -> edited("/Root 1 0 R", "/Rook 1 0 R"),
      "object number lies" -> edited("3 0 obj", "9 0 obj"),
      "catalog type lies" -> edited("/Type /Catalog", "/Type /Catalogx"),
      "Count lies" -> edited("/Count 1", "/Count 2"),
      "parent back-pointer lies" -> edited("/Parent 2 0 R", "/Parent 3 0 R"),
      "Length lies" -> {
        val at = s.indexOf("/Length ")
        val numEnd = s.indexOf(' ', at + 8)
        (s.substring(0, at + 8) +
          (s.substring(at + 8, numEnd).trim.toInt + 1) +
          s.substring(numEnd)).getBytes("ISO-8859-1")
      },
      "unknown operator" -> edited(" Tj ET", " Tx ET"),
      "text op outside BT" -> edited("BT /F1 12 Tf", "   /F1 12 Tf"),
      "unbalanced BT" -> edited("Tj ET\nBT", "Tj   \nBT"),
      "leftover operand" -> edited("72 720 Td", "72 720 72"),
      "kern array holds a name" -> edited("[(ke) -250", "[(ke) /abc"),
      "hex string" -> edited("(Pg 0 ", "<41> x"),
      "unknown escape" -> edited("\\(q", "\\yq"),
      "duplicate dict key" -> // page dict: /Type appears twice
        edited("/MediaBox [ 0 0 612 792 ]", "/Type     [ 0 0 612 792 ]"),
      "truncated" -> good.dropRight(7))
    cases.foreach { case (name, b) =>
      assert(PdfLake.parsePdf(b).isEmpty, name)
    }
    assert(PdfLake.parsePdf(null).isEmpty)
    assert(PdfLake.parsePdf(Array[Byte]()).isEmpty)
  }

  test("flate stream corruption rejects") {
    val good = blob(1)
    // flip one byte inside the first deflate payload
    val s = new String(good, "ISO-8859-1")
    val at = s.indexOf("stream\n") + 7
    val c = good.clone()
    c(at + 2) = (c(at + 2) ^ 0x41).toByte
    assert(PdfLake.parsePdf(c).isEmpty)
  }

  test("byte-flip sweep never throws") {
    for (src <- Seq(blob(0), blob(1)); i <- src.indices by 7;
         bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      PdfLake.parsePdf(c) // must not throw
    }
  }
}
