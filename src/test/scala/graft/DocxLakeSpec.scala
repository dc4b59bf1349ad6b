package graft

import graft.operators.DocxLake

/** OOXML wordprocessing walk: the run-concatenation law, OPC shape
  * strictness, fixture-law equality, byte-flip sweep. */
class DocxLakeSpec extends SparkSpec {

  private def blob(i: Int): Array[Byte] =
    DocxLake.docxFixture(spark, i + 1).collect().last.getAs[Array[Byte]](1)

  test("fixture laws: extract output matches the closed forms") {
    val out = DocxLake.extractDocx(
      DocxLake.docxFixture(spark, 12), "id", "media")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(7)))
    assert(out.length == 12)
    out.foreach { r =>
      val i = r.getLong(0)
      val np = 2 + i % 3
      val want = (0L until np).map { p =>
        def a(j: Long) = (i * 7 + p * 3 + j) % 10
        s"ha${a(0)}lf${a(1)} amp&${a(2)} tail${a(3)}"
      }.mkString(" ")
      assert(r.getString(1) == want, s"text $i (run concat law)")
      assert(r.getLong(2) == np * 3)
      assert(r.getInt(4) == np && r.getInt(5) == np * 2 && r.getInt(6) == 1)
    }
  }

  test("strictness matrix: every OPC/OOXML lie rejects") {
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
    assert(DocxLake.parseDocx(rebuild(keep)).nonEmpty, "rebuild sanity")

    def editMain(f: String => String): Array[Byte] =
      rebuild((n, b) => Some((n, if (n == "word/document.xml") f(b) else b)))
    val cases: Seq[(String, Array[Byte])] = Seq(
      "content-types missing" ->
        rebuild((n, b) => if (n == "[Content_Types].xml") None else Some((n, b))),
      "main part unregistered" -> rebuild((n, b) => Some((n,
        if (n == "[Content_Types].xml")
          b.replace("/word/document.xml", "/word/other.xml") else b))),
      "rels missing" ->
        rebuild((n, b) => if (n == "_rels/.rels") None else Some((n, b))),
      "rels wrong target" -> rebuild((n, b) => Some((n,
        if (n == "_rels/.rels")
          b.replace("Target=\"word/document.xml\"", "Target=\"word/x.xml\"")
        else b))),
      "document part missing" ->
        rebuild((n, b) => if (n == "word/document.xml") None else Some((n, b))),
      "wrong w namespace" ->
        editMain(_.replace("wordprocessingml/2006/main", "wordml/2003")),
      "table out of subset" ->
        editMain(_.replace("<w:sectPr>", "<w:tbl></w:tbl><w:sectPr>")),
      "field element in run" ->
        editMain(_.replace("<w:t>tail", "<w:fldChar/><w:t>tail")),
      "stray text in body" ->
        editMain(_.replace("<w:body>", "<w:body>loose ")),
      "no paragraphs" -> editMain { b =>
        val start = b.indexOf("<w:p>")
        val end = b.indexOf("<w:sectPr>")
        b.substring(0, start) + b.substring(end)
      })
    cases.foreach { case (name, b) =>
      assert(DocxLake.parseDocx(b).isEmpty, name)
    }
    assert(DocxLake.parseDocx(null).isEmpty)
    assert(DocxLake.parseDocx("PK".getBytes("ISO-8859-1")).isEmpty)
  }

  test("byte-flip sweep never throws") {
    val src = blob(1)
    for (i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      DocxLake.parseDocx(c) // must not throw
    }
  }
}
