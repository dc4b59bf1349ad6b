package graft

import graft.operators.EpubLake

/** OCF/OPF/XHTML semantic walk on top of the trusted ZIP + XML
  * parsers: fixture-law equality, the full container/package
  * strictness matrix (mimetype-first-stored, zip-slip paths, spine/
  * manifest laws, XHTML shape), byte-flip sweep. */
class EpubLakeSpec extends SparkSpec {

  private def fixtureBlobs(n: Int): Seq[(Long, Array[Byte])] =
    EpubLake.epubFixture(spark, n).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))

  test("fixture laws: extract output matches the closed forms") {
    val out = EpubLake.extractEpub(
      EpubLake.epubFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(9)))
    assert(out.length == (0 until 12).map(i => 2 + i % 3).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      assert(r.getString(2) == s"ch_$k.xhtml")
      assert(r.getString(3) == s"Chapter $i.$k")
      assert(r.getString(4) == s"Book $i & co") // entity decoded
      assert(r.getString(5) == Seq("en", "fr", "de")((i % 3).toInt))
      val nt = 8 + (i + k) % 5
      // two <p> runs + <em> boundary collapse to single spaces
      assert(r.getString(6) ==
        (0L until nt).map(j => s"e${(i * 7 + k * 3 + j) % 10}").mkString(" "))
      assert(r.getLong(7) == nt)
      assert(r.getLong(8) == (0L until nt).map(j => (i * 7 + k * 3 + j) % 10).sum)
    }
  }

  test("strictness matrix: every OCF/OPF/XHTML violation rejects") {
    val (_, good) = fixtureBlobs(1).head
    assert(EpubLake.parseEpub(good).nonEmpty)

    // rebuild variants by editing the fixture's text payloads and
    // re-zipping (the JDK zip side is trusted; the walk is the SUT)
    def rebuild(edit: (String, String) => Option[(String, String)],
        mimeFirst: Boolean = true, storedMime: Boolean = true,
        mimeBody: String = "application/epub+zip"): Array[Byte] = {
      val entries = graft.operators.ZipLake.parseZip(good).get
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      def putRaw(name: String, body: Array[Byte], stored: Boolean): Unit = {
        val e = new java.util.zip.ZipEntry(name)
        if (stored) {
          e.setMethod(java.util.zip.ZipOutputStream.STORED)
          e.setSize(body.length)
          e.setCompressedSize(body.length)
          val crc = new java.util.zip.CRC32
          crc.update(body)
          e.setCrc(crc.getValue)
        }
        zos.putNextEntry(e)
        zos.write(body)
        zos.closeEntry()
      }
      val edited = entries.flatMap { e =>
        if (e.name == "mimetype") None // re-added below
        else edit(e.name, new String(e.payload, "UTF-8"))
          .map { case (n2, b2) => (n2, b2.getBytes("UTF-8")) }
      }
      if (mimeFirst)
        putRaw("mimetype", mimeBody.getBytes("US-ASCII"), storedMime)
      edited.foreach { case (n, b) => putRaw(n, b, stored = false) }
      if (!mimeFirst)
        putRaw("mimetype", mimeBody.getBytes("US-ASCII"), storedMime)
      zos.close()
      bos.toByteArray
    }
    val keep = (n: String, b: String) => Some((n, b))

    assert(EpubLake.parseEpub(rebuild(keep)).nonEmpty, "rebuild sanity")
    val cases: Seq[(String, Array[Byte])] = Seq(
      "mimetype not first" -> rebuild(keep, mimeFirst = false),
      "mimetype deflated" -> rebuild(keep, storedMime = false),
      "mimetype wrong body" -> rebuild(keep, mimeBody = "application/zip"),
      "container.xml missing" ->
        rebuild((n, b) => if (n == "META-INF/container.xml") None else Some((n, b))),
      "rootfile wrong media-type" -> rebuild((n, b) =>
        Some((n, if (n == "META-INF/container.xml")
          b.replace("application/oebps-package+xml", "text/xml") else b))),
      "full-path zip-slip" -> rebuild((n, b) =>
        Some((n, if (n == "META-INF/container.xml")
          b.replace("OEBPS/content.opf", "OEBPS/../content.opf") else b))),
      "opf missing" ->
        rebuild((n, b) => if (n == "OEBPS/content.opf") None else Some((n, b))),
      "opf children out of order" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf") {
          val man = b.substring(b.indexOf("  <manifest>"), b.indexOf("</manifest>") + 12)
          b.replace(man, "").replace("<spine>", "<spine-x/>")
            .replace("</spine>", "") // degenerate: order/shape broken
        } else b))),
      "dc:title missing" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf")
          b.replaceAll("<dc:title>[^<]*</dc:title>", "") else b))),
      "dc:language twice" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf")
          b.replace("<dc:language>en</dc:language>",
            "<dc:language>en</dc:language><dc:language>fr</dc:language>")
        else b))),
      "duplicate manifest id" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf")
          b.replace("id=\"css\"", "id=\"c0\"") else b))),
      "spine idref unknown" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf")
          b.replace("idref=\"c0\"", "idref=\"nope\"") else b))),
      "spine references css media-type" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf")
          b.replace("  <spine>", "  <spine>\n    <itemref idref=\"css\"/>")
        else b))),
      "spine idref twice" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/content.opf")
          b.replace("<itemref idref=\"c0\"/>",
            "<itemref idref=\"c0\"/><itemref idref=\"c0\"/>") else b))),
      "chapter entry missing" ->
        rebuild((n, b) => if (n == "OEBPS/ch_0.xhtml") None else Some((n, b))),
      "chapter wrong namespace" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/ch_0.xhtml")
          b.replace("http://www.w3.org/1999/xhtml", "http://x") else b))),
      "chapter head without title" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/ch_0.xhtml")
          b.replaceAll("<title>[^<]*</title>", "") else b))),
      "chapter body before head" -> rebuild((n, b) =>
        Some((n, if (n == "OEBPS/ch_0.xhtml")
          b.replace("<head><title>Chapter 0.0</title></head>", "")
            .replace("</html>",
              "<head><title>Chapter 0.0</title></head></html>") else b))))
    cases.foreach { case (name, blob) =>
      assert(EpubLake.parseEpub(blob).isEmpty, name)
    }
  }

  test("null / non-zip / empty-zip reject") {
    assert(EpubLake.parseEpub(null).isEmpty)
    assert(EpubLake.parseEpub("PK\u0003\u0004junk".getBytes("ISO-8859-1")).isEmpty)
    // hand-built zero-entry EOCD (ZipOutputStream refuses to write one)
    val eocd = new Array[Byte](22)
    eocd(0) = 0x50; eocd(1) = 0x4b; eocd(2) = 0x05; eocd(3) = 0x06
    assert(EpubLake.parseEpub(eocd).isEmpty, "empty archive")
  }

  test("byte-flip sweep never throws") {
    val (_, src) = fixtureBlobs(2).last
    for (i <- src.indices by 7; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      EpubLake.parseEpub(c) // must not throw
    }
  }
}
