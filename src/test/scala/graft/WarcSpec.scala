package graft

import graft.operators.Warc

/** WARC/gzip web-archive ingestion: round-trip against an independent
  * reference (JDK GZIPInputStream — a different decoder than the
  * member walk under test), strict-parse corruption matrix, and the
  * RFC 1952 optional-field walk. */
class WarcSpec extends SparkSpec {

  private def mkRecord(i: Int, r: Int): Array[Byte] = {
    val nt = 10 + (i + r) % 6
    val payload =
      (0 until nt).map(k => s"w${(i * 7 + r * 3 + k) % 10}").mkString(" ")
    Warc.recordBytes(
      if (r % 2 == 0) "conversion" else "metadata",
      s"https://example.com/$i/$r", "2024-01-01T00:01:02Z",
      s"<urn:uuid:$i-$r>", payload)
  }

  test("gzip member walk matches the JDK's own decoder byte for byte") {
    val payloads = Seq(
      Array.tabulate(5000)(i => (i * 37 % 251).toByte),
      "short".getBytes("UTF-8"),
      Array.empty[Byte],
      Array.fill(65536)(0x41.toByte)) // highly compressible long run
    payloads.zipWithIndex.foreach { case (p, i) =>
      val gz = Warc.gzipMember(p,
        fname = if (i % 2 == 0) Some("x.bin") else None,
        extra = if (i % 3 == 0) Some(Array[Byte](83, 73, 2, 0, 1, 2)) else None)
      val got = Warc.gunzipMember(gz, 0)
      assert(got.isDefined, s"payload $i")
      assert(java.util.Arrays.equals(got.get._1, p), s"payload $i bytes")
      assert(got.get._2 == gz.length, s"payload $i consumed length")
      // independent decoder agrees
      val ref = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz)).readAllBytes()
      assert(java.util.Arrays.equals(ref, p), s"payload $i vs JDK")
    }
    // multi-member walk: boundaries recovered exactly
    val a = Warc.gzipMember("first".getBytes)
    val b = Warc.gzipMember("second-longer-payload".getBytes)
    val both = a ++ b
    val m1 = Warc.gunzipMember(both, 0).get
    assert(new String(m1._1) == "first" && m1._2 == a.length)
    val m2 = Warc.gunzipMember(both, m1._2).get
    assert(new String(m2._1) == "second-longer-payload")
  }

  test("fixture decodes to the closed-form laws; plain and gzip layouts agree") {
    val out = Warc.extractWarc(Warc.warcFixture(spark, 10), "id", "media")
      .orderBy("id", "rec").collect()
    var idx = 0
    for (i <- 0 until 10; r <- 0 until (3 + i % 4)) {
      val row = out(idx); idx += 1
      val nt = 10 + (i + r) % 6
      assert(row.getAs[Boolean]("valid"), s"($i,$r)")
      assert(row.getAs[Long]("id") == i && row.getAs[Int]("rec") == r)
      assert(row.getAs[String]("warc_type") ==
        (if (r % 2 == 0) "conversion" else "metadata"))
      assert(row.getAs[Long]("date_epoch") == 1704067200L + i * 60 + r)
      assert(row.getAs[Long]("content_length") == 3L * nt - 1)
      assert(row.getAs[Long]("n_words") == nt.toLong)
      assert(row.getAs[Long]("digit_sum") ==
        (0 until nt).map(k => (i * 7 + r * 3 + k) % 10).sum.toLong, s"($i,$r)")
    }
    assert(idx == out.length)
  }

  test("corruption matrix: every malformation flags, none throws") {
    import spark.implicits._
    val rec = mkRecord(1, 0)
    val good = Warc.gzipMember(rec)
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    // locate the DEFLATE body (no optional fields: header is 10 bytes)
    val deflateFlip = mut { g => g(12) = (g(12) ^ 0x40).toByte; g }
    val crcFlip = mut { g =>
      g(g.length - 6) = (g(g.length - 6) ^ 1).toByte; g } // CRC32 field
    val isizeFlip = mut { g =>
      g(g.length - 2) = (g(g.length - 2) ^ 1).toByte; g } // ISIZE field
    val truncated = java.util.Arrays.copyOf(good, good.length - 4)
    val badMagic = mut { g => g(1) = 0x8c.toByte; g }
    val reservedFlag = mut { g => g(3) = (g(3) | 0x80).toByte; g }
    val trailingJunk = good ++ Array[Byte](1, 2, 3)
    // record-level malformations, wrapped in VALID gzip
    val badVersion = Warc.gzipMember(
      ("WARC/0.9" +: new String(rec, "ISO-8859-1").split("\r\n", 2).drop(1).toSeq)
        .mkString("\r\n").getBytes("ISO-8859-1"))
    val noTerm = Warc.gzipMember(java.util.Arrays.copyOf(rec, rec.length - 2))
    val badDate = Warc.gzipMember(new String(rec, "ISO-8859-1")
      .replace("2024-01-01T00:01:02Z", "Jan 1 2024").getBytes("ISO-8859-1"))
    val badLen = Warc.gzipMember(new String(rec, "ISO-8859-1")
      .replace("Content-Length: ", "Content-Length: 9").getBytes("ISO-8859-1"))
    val twoInOne = Warc.gzipMember(rec ++ mkRecord(1, 1)) // member must hold ONE
    val cases = Seq(good, deflateFlip, crcFlip, isizeFlip, truncated,
      badMagic, reservedFlag, trailingJunk, badVersion, noTerm, badDate,
      badLen, twoInOne)
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
    val out = Warc.extractWarc(df, "id", "media").orderBy("id").collect()
    assert(out.filter(_.getAs[Long]("id") == 0L).forall(_.getAs[Boolean]("valid")))
    for (k <- 1 until cases.length)
      assert(out.filter(_.getAs[Long]("id") == k.toLong)
        .forall(!_.getAs[Boolean]("valid")), s"variant $k must flag")
    // mixed-layout blob: plain record followed by a gzip member — both parse
    val mixed = mkRecord(2, 0) ++ Warc.gzipMember(mkRecord(2, 1))
    val mout = Warc.extractWarc(Seq((0L, mixed)).toDF("id", "media"),
      "id", "media").orderBy("rec").collect()
    assert(mout.length == 2 && mout.forall(_.getAs[Boolean]("valid")))
    // empty and junk blobs flag
    val jout = Warc.extractWarc(
      Seq((0L, Array.empty[Byte]), (1L, "PKZIPjunk".getBytes()))
        .toDF("id", "media"), "id", "media").collect()
    assert(jout.forall(!_.getAs[Boolean]("valid")))
  }

  test("HTTP response envelope: strict parse, filter-not-crash pipeline semantics") {
    import spark.implicits._
    val html = "<body><p>hi &amp; bye</p></body>"
    val ok = Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
      html.getBytes("UTF-8"))
    assert(Warc.parseHttp(ok).exists { case (st, ct, body) =>
      st == 200 && ct == "text/html" && new String(body, "UTF-8") == html })
    // Content-Length mismatch, garbled status line, missing blank line
    val short = Warc.httpResponse(200, "OK", "text/html",
      html.getBytes("UTF-8")).dropRight(3)
    assert(Warc.parseHttp(short).isEmpty)
    assert(Warc.parseHttp("ICY 200 OK\r\n\r\nx".getBytes).isEmpty)
    assert(Warc.parseHttp("HTTP/1.1 abc OK\r\n\r\nx".getBytes).isEmpty)
    assert(Warc.parseHttp("HTTP/1.1 200 OK\r\nContent-Type: a".getBytes).isEmpty)
    // no Content-Length declared: body = rest (WARC bounds it)
    assert(Warc.parseHttp("HTTP/1.0 404 NF\r\nX: y\r\n\r\nbody".getBytes)
      .exists { case (st, ct, b) =>
        st == 404 && ct == "" && new String(b) == "body" })
    // fixture pipeline: 404/metadata records present but filtered;
    // a malformed HTTP envelope inside a response record invalidates
    val fx = Warc.warcHttpFixture(spark, 8)
    val rows = Warc.extractWarcHttp(fx, "id", "media").collect()
    assert(rows.forall(_.getAs[Boolean]("valid")))
    assert(rows.exists(r => r.getAs[String]("warc_type") == "response" &&
      r.getAs[Int]("status") == 404))
    assert(rows.exists(r => r.getAs[String]("warc_type") == "metadata" &&
      r.isNullAt(r.fieldIndex("status"))))
    val badHttp = Warc.gzipMember(Warc.recordBytes("response",
      "https://x/", "2024-01-01T00:00:00Z", "<urn:uuid:b>", "NOT HTTP"))
    val bout = Warc.extractWarcHttp(
      Seq((0L, badHttp)).toDF("id", "media"), "id", "media").collect()
    assert(bout.length == 1 && !bout(0).getAs[Boolean]("valid"))
  }

  test("warcDateEpoch: strict profile only") {
    assert(Warc.warcDateEpoch("2024-01-01T00:00:00Z").contains(1704067200L))
    assert(Warc.warcDateEpoch("1970-01-01T00:00:00Z").contains(0L))
    assert(Warc.warcDateEpoch("2024-13-01T00:00:00Z").isEmpty) // bad month
    assert(Warc.warcDateEpoch("2024-01-01 00:00:00").isEmpty)
    assert(Warc.warcDateEpoch("2024-01-01T00:00:00.123Z").isEmpty)
    assert(Warc.warcDateEpoch("").isEmpty)
  }
}
