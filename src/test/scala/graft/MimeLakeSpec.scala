package graft

import graft.operators.MimeLake

/** RFC 5322 / MIME walk: JDK-base64 agreement, QP strictness, date
  * profile with day-of-week law, multipart framing, corruption
  * matrix. */
class MimeLakeSpec extends SparkSpec {

  private val goodDate = "Tue, 2 Jan 2024 03:04:05 +0100"

  private def mkEml(
      parts: Seq[(String, Array[Byte])],
      date: String = goodDate): Array[Byte] =
    MimeLake.buildEml("a@example.com", "b@example.com", "Subject",
      date, parts, "bx")

  test("single-part and multipart round-trip all three encodings") {
    val bodies = Seq(
      ("7bit", "plain ascii words 12".getBytes("UTF-8")),
      ("quoted-printable",
        ("equals=signs need escapes " * 4).trim.getBytes("UTF-8")),
      ("base64", Array.tabulate(300)(i => (i * 31 % 256).toByte)))
    for (ps <- Seq(bodies.take(1), bodies)) {
      val got = MimeLake.parseEml(mkEml(ps))
      assert(got.isDefined, s"nparts=${ps.length}")
      val (epoch, out) = got.get
      assert(epoch == 1704161045L) // 2024-01-02T03:04:05+01:00
      assert(out.length == ps.length)
      out.zip(ps).foreach { case (p, (enc, body)) =>
        assert(p.encoding == enc)
        assert(p.contentType == "text/plain")
        assert(java.util.Arrays.equals(p.payload, body), enc)
      }
    }
  }

  test("date profile: day-of-week must agree; offsets honored; GMT-name rejects") {
    assert(MimeLake.rfc5322Epoch("Tue, 2 Jan 2024 03:04:05 +0100")
      .contains(1704161045L))
    assert(MimeLake.rfc5322Epoch("Mon, 1 Jan 2024 00:00:00 -0500")
      .contains(1704085200L))
    // 2024-01-02 was a Tuesday — a lying day name must reject
    assert(MimeLake.rfc5322Epoch("Wed, 2 Jan 2024 03:04:05 +0100").isEmpty)
    assert(MimeLake.rfc5322Epoch("Tue, 2 Jan 2024 03:04:05 GMT").isEmpty)
    assert(MimeLake.rfc5322Epoch("Tue, 2 Jan 2024 3:04:05 +0100").isEmpty)
    assert(MimeLake.rfc5322Epoch("Tue, 32 Jan 2024 03:04:05 +0100").isEmpty)
  }

  test("strict QP: lowercase hex, bad pair, trailing WSP, long line all reject") {
    def qp(s: String) = MimeLake.decodeQp(s.getBytes("ISO-8859-1"))
    assert(qp("a=3Db").map(new String(_, "UTF-8")).contains("a=b"))
    assert(qp("soft=\r\nbreak").map(new String(_, "UTF-8"))
      .contains("softbreak"))
    assert(qp("a=3db").isEmpty, "lowercase hex")
    assert(qp("a=G1b").isEmpty, "bad hex pair")
    assert(qp("a=").isEmpty, "dangling escape")
    assert(qp("trailing \r\nx").isEmpty, "trailing WSP before hard break")
    assert(qp("x" * 80).isEmpty, "line over 76")
    assert(qp("ok line\r\nnext 9").map(new String(_, "UTF-8"))
      .contains("ok line\r\nnext 9"))
  }

  test("strict base64: JDK MIME encoder output accepted, deviations reject") {
    val body = Array.tabulate(500)(i => (i * 17 % 256).toByte)
    val enc = new String(java.util.Base64.getMimeEncoder(76,
      Array[Byte]('\r', '\n')).encode(body), "ISO-8859-1")
    assert(MimeLake.decodeB64(enc.getBytes("ISO-8859-1"))
      .exists(java.util.Arrays.equals(_, body)))
    def b64(s: String) = MimeLake.decodeB64(s.getBytes("ISO-8859-1"))
    assert(b64("QUJD RA==").isEmpty, "space in stream")
    assert(b64("QUJ=RA==").isEmpty, "padding mid-stream")
    assert(b64("QUJDR").isEmpty, "length not multiple of 4")
    assert(b64("QUJDRA==\nX").isEmpty, "bare LF line break")
    assert(b64("A" * 80).isEmpty, "line over 76")
  }

  test("corruption matrix: every malformation flags, none throws") {
    import spark.implicits._
    val parts = Seq(
      ("quoted-printable", "first part=text 7".getBytes("UTF-8")),
      ("base64", "second part body 42".getBytes("UTF-8")))
    val good = mkEml(parts)
    def s(b: Array[Byte]) = new String(b, "ISO-8859-1")
    def re(f: String => String): Array[Byte] =
      f(s(good)).getBytes("ISO-8859-1")

    val noClosing = re(_.replace("--bx--", "--bx"))
    val paddedDelim = re(_.replace("--bx\r\nContent", "--bx \r\nContent"))
    val badVersion = re(_.replace("MIME-Version: 1.0", "MIME-Version: 2.0"))
    val dupFrom = re(_.replace("From: a@example.com\r\n",
      "From: a@example.com\r\nFrom: c@example.com\r\n"))
    val noDate = re(_.replace("Date: ", "X-Date: "))
    val lyingDow = re(_.replace("Tue, 2 Jan", "Mon, 2 Jan"))
    val badCharset = re(_.replaceFirst("charset=utf-8", "charset=koi8-r"))
    val badEnc = re(_.replaceFirst(
      "Content-Transfer-Encoding: base64", "Content-Transfer-Encoding: 8bit"))
    val lowercaseHex = re(_.replace("part=3Dtext", "part=3dtext"))
    val truncated = java.util.Arrays.copyOf(good, good.length - 40)
    val junk = "From nowhere, plain mbox text without MIME".getBytes("UTF-8")

    val cases = Seq(good, noClosing, paddedDelim, badVersion, dupFrom,
      noDate, lyingDow, badCharset, badEnc, lowercaseHex, truncated, junk)
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
    val out = MimeLake.extractEml(df, "id", "media").collect()
    assert(out.filter(_.getLong(0) == 0L).forall(_.getAs[Boolean]("valid")))
    for (k <- 1 until cases.length)
      assert(out.filter(_.getLong(0) == k.toLong)
        .forall(!_.getAs[Boolean]("valid")), s"variant $k must flag")
  }

  test("fixture laws replay through the DataFrame surface") {
    val out = MimeLake.extractEml(MimeLake.emlFixture(spark, 9), "id", "media")
      .orderBy("id", "part").collect()
    var idx = 0
    for (i <- 0 until 9) {
      val np = Seq(1, 3, 4)(i % 3)
      for (k <- 0 until np) {
        val r = out(idx); idx += 1
        val nt = 8 + (i + k) % 5
        assert(r.getAs[Boolean]("valid"))
        assert(r.getAs[String]("encoding") ==
          Seq("7bit", "quoted-printable", "base64")((i + k) % 3))
        assert(r.getAs[Long]("date_epoch") ==
          1704067200L + i * 86400L + i * 61L)
        assert(r.getAs[Long]("body_len") == 3L * nt - 1 + nt / 4)
        assert(r.getAs[Long]("n_words") == nt.toLong)
        assert(r.getAs[Long]("digit_sum") ==
          (0 until nt).map(j => (i * 7 + k * 3 + j) % 10).sum.toLong)
      }
    }
    assert(idx == out.length)
  }
}
