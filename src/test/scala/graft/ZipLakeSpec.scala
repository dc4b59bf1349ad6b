package graft

import graft.operators.ZipLake

/** ZIP central-directory walk: JDK-encoder round-trip, EOCD comment
  * search, ZIP64 (EOCD64 + locator + sentinel extras), corruption
  * matrices, strictness rejects. */
class ZipLakeSpec extends SparkSpec {

  private def mkZip(
      entries: Seq[(String, Array[Byte], Boolean)], // (name, body, stored)
      comment: Option[String] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    comment.foreach(zos.setComment)
    entries.foreach { case (name, body, stored) =>
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
    zos.close()
    bos.toByteArray
  }

  test("JDK-encoded archives parse byte-exactly, both methods, with comments") {
    val bodies = Seq(
      ("a.txt", "alpha beta 12".getBytes("UTF-8"), false),
      ("dir/b.bin", Array.tabulate(5000)(i => (i * 37 % 251).toByte), true),
      ("c.txt", Array.empty[Byte], false),
      ("d.txt", "z9 z8 z7".getBytes("UTF-8"), true))
    for (comment <- Seq(None, Some("trailing comment of the archive"))) {
      val z = mkZip(bodies, comment)
      val got = ZipLake.parseZip(z)
      assert(got.isDefined, s"comment=$comment")
      val es = got.get
      assert(es.map(_.name) == bodies.map(_._1))
      assert(es.map(_.method) ==
        Seq("deflate", "stored", "deflate", "stored"))
      es.zip(bodies).foreach { case (e, (_, body, _)) =>
        assert(java.util.Arrays.equals(e.payload, body), e.name)
        assert(e.uncompSize == body.length.toLong)
      }
    }
  }

  test("corruption matrix: every malformation flags, none throws") {
    import spark.implicits._
    val good = mkZip(Seq(
      ("x.txt", "some words here 123".getBytes("UTF-8"), false),
      ("y.txt", "more body text".getBytes("UTF-8"), true)))
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // flip a byte of the FIRST entry's deflate payload (offset: after
    // the 30-byte local header + 5-byte name)
    val payloadFlip = mut(c => c(36) = (c(36) ^ 0x40).toByte)
    val truncated = java.util.Arrays.copyOf(good, good.length - 5)
    val noEocd = mut(c => c(c.length - 22) = 0x00)
    // encrypted flag bit in the central directory entry for x.txt
    val cdOff = {
      // locate central dir via EOCD
      def u32(b: Array[Byte], o: Int) = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      u32(good, good.length - 22 + 16).toInt
    }
    val encrypted = mut(c => c(cdOff + 8) = (c(cdOff + 8) | 1).toByte)
    val badMethod = mut(c => c(cdOff + 10) = 3)
    val crcFlip = mut(c => c(cdOff + 16) = (c(cdOff + 16) ^ 1).toByte)
    val nameFlip = mut(c => c(cdOff + 46) = 'q'.toByte) // CD name != local name
    val junk = "PK\u0003\u0004 but not really a zip".getBytes("ISO-8859-1")
    val cases = Seq(good, payloadFlip, truncated, noEocd, encrypted,
      badMethod, crcFlip, nameFlip, junk)
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
    val out = ZipLake.extractZip(df, "id", "media").collect()
    assert(out.filter(_.getLong(0) == 0L).forall(_.getAs[Boolean]("valid")))
    for (k <- 1 until cases.length)
      assert(out.filter(_.getLong(0) == k.toLong)
        .forall(!_.getAs[Boolean]("valid")), s"variant $k must flag")
  }

  test("ZIP64 archives round-trip: sentinel shapes, both EOCD conventions") {
    val bodies = Seq(
      ("a.txt", "alpha beta 12".getBytes("UTF-8"), false), // sizes sentineled
      ("dir/b.bin", Array.tabulate(5000)(i => (i * 37 % 251).toByte),
        true), // lho sentineled
      ("c.txt", Array.empty[Byte], false), // all three + disk sentineled
      ("d.txt", "z9 z8 z7".getBytes("UTF-8"), true))
    for (sent <- Seq(true, false);
         comment <- Seq("", "zip64 trailing comment")) {
      val z = ZipLake.writeZip64(bodies, sentinelEocd = sent,
        comment = comment)
      val got = ZipLake.parseZip(z)
      assert(got.isDefined, s"sentinelEocd=$sent comment=$comment")
      val es = got.get
      assert(es.map(_.name) == bodies.map(_._1))
      assert(es.map(_.method) ==
        Seq("deflate", "stored", "deflate", "stored"))
      es.zip(bodies).foreach { case (e, (_, body, _)) =>
        assert(java.util.Arrays.equals(e.payload, body), e.name)
        assert(e.uncompSize == body.length.toLong)
      }
    }
  }

  test("ZIP64 corruption matrix: every structural lie rejects") {
    val bodies = Seq(
      ("x.txt", "words here 42".getBytes("UTF-8"), false),
      ("y.txt", "more text".getBytes("UTF-8"), true),
      ("z.txt", "tail 7".getBytes("UTF-8"), false))
    val good = ZipLake.writeZip64(bodies, sentinelEocd = true)
    val L = good.length
    // fixed tail layout (no comment): EOCD 22 + locator 20 + EOCD64 56
    val eocd = L - 22
    val loc = L - 42
    val e64 = L - 98
    def u64(b: Array[Byte], o: Int): Long =
      (0 until 8).map(i => (b(o + i) & 0xffL) << (8 * i)).sum
    assert((good(e64) & 0xff) == 0x50 && (good(loc) & 0xff) == 0x50,
      "layout sanity: EOCD64 + locator signatures where expected")
    val cdOff = u64(good, e64 + 48).toInt
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      // a broken locator must NOT silently downgrade to classic parse
      "locator signature flip" -> mut(c => c(loc) = 0x51.toByte),
      "EOCD64 signature flip" -> mut(c => c(e64) = 0x51.toByte),
      "EOCD64 record size lie" -> mut(c => c(e64 + 4) = 45.toByte),
      "EOCD64 disk nonzero" -> mut(c => c(e64 + 16) = 1.toByte),
      "entry counts disagree" ->
        mut(c => c(e64 + 24) = (c(e64 + 24) + 1).toByte),
      "cd offset lie" -> mut(c => c(e64 + 48) = (c(e64 + 48) ^ 1).toByte),
      "locator total disks = 2" -> mut(c => c(loc + 16) = 2.toByte),
      "locator eocd64 disk = 1" -> mut(c => c(loc + 4) = 1.toByte),
      // first CD entry (x.txt, 5-char name): sizes sentineled, so its
      // extra is id(2)+len(2)+16 at cdOff+46+5
      "zip64 extra id flipped away" ->
        mut(c => c(cdOff + 46 + 5) = 2.toByte),
      "zip64 extra length lie" ->
        mut(c => c(cdOff + 46 + 5 + 2) = 17.toByte),
      "zip64 uncomp size lie" ->
        mut(c => c(cdOff + 46 + 5 + 4) = (c(cdOff + 46 + 5 + 4) + 1).toByte))
    cases.foreach { case (name, b) =>
      assert(ZipLake.parseZip(b).isEmpty, name)
    }
    assert(ZipLake.parseZip(good).nonEmpty, "control: unmutated parses")
    // EOCD classic-field disagreement on a real-valued (non-sentinel)
    // ZIP64 archive
    val real = ZipLake.writeZip64(bodies, sentinelEocd = false)
    val cnt = real.clone()
    cnt(cnt.length - 22 + 10) = (cnt(cnt.length - 22 + 10) + 1).toByte
    assert(ZipLake.parseZip(cnt).isEmpty, "EOCD count disagrees with ZIP64")
    assert(ZipLake.parseZip(real).nonEmpty, "control: real-valued parses")
  }

  test("fixture laws replay through the DataFrame surface") {
    val out = ZipLake.extractZip(ZipLake.zipFixture(spark, 6), "id", "media")
      .orderBy("id", "entry").collect()
    var idx = 0
    for (i <- 0 until 6; k <- 0 until (3 + i % 4)) {
      val r = out(idx); idx += 1
      val nt = 8 + (i + k) % 5
      assert(r.getAs[Boolean]("valid"))
      assert(r.getAs[String]("name") == s"doc_${i}_$k.txt")
      assert(r.getAs[String]("method") ==
        (if (k % 2 == 0) "deflate" else "stored"))
      assert(r.getAs[Long]("uncomp_size") == 3L * nt - 1)
      assert(r.getAs[Long]("n_words") == nt.toLong)
      assert(r.getAs[Long]("digit_sum") ==
        (0 until nt).map(j => (i * 7 + k * 3 + j) % 10).sum.toLong)
    }
    assert(idx == out.length)
  }
}
