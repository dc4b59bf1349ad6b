package graft

import graft.operators.ZipLake

/** ZIP central-directory walk: JDK-encoder round-trip, EOCD comment
  * search, corruption matrix, strictness rejects. */
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
