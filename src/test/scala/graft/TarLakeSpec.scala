package graft

import graft.operators.{TarLake, Warc}

/** POSIX ustar walk: round-trip laws, prefix joining, .tar.gz layout,
  * corruption matrix, strictness rejects. */
class TarLakeSpec extends SparkSpec {

  private def entries = Seq(
    ("docs/", "", '5', 1700000000L, Array.empty[Byte]),
    ("docs/a.txt", "", '0', 1700000001L,
      "alpha beta 12".getBytes("UTF-8")),
    // prefix-split path: must parse to docs/sub/b.bin
    ("b.bin", "docs/sub", '0', 1700000002L,
      Array.tabulate(1200)(i => (i * 37 % 251).toByte)),
    ("docs/empty.txt", "", '0', 1700000003L, Array.empty[Byte]))

  test("round-trip: payloads, prefix joining, types, mtimes — plain and gzip") {
    val tar = TarLake.writeTar(entries)
    for (z <- Seq(tar, Warc.gzipMember(tar, fname = Some("x.tar")))) {
      val got = TarLake.parseTar(z)
      assert(got.isDefined)
      val es = got.get
      assert(es.map(_.name) ==
        Seq("docs/", "docs/a.txt", "docs/sub/b.bin", "docs/empty.txt"))
      assert(es.map(_.typeflag) == Seq("dir", "file", "file", "file"))
      assert(es.map(_.mtime) ==
        Seq(1700000000L, 1700000001L, 1700000002L, 1700000003L))
      es.zip(entries).foreach { case (e, (_, _, _, _, body)) =>
        assert(java.util.Arrays.equals(e.payload, body), e.name)
        assert(e.size == body.length.toLong)
      }
    }
  }

  test("corruption matrix: every malformation flags, none throws") {
    import spark.implicits._
    val good = TarLake.writeTar(entries)

    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    // re-seal a header block after a deliberate field mutation so the
    // mutation (not the checksum) is what the parser must catch
    def reseal(c: Array[Byte], off: Int): Unit = {
      val sum = TarLake.headerChecksum(c, off)
      val s = "%06o".format(sum).getBytes("UTF-8")
      System.arraycopy(s, 0, c, off + 148, 6)
      c(off + 154) = 0.toByte
      c(off + 155) = ' '.toByte
    }
    // header offsets: block 0 = docs/, block 1 = a.txt (0 + 512)
    val chksumFlip = mut(c => c(148) = (c(148) ^ 1).toByte)
    val badMagic = mut { c => c(512 + 257) = 'X'.toByte; reseal(c, 512) }
    val badOctalSize = mut { c => c(512 + 124) = 'z'.toByte; reseal(c, 512) }
    val gnuLongname = mut { c => c(512 + 156) = 'L'.toByte; reseal(c, 512) }
    val symlink = mut { c => c(512 + 156) = '2'.toByte; reseal(c, 512) }
    val dirWithSize = mut { c =>
      val s = "%011o".format(512L).getBytes("UTF-8")
      System.arraycopy(s, 0, c, 124, 11); reseal(c, 0)
    }
    val truncated = java.util.Arrays.copyOf(good, good.length - 512)
    val unblocked = java.util.Arrays.copyOf(good, good.length - 100)
    // a.txt payload block starts at 1024; its pad bytes follow the
    // 13-byte body — poke one
    val dirtyPad = mut(c => c(1024 + 200) = 7.toByte)
    val gz = Warc.gzipMember(good)
    val gzCrcFlip = {
      val c = gz.clone(); c(c.length - 8) = (c(c.length - 8) ^ 1).toByte; c
    }
    val gzTrailing = gz ++ Array[Byte](0, 0, 0)
    val junk = ("not a tar at all " * 64).getBytes("ISO-8859-1")

    val cases = Seq(good, chksumFlip, badMagic, badOctalSize, gnuLongname,
      symlink, dirWithSize, truncated, unblocked, dirtyPad, gzCrcFlip,
      gzTrailing, junk)
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
    val out = TarLake.extractTar(df, "id", "media").collect()
    assert(out.filter(_.getLong(0) == 0L).forall(_.getAs[Boolean]("valid")))
    for (k <- 1 until cases.length)
      assert(out.filter(_.getLong(0) == k.toLong)
        .forall(!_.getAs[Boolean]("valid")), s"variant $k must flag")
  }

  test("fixture laws replay through the DataFrame surface") {
    val out = TarLake.extractTar(TarLake.tarFixture(spark, 6), "id", "media")
      .orderBy("id", "entry").collect()
    var idx = 0
    for (i <- 0 until 6) {
      val d = out(idx); idx += 1
      assert(d.getAs[Boolean]("valid"))
      assert(d.getAs[String]("name") == s"d$i/")
      assert(d.getAs[String]("typeflag") == "dir")
      assert(d.getAs[Long]("size") == 0L)
      assert(d.getAs[Long]("mtime_epoch") == 1704067200L + i * 60L - 1L)
      assert(d.getAs[Long]("n_words") == 0L)
      for (k <- 0 until (3 + i % 4)) {
        val r = out(idx); idx += 1
        val nt = 8 + (i + k) % 5
        assert(r.getAs[Boolean]("valid"))
        assert(r.getAs[String]("name") == s"d$i/f_${i}_$k.txt")
        assert(r.getAs[String]("typeflag") == "file")
        assert(r.getAs[Long]("size") == 3L * nt - 1)
        assert(r.getAs[Long]("mtime_epoch") == 1704067200L + i * 60L + k)
        assert(r.getAs[Long]("n_words") == nt.toLong)
        assert(r.getAs[Long]("digit_sum") ==
          (0 until nt).map(j => (i * 7 + k * 3 + j) % 10).sum.toLong)
      }
    }
    assert(idx == out.length)
  }
}
