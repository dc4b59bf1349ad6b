package graft

import graft.operators.{TarLake, Warc}

/** POSIX ustar + pax + GNU-longname walk: round-trip laws, prefix
  * joining, pax override semantics, .tar.gz layout, corruption
  * matrix, strictness rejects. */
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
    // 'K' (GNU long LINKNAME) stays out of subset — links are rejected
    val gnuLonglink = mut { c => c(512 + 156) = 'K'.toByte; reseal(c, 512) }
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

    val cases = Seq(good, chksumFlip, badMagic, badOctalSize, gnuLonglink,
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

  test("pax overrides and GNU longnames round-trip") {
    import TarLake.{WirePlain, WirePax, WireLongname}
    val body = "pax payload 9".getBytes("UTF-8")
    // pax path/size/mtime are LOAD-BEARING here: the header carries a
    // truncated name, a zeroed size field and mtime 0 — only the 'x'
    // records make the entry parseable at all
    val pax = TarLake.writeTarWire(Seq(
      WirePax(global = true, Seq("comment" -> "hi", "X.vendor" -> "v")),
      WirePax(global = false, Seq(
        "path" -> "deep/nested/dir/with a space/file.txt",
        "size" -> body.length.toString,
        "mtime" -> "1700000009.987654321",
        "atime" -> "1700000010")),
      WirePlain("file.txt", "", '0', 0L, body, sizeField = Some(0L))))
    val es = TarLake.parseTar(pax).get
    assert(es.map(_.name) == Seq("deep/nested/dir/with a space/file.txt"))
    assert(es.head.size == body.length.toLong)
    assert(es.head.mtime == 1700000009L, "fractional mtime floors")
    assert(java.util.Arrays.equals(es.head.payload, body))

    // GNU magic: inline names, 'L' longname, and NO prefix joining
    val longPath = "really/" * 20 + "long_name.txt"
    val gnu = TarLake.writeTarWire(Seq(
      WirePlain("g/", "", '5', 1700000000L, Array.empty[Byte], gnu = true),
      WireLongname(longPath),
      WirePlain("long_name.txt", "", '0', 1700000001L, body, gnu = true)))
    val ge = TarLake.parseTar(gnu).get
    assert(ge.map(_.name) == Seq("g/", longPath))
    assert(ge(1).mtime == 1700000001L)

    // a GNU header ignores bytes in the prefix region (atime/ctime in
    // incremental dumps live there) — no prefix joining happens
    val g1 = TarLake.writeTarWire(Seq(
      WirePlain("solo.txt", "", '0', 1700000002L, body, gnu = true)))
    val atime = "00000000123 ".getBytes("UTF-8")
    System.arraycopy(atime, 0, g1, 345, atime.length)
    val sum = TarLake.headerChecksum(g1, 0)
    System.arraycopy("%06o".format(sum).getBytes("UTF-8"), 0, g1, 148, 6)
    g1(154) = 0.toByte; g1(155) = ' '.toByte
    assert(TarLake.parseTar(g1).get.map(_.name) == Seq("solo.txt"))
  }

  test("pax record framing laws (parsePax directly)") {
    def rec(key: String, value: String) = TarLake.paxRecord(key, value)
    assert(TarLake.parsePax(rec("path", "a/b")) ==
      Some(Map("path" -> "a/b")))
    assert(TarLake.parsePax(rec("a", "1") ++ rec("b", "")) ==
      Some(Map("a" -> "1", "b" -> "")))
    assert(TarLake.parsePax(Array.emptyByteArray) == Some(Map.empty))
    val good = rec("path", "a/b")
    def mutCase(f: Array[Byte] => Array[Byte]) =
      TarLake.parsePax(f(good.clone()))
    assert(mutCase(c => { c(c.length - 1) = 'x'.toByte; c }).isEmpty,
      "missing trailing newline")
    assert(mutCase(c => { c(0) = ('0' + (c(0) - '0' + 1) % 10).toByte; c })
      .isEmpty, "length lies")
    assert(TarLake.parsePax(rec("a", "1") ++ rec("a", "2")).isEmpty,
      "duplicate key")
    assert(TarLake.parsePax("12 pathnoeq\n".getBytes("UTF-8")).isEmpty,
      "no equals sign")
    assert(TarLake.parsePax("5 =v\n".getBytes("UTF-8")).isEmpty,
      "empty key")
    assert(TarLake.parsePax("x1 a=b\n".getBytes("UTF-8")).isEmpty,
      "no leading digits")
    assert(TarLake.parsePax("77777777 a=b\n".getBytes("UTF-8")).isEmpty,
      "8-digit record length bomb")
    assert(TarLake.parsePax(
      ("6 a=".getBytes("UTF-8") :+ 0xff.toByte) :+ '\n'.toByte).isEmpty,
      "invalid UTF-8 value")
  }

  test("pax/longname strictness matrix over whole archives") {
    import TarLake.{WirePlain, WirePax, WireLongname}
    val body = "x y 3".getBytes("UTF-8")
    val plain = WirePlain("ok.txt", "", '0', 1700000000L, body)
    def arch(items: TarLake.WireItem*) = TarLake.writeTarWire(items.toSeq)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "dangling x at end of archive" ->
        arch(plain, WirePax(global = false, Seq("path" -> "a"))),
      "dangling L at end of archive" -> arch(plain, WireLongname("a")),
      "two x in a row" -> arch(
        WirePax(global = false, Seq("path" -> "a")),
        WirePax(global = false, Seq("path" -> "b")), plain),
      "L then x" -> arch(WireLongname("a"),
        WirePax(global = false, Seq("path" -> "b")), plain),
      "x then L" -> arch(WirePax(global = false, Seq("path" -> "a")),
        WireLongname("b"), plain),
      "global path override" ->
        arch(WirePax(global = true, Seq("path" -> "a")), plain),
      "global size override" ->
        arch(WirePax(global = true, Seq("size" -> "1")), plain),
      "global mtime override" ->
        arch(WirePax(global = true, Seq("mtime" -> "1")), plain),
      "linkpath out of subset" ->
        arch(WirePax(global = false, Seq("linkpath" -> "t")), plain),
      "pax size not a number" ->
        arch(WirePax(global = false, Seq("size" -> "12x")), plain),
      "pax size signed" ->
        arch(WirePax(global = false, Seq("size" -> "-1")), plain),
      "pax mtime negative" ->
        arch(WirePax(global = false, Seq("mtime" -> "-5")), plain),
      "pax mtime bare dot" ->
        arch(WirePax(global = false, Seq("mtime" -> "17.")), plain),
      "pax path empty" ->
        arch(WirePax(global = false, Seq("path" -> "")), plain),
      "pax path with embedded NUL" -> arch(
        WirePax(global = false, Seq("path" -> ("a" + 0.toChar + "b"))),
        plain),
      "pax size on a directory" -> arch(
        WirePax(global = false, Seq("size" -> "512")),
        WirePlain("d/", "", '5', 1700000000L, Array.empty[Byte])))
    cases.foreach { case (name, b) =>
      assert(TarLake.parseTar(b).isEmpty, name)
    }
    // hand-built 'L' payload lies (the writer always emits valid ones)
    def lname(payload: Array[Byte]): Array[Byte] = {
      val hdr = TarLake.tarHeaderExt("././@LongLink", "", 'L',
        payload.length.toLong, 0L, gnu = true)
      val pad = new Array[Byte]((512 - payload.length % 512) % 512)
      hdr ++ payload ++ pad ++
        TarLake.tarHeaderExt("ok.txt", "", '0', body.length.toLong,
          1700000000L, gnu = true) ++ body ++
        new Array[Byte]((512 - body.length % 512) % 512) ++
        new Array[Byte](1024)
    }
    assert(TarLake.parseTar(lname("a".getBytes("UTF-8"))).isEmpty,
      "L without NUL terminator")
    assert(TarLake.parseTar(lname(Array[Byte](0, 0))).isEmpty,
      "L with empty name")
    assert(TarLake.parseTar(
      lname("a".getBytes("UTF-8") ++ Array[Byte](0, 'j'.toByte, 0))).isEmpty,
      "L junk after terminator")
    assert(TarLake.parseTar(
      lname(Array[Byte](0xff.toByte, 0))).isEmpty,
      "L invalid UTF-8 name")
    assert(TarLake.parseTar(lname("a".getBytes("UTF-8") :+ 0.toByte))
      .nonEmpty, "control: healthy hand-built L parses")
    // GNU magic with a broken version byte
    val gnuGood = arch(WirePlain("a.txt", "", '0', 1700000000L, body,
      gnu = true))
    val badVer = gnuGood.clone()
    badVer(263) = '9'.toByte
    val sum = TarLake.headerChecksum(badVer, 0)
    System.arraycopy("%06o".format(sum).getBytes("UTF-8"), 0, badVer, 148, 6)
    badVer(154) = 0.toByte; badVer(155) = ' '.toByte
    assert(TarLake.parseTar(badVer).isEmpty, "ustar-space-9 magic")
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
