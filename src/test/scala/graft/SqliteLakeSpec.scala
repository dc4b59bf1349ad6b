package graft

import graft.operators.SqliteLake

/** SQLite pager/B-tree walk: fixture-law equality (incl. the
  * serial-size sweep), header strictness at pinned offsets, B-tree
  * law violations via hand-built pages (rowid order, interior-key
  * law, cycles, rootpage range, blob/reserved serials), byte-flip +
  * truncation sweeps. */
class SqliteLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = SqliteLake.extractSqlite(
      SqliteLake.sqliteFixture(spark, 12), "id", "media")
      .orderBy("id", "rid", "col").collect()
    assert(out.forall(_.getBoolean(10)))
    var k = 0
    (0 until 12).foreach { i =>
      val nr = (2 + i % 3) + (2 + (i + 1) % 3)
      (1 to nr).foreach { rid =>
        val g = rid - 1
        (0 until 4).foreach { c =>
          val r = out(k); k += 1
          assert(r.getLong(0) == i && r.getString(1) == "docs" &&
            r.getLong(2) == rid && r.getInt(3) == c)
          assert(r.getInt(8) == (512 << (i % 4)) && r.getInt(9) == 4)
          c match {
            case 0 =>
              assert(r.getString(4) == "int" &&
                r.getLong(5) == SqliteLake.fixtureIntVal(i, g))
            case 1 =>
              assert(r.getString(4) == "text" &&
                r.getString(6) == s"doc-${(i + g) % 9}")
            case 2 =>
              assert(r.getString(4) == "real" &&
                r.getDouble(7) == ((i * 13 + g * 7) % 1000) / 4.0)
            case 3 =>
              if ((i + g) % 3 == 0) assert(r.getString(4) == "null")
              else assert(r.getString(4) == "int" && r.getLong(5) == g % 2)
          }
        }
      }
    }
    assert(k == out.length)
  }

  test("serial-size sweep really exercises i8..i64 classes") {
    // the ·10^k law must produce at least one value in each size class
    val vals = for (i <- 0 until 12; g <- 0 until 7)
      yield SqliteLake.fixtureIntVal(i, g)
    def inClass(lo: Long, hi: Long) =
      vals.exists(v => math.abs(v) > lo && math.abs(v) <= hi)
    // const serials 8/9 are exercised by col3's g%2 law (not col0)
    assert(inClass(1, 127)) // i8
    assert(inClass(127, 32767)) // i16
    assert(inClass(32767, 8388607)) // i24
    assert(inClass(8388607, Int.MaxValue)) // i32
    assert(inClass(Int.MaxValue, 140737488355327L)) // i48
    assert(inClass(140737488355327L, Long.MaxValue)) // i64
  }

  private def blob(i: Int): Array[Byte] =
    SqliteLake.sqliteFixture(spark, i + 1).collect().last.getAs[Array[Byte]](1)

  test("header strictness: every pinned-offset lie rejects") {
    val g = blob(0) // ps=512, 4 pages
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = g.clone(); f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> mut(_(0) = 'X'),
      "magic without NUL" -> mut(_(15) = ' '),
      "page size 256" -> mut { c => c(16) = 1; c(17) = 0 },
      "page size 1 (65536 alias)" -> mut { c => c(16) = 0; c(17) = 1 },
      "page size 768 (not a power of two)" ->
        mut { c => c(16) = 3; c(17) = 0 },
      "WAL write version" -> mut(_(18) = 2),
      "WAL read version" -> mut(_(19) = 2),
      "reserved space 8" -> mut(_(20) = 8),
      "max payload fraction 63" -> mut(_(21) = 63),
      "min payload fraction 33" -> mut(_(22) = 33),
      "db-size lie" -> mut(_(31) = 5),
      "freelist trunk page set" -> mut(_(35) = 1),
      "freelist count set" -> mut(_(39) = 1),
      "schema format 5" -> mut(_(47) = 5),
      "auto-vacuum root set" -> mut(_(55) = 1),
      "UTF-16le encoding" -> mut(_(59) = 2),
      "incremental vacuum set" -> mut(_(67) = 1),
      "reserved header byte 80 set" -> mut(_(80) = 1),
      "page-1 btree type = index leaf" -> mut(_(100) = 10),
      "page-1 freeblock pointer set" -> mut(_(102) = 1),
      "page-1 fragmented count set" -> mut(_(107) = 3),
      "truncated file" -> g.take(g.length - 512),
      "trailing page" -> (g ++ new Array[Byte](512)),
      "tiny file" -> g.take(80))
    cases.foreach { case (name, b) =>
      assert(SqliteLake.parseSqlite(b).isEmpty, name)
    }
    assert(SqliteLake.parseSqlite(null).isEmpty)
    assert(SqliteLake.parseSqlite(g).nonEmpty, "control: unmutated parses")
  }

  // ------------------------------------------------------------------
  // hand-built B-tree lies (using the operator's page encoders, with
  // the laws deliberately broken)

  private def db(pages: Seq[Array[Byte]]): Array[Byte] = {
    val ps = 512
    val all = pages.flatten.toArray
    require(all.length == ps * pages.length)
    val magic = "SQLite format 3".getBytes("US-ASCII")
    System.arraycopy(magic, 0, all, 0, 15)
    all(15) = 0
    all(16) = (ps >> 8).toByte; all(17) = ps.toByte
    all(18) = 1; all(19) = 1
    all(21) = 64; all(22) = 32; all(23) = 32
    all(31) = pages.length.toByte
    all(47) = 4
    all(59) = 1
    all
  }
  private def master(rootpage: Long, name: String = "t"): Array[Byte] =
    SqliteLake.encRecord(Seq(
      SqliteLake.textSerial("table"), SqliteLake.textSerial(name),
      SqliteLake.textSerial(name), SqliteLake.intSerial(rootpage),
      SqliteLake.textSerial("CREATE TABLE " + name + "(a)")))
  private def rec(v: Long): Array[Byte] =
    SqliteLake.encRecord(Seq(SqliteLake.intSerial(v)))

  test("B-tree law violations reject; a healthy hand-built db parses") {
    val p1 = SqliteLake.leafPage(512, 100, Seq((1L, master(2L))))
    val leafGood = SqliteLake.leafPage(512, 0,
      Seq((1L, rec(7)), (2L, rec(-9))))
    val good = db(Seq(p1, leafGood))
    val parsed = SqliteLake.parseSqlite(good).get
    assert(parsed.tables == Seq(("t",
      Seq(SqliteLake.Rec(1, Seq(SqliteLake.Cell("int", Some(7), None, None))),
        SqliteLake.Rec(2, Seq(SqliteLake.Cell("int", Some(-9), None, None)))))))

    val cases: Seq[(String, Array[Byte])] = Seq(
      "rowids out of order in a leaf" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((2L, rec(7)), (1L, rec(-9)))))),
      "duplicate rowid" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((1L, rec(7)), (1L, rec(-9)))))),
      "interior-key law broken (key < subtree max)" -> db(Seq(
        SqliteLake.leafPage(512, 100, Seq((1L, master(2L)))),
        SqliteLake.interiorPage(512, Seq((3L, 1L)), 4L),
        SqliteLake.leafPage(512, 0, Seq((1L, rec(1)), (2L, rec(2)))),
        SqliteLake.leafPage(512, 0, Seq((3L, rec(3)))))),
      "interior cycle (child = root)" -> db(Seq(p1,
        SqliteLake.interiorPage(512, Seq((2L, 1L)), 2L))),
      "interior right-most cycle" -> db(Seq(p1,
        SqliteLake.interiorPage(512, Seq((3L, 1L)), 2L),
        SqliteLake.leafPage(512, 0, Seq((1L, rec(1)))))),
      "rootpage out of range" -> db(Seq(
        SqliteLake.leafPage(512, 100, Seq((1L, master(9L)))),
        leafGood)),
      "rootpage 1 (the master page)" -> db(Seq(
        SqliteLake.leafPage(512, 100, Seq((1L, master(1L)))),
        leafGood)),
      "master row is a view" -> db(Seq(
        SqliteLake.leafPage(512, 100, Seq((1L, SqliteLake.encRecord(Seq(
          SqliteLake.textSerial("view"), SqliteLake.textSerial("t"),
          SqliteLake.textSerial("t"), SqliteLake.intSerial(2L),
          SqliteLake.textSerial("CREATE VIEW t AS SELECT 1")))))),
        leafGood)),
      "duplicate table rootpage" -> db(Seq(
        SqliteLake.leafPage(512, 100, Seq(
          (1L, master(2L, "a")), (2L, master(2L, "b")))),
        leafGood)),
      "reserved serial type 10" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((1L,
          Array[Byte](2, 10)))))), // header len 2, stype 10, empty body
      "blob serial (even >= 12)" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((1L,
          Array[Byte](2, 14) ++ "x".getBytes("US-ASCII")))))),
      "record body under-consumed" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((1L,
          Array[Byte](2, 8) ++ Array[Byte](5)))))), // const-0 + stray byte
      "record header over-runs payload" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((1L, Array[Byte](9, 8)))))),
      "bad utf8 in text" -> db(Seq(p1,
        SqliteLake.leafPage(512, 0, Seq((1L,
          Array[Byte](2, 15) ++ Array[Byte](0xff.toByte)))))),
      // ADVICE r14: a cell whose payload extends past its own page must
      // not read into the sibling page (which here holds a record that
      // WOULD decode — the lie is only visible to the bound check)
      "leaf cell payload reads into sibling page" -> {
        val evil = new Array[Byte](512)
        evil(0) = 13
        evil(4) = 1 // one cell
        evil(5) = (510 >> 8).toByte; evil(6) = 510.toByte // contentStart
        evil(8) = (510 >> 8).toByte; evil(9) = 510.toByte // cell ptr
        evil(510) = 2 // plen varint: 2 payload bytes...
        evil(511) = 1 // rowid varint — payload would start in page 3
        val sibling = new Array[Byte](512)
        sibling(0) = 2; sibling(1) = 8 // a decodable record: int 0
        db(Seq(p1, evil, sibling))
      },
      // ADVICE r14: page 1 is sqlite_master — a docs-tree child pointer
      // back to it must reject even though visited is per-walk
      "interior child pointer back into page 1" -> db(Seq(
        SqliteLake.leafPage(512, 100, Seq((1L, master(2L)))),
        SqliteLake.interiorPage(512, Seq((1L, 1L)), 3L),
        SqliteLake.leafPage(512, 0, Seq((2L, rec(9)))))))
    cases.foreach { case (name, b) =>
      assert(SqliteLake.parseSqlite(b).isEmpty, name)
    }

    // healthy interior split over two leaves parses and orders rows
    val split = db(Seq(
      SqliteLake.leafPage(512, 100, Seq((1L, master(2L)))),
      SqliteLake.interiorPage(512, Seq((3L, 2L)), 4L),
      SqliteLake.leafPage(512, 0, Seq((1L, rec(1)), (2L, rec(2)))),
      SqliteLake.leafPage(512, 0, Seq((3L, rec(3))))))
    assert(SqliteLake.parseSqlite(split).get
      .tables.head._2.map(_.rowid) == Seq(1L, 2L, 3L))
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = SqliteLake.sqliteFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 7; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      SqliteLake.parseSqlite(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 23).foreach(n => SqliteLake.parseSqlite(s0.take(n)))
  }
}
