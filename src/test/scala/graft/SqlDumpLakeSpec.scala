package graft

import graft.operators.SqlDumpLake
import graft.operators.SqlDumpLake._

/** SQL dump walk: quote-aware splitting, escape decode, the
  * cross-statement column-list law, strictness matrix, fixture-law
  * equality, byte-flip sweep. */
class SqlDumpLakeSpec extends SparkSpec {

  private def parse(s: String) = SqlDumpLake.parseDump(s.getBytes("UTF-8"))
  private val create =
    "CREATE TABLE `t` (`id` bigint NOT NULL, `name` varchar(80), " +
      "`price` decimal(10,2));\n"
  private def ins(values: String): String =
    s"INSERT INTO `t` (`id`, `name`, `price`) VALUES $values;\n"

  test("hand-written dumps: splitting, escapes, types") {
    val (tbl, cols, rows) = parse("-- c\n" + create +
      ins("(1,'a;b',3.50),(2,'it''s',NULL)") +
      ins("(-7,'x\\'y\\\\z\\nw',0.05)")).get
    assert(tbl == "t" && cols == Vector("id", "name", "price"))
    assert(rows.size == 3)
    assert(rows(0).values == Vector(SqlInt(1), SqlStr("a;b"), SqlDec(350)),
      "a ; inside a string is data, not a terminator")
    assert(rows(1).values == Vector(SqlInt(2), SqlStr("it's"), SqlNull))
    assert(rows(2).values ==
      Vector(SqlInt(-7), SqlStr("x'y\\z\nw"), SqlDec(5)))
  }

  test("strictness matrix: every violation rejects") {
    val rejects = Seq(
      "no CREATE" -> ins("(1,'a',1.00)"),
      "no INSERT rows" -> create,
      "insert into another table" ->
        (create + ins("(1,'a',1.00)").replace("INTO `t`", "INTO `u`")),
      "column list disagrees (cross-statement law)" ->
        (create + ins("(1,'a',1.00)").replace("`name`", "`nom`")),
      "column order swapped" ->
        (create + ins("(1,'a',1.00)")
          .replace("(`id`, `name`, `price`)", "(`name`, `id`, `price`)")),
      "arity mismatch" -> (create + ins("(1,'a')")),
      "three-decimal price" -> (create + ins("(1,'a',1.234)")),
      "unterminated string" -> (create + "INSERT INTO `t` (`id`, `name`, " +
        "`price`) VALUES (1,'a,1.00);\n"),
      "unknown escape" -> (create + ins("(1,'a\\qb',1.00)")),
      "duplicate CREATE column" ->
        (create.replace("`name` varchar(80)", "`id` varchar(80)") +
          ins("(1,'a',1.00)")),
      "column without type" ->
        (create.replace("`name` varchar(80)", "`name`") +
          ins("(1,'a',1.00)")),
      "unknown statement" ->
        (create + "ALTER TABLE `t` ADD `x` int;\n" + ins("(1,'a',1.00)")),
      "junk after final ;" -> (create + ins("(1,'a',1.00)") + "trailing"),
      "empty tuple" -> (create + ins("()")),
      "bare word value" -> (create + ins("(1,abc,1.00)")))
    rejects.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
    assert(SqlDumpLake.parseDump(null).isEmpty)
    assert(SqlDumpLake.parseDump(Array(0xc3.toByte, 0x28.toByte)).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = SqlDumpLake.extractSqlDump(
      SqlDumpLake.sqlDumpFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(7)))
    out.foreach { r =>
      val (i, st, t) = (r.getLong(0), r.getInt(2), r.getInt(3))
      def d(j: Long) = (i * 7 + st * 3 + t * 5 + j) % 10
      assert(r.getString(1) == s"t${i % 5}")
      assert(r.getLong(4) == i * 100 + st * 10 + t)
      val wantName =
        if (t % 4 == 3) s"a;b${d(0)}"
        else if (t % 3 == 2) s"it's${d(0)}"
        else s"n${d(0)}x${d(1)}"
      assert(r.getString(5) == wantName, s"name ($i,$st,$t)")
      if ((i + st + t) % 5 == 4) assert(r.isNullAt(6))
      else assert(r.getLong(6) == i * 31 + st * 7 + t * 3)
    }
    assert(out.length ==
      (0 until 12).map(i => (0 until 2 + i % 2)
        .map(st => 2 + (i + st) % 3).sum).sum)
  }

  test("byte-flip sweep never throws") {
    val seeds = SqlDumpLake.sqlDumpFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      SqlDumpLake.parseDump(c) // must not throw
    }
  }
}
