package graft

import graft.operators.IcsLake

/** RFC 5545 walk: the unfolding law (mid-token folds), TEXT escapes,
  * datetime validation, strictness matrix, fixture-law equality,
  * byte-flip sweep. */
class IcsLakeSpec extends SparkSpec {

  private def cal(events: String): String =
    "BEGIN:VCALENDAR\r\nVERSION:2.0\r\nPRODID:-//t//EN\r\n" +
      events + "END:VCALENDAR\r\n"
  private def ev(props: String): String =
    "BEGIN:VEVENT\r\nUID:u1\r\nDTSTART:20240101T100000Z\r\n" +
      "DTEND:20240101T110000Z\r\n" + props + "END:VEVENT\r\n"
  private def parse(s: String) = IcsLake.parseIcs(s.getBytes("UTF-8"))

  test("unfolding reassembles mid-token folds; escapes decode") {
    val folded = cal(ev("SUMMARY:a longt\r\n oken b\r\n"))
    assert(parse(folded).get.head.summary == "a longtoken b")
    val tabFold = cal(ev("SUMMARY:x\r\n\ty\r\n"))
    assert(parse(tabFold).get.head.summary == "xy")
    val esc = cal(ev("SUMMARY:a\\, b\\; c\\\\d\\ne\r\n"))
    assert(parse(esc).get.head.summary == "a, b; c\\d\ne")
    val e = parse(cal(ev("SUMMARY:s\r\nCATEGORIES:A\\,B,C\r\n"))).get.head
    assert(e.nCategories == 2, "escaped comma is not a separator")
    assert(e.durS == 3600L)
  }

  test("strictness matrix: every violation rejects") {
    val rejects = Seq(
      "LF-only line endings" -> cal(ev("")).replace("\r\n", "\n"),
      "stray CR" -> cal(ev("SUMMARY:a\rb\r\n")),
      "no trailing CRLF" -> cal(ev("")).dropRight(2),
      "missing VERSION" -> cal(ev("")).replace("VERSION:2.0\r\n", ""),
      "version 1.0" -> cal(ev("")).replace("VERSION:2.0", "VERSION:1.0"),
      "unknown property" -> cal(ev("GEO:1;2\r\n")),
      "duplicate SUMMARY" -> cal(ev("SUMMARY:a\r\nSUMMARY:b\r\n")),
      "missing DTEND" -> cal(ev("SUMMARY:a\r\n")
        .replace("DTEND:20240101T110000Z\r\n", "")),
      "end before start" -> cal(ev("SUMMARY:a\r\n")
        .replace("DTEND:20240101T110000Z", "DTEND:20240101T090000Z")),
      "Feb 30" -> cal(ev("SUMMARY:a\r\n")
        .replace("DTSTART:20240101T100000Z", "DTSTART:20240230T100000Z")),
      "offset datetime" -> cal(ev("SUMMARY:a\r\n")
        .replace("DTSTART:20240101T100000Z", "DTSTART:20240101T100000+0100")),
      "raw semicolon in summary" -> cal(ev("SUMMARY:a;b\r\n")),
      "raw comma in summary" -> cal(ev("SUMMARY:a,b\r\n")),
      "unknown escape" -> cal(ev("SUMMARY:a\\qb\r\n")),
      "empty category" -> cal(ev("SUMMARY:a\r\nCATEGORIES:A,,B\r\n")),
      "event never closed" -> cal("BEGIN:VEVENT\r\nUID:u\r\n"),
      "trailing content after END" -> (cal(ev("SUMMARY:a\r\n")) + "X:y\r\n"),
      "empty calendar" -> cal(""))
    rejects.foreach { case (name, s) =>
      // several cases lack SUMMARY by construction; those must still
      // reject (SUMMARY is required), so no special-casing here
      assert(parse(s).isEmpty, name)
    }
    assert(IcsLake.parseIcs(null).isEmpty)
    assert(IcsLake.parseIcs(Array(0xc3.toByte, 0x28.toByte)).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = IcsLake.extractIcs(
      IcsLake.icsFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(10)))
    assert(out.length == (0 until 12).map(i => 2 + i % 3).sum)
    out.foreach { r =>
      val (i, k) = (r.getLong(0), r.getInt(1))
      def a(j: Long) = (i * 7 + k * 3 + j) % 10
      assert(r.getString(2) == s"ev-$i-$k@graft")
      assert(r.getLong(3) ==
        1704067200L + i * 86400L + k * 7200L + (i * 3 + k) % 60)
      assert(r.getLong(4) == 1800L + ((i + k) % 4) * 900L)
      val w = if (k % 3 == 2) s"x,y${a(2)}" else s"longe${a(2)}r"
      assert(r.getString(5) == s"e${a(0)} e${a(1)} $w e${a(3)}",
        s"summary ($i,$k) — unfolding law")
      if ((i + k) % 3 == 0) assert(r.getString(6) == s"Room R${(i + k) % 9}")
      else assert(r.isNullAt(6))
      assert(r.getInt(7) == (if (k % 2 == 0) 2 else 0))
      assert(r.getLong(9) == a(0) + a(1) + a(2) + a(3))
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = IcsLake.icsFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      IcsLake.parseIcs(c) // must not throw
    }
  }
}
