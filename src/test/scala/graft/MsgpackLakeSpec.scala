package graft

import graft.operators.MsgpackLake

/** MessagePack shard walk: fixture-law equality, the canonical
  * minimal-encoding law (every widened family rejects), int-family
  * sweep, strictness matrix, byte-flip + truncation sweeps. */
class MsgpackLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = MsgpackLake.extractMsgpack(
      MsgpackLake.msgpackFixture(spark, 12), "id", "media")
      .orderBy("id", "rec", "kidx").collect()
    assert(out.forall(_.getBoolean(9)))
    var k = 0
    (0 until 12).foreach { i =>
      (0 until 3 + i % 4).foreach { r =>
        val hasNil = (i + r) % 3 == 0
        val nk = if (hasNil) 6 else 5
        (0 until nk).foreach { ki =>
          val row = out(k); k += 1
          assert(row.getLong(0) == i && row.getInt(1) == r &&
            row.getInt(2) == ki && row.getInt(8) == nk)
          ki match {
            case 0 =>
              assert(row.getString(4) == "int" &&
                row.getLong(5) == MsgpackLake.fixtureIdVal(i, r))
            case 1 =>
              assert(row.getString(4) == "str" &&
                row.getString(6) == s"doc ${(i + r) % 7} body")
            case 2 =>
              assert(row.getString(4) == "float" &&
                row.getDouble(7) == ((i * 13 + r * 7) % 1000) / 4.0)
            case 3 =>
              assert(row.getString(4) == "bool" &&
                row.getLong(5) == (if ((i + r) % 2 == 0) 1 else 0))
            case 4 =>
              assert(row.getString(4) == "arr" && row.getLong(5) == r % 3)
              assert(row.getString(6) ==
                (0 until r % 3).map(j => s"t${(i + j) % 5}").mkString("|"))
            case 5 =>
              assert(row.getString(4) == "nil")
          }
        }
      }
    }
    assert(k == out.length)
  }

  test("the id law sweeps every integer family, both signs") {
    val enc = (for (i <- 0 until 12; r <- 0 until 7)
      yield MsgpackLake.encInt(MsgpackLake.fixtureIdVal(i, r)).head & 0xff)
      .toSet
    // positive fixint, uint16/32/64, negative families
    assert(enc.contains(0xcd) && enc.contains(0xce) && enc.contains(0xcf))
    assert(enc.exists(t => t <= 0x7f)) // positive fixint
    assert(enc.exists(t => Set(0xd1, 0xd2, 0xd3)(t)),
      s"negative families in $enc")
  }

  private def rec1(body: Array[Byte], nk: Int = 1): Array[Byte] =
    Array((0x80 + nk).toByte) ++ body

  test("canonical minimal-encoding law: widened families reject") {
    def kv(v: Array[Byte]) =
      rec1(MsgpackLake.encStr("k") ++ v)
    // 5 as uint8 / uint16 / uint32; -1 as int8; 300 as uint32
    val widened: Seq[(String, Array[Byte])] = Seq(
      "5 as uint8" -> Array[Byte](0xcc.toByte, 5),
      "5 as uint16" -> Array[Byte](0xcd.toByte, 0, 5),
      "200 as uint16" -> Array[Byte](0xcd.toByte, 0, 200.toByte),
      "5 as uint32" -> Array[Byte](0xce.toByte, 0, 0, 0, 5),
      "70000 as uint64" ->
        (Array(0xcf.toByte) ++ Array[Byte](0, 0, 0, 0, 0, 1, 0x11, 0x70)),
      "-1 as int8" -> Array[Byte](0xd0.toByte, 0xff.toByte),
      "-100 as int16" -> Array[Byte](0xd1.toByte, 0xff.toByte, 0x9c.toByte),
      "-200 as int32" ->
        (Array(0xd2.toByte) ++ Array[Byte](-1, -1, -1, 0x38)),
      "-40000 as int64" -> (Array(0xd3.toByte) ++
        Array[Byte](-1, -1, -1, -1, -1, -1, 0x63.toByte, 0x60)),
      "short string as str8" ->
        (Array[Byte](0xd9.toByte, 1) ++ "x".getBytes("UTF-8")),
      "map 3 as map16" -> (Array[Byte](0xde.toByte, 0, 3) ++
        MsgpackLake.encStr("a") ++ Array[Byte](1) ++
        MsgpackLake.encStr("b") ++ Array[Byte](2) ++
        MsgpackLake.encStr("c") ++ Array[Byte](3)).map(_.toByte))
    widened.foreach { case (name, v) =>
      val blob = if (name.startsWith("map")) v else kv(v)
      assert(MsgpackLake.parseMsgpack(blob).isEmpty, name)
    }
    // controls: the minimal forms of the same values parse
    assert(MsgpackLake.parseMsgpack(kv(MsgpackLake.encInt(5))).nonEmpty)
    assert(MsgpackLake.parseMsgpack(kv(MsgpackLake.encInt(-1))).nonEmpty)
    assert(MsgpackLake.parseMsgpack(kv(MsgpackLake.encInt(70000))).nonEmpty)
    assert(MsgpackLake.parseMsgpack(kv(MsgpackLake.encInt(-40000))).nonEmpty)
  }

  test("strictness matrix: structural lies reject, never throw") {
    val ok = rec1(MsgpackLake.encStr("k") ++ MsgpackLake.encInt(5))
    assert(MsgpackLake.parseMsgpack(ok).nonEmpty)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty blob" -> Array.emptyByteArray,
      "top-level non-map" -> MsgpackLake.encInt(5),
      "empty map" -> Array(0x80.toByte),
      "duplicate key" -> (Array(0x82.toByte) ++
        MsgpackLake.encStr("k") ++ MsgpackLake.encInt(1) ++
        MsgpackLake.encStr("k") ++ MsgpackLake.encInt(2)),
      "empty key" -> rec1(MsgpackLake.encStr("") ++ MsgpackLake.encInt(1)),
      "non-string key" -> rec1(MsgpackLake.encInt(1) ++ MsgpackLake.encInt(1)),
      "trailing partial record" -> (ok ++ Array(0x81.toByte)),
      "truncated string body" ->
        rec1(MsgpackLake.encStr("k") ++ Array(0xa5.toByte, 'x'.toByte)),
      "bin8 out of subset" ->
        rec1(MsgpackLake.encStr("k") ++ Array[Byte](0xc4.toByte, 1, 7)),
      "ext out of subset" ->
        rec1(MsgpackLake.encStr("k") ++ Array[Byte](0xd4.toByte, 1, 7)),
      "float32 out of subset" ->
        rec1(MsgpackLake.encStr("k") ++ Array[Byte](0xca.toByte, 0x40, 0x40, 0, 0)),
      "NaN float64" -> rec1(MsgpackLake.encStr("k") ++
        (Array(0xcb.toByte) ++ Array.tabulate[Byte](8)(j =>
          (java.lang.Double.doubleToLongBits(Double.NaN) >>
            (8 * (7 - j))).toByte))),
      "nested map value" -> rec1(MsgpackLake.encStr("k") ++
        rec1(MsgpackLake.encStr("x") ++ MsgpackLake.encInt(1))),
      "array of non-strings" -> rec1(MsgpackLake.encStr("k") ++
        Array(0x91.toByte) ++ MsgpackLake.encInt(1)),
      "uint64 above signed range" -> rec1(MsgpackLake.encStr("k") ++
        (Array(0xcf.toByte) ++ Array.fill[Byte](8)(0xff.toByte))),
      "control char in string" -> rec1(MsgpackLake.encStr("k") ++
        Array(0xa1.toByte, 0x07.toByte)),
      "bad utf8" -> rec1(MsgpackLake.encStr("k") ++
        Array(0xa1.toByte, 0xff.toByte)))
    cases.foreach { case (name, b) =>
      assert(MsgpackLake.parseMsgpack(b).isEmpty, name)
    }
    assert(MsgpackLake.parseMsgpack(null).isEmpty)
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = MsgpackLake.msgpackFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      MsgpackLake.parseMsgpack(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => MsgpackLake.parseMsgpack(s0.take(n)))
  }
}
