package graft

import graft.operators.ProtoLake

/** Protobuf wire census: fixture-law equality (varint size sweep),
  * minimal-encoding + overflow laws, wire-type matrix, byte-flip +
  * truncation sweeps. */
class ProtoLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = ProtoLake.extractProto(
      ProtoLake.protoFixture(spark, 12), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(7)))
    var k = 0
    (0 until 12).foreach { i =>
      val nf = 4 + i % 3
      (0 until nf).foreach { s =>
        val r = out(k); k += 1
        assert(r.getLong(0) == i && r.getInt(1) == s)
        s match {
          case 0 =>
            assert(r.getInt(2) == 1 && r.getInt(3) == 0)
            assert(r.getLong(4) == (i * 97L + 13L) << (4 * (i % 8)))
          case 1 =>
            assert(r.getInt(2) == 2 && r.getInt(3) == 2)
            assert(r.getLong(5) == 10 &&
              r.getString(6) == s"msg ${i % 7} of ${i % 5}")
          case 2 =>
            assert(r.getInt(2) == 3 && r.getInt(3) == 5)
            assert(r.getLong(4) == i * 1000L + 7L)
          case 3 =>
            assert(r.getInt(2) == 4 && r.getInt(3) == 1)
            assert(r.getLong(4) == i * 1000000000L + 3L)
          case s =>
            val j = s - 4
            assert(r.getInt(2) == 5 && r.getInt(3) == 2)
            assert(r.getLong(5) == 3 + j)
            assert(r.getLong(4) ==
              (0 until 3 + j).map(x => 128L + (i + j + x) % 64).sum)
            assert(r.isNullAt(6)) // non-printable: no sval
        }
      }
    }
    assert(k == out.length)
  }

  test("the varint size sweep really covers 1..6 byte encodings") {
    val sizes = (0 until 12)
      .map(i => ProtoLake.vint((i * 97L + 13L) << (4 * (i % 8))).length)
      .toSet
    assert(Set(1, 2, 3, 4, 5, 6).subsetOf(sizes), s"got $sizes")
    // the 10-byte (negative) form is pinned in the strictness test
  }

  test("strictness matrix: every wire lie rejects, never throws") {
    def p(b: Array[Byte]) = ProtoLake.parseProto(b)
    val ok = ProtoLake.vint(8) ++ ProtoLake.vint(5) // field 1 varint 5
    assert(p(ok).nonEmpty)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty blob" -> Array.emptyByteArray,
      "field number 0" -> (ProtoLake.vint(0) ++ ProtoLake.vint(5)),
      "group start (wire 3)" -> ProtoLake.vint((1L << 3) | 3),
      "group end (wire 4)" -> ProtoLake.vint((1L << 3) | 4),
      "reserved wire 6" -> ProtoLake.vint((1L << 3) | 6),
      "reserved wire 7" -> ProtoLake.vint((1L << 3) | 7),
      "overlong varint (5 as two bytes)" ->
        (ProtoLake.vint(8) ++ Array[Byte](0x85.toByte, 0x00)),
      "11-byte varint" -> (ProtoLake.vint(8) ++
        Array.fill[Byte](10)(0x80.toByte) ++ Array[Byte](1)),
      "65-bit varint (10th byte bit 1)" -> (ProtoLake.vint(8) ++
        Array.fill[Byte](9)(0x81.toByte) ++ Array[Byte](2)),
      "truncated varint" -> (ProtoLake.vint(8) ++ Array[Byte](0x85.toByte)),
      "truncated fixed64" -> (ProtoLake.vint((4L << 3) | 1) ++
        Array[Byte](1, 2, 3)),
      "truncated fixed32" -> (ProtoLake.vint((3L << 3) | 5) ++
        Array[Byte](1)),
      "LEN overruns blob" -> (ProtoLake.vint((2L << 3) | 2) ++
        ProtoLake.vint(100) ++ Array[Byte](1, 2)),
      "trailing half tag" -> (ok ++ Array[Byte](0x80.toByte)))
    cases.foreach { case (name, b) =>
      assert(p(b).isEmpty, name)
    }
    assert(p(null).isEmpty)
    // a full 64-bit varint (10 bytes, 10th byte 0x01) parses and
    // reinterprets as a signed long, as protobuf itself does
    val neg = ProtoLake.vint(8) ++
      Array.fill[Byte](9)(0xff.toByte) ++ Array[Byte](1)
    assert(p(neg).get.head.lval.contains(-1L))
    // printable LEN payload classifies as text; 0x80 bytes as bytes
    val txt = ProtoLake.vint((7L << 3) | 2) ++ ProtoLake.vint(2) ++
      "hi".getBytes("US-ASCII")
    assert(p(txt).get.head.sval.contains("hi"))
    val bin = ProtoLake.vint((7L << 3) | 2) ++ ProtoLake.vint(2) ++
      Array[Byte](0x80.toByte, 0x81.toByte)
    val f = p(bin).get.head
    assert(f.sval.isEmpty && f.lval.contains(0x80L + 0x81L))
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = ProtoLake.protoFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      ProtoLake.parseProto(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => ProtoLake.parseProto(s0.take(n)))
  }
}
