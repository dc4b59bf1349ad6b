package graft

import graft.operators.AvroLake

/** Avro container walk: fixture-law equality across both codecs,
  * strictness matrix over an independent spec-side encoder (header
  * map, schema subset, varints, block tiling, sync law), byte-flip
  * + truncation sweeps. */
class AvroLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = AvroLake.extractAvro(
      AvroLake.avroFixture(spark, 8), "id", "media")
      .orderBy("id", "blk", "rec", "fld").collect()
    assert(out.forall(_.getBoolean(11)))
    var k = 0
    (0 until 8).foreach { i =>
      var g = 0
      (0 until 2).foreach { b =>
        val nr = 2 + (i + b) % 3
        (0 until nr).foreach { r =>
          (0 until 5).foreach { f =>
            val row = out(k); k += 1
            assert(row.getLong(0) == i && row.getInt(1) == b &&
              row.getInt(2) == r && row.getInt(3) == f)
            assert(row.getString(9) == (if (i % 2 == 0) "null" else "deflate"))
            assert(row.getString(10) == "Doc")
            f match {
              case 0 => assert(row.getLong(6) == i * 1000L + g * 7L - 500L)
              case 1 => assert(row.getString(7) == s"rec-${(i + g) % 9}")
              case 2 => assert(row.getLong(6) == (i * 3 + g) % 100 - 50)
              case 3 => assert(row.getDouble(8) ==
                ((i * 13 + g * 7) % 1000) / 4.0)
              case 4 => assert(row.getLong(6) == (if ((i + g) % 2 == 0) 1 else 0))
            }
          }
          g += 1
        }
      }
    }
    assert(k == out.length)
  }

  // ------------------------------------------------------------------
  // independent mini-encoder (spec-side, NOT the fixture's)

  private def zz(v: Long): Array[Byte] = {
    var raw = (v << 1) ^ (v >> 63)
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var more = true
    while (more) {
      val x = (raw & 0x7f).toInt
      raw >>>= 7
      if (raw == 0) { out += x.toByte; more = false }
      else out += (x | 0x80).toByte
    }
    out.toArray
  }
  private def es(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8"); zz(b.length.toLong) ++ b
  }
  private val sync = Array.tabulate(16)(j => (j * 11 + 3).toByte)
  private def schema(fields: String): String =
    s"""{"type":"record","name":"R","fields":[$fields]}"""
  private def container(schemaJson: String, codec: Option[String],
      blocks: Seq[(Long, Array[Byte])], syncAt: Int => Array[Byte] = _ => sync,
      metaExtra: Array[Byte] = Array.emptyByteArray,
      metaCount: Long = Long.MinValue): Array[Byte] = {
    val entries = Seq(es("avro.schema") ++ es(schemaJson)) ++
      codec.map(cd => es("avro.codec") ++ es(cd)).toSeq
    val mc = if (metaCount != Long.MinValue) metaCount
      else entries.length.toLong
    "Obj".getBytes("US-ASCII") ++ Array[Byte](1) ++
      zz(mc) ++ entries.flatten ++ metaExtra ++ zz(0) ++ sync ++
      blocks.zipWithIndex.flatMap { case ((cnt, body), bi) =>
        zz(cnt) ++ zz(body.length.toLong) ++ body ++ syncAt(bi)
      }
  }
  private val oneLong = schema("""{"name":"v","type":"long"}""")

  test("independent encoder round-trip, both codecs, negative varints") {
    val body = zz(-1L) ++ zz(300L) ++ zz(0L)
    val f = AvroLake.parseAvro(
      container(oneLong, None, Seq((3L, body)))).get
    assert(f.codec == "null" && f.recName == "R" && f.nBlocks == 1)
    assert(f.cells.flatMap(_.lval) == Seq(-1L, 300L, 0L))
    // all five primitive types in one record
    val all5 = schema(
      """{"name":"k","type":"long"},{"name":"s","type":"string"},
        |{"name":"n","type":"int"},{"name":"d","type":"double"},
        |{"name":"b","type":"boolean"}""".stripMargin.replace("\n", ""))
    val bits = java.lang.Double.doubleToLongBits(2.5)
    val rec = zz(-42L) ++ es("hé") ++ zz(7L) ++
      Array.tabulate(8)(k => ((bits >> (8 * k)) & 0xff).toByte) ++
      Array[Byte](1)
    val f5 = AvroLake.parseAvro(container(all5, Some("null"),
      Seq((1L, rec)))).get
    assert(f5.cells.map(c => (c.lval, c.sval, c.dval)) == Seq(
      (Some(-42L), None, None), (None, Some("hé"), None),
      (Some(7L), None, None), (None, None, Some(2.5)),
      (Some(1L), None, None)))
  }

  test("strictness matrix: every container lie rejects, never throws") {
    val okBody = zz(5L)
    def ok = container(oneLong, Some("null"), Seq((1L, okBody)))
    assert(AvroLake.parseAvro(ok).nonEmpty)
    val cases: Seq[(String, Array[Byte])] = Seq(
      "bad magic" -> ok.patch(0, "Obk".getBytes("US-ASCII"), 3),
      "version byte 2" -> ok.patch(3, Array[Byte](2), 1),
      "unknown codec" ->
        container(oneLong, Some("snappy"), Seq((1L, okBody))),
      "missing avro.schema" -> {
        "Obj".getBytes("US-ASCII") ++ Array[Byte](1) ++ zz(1) ++
          es("avro.codec") ++ es("null") ++ zz(0) ++ sync ++
          zz(1) ++ zz(okBody.length.toLong) ++ okBody ++ sync
      },
      "negative metadata map count" ->
        container(oneLong, Some("null"), Seq((1L, okBody)), metaCount = -3L),
      "duplicate metadata key" -> {
        "Obj".getBytes("US-ASCII") ++ Array[Byte](1) ++ zz(2) ++
          es("avro.schema") ++ es(oneLong) ++
          es("avro.schema") ++ es(oneLong) ++ zz(0) ++ sync ++
          zz(1) ++ zz(okBody.length.toLong) ++ okBody ++ sync
      },
      "zero data blocks" -> container(oneLong, Some("null"), Seq()),
      "block count 0" -> container(oneLong, Some("null"), Seq((0L, okBody))),
      "record under-fills the block" ->
        container(oneLong, Some("null"), Seq((1L, zz(5L) ++ zz(6L)))),
      "record over-runs the block" ->
        container(oneLong, Some("null"), Seq((2L, okBody))),
      "sync mismatch" -> container(oneLong, Some("null"),
        Seq((1L, okBody)), syncAt = _ => sync.map(b => (b ^ 1).toByte)),
      "trailing garbage after last sync" ->
        (container(oneLong, Some("null"), Seq((1L, okBody))) ++
          Array[Byte](7)),
      "truncated mid-block" ->
        container(oneLong, Some("null"), Seq((1L, okBody))).dropRight(3),
      "boolean byte 2" -> container(
        schema("""{"name":"b","type":"boolean"}"""), Some("null"),
        Seq((1L, Array[Byte](2)))),
      "int out of i32 range" -> container(
        schema("""{"name":"n","type":"int"}"""), Some("null"),
        Seq((1L, zz(1L << 40)))),
      "NaN double" -> container(
        schema("""{"name":"d","type":"double"}"""), Some("null"),
        Seq((1L, {
          val bits = java.lang.Double.doubleToLongBits(Double.NaN)
          Array.tabulate(8)(k => ((bits >> (8 * k)) & 0xff).toByte)
        }))),
      "overlong varint (11 bytes)" -> container(oneLong, Some("null"),
        Seq((1L, Array.fill(10)(0x80.toByte) ++ Array[Byte](1)))),
      "control char in string" -> container(
        schema("""{"name":"s","type":"string"}"""), Some("null"),
        Seq((1L, zz(1) ++ Array[Byte](7)))),
      "deflate codec with stored bytes" -> container(oneLong,
        Some("deflate"), Seq((1L, okBody))))
    cases.foreach { case (name, b) =>
      assert(AvroLake.parseAvro(b).isEmpty, name)
    }
    assert(AvroLake.parseAvro(null).isEmpty)
    assert(AvroLake.parseAvro(Array.emptyByteArray).isEmpty)
  }

  test("schema subset: unions, nesting, duplicates, non-record reject") {
    val okBody = zz(5L)
    def withSchema(s: String) =
      AvroLake.parseAvro(container(s, Some("null"), Seq((1L, okBody))))
    assert(withSchema(oneLong).nonEmpty)
    val bad = Seq(
      "union field" -> schema("""{"name":"v","type":["null","long"]}"""),
      "nested record" -> schema(
        """{"name":"v","type":{"type":"record","name":"I","fields":[]}}"""),
      "unknown primitive" -> schema("""{"name":"v","type":"float"}"""),
      "duplicate field name" -> schema(
        """{"name":"v","type":"long"},{"name":"v","type":"int"}"""),
      "empty fields" -> schema(""),
      "empty field name" -> schema("""{"name":"","type":"long"}"""),
      "top-level enum" ->
        """{"type":"enum","name":"E","symbols":["A"]}""",
      "not JSON" -> "{type:record",
      "duplicate JSON key" ->
        """{"type":"record","type":"record","name":"R",
          |"fields":[{"name":"v","type":"long"}]}"""
          .stripMargin.replace("\n", ""),
      "trailing JSON content" -> (oneLong + "x"))
    bad.foreach { case (name, s) =>
      assert(withSchema(s).isEmpty, name)
    }
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = AvroLake.avroFixture(spark, 4).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 3; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      AvroLake.parseAvro(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 5).foreach(n => AvroLake.parseAvro(s0.take(n)))
  }
}
