package graft

import graft.operators.TomlLake

/** TOML walk: fixture-law equality, the basic-vs-literal string
  * distinction, the no-leading-zero law, float ×100 exactness,
  * strictness matrix, byte-flip + truncation sweeps. */
class TomlLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = TomlLake.extractToml(
      TomlLake.tomlFixture(spark, 12), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(9)))
    var k = 0
    (0 until 12).foreach { i =>
      val nt = 1 + i % 2
      (0 until 5 + 3 * nt).foreach { s =>
        val r = out(k); k += 1
        assert(r.getLong(0) == i && r.getInt(1) == s)
        s match {
          case 0 =>
            assert(r.getString(2) == "" && r.getString(3) == "title")
            assert(r.getString(6) == s"cfg é${i % 7}")
          case 1 => assert(r.getLong(5) == 8000 + i)
          case 2 => assert(r.getLong(5) == (if (i % 2 == 0) 1 else 0))
          case 3 =>
            assert(r.getString(4) == "float" &&
              r.getLong(7) == ((i * 13) % 90 + 1) * 100L + (i * 7) % 100)
          case 4 =>
            assert(r.getLong(5) ==
              (if (i % 2 == 0) 1 else -1) * ((i * 3L) % 1000))
          case s =>
            val t = (s - 5) / 3
            assert(r.getString(2) == s"srv$t")
            (s - 5) % 3 match {
              case 0 => // literal string: the backslash is DATA
                assert(r.getString(6) == s"h${i + t}\\example")
              case 1 => assert(r.getLong(5) == 1 + (i + t) % 8)
              case 2 =>
                val arr = (0 until (i + t) % 4).map(j => (i * 5 + t + j) % 100)
                assert(r.getInt(8) == arr.length &&
                  r.getLong(5) == arr.sum)
            }
        }
      }
    }
    assert(k == out.length)
  }

  private def parse(s: String) = TomlLake.parseToml(s.getBytes("UTF-8"))

  test("string semantics: basic escapes decode, literal keeps bytes") {
    val es = parse("""k = "a\tbA\"q\\" """).get.head
    assert(es.sval.contains("a\tbA\"q\\"))
    val ls = parse("""k = 'a\tbA'""").get.head
    assert(ls.sval.contains("""a\tbA"""), "literal string is raw")
  }

  test("strictness matrix: every lexical lie rejects, never throws") {
    assert(parse("k = 1").nonEmpty)
    val cases: Seq[(String, String)] = Seq(
      "leading zero int" -> "k = 01",
      "leading zero negative" -> "k = -012",
      "underscore int out of subset" -> "k = 1_000",
      "exponent float out of subset" -> "k = 1e3",
      "three decimals" -> "k = 1.234",
      "bare decimal point" -> "k = 1.",
      "date out of subset" -> "k = 1979-05-27",
      "dotted key out of subset" -> "a.b = 1",
      "quoted key out of subset" -> "\"a\" = 1",
      "duplicate key" -> "k = 1\nk = 2",
      "duplicate key in table" -> "[t]\nk = 1\nk = 2",
      "duplicate table" -> "[t]\na = 1\n[t]\nb = 2",
      "trailing garbage after value" -> "k = 1 2",
      "missing equals" -> "k 1",
      "unterminated basic string" -> "k = \"abc",
      "unterminated literal string" -> "k = 'abc",
      "raw control in string" -> "k = \"a\tb\"",
      "unknown escape" -> "k = \"a\\x41\"",
      "nested array out of subset" -> "k = [[1]]",
      "string array out of subset" -> "k = [\"a\"]",
      "array missing comma" -> "k = [1 2]",
      "unclosed table header" -> "[t\nk = 1",
      "empty document" -> "# only a comment\n",
      "18-quintillion overflow" -> ("k = " + "9" * 19),
      // overflow in derived values must reject, never wrap (ADVICE r14)
      "float x100 wraps Long" -> ("k = " + "9" * 18 + ".5"),
      "negative float x100 wraps Long" -> ("k = -" + "9" * 18 + ".5"),
      "array sum wraps Long" ->
        ("k = [" + Seq.fill(10)("9" * 18).mkString(", ") + "]"),
      // lone UTF-16 surrogate escape is not a scalar value (ADVICE r14)
      "surrogate escape low bound" -> "k = \"a\\uD800b\"",
      "surrogate escape high bound" -> "k = \"a\\uDFFFb\"")
    cases.foreach { case (name, s) =>
      assert(parse(s).isEmpty, name)
    }
    assert(TomlLake.parseToml(null).isEmpty)
    // duplicate key names in DIFFERENT tables are fine
    assert(parse("[a]\nk = 1\n[b]\nk = 2").nonEmpty)
    // comments + blank lines + tabs as whitespace are fine
    assert(parse("\n# c\n\tk\t=\t5\t# d\n").get.head.lval.contains(5L))
    // negative float with zero integer part keeps its sign
    assert(parse("k = -0.25").get.head.fx100.contains(-25L))
    // one-decimal floats scale exactly
    assert(parse("k = 3.5").get.head.fx100.contains(350L))
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = TomlLake.tomlFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      TomlLake.parseToml(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => TomlLake.parseToml(s0.take(n)))
  }
}
