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
    // whole-input budget (ADVICE r18): oversized raw, line floods and
    // unbounded per-blob row fan-out all reject instead of decoding
    assert(TomlLake.parseToml(new Array[Byte]((1 << 20) + 1)).isEmpty,
      "raw over 1 MiB")
    assert(parse("k = 1\n" + "\n" * 8192).isEmpty, "line flood")
    assert(parse((0 until 2049).map(j => s"k$j = $j").mkString("\n"))
      .isEmpty, "entry-count flood")
    assert(parse((0 until 2048).map(j => s"k$j = $j").mkString("\n"))
      .nonEmpty, "2048 entries is the last admissible count")
    // duplicate key names in DIFFERENT tables are fine
    assert(parse("[a]\nk = 1\n[b]\nk = 2").nonEmpty)
    // comments + blank lines + tabs as whitespace are fine
    assert(parse("\n# c\n\tk\t=\t5\t# d\n").get.head.lval.contains(5L))
    // negative float with zero integer part keeps its sign
    assert(parse("k = -0.25").get.head.fx100.contains(-25L))
    // one-decimal floats scale exactly
    assert(parse("k = 3.5").get.head.fx100.contains(350L))
  }

  test("dotted headers, string arrays, arrays of tables") {
    import graft.operators.TomlLake.TomlEntry
    // dotted headers, with the spec's whitespace-around-dots freedom
    assert(parse("[a.b]\nk = 1").get.head.tbl == "a.b")
    assert(parse("[ a . b ]\nk = 1").get.head.tbl == "a.b")
    // super/sub table orders both legal (distinct full paths)
    assert(parse("[a]\nk = 1\n[a.b]\nk = 2").nonEmpty)
    assert(parse("[a.b]\nk = 1\n[a]\nk = 2").nonEmpty)
    // string arrays: both quote styles, escapes, commas inside values
    val sa = parse("k = [\"a,x\", 'b\\c', \"\\u00E9\"]").get.head
    assert(sa.kind == "sarr" && sa.arrN.contains(3) &&
      sa.sval.contains(Seq("a,x", "b\\c", "\u00E9")
        .mkString(TomlLake.SarrSep)))
    // the empty [] stays the untyped integer census
    val ea = parse("k = []").get.head
    assert(ea.kind == "arr" && ea.arrN.contains(0) && ea.lval.contains(0L))
    // arrays of tables: each [[x]] appends an element at x.<idx>;
    // duplicate key NAMES across elements are distinct paths
    assert(parse("[[x]]\nk = 1\n[[x]]\nk = 2\n").get.map(e =>
      (e.tbl, e.key, e.lval.get)) ==
      Seq(("x.0", "k", 1L), ("x.1", "k", 2L)))
    assert(parse("[[a.b]]\nk = 1").get.head.tbl == "a.b.0")
    // strictness: the TOML kind-conflict laws reject, never guess
    val rejects = Seq(
      "key names an existing table" -> "[a.b]\nx = 1\n[a]\nb = 2",
      "table names an existing key" -> "[a]\nb = 1\n[a.b]\nc = 2",
      "header under a root key" -> "a = 1\n[a.b]\nc = 2",
      "[x] after [[x]]" -> "[[x]]\nk = 1\n[x]\nk = 2",
      "[[x]] after [x]" -> "[x]\nk = 1\n[[x]]\nk = 2",
      "subtable of an AoT element" -> "[[x]]\nk = 1\n[x.sub]\nk = 2",
      "nested AoT under an AoT" -> "[[x]]\nk = 1\n[[x.y]]\nk = 2",
      "AoT names an existing key" -> "a = 1\n[[a]]\nk = 1",
      "duplicate key within one element" -> "[[x]]\nk = 1\nk = 2",
      "mixed array str then int" -> "k = [\"a\", 1]",
      "mixed array int then str" -> "k = [1, \"a\"]",
      "space between AoT brackets" -> "[ [x]]\nk = 1",
      "unclosed AoT header" -> "[[x]\nk = 1",
      "nine header segments" -> "[a.b.c.d.e.f.g.h.i]\nk = 1",
      "empty header segment" -> "[a..b]\nk = 1")
    rejects.foreach { case (name, s) =>
      assert(parse(s).isEmpty, name)
    }
  }

  test("pyproject fixture law: every doc decodes to the law rows") {
    val out = TomlLake.extractToml(
      TomlLake.pyprojectFixture(spark, 40), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(9)))
    (0 until 40).foreach { i =>
      val mine = out.filter(_.getLong(0) == i)
      val nb = 1 + i % 2
      assert(mine.length == 6 + 2 * nb, s"doc $i row count")
      assert(mine(0).getString(3) == "title" &&
        mine(0).getString(6) == s"pkg é${i % 7}")
      assert(mine(1).getString(2) == "project" &&
        mine(1).getString(6) == "p" + i % 5)
      assert(mine(2).getString(6) == s"${i % 3}.${i % 10}" &&
        mine(2).getString(4) == "str", "version stays a string")
      val deps = mine(3)
      if (i % 3 == 0)
        assert(deps.getString(4) == "arr" && deps.getInt(8) == 0)
      else {
        assert(deps.getString(4) == "sarr" && deps.getInt(8) == i % 3)
        assert(deps.getString(6) == (0 until i % 3)
          .map(j => "lib" + (i + j) % 6).mkString(TomlLake.SarrSep))
      }
      assert(mine(4).getString(2) == "tool.fmt" &&
        mine(4).getLong(5) == 80 + i % 40)
      assert(mine(5).getLong(5) == (if (i % 2 == 0) 1 else 0))
      (0 until nb).foreach { t =>
        assert(mine(6 + 2 * t).getString(2) == s"bin.$t" &&
          mine(6 + 2 * t).getString(6) == "b" + (i + t) % 5)
        assert(mine(7 + 2 * t).getLong(5) == (3 * i + 7 * t) % 50)
      }
    }
  }

  test("hugo front matter: fence splitting, composition, fixture law") {
    import TomlLake.{Fm, NoFm, BadFm}
    assert(TomlLake.frontMatterToml("plain text\n".getBytes("UTF-8")) == NoFm)
    assert(TomlLake.frontMatterToml("+++\na = 1\n".getBytes("UTF-8")) == BadFm)
    assert(TomlLake.frontMatterToml(null) == BadFm)
    // a YAML fence is NOT a TOML fence (and vice versa)
    assert(TomlLake.frontMatterToml("---\na: 1\n---\n".getBytes("UTF-8")) == NoFm)
    TomlLake.frontMatterToml("+++\na = 1\n+++\nbody +++ text\n"
      .getBytes("UTF-8")) match {
      case Fm(t) =>
        assert(TomlLake.parseToml(t).get.head.lval.contains(1L))
      case other => fail(s"expected Fm, got $other")
    }
    // an INLINE value containing +++ cannot open/close a fence; the
    // fence must be the whole line
    assert(TomlLake.frontMatterToml("+++\nk = '+++x'\n+++\nb\n"
      .getBytes("UTF-8")).isInstanceOf[Fm])
    // the q247 law, restated independently for every doc
    val rows = TomlLake.extractFrontMatterToml(
      TomlLake.hugoFixture(spark, 40), "id", "media")
      .orderBy("id", "seq").collect()
    (0 until 40).foreach { i =>
      val mine = rows.filter(_.getLong(0) == i)
      if (i % 5 == 4) {
        assert(mine.length == 1 && !mine(0).getBoolean(9) &&
          mine(0).getBoolean(10), s"doc $i: expected a no-fm row")
      } else {
        assert(mine.length == 6, s"doc $i row count")
        assert(mine.forall(r => r.getBoolean(9) && r.getBoolean(10)))
        assert(mine(0).getString(6) == s"Post é${i % 7}")
        assert(mine(1).getLong(5) == 10 + i % 20)
        assert(mine(2).getLong(5) == (if (i % 3 == 0) 1 else 0))
        assert(mine(3).getString(4) == "sarr" &&
          mine(3).getInt(8) == 1 + i % 2 &&
          mine(3).getString(6) == (0 until 1 + i % 2)
            .map(j => "t" + (i + j) % 4).mkString(TomlLake.SarrSep))
        assert(mine(4).getString(2) == "params" &&
          mine(4).getString(6) == "a" + i % 6)
        assert(mine(5).getLong(7) == (1 + i % 4) * 100L + (9 * i) % 100)
      }
    }
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = TomlLake.tomlFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1)) ++
      Seq(2, 5).map(TomlLake.pyprojectDoc) ++ // dotted/AoT/sarr paths
      Seq(1, 3).map(TomlLake.hugoDoc) // fence + composition paths
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      TomlLake.parseToml(c) // must not throw
      TomlLake.frontMatterToml(c)
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach { n =>
      TomlLake.parseToml(s0.take(n))
      TomlLake.frontMatterToml(s0.take(n))
    }
  }
}
