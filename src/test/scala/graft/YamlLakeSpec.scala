package graft

import graft.operators.YamlLake
import graft.operators.YamlLake.YamlEntry

/** YAML subset lake: the fixture law replayed in Scala against every
  * fixture doc, hand-pinned minimal documents for the byte/indent
  * conventions, a strictness matrix (every resolution-ambiguous word,
  * every out-of-subset construct), the trailing-comment law, both
  * block-sequence indent styles, front-matter composition over the
  * Markdown fixture, and byte-flip/truncation sweeps. */
class YamlLakeSpec extends SparkSpec {

  private def parse(s: String): Option[Seq[YamlEntry]] =
    YamlLake.parseYaml(s.getBytes("UTF-8"))

  // the fixture law, restated independently (multiset reference —
  // built with Seq, not Set, per the triangle-count lesson)
  private def lawRows(i: Int): Seq[YamlEntry] = {
    def e(path: String, kind: String, lval: Long = -1, sval: String = null,
        fx100: Long = -1, arrN: Int = -1): YamlEntry =
      YamlEntry(path, kind,
        if (lval == -1) None else Some(lval),
        Option(sval),
        if (fx100 == -1) None else Some(fx100),
        if (arrN == -1) None else Some(arrN))
    val na = i % 4
    val ns = 1 + i % 3
    val born = java.time.LocalDate.of(2024, 1 + i % 12, 1 + (i * 3) % 28)
      .toEpochDay * 86400L
    Seq(
      e("title", "str", sval = "doc \u00E9" + i % 7),
      e("count", "int", lval = 100 + i),
      e("active", "bool", lval = if (i % 2 == 0) 1 else 0),
      e("score", "float", fx100 = ((i * 13) % 90 + 1) * 100L + (i * 7) % 100),
      e("note", "str", sval = "plain text " + i % 5),
      e("empty", "null"),
      e("born", "date", lval = born),
      e("ids", "seq", arrN = na)) ++
      (0 until na).map(j => e("ids." + j, "int", lval = (i * 5 + j) % 100)) ++
      Seq(
        e("meta.owner", "str", sval = "it's t" + i % 6),
        e("meta.level", "int", lval = 1 + i % 5),
        e("steps", "seq", arrN = ns)) ++
      (0 until ns).map { j =>
        if ((i + j) % 2 == 0) e("steps." + j, "int", lval = (i * 3 + j) % 50)
        else e("steps." + j, "str", sval = "s" + (i + j) % 10)
      } ++
      Seq(
        e("build.env.os", "str", sval = "linux" + i % 3),
        e("build.env.jobs", "int", lval = 2 + i % 4))
  }

  test("fixture law: every doc decodes to exactly the law rows") {
    val docs = YamlLake.yamlFixture(spark, 40).orderBy("id").collect()
    assert(docs.length == 40)
    docs.foreach { r =>
      val i = r.getLong(0).toInt
      val got = YamlLake.parseYaml(r.getAs[Array[Byte]](1))
      assert(got.nonEmpty, s"doc $i failed to parse")
      assert(got.get == lawRows(i), s"doc $i rows differ from the law")
    }
  }

  test("hand-pinned minimal documents") {
    // scalar resolutions, both null forms, date, signed ints, floats
    val r = parse(
      "a: 7\nb: -42\nc: +9\nd: 3.5\ne: -0.25\nf: true\ng: false\n" +
        "h: null\nk: ~\nm: 2024-02-29\nn: v1 beta\n").get
    assert(r == Seq(
      YamlEntry("a", "int", Some(7L), None, None, None),
      YamlEntry("b", "int", Some(-42L), None, None, None),
      YamlEntry("c", "int", Some(9L), None, None, None),
      YamlEntry("d", "float", None, None, Some(350L), None),
      YamlEntry("e", "float", None, None, Some(-25L), None),
      YamlEntry("f", "bool", Some(1L), None, None, None),
      YamlEntry("g", "bool", Some(0L), None, None, None),
      YamlEntry("h", "null", None, None, None, None),
      YamlEntry("k", "null", None, None, None, None),
      YamlEntry("m", "date", Some(19782L * 86400), None, None, None),
      YamlEntry("n", "str", None, Some("v1 beta"), None, None)))
    // quoted scalars: escapes, the '' law, delimiters as data
    val q = parse(
      "a: \"x \\\"y\\\" \\u00E9 \\n z\"\nb: 'it''s, [ok]: fine'\n").get
    assert(q(0).sval.contains("x \"y\" \u00E9 \n z"))
    assert(q(1).sval.contains("it's, [ok]: fine"))
    // flow sequence: mixed scalar kinds, quoted elements with commas
    val f = parse("xs: [1, a2, \"q, r\", 2.5, true]\nempty: []\n").get
    assert(f == Seq(
      YamlEntry("xs", "seq", None, None, None, Some(5)),
      YamlEntry("xs.0", "int", Some(1L), None, None, None),
      YamlEntry("xs.1", "str", None, Some("a2"), None, None),
      YamlEntry("xs.2", "str", None, Some("q, r"), None, None),
      YamlEntry("xs.3", "float", None, None, Some(250L), None),
      YamlEntry("xs.4", "bool", Some(1L), None, None, None),
      YamlEntry("empty", "seq", None, None, None, Some(0))))
    // document start marker + comments everywhere
    assert(parse("# c\n---\n# c2\na: 1 # c3\n  # c4\n").get ==
      Seq(YamlEntry("a", "int", Some(1L), None, None, None)))
  }

  test("both block-sequence indent styles parse to identical rows") {
    val deeper = parse("k:\n  - 1\n  - b\nz: 2\n").get
    val same = parse("k:\n- 1\n- b\nz: 2\n").get
    assert(deeper == same)
    assert(deeper == Seq(
      YamlEntry("k", "seq", None, None, None, Some(2)),
      YamlEntry("k.0", "int", Some(1L), None, None, None),
      YamlEntry("k.1", "str", None, Some("b"), None, None),
      YamlEntry("z", "int", Some(2L), None, None, None)))
    // nested mapping depth-3 and a sequence under a nested key
    val n = parse("a:\n  b:\n    c: 1\n  d:\n    - x\nq: 2\n").get
    assert(n == Seq(
      YamlEntry("a.b.c", "int", Some(1L), None, None, None),
      YamlEntry("a.d", "seq", None, None, None, Some(1)),
      YamlEntry("a.d.0", "str", None, Some("x"), None, None),
      YamlEntry("q", "int", Some(2L), None, None, None)))
  }

  test("strictness: every out-of-subset construct rejects") {
    val cases = Seq(
      "tab indent" -> "a: 1\n\tb: 2\n",
      "tab in scalar" -> "a: x\ty\n",
      "CR line break" -> "a: 1\r\nb: 2\n",
      "no space after colon" -> "a:1\n",
      "duplicate key" -> "a: 1\na: 2\n",
      "duplicate nested key" -> "m:\n  a: 1\n  a: 2\n",
      "undefined alias" -> "a: *x\n",
      "tag" -> "a: !!int 1\n",
      "nested flow" -> "a: [[1], 2]\n",
      "flow map in flow seq" -> "a: [{x: 1}]\n",
      "directive" -> "%YAML 1.2\na: 1\n",
      "second doc marker" -> "a: 1\n---\nb: 2\n",
      "doc end marker" -> "a: 1\n...\n",
      "ambiguous yes" -> "a: yes\n",
      "ambiguous Off" -> "a: Off\n",
      "ambiguous True" -> "a: True\n",
      "ambiguous NULL" -> "a: NULL\n",
      "ambiguous None" -> "a: None\n",
      "ambiguous nan" -> "a: nan\n",
      "ambiguous Infinity" -> "a: Infinity\n",
      "leading-zero int" -> "a: 007\n",
      "hex int" -> "a: 0x1F\n",
      "exponent float" -> "a: 1e5\n",
      "three decimals" -> "a: 1.234\n",
      "float x100 overflow" -> "a: 999999999999999999.99\n",
      "negative float x100 overflow" -> "a: -999999999999999999.99\n",
      "dotted version" -> "a: 1.2.3\n",
      "bad calendar date" -> "a: 2024-13-01\n",
      "trailing junk after int" -> "a: 5#x\n",
      "comment without space" -> "a: 1# c\n",
      "unterminated dquote" -> "a: \"x\n",
      "unterminated squote" -> "a: 'x\n",
      "surrogate escape" -> "a: \"\\uD800\"\n",
      "bad escape" -> "a: \"\\q\"\n",
      "key with no block" -> "a:\nb: 1\n",
      "key with no block at EOF" -> "a: 1\nb:\n",
      "nested at same indent" -> "a:\na2: 1\n",
      "root sequence" -> "- 1\n- 2\n",
      "indented root" -> "  a: 1\n",
      "inconsistent sibling indent" -> "m:\n  a: 1\n   b: 2\n",
      "seq item indent drift" -> "k:\n  - 1\n   - 2\n",
      "bare dash" -> "k:\n  -\n",
      "dash no space" -> "k:\n  -x\n",
      "plain starts with indicator" -> "a: @x\n",
      "plain contains colon-space" -> "a: x: y\n",
      "plain ends with colon" -> "a: x:\n",
      "empty flow element" -> "a: [1, ]\n",
      "unclosed flow" -> "a: [1, 2\n",
      "quoted key" -> "\"a\": 1\n",
      "empty document" -> "# only comments\n",
      "trailing junk after quote" -> "a: 'x' y\n",
      // block-scalar sub-laws (sec 8.1 strict subset)
      "block header junk" -> "a: |x\n  x\n",
      "block header two chomps" -> "a: |--\n  x\n",
      "block header two indents" -> "a: |22\n  x\n",
      "block header chomp pair" -> "a: |+-\n  x\n",
      "block header indicator zero" -> "a: |0\n  x\n",
      "block header comment no space" -> "a: |# c\n  x\n",
      "block content trailing space" -> "a: |\n  x \n",
      "all-space line past the indent" -> "a: |\n  x\n   \nb: 1\n",
      "leading empty more indented than auto" -> "a: |\n    \n  x\n",
      "explicit indent above the content" -> "a: |2\n x\n",
      "folded more-indented line" -> "a: >\n  x\n   y\n")
    cases.foreach { case (name, doc) =>
      assert(parse(doc).isEmpty, name)
    }
    assert(parse("a: 1\n").nonEmpty, "control")
    // the largest float that fits the exact x100 axis parses to
    // EXACTLY Long.MaxValue — one cent more overflows above
    assert(parse("a: 92233720368547758.07\n").get.head.fx100
      .contains(Long.MaxValue), "x100 upper edge")
    assert(YamlLake.parseYaml(null).isEmpty)
    assert(YamlLake.parseYaml(Array.emptyByteArray).isEmpty)
    // invalid UTF-8 rejects
    assert(YamlLake.parseYaml(Array[Byte]('a', ':', ' ', 0xC3.toByte)).isEmpty)
  }

  test("sequence items as block mappings (`- key: value`)") {
    // both sequence indent styles produce identical rows
    val deeper = parse("k:\n  - a: 1\n    b: x\n  - a: 2\nz: 9\n").get
    val same = parse("k:\n- a: 1\n  b: x\n- a: 2\nz: 9\n").get
    assert(deeper == same)
    assert(deeper == Seq(
      YamlEntry("k", "seq", None, None, None, Some(2)),
      YamlEntry("k.0.a", "int", Some(1L), None, None, None),
      YamlEntry("k.0.b", "str", None, Some("x"), None, None),
      YamlEntry("k.1.a", "int", Some(2L), None, None, None),
      YamlEntry("z", "int", Some(9L), None, None, None)))
    // duplicate keys ACROSS items are distinct mappings (legal);
    // scalar and mapping items may mix within one sequence
    assert(parse("k:\n  - 5\n  - a: 1\n").get == Seq(
      YamlEntry("k", "seq", None, None, None, Some(2)),
      YamlEntry("k.0", "int", Some(5L), None, None, None),
      YamlEntry("k.1.a", "int", Some(1L), None, None, None)))
    // item values follow the FULL mapping-value grammar: nested
    // mappings, nested sequences-of-mappings (the hub model-index
    // shape), flow collections and block scalars all compose
    val mi = parse(
      "model-index:\n" +
        "- name: m1\n" +
        "  results:\n" +
        "  - task:\n" +
        "      type: gen\n" +
        "    metrics:\n" +
        "    - type: acc\n" +
        "      value: 0.95\n" +
        "  tags: [a, b]\n" +
        "  desc: |\n" +
        "    line1\n" +
        "    line2\n" +
        "done: 1\n").get
    assert(mi == Seq(
      YamlEntry("model-index", "seq", None, None, None, Some(1)),
      YamlEntry("model-index.0.name", "str", None, Some("m1"), None, None),
      YamlEntry("model-index.0.results", "seq", None, None, None, Some(1)),
      YamlEntry("model-index.0.results.0.task.type", "str", None,
        Some("gen"), None, None),
      YamlEntry("model-index.0.results.0.metrics", "seq", None, None,
        None, Some(1)),
      YamlEntry("model-index.0.results.0.metrics.0.type", "str", None,
        Some("acc"), None, None),
      YamlEntry("model-index.0.results.0.metrics.0.value", "float",
        None, None, Some(95L), None),
      YamlEntry("model-index.0.tags", "seq", None, None, None, Some(2)),
      YamlEntry("model-index.0.tags.0", "str", None, Some("a"), None, None),
      YamlEntry("model-index.0.tags.1", "str", None, Some("b"), None, None),
      YamlEntry("model-index.0.desc", "str", None,
        Some("line1\nline2\n"), None, None),
      YamlEntry("done", "int", Some(1L), None, None, None)))
    // `key:x` (colon glued to the value) stays a plain SCALAR item —
    // the ": " indicator law, unchanged by map-item detection
    assert(parse("k:\n  - a:1\n").get(1) ==
      YamlEntry("k.0", "str", None, Some("a:1"), None, None))
    // strictness: the item-mapping column laws reject, never guess
    val rejects = Seq(
      // extra spaces after the dash would float the key column
      "map item extra dash spacing" -> "k:\n  -  a: 1\n",
      "continuation key too shallow" -> "k:\n  - a: 1\n   b: 2\n",
      "continuation key too deep" -> "k:\n  - a: 1\n     b: 2\n",
      "duplicate key within one item" -> "k:\n  - a: 1\n    a: 2\n",
      "dash at the item-map column" -> "k:\n  - a: 1\n    - 2\n",
      "flow map as a DIRECT item" -> "k:\n  - {a: 1}\n")
    rejects.foreach { case (name, doc) =>
      assert(parse(doc).isEmpty, name)
    }
  }

  test("seq-map fixture law: every doc decodes to exactly the law rows") {
    // restate the q242 law independently for every doc
    val docs = YamlLake.seqMapFixture(spark, 40).orderBy("id").collect()
    docs.foreach { r =>
      val i = r.getLong(0).toInt
      val n = 1 + i % 3
      def e(path: String, kind: String, lval: Long = -1,
          sval: String = null, fx100: Long = -1, arrN: Int = -1) =
        YamlEntry(path, kind,
          if (lval == -1) None else Some(lval), Option(sval),
          if (fx100 == -1) None else Some(fx100),
          if (arrN == -1) None else Some(arrN))
      val want = Seq(
        e("model", "str", sval = "m" + i % 5),
        e("results", "seq", arrN = n)) ++
        (0 until n).flatMap { j =>
          Seq(
            e(s"results.$j.task", "str", sval = "t" + (i + j) % 4),
            e(s"results.$j.ep", "int", lval = (3 * i + 7 * j) % 100),
            e(s"results.$j.ok", "bool",
              lval = if ((i + j) % 2 == 0) 1 else 0)) ++
            (if ((i + j) % 2 == 1)
              Seq(e(s"results.$j.w", "float",
                fx100 = ((i + 5 * j) % 40 + 1) * 100L + (11 * i + j) % 100))
            else Seq.empty)
        } ++
        Seq(e("done", "int", lval = 10 + i))
      val got = YamlLake.parseYaml(r.getAs[Array[Byte]](1))
      assert(got.nonEmpty, s"doc $i failed to parse")
      assert(got.get == want, s"doc $i rows differ from the law")
    }
  }

  test("block scalars as sequence items (`- |` prompt lists)") {
    // own-indent style, mixed chomping, the next item closes a block
    assert(parse("k:\n- |\n  x\n  y\n- |-\n  z\nt: 1\n").get == Seq(
      YamlEntry("k", "seq", None, None, None, Some(2)),
      YamlEntry("k.0", "str", None, Some("x\ny\n"), None, None),
      YamlEntry("k.1", "str", None, Some("z"), None, None),
      YamlEntry("t", "int", Some(1L), None, None, None)))
    // deeper style; folded; keep; explicit indicator relative to the
    // DASH column; EOF close
    assert(parse("k:\n  - >\n    a\n    b\n").get(1).sval.contains("a b\n"))
    assert(parse("k:\n  - |+\n    x\n\n").get(1).sval.contains("x\n\n"))
    assert(parse("k:\n  - |2\n    x\n").get(1).sval.contains("x\n"))
    assert(parse("k:\n- |-\n  x").get(1).sval.contains("x"))
    // content only one space past the dash is still content
    assert(parse("k:\n- |\n x\n").get(1).sval.contains("x\n"))
    // inside an item MAPPING the block still routes via its key
    assert(parse("k:\n- a: |\n    x\n  b: 1\n").get == Seq(
      YamlEntry("k", "seq", None, None, None, Some(1)),
      YamlEntry("k.0.a", "str", None, Some("x\n"), None, None),
      YamlEntry("k.0.b", "int", Some(1L), None, None, None)))
    // strictness: header junk on an item block; content landing at
    // the dash column closes the block and then fails structurally
    assert(parse("k:\n- |x\n  y\n").isEmpty)
    assert(parse("k:\n  - |\n  x\n").isEmpty)
  }

  test("prompt-list fixture law: every doc decodes to the law rows") {
    val docs = YamlLake.promptsFixture(spark, 40).orderBy("id").collect()
    docs.foreach { r =>
      val i = r.getLong(0).toInt
      val raw = s"Ask q${i % 3} w${i % 5}\nmore t${(3 * i) % 7}"
      val v0 = if (i % 3 == 1) raw else raw + "\n"
      val want = Seq(
        YamlEntry("name", "str", None, Some("p" + i % 4), None, None),
        YamlEntry("prompts", "seq", None, None, None,
          Some(1 + (1 - i % 2)))) ++
        Seq(YamlEntry("prompts.0", "str", None, Some(v0), None, None)) ++
        (if (i % 2 == 0)
          Seq(YamlEntry("prompts.1", "str", None,
            Some("Short s" + i % 7), None, None))
        else Seq.empty) ++
        Seq(YamlEntry("temp", "float", None, None,
          Some((1 + i % 3) * 100L + (i % 10) * 10), None))
      val got = YamlLake.parseYaml(r.getAs[Array[Byte]](1))
      assert(got.contains(want), s"doc $i rows differ from the law")
    }
  }

  test("model-card fixture law: the composed hub-card shape decodes") {
    // restate the q244 law independently for every doc
    val rows = YamlLake.extractFrontMatter(
      YamlLake.modelCardFixture(spark, 42), "id", "media")
      .orderBy("id", "seq").collect()
    (0 until 42).foreach { i =>
      val mine = rows.filter(_.getLong(0) == i)
      if (i % 7 == 6) {
        assert(mine.length == 1 && !mine(0).getBoolean(8) &&
          mine(0).getBoolean(9), s"doc $i: expected a no-fm row")
      } else {
        val nm = if (i % 2 == 0) 2 else 1
        assert(mine.length == 13 + 2 * (nm - 1), s"doc $i row count")
        assert(mine.forall(r => r.getBoolean(8) && r.getBoolean(9)))
        def at(s: Int) = mine(s)
        assert(at(0).getString(2) == "license" && at(0).getString(5) ==
          Seq("apache-2.0", "mit", "cc-by-4.0")(i % 3))
        assert(at(1).getString(2) == "tags" && at(1).getInt(7) == 2)
        assert(at(2).getString(5) == "nlp" &&
          at(3).getString(5) == "t" + i % 4)
        assert(at(4).getString(2) == "desc" && at(4).getString(5) ==
          s"Card c${i % 5}\nline w${i % 3}\n")
        assert(at(5).getString(2) == "model-index" && at(5).getInt(7) == 1)
        assert(at(6).getString(2) == "model-index.0.name" &&
          at(6).getString(5) == "m" + i % 6)
        assert(at(7).getString(2) == "model-index.0.results" &&
          at(7).getInt(7) == 1)
        assert(at(8).getString(2) == "model-index.0.results.0.task" &&
          at(8).getString(5) == "cls" + i % 3)
        assert(at(9).getString(2) == "model-index.0.results.0.metrics" &&
          at(9).getInt(7) == nm)
        assert(at(10).getString(5) == "acc" &&
          at(11).getString(3) == "float" &&
          at(11).getLong(6) == (7 * i) % 100)
        if (nm == 2) {
          assert(at(12).getString(5) == "f1" &&
            at(13).getLong(6) == (11 * i) % 100)
          assert(at(13).getString(2) ==
            "model-index.0.results.0.metrics.1.value")
        }
        val dl = mine.last
        assert(dl.getString(2) == "downloads" &&
          dl.getLong(4) == 1000 + 3 * i)
      }
    }
  }

  test("multi-document streams: separators, openers, strictness") {
    import YamlLake.parseYamlDocs
    def pd(s: String) = parseYamlDocs(s.getBytes("UTF-8"))
    // marker-led and marker-less openers; per-doc seq restart
    val two = pd("---\na: 1\n---\nb: 2\n").get
    assert(two == Seq(
      Seq(YamlEntry("a", "int", Some(1L), None, None, None)),
      Seq(YamlEntry("b", "int", Some(2L), None, None, None))))
    assert(pd("a: 1\n---\nb: 2\n").get == two, "marker-less opener")
    // a single marker-less document is a one-document stream
    assert(pd("a: 1\n").get.length == 1)
    // a column-0 `---` inside a block scalar is impossible (content
    // is indented); an INDENTED one is content, not a separator
    assert(pd("a: |\n  ---\n").get.head.head.sval.contains("---\n"))
    // strictness: empty documents, bad documents, oversized streams
    assert(pd("---\n").isEmpty, "one empty doc")
    assert(pd("---\na: 1\n---\n").isEmpty, "trailing empty doc")
    assert(pd("---\n---\na: 1\n").isEmpty, "interior empty doc")
    assert(pd("# note\n---\na: 1\n").isEmpty,
      "comment-only first document")
    assert(pd("a: 1\n---\nb: yes\n").isEmpty,
      "any invalid doc invalidates the stream")
    assert(pd("a: 1\n--- \nb: 2\n").isEmpty, "junk after separator")
    assert(parseYamlDocs(null).isEmpty)
    val many = (0 until 65).map(k => s"---\na: $k\n").mkString
    assert(pd(many).isEmpty, "more than 64 documents")
    val ok64 = (0 until 64).map(k => s"---\na: $k\n").mkString
    assert(pd(ok64).exists(_.length == 64), "exactly 64 documents")
    // the docs-fixture law, restated independently
    val docs = YamlLake.docsFixture(spark, 40).orderBy("id").collect()
    docs.foreach { r =>
      val i = r.getLong(0).toInt
      val want = (0 until 1 + i % 3).map { d =>
        Seq(
          YamlEntry("app", "str", None, Some("a" + (i + d) % 5), None, None),
          YamlEntry("v", "int", Some(((7 * i + 3 * d) % 50).toLong),
            None, None, None),
          YamlEntry("up", "bool", Some(if ((i + d) % 2 == 0) 1L else 0L),
            None, None, None),
          YamlEntry("r", "float", None, None,
            Some((1 + (i + d) % 9) * 100L + (13 * i + d) % 100), None))
      }
      assert(parseYamlDocs(r.getAs[Array[Byte]](1)).contains(want),
        s"stream $i differs from the law")
    }
  }

  test("flow mappings: one level, scalar values, spacing forms") {
    assert(parse("m: {a: 1, b: 'x,y', c: 2.5}\nz: 9\n").get == Seq(
      YamlEntry("m", "map", None, None, None, Some(3)),
      YamlEntry("m.a", "int", Some(1L), None, None, None),
      YamlEntry("m.b", "str", None, Some("x,y"), None, None),
      YamlEntry("m.c", "float", None, None, Some(250L), None),
      YamlEntry("z", "int", Some(9L), None, None, None)))
    // empty mapping, padded braces, no space after commas, trailing
    // comment, quoted values carrying the closing indicator
    assert(parse("m: {}\n").get ==
      Seq(YamlEntry("m", "map", None, None, None, Some(0))))
    assert(parse("m: { a: 1 }\n").get.length == 2)
    assert(parse("m: {a: 1,b: 2}\n").get.length == 3)
    assert(parse("m: {a: 1} # c\n").get.length == 2)
    assert(parse("m: {b: \"}x\"}\n").get(1).sval.contains("}x"))
    // strictness: the flow-mapping sub-laws reject, never guess
    val rejects = Seq(
      "duplicate flow key" -> "m: {a: 1, a: 2}\n",
      "nested flow map" -> "m: {a: {b: 1}}\n",
      "flow seq in flow map" -> "m: {a: [1]}\n",
      "flow map in flow seq" -> "m: [{a: 1}]\n",
      "flow map as seq item" -> "k:\n  - {a: 1}\n",
      "no space after flow colon" -> "m: {a:1}\n",
      "unterminated flow map" -> "m: {a: 1\n",
      "empty flow value" -> "m: {a: }\n",
      "junk after close" -> "m: {a: 1} x\n",
      "bare close brace in plain" -> "m: {a: x}y}\n",
      "missing comma" -> "m: {a: 1 b: 2}\n",
      "quoted flow key" -> "m: {'a': 1}\n",
      // YAML 1.2 makes EVERY c-flow-indicator an indicator in flow
      // context — plain tokens carrying the OTHER collection's
      // brackets reject rather than silently differing from real
      // parsers (quoted values carry them freely, above)
      "bracket in flow-map plain" -> "m: {a: x[y]}\n",
      "brace in flow-seq plain" -> "a: [x{y]\n",
      "close brace in flow-seq plain" -> "a: [x}y]\n")
    rejects.foreach { case (name, doc) =>
      assert(parse(doc).isEmpty, name)
    }
  }

  test("block scalars: literal/folded x chomping x indentation laws") {
    def v(doc: String): String = parse(doc).get.head.sval.get
    // literal: clip keeps exactly one trailing newline
    assert(v("a: |\n  x\n  y\n") == "x\ny\n")
    assert(v("a: |-\n  x\n  y\n") == "x\ny")
    // keep preserves every trailing empty line; clip drops them
    assert(v("a: |+\n  x\n\n\n") == "x\n\n\n")
    assert(v("a: |\n  x\n\n\nb: 1\n") == "x\n")
    // interior empty lines and more-indented literal lines verbatim
    assert(v("a: |\n  x\n\n  y\n") == "x\n\ny\n")
    assert(v("a: |\n  x\n    y\n") == "x\n  y\n")
    // folded: one break folds to a space, an empty line to a newline
    assert(v("a: >\n  x\n  y\n") == "x y\n")
    assert(v("a: >\n  x\n\n  y\n") == "x\ny\n")
    assert(v("a: >\n  x\n\n\n  y\n") == "x\n\ny\n")
    assert(v("a: >-\n  x\n  y\n") == "x y")
    assert(v("a: >+\n  x\n\n") == "x\n\n")
    // explicit indentation indicator, relative to the key's indent
    assert(v("a: |2\n  x\n") == "x\n")
    assert(v("a: |1\n x\n") == "x\n")
    assert(v("a: |1\n  x\n") == " x\n") // deeper than explicit: content
    // both indicator orders
    assert(v("a: |-2\n  x\n") == "x")
    assert(v("a: |2-\n  x\n") == "x")
    // a dedent closes the block; the closing line is structural
    assert(parse("a: |\n  x\nb: 1\n").get == Seq(
      YamlEntry("a", "str", None, Some("x\n"), None, None),
      YamlEntry("b", "int", Some(1L), None, None, None)))
    // nested under a deeper mapping; a two-level dedent closes both
    assert(parse("m:\n  a: |\n    x\n  b: 2\n").get == Seq(
      YamlEntry("m.a", "str", None, Some("x\n"), None, None),
      YamlEntry("m.b", "int", Some(2L), None, None, None)))
    assert(parse("m:\n  a: |\n    x\nq: 1\n").get == Seq(
      YamlEntry("m.a", "str", None, Some("x\n"), None, None),
      YamlEntry("q", "int", Some(1L), None, None, None)))
    // leading empty lines survive as leading newlines (both styles)
    assert(v("a: |\n\n  x\n") == "\nx\n")
    assert(v("a: >\n\n  x\n") == "\nx\n")
    // zero content lines: clip/strip empty, keep counts the empties
    assert(v("a: |\nb: 1\n") == "")
    assert(v("a: |\n\n\nb: 1\n") == "")
    assert(v("a: |+\n\n\nb: 1\n") == "\n\n")
    // EOF closes an open block
    assert(v("a: |-\n  x") == "x")
    assert(v("a: |+\n  x\n\n") == "x\n\n")
    // a space-led comment may trail the header; inside the block,
    // '#' and the document markers are plain content
    assert(v("a: | # note\n  x\n") == "x\n")
    assert(v("a: |\n  x # not a comment\n") == "x # not a comment\n")
    assert(v("a: |\n  ---\n") == "---\n")
  }

  test("front matter: fence splitting and composition") {
    import YamlLake.{Fm, NoFm, BadFm}
    assert(YamlLake.frontMatter("plain text\n".getBytes("UTF-8")) == NoFm)
    assert(YamlLake.frontMatter("---\na: 1\n".getBytes("UTF-8")) == BadFm)
    assert(YamlLake.frontMatter(null) == BadFm)
    YamlLake.frontMatter("---\na: 1\nb: x\n---\nbody # text\n"
      .getBytes("UTF-8")) match {
      case Fm(y) =>
        assert(parse(new String(y, "UTF-8")).get == Seq(
          YamlEntry("a", "int", Some(1L), None, None, None),
          YamlEntry("b", "str", None, Some("x"), None, None)))
      case other => fail(s"expected Fm, got $other")
    }
    // the markdown-fixture law: docs i%4==3 carry no front matter
    val fx = graft.operators.MarkdownLake.markdownFixture(spark, 12)
    val rows = YamlLake.extractFrontMatter(fx, "id", "media")
      .orderBy("id", "seq").collect()
    (0 until 12).foreach { i =>
      val mine = rows.filter(_.getLong(0) == i)
      if (i % 4 == 3) {
        assert(mine.length == 1 && !mine(0).getBoolean(8) &&
          mine(0).getBoolean(9), s"doc $i: expected a no-fm row")
      } else {
        assert(mine.length == 6, s"doc $i row count")
        assert(mine.forall(r => r.getBoolean(8) && r.getBoolean(9)))
        assert(mine.map(_.getString(2)).toSeq ==
          Seq("title", "date", "tags", "tags.0", "tags.1", "draft"))
        assert(mine(0).getString(5) == s"Post $i and co")
        assert(mine(1).getString(3) == "date")
        assert(mine(2).getInt(7) == 2)
        assert(mine(3).getString(5) == "t" + i % 5)
        assert(mine(5).getLong(4) == 0L) // draft: false
      }
    }
  }

  test("block fixture law: name/desc/tail rows with assembled values") {
    // restate the q238 law independently for every doc
    val rows = YamlLake.extractFrontMatter(
      YamlLake.blockFixture(spark, 40), "id", "media")
      .orderBy("id", "seq").collect()
    (0 until 40).foreach { i =>
      val mine = rows.filter(_.getLong(0) == i)
      if (i % 5 == 4) {
        assert(mine.length == 1 && !mine(0).getBoolean(8) &&
          mine(0).getBoolean(9), s"doc $i: expected a no-fm row")
      } else {
        val lit = i % 2 == 0
        val nl = 1 + (i / 2) % 3
        val inter = i % 4 < 2 && nl >= 2
        val ex = i % 5 == 0
        def a(j: Int) = "line" + j + " w" + (i + j) % 7
        val x1 = (if (ex && lit) " " else "") + a(1)
        val raw =
          if (lit)
            a(0) + (if (inter) "\n" else "") +
              (if (nl >= 2) "\n" + x1 else "") +
              (if (nl >= 3) "\n" + a(2) else "")
          else
            a(0) + (if (nl >= 2) (if (inter) "\n" else " ") + a(1) else "") +
              (if (nl >= 3) " " + a(2) else "")
        val want = i % 3 match {
          case 1 => raw
          case 0 => raw + "\n"
          case _ => raw + ("\n" * (1 + (i / 3) % 3))
        }
        val hasTail = i % 7 != 3
        assert(mine.length == (if (hasTail) 3 else 2), s"doc $i rows")
        assert(mine.forall(r => r.getBoolean(8) && r.getBoolean(9)))
        assert(mine(0).getString(2) == "name" &&
          mine(0).getString(5) == "blk" + i % 5)
        assert(mine(1).getString(2) == "desc" &&
          mine(1).getString(5) == want, s"doc $i desc value")
        if (hasTail)
          assert(mine(2).getString(2) == "tail" &&
            mine(2).getLong(4) == 100 + i)
      }
    }
  }

  test("anchors, aliases, merge keys (q250)") {
    // anchored scalar + alias replay, both value and item positions
    val sc = parse("a: &x 7\nb: *x\nl:\n  - *x\n").get
    assert(sc.map(_.path) == Seq("a", "b", "l", "l.0"))
    assert(sc.filter(_.kind == "int").forall(_.lval.contains(7L)))
    // anchored mapping: alias replays the whole subtree re-rooted
    val mp = parse("m: &d\n  a: 1\n  b: x\nn: *d\n").get
    assert(mp.map(_.path) == Seq("m.a", "m.b", "n.a", "n.b"))
    // anchored sequence: the container row (with its count) replays
    val sq = parse("s: &q\n  - 1\n  - 2\nt: *q\n").get
    assert(sq.map(_.path) == Seq("s", "s.0", "s.1", "t", "t.0", "t.1"))
    assert(sq(3).kind == "seq" && sq(3).arrN.contains(2))
    // merge: local keys win REGARDLESS of line order; merged entries
    // emit at mapping close in the anchor's order
    val mg = parse("d: &d\n  a: 1\n  b: 2\nu:\n  <<: *d\n  c: 9\n" +
      "  b: 8\nz: 0\n").get
    assert(mg.map(e => e.path -> e.lval.get) == Seq("d.a" -> 1L,
      "d.b" -> 2L, "u.c" -> 9L, "u.b" -> 8L, "u.a" -> 1L, "z" -> 0L))
    // a merged NESTED structure replays wholesale when not overridden
    val mn = parse("d: &d\n  a: 1\n  m:\n    x: 5\nu:\n  <<: *d\n" +
      "  a: 3\nz: 0\n").get
    assert(mn.map(_.path) == Seq("d.a", "d.m.x", "u.a", "u.m.x", "z"))
    assert(mn(3).lval.contains(5L))
    // aliases expand at parse time: an anchored node captures its
    // own expanded form (alias-in-anchored-subtree)
    val ae = parse("a: &x 4\nm: &d\n  k: *x\nn: *d\n").get
    assert(ae.map(_.path) == Seq("a", "m.k", "n.k"))
    assert(ae(2).lval.contains(4L))
    val bad = Seq(
      "cycle: alias inside its own open anchor" ->
        "a: &x\n  b: *x\n",
      "cycle: merge of the open anchor" -> "a: &x\n  <<: *x\n",
      "undefined alias in item position" -> "l:\n  - *nope\n",
      "undefined merge source" -> "u:\n  <<: *nope\n  a: 1\n",
      "duplicate anchor name" -> "a: &x 1\nb: &x 2\n",
      "merge of a scalar anchor" -> "a: &x 1\nu:\n  <<: *x\n  b: 2\n",
      "merge of a sequence anchor" ->
        "s: &x\n  - 1\nu:\n  <<: *x\n  b: 2\n",
      "two merge keys in one mapping" ->
        "d: &d\n  a: 1\ne: &e\n  b: 2\nu:\n  <<: *d\n  <<: *e\n",
      "merge at value depth (no space)" -> "u:\n  <<:*d\n",
      "anchor on a flow value" -> "a: &x [1, 2]\n",
      "anchor on a block scalar" -> "a: &x |\n  t\n",
      "alias with trailing garbage" -> "a: &x 1\nb: *x y\n",
      "anchor with no node at EOF" -> "a: &x\n",
      "empty anchor name" -> "a: & 1\n")
    bad.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
    // expansion budget: a 256-entry anchored node is capturable, but
    // replaying it 5 times crosses the 1024-entry budget
    val bigMap = "d: &d\n" +
      (0 until 255).map(j => s"  k$j: $j\n").mkString
    val fourCopies = bigMap +
      (0 until 4).map(j => s"c$j: *d\n").mkString
    assert(parse(fourCopies).nonEmpty, "4 x 255 entries fits")
    val fiveCopies = bigMap +
      (0 until 5).map(j => s"c$j: *d\n").mkString
    assert(parse(fiveCopies).isEmpty, "5 x 255 crosses the budget")
    // an anchored node over 256 entries rejects at capture
    val tooBig = "d: &d\n" +
      (0 until 257).map(j => s"  k$j: $j\n").mkString + "z: 0\n"
    assert(parse(tooBig).isEmpty, "257-entry anchor")
  }

  test("anchors fixture law: every doc decodes to the law rows (q250)") {
    val out = YamlLake.extractYaml(
      YamlLake.anchorsFixture(spark, 40), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(8)))
    (0 until 40).foreach { i =>
      val mine = out.filter(_.getLong(0) == i)
      assert(mine.length == 18, s"doc $i row count")
      val ev = i % 2 == 0
      val paths = mine.map(_.getString(2)).toSeq
      val mid =
        if (ev) Seq("svc_a.retries", "svc_a.image")
        else Seq("svc_a.image", "svc_a.retries")
      assert(paths == Seq("defaults.image", "defaults.retries",
        "defaults.ping", "svc_a.port") ++ mid ++ Seq("svc_a.ping",
        "svc_b.image", "svc_b.retries", "svc_b.ping", "motto",
        "again", "nums", "nums.0", "nums.1", "copy", "copy.0",
        "copy.1"), s"doc $i paths")
      // the local override won on even i, the merged value on odd
      val aRetries = mine(if (ev) 4 else 5)
      assert(aRetries.getLong(4) == (if (ev) 50 + i % 6 else i % 4))
      assert(mine(8).getLong(4) == i % 4) // svc_b: merged retries
      assert(mine(7).getString(5) == "alt" + i % 3) // local image won
      assert(mine(11).getString(5) == "go " + i % 7) // alias replay
      assert(mine(15).getString(3) == "seq" && mine(15).getInt(7) == 2)
      assert(mine(16).getLong(4) == (3 * i) % 40)
    }
  }

  test("byte-flip + truncation sweeps never throw; survivors well-formed") {
    val docs = YamlLake.yamlFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1)) ++
      Seq(2, 5, 8).map(YamlLake.blockDoc) ++ // block-scalar paths
      Seq(3, 6).map(YamlLake.flowDoc) ++ // flow-mapping paths
      Seq(1, 4).map(YamlLake.seqMapDoc) ++ // seq-of-mappings paths
      Seq(2, 7).map(YamlLake.docsDoc) ++ // multi-document streams
      Seq(0, 3).map(YamlLake.modelCardDoc) ++ // the composed card shape
      Seq(1, 6).map(YamlLake.anchorsDoc) // anchor/alias/merge paths
    for (src <- docs; i <- src.indices; bit <- Seq(1, 0x40)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      YamlLake.parseYaml(c).foreach { es =>
        assert(es.nonEmpty && es.forall(_.path.nonEmpty))
      }
      YamlLake.parseYamlDocs(c).foreach { ds =>
        assert(ds.nonEmpty && ds.forall(es =>
          es.nonEmpty && es.forall(_.path.nonEmpty)))
      }
      YamlLake.frontMatter(c)
    }
    val s0 = docs.head
    (0 until s0.length).foreach { n =>
      YamlLake.parseYaml(s0.take(n)); YamlLake.frontMatter(s0.take(n))
      YamlLake.parseYamlDocs(s0.take(n))
    }
  }
}
