package graft

import graft.operators.DockerLake

/** Dockerfile census: fixture-law replay, the continuation and
  * ordering laws, FROM/EXPOSE/pair grammars, strictness matrix,
  * byte-flip + truncation sweeps. */
class DockerLakeSpec extends SparkSpec {

  private def parse(s: String) = DockerLake.parseDocker(s.getBytes("UTF-8"))

  test("fixture law: every doc decodes to exactly the law rows") {
    val out = DockerLake.extractDocker(
      DockerLake.dockerFixture(spark, 40), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(12)))
    (0 until 40).foreach { i =>
      val mine = out.filter(_.getLong(0) == i)
      val a = if (i % 4 == 0) 1 else 0
      val b = if (i % 2 == 0) 1 else 0
      assert(mine.length == 5 + a + 2 * b, s"doc $i row count")
      if (a == 1) {
        assert(mine(0).getString(3) == "ARG" && mine(0).getInt(2) == -1 &&
          mine(0).getInt(7) == 1 && mine(0).getString(11) ==
          s"BASE=u${i % 3}")
      }
      val fr = mine(a)
      assert(fr.getString(3) == "FROM" && fr.getInt(2) == 0 &&
        fr.getString(4) == "img" + i % 5 && fr.getString(5) == "v" + i % 3 &&
        fr.getString(6) == "build")
      // the two-segment continuation joins with one space
      assert(mine(a + 1).getString(3) == "RUN" && mine(a + 1).getString(11) ==
        s"apk add pkg${i % 7} && echo done${i % 4}")
      assert(mine(a + 2).getString(3) == "ENV" && mine(a + 2).getInt(7) == 2)
      val ex = mine(a + 3)
      assert(ex.getString(3) == "EXPOSE" && ex.getInt(7) == 2 &&
        ex.getLong(8) == 17000 + i % 10 + i % 7)
      if (b == 1) {
        val f2 = mine(a + 4)
        assert(f2.getString(3) == "FROM" && f2.getInt(2) == 1 &&
          f2.getString(4) == "img" + (i + 1) % 5 && f2.isNullAt(5) &&
          f2.isNullAt(6))
        assert(mine(a + 5).getString(3) == "COPY" &&
          mine(a + 5).getInt(2) == 1)
      }
      val cmd = mine.last
      assert(cmd.getString(3) == "CMD" && cmd.getInt(2) == b &&
        cmd.getString(11) == s"""["run", "r${i % 6}"]""")
    }
  }

  test("grammars: FROM forms, EXPOSE census, pair values") {
    // untagged, tagged, named stages; registry paths with slashes
    assert(parse("FROM alpine\nRUN x\n").get.head.image.contains("alpine"))
    assert(parse("FROM a/b/c:1.2-rc_3\nRUN x\n").get.head.tag
      .contains("1.2-rc_3"))
    val two = parse("FROM a AS s1\nFROM b AS s2\nRUN x\n").get
    assert(two.map(_.stage) == Seq(0, 1, 1) &&
      two(1).stageName.contains("s2"))
    // ARG before FROM sits at stage -1; after FROM at that stage
    val ar = parse("ARG A=1\nFROM a\nARG B\n").get
    assert(ar.map(_.stage) == Seq(-1, 0, 0))
    // EXPOSE: udp suffix and the port sum census
    val ex = parse("FROM a\nEXPOSE 53/udp 8080\n").get(1)
    assert(ex.nParts.contains(2) && ex.lsum.contains(53L + 8080))
    // ENV: bare and quoted values; LABEL shares the grammar
    assert(parse("FROM a\nENV A=1 B=\"x y\" C_d.e-f=z\n").get(1)
      .nParts.contains(3))
    assert(parse("FROM a\nLABEL k=\"v\"\n").get(1).nParts.contains(1))
    // continuations: three segments, inner blank-free
    assert(parse("FROM a\nRUN x \\\n  y \\\n  z\n").get(1)
      .args == "x y z")
  }

  test("strictness: every structural lie rejects, never guesses") {
    val cases = Seq(
      "lowercase instruction" -> "from a\nRUN x\n",
      "unknown instruction" -> "FROM a\nFETCH x\n",
      "RUN before FROM" -> "RUN x\nFROM a\n",
      "ENV before FROM" -> "ENV A=1\nFROM a\n",
      "no FROM at all" -> "ARG A=1\n",
      "empty args" -> "FROM a\nRUN\n",
      "dangling continuation at EOF" -> "FROM a\nRUN x \\\n",
      "comment inside a continuation" -> "FROM a\nRUN x \\\n# c\n  y\n",
      "digest pin out of subset" -> "FROM a@sha256:abc\nRUN x\n",
      "platform flag out of subset" -> "FROM --platform=l a\nRUN x\n",
      "uppercase image" -> "FROM Alpine\nRUN x\n",
      "empty tag" -> "FROM a:\nRUN x\n",
      "FROM junk arity" -> "FROM a b\nRUN x\n",
      "FROM bad AS keyword" -> "FROM a as s\nRUN x\n",
      "duplicate stage name" -> "FROM a AS s\nFROM b AS s\nRUN x\n",
      "port zero" -> "FROM a\nEXPOSE 0\n",
      "port overflow" -> "FROM a\nEXPOSE 65536\n",
      "port leading zero" -> "FROM a\nEXPOSE 080\n",
      "bad proto" -> "FROM a\nEXPOSE 80/sctp\n",
      "ENV bare key" -> "FROM a\nENV JUSTKEY\n",
      "ENV key starts with digit" -> "FROM a\nENV 1A=2\n",
      "ENV unterminated quote" -> "FROM a\nENV A=\"x\n",
      "ENV quote glued to next" -> "FROM a\nENV A=\"x\"y\n",
      "ENV stray quote in bare value" -> "FROM a\nENV A=x\"y\n",
      "empty document" -> "# only comments\n",
      "raw control byte" -> "FROM a\nRUN x\u0001y\n")
    cases.foreach { case (name, s) =>
      assert(parse(s).isEmpty, name)
    }
    assert(parse("FROM a\nRUN x\n").nonEmpty, "control")
    assert(DockerLake.parseDocker(null).isEmpty)
    // ARG may be bare (no default) AFTER the grammar's bareKeyOk
    assert(parse("ARG JUSTKEY\nFROM a\n").nonEmpty)
  }

  test("exec form: argv counts, the escape, strictness (q249)") {
    // shell forms stay verbatim with a null argv
    assert(parse("FROM a\nRUN echo hi\n").get(1).argvN.isEmpty)
    // exec forms census their argv
    assert(parse("FROM a\nCMD [\"x\"]\n").get(1).argvN.contains(1))
    assert(parse("FROM a\nRUN [\"sh\", \"-c\", \"x y\"]\n").get(1)
      .argvN.contains(3))
    // the one escape: \" inside an element
    assert(parse("FROM a\nCMD [\"say \\\"hi\\\"\"]\n").get(1)
      .argvN.contains(1))
    // comma without the optional space
    assert(parse("FROM a\nCMD [\"a\",\"b\"]\n").get(1).argvN.contains(2))
    // SHELL is exec-form-only
    assert(parse("FROM a\nSHELL [\"sh\", \"-c\"]\n").get(1)
      .argvN.contains(2))
    val bad = Seq(
      "unterminated array" -> "FROM a\nCMD [\"x\"\n",
      "unterminated element" -> "FROM a\nCMD [\"x]\n",
      "non-string element" -> "FROM a\nCMD [\"a\", 1]\n",
      "bare word element" -> "FROM a\nCMD [x]\n",
      "empty array" -> "FROM a\nCMD []\n",
      "trailing garbage after bracket" -> "FROM a\nCMD [\"a\"] x\n",
      "trailing comma" -> "FROM a\nCMD [\"a\",]\n",
      "backslash escape out of subset" -> "FROM a\nCMD [\"a\\\\b\"]\n",
      "two spaces after comma" -> "FROM a\nCMD [\"a\",  \"b\"]\n",
      "shell-form SHELL" -> "FROM a\nSHELL sh -c\n")
    bad.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
  }

  test("COPY --from: stage-graph edges, strictness (q249)") {
    val d = "FROM a AS one\nFROM b AS two\nCOPY --from=one /s /d\n" +
      "FROM c\nCOPY --from=1 /s /d\nCOPY --from=one /s /d\n"
    val es = parse(d).get
    assert(es(2).fromStage.contains(0)) // name ref
    assert(es(4).fromStage.contains(1)) // numeric ref
    assert(es(5).fromStage.contains(0)) // name ref skipping a stage
    // a plain COPY carries no edge
    assert(parse("FROM a\nCOPY /s /d\n").get(1).fromStage.isEmpty)
    val bad = Seq(
      "unknown stage" -> "FROM a AS s\nFROM b\nCOPY --from=zz /s /d\n",
      "forward reference" -> ("FROM a\nCOPY --from=later /s /d\n" +
        "FROM b AS later\n"),
      "self reference by name" -> "FROM a AS s\nCOPY --from=s /s /d\n",
      "self reference numeric" -> "FROM a\nFROM b\nCOPY --from=1 /s /d\n",
      "numeric leading zero" -> "FROM a\nFROM b\nCOPY --from=00 /s /d\n",
      "missing dest" -> "FROM a\nFROM b\nCOPY --from=0 /s\n",
      "other flag out of subset" -> "FROM a\nCOPY --chown=x /s /d\n")
    bad.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
  }

  test("stage-graph fixture law replays exactly (q249)") {
    val out = DockerLake.extractDocker(
      DockerLake.dockerGraphFixture(spark, 40), "id", "media")
      .orderBy("id", "seq").collect()
    assert(out.forall(_.getBoolean(12)))
    (0 until 40).foreach { i =>
      val mine = out.filter(_.getLong(0) == i)
      val a = if (i % 4 == 0) 1 else 0
      assert(mine.length == 9 + a, s"doc $i row count")
      // argv_n is column 9, from_stage column 10
      assert(mine(0).getString(3) == "FROM" &&
        mine(0).getString(6) == "s0")
      if (i % 2 == 0) assert(mine(1).getInt(9) == 3)
      else assert(mine(1).isNullAt(9))
      if (a == 1) assert(mine(2).getString(3) == "SHELL" &&
        mine(2).getInt(9) == 2)
      assert(mine(3 + a).getString(3) == "COPY" &&
        mine(3 + a).getInt(10) == 0 && mine(3 + a).getInt(2) == 1)
      assert(mine(4 + a).getInt(9) == (if (i % 5 == 2) 3 else 2))
      assert(mine(6 + a).getInt(10) == 1 && mine(6 + a).getInt(2) == 2)
      assert(mine(7 + a).getInt(10) == 0)
      assert(mine(8 + a).getString(3) == "CMD" && mine(8 + a).getInt(9) == 2)
    }
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = Seq(0, 3).map(DockerLake.dockerDoc) ++
      Seq(2, 5).map(DockerLake.dockerGraphDoc) // exec + --from paths
    for (src <- seeds; i <- src.indices; bit <- Seq(1, 0x40)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      DockerLake.parseDocker(c).foreach { es =>
        assert(es.nonEmpty && es.forall(_.args.nonEmpty))
      }
    }
    val s0 = seeds.head
    (0 until s0.length).foreach(n => DockerLake.parseDocker(s0.take(n)))
  }
}
