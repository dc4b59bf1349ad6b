package graft

import graft.operators.RtfLake

/** RTF walk: fixture-law equality, the uc-skip law (both uc values,
  * group save/restore), destination skipping, strictness matrix,
  * byte-flip + truncation sweeps. */
class RtfLakeSpec extends SparkSpec {

  test("fixture laws: extract output matches the closed forms") {
    val out = RtfLake.extractRtf(
      RtfLake.rtfFixture(spark, 12), "id", "media")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(5)))
    out.foreach { r =>
      val i = r.getLong(0).toInt
      val np = 2 + i % 3
      val want = (0 until np).map { k =>
        s"Seg ${(i + k) % 10} é${(i * 3 + k) % 10}" +
          s" ué {x} tail${(i * 7 + k) % 10}\n"
      }.mkString
      assert(r.getString(1) == want, s"text law doc $i")
      assert(r.getInt(2) == np && r.getInt(3) == 3 + np && r.getInt(4) == np)
    }
  }

  private def parse(s: String) = RtfLake.parseRtf(s.getBytes("ISO-8859-1"))

  test("the uc-skip law: fallbacks swallowed, value scoped per group") {
    // uc=1 (default): one fallback char swallowed after \uN
    assert(parse("{\\rtf1\\ansi \\u233 eZ}").get.text == "éZ")
    // uc=2: two fallback chars swallowed, incl. a \'hh escape
    assert(parse("{\\rtf1\\ansi \\uc2\\u233 \\'65eZ}").get.text == "éZ")
    // uc=0: nothing swallowed
    assert(parse("{\\rtf1\\ansi \\uc0\\u233 eZ}").get.text == "éeZ")
    // group scoping: \uc2 inside a group restores to 1 outside it
    assert(parse("{\\rtf1\\ansi {\\uc2\\u233 ab}\\u233 cd}").get.text ==
      "ééd", "inner uc=2 eats ab; outer uc=1 eats only c")
  }

  test("destination groups contribute no text") {
    val d = parse("{\\rtf1\\ansi{\\fonttbl{\\f0 F;}}{\\info{\\b T}}" +
      "{\\*\\weird {\\'e9 any\\par}}A\\par}").get
    assert(d.text == "A\n" && d.nPars == 1)
    // \stylesheet and \colortbl too
    assert(parse("{\\rtf1\\ansi{\\stylesheet{\\ql x;}}{\\colortbl;\\red0;}B}")
      .get.text == "B")
  }

  test("strictness matrix: every lie rejects, never throws") {
    val cases: Seq[(String, String)] = Seq(
      "no rtf header" -> "{\\ansi hi}",
      "rtf version 2" -> "{\\rtf2\\ansi hi}",
      "missing ansi" -> "{\\rtf1\\deff0 hi}",
      "unbalanced open" -> "{\\rtf1\\ansi {hi}",
      "unbalanced close" -> "{\\rtf1\\ansi hi}}",
      "trailing bytes after root" -> "{\\rtf1\\ansi hi}x",
      "unknown control word" -> "{\\rtf1\\ansi \\frobnicate hi}",
      "unknown destination without \\*" -> "{\\rtf1\\ansi {\\weird x}}",
      "bad hex escape" -> "{\\rtf1\\ansi \\'zq}",
      "hex escape to C0" -> "{\\rtf1\\ansi \\'07}",
      "uc without arg" -> "{\\rtf1\\ansi \\uc x}",
      "uc above 4" -> "{\\rtf1\\ansi \\uc9 x}",
      "u below 32" -> "{\\rtf1\\ansi \\u31 x}",
      "u without arg" -> "{\\rtf1\\ansi \\u x}",
      // lone UTF-16 surrogates are not scalar values (ADVICE r14)
      "u lone surrogate low bound" -> "{\\rtf1\\ansi \\u55296 x}",
      "u lone surrogate high bound" -> "{\\rtf1\\ansi \\u57343 x}",
      "bare backslash-minus-nothing" -> "{\\rtf1\\ansi \\b- x}",
      "raw 8-bit byte" -> "{\\rtf1\\ansi hé}",
      "depth bomb" -> ("{\\rtf1\\ansi " + "{" * 40 + "}" * 40 + "}"),
      "truncated mid-escape" -> "{\\rtf1\\ansi \\'e")
    cases.foreach { case (name, s) =>
      assert(parse(s).isEmpty, name)
    }
    assert(RtfLake.parseRtf(null).isEmpty)
    assert(RtfLake.parseRtf(Array.emptyByteArray).isEmpty)
    // boundary code points just OUTSIDE the surrogate range still parse
    assert(parse("{\\rtf1\\ansi \\u55295 x}").nonEmpty, "U+D7FF ok")
    assert(parse("{\\rtf1\\ansi \\u57344 x}").nonEmpty, "U+E000 ok")
    // a raw control byte in the data stream (built as bytes so the
    // source file itself stays hygiene-clean)
    assert(RtfLake.parseRtf("{\\rtf1\\ansi h".getBytes("ISO-8859-1") ++
      Array[Byte](7) ++ "i}".getBytes("ISO-8859-1")).isEmpty,
      "raw control byte")
    // control symbols render per spec
    assert(parse("{\\rtf1\\ansi a\\~b\\-c\\_d\\{e\\}f\\\\g}").get.text ==
      "a b" + "c-d{e}f\\g")
  }

  test("byte-flip + truncation sweeps never throw") {
    val seeds = RtfLake.rtfFixture(spark, 3).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 2; bit <- Seq(1, 0x80)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      RtfLake.parseRtf(c) // must not throw
    }
    val s0 = seeds.head
    (0 until s0.length by 3).foreach(n => RtfLake.parseRtf(s0.take(n)))
  }
}
