package graft

import graft.operators.DiffLake

/** Unified-diff walk: the count/arithmetic verification laws,
  * grammar strictness, fixture-law equality, byte-flip sweep. */
class DiffLakeSpec extends SparkSpec {

  private val good =
    """diff --git a/src/a.c b/src/a.c
      |index 00abc12..00def34 100644
      |--- a/src/a.c
      |+++ b/src/a.c
      |@@ -1,3 +1,4 @@
      | int main() {
      |-  return 1;
      |+  int x = 2;
      |+  return 0;
      | }
      |@@ -9,2 +10,1 @@
      | tail
      |-gone
      |diff --git a/b.txt b/b.txt
      |index 1111111..2222222
      |--- a/b.txt
      |+++ b/b.txt
      |@@ -5,1 +5,2 @@
      | keep
      |+added line 7
      |""".stripMargin

  private def parse(s: String) = DiffLake.parsePatch(s.getBytes("UTF-8"))

  test("a real multi-file patch parses with the right census") {
    val fs = parse(good).get
    assert(fs.map(_.path) == Vector("src/a.c", "b.txt"))
    val a = fs(0)
    assert((a.nHunks, a.nAdded, a.nRemoved, a.nContext) == (2, 2, 2, 3))
    assert(a.addedText == "  int x = 2;\n  return 0;")
    val b = fs(1)
    assert((b.nHunks, b.nAdded, b.nRemoved, b.nContext) == (1, 1, 0, 1))
    assert(b.addedText == "added line 7")
  }

  test("verification laws: count and arithmetic lies reject") {
    val rejects = Seq(
      "old count lies high" -> good.replace("@@ -1,3 +1,4 @@", "@@ -1,4 +1,4 @@"),
      "old count lies low" -> good.replace("@@ -1,3 +1,4 @@", "@@ -1,2 +1,4 @@"),
      "new count lies" -> good.replace("@@ -1,3 +1,4 @@", "@@ -1,3 +1,5 @@"),
      "new start ignores prior delta" ->
        good.replace("@@ -9,2 +10,1 @@", "@@ -9,2 +9,1 @@"),
      "hunks go backwards" ->
        good.replace("@@ -9,2 +10,1 @@", "@@ -1,2 +2,1 @@"),
      "paths disagree" -> good.replace("+++ b/src/a.c", "+++ b/src/a.cc"),
      "git line paths disagree" ->
        good.replace("diff --git a/b.txt b/b.txt", "diff --git a/b.txt b/c.txt"),
      "bad index hex" -> good.replace("00abc12..00def34", "00abg12..00def34"),
      "missing index line" -> good.replace("index 00abc12..00def34 100644\n", ""),
      "file without hunks" -> good.replace("@@ -5,1 +5,2 @@\n keep\n+added line 7\n", ""),
      "foreign line in hunk" -> good.replace(" int main() {", "int main() {"),
      "no-newline marker (out of subset)" ->
        good.replace("+added line 7\n", "+added line 7\n\\ No newline at end of file\n"),
      "trailing junk" -> (good + "junk\n"),
      "empty" -> "")
    rejects.foreach { case (name, d) => assert(parse(d).isEmpty, name) }
    assert(DiffLake.parsePatch(null).isEmpty)
    assert(DiffLake.parsePatch(Array(0xc3.toByte, 0x28.toByte)).isEmpty,
      "invalid utf8")
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = DiffLake.extractDiffs(
      DiffLake.diffFixture(spark, 12), "id", "media").collect()
    assert(out.forall(_.getBoolean(9)))
    assert(out.length == (0 until 12).map(i => 1 + i % 3).sum)
    out.foreach { r =>
      val (i, f) = (r.getLong(0), r.getInt(1))
      val nh = 1 + (i + f) % 2
      assert(r.getString(2) == s"src/f${i}_$f.scala")
      assert(r.getInt(3) == nh && r.getInt(5) == nh && r.getInt(6) == 2 * nh)
      val added = (0L until nh).flatMap { h =>
        (0L until (1 + (i + f + h) % 2)).map { j =>
          s"new a${(i * 5 + f * 3 + h * 2 + j) % 10} b${(i + f + h + j) % 7}"
        }
      }
      assert(r.getInt(4) == added.size)
      assert(r.getString(7) == added.mkString("\n"), s"added ($i,$f)")
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = DiffLake.diffFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      DiffLake.parsePatch(c) // must not throw
    }
  }
}
