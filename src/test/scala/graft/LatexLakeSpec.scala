package graft

import graft.operators.LatexLake

/** LaTeX kernel laws: construct residues, math/prose split,
  * strictness matrix, fixture-law equality, byte-flip sweep. */
class LatexLakeSpec extends SparkSpec {

  private def doc(body: String, preamble: String = ""): String =
    s"\\documentclass{article}\n$preamble\\begin{document}\n$body\\end{document}\n"
  private def parse(s: String) = LatexLake.parseTex(s.getBytes("UTF-8"))
  private def text(body: String): Option[String] = parse(doc(body)).map(_.text)

  test("kernel: construct residues and the math/prose split") {
    assert(text("plain words\n").contains("plain words"))
    assert(text("\\section{Intro}\nbody\n").contains("Intro body"))
    assert(text("\\emph{em} \\textbf{bf} \\textit{it}\n").contains("em bf it"))
    assert(text("a~b \\\\ c\n").contains("a b c"))
    assert(text("p \\% q \\& r \\_ s \\$ t \\# u\n")
      .contains("p % q & r _ s $ t # u"))
    assert(text("pre {grouped {deep}} post\n").contains("pre grouped deep post"))
    assert(text("x % comment gone\ny\n").contains("x y"))
    assert(text("a $e=mc^2$ b\n").contains("a b"), "inline math excluded")
    assert(text("a \\[x^2\\] b\n").contains("a b"), "display math excluded")
    assert(text("a \\begin{equation}y_i\\end{equation} b\n").contains("a b"))
    assert(text("a \\cite{k1} b \\ref{f} c \\label{l} d\n")
      .contains("a b c d"))
    assert(text("\\begin{itemize}\\item x\\item y\\end{itemize}\n")
      .contains("x y"))
    val d = parse(doc(
      "\\section{S}\n$ab$ $$cde$$ \\[fg\\] \\begin{equation}hi\\end{equation}" +
        " \\cite{a} \\cite{b}\n",
      preamble = "\\title{My \\& T}\n\\author{Me}\n")).get
    assert(d.title == "My & T" && d.author == "Me")
    assert((d.nSections, d.nMath, d.mathChars, d.nCites) == (1, 4, 9L, 2))
  }

  test("strictness matrix: every violation rejects") {
    val rejects = Seq(
      "unknown command" -> doc("\\fancy{x}\n"),
      "bare ampersand" -> doc("a & b\n"),
      "bare underscore" -> doc("a_b\n"),
      "bare caret" -> doc("a^b\n"),
      "unbalanced group open" -> doc("{a\n"),
      "unbalanced group close" -> doc("a}\n"),
      "unclosed inline math" -> doc("$x\n"),
      "unclosed display math" -> doc("\\[x\n"),
      "unclosed equation env" -> doc("\\begin{equation}x\n"),
      "unknown environment" -> doc("\\begin{tabular}x\\end{tabular}\n"),
      "item outside a list env" -> doc("\\item x\n"),
      "mismatched env end" ->
        doc("\\begin{itemize}\\item x\\end{enumerate}\n"),
      "content after end document" -> (doc("x\n") + "tail"),
      "missing end document" -> "\\documentclass{article}\\begin{document}x",
      "no documentclass" -> "\\begin{document}x\\end{document}",
      "command in heading" -> doc("\\section{\\emph{x}}\n"),
      "stray preamble command" ->
        "\\documentclass{article}\\pagestyle{x}\\begin{document}x\\end{document}")
    rejects.foreach { case (name, s) => assert(parse(s).isEmpty, name) }
    assert(LatexLake.parseTex(null).isEmpty)
    assert(LatexLake.parseTex(Array(0xc3.toByte, 0x28.toByte)).isEmpty)
  }

  test("fixture laws: extract output matches the closed forms") {
    val out = LatexLake.extractLatex(
      LatexLake.latexFixture(spark, 12), "id", "media")
      .orderBy("id").collect()
    assert(out.forall(_.getBoolean(10)))
    assert(out.length == 12)
    out.foreach { r =>
      val i = r.getLong(0)
      val ns = 1 + i % 3
      assert(r.getString(1) == s"T$i & co")
      assert(r.getString(2) == s"A${i % 7}")
      val want = (0L until ns).map { s =>
        def w(j: Long) = (i * 7 + s * 3 + j) % 10
        s"S$s h${(i + s) % 10} w${w(0)} w${w(1)} w${w(2)} w${w(3)} " +
          s"e&f li${(i + s) % 8} lj${(i + s) % 6}"
      }.mkString(" ")
      assert(r.getString(3) == want, s"text $i")
      assert(r.getLong(4) == ns * 9)
      assert(r.getInt(6) == ns && r.getInt(9) == ns)
      assert(r.getInt(7) == ns + ns / 2)
      assert(r.getLong(8) == ns * 5 + (ns / 2) * 4)
    }
  }

  test("byte-flip sweep never throws") {
    val seeds = LatexLake.latexFixture(spark, 2).collect()
      .map(_.getAs[Array[Byte]](1))
    for (src <- seeds; i <- src.indices by 5; bit <- Seq(1, 64)) {
      val c = src.clone(); c(i) = (c(i) ^ bit).toByte
      LatexLake.parseTex(c) // must not throw
    }
  }
}
