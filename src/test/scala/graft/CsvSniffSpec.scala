package graft

import graft.operators.CsvSniff

/** CSV dialect sniffer: quote-aware split laws, the fewest-fields
  * rule, header heuristic edges, adversarial inputs, fixture
  * replay. */
class CsvSniffSpec extends SparkSpec {

  test("quote-aware split: embedded delimiters, doubled quotes") {
    assert(CsvSniff.splitFields("a,b,c", ',', '"').get.toSeq ==
      Seq("a", "b", "c"))
    assert(CsvSniff.splitFields("\"a,b\",c", ',', '"').get.toSeq ==
      Seq("a,b", "c"))
    assert(CsvSniff.splitFields("\"he said \"\"hi\"\"\",x", ',', '"')
      .get.toSeq == Seq("he said \"hi\"", "x"))
    assert(CsvSniff.splitFields("'a;b';c", ';', '\'').get.toSeq ==
      Seq("a;b", "c"))
    assert(CsvSniff.splitFields("a,,c", ',', '"').get.toSeq ==
      Seq("a", "", "c"))
    assert(CsvSniff.splitFields("\"open,never closed", ',', '"').isEmpty,
      "unterminated quote")
  }

  test("RFC 4180 records: quoted newlines are content, not breaks") {
    // one state machine for records AND fields: LF / CRLF inside a
    // quoted field is data; outside, both end the record
    val recs = CsvSniff.parseCsv(
      "a,\"x\ny\"\r\nb,\"p\r\nq\"\nc,z", ',', '"').get
    assert(recs.map(_.toSeq).toSeq == Seq(
      Seq("a", "x\ny"), Seq("b", "p\r\nq"), Seq("c", "z")))
    // a quote left open at end of text rejects the whole parse
    assert(CsvSniff.parseCsv("a,\"open\nnever,closed", ',', '"').isEmpty)
    // the sample cut returns full records only, quote state unjudged
    val cut = CsvSniff.parseCsv("a,1\nb,2\nc,\"open", ',', '"',
      maxRecords = 2).get
    assert(cut.length == 2 && cut(1).toSeq == Seq("b", "2"))
    // sniff counts RECORDS, not physical lines, and extraction types
    // the embedded-newline cell as a string of its full length
    val shard = "h0,h1\n\"l1\nl2\",5\n\"m\",6\n"
    val f = CsvSniff.sniff(shard).get
    assert(f.nLines == 3 && f.dialect.nFields == 2 && f.hasHeader)
    val t = CsvSniff.extract(shard).get
    assert(t.nData == 2 && t.cols(0).kind == "string" &&
      t.cols(0).lmax == 5 && t.cols(1).kind == "long")
    // a quote opened PAST the 64-record sniff sample still rejects
    val late = (0 until 70).map(r => s"$r,${r * 2}").mkString("\n") +
      "\n71,\"open\n"
    assert(CsvSniff.sniff(late).isEmpty, "late unterminated quote")
    // a bare CR at end of text closes the final record (the pre-r17
    // per-line strip law): the last cell types numeric, not "6\r"
    val bareCr = CsvSniff.extract("h0,h1\n5,6\n7,8\r").get
    assert(bareCr.cols(1).kind == "long" && bareCr.cols(1).lsum == 14)
    // the most-records tie-break: every line led by an inch mark —
    // the double-quote candidate could merge line pairs into
    // 2-field records (admissible since r17's record machine), but
    // the single-quote parse keeps all four records and wins
    val inches = "\"a,1\n\"b,2\n\"c,3\n\"d,4\n"
    val im = CsvSniff.sniff(inches).get
    assert(im.dialect.quote == '\'' && im.nLines == 4,
      s"inch marks: got ${im.dialect} over ${im.nLines} records")
  }

  test("dialect selection: consistency + the fewest-fields rule") {
    // semicolons, single quotes, commas riding inside the quoted cell
    val f = CsvSniff.sniff("'x;y';1\n'a;b';2\n'c;d';3").get
    assert(f.dialect.delim == ';' && f.dialect.quote == '\'')
    assert(f.dialect.nFields == 2)
    // no quoted fields at all: the quote is unobservable, the fixed
    // order reports the double-quote default
    val g = CsvSniff.sniff("a|1\nb|2").get
    assert(g.dialect.delim == '|' && g.dialect.quote == '"')
    // a wrong quote would split 'a;b' apart -> 3 fields; the sniffer
    // must prefer the 2-field parse (fewest fields)
    assert(CsvSniff.sniff("'a;b';1\n'c;d';2").get.dialect.nFields == 2)
  }

  test("header heuristic: both verdicts and the all-string edge") {
    val withH = CsvSniff.sniff("name,score\nalice,10\nbob,20").get
    assert(withH.hasHeader && withH.nNumeric == 1)
    val noH = CsvSniff.sniff("1,alice\n2,bob").get
    assert(!noH.hasHeader && noH.nNumeric == 1)
    // all-string file: no numeric evidence anywhere -> NOT a header
    // (the heuristic needs a numeric row to distinguish; honesty
    // over guessing)
    val allS = CsvSniff.sniff("aa,bb\ncc,dd\nee,ff").get
    assert(!allS.hasHeader && allS.nNumeric == 0)
    // negative numbers and decimals are numeric; padded ones are not
    assert(CsvSniff.isNumeric("-12.5") && CsvSniff.isNumeric("7"))
    assert(!CsvSniff.isNumeric(" 7") && !CsvSniff.isNumeric("7a") &&
      !CsvSniff.isNumeric("1e5") && !CsvSniff.isNumeric(""))
  }

  test("adversarial inputs reject, never guess") {
    assert(CsvSniff.sniff(null).isEmpty)
    assert(CsvSniff.sniff("").isEmpty)
    assert(CsvSniff.sniff("only one line,with,commas").isEmpty)
    // inconsistent field counts under every candidate
    assert(CsvSniff.sniff("a,b,c\nd,e\nf").isEmpty)
    // no candidate reaches two fields
    assert(CsvSniff.sniff("plain text\nmore text").isEmpty)
    // CRLF line endings are accepted and do not leak \r into fields
    val crlf = CsvSniff.sniff("a,1\r\nb,2\r\n").get
    assert(crlf.nLines == 2 && crlf.dialect.nFields == 2)
  }

  test("randomized sweep: generated dialects are always recovered") {
    // 200 seeded-random files over the full candidate grid; string
    // cells embed the live delimiter and doubled-quote escapes, the
    // content alphabet excludes the other candidates so the true
    // dialect is the unique admissible minimum by construction
    val delims = Array(',', ';', '\t', '|')
    val quotes = Array('"', '\'')
    val rnd = new scala.util.Random(23041)
    (0 until 200).foreach { t =>
      val d = delims(rnd.nextInt(4))
      val q = quotes(rnd.nextInt(2))
      val nf = 2 + rnd.nextInt(5)
      val nr = 2 + rnd.nextInt(12)
      val header = rnd.nextBoolean()
      val numericCol = rnd.nextInt(nf) // at least one numeric column
      def word(): String =
        (0 until 1 + rnd.nextInt(5)).map(_ =>
          ('a' + rnd.nextInt(26)).toChar).mkString
      val head =
        if (header) Seq((0 until nf).map(j => s"h${j}${word()}")
          .mkString(d.toString))
        else Nil
      val data = (0 until nr).map { _ =>
        (0 until nf).map { j =>
          if (j == numericCol) (rnd.nextInt(2000) - 1000).toString
          else if (rnd.nextBoolean())
            s"$q${word()}$d${word()}$q$q$q" // quoted delim + escaped q
          else word()
        }.mkString(d.toString)
      }
      val text = (head ++ data).mkString("\n")
      val f = CsvSniff.sniff(text)
      assert(f.nonEmpty, s"sweep#$t")
      assert(f.get.dialect.delim == d && f.get.dialect.nFields == nf,
        s"sweep#$t d=$d q=$q nf=$nf: got ${f.get.dialect}")
      assert(f.get.hasHeader == header, s"sweep#$t header")
    }
  }

  test("fixture + sniffCsv: every dialect law recovered") {
    val fx = CsvSniff.csvFixture(spark, 12)
    val rows = CsvSniff.sniffCsv(fx, "id", "text")
      .orderBy("id").collect()
    assert(rows.length == 12)
    assert(rows.forall(_.getBoolean(7)), "all valid")
    // id 2: tab-delimited, double quote, no header (2%3!=0 -> header!)
    val r2 = rows(2)
    assert(r2.getString(2) == "\t" && r2.getString(3) == "\"" &&
      r2.getBoolean(5), "id 2: tab + header")
    // id 3: pipe, single quote, no header (3%3=0)
    val r3 = rows(3)
    assert(r3.getString(2) == "|" && r3.getString(3) == "'" &&
      !r3.getBoolean(5))
    // id 5: nf = 2+5%3 = 4... recompute: 2+2=4 fields, n_numeric =
    // count of j in 0..3 with (5+j)%2=0 -> j in {1,3} -> 2
    val r5 = rows(5)
    assert(r5.getInt(4) == 4 && r5.getInt(6) == 2)
  }

  test("typed extraction: closed kind rules, exact stats") {
    import graft.operators.CsvSniff.CsvCol
    def ext(s: String) = CsvSniff.extract(s)
    // pure longs, negatives included
    val t1 = ext("a,b\n-5,2\n10,3\n").get
    assert(t1.nData == 2)
    assert(t1.cols(0) == CsvCol(Some("a"), "long", -5, 10, 5))
    assert(t1.cols(1) == CsvCol(Some("b"), "long", 2, 3, 5))
    // mixed long + decimals promote to dec2 on the exact x100 axis
    val t2 = ext("x,y\n5,1.5\n-0.25,2\n").get
    assert(t2.cols(0) == CsvCol(Some("x"), "dec2", -25, 500, 475))
    assert(t2.cols(1) == CsvCol(Some("y"), "dec2", 150, 200, 350))
    // three decimals / 20 digits are NOT exactly representable in the
    // closed kinds: they census as strings (length stats), not a
    // lossy parse
    val t3 = ext("p,q\n1.234,99999999999999999999\n2,3\n").get
    assert(t3.cols(0).kind == "string" && t3.cols(0).lsum == 5 + 1)
    assert(t3.cols(1).kind == "string" && t3.cols(1).lsum == 20 + 1)
    // quoted numerics are data, and the quote strips before typing
    val t4 = ext("\"7\",z\n8,w\n").get
    assert(t4.cols(0).kind == "long" && t4.cols(0).lsum == 15)
    // no header: names absent
    assert(ext("1,2\n3,4\n").get.cols.forall(_.name.isEmpty))
    // field-count drift PAST the 64-line sniff sample rejects the
    // whole shard (the sniffer alone would have accepted it)
    val drift = (0 until 70).map(r => s"$r,${r * 2}").mkString("\n") +
      "\nlonely\n"
    assert(CsvSniff.sniff(drift).nonEmpty, "sniff accepts the sample")
    assert(ext(drift).isEmpty, "extraction rejects the drift")
    // sum overflow rejects the shard rather than wrapping: twelve
    // 18-digit rows sum past 2^63
    val big = (1 to 12).map(r => s"999999999999999999,$r").mkString("\n")
    assert(ext(big).isEmpty, "overflow must reject")
    assert(ext(null).isEmpty)
    assert(ext("only-one-line\n").isEmpty)
  }

  test("fixture + extractCsv: every typed law recovered") {
    val fx = CsvSniff.csvTypedFixture(spark, 12)
    val rows = CsvSniff.extractCsv(fx, "id", "text")
      .orderBy("id", "col").collect()
    assert(rows.forall(_.getBoolean(8)), "all valid")
    rows.foreach { r =>
      val i = r.getLong(0).toInt
      val j = r.getInt(1)
      val nr = 4 + i % 4
      assert(r.getInt(7) == nr, s"id=$i n_rows")
      if (i % 3 != 0) assert(r.getString(2) == s"h$j", s"id=$i name")
      else assert(r.isNullAt(2), s"id=$i no header")
      (i + j) % 3 match {
        case 0 =>
          assert(r.getString(3) == "long" &&
            r.getLong(4) == i * 10 + j &&
            r.getLong(5) == i * 10 + j + nr - 1, s"id=$i col=$j long")
        case 1 =>
          // `a<d>b\nc<r>` — 6 chars including the embedded newline
          assert(r.getString(3) == "string" && r.getLong(6) == 6L * nr,
            s"id=$i col=$j string")
        case _ =>
          assert(r.getString(3) == "dec2" &&
            r.getLong(4) == j * 100 + (i + j) % 100, s"id=$i col=$j dec2")
      }
    }
  }
}
