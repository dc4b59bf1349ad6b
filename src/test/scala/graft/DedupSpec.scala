package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("SortedIntersectCount ≡ size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 300).map { _ =>
      def arr() = (0 until rnd.nextInt(30))
        .map(_ => s"w${rnd.nextInt(40)}").distinct.sorted
      (arr(), arr())
    } :+ ((Seq.empty[String], Seq("a"))) :+ ((Seq("a"), Seq.empty[String]))
    val df = rows.toDF("a", "b")
    val out = df.select(
        graft.functions.SortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark query engines and shuffles here"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "tiny doc")).toDF("doc_id", "text")

  test("exact dedup: representative + multiplicity per distinct text") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val byKeep = out.map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dups")).toMap
    assert(byKeep(0L) == 2) // docs 0 and 3
    assert(byKeep(1L) == 1 && byKeep(2L) == 1 && byKeep(4L) == 1)
  }

  test("jaccard join finds near+exact dup pairs, skips unrelated and short docs") {
    val pairs = Dedup.jaccardJoin(docs, "doc_id", "text", 0.5)
      .orderBy("a", "b").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("jaccard join: exact dup pair has inter == union") {
    val r = Dedup.jaccardJoin(docs, "doc_id", "text", 0.5)
      .where(col("a") === 0 && col("b") === 3).collect()(0)
    assert(r.getAs[Long]("n_inter") == r.getAs[Long]("n_union"))
  }

  test("prefix-filtered jaccard join equals unfiltered on sf0.001 documents") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // thresholds beyond 0.5 on purpose: 0.1/0.3 are not exactly
    // representable doubles, exercising the ceil(t*sz) prefix-length
    // boundary (sound because candidate generation and verification
    // share the same double t; fl-ceil never exceeds true-ceil)
    for (t <- Seq(0.1, 0.3, 0.5)) {
      val full = Dedup.jaccardJoin(d, "doc_id", "text", t, prefixFilter = false)
        .orderBy("a", "b").collect()
      val pref = Dedup.jaccardJoin(d, "doc_id", "text", t, prefixFilter = true)
        .orderBy("a", "b").collect()
      assert(full.nonEmpty)
      assert(pref.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq, s"t=$t")
    }
  }

  test("hot-token salted path is candidate-set exact: cutoff=1 equals default") {
    // hotTokenCutoff=1 forces EVERY shared token through the salted
    // join (any posting list with 2+ entries is 'hot'); outputs must
    // be bit-identical to the effectively-unsalted default — salting
    // re-partitions the join's work, never its result. Exercises the
    // self-join, the cross Jaccard, and the containment join; odd
    // saltFactor 3 so group sizes are uneven.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val l = d.where(col("doc_id") % 4 =!= 0)
    val r = d.where(col("doc_id") % 4 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("a", "b").collect().map(_.toSeq).toSeq
    assert(rows(Dedup.jaccardJoin(d, "doc_id", "text", 0.3,
        hotTokenCutoff = 1, saltFactor = 3)) ==
      rows(Dedup.jaccardJoin(d, "doc_id", "text", 0.3)))
    assert(rows(Dedup.jaccardJoinCross(l, r, "doc_id", "text", 0.3,
        hotTokenCutoff = 1, saltFactor = 3)) ==
      rows(Dedup.jaccardJoinCross(l, r, "doc_id", "text", 0.3)))
    assert(rows(Dedup.containmentJoinCross(l, r, "doc_id", "text", 0.5,
        hotTokenCutoff = 1, saltFactor = 3)) ==
      rows(Dedup.containmentJoinCross(l, r, "doc_id", "text", 0.5)))
  }

  test("containment prefix filter is complete: near-unfiltered run agrees at every threshold") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val l = d.where(col("doc_id") % 4 =!= 0)
    val r = d.where(col("doc_id") % 4 === 0)
    // t = 1e-6 keeps every right doc's FULL token set in the index
    // (prefix size sz − ⌈t·sz⌉ + 1 = sz for sz ≤ 1e6), so this run
    // reproduces the unfiltered candidate set; re-thresholding its
    // integer evidence is an independent reference for filtered runs
    val base = Dedup.containmentJoinCross(l, r, "doc_id", "text", 1e-6)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val ref = base.filter { case (_, _, ni, nb) => nb > 0 && ni.toDouble >= t * nb }
        .sortBy(x => (x._1, x._2)).toSeq
      val got = Dedup.containmentJoinCross(l, r, "doc_id", "text", t)
        .orderBy("a", "b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq
      assert(got == ref, s"t=$t")
    }
    assert(base.exists { case (_, _, ni, nb) => nb > 0 && ni.toDouble >= 0.8 * nb },
      "fixture should contain qualifying containment pairs")
  }

  test("minhash LSH equals exact jaccard join on sf0.001 documents") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.jaccardJoin(d, "doc_id", "text", 0.5).orderBy("a", "b").collect()
    val lsh = Dedup.minhashLsh(d, "doc_id", "text", 0.5).orderBy("a", "b").collect()
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("cross-corpus jaccard join pairs left docs with right near-dups only") {
    val left = docs.where(col("doc_id").isin(0L, 2L, 4L))
    val right = docs.where(col("doc_id").isin(1L, 3L))
    val pairs = Dedup.jaccardJoinCross(left, right, "doc_id", "text", 0.5)
      .orderBy("a", "b").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    // doc 0 near-dups 1 and exactly matches 3; 2 and 4 match nothing
    assert(pairs.toSeq == Seq((0L, 1L), (0L, 3L)))
  }

  test("cross-corpus jaccard: prefix filter equals unfiltered on sf0.001 split") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val l = d.where(col("doc_id") % 4 =!= 0)
    val r = d.where(col("doc_id") % 4 === 0)
    val full = Dedup.jaccardJoinCross(l, r, "doc_id", "text", 0.5, prefixFilter = false)
      .orderBy("a", "b").collect()
    val pref = Dedup.jaccardJoinCross(l, r, "doc_id", "text", 0.5, prefixFilter = true)
      .orderBy("a", "b").collect()
    assert(pref.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("cross-corpus minhash LSH equals cross-corpus exact jaccard on sf0.001") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val l = d.where(col("doc_id") % 4 =!= 0)
    val r = d.where(col("doc_id") % 4 === 0)
    val exact = Dedup.jaccardJoinCross(l, r, "doc_id", "text", 0.5)
      .orderBy("a", "b").collect()
    val lsh = Dedup.minhashLshCross(l, r, "doc_id", "text", 0.5)
      .orderBy("a", "b").collect()
    assert(lsh.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("decontaminate drops exactly the corpus docs near-duplicating the eval set") {
    val corpus = docs.where(col("doc_id").isin(0L, 2L, 4L))
    val eval = docs.where(col("doc_id").isin(1L, 3L))
    val kept = Dedup.decontaminate(corpus, eval, "doc_id", "text", 0.5)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L, 4L)) // 0 leaks eval docs 1 and 3
  }

  test("decontaminateSubstring drops corpus docs sharing an n-token window with eval") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // shares 4-window with eval 10
      (1L, "one two three four five six seven"),   // clean
      (2L, "tiny")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "XX alpha beta gamma delta YY")).toDF("doc_id", "text")
    val kept = Dedup.decontaminateSubstring(corpus, eval, "doc_id", "text",
      windowTokens = 4)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("clusters: transitive chains collapse to one component") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("id")
    // chain 0-1-2, pair 3-4, singleton 5
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val out = Dedup.clusters(ids, pairs).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cluster")))
    assert(out.toSeq == Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 5L)))
  }

  test("clusters: 1000-node chain converges within O(log n) star rounds") {
    // adversarial for min-label propagation (needs diameter ≈ 1000
    // rounds); the alternating large-star/small-star rounds must
    // collapse it within the default budget — maxIters = 12 ≈ log2(n)
    // + slack, and a wrong/unconverged run can't produce these labels.
    // driver gate 0: the distributed star rounds are the subject
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val n = 1000L
      val ids = spark.range(n).toDF("id")
      val pairs = spark.range(n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val out = Dedup.clusters(ids, pairs, maxIters = 12)
        .agg(org.apache.spark.sql.functions.sum(col("cluster")).as("s"),
          org.apache.spark.sql.functions.count(lit(1)).as("c"))
        .collect()(0)
      assert(out.getLong(1) == n)
      assert(out.getLong(0) == 0L, "every node must label to the chain min 0")
    } finally spark.conf.unset("spark.graft.graph.driverGraphBytes")
  }

  test("clusters: driver union-find kernel ≡ distributed star rounds") {
    val rnd = new scala.util.Random(43)
    val ids = spark.range(80).toDF("id")
    val pairs = (0 until 120).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).toDF("a", "b")
    val kernel = Dedup.clusters(ids, pairs).orderBy("id")
      .collect().toSeq.map(_.toSeq)
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val dist = Dedup.clusters(ids, pairs).orderBy("id")
        .collect().toSeq.map(_.toSeq)
      assert(dist == kernel)
    } finally spark.conf.unset("spark.graft.graph.driverGraphBytes")
    assert(kernel.nonEmpty)
  }

  test("dedupNear: keeps one representative per near-dup cluster") {
    val out = Dedup.dedupNear(docs, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // docs 0,1,3 form one cluster (keep 0); 2 and 4 survive alone
    assert(out == Seq(0L, 2L, 4L))
  }

  test("normalizedKey: case/punct/whitespace variants collapse, distinct texts don't") {
    val df = Seq(
      (0L, "Foo Bar, baz!"),
      (1L, "foo\tbar   baz"),   // tab + run of spaces — same key as 0
      (2L, "foo\nbar baz"),     // newline — same key as 0
      (3L, "foobar baz"),       // genuinely different (no split)
      (4L, "foo bar qux")).toDF("doc_id", "text")
    val out = Dedup.normalizedExact(df, "doc_id", "text")
      .orderBy("keep_id").collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_dups")).toMap
    assert(out == Map(0L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  test("dedupNear: heavy exact-dup clusters collapse before the band join") {
    // the pre-pass case: one text repeated 40x + a near-dup variant
    // repeated 10x + distinct background. Components must merge the
    // exact group, its near-dup group, and nothing else — and the
    // LSH band join only ever sees one row per distinct text.
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val rows =
      (0 until 40).map(i => (i.toLong, base)) ++
      (40 until 50).map(i => (i.toLong, near)) ++
      Seq((50L, "completely different content about spark query engines and shuffles here"),
          (51L, "another unrelated document mentioning columnar layouts and vectorized reads"))
    val df = rows.toDF("doc_id", "text")
    val kept = Dedup.dedupNear(df, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 50L, 51L))
  }

  test("simhashNearDup: equals brute force on random fingerprints for several maxDist") {
    val rnd = new scala.util.Random(13)
    // 120 random base fingerprints, each with a planted variant at a
    // known Hamming distance 0..6 (distinct flip positions)
    val fps: Seq[(Long, Long)] = (0 until 120).flatMap { i =>
      val f = rnd.nextLong()
      val flips = i % 7
      val positions = rnd.shuffle((0 until 64).toList).take(flips)
      val variant = positions.foldLeft(f)((v, p) => v ^ (1L << p))
      Seq((2L * i, f), (2L * i + 1, variant))
    }
    def brute(maxDist: Int): Set[(Long, Long, Int)] =
      (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        h = java.lang.Long.bitCount(fa ^ fb) if h <= maxDist
      } yield (a, b, h)).toSet
    val df = fps.toDF("id", "simhash")
    for (maxDist <- Seq(1, 2, 3, 5)) {
      val got = Dedup.simhashNearDup(df, maxDist).collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Int]("hamming"))).toSet
      assert(got == brute(maxDist), s"maxDist=$maxDist")
    }
  }

  test("dedupNear: identical sub-shingle-length docs still merge (exact pre-pass)") {
    // "tiny doc" has an empty 3-gram shingle set — LSH can't see it,
    // but two identical copies ARE duplicates and the exact pre-pass
    // must link them
    val df = Seq(
      (0L, "tiny doc"), (1L, "tiny doc"),
      (2L, "another tiny"), (3L, "a full length document with plenty of words inside it")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupNear(df, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L))
  }

  test("simhash: near-dups close in Hamming space, unrelated far apart") {
    val fps = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(0L) == fps(3L), "identical text, identical fingerprint")
    assert(ham(fps(0L), fps(1L)) <= 6, "one-word edit stays close")
    assert(ham(fps(0L), fps(2L)) > 10, "unrelated text is far")
    assert(ham(fps(0L), fps(1L)) < ham(fps(0L), fps(2L)))
    // pigeonhole chunk join finds exactly the pairs within the radius
    val nd = Dedup.simhashNearDup(Dedup.simhash(docs, "doc_id", "text"), maxDist = 6)
      .orderBy("a", "b").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(nd.toSeq == Seq((0L, 1L), (0L, 3L), (1L, 3L)))
    // exact-dup pair at distance 0 with the default radius too
    val nd0 = Dedup.simhashNearDup(Dedup.simhash(docs, "doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(nd0.contains((0L, 3L)))
  }

  test("canonicalSelect: keeps the longest doc per cluster, id tiebreak, singletons intact") {
    // ids 1,2,5 form one near-dup cluster (5 is the longest → kept,
    // beating min-id 1); 3 and 4 are identical length-wise (tie →
    // lower id 3 kept... but identical TEXTS so same token count);
    // 9 is a singleton
    val base = "the quick brown fox jumps over a lazy dog near the river bank today"
    val df = Seq(
      (1L, base),
      (2L, base + " again"),
      (5L, base + " again and again tonight"),
      (3L, "completely different text about spark engines and parquet files ok"),
      (4L, "completely different text about spark engines and parquet files ok"),
      (9L, "a lone unrelated document with nothing shared at all here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .canonicalSelect(df, "doc_id", "text", 0.5)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 5L, 3L, 18L),   // cluster of 1,2,5 → keep 5 (18 tokens)
      (3L, 3L, 2L, 10L),   // identical pair → token tie → keep id 3
      (9L, 9L, 1L, 10L)),  // singleton keeps itself
      s"got ${out.toSeq}")
    // partition-count invariance
    val repart = graft.operators.Dedup
      .canonicalSelect(df.repartition(5), "doc_id", "text", 0.5)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(repart.toSeq == out.toSeq)
  }
}
