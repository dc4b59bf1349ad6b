package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Bm25, Salting, Sampling}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample: deterministic, partition-independent, rate-accurate") {
    val rows = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("id", "stratum")
    val rates = Map("a" -> BigDecimal("0.5"), "b" -> BigDecimal("0.1"))
    val s1 = Sampling.stratifiedSample(df, "id", "stratum", rates, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    // same input re-partitioned → identical sample (pure filter)
    val s2 = Sampling.stratifiedSample(df.repartition(17), "id", "stratum",
      rates, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val aKept = s1.count(_ % 2 == 0).toDouble / 2000
    val bKept = s1.count(_ % 2 == 1).toDouble / 2000
    assert(math.abs(aKept - 0.5) < 0.05, s"a rate $aKept")
    assert(math.abs(bKept - 0.1) < 0.03, s"b rate $bKept")
    // different seed → different sample
    val s3 = Sampling.stratifiedSample(df, "id", "stratum", rates, seed = 8L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s3 != s1)
    // rate 1 keeps everything, default rate 0 drops unknown strata
    val all = Sampling.stratifiedSample(df, "id", "stratum",
      Map("a" -> BigDecimal(1)), seed = 7L).select("id").collect()
    assert(all.length == 2000 && all.forall(_.getLong(0) % 2 == 0))
  }

  test("mixtureSchedule: proportional interleave, deterministic, drops unweighted strata") {
    val rows = (0L until 900L).map(i => (i, s"s${i % 3}"))
    val df = rows.toDF("id", "stratum")
    val weights = Map("s0" -> 1L, "s1" -> 3L) // s2 unweighted → dropped
    val sched = Sampling.mixtureSchedule(df, "id", "stratum", weights, seed = 5L)
      .select("sched_key", "stratum", "id")
      .orderBy("sched_key", "stratum", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sched.length == 600, "unweighted stratum dropped")
    assert(!sched.exists(_._2 == "s2"))
    // proportionality: every prefix ending at a full cycle holds a
    // 1:3 ratio; check the first 200 scheduled rows ≈ 50/150 ± cycle
    val prefix = sched.take(200)
    val n1 = prefix.count(_._2 == "s1")
    assert(math.abs(n1 - 150) <= 3, s"s1 in prefix: $n1")
    // sched_key is rn·stride exactly: min keys are stride-sized
    val s0Keys = sched.filter(_._2 == "s0").map(_._1)
    val s1Keys = sched.filter(_._2 == "s1").map(_._1)
    assert(s0Keys.min == 3L && s1Keys.min == 1L) // lcm(1,3)=3
    // deterministic across partitioning
    val again = Sampling.mixtureSchedule(df.repartition(13), "id", "stratum",
        weights, seed = 5L)
      .select("sched_key", "stratum", "id")
      .orderBy("sched_key", "stratum", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sched.toSeq == again.toSeq)
  }

  test("stratifiedExactK: exactly k per stratum, partition-independent, prefix-stable") {
    val rows = (0L until 300L).map(i => (i, s"s${i % 3}")) ++
      Seq((1000L, "tiny"), (1001L, "tiny")) // stratum smaller than k
    val df = rows.toDF("id", "stratum")
    val s1 = Sampling.stratifiedExactK(df, "id", "stratum", k = 10, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.count(_._2 == "s0") == 10)
    assert(s1.count(_._2 == "s1") == 10)
    assert(s1.count(_._2 == "s2") == 10)
    assert(s1.count(_._2 == "tiny") == 2, "undersized stratum keeps all rows")
    val s2 = Sampling.stratifiedExactK(df.repartition(13), "id", "stratum",
      k = 10, seed = 7L).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.toSet == s2.toSet, "selection must not depend on partitioning")
    // prefix property: growing k only ADDS rows, never swaps them
    val s3 = Sampling.stratifiedExactK(df, "id", "stratum", k = 20, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.toSet.subsetOf(s3.toSet))
  }

  test("sequencePack: distributed prefix sum equals sequential, partition-independent") {
    import graft.operators.Packing
    val rnd = new scala.util.Random(23)
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(40).toLong))
    val df = rows.toDF("id", "toks")
    def packed(d: org.apache.spark.sql.DataFrame) =
      Packing.sequencePack(d, "id", "toks", budget = 100L)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got = packed(df)
    // sequential reference
    var cum = 0L
    rows.foreach { case (i, t) =>
      val (id, start, bFirst, bLast) = got(i.toInt)
      assert(id == i && start == cum, s"offset drift at id $i")
      assert(bFirst == cum / 100 && bLast == (cum + math.max(t, 1) - 1) / 100)
      cum += t
    }
    // partitioning must not change anything
    assert(packed(df.repartition(11)).toSeq == got.toSeq)
    assert(packed(df.coalesce(1)).toSeq == got.toSeq)
  }

  test("stratified sample: NEGATIVE (hashed) ids sample at the stated rate") {
    // xxhash64-style ids are negative ~half the time; decimal % follows
    // the dividend sign, so an unreduced hash would be < every
    // threshold and the row always kept — the operator must range-
    // reduce first. Also exercises ids near ±Long.Max (the DECIMAL(38)
    // overflow regime of a one-shot 20x20-digit multiply).
    val rnd = new scala.util.Random(99)
    val ids = (0 until 4000).map(_ => rnd.nextLong()) :+
      Long.MaxValue :+ Long.MinValue :+ -1L
    val df = ids.map((_, "a")).toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(df, "id", "stratum",
      Map("a" -> BigDecimal("0.1")), seed = 7L).count()
    val rate = kept.toDouble / ids.size
    assert(math.abs(rate - 0.1) < 0.03, s"rate $rate")
  }

  test("salted equi-join equals plain join on skewed data") {
    // 10k rows of one hot key + tail
    val big = spark.range(10000).select(
      when(col("id") < 9000, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("payload"))
    val small = Seq((7L, "hot"), (3L, "cold"), (11L, "mild"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k")).orderBy("payload")
      .select("k", "payload", "label").collect()
    val salted = Salting.saltedEquiJoin(big, small, Seq("k")).orderBy("payload")
      .select("k", "payload", "label").collect()
    assert(plain.length > 9000, "hot key must dominate")
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("asof forward: earliest right row at or after left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L), (2L, 1L, 400L))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asofForward(left, right, "k", "k", "t", "rt", Seq("v"))
      .orderBy("name").collect()
      .map(r => (r.getAs[String]("name"), Option(r.get(r.fieldIndex("v")))))
    assert(out.toSeq == Seq(
      ("e1", Some(100L)), // t=10 matches rt=10 inclusively
      ("e2", Some(300L)), // t=25 → earliest at/after is 30
      ("e3", None)))      // t=5, only right row is at 1 → nothing after
  }

  test("asof backward matches reference semantics on ties and misses") {
    val left = Seq((1L, 10L, "a"), (1L, 9L, "b")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 1L), (1L, 5L, 2L)).toDF("k", "rt", "v")
    val out = AsOfJoin.asofBackward(left, right, "k", "k", "t", "rt", Seq("v"))
      .collect().map(r => (r.getAs[String]("name"), r.getAs[Long]("v"))).toMap
    assert(out("a") == 1L) // inclusive tie at t=10
    assert(out("b") == 2L) // most recent before 9 is 5
  }

  test("temperatureFlatten: sqrt budgets, rare-stratum up-weighting, determinism") {
    // strata: a=400 rows, b=100, c=4 → k = 2·⌊√c⌋ = 40, 20, 4
    val rows = (0L until 400L).map((_, "a")) ++
      (1000L until 1100L).map((_, "b")) ++ (2000L until 2004L).map((_, "c"))
    val df = rows.toDF("id", "stratum")
    val out = Sampling.temperatureFlatten(df, "id", "stratum", scale = 2L, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySize = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySize == Map("a" -> 40, "b" -> 20, "c" -> 4), s"got $bySize")
    // kept FRACTION grows as strata shrink (the flattening point):
    // a keeps 10%, b 20%, c 100% (k = min(c, 2·√c) caps at the stratum)
    // determinism + partition independence
    val again = Sampling.temperatureFlatten(df.repartition(13), "id", "stratum",
      scale = 2L, seed = 3L).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // hash-prefix stability: scale=1 budgets are a PREFIX of scale=2's
    val half = Sampling.temperatureFlatten(df, "id", "stratum", scale = 1L, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(half.subsetOf(out.toSet))
  }

  test("bm25: hand-computed score, rank order, shuffle-free scoring plan") {
    // corpus of 4: "rare" appears in 1 doc, "common" in 3
    val docs = Seq(
      (1L, "rare common x"),
      (2L, "common common y z"),
      (3L, "common a b"),
      (4L, "p q r s t")).toDF("doc_id", "text")
    val out = Bm25.score(docs, "doc_id", "text", Seq("rare", "common"),
      lnIdf = true).orderBy("id").collect()
    // independent reference computation (classic Lucene BM25)
    val dls = Map(1L -> 3.0, 2L -> 4.0, 3L -> 3.0, 4L -> 5.0)
    val tfs = Map( // (tf_rare, tf_common)
      1L -> (1.0, 1.0), 2L -> (0.0, 2.0), 3L -> (0.0, 1.0), 4L -> (0.0, 0.0))
    val avgdl = dls.values.sum / 4.0
    def ref(id: Long): Double = {
      def term(tf: Double, df: Double): Double = {
        val idf = math.log1p((4.0 - df + 0.5) / (df + 0.5))
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dls(id) / avgdl)))
      }
      term(tfs(id)._1, 1.0) + term(tfs(id)._2, 3.0)
    }
    out.foreach { r =>
      val id = r.getLong(0)
      assert(math.abs(r.getAs[Double]("score") - ref(id)) < 1e-12,
        s"doc $id: got ${r.getAs[Double]("score")}, want ${ref(id)}")
    }
    // ranking: the rare-term doc wins, the no-term doc scores 0 last
    val ranked = Bm25.topK(docs, "doc_id", "text", Seq("rare", "common"),
      k = 4, lnIdf = true).select("id").collect().map(_.getLong(0)).toSeq
    assert(ranked.head == 1L && ranked.last == 4L, s"ranked $ranked")
    // scale claim from the scaladoc: scoring shuffles NOTHING — the
    // only Exchange under topK feeds the final TakeOrdered
    val plan = Bm25.score(docs, "doc_id", "text", Seq("rare"), lnIdf = false)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"per-doc scoring must not hash-shuffle:\n$plan")
  }
}
