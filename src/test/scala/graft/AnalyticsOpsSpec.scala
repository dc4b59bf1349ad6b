package graft

import org.apache.spark.sql.functions._

import graft.operators.{Intervals, PhraseSearch, Sampling, Skyline}

/** Property gates for the session-3 analytics operators: each is
  * checked against an independent brute-force/local reference on
  * seeded random inputs, plus the structural invariants that define
  * the operator (dominance-freedom, island disjointness, overlap
  * counting, grid absorption). */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------- skyline
  private def bruteSkyline(pts: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] =
    pts.filter { case (_, c, s) =>
      !pts.exists { case (_, c2, s2) =>
        c2 <= c && s2 >= s && (c2 < c || s2 > s)
      }
    }.toSet

  test("skyline2d matches brute-force dominance, ties survive together") {
    val rnd = new scala.util.Random(3)
    // duplicate (cost, size) pairs included — both copies must survive
    // or fall together
    val base = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val pts = base ++ base.take(20).map { case (i, c, s) => (i + 1000, c, s) }
    val got = Skyline.skyline2d(pts.toDF("id", "c", "s"), "c", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSkyline(pts), s"got $got\nwant ${bruteSkyline(pts)}")
    assert(got.nonEmpty)
  }

  test("skyline2d: a single strictly-dominating point wins alone") {
    val pts = Seq((1L, 0L, 99L), (2L, 5L, 99L), (3L, 0L, 5L), (4L, 7L, 100L))
    val got = Skyline.skyline2d(pts.toDF("id", "c", "s"), "c", "s")
      .collect().map(_.getLong(0)).toSet
    // (1) dominates (2) and (3); (4) survives on size
    assert(got == Set(1L, 4L))
  }

  // --------------------------------------------------- intervals
  test("Intervals.coalesce: islands are disjoint, gapped, and complete") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 400).map { i =>
      val s = rnd.nextInt(2000).toLong
      (rnd.nextInt(4).toLong, s, s + 1 + rnd.nextInt(60).toLong, i.toLong)
    }
    val out = Intervals.coalesce(rows.toDF("k", "s", "e", "id"),
        "k", "s", "e", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // per key: islands sorted by start must be strictly gapped
    // (next start > prev end), covered = end - start, and row counts
    // sum to the input size
    out.groupBy(_._1).foreach { case (_, isl) =>
      val sorted = isl.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, pe, _, _), (_, ns, _, _, _)) =>
          assert(ns > pe, s"islands touch or overlap: $sorted")
        case _ =>
      }
    }
    assert(out.map(_._4).sum == rows.size)
    assert(out.forall { case (_, s, e, _, cov) => cov == e - s && e > s })
    // every input interval is inside exactly one island of its key
    rows.foreach { case (k, s, e, _) =>
      assert(out.count { case (ik, is, ie, _, _) =>
        ik == k && is <= s && e <= ie } == 1)
    }
  }

  test("Intervals.coalesce: half-open abutting intervals chain into one") {
    // [0,10) and [10,20) abut (10 > pmax=10 is false) → one island
    val rows = Seq((1L, 0L, 10L, 1L), (1L, 10L, 20L, 2L), (1L, 21L, 25L, 3L))
    val out = Intervals.coalesce(rows.toDF("k", "s", "e", "id"),
        "k", "s", "e", "id")
      .orderBy("island").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 0L && out(0).getLong(3) == 20L)
    assert(out(1).getLong(2) == 21L && out(1).getLong(3) == 25L)
  }

  // ------------------------------------------------------- scd2
  test("scd2Build: versions at value changes, closed intervals, null-safe") {
    val obs = Seq( // (key, attr, ts, tie)
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, null, 40L, 4L), (1L, null, 50L, 5L), (1L, "a", 60L, 6L),
      (2L, "x", 5L, 7L)
    )
    val out = graft.operators.Scd
      .scd2Build(obs.toDF("k", "attr", "ts", "tie"), "k", "attr", "ts", "tie")
      .orderBy("k", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, "a", 10L, 29L, 2L),   // two equal obs collapse
      (1L, 2L, "b", 30L, 39L, 1L),
      (1L, 3L, null, 40L, 59L, 2L),  // value→null opens a version
      (1L, 4L, "a", 60L, -1L, 1L),   // live version: open-ended
      (2L, 1L, "x", 5L, -1L, 1L)))
    // intervals tile the key's observed range with no gap/overlap:
    // each valid_to + 1 == next valid_from (checked by construction
    // above), and every observation timestamp falls inside exactly
    // one version of its key
    obs.foreach { case (k, _, ts, _) =>
      assert(out.count { case (ok, _, _, f, to, _) =>
        ok == k && f <= ts && (to == -1L || ts <= to) } == 1)
    }
  }

  test("pointInTime: probes hit exactly their interval's version") {
    val obs = Seq((1L, "a", 10L, 1L), (1L, "b", 30L, 2L), (1L, "c", 50L, 3L))
    val versions = graft.operators.Scd
      .scd2Build(obs.toDF("k", "attr", "ts", "tie"), "k", "attr", "ts", "tie")
    // probes: before history (drops), inside v1, boundary instants,
    // inside the open-ended live version
    val probes = Seq((1L, 100L, 5L), (1L, 101L, 10L), (1L, 102L, 29L),
      (1L, 103L, 30L), (1L, 104L, 49L), (1L, 105L, 9999L),
      (2L, 106L, 10L)) // unknown key drops
    val got = graft.operators.Scd
      .pointInTime(versions, probes.toDF("k", "pid", "t"), "k", "t")
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[String]("attr")))
      .toMap
    assert(got == Map(101L -> "a", 102L -> "a", 103L -> "b",
      104L -> "b", 105L -> "c"))
  }

  // --------------------------------------------------- chunking
  test("slidingChunks: coverage, overlap, witnesses, boundary sizes") {
    // n = 1 (single short chunk), n = C (exactly one), n = C+1 (two,
    // tiny tail), n = 2C-S+… mid cases — C=8, S=6
    val docs = Seq(
      (1L, (1 to 1).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (3L, (1 to 9).map(i => s"t$i").mkString(" ")),
      (4L, (1 to 21).map(i => s"t$i").mkString(" ")))
    val out = graft.operators.Chunking
      .slidingChunks(docs.toDF("id", "text"), "id", "text", 8, 6)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    def chunksOf(n: Int): Seq[(Long, Long)] = {
      val k = 1 + math.max(0, (n - 8 + 5) / 6)
      (0 until k).map(i => (i * 6L, math.min(8L, n - i * 6L)))
    }
    val want = docs.flatMap { case (id, text) =>
      val n = text.split(" ").length
      chunksOf(n).zipWithIndex.map { case ((st, len), i) =>
        (id, i.toLong, st, len, s"t${st + 1}", s"t${st + len}")
      }
    }
    assert(out.toSeq == want)
    // every token of every doc is inside ≥ 1 chunk; consecutive
    // chunks overlap by C - S = 2
    docs.foreach { case (id, text) =>
      val n = text.split(" ").length
      val ranges = out.filter(_._1 == id).map(c => (c._3, c._3 + c._4))
      (0 until n).foreach(tk =>
        assert(ranges.exists { case (a, b) => a <= tk && tk < b }))
    }
  }

  // ----------------------------------------------- regression
  test("groupedOls recovers an exact linear signal and matches local math") {
    // key 1: y = 3 + 2x exactly → slope 2, intercept 3 (quantization
    // is exact for these values); key 2: constant x → dropped
    val pts = (0L to 10L).map(x => (1L, x, 3.0 + 2.0 * x)) ++
      Seq((2L, 5L, 1.0), (2L, 5L, 2.0))
    val out = graft.operators.Regression
      .groupedOls(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L)._1 == 11L)
    assert(out(1L)._2 == 2.0 && out(1L)._3 == 3.0)
    // noisy group: compare against the same integer-statistic math
    // computed locally (not naive float OLS — the CONTRACT is the
    // quantized closed form)
    val rnd = new scala.util.Random(17)
    val noisy = (0 until 50).map(i =>
      (7L, (i % 13).toLong, rnd.nextDouble() * 100))
    val got = graft.operators.Regression
      .groupedOls(noisy.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => (r.getDouble(2), r.getDouble(3))).head
    val q = noisy.map { case (_, x, y) =>
      (BigInt(x), BigInt(math.rint(y * 1e6).toLong)) }
    val (n, sx, sy) = (BigInt(q.size), q.map(_._1).sum, q.map(_._2).sum)
    val sxx = q.map(p => p._1 * p._1).sum
    val sxy = q.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble / 1e6
    val intercept = (sy.toDouble / 1e6 - slope * sx.toDouble) / n.toDouble
    assert(got == ((slope, intercept)))
  }

  test("zScoreOutliers flags exactly the cross-multiplied set") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(i =>
      ((i % 3).toLong, i.toLong, rnd.nextDouble() * 50 +
        (if (i % 37 == 0) 400.0 else 0.0))) // planted spikes
    val got = graft.operators.Regression
      .zScoreOutliers(rows.toDF("k", "id", "v"), "k", "v", k = 2)
      .collect().map(_.getLong(1)).toSet
    // local reference: same integer predicate
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      val q = g.map(r => (r._2, BigInt(math.rint(r._3 * 1e6).toLong)))
      val n = BigInt(q.size); val s = q.map(_._2).sum
      val ss = q.map(p => p._2 * p._2).sum
      q.filter { case (_, x) =>
        val dev = n * x - s
        dev * dev > BigInt(4) * (n * ss - s * s)
      }.map(_._1)
    }.toSet
    assert(got == want)
    assert(rows.filter(_._2 % 37 == 0).forall(r => got.contains(r._2)),
      "planted spikes must all be flagged")
  }

  test("timeWeightedAvg: LOCF areas, constant series, single-obs dropped") {
    // key 1: v=10 for 10s then v=20 for 30s → TWA = (100+600)/40 = 17.5
    // key 2: constant 5.0 → TWA exactly 5.0 regardless of spacing
    // key 3: one observation → dropped (no span)
    val rows = Seq(
      (1L, 0L, 1L, 10.0), (1L, 10L, 2L, 20.0), (1L, 40L, 3L, 7.0),
      (2L, 0L, 4L, 5.0), (2L, 13L, 5L, 5.0), (2L, 99L, 6L, 5.0),
      (3L, 7L, 7L, 42.0))
    val got = graft.operators.Resample
      .timeWeightedAvg(rows.toDF("k", "t", "tie", "v"), "k", "t", "v", "tie")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((3L, 40L, 17.5)))
    assert(got(2L) == ((3L, 99L, 5.0)))
  }

  test("giniIndex: uniform → 0-ish lower bound, concentrated → near 1, exact math") {
    // all-equal values: G = (2·Σi·x − (n+1)·n·x) / (n·n·x) with
    // Σi = n(n+1)/2 → exactly 0
    val eq = (1L to 8L).map(i => ("a", i, 10L))
    // one member owns everything: G = (n-1)/n
    val conc = (1L to 8L).map(i => ("b", i, if (i == 8L) 800L else 0L))
    val got = graft.operators.Stats
      .giniIndex((eq ++ conc).toDF("g", "id", "x"), "g", "x", "id")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("a") == ((8L, 80L, 0.0)))
    assert(got("b") == ((8L, 800L, 7.0 / 8.0)))
  }

  // ------------------------------------------------------ pca
  test("powerProjection matches a local BigInt reference and finds the planted axis") {
    val rnd = new scala.util.Random(29)
    // variance planted overwhelmingly on dim 2 of 4
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array(rnd.nextDouble() * 0.01, rnd.nextDouble() * 0.01,
        (i % 7).toDouble - 3.0, rnd.nextDouble() * 0.01).toSeq)
    }
    val got = graft.operators.Pca
      .powerProjection(vecs.toDF("id", "v"), "id", "v", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // local replay of the exact contract
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => BigInt(math.rint(x * 1e6).toLong)).toArray) }
    val d = 4
    val n = BigInt(q.size)
    val si = Array.tabulate(d)(i => q.map(_._2(i)).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      n * q.map(r => r._2(i) * r._2(j)).sum - si(i) * si(j))
    var v = Array.tabulate(d)(i => if (i == 0) BigInt(1000000) else BigInt(0))
    for (_ <- 1 to 4) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x => x.sign * ((x.abs * 1000000) / m))
    }
    val want = q.map { case (id, qv) =>
      (id, (0 until d).map(k => qv(k) * v(k)).sum.toLong) }.toMap
    assert(got == want)
    // the direction must be dominated by the planted dimension: the
    // projection ordering tracks dim-2's value ordering
    val byScore = vecs.sortBy(r => got(r._1)).map(_._2(2))
    assert(byScore == byScore.sorted || byScore == byScore.sorted.reverse,
      "projection should be monotone in the planted axis")
  }

  // ------------------------------------------------ phrase search
  private def naivePhrase(text: String, phrase: Seq[String]): (Long, Long) = {
    val toks = text.split(" ", -1)
    val hits = (0 to toks.length - phrase.length)
      .filter(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
    (hits.size.toLong, if (hits.isEmpty) -1L else hits.head.toLong)
  }

  test("phraseHits matches a naive scan, incl. overlapping occurrences") {
    val docs = Seq(
      (1L, "a b c a b c a b"),
      (2L, "a a a a"),          // "a a" overlaps: 3 hits
      (3L, "b c b c"),
      (4L, "a"),                // shorter than the phrase
      (5L, ""),
      (6L, "x a b x a b")
    )
    for (phrase <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("b", "c", "a"))) {
      val got = PhraseSearch.phraseHits(docs.toDF("id", "text"),
          "id", "text", phrase)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2).toLong)))
        .toMap
      val want = docs.map { case (id, t) => (id, naivePhrase(t, phrase)) }
        .filter(_._2._1 > 0).toMap
      assert(got == want, s"phrase $phrase: got $got want $want")
    }
  }

  test("phraseHits: single-term phrase degenerates to term frequency") {
    val docs = Seq((1L, "a b a"), (2L, "b"), (3L, "a a a"))
    val got = PhraseSearch.phraseHits(docs.toDF("id", "text"),
        "id", "text", Seq("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 3L -> 3L))
  }

  // ------------------------------------------- weighted sampling
  test("weightedSystematic: grid absorption, multiplicity, invariance") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 500).map(i => (i.toLong, 1L + rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "w")
    val k = 16
    val total = rows.map(_._2).sum
    val step = total / k
    val nGrid = (total - 1) / step + 1 // multiples of step in [0, total)
    val out = Sampling.weightedSystematic(df, "id", "w", k)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._5).sum == nGrid, "every grid point absorbed once")
    // local reference: prefix-sum scan
    val cum = rows.map(_._2).scanLeft(0L)(_ + _)
    val want = rows.zipWithIndex.flatMap { case ((id, w), i) =>
      val first = (cum(i) + step - 1) / step
      val hits = (cum(i) + w - 1) / step - first + 1
      if (hits >= 1) Some((id, w, cum(i), first, hits)) else None
    }
    assert(out.toSeq == want)
    // partition-invariant (the offsets must not depend on layout)
    val reparted = Sampling.weightedSystematic(df.repartition(17), "id",
        "w", k)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(reparted.toSeq == out.toSeq)
    // a row heavier than the step is always selected
    val heavy = Sampling.weightedSystematic(
      Seq((1L, 5L), (2L, 1000L), (3L, 5L)).toDF("id", "w"), "id", "w", 4)
    assert(heavy.where(col("id") === 2L).count() == 1)
  }

  test("weightedSystematic: zero-weight rows never absorb a grid point") {
    val df = Seq((1L, 0L), (2L, 10L), (3L, 0L), (4L, 10L)).toDF("id", "w")
    val got = Sampling.weightedSystematic(df, "id", "w", 2)
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(1L) && !got.contains(3L))
    assert(got.contains(2L)) // owns offset 0
  }
}
