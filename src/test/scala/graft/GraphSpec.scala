package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val R = 1000000000000L

  /** Plain-Scala integer PageRank — the oracle's formulation. */
  private def localPr(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => (s, xs.size.toLong) }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val base = (15L * (R / n)) / 100L
    var r = nodes.map(_ -> R / n).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (d, in) =>
        (d, in.map { case (s, _) => r(s) / deg(s) }.sum)
      }
      r = nodes.map(v => v -> (base + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    nodes.map(v => v -> (deg.getOrElse(v, 0L), r(v))).toMap
  }

  test("pageRankInt matches the local integer reference (cycle + dangler)") {
    // 1→2→3→1 cycle with a chord 1→3, feeder 4→1, dangling sink 5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L), (1L, 5L))
    val out = Graph.pageRankInt(edges.toDF("src", "dst"), "src", "dst", 4)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val want = localPr(edges, 4)
    val got = out.toMap
    assert(got == want, s"engine ${out.toSeq}\nlocal $want")
    // dangling sink: no out-edges → deg 0; it accumulates rank but
    // contributes none (its column exists, its row doesn't)
    assert(got(5L)._1 == 0L)
    // feeder with no in-edges settles at the teleport base
    assert(got(4L)._2 == (15L * (R / 5L)) / 100L)
  }

  test("deterministic and partition-invariant") {
    val edges = (0 until 300).map { i =>
      ((i % 40).toLong, ((i * 7 + 3) % 40).toLong)
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRankInt(df, "src", "dst", 5)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRankInt(df.repartition(11), "src", "dst", 5)
      .orderBy("node").collect().toSeq
    assert(a == b)
    assert(a == Graph.pageRankInt(df, "src", "dst", 5)
      .orderBy("node").collect().toSeq)
    assert(a.nonEmpty)
  }

  /** Naive local triangle reference: per-node count over the
    * canonical edge set. */
  private def localTriangles(edges: Seq[(Long, Long)])
      : Map[Long, (Long, Long)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (canon ++ canon.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).toSet) }
    val nodes = adj.keys.toSeq.sorted
    // each triangle {u<v<w} found once at its min edge (u,v),
    // contributing to all three corners
    val per = canon.flatMap { case (u, v) =>
      // toSeq BEFORE flatMap — Set semantics would collapse the u/v
      // contributions of two triangles sharing the edge (u,v)
      (adj(u) & adj(v)).toSeq.filter(w => w > v).flatMap(w => Seq(u, v, w))
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    nodes.map(u => u -> (adj(u).size.toLong, per.getOrElse(u, 0L))).toMap
  }

  test("triangleCounts matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 160).map(_ =>
      (rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
    // feed duplicates, self-loops and both orientations — all must
    // canonicalize away
    val noisy = edges ++ edges.take(40).map(_.swap) ++
      Seq((3L, 3L), (5L, 5L))
    val got = Graph.triangleCounts(noisy.toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val want = localTriangles(edges)
    assert(got == want, s"engine $got\nlocal $want")
    assert(got.values.map(_._2).sum % 3 == 0, "per-node sum must be 3·#tri")
    assert(got.values.map(_._2).sum > 0, "fixture should contain triangles")
  }

  test("triangleCounts: wedge fallback path matches the adjacency path") {
    val rnd = new scala.util.Random(13)
    val edges = (0 until 200).map(_ =>
      (rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
    val df = edges.toDF("src", "dst")
    // driver gate 0: this test's subject is the DISTRIBUTED join
    // phases — the default gate would route this tiny fixture onto
    // the driver kernel regardless of maxAdjDegree
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val adjPath = Graph.triangleCounts(df, "src", "dst")
        .orderBy("node").collect().toSeq.map(_.toSeq)
      // maxAdjDegree = 0 forces every graph down the degree-ordered
      // wedge path; broadcastEdgeLimit = 0 additionally forces its
      // shuffle closure — all three plans must agree row for row
      val wedgeB = Graph.triangleCounts(df, "src", "dst", maxAdjDegree = 0L)
        .orderBy("node").collect().toSeq.map(_.toSeq)
      val wedgeS = Graph.triangleCounts(df, "src", "dst", maxAdjDegree = 0L,
          broadcastEdgeLimit = 0L)
        .orderBy("node").collect().toSeq.map(_.toSeq)
      assert(adjPath == wedgeB)
      assert(adjPath == wedgeS)
      assert(adjPath.nonEmpty)
    } finally spark.conf.unset("spark.graft.graph.driverGraphBytes")
  }

  test("triangleCounts: conservative two-pass prep and forced-fused wedge agree with the default") {
    val rnd = new scala.util.Random(17)
    val edges = (0 until 220).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = edges.toDF("src", "dst")
    // driver gate 0: the preps under test are the distributed ones
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val fused = Graph.triangleCounts(df, "src", "dst")
        .orderBy("node").collect().toSeq.map(_.toSeq)
      // cap below the fused floor but above maxDeg → conservative prep,
      // adjacency-intersection join phase
      val conservative = Graph.triangleCounts(df, "src", "dst",
          maxAdjDegree = 1000L)
        .orderBy("node").collect().toSeq.map(_.toSeq)
      assert(fused == conservative)
      // floor forced to 0 with cap 0 → fused prep, wedge join phase
      spark.conf.set("spark.graft.graph.fusedAdjFloor", "0")
      try {
        val fusedWedge = Graph.triangleCounts(df, "src", "dst",
            maxAdjDegree = 0L)
          .orderBy("node").collect().toSeq.map(_.toSeq)
        assert(fused == fusedWedge)
      } finally spark.conf.unset("spark.graft.graph.fusedAdjFloor")
      assert(fused.nonEmpty)
    } finally spark.conf.unset("spark.graft.graph.driverGraphBytes")
  }

  test("triangle driver kernel ≡ distributed small ≡ distributed large") {
    // default gate (64 MiB) routes this tiny graph onto the driver
    // CSR kernel; driverGraphBytes=0 forces the distributed fused
    // prep on the cache (small) path; + smallGraphBytes=0 the
    // checkpoint (large) path. All integer math — exactly equal.
    val rnd = new scala.util.Random(37)
    val edges = (0 until 500).map(_ =>
      (rnd.nextInt(55).toLong, rnd.nextInt(55).toLong))
    val df = edges.toDF("src", "dst")
    def run(): Seq[Seq[Any]] = Graph.triangleCounts(df, "src", "dst")
      .orderBy("node").collect().toSeq.map(_.toSeq)
    val kernel = run()
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      assert(run() == kernel)
      spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
      assert(run() == kernel)
    } finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
    assert(kernel.nonEmpty && kernel.exists(_.last.asInstanceOf[Long] > 0L))
  }

  test("sampledHubRisk flags an over-cap hub and clears a bounded-degree graph") {
    // star: node 0 has degree 10 000 — at full sampling (f=1) the
    // probe sees the exact degree, so caps at/below 20 000 flag risk
    // and caps far above clear it (the ×2 margin sits in between)
    val star = (1L to 10000L).map(d => (0L, d)).toDF("a", "b")
    assert(Graph.sampledHubRisk(star, cap = 10000L, fraction = 1.0))
    assert(!Graph.sampledHubRisk(star, cap = 1000000L, fraction = 1.0))
    // Bernoulli concentration at the default-style fraction: a 10k hub
    // sampled at 10% reads ~1000 ± ~30 → estimate ~10k, flags cap 10k
    assert(Graph.sampledHubRisk(star, cap = 10000L, fraction = 0.1))
    // bounded-degree graph (cycle, deg 2) never flags
    val cycle = (0L until 5000L).map(i => (i, (i + 1) % 5000L)).toDF("a", "b")
    assert(!Graph.sampledHubRisk(cycle, cap = 100L, fraction = 1.0))
    // end-to-end: a hub graph forced past the small-stats gate with
    // the fused floor lowered, so the PROBE (not the cap-vs-floor
    // gate) decides the route — whichever way it routes, counts must
    // equal the default small-path result
    spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
    spark.conf.set("spark.graft.graph.fusedAdjFloor", "0")
    try {
      val rnd = new scala.util.Random(29)
      val hubby = ((1L to 300L).map(d => (0L, d)) ++ (0 until 150).map(_ =>
        (1L + rnd.nextInt(40).toLong, 1L + rnd.nextInt(40).toLong)))
        .toDF("a", "b")
      val probed = Graph.triangleCounts(hubby, "a", "b", maxAdjDegree = 100L)
        .orderBy("node").collect().toSeq.map(_.toSeq)
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
      spark.conf.unset("spark.graft.graph.fusedAdjFloor")
      val default = Graph.triangleCounts(hubby, "a", "b")
        .orderBy("node").collect().toSeq.map(_.toSeq)
      assert(probed == default)
      assert(probed.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
      spark.conf.unset("spark.graft.graph.fusedAdjFloor")
    }
  }

  test("triangleCounts small path plans broadcast joins only (stats-blind cache regression)") {
    // the r8→r9 regression: cached prep left the planner stats-blind
    // and the edge⋈adjacency joins silently fell back to sort-merge
    // (q106 9.4x oracle). The small path must carry explicit
    // broadcast hints instead — assert at the PLAN level.
    val rnd = new scala.util.Random(23)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    // driver gate 0: the plan under audit is the distributed small path
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val df = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), s"sort-merge join on the small path:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.unset("spark.graft.graph.driverGraphBytes")
  }

  test("triangleCounts and pageRankInt: forced checkpoint path (large-graph posture) matches") {
    val rnd = new scala.util.Random(29)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = edges.toDF("src", "dst")
    val triSmall = Graph.triangleCounts(df, "src", "dst")
      .orderBy("node").collect().toSeq.map(_.toSeq)
    val prSmall = Graph.pageRankInt(df.where(col("src") =!= col("dst")),
        "src", "dst", 3)
      .orderBy("node").collect().toSeq.map(_.toSeq)
    // gate 0 bytes: every graph takes the eager-localCheckpoint path
    // (driver gate 0 too, else PageRank would stay on the local kernel)
    spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val triLarge = Graph.triangleCounts(df, "src", "dst")
        .orderBy("node").collect().toSeq.map(_.toSeq)
      val prLarge = Graph.pageRankInt(df.where(col("src") =!= col("dst")),
          "src", "dst", 3)
        .orderBy("node").collect().toSeq.map(_.toSeq)
      assert(triLarge == triSmall)
      assert(prLarge == prSmall)
    } finally {
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
    }
    assert(triSmall.nonEmpty && prSmall.nonEmpty)
  }

  test("pageRank driver kernel ≡ distributed small ≡ distributed large (both variants)") {
    // default gate (64 MiB) routes this tiny graph onto the driver
    // kernel; driverGraphBytes=0 forces the distributed superstep on
    // the cache (small) path; + smallGraphBytes=0 the checkpoint
    // (large) path. All three must be BIT-equal — the kernel runs the
    // identical integer recurrence.
    val rnd = new scala.util.Random(31)
    val edges = (0 until 500).map(_ =>
      (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val seeds = Seq(1L, 13L, 7777L) // 7777 isolated
    def runBoth(): (Seq[Seq[Any]], Seq[Seq[Any]]) = (
      Graph.pageRankInt(df, "src", "dst", 4)
        .orderBy("node").collect().toSeq.map(_.toSeq),
      Graph.personalizedPageRankInt(df, "src", "dst", seeds, 4)
        .orderBy("node").collect().toSeq.map(_.toSeq))
    val (prLocal, pprLocal) = runBoth()
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val (prSmall, pprSmall) = runBoth()
      assert(prSmall == prLocal)
      assert(pprSmall == pprLocal)
      spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
      val (prLarge, pprLarge) = runBoth()
      assert(prLarge == prLocal)
      assert(pprLarge == pprLocal)
    } finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
    assert(prLocal.nonEmpty && pprLocal.nonEmpty)
  }

  test("malformed smallGraphBytes conf fails with a clear message") {
    spark.conf.set("spark.graft.graph.smallGraphBytes", "lots")
    try {
      val ex = intercept[IllegalArgumentException] {
        Graph.triangleCounts(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
      }
      assert(ex.getMessage.contains("spark.graft.graph.smallGraphBytes"))
      assert(ex.getMessage.contains("lots"))
    } finally spark.conf.unset("spark.graft.graph.smallGraphBytes")
  }

  test("triangleCounts: triangle-free bipartite graph counts zero") {
    val edges = for (a <- 0L to 5L; b <- 10L to 14L) yield (a, b)
    val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(_.getLong(2))
    assert(got.length == 11 && got.forall(_ == 0L))
  }

  /** Local level-synchronous BFS reference. */
  private def localBfs(edges: Seq[(Long, Long)], src: Long, maxHops: Int)
      : Map[Long, Long] = {
    val adj = edges.filter(e => e._1 != e._2).distinct.groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2)) }
    var dist = Map(src -> 0L)
    var frontier = Seq(src)
    for (h <- 1 to maxHops if frontier.nonEmpty) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil)).distinct
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("bfs and minLabelPropagate: driver kernel ≡ distributed small ≡ distributed large") {
    val rnd = new scala.util.Random(41)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    def runBoth(): (Seq[Seq[Any]], Seq[Seq[Any]]) = (
      Graph.bfsHops(df, "src", "dst", source = 0L, maxHops = 5)
        .orderBy("node").collect().toSeq.map(_.toSeq),
      Graph.minLabelPropagate(df, "src", "dst", iters = 3)
        .orderBy("node").collect().toSeq.map(_.toSeq))
    val (bfsK, lpK) = runBoth()
    spark.conf.set("spark.graft.graph.driverGraphBytes", "0")
    try {
      val (bfsS, lpS) = runBoth()
      assert(bfsS == bfsK)
      assert(lpS == lpK)
      spark.conf.set("spark.graft.graph.smallGraphBytes", "0")
      val (bfsL, lpL) = runBoth()
      assert(bfsL == bfsK)
      assert(lpL == lpK)
    } finally {
      spark.conf.unset("spark.graft.graph.driverGraphBytes")
      spark.conf.unset("spark.graft.graph.smallGraphBytes")
    }
    assert(bfsK.nonEmpty && lpK.nonEmpty)
  }

  test("bfsHops matches local BFS and is partition-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("src", "dst")
    val got = Graph.bfsHops(df, "src", "dst", source = 0L, maxHops = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == localBfs(edges, 0L, 4))
    val reparted = Graph.bfsHops(df.repartition(13), "src", "dst", 0L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reparted == got)
    // hop levels must all be ≤ 4 and the source is at 0
    assert(got(0L) == 0L && got.values.forall(_ <= 4L))
  }

  test("bfsHops stops early when the frontier drains") {
    // 0→1→2, disconnected 7→8: only the source component is reached
    val edges = Seq((0L, 1L), (1L, 2L), (7L, 8L))
    val got = Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  /** Local integer PPR mirroring the engine's superstep. */
  private def localPpr(edges: Seq[(Long, Long)], sources: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => (s, xs.size.toLong) }
    val nodes = ((e.map(_._1) ++ e.map(_._2)) ++ sources).distinct
    val init = R / sources.size
    val base = (15L * init) / 100L
    var r = nodes.map(v => v -> (if (sources.contains(v)) init else 0L)).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (d, in) =>
        (d, in.map { case (s, _) => r(s) / deg(s) }.sum)
      }
      r = nodes.map(v => v -> ((if (sources.contains(v)) base else 0L)
        + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("personalizedPageRankInt matches the local reference; isolated source keeps its teleport") {
    val edges = (0 until 200).map(i =>
      ((i % 30).toLong, ((i * 11 + 5) % 30).toLong))
      .filter { case (a, b) => a != b }
    val sources = Seq(3L, 999L) // 999 is NOT in the graph
    val got = Graph.personalizedPageRankInt(edges.toDF("src", "dst"),
        "src", "dst", sources, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val want = localPpr(edges, sources, 4)
    assert(got == want, s"engine $got\nlocal $want")
    // the isolated source has no in-edges: rank = its teleport term
    assert(got(999L) == (15L * (R / 2)) / 100L)
    // a node unreachable-and-unseeded stays at 0; the seeds dominate
    assert(got(3L) > got.filterNot(kv => sources.contains(kv._1)).values.max)
  }

  test("symmetric graph conserves mass up to bounded div loss") {
    val e0 = Seq((1L, 10L), (2L, 10L), (3L, 11L), (1L, 11L), (4L, 12L))
    val sym = e0 ++ e0.map(_.swap)
    val out = Graph.pageRankInt(sym.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(_.getLong(2))
    val total = out.sum
    // each rank loses < 1 unit per div, ≤ 3 divs deep per iteration:
    // the total must stay within nodes·iters·3 units of massScale
    assert(total <= R && total >= R - out.length * 3 * 3 - 100,
      s"total mass $total vs $R")
  }

  /** Plain-Scala synchronous min-label propagation. */
  private def localLp(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct.filter { case (a, b) => a != b }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var l = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      l = nodes.map { v =>
        val in = e.collect { case (u, d) if d == v => l(u) }
        v -> (l(v) +: in).min
      }.toMap
    }
    l
  }

  test("minLabelPropagate matches the local reference at each radius") {
    // two chains joined at one end + an isolated pair: labels spread
    // one hop per round, so iters acts as a radius cap
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val edges = und ++ und.map(_.swap)
    for (iters <- Seq(1, 2, 4)) {
      val got = Graph.minLabelPropagate(
          edges.toDF("src", "dst"), "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == localLp(edges, iters), s"iters=$iters")
    }
    // radius 4 reaches everything in the 5-chain: full component label
    val conv = Graph.minLabelPropagate(
        edges.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(conv(_) == 1L) && conv(10L) == 10L &&
      conv(11L) == 10L)
  }

  test("minLabelPropagate is partition-invariant and directed-aware") {
    val edges = (0 until 400).map { i =>
      ((i % 53).toLong, ((i * 11 + 5) % 53).toLong)
    }.filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val a = Graph.minLabelPropagate(df, "src", "dst", 3)
      .orderBy("node").collect().toSeq
    val b = Graph.minLabelPropagate(df.repartition(13), "src", "dst", 3)
      .orderBy("node").collect().toSeq
    assert(a == b && a.nonEmpty)
    // directed: labels flow src→dst only — a pure source keeps its id
    val dirEdges = Seq((5L, 1L), (1L, 2L)).toDF("src", "dst")
    val dir = Graph.minLabelPropagate(dirEdges, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dir(5L) == 5L && dir(1L) == 1L && dir(2L) == 1L)
  }
}
