package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative graph analytics. Connected components live in
  * [[Dedup.clusters]] (alternating-star); this adds the other classic
  * fixed-point iteration, PageRank — in INTEGER arithmetic so every
  * iteration is exact cross-engine (the q98 playbook: quantize once,
  * then only integer ops + pinned divisions).
  */
object Graph {

  /** Pinning policy for a graph-algorithm invocation, decided ONCE from
    * the optimizer's free size estimate of the input edge frame
    * (`optimizedPlan.stats` — no job runs). Every multiply-consumed
    * prep frame (canonical edges, degrees, node set, adjacency) is
    * routed through the returned function:
    *
    *  - **small input** (≤ `spark.graft.graph.smallGraphBytes`,
    *    default 128 MiB): `cache()` — lazy, ZERO barrier jobs; the
    *    first consuming job computes each frame exactly once and later
    *    consumers hit the cache. On a graph that fits in memory the
    *    eager-checkpoint alternative costs 4-6 sequential scheduled
    *    jobs of pure fixed overhead before the algorithm proper runs
    *    (measured: q121 3.4x the oracle at sf0.1, entirely scheduling).
    *  - **large input**: `localCheckpoint(eager = true)` — the 100 TB
    *    posture: cuts Catalyst lineage so supersteps never replay prep,
    *    and hands AQE TRUE sizes so |V|-sized frames broadcast instead
    *    of stats-blind sort-merge.
    *
    * Loop STATE checkpoints are unaffected (they stay lazy/eager per
    * the minLabelPropagate/bfsHops notes). */
  private def pinner(edges: DataFrame): DataFrame => DataFrame = {
    val gate = edges.sparkSession.conf
      .getOption("spark.graft.graph.smallGraphBytes")
      .map(_.toLong).getOrElse(128L * 1024 * 1024)
    val small =
      edges.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(gate)
    if (small) df => df.cache() else df => df.localCheckpoint(eager = true)
  }

  /** Per-node triangle counts. Two strategies behind one contract,
    * auto-selected on the graph's MAX DEGREE (one scalar aggregate):
    *
    *  - **Adjacency intersection** (default path): build each node's
    *    sorted neighbor array once, join the two endpoint arrays onto
    *    every canonical edge, and count |N(a)∩N(b)| with the
    *    allocation-free codegen merge walk
    *    ([[graft.functions.SortedIntersectCountLong]]). Each triangle
    *    {x,y,z} is seen once per edge, so tri(x) = Σ_{edges∋x} c/2 —
    *    integer-exact (the sum is always even). Work is
    *    Σ_edges (deg a + deg b) simple long compares INSIDE a
    *    projection — no wedge set is ever materialized, no data-sized
    *    exchange beyond the adjacency groupBy and the two edge joins.
    *    The cap: a node's neighbor array is deg-sized, so this path
    *    requires maxDeg ≤ `maxAdjDegree` rows per array (default 1M ≈
    *    8 MB — beyond it a hub row would dominate a partition).
    *
    *  - **Degree-ordered wedge enumeration** (hub-safe fallback, the
    *    Suri–Vassilvitskii MapReduce scheme): orient each edge from
    *    its (degree, node)-lower endpoint, enumerate wedges at each
    *    edge's lower endpoint only — each triangle generated exactly
    *    once at its order-minimal apex, wedge work Σ C(outdeg,2) =
    *    O(E^{3/2}) since the orientation caps out-degree at O(√E).
    *    The orientation is precisely what removes the hub skew that
    *    disqualified the adjacency path.
    *
    * Input edges are undirected; both orientations, self-loops and
    * duplicates are tolerated (canonicalized away). Output: one row
    * per node incident to ≥ 1 edge — (node, deg, triangles), integer
    * exact, identical from both paths (gated by GraphSpec). */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxAdjDegree: Long = 1000000L,
      broadcastEdgeLimit: Long = 5000000L): DataFrame = {
    // canon and deg each feed several consumers: pin (size-gated — see
    // [[pinner]]) so none replays the upstream distinct; on the large
    // path the checkpoint also hands AQE TRUE sizes so the |V|-sized
    // degree/adjacency tables broadcast instead of the stats-blind
    // sort-merge.
    val pin = pinner(edges)
    val canon = pin(edges.select(
        least(col(srcCol), col(dstCol)).cast(LongType).as("a"),
        greatest(col(srcCol), col(dstCol)).cast(LongType).as("b"))
      .where(col("a") =!= col("b"))
      .distinct())
    val deg = pin(canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg")))
    val statsRow = deg.agg(max(col("deg")), count(lit(1))).head()
    val maxDeg = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    val nNodes = statsRow.getLong(1)
    val perNode =
      if (maxDeg <= maxAdjDegree)
        // worst-case adjacency bytes ≈ |V|·maxDeg·8: when that fits a
        // broadcast (≤ 32 MB) the two edge⋈adjacency joins run
        // map-side and the edge list never shuffles at all
        adjacencyTriangles(canon, pin,
          broadcastAdj = nNodes * maxDeg * 8L <= 32L * 1024 * 1024)
      else wedgeTriangles(canon, deg, pin, broadcastEdgeLimit)
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("triangles"))
  }

  /** Adjacency-intersection path: (node, tri) for nodes with ≥ 1
    * triangle. `canon` must be canonical a<b, distinct, pinned. */
  private def adjacencyTriangles(
      canon: DataFrame,
      pin: DataFrame => DataFrame,
      broadcastAdj: Boolean): DataFrame = {
    // collect_list (not _set): canon is distinct, so neighbor lists
    // are duplicate-free by construction — and the kernel needs them
    // SORTED, which sort_array pins
    val adj0 = pin(canon.select(col("a").as("node"), col("b").as("nbr"))
      .union(canon.select(col("b").as("node"), col("a").as("nbr")))
      .groupBy("node")
      .agg(sort_array(collect_list(col("nbr"))).as("nbrs")))
    val adj = if (broadcastAdj) broadcast(adj0) else adj0
    val withCounts = canon
      .join(adj.select(col("node").as("a"), col("nbrs").as("na")), Seq("a"))
      .join(adj.select(col("node").as("b"), col("nbrs").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        graft.functions.SortedIntersectCountLong(col("na"), col("nb"))
          .cast(LongType).as("c"))
      .where(col("c") > 0)
    // each triangle at node x is seen by BOTH its x-incident edges →
    // the per-node edge-count sum is exactly 2·tri(x), always even
    withCounts.select(explode(array(
        struct(col("a").as("node"), col("c")),
        struct(col("b").as("node"), col("c")))).as("s"))
      .select(col("s.node").as("node"), col("s.c").as("c"))
      .groupBy("node").agg(expr("sum(c) div 2").as("tri"))
  }

  /** Degree-ordered wedge path: (node, tri). Hub-safe — out-degree is
    * O(√E) after orientation. When the oriented edge list is small
    * enough to broadcast (≤ `broadcastEdgeLimit` rows), wedges are
    * built AND closed map-side and never leave their producing
    * partition; past it, the closure is the classic shuffle join on
    * (v, w). */
  private def wedgeTriangles(
      canon: DataFrame,
      deg: DataFrame,
      pin: DataFrame => DataFrame,
      broadcastEdgeLimit: Long): DataFrame = {
    // orient by (deg, node): u→v iff (deg_u, u) <lex (deg_v, v)
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = pin(withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dv")))
    val e1 = oriented.select(col("u"), col("v"), col("dv"))
    val e2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val closure = oriented.select(col("u").as("v"), col("v").as("w"))
    val (wedgeRight, closeRight) =
      if (canon.count() <= broadcastEdgeLimit)
        (broadcast(e2), broadcast(closure))
      else (e2, closure)
    val wedges = e1.join(wedgeRight, Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    wedges.join(closeRight, Seq("v", "w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
  }

  /** Bounded-depth BFS: minimum hop count from `source` to every node
    * reachable within `maxHops` supersteps. Integer hop labels — no
    * doubles anywhere, so results are trivially exact cross-engine.
    * Level-synchronous frontier expansion: each round joins the
    * CURRENT FRONTIER ONLY (not the full visited set) against the
    * checkpointed edge list, then anti-joins visited — the standard
    * Pregel BFS; per-round cost is O(frontier out-edges), and the
    * visited set stays partitioned by node. The loop state is
    * localCheckpoint'ed so round k's plan does not replay rounds
    * 1..k-1. Driver traffic: one isEmpty probe per round (early stop
    * once the frontier drains). */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64,
      s"bfsHops: maxHops in [1, 64], got $maxHops")
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = true) // probed every superstep
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = Seq((source, 0L)).toDF("node", "hops")
      .localCheckpoint(eager = true)
    var frontier = visited.select("node")
    var hop = 0L
    var drained = false
    while (hop < maxHops && !drained) {
      hop += 1
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node").as("vn")),
          col("node") === col("vn"), "left_anti")
        .localCheckpoint(eager = true)
      if (next.isEmpty) { drained = true }
      else {
        visited = visited.union(next.select(col("node"), lit(hop).as("hops")))
          .localCheckpoint(eager = true)
        frontier = next
      }
    }
    visited
  }

  /** Synchronous bounded-round min-label propagation: every node
    * starts labeled with its own id; each round every node adopts the
    * minimum label among itself and its in-neighbors,
    *
    *   label'(v) = min(label(v), min_{(u,v)∈E} label(u)),
    *
    * run for exactly `iters` rounds (no convergence test — the round
    * count is part of the contract so the result is deterministic and
    * cross-engine reproducible). With both edge orientations supplied
    * this is the label-propagation view of connected components cut
    * off at radius `iters`: label(v) = min node id within `iters`
    * hops, a community-seed / blocking-key assignment that needs no
    * full fixed point. All-integer, so exact by construction.
    *
    * Scale shape per round: one shuffle join of labels to the
    * checkpointed edge list + one min-groupBy + one left join back to
    * the node set — the Pregel superstep as two exchanges, same as
    * [[pageRankInt]]; label state is localCheckpoint'ed each round so
    * no round replays its predecessors. Zero driver traffic inside
    * the loop. */
  def minLabelPropagate(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"minLabelPropagate: iters in [1, 32], got $iters")
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = true) // reused every round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    var l = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val m = e.join(l, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("ml"))
      // l is node-complete every round, so the left join alone keeps
      // nodes with no in-edges at their current label.
      // LAZY checkpoint: the loop is pure plan construction (no
      // driver action until the caller's one materialization), so an
      // eager cut per round would serialize `iters` barrier jobs for
      // nothing — lazy still truncates the Catalyst lineage while the
      // whole fixed-point executes as ONE multi-stage job. Loops that
      // PROBE per round (bfsHops' isEmpty) must stay eager.
      l = l.join(m, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("ml"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
    }
    l
  }

  /** Integer-arithmetic PageRank: rank mass is carried in integer
    * units of `massScale` (default 10¹²), and each iteration is
    *
    *   c_u  = r_u div deg_u                (per-edge contribution)
    *   r'_v = (15·(massScale div N)) div 100
    *        + (85 · Σ_{u→v} c_u) div 100   (damping 0.85)
    *
    * — integer division throughout (all quantities positive, so
    * truncating and flooring agree across engines). The div losses
    * mean total mass is not conserved to the last unit, but the
    * FIXED POINT is deterministic and bit-identical in any engine
    * that does 64-bit integer math — no double folds, no margin
    * gates. At massScale=10¹² the quantization error per rank is
    * ~10⁻¹² of total mass per step — far below any ranking use.
    *
    * The graph is whatever `edges` encodes (directed src→dst);
    * callers wanting undirected semantics pass both orientations.
    * Nodes are the union of endpoints; a node with no out-edges
    * contributes nothing (classic dangling behavior), one with no
    * in-edges settles at the teleport base.
    *
    * Scale shape per iteration: one broadcast-or-shuffle join of
    * ranks to the (checkpointed) edge list + one groupBy(dst) with
    * map-side partial sums — the textbook Pregel superstep as two
    * exchanges; rank state is localCheckpoint'ed each round so the
    * plan never replays prior iterations. Driver traffic is the
    * node COUNT only.
    */
  def pageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int,
      massScale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"pageRankInt: iters in [1, 32], got $iters")
    require(massScale >= 1000000L,
      s"pageRankInt: massScale >= 1e6, got $massScale")
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .distinct()
      .localCheckpoint(eager = true) // reused every superstep
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    // out-degree hoisted ONTO the edge list once, outside the loop:
    // r div deg is constant per src, so computing it edge-side after a
    // single (src, dst, deg) pre-join is value-identical to the
    // node-side contribution join — and drops one shuffle join from
    // every superstep
    val eDeg = e.join(deg, Seq("src")).localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count()
    require(n > 0, "pageRankInt: no edges")
    val init = massScale / n              // R div N
    val base = (15L * init) / 100L        // teleport term, positive → truncation ≡ floor
    var r = nodes.withColumn("r", lit(init))
    for (_ <- 1 to iters) {
      val sums = eDeg.join(r, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div deg")).as("s"))
      // lazy: pure plan-construction loop, one materialization at the
      // caller — see minLabelPropagate's note
      r = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
        .localCheckpoint(eager = false)
    }
    r.join(deg, col("node") === col("src"), "left")
      .select(col("node"),
        coalesce(col("deg"), lit(0L)).as("deg"), col("r"))
  }

  /** PERSONALIZED PageRank ("random walk with restart"): identical
    * integer superstep to [[pageRankInt]], but both the initial mass
    * and the 15% teleport return to the SOURCE SET only — the scores
    * rank nodes by proximity to the sources (recommendation /
    * expansion queries), not by global centrality. Sources carry
    * massScale div |S| units each; non-source nodes start at 0 and
    * earn rank only through in-edges. Same exactness contract: all
    * positive integer arithmetic, bit-identical cross-engine, no
    * margin gates. Sources need not appear in the edge list (an
    * isolated source keeps exactly its teleport term). */
  def personalizedPageRankInt(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      sources: Seq[Long],
      iters: Int,
      massScale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"personalizedPageRankInt: iters in [1, 32], got $iters")
    require(sources.nonEmpty && sources.size <= 10000,
      s"personalizedPageRankInt: 1-10000 sources, got ${sources.size}")
    require(sources.distinct.size == sources.size,
      "personalizedPageRankInt: duplicate sources")
    require(massScale >= 1000000L,
      s"personalizedPageRankInt: massScale >= 1e6, got $massScale")
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .distinct()
      .localCheckpoint(eager = true) // reused every superstep
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)
    // same deg-hoist as [[pageRankInt]]: one (src, dst, deg) pre-join
    // replaces the per-superstep rank⋈deg contribution join
    val eDeg = e.join(deg, Seq("src")).localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(edges.sparkSession.createDataFrame(
        edges.sparkSession.sparkContext
          .parallelize(sources.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", LongType, false)))))
      .distinct()
      .localCheckpoint(eager = true)
    val init = massScale / sources.size
    val base = (15L * init) / 100L
    val isSource = col("node").isin(sources: _*)
    var r = nodes.withColumn("r",
      when(isSource, lit(init)).otherwise(lit(0L)))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iters) {
      val sums = eDeg.join(r, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div deg")).as("s"))
      // lazy: pure plan-construction loop — see minLabelPropagate
      r = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (when(isSource, lit(base)).otherwise(lit(0L)) +
            expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
        .localCheckpoint(eager = false)
    }
    r.join(deg, col("node") === col("src"), "left")
      .select(col("node"),
        coalesce(col("deg"), lit(0L)).as("deg"), col("r"))
  }
}
