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
  /** Per-node triangle counts via DEGREE-ORDERED ORIENTATION (the
    * Suri–Vassilvitskii / Cohen MapReduce scheme): canonicalize the
    * undirected edge set, orient every edge from its lower endpoint
    * to its higher endpoint under the total order (degree, node), and
    * enumerate wedges only at each edge's LOWER endpoint. Every
    * triangle then has exactly one "apex" (its order-minimal vertex),
    * so each is generated once, and the wedge count is
    * Σᵤ C(outdeg(u), 2) — O(E^{3/2}) total because the orientation
    * caps out-degree at O(√E) — instead of Σᵤ C(deg(u), 2), which a
    * hub vertex turns quadratic. Scale shape: two hash joins (wedge
    * build + closure probe) and one groupBy — no crossJoin, no
    * windows; the skew a social-graph hub would cause is exactly what
    * the orientation removes.
    *
    * Input edges are undirected; both orientations, self-loops and
    * duplicates are tolerated (canonicalized away). Output: one row
    * per node incident to ≥ 1 edge — (node, deg, triangles), integer
    * exact. */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).cast(LongType).as("a"),
        greatest(col(srcCol), col(dstCol)).cast(LongType).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, node): u→v iff (deg_u, u) <lex (deg_v, v)
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(lowFirst, col("a")).otherwise(col("b")).as("u"),
      when(lowFirst, col("b")).otherwise(col("a")).as("v"),
      when(lowFirst, col("db")).otherwise(col("da")).as("dv"))
    // wedges at the apex u: out-neighbors v < w under (deg, node)
    val e1 = oriented.select(col("u"), col("v"), col("dv"))
    val e2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = e1.join(e2, Seq("u"))
      .where(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("u"), col("v"), col("w"))
    val tris = wedges.join(
        oriented.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))
    val perNode = tris.select(explode(array(col("u"), col("v"), col("w")))
        .as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("triangles"))
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
      val contrib = r.join(deg, col("node") === col("src"))
        .select(col("src"), expr("r div deg").as("c"))
      val sums = e.join(contrib, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("s"))
      r = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
        .localCheckpoint(eager = true)
    }
    r.join(deg, col("node") === col("src"), "left")
      .select(col("node"),
        coalesce(col("deg"), lit(0L)).as("deg"), col("r"))
  }
}
