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
