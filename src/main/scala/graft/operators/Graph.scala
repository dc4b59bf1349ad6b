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
    * routed through `pin`:
    *
    *  - **small input** (≤ `spark.graft.graph.smallGraphBytes`,
    *    default 128 MiB): `cache()` — lazy, ZERO barrier jobs; the
    *    first consuming job computes each frame exactly once and later
    *    consumers hit the cache. On a graph that fits in memory the
    *    eager-checkpoint alternative costs 4-6 sequential scheduled
    *    jobs of pure fixed overhead before the algorithm proper runs
    *    (measured: q121 3.4x the oracle at sf0.1, entirely scheduling).
    *    TRADE-OFF (measured, r8→r9): cached frames are STATS-BLIND —
    *    `InMemoryRelation` reports no usable size to the planner, so
    *    joins that would broadcast under an eager checkpoint silently
    *    fall back to sort-merge (q106 3.96 s → 12.98 s). The small
    *    path therefore NEVER relies on the planner for join sides:
    *    every |V|-bounded frame is broadcast EXPLICITLY via `bcast`,
    *    whose hint is gated on sizes this module computes itself.
    *  - **large input**: `localCheckpoint(eager = true)` — the 100 TB
    *    posture: cuts Catalyst lineage so supersteps never replay prep,
    *    and hands AQE TRUE sizes so |V|-sized frames broadcast instead
    *    of stats-blind sort-merge. `bcast` is the identity here: at
    *    this scale a blind hint could OOM the executors, and AQE's
    *    runtime sizes make the right call without help.
    *
    * Loop STATE checkpoints are unaffected (they stay lazy/eager per
    * the minLabelPropagate/bfsHops notes).
    *
    * Lifecycle: `cache()` pins live until the session drops them —
    * long-lived sessions should call `spark.catalog.clearCache()`
    * between unrelated workloads (the Bench/Verify harnesses do, via
    * `Sessions.release`); the checkpoint path's blocks are reaped by
    * the ContextCleaner when the frames go out of scope. */
  private final case class Pinned(
      small: Boolean,
      pin: DataFrame => DataFrame,
      bcast: DataFrame => DataFrame)

  private def confLong(df: DataFrame, key: String, default: Long): Long =
    df.sparkSession.conf.getOption(key) match {
      case Some(v) =>
        try v.trim.toLong catch {
          case e: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be a long, got '$v'", e)
        }
      case None => default
    }

  private def smallGraphBytes(df: DataFrame): Long =
    confLong(df, "spark.graft.graph.smallGraphBytes", 128L * 1024 * 1024)

  private def mkPinned(small: Boolean): Pinned =
    if (small) Pinned(small = true, _.cache(), df => broadcast(df))
    else Pinned(small = false, _.localCheckpoint(eager = true), identity)

  private def pinner(edges: DataFrame): Pinned = mkPinned(
    edges.queryExecution.optimizedPlan.stats.sizeInBytes <=
      BigInt(smallGraphBytes(edges)))

  /** Prep for the ITERATIVE algorithms: eagerly checkpoint the
    * superstep-reused edge frame (every loop replays it, on both
    * paths — this job is unavoidable), then decide the small/large
    * policy for the REMAINING prep frames from its TRUE row count.
    * The optimizer estimate `pinner` uses is useless here: iterative
    * callers typically derive edges from a join (q121: orders ⋈
    * lineitem), whose Catalyst size estimate is a row-product blowup
    * that forced every such graph onto the eager-checkpoint path — 4+
    * sequential barrier jobs of pure scheduling on graphs that fit in
    * one broadcast (q121 3.2x oracle through r9). The count after the
    * checkpoint is a ~50 ms scan of pinned blocks. */
  private def pinnedEdges(eRaw: DataFrame): (DataFrame, Pinned, Long) = {
    val gate = smallGraphBytes(eRaw)
    // LAZY checkpoint + count: the count job below materializes AND
    // persists the marked RDD in one pass — eager-then-count paid a
    // second full scan as a second scheduled job (the bfsHops
    // probe-fusion pattern, applied to the prep itself)
    val e = eRaw.localCheckpoint(eager = false)
    // an edge row is two-to-three longs: ~32 B as an UnsafeRow. The
    // constant deliberately ignores partition/row overheads (ADVICE
    // r10): it only routes the cache-vs-checkpoint POLICY, and every
    // per-frame broadcast is separately size-gated by [[gatedBcast]],
    // so a graph just inside this gate cannot be handed an oversized
    // broadcast off the rough constant alone.
    val rows = e.count()
    (e, mkPinned(rows * 32L <= gate), rows)
  }

  /** Explicit-broadcast policy for the |V|-bounded per-round frames
    * (frontier/visited, label tables, contribution sums) on the SMALL
    * path, where cached inputs leave the planner stats-blind (see
    * [[pinner]]) and the hint is what keeps supersteps shuffle-light.
    * ADVICE r10: the hint must not be unconditional — the 128 MiB edge
    * gate admits ~4M-edge graphs whose node tables run to hundreds of
    * MB, too big to re-broadcast every round. Gate on a row bound the
    * algorithm computes itself (the TRUE node count where the algorithm
    * already builds the node set; 2x the checkpointed edge count in
    * bfsHops, which never does) at the same ~48 B/row hash-map
    * footprint and 32 MB ceiling as [[finishTriangles]]. Above the
    * gate — and always on the large path — identity: AQE's true sizes
    * (checkpoint path) or plain shuffle joins make the call. */
  private def gatedBcast(p: Pinned, rowBound: Long): DataFrame => DataFrame =
    if (p.small && rowBound * 48L <= 32L * 1024 * 1024)
      df => broadcast(df)
    else identity

  /** Gate for the driver-local PageRank kernels: collected-edge
    * footprint (rows × 32 B) at or under this runs the fixed-point on
    * the driver in primitive arrays (default 64 MiB ≈ 2M edges, ~300
    * MB transient driver heap at the gate). Rationale: a 3-iteration
    * superstep loop on a sub-2M-edge graph schedules ~26 driver jobs
    * of pure fixed overhead (AQE stage-jobs, broadcast collects,
    * checkpoint materializations) — ~3 s of wall at local[32] for
    * milliseconds of arithmetic, and the same fixed floor on a real
    * cluster. Same posture as Similarity's DriverTrainCap: a
    * documented, conf-gated, bounded driver hop with the distributed
    * superstep path as the contract above the gate (equality-gated
    * against the kernel in GraphSpec across all three paths). */
  private def driverGraphBytes(df: DataFrame): Long =
    confLong(df, "spark.graft.graph.driverGraphBytes", 64L * 1024 * 1024)

  /** Driver-local integer PageRank fixed point (see
    * [[driverGraphBytes]] for when and why). Runs the IDENTICAL
    * integer recurrence as the distributed superstep — same divisions
    * in the same order, all quantities positive longs — so the result
    * is bit-equal to the distributed paths (GraphSpec asserts all
    * three). `e` must be the distinct (src, dst) checkpointed edge
    * frame; `sources = None` is global PageRank, `Some(seeds)` the
    * personalized variant (teleport restricted to seeds, which are
    * indexed even when isolated). One collect job in, one parallelize
    * out; everything between is primitive-array arithmetic. */
  private def pageRankLocal(
      e: DataFrame,
      sources: Option[Seq[Long]],
      iters: Int,
      massScale: Long): DataFrame = {
    val spark = e.sparkSession
    val rows = e.select(col("src"), col("dst")).collect()
    val m = rows.length
    // node-id interning: index of first appearance
    val idx = new java.util.HashMap[Long, Int]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def intern(x: Long): Int = {
      val got = idx.getOrDefault(x, -1)
      if (got >= 0) got
      else { val i = ids.length; idx.put(x, i); ids += x; i }
    }
    val srcI = new Array[Int](m)
    val dstI = new Array[Int](m)
    var i = 0
    while (i < m) {
      srcI(i) = intern(rows(i).getLong(0))
      dstI(i) = intern(rows(i).getLong(1))
      i += 1
    }
    sources.foreach(_.foreach(intern)) // isolated seeds keep teleport
    val n = ids.length
    require(n > 0, sources.fold("pageRankInt: no edges")(_ =>
      "personalizedPageRankInt: no nodes"))
    val deg = new Array[Long](n)
    i = 0; while (i < m) { deg(srcI(i)) += 1L; i += 1 }
    val init = massScale / sources.fold(n.toLong)(_.size.toLong)
    val base = (15L * init) / 100L
    val isSeed = new Array[Boolean](n)
    sources.foreach(_.foreach(s => isSeed(idx.get(s)) = true))
    val r = new Array[Long](n)
    i = 0
    while (i < n) {
      r(i) = if (sources.isEmpty || isSeed(i)) init else 0L
      i += 1
    }
    var k = 0
    while (k < iters) {
      val s = new Array[Long](n)
      i = 0
      while (i < m) {
        // deg(srcI) >= 1 by construction (it has this out-edge)
        s(dstI(i)) += r(srcI(i)) / deg(srcI(i))
        i += 1
      }
      i = 0
      while (i < n) {
        val b = if (sources.isEmpty || isSeed(i)) base else 0L
        r(i) = b + (85L * s(i)) / 100L
        i += 1
      }
      k += 1
    }
    val out = (0 until n).map(j =>
      org.apache.spark.sql.Row(ids(j), deg(j), r(j)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", LongType, false),
      org.apache.spark.sql.types.StructField("deg", LongType, false),
      org.apache.spark.sql.types.StructField("r", LongType, false)))
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, n / 10000 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, slices), schema)
  }

  /** Driver-local triangle kernel (see [[driverGraphBytes]] for the
    * gate rationale — same fixed-scheduling-floor argument as
    * [[pageRankLocal]]: the distributed path schedules the adjacency
    * shuffle, a stats probe, two edge⋈adjacency joins, the per-node
    * groupBy and the completion join — ~8 driver jobs of fixed
    * overhead for a graph whose whole edge list fits in one task).
    * `canonD` must be the DISTINCT canonical a<b edge frame. The
    * arithmetic is the identical integer math as the distributed
    * adjacency path (|N(a)∩N(b)| per edge, per-node sum halved), so
    * results are exactly equal on every path (GraphSpec asserts all
    * three). One collect in, one parallelize out; the intersection
    * loop runs data-parallel over edge chunks with per-thread
    * accumulators (integer adds — order-independent, deterministic). */
  private def triangleLocal(canonD: DataFrame): DataFrame = {
    val spark = canonD.sparkSession
    val rows = canonD.select(col("a"), col("b")).collect()
    val m = rows.length
    val idx = new java.util.HashMap[Long, Int]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def intern(x: Long): Int = {
      val got = idx.getOrDefault(x, -1)
      if (got >= 0) got
      else { val i = ids.length; idx.put(x, i); ids += x; i }
    }
    val aI = new Array[Int](m)
    val bI = new Array[Int](m)
    var i = 0
    while (i < m) {
      aI(i) = intern(rows(i).getLong(0))
      bI(i) = intern(rows(i).getLong(1))
      i += 1
    }
    val n = ids.length
    // CSR adjacency: degree count → offsets → fill → per-node sort
    val deg = new Array[Int](n)
    i = 0; while (i < m) { deg(aI(i)) += 1; deg(bI(i)) += 1; i += 1 }
    val off = new Array[Int](n + 1)
    i = 0; while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val fill = java.util.Arrays.copyOf(off, n)
    val nbr = new Array[Long](2 * m)
    i = 0
    while (i < m) {
      nbr(fill(aI(i))) = ids(bI(i)); fill(aI(i)) += 1
      nbr(fill(bI(i))) = ids(aI(i)); fill(bI(i)) += 1
      i += 1
    }
    java.util.stream.IntStream.range(0, n).parallel().forEach { v =>
      java.util.Arrays.sort(nbr, off(v), off(v + 1))
    }
    // each triangle at node x is counted by BOTH its x-incident edges
    // → per-node sums are exactly 2·tri(x) (the adjacencyIntersect
    // invariant), halved below
    val nThreads = math.max(1,
      math.min(Runtime.getRuntime.availableProcessors(), 32))
    val partials = java.util.stream.IntStream.range(0, nThreads).parallel()
      .mapToObj[Array[Long]] { t =>
        val acc = new Array[Long](n)
        val lo = (m.toLong * t / nThreads).toInt
        val hi = (m.toLong * (t + 1) / nThreads).toInt
        var e = lo
        while (e < hi) {
          val u = aI(e); val v = bI(e)
          var p = off(u); val pEnd = off(u + 1)
          var q = off(v); val qEnd = off(v + 1)
          var c = 0L
          while (p < pEnd && q < qEnd) {
            val x = nbr(p); val y = nbr(q)
            if (x < y) p += 1
            else if (y < x) q += 1
            else { c += 1; p += 1; q += 1 }
          }
          acc(u) += c; acc(v) += c
          e += 1
        }
        acc
      }.toArray(k => new Array[Array[Long]](k))
    val tri = new Array[Long](n)
    partials.foreach { acc =>
      i = 0; while (i < n) { tri(i) += acc(i); i += 1 }
    }
    val out = (0 until n).map(j =>
      org.apache.spark.sql.Row(ids(j), deg(j).toLong, tri(j) / 2))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", LongType, false),
      org.apache.spark.sql.types.StructField("deg", LongType, false),
      org.apache.spark.sql.types.StructField("triangles", LongType, false)))
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, n / 10000 + 1))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, slices), schema)
  }

  /** Driver-local level-synchronous BFS (gate rationale:
    * [[driverGraphBytes]] — each distributed superstep is a
    * broadcast join + distinct + anti-join + count probe, ~4 driver
    * jobs of fixed overhead per hop on a tiny graph). `e` must be
    * the distinct self-loop-free (src, dst) frame. Integer hop
    * labels — exactly equal to the superstep path by construction
    * (GraphSpec three-path equality). */
  private def bfsLocal(
      e: DataFrame, source: Long, maxHops: Int): DataFrame = {
    val spark = e.sparkSession
    val rows = e.select(col("src"), col("dst")).collect()
    val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
    rows.foreach { r =>
      adj.computeIfAbsent(r.getLong(0),
        _ => scala.collection.mutable.ArrayBuffer.empty[Long]) += r.getLong(1)
    }
    val dist = new java.util.HashMap[Long, Long]()
    dist.put(source, 0L)
    var frontier: Seq[Long] = Seq(source)
    var hop = 0L
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[Long]
      frontier.foreach { u =>
        val ns = adj.get(u)
        if (ns != null) ns.foreach { v =>
          if (!dist.containsKey(v)) { dist.put(v, hop); next += v }
        }
      }
      frontier = next.toSeq
    }
    import scala.jdk.CollectionConverters._
    val out = dist.entrySet().asScala.toSeq
      .map(kv => org.apache.spark.sql.Row(kv.getKey.longValue(), kv.getValue.longValue()))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", LongType, false),
      org.apache.spark.sql.types.StructField("hops", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out,
      math.max(1, math.min(spark.sparkContext.defaultParallelism,
        out.size / 10000 + 1))), schema)
  }

  /** Driver-local synchronous min-label propagation (same gate and
    * exactness argument as [[bfsLocal]]; the distributed loop costs
    * two exchanges per round). `e` must be the distinct
    * self-loop-free (src, dst) frame. */
  private def labelPropLocal(e: DataFrame, iters: Int): DataFrame = {
    val spark = e.sparkSession
    val rows = e.select(col("src"), col("dst")).collect()
    val m = rows.length
    val idx = new java.util.HashMap[Long, Int]()
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def intern(x: Long): Int = {
      val got = idx.getOrDefault(x, -1)
      if (got >= 0) got
      else { val i = ids.length; idx.put(x, i); ids += x; i }
    }
    val srcI = new Array[Int](m)
    val dstI = new Array[Int](m)
    var i = 0
    while (i < m) {
      srcI(i) = intern(rows(i).getLong(0))
      dstI(i) = intern(rows(i).getLong(1))
      i += 1
    }
    val n = ids.length
    var l = Array.tabulate(n)(j => ids(j))
    var k = 0
    while (k < iters) {
      // synchronous: next round's labels read ONLY last round's
      val nl = l.clone()
      i = 0
      while (i < m) {
        if (l(srcI(i)) < nl(dstI(i))) nl(dstI(i)) = l(srcI(i))
        i += 1
      }
      l = nl
      k += 1
    }
    val out = (0 until n).map(j => org.apache.spark.sql.Row(ids(j), l(j)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", LongType, false),
      org.apache.spark.sql.types.StructField("label", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out,
      math.max(1, math.min(spark.sparkContext.defaultParallelism,
        n / 10000 + 1))), schema)
  }

  /** Floor (in `maxAdjDegree` units) at or above which the FUSED
    * adjacency build runs: one node-keyed shuffle whose `collect_set`
    * both dedups raw edges and assembles the sorted neighbor arrays.
    * A caller passing a LOWER cap is declaring hub risk — neighbor
    * arrays that must never be assembled at all — and gets the
    * conservative two-pass structure (scalar degree pass first, arrays
    * only once proven bounded). Conf override
    * `spark.graft.graph.fusedAdjFloor` exists so tests can force
    * either prep onto any fixture. */
  private def fusedAdjFloor(df: DataFrame): Long =
    confLong(df, "spark.graft.graph.fusedAdjFloor", 1000000L)

  /** Sampled hub probe for UNDECLARED hub risk on the LARGE path
    * (ADVICE r10): the fused prep assembles full neighbor arrays
    * before the true max degree is known, so a hub-skewed graph whose
    * caller left `maxAdjDegree` at the default would pay (and possibly
    * blow task memory on) hub-array assembly that the measured degree
    * would have routed to the wedge fallback. Before the fused build
    * runs on a graph past the small-stats gate, Bernoulli-sample the
    * canonical edges (seeded — the route is deterministic given a
    * fixed partitioning, and BOTH routes are result-identical per
    * GraphSpec, so routing may depend on layout but results never do)
    * and estimate maxDeg as maxSampleDeg / f: a true degree-d hub
    * samples Binomial(d, f), so at the default f = 1% a cap-sized
    * (1e6) hub concentrates at 10 000 ± ~100 sampled neighbors —
    * detection is essentially certain, and the ×2 safety margin below
    * absorbs the tail. Cost: one scan + a 1%-sized shuffle, only on
    * graphs big enough (> `smallGraphBytes`) to hold a dangerous hub
    * at all — the small path skips it because a ≤128 MiB edge list
    * cannot contain a neighbor array past ~4M longs (32 MB, well
    * inside a task). */
  private[graft] def sampledHubRisk(
      canon: DataFrame, cap: Long, fraction: Double = 0.01): Boolean = {
    val maxRow = canon.sample(withReplacement = false, fraction, seed = 20740)
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head()
    val maxSampleDeg = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    maxSampleDeg / fraction >= cap / 2.0
  }

  /** Per-node triangle counts. A tiny graph (distinct canonical
    * edges × 32 B ≤ `spark.graft.graph.driverGraphBytes`, default
    * 64 MiB) runs the driver-local CSR kernel ([[triangleLocal]] —
    * the pageRankInt posture: exact-identical integer math, one
    * bounded collect, no superstep scheduling floor). Above the gate,
    * two distributed strategies behind one contract, auto-selected on
    * the graph's MAX DEGREE:
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
    * PREP STRUCTURE is likewise degree-capped, via `maxAdjDegree`
    * against `fusedAdjFloor`:
    *
    *  - **Fused** (default): dedup + degree + adjacency in ONE
    *    node-keyed shuffle (`collect_set` dedups while assembling the
    *    sorted arrays; deg = cardinality; the canonical distinct edge
    *    list re-derives by exploding the pinned adjacency, narrow).
    *    This removed two full shuffles vs the two-pass prep and took
    *    q106 from 3.8 s to ~2.3 s at sf0.1. Per-group aggregate
    *    memory is bounded by the TRUE max degree (8 B/neighbor + set
    *    overhead) — fine up to ~10⁷-degree hubs per task.
    *  - **Conservative** (`maxAdjDegree` < `fusedAdjFloor`): a graph
    *    whose hubs exceed task memory must never assemble their
    *    arrays, so degrees are counted first from the distinct edge
    *    list (scalar aggregate — hub-safe at any skew) and arrays are
    *    built only if maxDeg proves bounded; else the wedge path runs
    *    off the scalar degree table alone.
    *
    * Input edges are undirected; both orientations, self-loops and
    * duplicates are tolerated (canonicalized away). Output: one row
    * per node incident to ≥ 1 edge — (node, deg, triangles), integer
    * exact, identical from all paths (gated by GraphSpec). */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxAdjDegree: Long = 1000000L,
      broadcastEdgeLimit: Long = 5000000L): DataFrame = {
    val p = pinner(edges)
    val canon0 = edges.select(
        least(col(srcCol), col(dstCol)).cast(LongType).as("a"),
        greatest(col(srcCol), col(dstCol)).cast(LongType).as("b"))
      .where(col("a") =!= col("b"))
    // Driver-kernel probe, small-stats path only (a graph past the
    // stats gate cannot fit the driver gate anyway, so the distinct +
    // count probe job would be pure waste there). Lazy checkpoint +
    // count materializes and persists the distinct edge list in one
    // pass (the bfsHops probe-fusion pattern) — if the kernel is
    // declined, the distributed prep reuses the pinned distinct
    // blocks instead of replaying the caller's edge derivation.
    val dgb = driverGraphBytes(edges)
    if (p.small && dgb > 0) {
      val canonD = canon0.distinct().localCheckpoint(eager = false)
      if (canonD.count() * 32L <= dgb) return triangleLocal(canonD)
      // distinct input: the fused collect_set dedup is a no-op on it
      // and the conservative prep's distinct() is a cheap re-shuffle
      // of pinned blocks — both paths stay value-identical
      return if (maxAdjDegree >= fusedAdjFloor(edges))
        fusedTriangles(canonD, p, maxAdjDegree, broadcastEdgeLimit)
      else conservativeTriangles(canonD, p, maxAdjDegree, broadcastEdgeLimit)
    }
    // Fused is the default; an undeclared hub graph past the small
    // gate is demoted to the conservative two-pass prep when the
    // sampled probe estimates a hub near the adjacency cap.
    if (maxAdjDegree >= fusedAdjFloor(edges) &&
        (p.small || !sampledHubRisk(canon0, maxAdjDegree)))
      fusedTriangles(canon0, p, maxAdjDegree, broadcastEdgeLimit)
    else conservativeTriangles(canon0, p, maxAdjDegree, broadcastEdgeLimit)
  }

  /** Fused prep: one shuffle builds the dedup'd sorted adjacency;
    * everything else (degree, canonical edges, stats) derives from it
    * without touching the raw edges again. `canon0` is the canonical
    * a<b projection, NOT deduplicated. */
  private def fusedTriangles(
      canon0: DataFrame,
      p: Pinned,
      maxAdjDegree: Long,
      broadcastEdgeLimit: Long): DataFrame = {
    val adj = p.pin(canon0.select(col("a").as("node"), col("b").as("nbr"))
      .union(canon0.select(col("b").as("node"), col("a").as("nbr")))
      .groupBy("node")
      .agg(sort_array(collect_set(col("nbr"))).as("nbrs")))
    val statsRow = adj.agg(max(size(col("nbrs"))), count(lit(1)),
      sum(size(col("nbrs")))).head()
    val maxDeg = if (statsRow.isNullAt(0)) 0L else statsRow.getInt(0).toLong
    val nNodes = statsRow.getLong(1)
    val sumDeg = if (statsRow.isNullAt(2)) 0L else statsRow.getLong(2)
    val deg = adj.select(col("node"), size(col("nbrs")).cast(LongType).as("deg"))
    // every edge sits in BOTH endpoints' neighbor lists; the a<b
    // filter keeps exactly one copy → canonical DISTINCT edges, narrow
    // off the pinned adjacency
    val canon = adj.select(col("node").as("a"), explode(col("nbrs")).as("b"))
      .where(col("a") < col("b"))
    val perNode =
      if (maxDeg <= maxAdjDegree)
        // TRUE adjacency payload: Σdeg neighbor longs + per-row
        // overhead (the r8 gate used the |V|·maxDeg·8 WORST case,
        // which overstates by the full degree skew and blocked this
        // broadcast on exactly the graphs — co-purchase, sf0.1 —
        // where it matters; with the cache path stats-blind that
        // meant two sort-merge joins of the edge list, q106 9.4x
        // oracle). When it fits (≤ 32 MB) the two edge⋈adjacency
        // joins run map-side and the edge list never shuffles.
        adjacencyIntersect(canon, adj,
          broadcastAdj = sumDeg * 8L + nNodes * 48L <= 32L * 1024 * 1024)
      else wedgeTriangles(canon, deg, p.pin,
        nEdges = sumDeg / 2, broadcastEdgeLimit)
    finishTriangles(p, deg, nNodes, perNode)
  }

  /** Conservative two-pass prep (hub-declared graphs): scalar degree
    * pass first; neighbor arrays only if maxDeg proves ≤ the cap. */
  private def conservativeTriangles(
      canon0: DataFrame,
      p: Pinned,
      maxAdjDegree: Long,
      broadcastEdgeLimit: Long): DataFrame = {
    val pin = p.pin
    val canon = pin(canon0.distinct())
    val deg = pin(canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg")))
    val statsRow =
      deg.agg(max(col("deg")), count(lit(1)), sum(col("deg"))).head()
    val maxDeg = if (statsRow.isNullAt(0)) 0L else statsRow.getLong(0)
    val nNodes = statsRow.getLong(1)
    val sumDeg = if (statsRow.isNullAt(2)) 0L else statsRow.getLong(2)
    val perNode =
      if (maxDeg <= maxAdjDegree) {
        // collect_list (not _set): canon is distinct, so neighbor
        // lists are duplicate-free by construction — and the kernel
        // needs them SORTED, which sort_array pins
        val adj = pin(canon.select(col("a").as("node"), col("b").as("nbr"))
          .union(canon.select(col("b").as("node"), col("a").as("nbr")))
          .groupBy("node")
          .agg(sort_array(collect_list(col("nbr"))).as("nbrs")))
        adjacencyIntersect(canon, adj,
          broadcastAdj = sumDeg * 8L + nNodes * 48L <= 32L * 1024 * 1024)
      } else wedgeTriangles(canon, deg, pin,
        nEdges = sumDeg / 2, broadcastEdgeLimit)
    finishTriangles(p, deg, nNodes, perNode)
  }

  /** Final enrich shared by both preps: perNode is ≤ |V| rows of
    * (node, tri) — broadcast it explicitly on the small path (cache
    * leaves the planner stats-blind; see [[pinner]]); 48 B/row
    * hash-map footprint bound. */
  private def finishTriangles(
      p: Pinned,
      deg: DataFrame,
      nNodes: Long,
      perNode: DataFrame): DataFrame = {
    val perNodeSide =
      if (p.small && nNodes * 48L <= 32L * 1024 * 1024) broadcast(perNode)
      else perNode
    deg.join(perNodeSide, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("triangles"))
  }

  /** Adjacency-intersection join phase: (node, tri) for nodes with
    * ≥ 1 triangle. `canon` must be canonical a<b distinct edges; `adj`
    * the pinned (node, sorted nbrs) table. */
  private def adjacencyIntersect(
      canon: DataFrame,
      adj: DataFrame,
      broadcastAdj: Boolean): DataFrame = {
    val adjSide = if (broadcastAdj) broadcast(adj) else adj
    val withCounts = canon
      .join(adjSide.select(col("node").as("a"), col("nbrs").as("na")), Seq("a"))
      .join(adjSide.select(col("node").as("b"), col("nbrs").as("nb")), Seq("b"))
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
      nEdges: Long,
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
      if (nEdges <= broadcastEdgeLimit)
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
    * 1..k-1. Driver traffic: one count probe per round (early stop
    * once the frontier drains), which doubles as the lazy
    * checkpoint's materialization — one scheduled job per round. */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64,
      s"bfsHops: maxHops in [1, 64], got $maxHops")
    // reused (probed) every superstep → checkpointed by [[pinnedEdges]]
    val (e, p, eRows) = pinnedEdges(
      edges.select(col(srcCol).cast(LongType).as("src"),
          col(dstCol).cast(LongType).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    if (eRows * 32L <= driverGraphBytes(edges))
      return bfsLocal(e, source, maxHops)
    // |V| ≤ 2|E| bounds frontier and visited; BFS never builds the
    // node set, so the edge count is the bound [[gatedBcast]] gets
    val bcast = gatedBcast(p, 2L * eRows)
    val spark = edges.sparkSession
    import spark.implicits._
    var visited = Seq((source, 0L)).toDF("node", "hops")
      .localCheckpoint(eager = true)
    var frontier = visited.select("node")
    var hop = 0L
    var drained = false
    while (hop < maxHops && !drained) {
      hop += 1
      // small path: frontier and visited are |V|-bounded — broadcast
      // both sides explicitly (cache leaves the planner stats-blind,
      // see [[pinner]]); the frontier⋈e join then streams the pinned
      // edge list map-side and the anti-join never shuffles `next`.
      // LAZY checkpoint + explicit count: the count job materializes
      // AND persists the marked RDD in one pass — the per-round probe
      // the old eager-then-isEmpty pair paid two scheduled jobs for
      val next = bcast(frontier).join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(bcast(visited.select(col("node").as("vn"))),
          col("node") === col("vn"), "left_anti")
        .localCheckpoint(eager = false)
      if (next.count() == 0) { drained = true }
      else {
        // lazy: materializes (and persists) inside the NEXT round's
        // probe job — or the caller's terminal action on the last
        // round — so no extra barrier job per round
        visited = visited.union(next.select(col("node"), lit(hop).as("hops")))
          .localCheckpoint(eager = false)
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
    // reused every round → checkpointed by [[pinnedEdges]]. The gate
    // counts DISTINCT edges: gating on the raw list looks cheaper
    // (min-propagation is duplicate-idempotent) but a clique-expanded
    // input can be 10×+ duplicated, and a raw-count gate then exiles
    // a genuinely tiny graph to the distributed supersteps (measured
    // r13: q125 4.0 → 7.7 s). Callers holding the MEMBERSHIP form of
    // a co-occurrence graph should use [[cliqueMinLabelPropagate]],
    // which never expands pairs at all.
    val (e, p, eRows) = pinnedEdges(
      edges.select(col(srcCol).cast(LongType).as("src"),
          col(dstCol).cast(LongType).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
    if (eRows * 32L <= driverGraphBytes(edges))
      return labelPropLocal(e, iters)
    val nodes = p.pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct())
    // TRUE node count gates the per-round broadcasts (~50 ms scan of
    // the pinned set, once per invocation — see [[gatedBcast]])
    val bcast = gatedBcast(p, nodes.count())
    var l = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      // small path: the label state is |V| rows — broadcast it into
      // the superstep join so the pinned edge list streams map-side
      // (cache is stats-blind; see [[pinner]]), and broadcast the
      // per-round min table back onto the node set likewise
      val m = e.join(bcast(l), col("src") === col("node"))
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
      l = l.join(bcast(m), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("ml"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
    }
    l
  }

  /** Bounded-round min-label propagation over the CLIQUE EXPANSION of
    * a bipartite membership table (group, member) — co-purchase,
    * co-supply, co-occurrence blocking — WITHOUT materializing the
    * O(Σ k²) pair list the explicit expansion costs: a 30-member
    * group contributes 870 ordered pairs but only 30 membership rows
    * (measured r13: q125's explode² expansion was ~12.5M pair rows
    * off 600 k membership rows — the whole query floor). Semantically
    * IDENTICAL to [[minLabelPropagate]] over the src ≠ dst pair
    * expansion (CliqueLabelSpec asserts the equality): per round
    *
    *   label'(v) = min(label(v), min_{g ∋ v} min_{u ∈ g} label(u))
    *
    * — the inner min may include v itself, which the outer
    * min(label(v), ·) absorbs. Nodes are members of groups with ≥ 2
    * DISTINCT members (singleton groups yield no pairs, so their
    * exclusive members are not in the pair graph at all).
    *
    * Scale shape per round: two |membership|-row shuffles (min per
    * group, then min per member) — O(Σ k), never O(Σ k²); membership
    * is checkpointed once and reused. The driver kernel runs under
    * the same conf gate as the pair algorithms
    * ([[driverGraphBytes]]), counted on RAW membership rows × 16 B —
    * duplication only ever pushes TOWARD the distributed path — and
    * dedups driver-side, so the tiny-corpus path pays ZERO shuffles:
    * scan → checkpoint/count → collect → primitive-array rounds. */
  def cliqueMinLabelPropagate(
      memb: DataFrame,
      grpCol: String,
      memCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32,
      s"cliqueMinLabelPropagate: iters in [1, 32], got $iters")
    val (raw, _, rawRows) = pinnedEdges(
      memb.select(col(grpCol).cast(LongType).as("g"),
        col(memCol).cast(LongType).as("m")))
    if (rawRows * 16L <= driverGraphBytes(memb))
      return cliqueLabelLocal(raw, iters)
    // distributed: dedup memberships once (supersteps reuse the
    // checkpointed copy), keep only groups with ≥ 2 members
    val (spAll, p, spRows) = pinnedEdges(raw.distinct())
    val multi = p.pin(spAll.groupBy("g").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2).select("g"))
    val sp = p.pin(spAll.join(p.bcast(multi), Seq("g"), "left_semi"))
    val nodes = p.pin(sp.select(col("m").as("node")).distinct())
    val bcast = gatedBcast(p, nodes.count())
    var l = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val gm = sp.join(bcast(l), col("m") === col("node"))
        .groupBy("g").agg(min(col("label")).as("gl"))
      val mm = sp.join(bcast(gm), Seq("g"))
        .groupBy(col("m").as("node")).agg(min(col("gl")).as("ml"))
      // same lazy-checkpoint rationale as [[minLabelPropagate]]
      l = l.join(bcast(mm), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("ml"), col("label"))).as("label"))
        .localCheckpoint(eager = false)
    }
    l
  }

  /** Driver-local clique-label kernel (see [[cliqueMinLabelPropagate]]
    * for the gate): dedups raw membership rows, drops singleton
    * groups, then runs the synchronous rounds over a group-CSR in
    * primitive arrays — bit-equal to the distributed path and to
    * minLabelPropagate over the explicit pair expansion
    * (CliqueLabelSpec asserts all three). */
  private def cliqueLabelLocal(raw: DataFrame, iters: Int): DataFrame = {
    val spark = raw.sparkSession
    val rows = raw.select(col("g"), col("m")).collect()
    val gIdx = new java.util.HashMap[Long, Int]()
    val mIdx = new java.util.HashMap[Long, Int]()
    val mIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = new java.util.HashSet[Long]()
    val memOf = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[Int]]
    rows.foreach { r =>
      val g = r.getLong(0); val m = r.getLong(1)
      var gi = gIdx.getOrDefault(g, -1)
      if (gi < 0) {
        gi = memOf.length; gIdx.put(g, gi)
        memOf += scala.collection.mutable.ArrayBuffer.empty[Int]
      }
      var mi = mIdx.getOrDefault(m, -1)
      if (mi < 0) { mi = mIds.length; mIdx.put(m, mi); mIds += m }
      val key = gi.toLong << 32 | (mi.toLong & 0xffffffffL)
      if (seen.add(key)) memOf(gi) += mi
    }
    // active members: in some group with >= 2 distinct members
    val active = new Array[Boolean](mIds.length)
    memOf.foreach(ms => if (ms.length >= 2) ms.foreach(active(_) = true))
    var l = Array.tabulate(mIds.length)(j => mIds(j))
    var k = 0
    while (k < iters) {
      val nl = l.clone() // synchronous: group mins read last round only
      memOf.foreach { ms =>
        if (ms.length >= 2) {
          var gm = Long.MaxValue
          var i = 0
          while (i < ms.length) { if (l(ms(i)) < gm) gm = l(ms(i)); i += 1 }
          i = 0
          while (i < ms.length) {
            if (gm < nl(ms(i))) nl(ms(i)) = gm
            i += 1
          }
        }
      }
      l = nl
      k += 1
    }
    val out = (0 until mIds.length).filter(active)
      .map(j => org.apache.spark.sql.Row(mIds(j), l(j)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", LongType, false),
      org.apache.spark.sql.types.StructField("label", LongType, false)))
    spark.createDataFrame(spark.sparkContext.parallelize(out,
      math.max(1, math.min(spark.sparkContext.defaultParallelism,
        out.length / 10000 + 1))), schema)
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
    * Scale shape per iteration (FUSED superstep, round-11): ONE
    * broadcast-or-shuffle join of the previous round's contribution
    * sums onto the checkpointed (src, dst, deg) list + one
    * groupBy(dst) with map-side partial sums. The per-round rank
    * table is never materialized node-side inside the loop:
    *
    *   r_{k-1}(u) = base + (85 · s_{k-1}(u)) div 100   (s absent → 0)
    *
    * is an exact function of the previous sums, so each round
    * reconstructs it EDGE-SIDE after the join — value-identical to
    * the r10 shape (rank join + |V|-row node-set completion join per
    * round) because nodes absent from sums reconstruct to exactly the
    * rank the completion join would have assigned them. On the
    * broadcast path this halves the per-round driver-scheduled jobs
    * (one sums broadcast-collect instead of sums + rank) and drops
    * the completion join entirely — the fixed scheduling floor that
    * held q121 at 2.5x its tiny-graph oracle (BENCH-notes r10). Sums
    * state is lazily localCheckpoint'ed each round: the next round's
    * broadcast-collect job materializes AND persists it in one pass
    * (the bfsHops probe-fusion pattern). Driver traffic is the node
    * COUNT only.
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
    // reused every superstep → checkpointed by [[pinnedEdges]]
    val (e, p, eRows) = pinnedEdges(
      edges.select(col(srcCol).cast(LongType).as("src"),
          col(dstCol).cast(LongType).as("dst"))
        .distinct())
    if (eRows * 32L <= driverGraphBytes(edges))
      return pageRankLocal(e, None, iters, massScale)
    val deg = p.pin(e.groupBy("src").agg(count(lit(1)).as("deg")))
    // out-degree hoisted ONTO the edge list once, outside the loop:
    // r div deg is constant per src, so computing it edge-side after a
    // single (src, dst, deg) pre-join is value-identical to the
    // node-side contribution join — and drops one shuffle join from
    // every superstep
    val eDeg = p.pin(e.join(deg, Seq("src")))
    val nodes = p.pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct())
    val n = nodes.count()
    require(n > 0, "pageRankInt: no edges")
    val bcast = gatedBcast(p, n)
    val init = massScale / n              // R div N
    val base = (15L * init) / 100L        // teleport term, positive → truncation ≡ floor
    // reconstructed edge-side rank: round 1 sees the uniform init mass
    val damp = "(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"
    var sums: DataFrame = null
    for (k <- 1 to iters) {
      val joined =
        if (k == 1) eDeg.withColumn("rv", lit(init))
        else eDeg.join(bcast(sums), col("src") === col("node"), "left")
          .withColumn("rv", lit(base) + expr(damp))
      sums = joined
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rv div deg")).as("s"))
        .localCheckpoint(eager = false)
    }
    // node-set completion happens ONCE, after the loop
    val r = nodes.join(bcast(sums), Seq("node"), "left")
      .select(col("node"), (lit(base) + expr(damp)).as("r"))
    r.join(bcast(deg), col("node") === col("src"), "left")
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
    // reused every superstep → checkpointed by [[pinnedEdges]]
    val (e, p, eRows) = pinnedEdges(
      edges.select(col(srcCol).cast(LongType).as("src"),
          col(dstCol).cast(LongType).as("dst"))
        .distinct())
    if (eRows * 32L <= driverGraphBytes(edges))
      return pageRankLocal(e, Some(sources), iters, massScale)
    val deg = p.pin(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val init = massScale / sources.size
    val base = (15L * init) / 100L
    val isSource = col("node").isin(sources: _*)
    val srcIsSource = col("src").isin(sources: _*)
    // same deg-hoist as [[pageRankInt]], plus the source-teleport term
    // hoisted ONTO the edge list outside the loop — the fused
    // superstep reconstructs r_{k-1}(src) edge-side and the teleport
    // part of that rank is a constant per src
    val eDeg = p.pin(e.join(deg, Seq("src"))
      .withColumn("srcBase", when(srcIsSource, lit(base)).otherwise(lit(0L))))
    val nodes = p.pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(edges.sparkSession.createDataFrame(
        edges.sparkSession.sparkContext
          .parallelize(sources.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", LongType, false)))))
      .distinct())
    val bcast = gatedBcast(p, nodes.count())
    // FUSED superstep (see [[pageRankInt]]): per round, one join of
    // the previous sums onto the pinned edge list reconstructs
    //   r_{k-1}(src) = srcBase + (85 · s_{k-1}(src)) div 100
    // and the rv > 0 prune keeps the exact ball the old r > 0
    // broadcast prune kept — a zero-rank src contributes rv div deg
    // = 0 and a dst with no surviving in-edge reads s = NULL →
    // coalesce 0, so the sums table stays REACHED-BALL-sized (3
    // seeds × k hops) while all-|V| completion happens once after
    // the loop; personalization is exactly the workload where most
    // ranks stay 0 for the early supersteps
    val damp = "(85 * coalesce(s, CAST(0 AS BIGINT))) div 100"
    var sums: DataFrame = null
    for (k <- 1 to iters) {
      val joined =
        if (k == 1)
          // round 1: only sources carry mass — a pinned-scan filter,
          // no join at all
          eDeg.withColumn("rv",
            when(srcIsSource, lit(init)).otherwise(lit(0L)))
        else eDeg.join(bcast(sums), col("src") === col("node"), "left")
          .withColumn("rv", col("srcBase") + expr(damp))
      // lazy checkpoint: materialized + persisted by the next round's
      // broadcast-collect (or the caller's terminal action)
      sums = joined
        .where(col("rv") > 0)
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("rv div deg")).as("s"))
        .localCheckpoint(eager = false)
    }
    val r = nodes.join(bcast(sums), Seq("node"), "left")
      .select(col("node"),
        (when(isSource, lit(base)).otherwise(lit(0L)) + expr(damp)).as("r"))
    r.join(bcast(deg), col("node") === col("src"), "left")
      .select(col("node"),
        coalesce(col("deg"), lit(0L)).as("deg"), col("r"))
  }
}
