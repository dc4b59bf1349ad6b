package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, Intervals, PhraseSearch, Sampling, Skyline}

/** Round-7 session-3 extension queries: graph analytics (triangles,
  * BFS), gaps-and-islands interval coalescing, Pareto skyline,
  * PPS-systematic weighted sampling, and positional phrase search.
  * Same contract as [[ExtQueries]]: every query ends in ORDER BY over
  * a unique key prefix, column names match the oracle SQL exactly,
  * and every comparison/aggregate that decides a row is integer- or
  * decimal-exact (no doubles anywhere in this file's outputs).
  */
object ExtQueries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q106 — per-node triangle counts over the part co-purchase graph
  // (parts sharing an order), via degree-ordered orientation
  // (Graph.triangleCounts): each triangle enumerated exactly once at
  // its order-minimal apex, wedge work Σ C(outdeg,2) = O(E^{3/2}).
  // The oracle counts the same triangles from the canonical a<b edge
  // list directly. Integer-exact.
  def q106(s: SparkSession, dir: String): DataFrame = {
    // co-purchase pairs WITHOUT a self-join: group each order's parts
    // (one shuffle of the 4-ish-item groups), then two chained
    // explodes emit the per-order pairs narrowly — the sort-merge
    // self-join this replaces was the query's single biggest cost
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val e = li.groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("src"), col("ps"))
      .select(col("src"), explode(col("ps")).as("dst"))
      .where(col("src") < col("dst"))
    Graph.triangleCounts(e, "src", "dst").orderBy("node")
  }

  val q106Sql: String =
    """WITH e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       deg AS (SELECT node, count(*) AS deg FROM
           (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       tri AS (SELECT x.a AS u, x.b AS v, y.b AS w
               FROM e x JOIN e y ON y.a = x.b
                 JOIN e z ON z.a = x.a AND z.b = y.b),
       pn AS (SELECT node, count(*) AS tri FROM
           (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri) GROUP BY 1)
       SELECT d.node, d.deg, COALESCE(pn.tri, 0) AS triangles
       FROM deg d LEFT JOIN pn USING (node) ORDER BY d.node"""

  // ---------------------------------------------------------------
  // q107 — bounded BFS (6 supersteps) over a deterministic 3-regular
  // chord graph on the customer keys (k → k+1, 2k, 3k+7 mod N): min
  // hop count from node 0 for every node reached. Both engines build
  // the identical edge set from the identical keys, so no assumption
  // on key contiguity is needed; hop labels are integers — exact by
  // construction. The oracle unrolls the 6 level-synchronous
  // frontiers and takes the per-node min.
  private val BfsHops = 6

  def q107(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey").as("k"))
    val n = c.count()
    val e = c.select(col("k").as("src"), ((col("k") + 1) % n).as("dst"))
      .union(c.select(col("k"), (col("k") * 2) % n))
      .union(c.select(col("k"), (col("k") * 3 + 7) % n))
    Graph.bfsHops(e, "src", "dst", source = 0L, maxHops = BfsHops)
      .orderBy("node")
  }

  val q107Sql: String = {
    val levels = (1 to BfsHops).map { h =>
      s"""r$h AS (SELECT DISTINCT e.dst AS node
            FROM e JOIN r${h - 1} ON e.src = r${h - 1}.node)"""
    }.mkString(",\n       ")
    val union = (0 to BfsHops).map(h =>
      s"SELECT node, $h AS h FROM r$h").mkString(" UNION ALL ")
    s"""WITH nn AS (SELECT count(*) AS n FROM customer),
       k AS (SELECT c_custkey AS k FROM customer),
       e AS (SELECT k AS src, (k + 1) % nn.n AS dst FROM k CROSS JOIN nn
             UNION ALL SELECT k, (k * 2) % nn.n FROM k CROSS JOIN nn
             UNION ALL SELECT k, (k * 3 + 7) % nn.n FROM k CROSS JOIN nn),
       r0 AS (SELECT CAST(0 AS BIGINT) AS node),
       $levels
       SELECT node, min(h) AS hops FROM ($union)
       GROUP BY 1 ORDER BY node"""
  }

  // ---------------------------------------------------------------
  // q108 — gaps-and-islands: each event opens a 6-hour half-open
  // activity interval [tus, tus+6h); overlapping-or-chained intervals
  // per user coalesce into islands (Intervals.coalesce — one hash
  // exchange + two in-partition window scans). µs integers end to
  // end; the median inter-event gap is ~7.3 h, so real merging occurs
  // without degenerating to one island per user.
  private val SpanUs = 21600000000L // 6 h

  def q108(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "events").select(col("user_id"),
      expr("ts div 1000").as("s"),
      (expr("ts div 1000") + SpanUs).as("e"), col("event_id"))
    Intervals.coalesce(iv, "user_id", "s", "e", "event_id")
      .orderBy("user_id", "island")
  }

  val q108Sql: String =
    s"""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
           epoch_us(ts) + $SpanUs AS e, event_id FROM events),
       w AS (SELECT user_id, s, e, event_id,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             FROM iv),
       f AS (SELECT user_id, s, e, event_id,
               CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
             FROM w),
       g AS (SELECT user_id, s, e,
               CAST(sum(brk) OVER (PARTITION BY user_id
                 ORDER BY s, e, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS island
             FROM f)
       SELECT user_id, island, min(s) AS island_start, max(e) AS island_end,
         count(*) AS n_rows, max(e) - min(s) AS covered
       FROM g GROUP BY 1, 2 ORDER BY user_id, island"""

  // ---------------------------------------------------------------
  // q109 — Pareto skyline of parts (minimize price, maximize size):
  // the sort-based 2-D characterization (Skyline.skyline2d) — per-
  // cost-group max + a strict-prefix running max over the DISTINCT
  // cost series, never the O(n²) dominance anti-join. Price is
  // quantized to integer cents with bround ≡ round_even (q98
  // playbook), so every dominance comparison is exact.
  def q109(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"),
      bround(col("p_retailprice") * lit(100.0), 0).cast("long").as("cents"),
      col("p_size").cast("long").as("size"))
    Skyline.skyline2d(p, "cents", "size")
      .select(col("p_partkey"), col("cents"), col("size"))
      .orderBy("p_partkey")
  }

  val q109Sql: String =
    """WITH p AS (SELECT p_partkey,
           CAST(round_even(p_retailprice * 100.0, 0) AS BIGINT) AS cents,
           CAST(p_size AS BIGINT) AS size FROM part),
       g AS (SELECT cents, max(size) AS gmax FROM p GROUP BY 1),
       f AS (SELECT cents, gmax FROM
           (SELECT cents, gmax,
              max(gmax) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
            FROM g)
           WHERE pm IS NULL OR gmax > pm)
       SELECT p.p_partkey, p.cents, p.size
       FROM p JOIN f ON p.cents = f.cents AND p.size = f.gmax
       ORDER BY p.p_partkey"""

  // ---------------------------------------------------------------
  // q110 — PPS-systematic weighted sample (k=64 grid points) of the
  // corpus by token weight: documents laid end-to-end in id order,
  // the document under every multiple of ⌊W/64⌋ selected
  // (Sampling.weightedSystematic over the distributed prefix sum).
  // Deterministic, RNG-free; `hits` is the PPS multiplicity a
  // heavier-than-step document absorbs. All-integer arithmetic on
  // strictly positive offsets, so `div` ≡ `//`.
  def q110(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("w"))
    Sampling.weightedSystematic(d, "doc_id", "w", k = 64)
      .orderBy("id")
  }

  val q110Sql: String =
    """WITH d AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS w
         FROM documents),
       tt AS (SELECT CAST(sum(w) // 64 AS BIGINT) AS step FROM d),
       c AS (SELECT doc_id, w,
               CAST(COALESCE(sum(w) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cs
             FROM d),
       sel AS (SELECT doc_id AS id, w AS weight, cs AS cum_start,
                 (cs + step - 1) // step AS first_grid,
                 (cs + w - 1) // step - (cs + step - 1) // step + 1 AS hits
               FROM c CROSS JOIN tt)
       SELECT id, weight, cum_start, first_grid, hits
       FROM sel WHERE hits >= 1 ORDER BY id"""

  // ---------------------------------------------------------------
  // q111 — positional phrase search: documents containing the exact
  // phrase "table hash", with occurrence count and first 0-based
  // position, via the positional-postings intersection
  // (PhraseSearch.phraseHits — the token stream is filtered to the
  // phrase's terms BEFORE any join). The oracle scans each token
  // list with an index comprehension.
  def q111(s: SparkSession, dir: String): DataFrame =
    PhraseSearch.phraseHits(t(s, dir, "documents"), "doc_id", "text",
        Seq("table", "hash"))
      .withColumnRenamed("doc", "doc_id")
      .orderBy("doc_id")

  val q111Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
         FROM documents),
       h AS (SELECT doc_id,
               [j for j in range(1, len(w))
                if w[j] = 'table' AND w[j + 1] = 'hash'] AS ps
             FROM w)
       SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_hits,
         CAST(ps[1] - 1 AS BIGINT) AS first_pos
       FROM h WHERE len(ps) >= 1 ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q112 — STREAMING heavy hitters: the events table lands as parquet
  // and streams through in forced multi-file micro-batches; each
  // batch reduces to one Count-Min-sketch partial (KBs of state, the
  // q59 exactly-once partition discipline), merged post-stream and
  // verified exactly (StreamingIngest.runHeavyHittersSketch /
  // finishHeavyHitters). Oracle = the plain batch GROUP BY/HAVING —
  // the streamed split must be invisible in the answer.
  def q112(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q112").toString
    // landing staged once per JVM (input staging, untimed —
    // StagedInputs); sketches/checkpoint stay per-run
    val landing = StagedInputs.dir("q112", dir) { d =>
      t(s, dir, "events").select("user_id")
        .repartition(4) // several landing files → several micro-batches
        .write.parquet(s"$d/landing")
    } + "/landing"
    graft.streaming.StreamingIngest.runHeavyHittersSketch(
      s, landing, "user_id", s"$base/sketches", s"$base/ckpt",
      eps = 0.00002, confidence = 0.99, seed = 42,
      maxFilesPerTrigger = Some(2))
    val out = graft.streaming.StreamingIngest
      .finishHeavyHitters(s, landing, s"$base/sketches",
        "user_id", threshold = 80L)
      .select(col("k").as("user_id"), col("n"))
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("user_id")
  }

  val q112Sql: String =
    """SELECT user_id, count(*) AS n
       FROM events GROUP BY 1 HAVING count(*) >= 80
       ORDER BY user_id"""

  // ---------------------------------------------------------------
  // q113 — SCD Type 2 history build: each user's event_type
  // observation stream becomes versioned rows with closed
  // [valid_from, valid_to] µs intervals, a new version exactly at
  // value changes (Scd.scd2Build — the gaps-and-islands discipline,
  // no global window). String equality + integer time: every decision
  // exact.
  def q113(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      col("event_type"), expr("ts div 1000").as("tus"), col("event_id"))
    graft.operators.Scd.scd2Build(ev, "user_id", "event_type",
        "tus", "event_id")
      .orderBy("user_id", "version")
  }

  val q113Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
         FROM events),
       f AS (SELECT user_id, event_type, tus,
               CASE WHEN row_number() OVER w = 1
                      OR event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id
                                 ORDER BY tus, event_id)),
       g AS (SELECT user_id, event_type, tus,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS version
             FROM f),
       v AS (SELECT user_id, version, min(event_type) AS attr,
               min(tus) AS valid_from, count(*) AS n_obs
             FROM g GROUP BY 1, 2)
       SELECT user_id, version, attr, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) - 1
           AS valid_to,
         n_obs
       FROM v ORDER BY user_id, version"""

  // ---------------------------------------------------------------
  // q114 — sliding-window chunking (128-token chunks, stride 96):
  // every document explodes into its overlapping token windows in
  // closed form — one Generate inside the scan stage, NO shuffle
  // (plan-audited). head/tail token witnesses make the oracle catch
  // any slicing off-by-one.
  def q114(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.slidingChunks(t(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 128, strideTokens = 96)
      .orderBy("doc_id", "chunk_idx")

  val q114Sql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         FROM documents),
       c AS (SELECT doc_id, w, n,
               unnest(range(0, 1 + (greatest(n - 128, 0) + 95) // 96))
                 AS chunk_idx
             FROM d)
       SELECT doc_id, chunk_idx, chunk_idx * 96 AS start_tok,
         least(128, n - chunk_idx * 96) AS chunk_len,
         w[chunk_idx * 96 + 1] AS head_tok,
         w[chunk_idx * 96 + least(128, n - chunk_idx * 96)] AS tail_tok
       FROM c ORDER BY doc_id, chunk_idx"""

  // ---------------------------------------------------------------
  // q115 — cohort retention: users bucketed by first-activity day,
  // distinct active users per (cohort_day, age_days) cell — the
  // product-analytics staple. Two hash aggregates + one join, all
  // integer day arithmetic (µs div 86400000000, positive → div ≡ //).
  private val DayUs = 86400000000L

  def q115(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      expr(s"(ts div 1000) div ${DayUs}L").as("day"))
    val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "age_days")
  }

  val q115Sql: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // $DayUs AS day
         FROM events),
       c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
       SELECT c.cohort_day, e.day - c.cohort_day AS age_days,
         count(DISTINCT e.user_id) AS n_users
       FROM e JOIN c USING (user_id)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  // ---------------------------------------------------------------
  // q116 — grouped OLS trend fit: per user, the slope/intercept of
  // value against days-since-first-observation, from one aggregation
  // pass over exact integer sufficient statistics
  // (Regression.groupedOls — q98 playbook; the only doubles are the
  // two final pinned divisions, identical IEEE ops in both engines).
  def q116(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      expr(s"(ts div 1000) div ${DayUs}L").as("day"), col("value"))
    val d0 = ev.groupBy("user_id").agg(min(col("day")).as("d0"))
    val xy = ev.join(d0, Seq("user_id"))
      .select(col("user_id"), (col("day") - col("d0")).as("x"), col("value"))
    graft.operators.Regression.groupedOls(xy, "user_id", "x", "value")
      .withColumnRenamed("k", "user_id")
      .orderBy("user_id")
  }

  val q116Sql: String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // $DayUs AS day, value
         FROM events),
       m AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY 1),
       q AS (SELECT e.user_id, CAST(e.day - m.d0 AS HUGEINT) AS x,
               CAST(round_even(value * 1000000.0, 0) AS HUGEINT) AS y
             FROM e JOIN m USING (user_id)),
       a AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
             FROM q GROUP BY 1),
       b AS (SELECT *, n * sxx - sx * sx AS den FROM a
             WHERE n * sxx - sx * sx != 0)
       SELECT user_id, CAST(n AS BIGINT) AS n,
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(den AS DOUBLE)
           / 1000000.0 AS slope,
         (CAST(sy AS DOUBLE) / 1000000.0
           - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(den AS DOUBLE)
              / 1000000.0) * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept
       FROM b ORDER BY user_id"""

  // ---------------------------------------------------------------
  // q117 — integer-exact z-score outliers: events more than 2
  // population standard deviations from their user's mean, decided by
  // the cross-multiplied predicate (n·x − S)² > k²·(n·Σx² − S²) —
  // no division, no sqrt, every side an exact 128-bit integer, so the
  // flag is bit-identical cross-engine with NO margin gate.
  def q117(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
      col("value"))
    graft.operators.Regression.zScoreOutliers(ev, "user_id", "value", k = 2)
      .select(col("user_id"), col("event_id"), col("value"), col("group_n"))
      .orderBy("user_id", "event_id")
  }

  val q117Sql: String =
    """WITH q AS (SELECT user_id, event_id, value,
           CAST(round_even(value * 1000000.0, 0) AS HUGEINT) AS qv
         FROM events),
       st AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
                sum(qv) AS s, sum(qv * qv) AS ss
              FROM q GROUP BY 1)
       SELECT q.user_id, q.event_id, q.value, CAST(st.n AS BIGINT) AS group_n
       FROM q JOIN st USING (user_id)
       WHERE (st.n * q.qv - st.s) * (st.n * q.qv - st.s)
             > 4 * (st.n * st.ss - st.s * st.s)
       ORDER BY q.user_id, q.event_id"""

  // ---------------------------------------------------------------
  // q118 — time-weighted average (LOCF): per user, Σ vᵢ·Δtᵢ over the
  // observed span — the de-biased mean for irregular series
  // (Resample.timeWeightedAvg). Areas are exact DECIMAL(38,0)
  // integers after the one-time quantization; the two final divisions
  // are pinned in the same order in both engines. SECOND-granularity
  // time axis: max qv·span = 5.6e8·2.6e6 < 2⁵³ keeps the area's
  // decimal→double cast bit-exact everywhere (the µs axis provably
  // does not — observed 1-ulp HUGEINT→DOUBLE drift in DuckDB).
  def q118(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      expr("ts div 1000000000").as("tsec"), col("event_id"), col("value"))
    graft.operators.Resample
      .timeWeightedAvg(ev, "user_id", "tsec", "value", "event_id")
      .orderBy("user_id")
  }

  val q118Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS tsec, event_id,
           CAST(round_even(value * 1000000.0, 0) AS HUGEINT) AS qv
         FROM events),
       w AS (SELECT user_id, tsec, qv,
               lead(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id)
                 - tsec AS dt
             FROM e),
       a AS (SELECT user_id, count(*) AS n_obs,
               sum(CASE WHEN dt IS NOT NULL
                        THEN qv * CAST(dt AS HUGEINT) END) AS area,
               max(tsec) - min(tsec) AS span
             FROM w GROUP BY 1)
       SELECT user_id, n_obs, span,
         CAST(area AS DOUBLE) / CAST(span AS DOUBLE) / 1000000.0 AS twa
       FROM a WHERE span > 0 ORDER BY user_id"""

  // ---------------------------------------------------------------
  // q119 — per-source Gini concentration of document token counts
  // (how unequally a source's token mass spreads across its docs):
  // the sorted-rank formulation with integer numerator/denominator
  // and ONE final division (Stats.giniIndex) — no margin gate needed.
  def q119(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("toks"))
    graft.operators.Stats.giniIndex(d, "source", "toks", "doc_id")
      .orderBy("source")
  }

  val q119Sql: String =
    """WITH d AS (SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS HUGEINT) AS x
         FROM documents),
       r AS (SELECT source, x,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY x, doc_id) AS HUGEINT) AS i
             FROM d),
       a AS (SELECT source, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(i * x) AS six
             FROM r GROUP BY 1)
       SELECT source, CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS total,
         CAST(2 * six - (n + 1) * sx AS DOUBLE)
           / CAST(n * sx AS DOUBLE) AS gini
       FROM a WHERE sx > 0 ORDER BY source"""

  // ---------------------------------------------------------------
  // q120 — point-in-time probe of the q113 dimension: each event,
  // shifted one hour forward, picks up the user's event_type version
  // active at that instant (Scd.pointInTime — at most one match by
  // interval tiling; probes past nothing drop, probes past the end
  // hit the open-ended live version). Integer µs; exercises build +
  // consume as one pipeline.
  def q120(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      col("event_type"), expr("ts div 1000").as("tus"), col("event_id"))
    val versions = graft.operators.Scd.scd2Build(ev, "user_id",
      "event_type", "tus", "event_id")
    val probes = ev.select(col("user_id"), col("event_id"),
      (col("tus") + lit(3600000000L)).as("probe_t"))
    graft.operators.Scd.pointInTime(versions, probes, "user_id", "probe_t")
      .select(col("user_id"), col("event_id"), col("probe_t"),
        col("version"), col("attr"), col("n_obs"))
      .orderBy("user_id", "event_id")
  }

  val q120Sql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
         FROM events),
       f AS (SELECT user_id, event_type, tus,
               CASE WHEN row_number() OVER w = 1
                      OR event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS brk
             FROM e WINDOW w AS (PARTITION BY user_id
                                 ORDER BY tus, event_id)),
       g AS (SELECT user_id, event_type, tus,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS version
             FROM f),
       v AS (SELECT user_id, version, min(event_type) AS attr,
               min(tus) AS valid_from, count(*) AS n_obs
             FROM g GROUP BY 1, 2),
       vv AS (SELECT user_id, version, attr, valid_from, n_obs,
                lead(valid_from) OVER (PARTITION BY user_id
                  ORDER BY version) - 1 AS valid_to
              FROM v),
       p AS (SELECT user_id, event_id, tus + 3600000000 AS probe_t FROM e)
       SELECT p.user_id, p.event_id, p.probe_t,
         vv.version, vv.attr, vv.n_obs
       FROM p JOIN vv ON p.user_id = vv.user_id
         AND p.probe_t >= vv.valid_from
         AND (vv.valid_to IS NULL OR p.probe_t <= vv.valid_to)
       ORDER BY p.user_id, p.event_id"""

  // ---------------------------------------------------------------
  // q121 — PERSONALIZED PageRank (random walk with restart) from
  // customer seeds {0, 7, 42} over the symmetrized customer↔supplier
  // graph: proximity scores, not global centrality — the
  // recommendation-expansion primitive. Same integer-superstep
  // exactness as q101 (teleport mass restricted to the seeds).
  def q121(s: SparkSession, dir: String): DataFrame = {
    // NO query-side distinct: personalizedPageRankInt canonicalizes
    // (distincts) its edge input anyway — a distinct here would pay
    // the 2.3M-row shuffle twice for nothing. Eager checkpoint BEFORE
    // symmetrizing: both union orientations read the one materialized
    // join instead of each replaying the orders⋈lineitem shuffle
    val e0 = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000000L)).as("dst"))
      .localCheckpoint(eager = true)
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.personalizedPageRankInt(sym, "src", "dst",
        sources = Seq(0L, 7L, 42L), iters = 3)
      .where(col("r") > 0)
      .orderBy("node")
  }

  val q121Sql: String = {
    val init = "(1000000000000 // 3)"
    val base = s"((15 * $init) // 100)"
    def step(t: Int) = s"""
       c$t AS (SELECT e.dst AS node, sum(r${t - 1}.r // d.deg) AS s
               FROM e JOIN r${t - 1} ON e.src = r${t - 1}.node
                 JOIN deg d ON d.src = e.src
               WHERE r${t - 1}.r > 0
               GROUP BY 1),
       r$t AS (SELECT nodes.node,
                 CASE WHEN nodes.node IN (0, 7, 42) THEN $base ELSE 0 END
                   + (85 * COALESCE(c$t.s, 0)) // 100 AS r
               FROM nodes
               LEFT JOIN c$t ON c$t.node = nodes.node)"""
    s"""WITH e0 AS (SELECT DISTINCT o_custkey AS src,
           l_suppkey + 1000000000 AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT src, dst FROM e0
             UNION ALL SELECT dst, src FROM e0),
       deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       nodes AS (SELECT DISTINCT src AS node FROM e
                 UNION SELECT unnest([0, 7, 42])),
       r0 AS (SELECT node,
                CASE WHEN node IN (0, 7, 42) THEN $init ELSE 0 END AS r
              FROM nodes),
       ${step(1)}, ${step(2)}, ${step(3)}
       SELECT r3.node, CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
         CAST(r3.r AS BIGINT) AS r
       FROM r3 LEFT JOIN deg d ON d.src = r3.node
       WHERE r3.r > 0
       ORDER BY r3.node"""
  }

  // ---------------------------------------------------------------
  // q122 — distributed PCA leading component, exact integer power
  // iteration (Pca.powerProjection): one aggregation pass builds the
  // 64² scatter matrix, the KB-sized matrix power-iterates on the
  // driver in BigInt with sign-split renormalization (truncation ≡
  // floor on both engines), and every vector's projection broadcasts
  // back as a literal dot product. Deterministic by definition — the
  // contract is "4 power steps from e₁ under this arithmetic".
  def q122(s: SparkSession, dir: String): DataFrame =
    graft.operators.Pca
      .powerProjection(t(s, dir, "embeddings"), "vec_id", "embedding",
        iters = 4)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")

  val q122Sql: String = {
    def step(t: Int) = s"""
       w$t AS (SELECT c.i, sum(c.c * v${t - 1}.v) AS w
               FROM c JOIN v${t - 1} ON v${t - 1}.i = c.j GROUP BY 1),
       m$t AS (SELECT max(abs(w)) AS m FROM w$t),
       v$t AS (SELECT i, CAST(CASE WHEN w < 0
                   THEN -((-w * 1000000) // m)
                   ELSE (w * 1000000) // m END AS HUGEINT) AS v
               FROM w$t CROSS JOIN m$t)"""
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
           e -> CAST(round_even(CAST(e AS DOUBLE) * 1000000.0, 0)
                     AS HUGEINT)) AS qv
         FROM embeddings),
       u AS (SELECT vec_id, generate_subscripts(qv, 1) AS i,
               unnest(qv) AS x FROM q),
       si AS (SELECT i, sum(x) AS s FROM u GROUP BY 1),
       sij AS (SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS s
               FROM u a JOIN u b USING (vec_id) GROUP BY 1, 2),
       nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM q),
       c AS (SELECT sij.i, sij.j, nn.n * sij.s - sa.s * sb.s AS c
             FROM sij CROSS JOIN nn
               JOIN si sa ON sa.i = sij.i
               JOIN si sb ON sb.i = sij.j),
       v0 AS (SELECT i, CAST(CASE WHEN i = 1 THEN 1000000 ELSE 0 END
                  AS HUGEINT) AS v
              FROM range(1, 65) t(i)),
       ${step(1)}, ${step(2)}, ${step(3)}, ${step(4)}
       SELECT u.vec_id, CAST(sum(u.x * v4.v) AS BIGINT) AS score
       FROM u JOIN v4 USING (i)
       GROUP BY 1 ORDER BY u.vec_id"""
  }

  // ---------------------------------------------------------------
  // q123 — STREAMING watermarked deduplication: the events table with
  // every third row duplicated streams through forced multi-file
  // micro-batches; dropDuplicatesWithinWatermark keys bounded state
  // by event_id and the survivors land exactly-once (q59 discipline).
  // The watermark delay (720 h) covers the fixture's full span, so no
  // row is ever late-dropped and the streamed result must equal the
  // batch DISTINCT — the oracle is the original table itself.
  def q123(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q123").toString
    // duplicated-events landing staged once per JVM (input staging,
    // untimed — StagedInputs); fresh checkpoint/out per run
    val landing = StagedInputs.dir("q123", dir) { d =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        expr("timestamp_micros(ts div 1000)").as("tstamp"), col("value"))
      ev.union(ev.where(col("event_id") % 3 === 0)) // inject duplicates
        .repartition(4)
        .write.parquet(s"$d/landing")
    } + "/landing"
    graft.streaming.StreamingIngest.runDedupStream(
      s, landing, Seq("event_id"), "tstamp",
      watermark = "720 hours", s"$base/out", s"$base/ckpt",
      maxFilesPerTrigger = Some(2))
    val out = s.read.parquet(s"$base/out")
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(tstamp)").as("tus"), col("value"))
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("event_id")
  }

  val q123Sql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS tus, value
       FROM events ORDER BY event_id"""

  // ---------------------------------------------------------------
  // q124 — corpus overlap matrix: shared distinct shingles between
  // every source pair + both corpus sizes (Dedup.sourceOverlap) — the
  // curator's "which crawls duplicate each other" audit, with the
  // SAME shingle definition as the whole similarity family. Integer
  // outputs; Jaccard derives as a rational downstream.
  def q124(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup
      .sourceOverlap(t(s, dir, "documents"), "source", "text")
      .orderBy("grp_a", "grp_b")

  val q124Sql: String =
    """WITH w AS (SELECT source, string_split(text, ' ') AS w
         FROM documents),
       sh AS (SELECT DISTINCT source,
                unnest([array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w) - 1)]) AS s
              FROM w),
       p AS (SELECT a.source AS grp_a, b.source AS grp_b,
               count(*) AS inter
             FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
             GROUP BY 1, 2),
       sz AS (SELECT source, count(*) AS n FROM sh GROUP BY 1)
       SELECT grp_a, grp_b, inter, za.n AS n_a, zb.n AS n_b
       FROM p JOIN sz za ON za.source = p.grp_a
         JOIN sz zb ON zb.source = p.grp_b
       ORDER BY grp_a, grp_b"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_triangles" -> (q106 _),
    "q107_bfs_hops" -> (q107 _),
    "q108_interval_merge" -> (q108 _),
    "q109_skyline" -> (q109 _),
    "q110_weighted_sample" -> (q110 _),
    "q111_phrase_search" -> (q111 _),
    "q112_streaming_heavy" -> (q112 _),
    "q113_scd2" -> (q113 _),
    "q114_chunking" -> (q114 _),
    "q115_retention" -> (q115 _),
    "q116_grouped_ols" -> (q116 _),
    "q117_zscore_outliers" -> (q117 _),
    "q118_time_weighted_avg" -> (q118 _),
    "q119_gini" -> (q119 _),
    "q120_scd2_probe" -> (q120 _),
    "q121_personalized_pagerank" -> (q121 _),
    "q122_pca_projection" -> (q122 _),
    "q123_streaming_dedup" -> (q123 _),
    "q124_corpus_overlap" -> (q124 _),
  )

  val oracles: Map[String, String] = Map(
    "q106_triangles" -> q106Sql,
    "q107_bfs_hops" -> q107Sql,
    "q108_interval_merge" -> q108Sql,
    "q109_skyline" -> q109Sql,
    "q110_weighted_sample" -> q110Sql,
    "q111_phrase_search" -> q111Sql,
    "q112_streaming_heavy" -> q112Sql,
    "q113_scd2" -> q113Sql,
    "q114_chunking" -> q114Sql,
    "q115_retention" -> q115Sql,
    "q116_grouped_ols" -> q116Sql,
    "q117_zscore_outliers" -> q117Sql,
    "q118_time_weighted_avg" -> q118Sql,
    "q119_gini" -> q119Sql,
    "q120_scd2_probe" -> q120Sql,
    "q121_personalized_pagerank" -> q121Sql,
    "q122_pca_projection" -> q122Sql,
    "q123_streaming_dedup" -> q123Sql,
    "q124_corpus_overlap" -> q124Sql,
  )
}
