package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Audit, Funnel, LangModel, Resample, Sampling, Upsert, ZOrder}

/** Round-7 extension queries: warehouse/analytics operators (funnel,
  * gap-fill resample, z-order layout, CDC merge) and the DSIR-style
  * domain-relevance scorer. Same contract as [[ExtQueries]]: every
  * query ends in ORDER BY over a unique key prefix, column names
  * match the oracle SQL exactly, doubles are produced by pinned-order
  * IEEE expressions only.
  */
object ExtQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q73 — ordered funnel (view → click → purchase): per user, the
  // earliest completion time of each funnel prefix (strictly-after
  // semantics) and the depth reached. µs time axis (q17 convention).
  def q73(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(
      col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    Funnel.funnel(ev, "user_id", "event_type", "tus",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
  }

  val q73Sql: String =
    """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
       s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
              GROUP BY 1),
       s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
              GROUP BY 1)
       SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
         CAST(1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
                + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT)
           AS depth
       FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
       ORDER BY s1.user_id"""

  // ---------------------------------------------------------------
  // q74 — gap-fill resample: each user's irregular `value` series
  // interpolated onto a regular 6-hour grid (interior instants only).
  // The doubles are bit-exact cross-engine: identical op order, one
  // division.
  private val StepUs = 21600000000L // 6 h in µs

  def q74(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(
      col("user_id"), expr("ts div 1000").as("tus"), col("value"))
    Resample.gridInterpolate(ev, "user_id", "tus", "value", StepUs)
      .orderBy("user_id", "grid_ts")
  }

  val q74Sql: String =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t, min(value) AS v
                    FROM events GROUP BY 1, 2),
       b AS (SELECT user_id, min(t) AS lo, max(t) AS hi FROM ev GROUP BY 1),
       grid AS (SELECT user_id, s * $StepUs AS t,
                  CAST(NULL AS DOUBLE) AS v, 1 AS isg
                FROM (SELECT user_id,
                        unnest([x for x in range((lo + ${StepUs - 1}) // $StepUs,
                                                 hi // $StepUs + 1)]) AS s
                      FROM b)),
       strm AS (SELECT user_id, t, v, 0 AS isg FROM ev
                UNION ALL SELECT user_id, t, v, isg FROM grid),
       w AS (SELECT user_id, t, isg,
               last_value(v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, isg
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, isg
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, isg
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY t, isg
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
             FROM strm)
       SELECT user_id, t AS grid_ts,
         CASE WHEN t = pt THEN pv
              ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
                                     / CAST(nt - pt AS DOUBLE)) END
           AS v_interp
       FROM w WHERE isg = 1 ORDER BY user_id, grid_ts"""

  // ---------------------------------------------------------------
  // q75 — z-order (Morton) layout key: interleave user_id with the
  // integer part of value (10 bits each) into the clustering key a
  // two-dimensional-pruning writer sorts by, plus the depth-6
  // quadtree bucket it range-partitions on.
  def q75(s: SparkSession, dir: String): DataFrame =
    ZOrder.withZOrder(t(s, dir, "events"),
        col("user_id"), floor(col("value")).cast("long"),
        bits = 10, bucketBits = 6)
      .select(col("event_id"), col("zcode"), col("zbucket"))
      .orderBy("event_id")

  val q75Sql: String = {
    val terms = (0 until 10).map(i =>
      s"(((ua >> $i) & 1) << ${2 * i}) | (((ub >> $i) & 1) << ${2 * i + 1})")
    s"""SELECT event_id, (${terms.mkString(" | ")}) AS zcode,
         (${terms.mkString(" | ")}) >> 14 AS zbucket
       FROM (SELECT event_id, user_id & 1023 AS ua,
               CAST(floor(value) AS BIGINT) & 1023 AS ub FROM events)
       ORDER BY event_id"""
  }

  // ---------------------------------------------------------------
  // q76 — DSIR-style domain relevance: sources src0-src2 as the
  // target split, everything else raw; per-doc target-leaning token
  // evidence + the 1/4 pass gate. Integer-exact decisions (HUGEINT /
  // decimal(38,0) cross-multiplications), single division.
  def q76(s: SparkSession, dir: String): DataFrame =
    LangModel.domainRelevance(t(s, dir, "documents"), "doc_id", "text",
        isTarget = col("source").isin("src0", "src1", "src2"),
        passFactor = 4L)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val q76Sql: String =
    """WITH toks AS (SELECT doc_id,
           (source IN ('src0','src1','src2')) AS tgt,
           unnest(string_split(text, ' ')) AS w FROM documents),
       stats AS (SELECT w,
           sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
           sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
         FROM toks GROUP BY 1),
       tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr, count(*) AS v FROM stats),
       pdw AS (SELECT doc_id, w, count(*) AS m FROM toks GROUP BY 1, 2),
       l AS (SELECT p.doc_id,
               sum(p.m) AS n_tokens,
               sum(CASE WHEN CAST(s.ct + 1 AS HUGEINT)
                           * CAST(t.nr + t.v AS HUGEINT)
                         > CAST(s.cr + 1 AS HUGEINT)
                           * CAST(t.nt + t.v AS HUGEINT)
                    THEN p.m ELSE 0 END) AS n_lean
             FROM pdw p JOIN stats s USING (w) CROSS JOIN tot t
             GROUP BY 1)
       SELECT doc_id,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(n_lean AS BIGINT) AS n_lean,
         CAST(n_lean AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS lean_frac,
         4 * n_lean >= n_tokens AS dsir_pass
       FROM l ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q77 — CDC merge: a deterministic change set derived from orders
  // (key%7=0 → price update, =1 → delete, =2 → insert at key+1e9)
  // applied with MERGE semantics; output is the merged table.
  def q77(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val changes = t(s, dir, "orders")
      .where(col("o_orderkey") % 7 < 3)
      .select(
        when(col("o_orderkey") % 7 === 2,
          col("o_orderkey") + lit(1000000000L))
          .otherwise(col("o_orderkey")).as("o_orderkey"),
        col("o_custkey"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1000.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        when(col("o_orderkey") % 7 === 0, lit("U"))
          .when(col("o_orderkey") % 7 === 1, lit("D"))
          .otherwise(lit("I")).as("op"))
    Upsert.merge(base, changes, Seq("o_orderkey"), "op")
      .orderBy("o_orderkey")
  }

  val q77Sql: String =
    """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
       ch AS (SELECT
           CASE WHEN o_orderkey % 7 = 2 THEN o_orderkey + 1000000000
                ELSE o_orderkey END AS k,
           o_custkey,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS p,
           CASE WHEN o_orderkey % 7 = 0 THEN 'U'
                WHEN o_orderkey % 7 = 1 THEN 'D'
                ELSE 'I' END AS op
         FROM orders WHERE o_orderkey % 7 < 3)
       SELECT * FROM (
         SELECT b.o_orderkey, b.o_custkey, b.o_totalprice
         FROM base b ANTI JOIN ch ON b.o_orderkey = ch.k
         UNION ALL
         SELECT k AS o_orderkey, o_custkey, p AS o_totalprice
         FROM ch WHERE op <> 'D')
       ORDER BY o_orderkey"""

  // ---------------------------------------------------------------
  // q78 — STREAMING sessionization via flatMapGroupsWithState
  // (custom state + event-time timeout): the events land as files,
  // a far-future sentinel row pushes the watermark past every real
  // session's close, and the state handler emits (user, start, n)
  // exactly once per session. Output ≡ batch session_window, so the
  // oracle IS q32's gaps-and-islands SQL.
  /** `Files.list` under try/finally — the stream holds a directory fd
    * until closed (leaks accumulate across Bench/determinism runs in
    * one JVM). */
  private[graft] def listDir(dir: java.nio.file.Path): List[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(dir)
    try st.iterator().asScala.toList finally st.close()
  }

  def q78(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q78").toString
    // landing (events + mtime-ordered sentinel) staged once per JVM —
    // input staging, untimed (StagedInputs); the mtimes that order
    // the sentinel batch persist with the staged files
    val landing = java.nio.file.Paths.get(
      StagedInputs.dir("q78", dir) { d =>
        val ld = java.nio.file.Paths.get(s"$d/landing")
        t(s, dir, "events")
          .select(col("user_id").as("k"), expr("ts div 1000").as("tus"))
          .repartition(1).write.parquet(ld.toString)
        val firstBatch = listDir(ld).map(_.getFileName.toString).toSet
        // Sentinel (year 2100, filtered key −1): lands as its OWN
        // micro-batch (maxFilesPerTrigger=1 + a later mtime), so the
        // watermark advances past all real sessions and the no-data
        // batch that follows fires every timeout before AvailableNow
        // terminates.
        s.range(1).select(lit(-1L).as("k"), lit(4102444800000000L).as("tus"))
          .write.mode("append").parquet(ld.toString)
        val files = listDir(ld)
        val maxMs = files.filter(f => firstBatch(f.getFileName.toString))
          .map(java.nio.file.Files.getLastModifiedTime(_).toMillis).max
        files.filterNot(f => firstBatch(f.getFileName.toString)).foreach { f =>
          java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime.fromMillis(maxMs + 60000L))
        }
      } + "/landing")
    // 8 state-store partitions, not the session's 32: the stateful
    // overhead is per-partition-per-batch (store commit + snapshot),
    // and 150-1500 session keys don't need 32-way state parallelism.
    // Output is unaffected (ordered collect downstream).
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "8")
      graft.streaming.Sessionize.runSessionize(s, landing.toString,
        s"$base/out", s"$base/ckpt", gapUs = 1800000000L,
        maxFilesPerTrigger = Some(1))
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val out = s.read.parquet(s"$base/out")
      .where(col("user_id") >= 0)
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("user_id", "session_start")
  }

  // ---------------------------------------------------------------
  // q79 — time-RANGE moving aggregate: per user, each event's count /
  // decimal-exact sum / mean of `value` over the trailing hour. RANGE
  // frame over a BIGINT µs axis (peers included identically in both
  // engines); sum rides decimal(30,8) (order-independent) and the
  // mean is the suite's single division.
  def q79(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tus"), col("value"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("vsum",
        sum(col("value").cast("decimal(30,8)")).over(w).cast("double"))
      .withColumn("mavg", col("vsum") / col("n_win").cast("double"))
      .select("event_id", "n_win", "vsum", "mavg")
      .orderBy("event_id")
  }

  val q79Sql: String =
    """SELECT event_id, n_win, vsum,
         vsum / CAST(n_win AS DOUBLE) AS mavg
       FROM (SELECT event_id,
               count(*) OVER w AS n_win,
               CAST(sum(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)
                 AS vsum
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING
                                AND CURRENT ROW))
       ORDER BY event_id"""

  // ---------------------------------------------------------------
  // q80 — data-quality audit (Deequ-style constraint verification):
  // completeness, distinctness, and rule-violation counts over
  // orders in one aggregation pass, unpivoted to (metric, value).
  def q80(s: SparkSession, dir: String): DataFrame =
    Audit.audit(t(s, dir, "orders"), Seq(
        Audit.rowCount,
        Audit.nullCount("o_custkey"),
        Audit.distinctCount("o_orderstatus"),
        Audit.distinctCount("o_custkey"),
        Audit.violations("nonpositive_price", col("o_totalprice") <= 0),
        Audit.violations("date_out_of_range",
          col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
            col("o_orderdate") >= lit("2026-01-01").cast("timestamp")),
        Audit.violations("bad_status",
          !col("o_orderstatus").isin("O", "F", "P"))))
      .orderBy("metric")

  val q80Sql: String =
    """SELECT metric, CAST(value AS BIGINT) AS value FROM (
         SELECT 'row_count' AS metric, count(*) AS value FROM orders
         UNION ALL SELECT 'null_count:o_custkey',
           count(*) - count(o_custkey) FROM orders
         UNION ALL SELECT 'distinct_count:o_orderstatus',
           count(DISTINCT o_orderstatus) FROM orders
         UNION ALL SELECT 'distinct_count:o_custkey',
           count(DISTINCT o_custkey) FROM orders
         UNION ALL SELECT 'violations:nonpositive_price',
           sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) FROM orders
         UNION ALL SELECT 'violations:date_out_of_range',
           sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                      OR o_orderdate >= TIMESTAMP '2026-01-01'
                    THEN 1 ELSE 0 END) FROM orders
         UNION ALL SELECT 'violations:bad_status',
           sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END) FROM orders)
       ORDER BY metric"""

  // ---------------------------------------------------------------
  // q81 — interchange-format round-trip (JSON Lines + CSV source/
  // sink): documents go out as JSONL (full fidelity, text included)
  // and as a CSV metadata extract, come back through the matching
  // readers, and re-join. The oracle reads the ORIGINAL parquet — any
  // escaping, schema, or type drift in either format family breaks
  // the hash. Text rides JSONL only (CSV is for flat metadata — the
  // conventional split in training-data pipelines).
  def q81(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q81").toString
    val docs = t(s, dir, "documents")
    docs.select("doc_id", "text", "lang").repartition(4)
      .write.json(s"$base/jsonl")
    docs.select("doc_id", "source", "n_chars").repartition(4)
      .write.option("header", "true").csv(s"$base/csv")
    val j = s.read
      .schema("doc_id BIGINT, text STRING, lang STRING")
      .json(s"$base/jsonl")
    val c = s.read.option("header", "true")
      .schema("doc_id BIGINT, source STRING, n_chars BIGINT")
      .csv(s"$base/csv")
    val out = j.join(c, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        length(col("text")).cast("long").as("text_len"))
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("doc_id")
  }

  val q81Sql: String =
    """SELECT doc_id, lang, source, n_chars,
         CAST(length(text) AS BIGINT) AS text_len
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q82 — pivot (wide conditional aggregation): events per user ×
  // event type. The value list is EXPLICIT, so the output schema is
  // static — the 100-TB-safe way to pivot (a discovery pass over the
  // key domain is a separate job, not an implicit one).
  def q82(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  val q82Sql: String =
    """SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
       FROM events GROUP BY user_id ORDER BY user_id"""

  // ---------------------------------------------------------------
  // q83 — proportional mixture interleaving: q72's geometric strata
  // with weights 1/2/4/8 (rare strata up-weighted), emitted as the
  // deterministic interleaved TRAINING ORDER. sched_key is the exact
  // integer rational rank rn/w (rn · lcm/w), so the schedule is
  // engine-exact; the ordering is a total sort, not a global window.
  def q83(s: SparkSession, dir: String): DataFrame = {
    val strat = t(s, dir, "documents").withColumn("stratum",
      when(col("doc_id") % 2 === 1, "g0")
        .when(col("doc_id") % 4 === 2, "g1")
        .when(col("doc_id") % 8 === 4, "g2")
        .otherwise("g3"))
    Sampling.mixtureSchedule(strat, "doc_id", "stratum",
        weights = Map("g0" -> 1L, "g1" -> 2L, "g2" -> 4L, "g3" -> 8L),
        seed = 7L)
      .select(col("sched_key"), col("stratum"), col("doc_id"))
      .orderBy("sched_key", "stratum", "doc_id")
  }

  val q83Sql: String =
    """WITH strat AS (
         SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN 'g0'
                WHEN doc_id % 4 = 2 THEN 'g1'
                WHEN doc_id % 8 = 4 THEN 'g2'
                ELSE 'g3' END AS stratum
         FROM documents),
       r AS (SELECT doc_id, stratum,
               row_number() OVER (PARTITION BY stratum ORDER BY u, doc_id)
                 AS rn
             FROM (SELECT doc_id, stratum,
                     (CAST(doc_id + 7 AS HUGEINT) * 11400714819323198485)
                       % 18446744073709551616 AS u
                   FROM strat))
       SELECT CAST(rn * (CASE stratum WHEN 'g0' THEN 8 WHEN 'g1' THEN 4
                         WHEN 'g2' THEN 2 ELSE 1 END) AS BIGINT)
                AS sched_key,
         stratum, doc_id
       FROM r ORDER BY sched_key, stratum, doc_id"""

  // ---------------------------------------------------------------
  // q84 — nearest-seed partition assignment (the assign half of
  // Lloyd, deterministic medoid seeding): every embedding goes to its
  // closest of the 8 lowest-id vectors; integer-only output
  // (cluster = seed id + cluster size). The oracle rebuilds the seeds
  // relationally and replays the squared-L2 argmin with (dist, sid)
  // tie order; a SimilaritySpec margin gate proves the argmin is
  // insensitive to sub-ulp cross-engine distance differences.
  def q84(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity
      .seedAssign(t(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")

  val q84Sql: String =
    """WITH seeds AS (SELECT vec_id AS sid, embedding AS semb
                      FROM embeddings ORDER BY vec_id LIMIT 8),
       d AS (SELECT e.vec_id, s.sid,
               list_sum(list_transform(range(1, 65),
                 i -> (CAST(e.embedding[i] AS DOUBLE)
                        - CAST(s.semb[i] AS DOUBLE))
                    * (CAST(e.embedding[i] AS DOUBLE)
                        - CAST(s.semb[i] AS DOUBLE)))) AS dist
             FROM embeddings e CROSS JOIN seeds s),
       a AS (SELECT vec_id, sid AS cluster,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, sid)
                 AS rn
             FROM d)
       SELECT vec_id, cluster,
         CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_n
       FROM a WHERE rn = 1 ORDER BY vec_id"""

  // ---------------------------------------------------------------
  // q85 — GROUPING SETS with an arbitrary (non-rollup) set list plus
  // grouping_id: (status, priority), (priority), () — the shape
  // rollup/cube can't express (q15/q19 cover those). NULL group keys
  // coalesce to 'ALL' (suite convention); gid disambiguates.
  def q85(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("gid"), col("n"))
      .orderBy("gid", "st", "pri")

  val q85Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS st,
         coalesce(o_orderpriority, 'ALL') AS pri,
         CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         count(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderpriority), ())
       ORDER BY gid, st, pri"""

  // ---------------------------------------------------------------
  // q86 — ranking-window zoo: ntile, percent_rank, cume_dist, and a
  // running first_value per status, ordered by (price, key) so every
  // rank is tie-free and the rational rank doubles ((r−1)/(n−1),
  // r/n) are the same single divisions in both engines.
  def q86(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        ntile(8).over(w).as("tile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        first(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cheapest"))
      .orderBy("o_orderkey")
  }

  val q86Sql: String =
    """SELECT o_orderkey,
         CAST(ntile(8) OVER w AS INT) AS tile,
         percent_rank() OVER w AS prank,
         cume_dist() OVER w AS cdist,
         first_value(o_orderkey) OVER
           (PARTITION BY o_orderstatus
            ORDER BY o_totalprice, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cheapest
       FROM orders
       WINDOW w AS (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey"""

  // ---------------------------------------------------------------
  // q87 — edit-distance verification stage: the q22 Jaccard
  // candidates re-scored with exact Levenshtein distance and a
  // 25%-edit near-exact gate — the classic two-stage fuzzy-dedup
  // shape (cheap set-similarity candidates → exact string verify on
  // the tiny survivor set, never corpus × corpus).
  def q87(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.Dedup.jaccardJoin(docs, "doc_id", "text", 0.5)
      .join(docs.select(col("doc_id").as("a"), col("text").as("ta")), Seq("a"))
      .join(docs.select(col("doc_id").as("b"), col("text").as("tb")), Seq("b"))
      .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
      .select(col("a"), col("b"), col("lev"),
        (lit(4L) * col("lev") <=
          greatest(length(col("ta")), length(col("tb"))).cast("long"))
          .as("near_exact"))
      .orderBy("a", "b")
  }

  val q87Sql: String = ExtQueries.shingleCte +
    """,
       p AS (SELECT a.doc_id AS a, b.doc_id AS b
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
                   >= 0.5*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))
               AND (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) > 0)
       SELECT p.a, p.b,
         CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
         4 * levenshtein(da.text, db.text)
           <= greatest(length(da.text), length(db.text)) AS near_exact
       FROM p JOIN documents da ON p.a = da.doc_id
              JOIN documents db ON p.b = db.doc_id
       ORDER BY a, b"""

  // ---------------------------------------------------------------
  // q88 — STREAM-STREAM interval join: views and purchases land as
  // two live file streams; purchases within an hour of a same-user
  // view pair up through two-sided join state. Watermark delay (30
  // days) exceeds the data span, so nothing is evicted early and the
  // streamed pair set ≡ the batch interval join the oracle runs.
  def q88(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q88").toString
    // the two stream landings staged once per JVM (input staging,
    // untimed — StagedInputs); fresh checkpoint/out per run
    val staged = StagedInputs.dir("q88", dir) { d =>
      val ev = t(s, dir, "events")
      ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("aid"),
          expr("ts div 1000").as("atus"))
        .repartition(2).write.parquet(s"$d/views")
      ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("bid"),
          expr("ts div 1000").as("btus"))
        .repartition(2).write.parquet(s"$d/purchases")
    }
    // 8 join-state partitions (see q78): two-sided state commits per
    // partition per batch dominate at this key cardinality.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.shuffle.partitions", "8")
      graft.streaming.StreamJoin.runIntervalJoin(s, s"$staged/views",
        s"$staged/purchases", s"$base/out", s"$base/ckpt",
        maxGapUs = 3600000000L)
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val out = s.read.parquet(s"$base/out")
      .groupBy("user_id").agg(count(lit(1)).as("pairs"))
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("user_id")
  }

  val q88Sql: String =
    """SELECT a.user_id, count(*) AS pairs
       FROM events a JOIN events b
       ON a.user_id = b.user_id
          AND a.event_type = 'view' AND b.event_type = 'purchase'
          AND epoch_us(b.ts) > epoch_us(a.ts)
          AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
       GROUP BY a.user_id ORDER BY a.user_id"""

  // ---------------------------------------------------------------
  // q89 — MMR diverse re-rank (Carbonell & Goldstein 1998): top-20
  // cosine pool for query vec 0, then 5 greedy picks by
  // 0.7·rel − 0.3·max-sim-to-selected. Integer-only output (the
  // selection order); the oracle unrolls the greedy step by step
  // with correlated max-sim subqueries. mu = 0.3 is an explicit
  // literal in BOTH engines (1 − 0.7 ≠ 0.3 in IEEE). A margin spec
  // proves every greedy decision has >1e-9 relative separation.
  def q89(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity.mmrSelect(t(s, dir, "embeddings"),
        "vec_id", "embedding", queryId = 0L, k = 5, poolSize = 20,
        lambda = 0.7, mu = 0.3)
      .orderBy("rank")

  val q89Sql: String = {
    val steps = (2 to 5).map { n =>
      s""",
       sel$n AS (SELECT id, v, rel, $n AS rank FROM (
           SELECT p.id, p.v, p.rel,
             0.7*p.rel - 0.3*(SELECT max(list_cosine_similarity(p.v, a.v))
                              FROM all${n - 1} a) AS score
           FROM pool p ANTI JOIN all${n - 1} USING (id))
         ORDER BY score DESC, id LIMIT 1),
       all$n AS (SELECT id, v, rel, rank FROM all${n - 1}
                 UNION ALL SELECT id, v, rel, rank FROM sel$n)"""
    }.mkString
    s"""WITH pool AS (
         SELECT e.vec_id AS id,
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v,
           list_cosine_similarity(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.v) AS rel
         FROM embeddings e,
           (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings WHERE vec_id = 0) q
         WHERE e.vec_id <> 0
         ORDER BY rel DESC, id LIMIT 20),
       sel1 AS (SELECT id, v, rel, 1 AS rank FROM pool
                ORDER BY rel DESC, id LIMIT 1),
       all1 AS (SELECT id, v, rel, rank FROM sel1)$steps
       SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id
       FROM all5 ORDER BY rank"""
  }

  // ---------------------------------------------------------------
  // q90 — small-file compaction: lineitem fragmented into 64 shards,
  // compacted back to size-targeted files by rewrite-and-swap. The
  // oracle reads the ORIGINAL table — compaction must preserve every
  // row bit-for-bit; a spec asserts the file count actually shrank.
  def q90(s: SparkSession, dir: String): DataFrame = {
    // the 64-shard fragmented table is INPUT STAGING (the operator
    // under test is the compaction rewrite) — staged once per JVM,
    // read-only thereafter; see StagedInputs
    val frag = StagedInputs.dir("q90", dir) { d =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .repartition(64).write.parquet(s"$d/frag")
    } + "/frag"
    val base = java.nio.file.Files.createTempDirectory("graft_q90").toString
    graft.operators.Maintenance.compactFiles(s, frag,
      s"$base/compact", targetFileBytes = 16L * 1024 * 1024)
    val out = s.read.parquet(s"$base/compact")
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic
    // lineitem — order by every column; remaining ties are identical
    // rows, so the value hash is order-insensitive to them
    out.orderBy("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice")
  }

  val q90Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""

  // ---------------------------------------------------------------
  // q91 — incremental aggregate maintenance: revenue-per-customer
  // kept as a maintained aggregate; a 10% delta batch merges in via
  // the associative combine instead of a base-table rescan. The
  // oracle aggregates the full table in one pass — any combine error
  // (double-count, dropped group, non-associative sum) fails the
  // hash. Decimal sums keep the combine order-independent.
  def q91(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def agg(df: DataFrame): DataFrame =
      df.groupBy("o_custkey").agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(30,8)")).as("rev"))
    val maintained = agg(o.where(col("o_orderkey") % 10 =!= 0))
    val delta = agg(o.where(col("o_orderkey") % 10 === 0))
    graft.operators.Maintenance
      .combineAggregates(maintained, delta, Seq("o_custkey"), Seq("rev"))
      .select(col("o_custkey"), col("n"),
        col("rev").cast("double").as("revenue"))
      .orderBy("o_custkey")
  }

  val q91Sql: String =
    """SELECT o_custkey, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS revenue
       FROM orders GROUP BY o_custkey ORDER BY o_custkey"""

  // ---------------------------------------------------------------
  // q92 — SLIDING (overlapping) windows: 2-hour windows advancing
  // hourly, per event type — each event lands in exactly two windows
  // (q32 covers session windows; this is the hopping variant of
  // SURVEY §2.B). The oracle expands each event into its two window
  // starts with a list comprehension and re-aggregates.
  def q92(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("event_type"),
        window(col("tsm"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,8)")).cast("double").as("vsum"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("win_start"),
        col("n"), col("vsum"))
      .orderBy("event_type", "win_start")

  val q92Sql: String =
    """WITH expanded AS (
         SELECT event_type, value,
           unnest([(epoch_us(ts) // 3600000000) * 3600000000,
                   (epoch_us(ts) // 3600000000) * 3600000000 - 3600000000])
             AS win_start
         FROM events)
       SELECT event_type, win_start, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS vsum
       FROM expanded GROUP BY 1, 2 ORDER BY event_type, win_start"""

  // ---------------------------------------------------------------
  // q93 — REAL MP3 frame-header metadata: CBR MPEG-1 Layer III
  // streams (valid headers, closed-form parameters in id) walked
  // frame by frame; duration derives as frames·1152·1000 div rate —
  // one integer division. The oracle replays the public header
  // tables in SQL.
  def q93(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3Fixture(s, 40)
    graft.operators.Multimodal.decodeMeta(fx, "id", "media")
      .select(col("id"), col("codec"),
        col("width").as("sample_rate"),
        col("height").as("bitrate_kbps"),
        col("nframes").as("n_frames"),
        expr("(CAST(nframes AS BIGINT) * 1152000L) div CAST(width AS BIGINT)")
          .as("dur_ms"),
        col("valid"))
      .orderBy("id")
  }

  val q93Sql: String =
    """WITH base AS (SELECT r, 1 + r % 14 AS bi, r % 3 AS si,
                       10 + r % 30 AS nf
                     FROM range(0, 40) t(r)),
       p AS (SELECT r,
               CASE si WHEN 0 THEN 44100 WHEN 1 THEN 48000
                       ELSE 32000 END AS rate,
               CASE bi WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
                 WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
                 WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
                 WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
                 WHEN 13 THEN 256 ELSE 320 END AS kbps,
               nf
             FROM base)
       SELECT r AS id, 'mp3' AS codec,
         CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152000 // rate AS BIGINT) AS dur_ms,
         true AS valid
       FROM p ORDER BY id"""

  // ---------------------------------------------------------------
  // q94 — subquery rewrites: an uncorrelated scalar subquery (global
  // mean price) and a correlated NOT EXISTS (customers with no
  // high-value order) in one statement — Catalyst decorrelates both
  // into joins; the oracle runs the identical SQL.
  def q94(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach { n =>
      t(s, dir, n).createOrReplaceTempView(n)
    }
    s.sql(
      """SELECT c.c_custkey, c.c_acctbal,
           (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
              / CAST(count(*) AS DOUBLE)
            FROM orders) AS mean_price
         FROM customer c
         WHERE NOT EXISTS (
             SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
           AND c.c_acctbal > 0
         ORDER BY c.c_custkey""")
  }

  val q94Sql: String =
    """SELECT c.c_custkey, c.c_acctbal,
         (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)
          FROM orders) AS mean_price
       FROM customer c
       WHERE NOT EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
         AND c.c_acctbal > 0
       ORDER BY c.c_custkey"""

  // ---------------------------------------------------------------
  // q95 — moment statistics with engine-exact doubles: per event
  // type, sample stddev of value and Pearson correlation between
  // value and hour-of-day. Spark's stddev/corr aggregates fold
  // doubles in partition order (non-deterministic); instead the five
  // moments ride decimal(30,8) sums (order-independent), and both
  // statistics are ONE pinned double formula over those exact sums —
  // bit-identical cross-engine (±,·,/,sqrt are correctly rounded).
  def q95(s: SparkSession, dir: String): DataFrame = {
    // (15,4): narrow enough that products stay inside DECIMAL(38)
    // in BOTH engines (15+15+1 = 31 digits) with no scale reduction;
    // wide enough to hold the 2-decimal values and hour ints exactly
    val d = "decimal(15,4)"
    val e = t(s, dir, "events").select(
      col("event_type"),
      col("value").cast(d).as("x"),
      expr("((ts div 1000) div 3600000000L) % 24").cast(d).as("h"))
    e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("h")).as("sh"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("h") * col("h")).as("shh"),
        sum(col("x") * col("h")).as("sxh"))
      .select(col("event_type"), col("n"),
        sqrt((col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
          .as("sd_value"),
        ((col("n").cast("double") * col("sxh").cast("double") -
          col("sx").cast("double") * col("sh").cast("double")) /
          (sqrt(col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            sqrt(col("n").cast("double") * col("shh").cast("double") -
              col("sh").cast("double") * col("sh").cast("double"))))
          .as("corr_value_hour"))
      .orderBy("event_type")
  }

  val q95Sql: String =
    """WITH e AS (SELECT event_type,
           CAST(value AS DECIMAL(15,4)) AS x,
           CAST((epoch_us(ts) // 3600000000) % 24 AS DECIMAL(15,4)) AS h
         FROM events),
       m AS (SELECT event_type, count(*) AS n,
               sum(x) AS sx, sum(h) AS sh,
               sum(x*x) AS sxx, sum(h*h) AS shh, sum(x*h) AS sxh
             FROM e GROUP BY 1)
       SELECT event_type, n,
         sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
           AS sd_value,
         ((CAST(n AS DOUBLE) * CAST(sxh AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sh AS DOUBLE))
          / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * sqrt(CAST(n AS DOUBLE) * CAST(shh AS DOUBLE)
                    - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE))))
           AS corr_value_hour
       FROM m ORDER BY event_type"""

  // ---------------------------------------------------------------
  // q96 — Bloom-filter runtime join pruning: revenue per brand for
  // small parts. The dim side (p_size ≤ 4, ~8.5% of part) builds a
  // distributed Bloom sketch of its keys; the lineitem scan drops
  // non-joining rows BEFORE the exchange (might_contain sits inside
  // the scan's codegen stage). Output is exactly the plain join —
  // false positives die in the join — so the oracle is plain SQL.
  def q96(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "part").where(col("p_size") <= 4)
      .select(col("p_partkey"), col("p_brand"))
    val fact = t(s, dir, "lineitem").select(
      col("l_partkey").as("p_partkey"),
      // per-row IEEE product — identical cross-engine; the ORDER-
      // dependent part (the sum) rides decimal(30,8)
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(30,8)").as("rev"))
    graft.operators.RuntimeFilter.bloomPrunedJoin(fact, dim,
        Seq("p_partkey"), expectedItems = 4096L)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("rev")).cast("double").as("revenue"))
      .orderBy("p_brand")
  }

  val q96Sql: String =
    """SELECT p_brand, count(*) AS n,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(30,8))) AS DOUBLE) AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_size <= 4
       GROUP BY 1 ORDER BY p_brand"""

  // ---------------------------------------------------------------
  // q97 — Count-Min-sketch heavy hitters: parts ordered ≥ 40 times.
  // One narrow pass sketches xxhash64(l_partkey); a cms_estimate < T
  // predicate prunes keys that provably cannot be heavy (CMS error is
  // one-sided) BEFORE the exact groupBy — the wide shuffle carries
  // candidates only. The exact count on survivors kills sketch false
  // positives, so the output — and the oracle — is the plain
  // GROUP BY ... HAVING.
  def q97(s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.heavyHitters(
        t(s, dir, "lineitem"), "l_partkey", threshold = 40L,
        eps = 0.00002, confidence = 0.99, seed = 42)
      .select(col("k").as("l_partkey"), col("n"))
      .orderBy("l_partkey")

  val q97Sql: String =
    """SELECT l_partkey, count(*) AS n
       FROM lineitem GROUP BY 1 HAVING count(*) >= 40
       ORDER BY l_partkey"""

  // ---------------------------------------------------------------
  // q98 — FULL Lloyd k-means (3 assignment rounds, 2 exact mean
  // updates) over 10⁻⁶-quantized embeddings: quantization (bround ≡
  // round_even) makes every centroid update an integer sum per dim +
  // one pinned double division, so engine and oracle derive
  // bit-identical centroids each round; the double argmin is gated by
  // the q84 margin spec. Closes the "assign-step only" gap q84 left.
  def q98(s: SparkSession, dir: String): DataFrame =
    graft.operators.Similarity
      .lloydKMeans(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, rounds = 3)
      .withColumnRenamed("id", "vec_id")
      .orderBy("vec_id")

  val q98Sql: String = {
    val dim = 64
    def roundSql(t: Int) = s"""
       d$t AS (SELECT q.vec_id, c.cid,
            list_sum(list_transform(range(1, ${dim + 1}),
              i -> (CAST(q.qv[i] AS DOUBLE) - c.m[i])
                 * (CAST(q.qv[i] AS DOUBLE) - c.m[i]))) AS dist
          FROM q CROSS JOIN c${t - 1} c),
       a$t AS (SELECT vec_id, cid AS cluster FROM (
            SELECT vec_id, cid,
              row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid)
                AS rn
            FROM d$t) WHERE rn = 1)"""
    def updateSql(t: Int) = s"""
       u$t AS (SELECT a.cluster, generate_subscripts(q.qv, 1) AS i,
                 unnest(q.qv) AS x
               FROM a$t a JOIN q USING (vec_id)),
       s$t AS (SELECT cluster, i, sum(x) AS s, count(*) AS n
               FROM u$t GROUP BY 1, 2),
       m$t AS (SELECT cluster,
                 list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY i)
                   AS m
               FROM s$t GROUP BY 1),
       c$t AS (SELECT c.cid, COALESCE(m$t.m, c.m) AS m
               FROM c${t - 1} c LEFT JOIN m$t ON m$t.cluster = c.cid)"""
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
           e -> CAST(round_even(CAST(e AS DOUBLE) * 1000000.0, 0)
                     AS BIGINT)) AS qv
         FROM embeddings),
       c0 AS (SELECT vec_id AS cid,
                list_transform(qv, v -> CAST(v AS DOUBLE)) AS m
              FROM q ORDER BY vec_id LIMIT 8),
       ${roundSql(1)}, ${updateSql(1)},
       ${roundSql(2)}, ${updateSql(2)},
       ${roundSql(3)}
       SELECT vec_id, cluster,
         CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_n
       FROM a3 ORDER BY vec_id"""
  }

  // ---------------------------------------------------------------
  // q99 — canonical selection within near-dup clusters: exact-Jaccard
  // clusters (q36's semantics, but pairs from the COMPLETE inverted
  // index, not LSH), then keep each cluster's best doc by the integer
  // key chain (token count DESC, doc_id ASC) — every decision exact,
  // no margin gate. One row per cluster.
  def q99(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup
      .canonicalSelect(t(s, dir, "documents"), "doc_id", "text", 0.5)
      .orderBy("cluster")

  val q99Sql: String =
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text,' ') w FROM documents),
       sh AS (SELECT doc_id, list_distinct([array_to_string(w[i:i+2],' ')
                for i in range(1, len(w)-1)]) s FROM toks),
       p AS (SELECT a.doc_id AS a, b.doc_id AS b
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
                   >= 0.5*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))
               AND (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) > 0),
       e AS (SELECT a AS x, b AS y FROM p UNION ALL SELECT b, a FROM p),
       reach(id, r) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.x, reach.r FROM e JOIN reach ON reach.id = e.y),
       comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
       st AS (SELECT doc_id AS id,
                CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
              FROM documents),
       ranked AS (SELECT c.cluster, c.id, s.n_tokens,
                    row_number() OVER (PARTITION BY c.cluster
                      ORDER BY s.n_tokens DESC, c.id) AS rn,
                    count(*) OVER (PARTITION BY c.cluster) AS nm
                  FROM comp c JOIN st s USING (id))
       SELECT cluster, id AS keep_id, CAST(nm AS BIGINT) AS n_members,
         n_tokens AS keep_tokens
       FROM ranked WHERE rn = 1 ORDER BY cluster"""

  // ---------------------------------------------------------------
  // q100 — exact equi-depth histogram (CBO statistics): 16 bins over
  // (o_totalprice, o_orderkey), true per-bin count + min/max. The
  // engine computes NTILE in closed form over a DISTRIBUTED prefix-
  // sum rank (sequencePack pattern — no global window); the oracle
  // uses real NTILE. Counts and bin edges are exact (edges are stored
  // data values, not computed doubles).
  def q100(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats
      .equiDepthHistogram(t(s, dir, "orders"), "o_totalprice",
        "o_orderkey", buckets = 16)
      .orderBy("bucket")

  val q100Sql: String =
    """WITH r AS (SELECT o_totalprice AS v,
           ntile(16) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
         FROM orders WHERE o_totalprice IS NOT NULL)
       SELECT bucket, count(*) AS n, min(v) AS lo, max(v) AS hi
       FROM r GROUP BY 1 ORDER BY bucket"""

  // ---------------------------------------------------------------
  // q101 — iterative PageRank (4 supersteps, damping 0.85) over the
  // undirected customer↔supplier graph (suppliers offset by 1e9 to
  // disjoin the key spaces; both edge orientations, so no dangling
  // nodes). INTEGER arithmetic throughout (q98 playbook): rank mass
  // in 10¹² units, contributions and damping via integer division —
  // bit-identical cross-engine, no margin gates.
  def q101(s: SparkSession, dir: String): DataFrame = {
    // eager checkpoint BEFORE symmetrizing: both union orientations
    // read the one materialized join instead of each replaying the
    // orders⋈lineitem shuffle (2x the prep through r10); no
    // query-side distinct — pageRankInt canonicalizes its edge input
    // anyway, so a distinct here would shuffle twice for nothing
    val e0 = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000000L)).as("dst"))
      .localCheckpoint(eager = true)
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.pageRankInt(sym, "src", "dst", iters = 4)
      .orderBy("node")
  }

  val q101Sql: String = {
    def step(t: Int) = s"""
       c$t AS (SELECT e.dst AS node, sum(r${t - 1}.r // d.deg) AS s
               FROM e JOIN r${t - 1} ON e.src = r${t - 1}.node
                 JOIN deg d ON d.src = e.src
               GROUP BY 1),
       r$t AS (SELECT nodes.node,
                 (15 * ((1000000000000 // nn.n)) ) // 100
                   + (85 * COALESCE(c$t.s, 0)) // 100 AS r
               FROM nodes CROSS JOIN nn
               LEFT JOIN c$t ON c$t.node = nodes.node)"""
    s"""WITH e0 AS (SELECT DISTINCT o_custkey AS src,
           l_suppkey + 1000000000 AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT src, dst FROM e0
             UNION ALL SELECT dst, src FROM e0),
       deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
       nodes AS (SELECT DISTINCT src AS node FROM e),
       nn AS (SELECT count(*) AS n FROM nodes),
       r0 AS (SELECT node, 1000000000000 // nn.n AS r
              FROM nodes CROSS JOIN nn),
       ${step(1)}, ${step(2)}, ${step(3)}, ${step(4)}
       SELECT r4.node, CAST(d.deg AS BIGINT) AS deg, CAST(r4.r AS BIGINT) AS r
       FROM r4 JOIN deg d ON d.src = r4.node
       ORDER BY r4.node"""
  }

  // ---------------------------------------------------------------
  // q102 — ORC source/sink round-trip: documents written as a Hive-
  // partitioned ORC table (zlib, per-column bloom filters — the
  // format-specific knobs a warehouse sink would pin), read back
  // through the vectorized ORC reader, and verified ROW FOR ROW
  // against the original parquet (the q81/q90 oracle pattern: any
  // encode/decode drift fails the hash).
  def q102(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q102").toString
    t(s, dir, "documents")
      .select("doc_id", "source", "lang", "n_chars", "text")
      .repartition(4)
      .write.partitionBy("source")
      .option("compression", "zlib")
      .option("orc.bloom.filter.columns", "doc_id")
      .orc(s"$base/orc")
    val out = s.read.orc(s"$base/orc")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        length(col("text")).cast("long").as("text_len"))
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("doc_id")
  }

  val q102Sql: String =
    """SELECT doc_id, source, lang, n_chars,
         CAST(length(text) AS BIGINT) AS text_len
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q103 — incremental maintenance of an aggregated JOIN view:
  // revenue per customer over orders⋈lineitem, maintained under
  // independent 10%/[(k+l)%7] insert batches to BOTH sides via the
  // delta-join rule Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB — the base⋈base
  // join is computed once and never revisited. Decimal-exact sums;
  // the oracle aggregates the FULL join in one pass (maintained ≡
  // recomputed is the whole point).
  def q103(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_custkey"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(30,8)").as("rev"))
    val oIsDelta = col("k") % 10 === 0
    val lIsDelta = (col("k") + col("l_linenumber")) % 7 === 0
    def agg(df: DataFrame): DataFrame =
      df.groupBy("o_custkey").agg(count(lit(1)).as("n"),
        sum(col("rev")).as("rev"))
    val baseView = agg(o.where(!oIsDelta).join(l.where(!lIsDelta), Seq("k")))
    val deltaRows = graft.operators.Maintenance.deltaJoin(
      o.where(!oIsDelta), o.where(oIsDelta),
      l.where(!lIsDelta), l.where(lIsDelta), Seq("k"))
    graft.operators.Maintenance
      .combineAggregates(baseView, agg(deltaRows),
        Seq("o_custkey"), Seq("rev"))
      .select(col("o_custkey"), col("n"),
        col("rev").cast("double").as("revenue"))
      .orderBy("o_custkey")
  }

  val q103Sql: String =
    """SELECT o_custkey, count(*) AS n,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(30,8))) AS DOUBLE) AS revenue
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY 1 ORDER BY o_custkey"""

  // ---------------------------------------------------------------
  // q104 — per-entity EWMA (exponential smoothing, adjust=false,
  // y₁ = x₁): the classic feature-engineering scan, engine-exact by
  // PINNED SEQUENTIAL FOLD — both engines reduce the (tus, event_id)-
  // ordered series left-to-right with the identical IEEE expression
  // acc·0.75 + x·0.25 (both factors explicit literals), so every
  // intermediate double is bit-identical. Inherently serial PER KEY
  // (it's a scan); the grouping distributes across keys, and series
  // stay bounded per entity.
  def q104(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"),
      expr("ts div 1000").as("tus"), col("event_id"), col("value"))
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("tus"), col("event_id"),
          col("value")))).as("arr"))
      .select(col("user_id"), col("n"),
        aggregate(
          slice(col("arr"), lit(2), greatest(size(col("arr")) - 1, lit(0))),
          element_at(col("arr"), 1).getField("value"),
          (acc, e) => acc * lit(0.75) +
            e.getField("value") * lit(0.25)).as("ewma"))
      .orderBy("user_id")
  }

  val q104Sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id, value
                  FROM events),
       g AS (SELECT user_id, count(*) AS n,
               list(value ORDER BY tus, event_id) AS l
             FROM e GROUP BY 1)
       SELECT user_id, n,
         list_reduce(l, (acc, x) -> acc*CAST(0.75 AS DOUBLE)
                                  + x*CAST(0.25 AS DOUBLE)) AS ewma
       FROM g ORDER BY user_id"""

  // ---------------------------------------------------------------
  // q105 — zone-map statistics over the z-order layout: per zbucket
  // (q75's clustering zones), row count + min/max of both clustering
  // dimensions — the skipping metadata a reader turns into
  // partition/file pruning (Stats.pruneByZoneMap is the consuming
  // half, spec-gated exact). Integer-only output.
  def q105(s: SparkSession, dir: String): DataFrame = {
    val z = ZOrder.withZOrder(t(s, dir, "events"),
        col("user_id"), floor(col("value")).cast("long"),
        bits = 10, bucketBits = 6)
      .select(col("zbucket"), col("user_id"),
        floor(col("value")).cast("long").as("vfloor"))
    graft.operators.Stats.zoneMap(z, "zbucket", Seq("user_id", "vfloor"))
      .orderBy("zone")
  }

  val q105Sql: String = {
    val terms = (0 until 10).map(i =>
      s"(((ua >> $i) & 1) << ${2 * i}) | (((ub >> $i) & 1) << ${2 * i + 1})")
    s"""WITH z AS (SELECT (${terms.mkString(" | ")}) >> 14 AS zone,
           user_id, vfloor
         FROM (SELECT user_id & 1023 AS ua,
                 CAST(floor(value) AS BIGINT) & 1023 AS ub,
                 user_id, CAST(floor(value) AS BIGINT) AS vfloor
               FROM events))
       SELECT zone, count(*) AS n,
         min(user_id) AS user_id_min, max(user_id) AS user_id_max,
         min(vfloor) AS vfloor_min, max(vfloor) AS vfloor_max
       FROM z GROUP BY 1 ORDER BY zone"""
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_funnel" -> (q73 _),
    "q74_resample" -> (q74 _),
    "q75_zorder_layout" -> (q75 _),
    "q76_dsir_relevance" -> (q76 _),
    "q77_cdc_merge" -> (q77 _),
    "q78_streaming_sessions" -> (q78 _),
    "q79_moving_aggregate" -> (q79 _),
    "q80_quality_audit" -> (q80 _),
    "q81_text_formats" -> (q81 _),
    "q82_pivot" -> (q82 _),
    "q83_mixture_schedule" -> (q83 _),
    "q84_kmeans_assign" -> (q84 _),
    "q85_grouping_sets" -> (q85 _),
    "q86_window_zoo" -> (q86 _),
    "q87_edit_distance" -> (q87 _),
    "q88_stream_stream_join" -> (q88 _),
    "q89_mmr_rerank" -> (q89 _),
    "q90_compaction" -> (q90 _),
    "q91_incremental_agg" -> (q91 _),
    "q92_sliding_window" -> (q92 _),
    "q93_mp3_headers" -> (q93 _),
    "q94_subqueries" -> (q94 _),
    "q95_moment_stats" -> (q95 _),
    "q96_bloom_join" -> (q96 _),
    "q97_heavy_hitters" -> (q97 _),
    "q98_lloyd_kmeans" -> (q98 _),
    "q99_canonical_select" -> (q99 _),
    "q100_histogram" -> (q100 _),
    "q101_pagerank" -> (q101 _),
    "q102_orc_roundtrip" -> (q102 _),
    "q103_join_ivm" -> (q103 _),
    "q104_ewma" -> (q104 _),
    "q105_zone_map" -> (q105 _),
  )

  val oracles: Map[String, String] = Map(
    "q73_funnel" -> q73Sql,
    "q74_resample" -> q74Sql,
    "q75_zorder_layout" -> q75Sql,
    "q76_dsir_relevance" -> q76Sql,
    "q77_cdc_merge" -> q77Sql,
    "q78_streaming_sessions" -> Queries.q32Sql,
    "q79_moving_aggregate" -> q79Sql,
    "q80_quality_audit" -> q80Sql,
    "q81_text_formats" -> q81Sql,
    "q82_pivot" -> q82Sql,
    "q83_mixture_schedule" -> q83Sql,
    "q84_kmeans_assign" -> q84Sql,
    "q85_grouping_sets" -> q85Sql,
    "q86_window_zoo" -> q86Sql,
    "q87_edit_distance" -> q87Sql,
    "q88_stream_stream_join" -> q88Sql,
    "q89_mmr_rerank" -> q89Sql,
    "q90_compaction" -> q90Sql,
    "q91_incremental_agg" -> q91Sql,
    "q92_sliding_window" -> q92Sql,
    "q93_mp3_headers" -> q93Sql,
    "q94_subqueries" -> q94Sql,
    "q95_moment_stats" -> q95Sql,
    "q96_bloom_join" -> q96Sql,
    "q97_heavy_hitters" -> q97Sql,
    "q98_lloyd_kmeans" -> q98Sql,
    "q99_canonical_select" -> q99Sql,
    "q100_histogram" -> q100Sql,
    "q101_pagerank" -> q101Sql,
    "q102_orc_roundtrip" -> q102Sql,
    "q103_join_ivm" -> q103Sql,
    "q104_ewma" -> q104Sql,
    "q105_zone_map" -> q105Sql,
  )
}
