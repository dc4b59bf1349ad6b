package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, LangModel, Resample, Upsert, ZOrder}

/** Round-7 extension queries: warehouse/analytics operators (funnel,
  * gap-fill resample, z-order layout, CDC merge) and the DSIR-style
  * domain-relevance scorer. Same contract as [[ExtQueries]]: every
  * query ends in ORDER BY over a unique key prefix, column names
  * match the oracle SQL exactly, doubles are produced by pinned-order
  * IEEE expressions only.
  */
object ExtQueries2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_funnel" -> (q73 _),
    "q74_resample" -> (q74 _),
    "q75_zorder_layout" -> (q75 _),
    "q76_dsir_relevance" -> (q76 _),
    "q77_cdc_merge" -> (q77 _),
  )

  val oracles: Map[String, String] = Map(
    "q73_funnel" -> q73Sql,
    "q74_resample" -> q74Sql,
    "q75_zorder_layout" -> q75Sql,
    "q76_dsir_relevance" -> q76Sql,
    "q77_cdc_merge" -> q77Sql,
  )
}
