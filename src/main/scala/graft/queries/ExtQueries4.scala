package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ChangeCapture, Graph, Rolling}

/** Round-7+ extension queries (q125–q150): graph label propagation,
  * PMI co-occurrence, snapshot differencing (CDC feed generation),
  * rolling median/MAD robust outliers, hash dataset splits,
  * byte-exact encoding quality, market-basket top-k, Markov
  * transitions, anti-entropy table checksums, deterministic negative
  * sampling, blocked record linkage, first-touch attribution,
  * per-group quantile binning, FK-integrity audits, stream-static
  * broadcast enrichment, running distinct counts, OHLC bars, burst
  * detection, and coverage-gap audits. Same contract as
  * [[ExtQueries]]: every query ends in ORDER BY over a unique key
  * prefix, column names match the oracle SQL exactly, and every
  * value that decides or appears in a row is integer-exact
  * cross-engine (no doubles in any output).
  */
object ExtQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q125 — community seeds by bounded min-label propagation over the
  // supplier co-supply graph (suppliers sharing a part). Three
  // synchronous rounds of label'(v) = min(label(v), min over
  // neighbors) assign every supplier the smallest supplier id within
  // 3 hops — a deterministic blocking/community key with NO fixed-
  // point iteration count dependence. Integer labels, exact. r13:
  // runs on the CLIQUE form of the graph — the membership table goes
  // straight into Graph.cliqueMinLabelPropagate, which never
  // materializes the O(Σ k²) pair expansion (the synthetic lineitem
  // averages ~30 suppliers/part, so the old explode² pair list was
  // ~12.5M rows off 600 k memberships and dominated the query).
  private val LpIters = 3

  def q125(s: SparkSession, dir: String): DataFrame =
    Graph.cliqueMinLabelPropagate(
      t(s, dir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sk")),
      "p", "sk", iters = LpIters)
      .orderBy("node")

  val q125Sql: String = {
    val rounds = (1 to LpIters).map { i =>
      s"""l$i AS (SELECT node, min(label) AS label FROM (
            SELECT node, label FROM l${i - 1}
            UNION ALL
            SELECT e.dst AS node, l.label FROM e JOIN l${i - 1} l
              ON e.src = l.node) GROUP BY 1)"""
    }.mkString(",\n       ")
    s"""WITH sp AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sk
           FROM lineitem),
       e AS (SELECT DISTINCT a.sk AS src, b.sk AS dst
             FROM sp a JOIN sp b ON a.p = b.p AND a.sk != b.sk),
       l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       $rounds
       SELECT node, label FROM l$LpIters ORDER BY node"""
  }

  // ---------------------------------------------------------------
  // q126 — token co-occurrence with an integer PMI surrogate: over
  // the 64 highest-document-frequency tokens (df desc, token asc —
  // total order), count per-pair co-document frequency and score
  //   pmi_ppm = (c_ab · N · 10⁶) div (df_a · df_b)
  // — monotone in the true PMI e^pmi = c_ab·N/(df_a·df_b), all-
  // integer so exact. The vocab cap bounds the per-doc pair fan-out
  // at C(64,2) regardless of corpus scale; the vocab itself
  // broadcasts. Same whitespace tokenization as q42.
  private val PmiVocab = 64

  def q126(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val n = docs.count()
    val tk = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val vocab = tk.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(PmiVocab)
    val vt = tk.join(broadcast(vocab), Seq("tok"))
    val a = vt.select(col("doc_id"), col("tok").as("tok_a"), col("df").as("df_a"))
    val b = vt.select(col("doc_id"), col("tok").as("tok_b"), col("df").as("df_b"))
    a.join(b, Seq("doc_id"))
      .where(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b", "df_a", "df_b")
      .agg(count(lit(1)).as("c_ab"))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("df_a"), col("df_b"),
        expr(s"(c_ab * ${n}L * 1000000L) div (df_a * df_b)").as("pmi_ppm"))
      .orderBy("tok_a", "tok_b")
  }

  val q126Sql: String =
    s"""WITH tk AS (SELECT DISTINCT doc_id, tok FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)),
       df AS (SELECT tok, count(*) AS df FROM tk GROUP BY 1),
       v AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT $PmiVocab),
       vt AS (SELECT t.doc_id, t.tok, v.df FROM tk t JOIN v USING (tok)),
       nn AS (SELECT count(*) AS n FROM documents),
       p AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
               a.df AS df_a, b.df AS df_b, count(*) AS c_ab
             FROM vt a JOIN vt b
               ON a.doc_id = b.doc_id AND a.tok < b.tok
             GROUP BY 1, 2, 3, 4)
       SELECT tok_a, tok_b, c_ab, df_a, df_b,
         (c_ab * nn.n * 1000000) // (df_a * df_b) AS pmi_ppm
       FROM p CROSS JOIN nn ORDER BY tok_a, tok_b"""

  // ---------------------------------------------------------------
  // q127 — change-data-feed generation by snapshot differencing
  // (ChangeCapture.snapshotDiff — ONE full-outer hash join on the
  // key, all classification map-side): the "old" snapshot drops
  // orderkeys ≡3 (mod 10), the "new" drops ≡2 (mod 7), bumps price
  // by 250 cents for keys ≡0 (mod 5) and flips status to 'P' for
  // keys ≡0 (mod 11) — yielding real I/D/U rows plus a majority of
  // unchanged rows that must be filtered. Prices in integer cents
  // (bround ≡ round_even); absent-side sentinels -1/'' keep every
  // output column non-null.
  def q127(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cents = bround(col("o_totalprice") * lit(100.0), 0).cast("long")
    val oldSnap = o.where(col("o_orderkey") % 10 =!= 3)
      .select(col("o_orderkey"), cents.as("cents"),
        col("o_orderstatus").as("status"))
    val newSnap = o.where(col("o_orderkey") % 7 =!= 2)
      .select(col("o_orderkey"),
        (cents + when(col("o_orderkey") % 5 === 0, lit(250L))
          .otherwise(lit(0L))).as("cents"),
        when(col("o_orderkey") % 11 === 0, lit("P"))
          .otherwise(col("o_orderstatus")).as("status"))
    ChangeCapture.snapshotDiff(oldSnap, newSnap, "o_orderkey",
        Seq("cents", "status"))
      .select(col("o_orderkey"), col("op"),
        coalesce(col("old_cents"), lit(-1L)).as("old_cents"),
        coalesce(col("new_cents"), lit(-1L)).as("new_cents"),
        coalesce(col("old_status"), lit("")).as("old_status"),
        coalesce(col("new_status"), lit("")).as("new_status"),
        col("changed"))
      .orderBy("o_orderkey")
  }

  val q127Sql: String =
    """WITH o AS (SELECT o_orderkey AS k,
           CAST(round_even(o_totalprice * 100.0, 0) AS BIGINT) AS cents,
           o_orderstatus AS status
         FROM orders WHERE o_orderkey % 10 != 3),
       n AS (SELECT o_orderkey AS k,
           CAST(round_even(o_totalprice * 100.0, 0) AS BIGINT)
             + CASE WHEN o_orderkey % 5 = 0 THEN 250 ELSE 0 END AS cents,
           CASE WHEN o_orderkey % 11 = 0 THEN 'P' ELSE o_orderstatus END
             AS status
         FROM orders WHERE o_orderkey % 7 != 2),
       j AS (SELECT COALESCE(o.k, n.k) AS o_orderkey,
               CASE WHEN o.k IS NULL THEN 'I'
                    WHEN n.k IS NULL THEN 'D'
                    WHEN o.cents != n.cents OR o.status != n.status THEN 'U'
               END AS op,
               COALESCE(o.cents, -1) AS old_cents,
               COALESCE(n.cents, -1) AS new_cents,
               COALESCE(o.status, '') AS old_status,
               COALESCE(n.status, '') AS new_status,
               CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL THEN
                 concat_ws(',',
                   CASE WHEN o.cents != n.cents THEN 'cents' END,
                   CASE WHEN o.status != n.status THEN 'status' END)
               ELSE '' END AS changed
             FROM o FULL OUTER JOIN n ON o.k = n.k)
       SELECT o_orderkey, op, old_cents, new_cents, old_status,
         new_status, changed
       FROM j WHERE op IS NOT NULL ORDER BY o_orderkey"""

  // ---------------------------------------------------------------
  // q128 — rolling robust outliers: per-user rolling MEDIAN and MAD
  // of the event amount (integer cents) over the last 7 events
  // (Rolling.medianMad — one exchange, one window scan; med2 = 2×
  // median and mad4 = 4×MAD keep every comparison integer, both
  // window parities included). Outlier: 2·|2·x − med2| > 3·mad4,
  // the classic 3-MAD fence.
  def q128(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
      col("ts"), bround(col("value") * lit(100.0), 0).cast("long").as("cents"))
    Rolling.medianMad(ev, "user_id", Seq("ts", "event_id"), "cents",
        window = 7, k = 3)
      .select(col("event_id"), col("user_id"), col("cents"),
        col("med2"), col("mad4"), col("outlier"))
      .orderBy("event_id")
  }

  val q128Sql: String =
    """WITH ev AS (SELECT event_id, user_id, ts,
           CAST(round_even(value * 100.0, 0) AS BIGINT) AS cents
         FROM events),
       w AS (SELECT event_id, user_id, cents,
               list_sort(list(cents) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
             FROM ev),
       m AS (SELECT event_id, user_id, cents, arr, len(arr) AS n,
               arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS med2
             FROM w),
       d AS (SELECT event_id, user_id, cents, n, med2,
               list_sort([abs(2 * x - med2) FOR x IN arr]) AS devs
             FROM m)
       SELECT event_id, user_id, cents, med2,
         devs[(n + 1) // 2] + devs[n // 2 + 1] AS mad4,
         CAST(CASE WHEN 2 * abs(2 * cents - med2) >
             3 * (devs[(n + 1) // 2] + devs[n // 2 + 1])
           THEN 1 ELSE 0 END AS BIGINT) AS outlier
       FROM d ORDER BY event_id"""

  // ---------------------------------------------------------------
  // q129 — deterministic train/val/test split by multiplicative
  // hash: bucket = (doc_id · 2654435761) mod 2³² mod 100 (Knuth's
  // golden-ratio multiplier — engine-neutral 64-bit integer math, no
  // overflow below 2⁵³ products, unlike xxhash64 which DuckDB lacks),
  // 90/5/5 → train/val/test. Per (split, lang) audit counts — the
  // leakage-free split assignment every training pipeline needs,
  // reproducible from the id alone with no RNG state.
  def q129(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("doc_id") * lit(2654435761L) % lit(4294967296L) % lit(100L))
          .as("bucket"))
      .select(col("lang"), col("n_chars"), col("doc_id"),
        when(col("bucket") < 90, lit("train"))
          .when(col("bucket") < 95, lit("val"))
          .otherwise(lit("test")).as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("split", "lang")

  val q129Sql: String =
    """SELECT split, lang, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         min(doc_id) AS min_id, max(doc_id) AS max_id
       FROM (SELECT lang, n_chars, doc_id,
               CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
                      THEN 'train'
                    WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95
                      THEN 'val'
                    ELSE 'test' END AS split
             FROM documents)
       GROUP BY 1, 2 ORDER BY split, lang"""

  // ---------------------------------------------------------------
  // q130 — encoding-quality scoring, BYTE-exact: every count is a
  // UTF-8 byte count (octet_length / strlen agree across engines;
  // code-POINT counting would diverge on surrogate handling), so the
  // per-class counts come from length deltas after regexp strips.
  // Docs with doc_id ≡ 0 (mod 17) get one U+FFFD replacement char +
  // one BEL appended to plant real mojibake/control hits. ascii_ppm
  // = printable-ASCII bytes per million total bytes — the corpus-
  // hygiene filter signal.
  def q130(s: SparkSession, dir: String): DataFrame = {
    val txt = when(col("doc_id") % 17 === 0,
      concat(col("text"), lit("\uFFFD\u0007"))).otherwise(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"), txt.as("t"))
      .select(col("doc_id"),
        octet_length(col("t")).cast("long").as("n_bytes"),
        octet_length(regexp_replace(col("t"), "[^\\x20-\\x7e]", ""))
          .cast("long").as("ascii_n"),
        (octet_length(col("t")) - octet_length(regexp_replace(col("t"),
          "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))).cast("long")
          .as("ctrl_n"),
        // `div` (not `/`): int `/` promotes to double; U+FFFD is
        // always 3 UTF-8 bytes so the division is exact
        expr("(octet_length(t) - octet_length(regexp_replace(t, '\\uFFFD', ''))) div 3")
          .as("repl_n"))
      .select(col("doc_id"), col("n_bytes"), col("ascii_n"), col("ctrl_n"),
        col("repl_n"),
        when(col("n_bytes") > 0,
          expr("(ascii_n * 1000000) div n_bytes")).otherwise(lit(-1L))
          .as("ascii_ppm"))
      .orderBy("doc_id")
  }

  val q130Sql: String =
    """WITH d AS (SELECT doc_id,
           CASE WHEN doc_id % 17 = 0 THEN text || chr(65533) || chr(7)
                ELSE text END AS t
         FROM documents),
       c AS (SELECT doc_id,
               CAST(strlen(t) AS BIGINT) AS n_bytes,
               CAST(strlen(regexp_replace(t, '[^\x20-\x7e]', '', 'g'))
                 AS BIGINT) AS ascii_n,
               CAST(strlen(t) - strlen(regexp_replace(t,
                 '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT)
                 AS ctrl_n,
               CAST((strlen(t) - strlen(regexp_replace(t, chr(65533),
                 '', 'g'))) // 3 AS BIGINT) AS repl_n
             FROM d)
       SELECT doc_id, n_bytes, ascii_n, ctrl_n, repl_n,
         CASE WHEN n_bytes > 0 THEN (ascii_n * 1000000) // n_bytes
              ELSE -1 END AS ascii_ppm
       FROM c ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q131 — market-basket recommendations: for every part, the top-3
  // co-purchased parts by co-order count (ties by partner id — total
  // order), with integer confidence conf_ppm = (c_ab·10⁶) div c_part.
  // Pair generation rides the q106 grouped-double-explode (per-order
  // fan-out structurally ≤ C(basket,2), basket ≤ 13 here — never a
  // corpus self-join); the per-part rank is a bounded window over the
  // pair table, not the baskets.
  def q131(s: SparkSession, dir: String): DataFrame = {
    // pinned: po feeds the per-part totals AND the basket build —
    // without the checkpoint both consumers replay the scan+distinct
    val po = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(true)
    val pc = po.groupBy(col("p")).agg(count(lit(1)).as("c_part"))
    val pairs = po.groupBy("o").agg(collect_set(col("p")).as("ps"))
      .select(explode(col("ps")).as("x"), col("ps"))
      .select(col("x"), explode(col("ps")).as("y"))
      .where(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= 2)
    val sym = pairs.select(col("x").as("part"), col("y").as("partner"), col("c_ab"))
      .union(pairs.select(col("y"), col("x"), col("c_ab")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy(col("c_ab").desc, col("partner"))
    sym.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .join(pc.select(col("p").as("part"), col("c_part")), Seq("part"))
      .select(col("part"), col("rank").cast("long").as("rank"),
        col("partner"), col("c_ab"), col("c_part"),
        expr("(c_ab * 1000000) div c_part").as("conf_ppm"))
      .orderBy("part", "rank")
  }

  val q131Sql: String =
    """WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           FROM lineitem),
       pc AS (SELECT p, count(*) AS c_part FROM po GROUP BY 1),
       pr AS (SELECT a.p AS x, b.p AS y, count(*) AS c_ab
              FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
              GROUP BY 1, 2 HAVING count(*) >= 2),
       sym AS (SELECT x AS part, y AS partner, c_ab FROM pr
               UNION ALL SELECT y, x, c_ab FROM pr),
       rk AS (SELECT part, partner, c_ab,
                row_number() OVER (PARTITION BY part
                  ORDER BY c_ab DESC, partner) AS rank
              FROM sym)
       SELECT rk.part, CAST(rk.rank AS BIGINT) AS rank, rk.partner,
         rk.c_ab, pc.c_part,
         (rk.c_ab * 1000000) // pc.c_part AS conf_ppm
       FROM rk JOIN pc ON pc.p = rk.part
       WHERE rk.rank <= 3 ORDER BY rk.part, rk.rank"""

  // ---------------------------------------------------------------
  // q132 — Markov transition matrix over per-user event sequences:
  // count each (event_type → next event_type) transition along the
  // (ts, event_id)-ordered per-user stream (lead window — one hash
  // exchange + one in-partition sort), then row-normalize to ppm.
  // The transition table is |types|² ≤ 25 rows, so the normalizing
  // window is driver-trivial; all outputs integer.
  def q132(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val tr = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("prev_type"))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("c"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
    tr.withColumn("out_total", sum(col("c")).over(wn))
      .select(col("prev_type"), col("next_type"), col("c"), col("out_total"),
        expr("(c * 1000000) div out_total").as("p_ppm"))
      .orderBy("prev_type", "next_type")
  }

  val q132Sql: String =
    """WITH tr AS (SELECT event_type AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS next_type
         FROM events),
       c AS (SELECT prev_type, next_type, count(*) AS c FROM tr
             WHERE next_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, c,
         CAST(sum(c) OVER (PARTITION BY prev_type) AS BIGINT) AS out_total,
         CAST((c * 1000000) // sum(c) OVER (PARTITION BY prev_type)
           AS BIGINT) AS p_ppm
       FROM c ORDER BY prev_type, next_type"""

  // ---------------------------------------------------------------
  // q133 — per-source table checksums (anti-entropy audit): an
  // ORDER-INDEPENDENT per-group fingerprint, checksum = Σ rowhash
  // mod (2³¹−1) with rowhash = (id·2654435761 + bytes·97) mod
  // (2³¹−1) — commutative, so partitioning/shuffle order can never
  // change it, and engine-neutral (plain 64-bit integer products,
  // far below 2⁶³; no xxhash, which the oracle engine lacks).
  // Detects dropped/duplicated rows and any text-length drift;
  // replica-comparison is a checksum equi-join.
  def q133(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("nb"))
      .select(col("source"),
        expr("(doc_id * 2654435761L + nb * 97L) % 2147483647L").as("rh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(rh) % 2147483647L").as("checksum"))
      .orderBy("source")

  val q133Sql: String =
    """SELECT source, count(*) AS n_rows,
         CAST(sum((doc_id * 2654435761 + strlen(text) * 97) % 2147483647)
           % 2147483647 AS BIGINT) AS checksum
       FROM documents GROUP BY 1 ORDER BY source"""

  // ---------------------------------------------------------------
  // q134 — deterministic negative sampling (contrastive-training data
  // gen): rank documents by id via the DISTRIBUTED prefix sum
  // (Packing.sequencePack with unit weights — never a global
  // single-partition window), then for each document draw 4
  // pseudo-random partner ranks (rank·2654435761 + j·40503241) mod N
  // (products < 2⁶³ for N < 3.4·10⁹ — comment-bounded) and join back
  // rank→id. Self-collisions are filtered identically in both
  // engines. RNG-free: the sample is reproducible from ids alone.
  private val NegPerDoc = 4

  def q134(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    val n = docs.count()
    val rk = graft.operators.Packing.sequencePack(
        docs.withColumn("one", lit(1L)), "doc_id", "one", budget = 1L)
      .select(col("id").as("doc_id"), col("start_tok").as("rk"))
      .localCheckpoint(eager = true) // reused as probe AND partner side
    val js = (1 to NegPerDoc).map(j => lit(j.toLong)).toArray
    rk.select(col("doc_id"), col("rk"),
        explode(array(js: _*)).as("j"))
      .withColumn("nr",
        expr(s"(rk * 2654435761L + j * 40503241L) % ${n}L"))
      .where(col("nr") =!= col("rk"))
      .join(rk.select(col("rk").as("nr"), col("doc_id").as("neg_doc_id")),
        Seq("nr"))
      .select(col("doc_id"), col("j"), col("neg_doc_id"))
      .orderBy("doc_id", "j")
  }

  val q134Sql: String =
    s"""WITH r AS (SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) - 1 AS rk
         FROM documents),
       nn AS (SELECT count(*) AS n FROM documents),
       neg AS (SELECT r.doc_id, j.j, r.rk,
                 (r.rk * 2654435761 + j.j * 40503241) % nn.n AS nr
               FROM r CROSS JOIN nn
                 CROSS JOIN (SELECT unnest(range(1, ${NegPerDoc + 1})) AS j) j)
       SELECT neg.doc_id, neg.j, r2.doc_id AS neg_doc_id
       FROM neg JOIN r r2 ON r2.rk = neg.nr
       WHERE neg.nr != neg.rk
       ORDER BY neg.doc_id, neg.j"""

  // ---------------------------------------------------------------
  // q135 — blocked record linkage: a deterministically corrupted copy
  // of customer (one name char dropped at position key mod 16 + 2;
  // nation/segment stable) is matched back against the originals.
  // Candidates are generated ONLY within (nation, segment) blocks —
  // the classic blocking step that turns O(n²) linkage into
  // Σ_block O(b²) — then verified with Levenshtein ≤ 2 and resolved
  // to the best match via the single-pass integer argmin
  // min(lev·10⁷ + key) (valid while keys < 10⁷ — comment-bounded),
  // decomposed by div/mod. The fixed-width synthetic names make
  // near-miss digit patterns real false candidates, so the ranking
  // is exercised, not vacuous.
  def q135(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val corrupt = c.select(
      (col("c_custkey") + 100000L).as("k2"),
      expr("""concat(substr(c_name, 1, int(c_custkey % 16 + 1)),
              substr(c_name, int(c_custkey % 16 + 3)))""").as("name2"),
      col("c_nationkey").as("nk2"), col("c_mktsegment").as("seg2"))
    // threshold-banded Levenshtein (3-arg form, O(k·n) band instead
    // of the O(n²) full DP; returns -1 past the bound) — the verify
    // step runs on every block pair, so the band is the win
    val cand = corrupt.join(c,
        col("nk2") === col("c_nationkey") && col("seg2") === col("c_mktsegment"))
      .withColumn("lev", expr("levenshtein(name2, c_name, 2)"))
      .where(col("lev") >= 0)
    cand.groupBy(col("k2"))
      .agg(count(lit(1)).as("n_cands"),
        min(col("lev").cast("long") * 10000000L + col("c_custkey"))
          .as("best"))
      .select(col("k2"), expr("best % 10000000L").as("matched_key"),
        expr("best div 10000000L").as("lev"), col("n_cands"))
      .orderBy("k2")
  }

  val q135Sql: String =
    """WITH corrupt AS (SELECT c_custkey + 100000 AS k2,
           substr(c_name, 1, CAST(c_custkey % 16 + 1 AS INT))
             || substr(c_name, CAST(c_custkey % 16 + 3 AS INT)) AS name2,
           c_nationkey AS nk2, c_mktsegment AS seg2
         FROM customer),
       cand AS (SELECT k2, c_custkey, levenshtein(name2, c_name) AS lev
                FROM corrupt JOIN customer
                  ON nk2 = c_nationkey AND seg2 = c_mktsegment
                WHERE levenshtein(name2, c_name) <= 2)
       SELECT k2, CAST(min(lev * 10000000 + c_custkey) % 10000000
           AS BIGINT) AS matched_key,
         CAST(min(lev * 10000000 + c_custkey) // 10000000 AS BIGINT) AS lev,
         count(*) AS n_cands
       FROM cand GROUP BY 1 ORDER BY k2"""

  // ---------------------------------------------------------------
  // q136 — first-touch attribution: every purchase is attributed to
  // the EARLIEST click by the same user within the preceding 7 days
  // (µs integers end to end). The candidate join is per-user range-
  // banded (one hash exchange on user_id; per-user event counts are
  // bounded), and the earliest-click resolution is two deterministic
  // min-aggregations — first the timestamp, then the event id at
  // that timestamp — so ties can never flake the output.
  private val AttrWindowUs = 604800000000L // 7 days

  def q136(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        expr("ts div 1000").as("pt"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        expr("ts div 1000").as("ct"))
    val cand = purch.join(clicks, Seq("user_id"))
      .where(col("ct") <= col("pt") &&
        col("ct") >= col("pt") - AttrWindowUs)
    val first = cand.groupBy("purchase_id")
      .agg(min(col("ct")).as("first_ct"))
    cand.join(first, Seq("purchase_id"))
      .where(col("ct") === col("first_ct"))
      .groupBy(col("purchase_id"))
      .agg(min(col("user_id")).as("user_id"),
        min(col("click_id")).as("click_id"),
        min(col("pt") - col("ct")).as("gap_us"))
      .orderBy("purchase_id")
  }

  val q136Sql: String =
    s"""WITH p AS (SELECT user_id, event_id AS purchase_id,
           epoch_us(ts) AS pt FROM events WHERE event_type = 'purchase'),
       c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS ct
             FROM events WHERE event_type = 'click'),
       cand AS (SELECT p.purchase_id, p.user_id, c.click_id, p.pt, c.ct
                FROM p JOIN c ON p.user_id = c.user_id
                WHERE c.ct <= p.pt AND c.ct >= p.pt - $AttrWindowUs),
       f AS (SELECT purchase_id, min(ct) AS first_ct FROM cand GROUP BY 1)
       SELECT cand.purchase_id, min(cand.user_id) AS user_id,
         min(cand.click_id) AS click_id,
         min(cand.pt - cand.ct) AS gap_us
       FROM cand JOIN f ON cand.purchase_id = f.purchase_id
         AND cand.ct = f.first_ct
       GROUP BY 1 ORDER BY cand.purchase_id"""

  // ---------------------------------------------------------------
  // q137 — per-group equi-depth quantile binning (feature
  // discretization): within each event_type, rows are ranked by the
  // (cents, event_id) total order and assigned decile
  // bucket = ((rank−1)·10) div n_g — exactly ⌈n/10⌉/⌊n/10⌋ rows per
  // bucket, no percentile interpolation anywhere. The window is
  // PARTITIONED BY the group (bounded per-partition work — this is
  // the per-group variant of q100's global prefix-sum histogram;
  // a GLOBAL rank here would be the single-partition trap). Output:
  // per (event_type, bucket) count + integer cent bounds.
  def q137(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("cents", "event_id")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        bround(col("value") * lit(100.0), 0).cast("long").as("cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_g", count(lit(1)).over(wn))
      .select(col("event_type"),
        expr("((rk - 1) * 10) div n_g").as("bucket"),
        col("cents"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .orderBy("event_type", "bucket")
  }

  val q137Sql: String =
    """WITH ev AS (SELECT event_type, event_id,
           CAST(round_even(value * 100.0, 0) AS BIGINT) AS cents
         FROM events),
       r AS (SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY cents, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n_g
             FROM ev)
       SELECT event_type, ((rk - 1) * 10) // n_g AS bucket,
         count(*) AS n, min(cents) AS lo, max(cents) AS hi
       FROM r GROUP BY 1, 2 ORDER BY event_type, bucket"""

  // ---------------------------------------------------------------
  // q138 — referential-integrity audit across the FK chain
  // lineitem→orders→customer→nation: per relation, total child rows
  // vs orphans (children whose parent key misses — left-anti
  // semantics via a left join null-count so one pass yields both
  // numbers). Parents are deterministically thinned (≡5 mod 13 /
  // ≡7 mod 17 dropped) so real orphans exist; integer ppm rate.
  // Scale shape: three independent key-only joins, each aggregated
  // map-side to a single row — the orphan table never materializes.
  def q138(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"))
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val nat = t(s, dir, "nation").select(col("n_nationkey"))
    val ordK = ord.where(col("o_orderkey") % 13 =!= 5)
      .select(col("o_orderkey"), lit(1).as("p1"))
    val custK = cust.where(col("c_custkey") % 17 =!= 7)
      .select(col("c_custkey"), lit(1).as("p2"))
    val natK = nat.select(col("n_nationkey"), lit(1).as("p3"))
    def audit(rel: String, child: DataFrame, flag: String): DataFrame =
      child.agg(count(lit(1)).as("n_rows"),
          sum(when(col(flag).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(rel).as("relation"), col("n_rows"), col("n_orphans"),
          expr("(n_orphans * 1000000) div n_rows").as("orphan_ppm"))
    val a = audit("lineitem_orders",
      li.join(ordK, col("l_orderkey") === col("o_orderkey"), "left"), "p1")
    val b = audit("orders_customer",
      ord.select(col("o_custkey"))
        .join(custK, col("o_custkey") === col("c_custkey"), "left"), "p2")
    val c = audit("customer_nation",
      cust.select(col("c_nationkey"))
        .join(natK, col("c_nationkey") === col("n_nationkey"), "left"), "p3")
    a.union(b).union(c).orderBy("relation")
  }

  val q138Sql: String =
    """WITH ok AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 13 != 5),
       ck AS (SELECT c_custkey FROM customer WHERE c_custkey % 17 != 7),
       a AS (SELECT 'lineitem_orders' AS relation, count(*) AS n_rows,
               CAST(sum(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_orphans
             FROM lineitem LEFT JOIN ok ON l_orderkey = ok.o_orderkey),
       b AS (SELECT 'orders_customer', count(*),
               CAST(sum(CASE WHEN ck.c_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT)
             FROM orders LEFT JOIN ck ON o_custkey = ck.c_custkey),
       c AS (SELECT 'customer_nation', count(*),
               CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT)
             FROM customer LEFT JOIN nation n ON c_nationkey = n.n_nationkey)
       SELECT relation, n_rows, n_orphans,
         (n_orphans * 1000000) // n_rows AS orphan_ppm
       FROM (SELECT * FROM a UNION ALL SELECT * FROM b
             UNION ALL SELECT * FROM c)
       ORDER BY relation"""

  // ---------------------------------------------------------------
  // q139 — STREAMING stream-static broadcast enrichment: events
  // stream through forced multi-file micro-batches and pick up the
  // customer market segment via a broadcast dimension join
  // (StreamingIngest.runEnrichStream — stateless map-side lookup, no
  // state store, the at-ingest enrichment shape; contrast q88's
  // stateful stream-stream join). user_id maps onto the customer key
  // space by modulo |customer| (both engines compute the same
  // mapping). The landed enriched stream is then audited per
  // (segment, event_type): row count + integer cent sum — equal to
  // the batch join's aggregate, which is the oracle.
  def q139(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q139").toString
    val cust = t(s, dir, "customer")
    // keyed-events landing staged once per JVM (input staging,
    // untimed — StagedInputs); fresh checkpoint/out per run
    val landing = StagedInputs.dir("q139", dir) { d =>
      val nc = cust.count()
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          bround(col("value") * lit(100.0), 0).cast("long").as("cents"),
          (col("user_id") % nc).as("c_custkey"))
        .repartition(4)
        .write.parquet(s"$d/landing")
    } + "/landing"
    graft.streaming.StreamingIngest.runEnrichStream(
      s, landing,
      cust.select(col("c_custkey"), col("c_mktsegment")),
      Seq("c_custkey"), s"$base/out", s"$base/ckpt",
      maxFilesPerTrigger = Some(2))
    val out = s.read.parquet(s"$base/out")
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
      .localCheckpoint(eager = true)
    IngestQueries.deleteTree(java.nio.file.Paths.get(base))
    out.orderBy("c_mktsegment", "event_type")
  }

  val q139Sql: String =
    """WITH nc AS (SELECT count(*) AS n FROM customer),
       ev AS (SELECT event_type,
                CAST(round_even(value * 100.0, 0) AS BIGINT) AS cents,
                user_id % nc.n AS c_custkey
              FROM events CROSS JOIN nc)
       SELECT c.c_mktsegment, ev.event_type, count(*) AS n,
         CAST(sum(ev.cents) AS BIGINT) AS cents_sum
       FROM ev JOIN customer c ON ev.c_custkey = c.c_custkey
       GROUP BY 1, 2 ORDER BY c_mktsegment, event_type"""

  // ---------------------------------------------------------------
  // q140 — running DISTINCT count per user (how many distinct event
  // types has each user seen so far, at every event): the scale-safe
  // formulation — a first-occurrence flag (row_number = 1 within
  // (user, type), one exchange) cum-summed along the (ts, event_id)
  // event order — instead of the O(n²)-state collect_set-over-window
  // a naive translation would plan. Two group-partitioned windows,
  // no global window, all integers.
  def q140(s: SparkSession, dir: String): DataFrame = {
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("first_seen")).over(wCum))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("first_seen"), col("n_types_seen"))
      .orderBy("event_id")
  }

  val q140Sql: String =
    """WITH f AS (SELECT event_id, user_id, ts, event_type,
           CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                  ORDER BY ts, event_id) = 1
                THEN 1 ELSE 0 END AS first_seen
         FROM events)
       SELECT event_id, user_id, event_type,
         CAST(first_seen AS BIGINT) AS first_seen,
         CAST(sum(first_seen) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_types_seen
       FROM f ORDER BY event_id"""

  // ---------------------------------------------------------------
  // q141 — OHLC bars: per (user, 6-hour bucket) open/high/low/close
  // of the event amount in integer cents. Open/close are first_value/
  // last_value over the full bucket frame pinned by the unique
  // (ts, event_id) order (ties can't flake); high/low are plain
  // min/max. One exchange on (user, bucket), windows + the final
  // group share the sort.
  private val BarUs = 21600000000L // 6 h

  def q141(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "bucket").orderBy("tus", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tus"),
        bround(col("value") * lit(100.0), 0).cast("long").as("cents"))
      .withColumn("bucket", expr(s"tus div ${BarUs}L"))
      .withColumn("open", first(col("cents")).over(w))
      .withColumn("close", last(col("cents")).over(w))
      .groupBy("user_id", "bucket")
      .agg(count(lit(1)).as("n"), min(col("open")).as("open"),
        max(col("cents")).as("high"), min(col("cents")).as("low"),
        min(col("close")).as("close"))
      .orderBy("user_id", "bucket")
  }

  val q141Sql: String =
    s"""WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
           CAST(round_even(value * 100.0, 0) AS BIGINT) AS cents
         FROM events),
       b AS (SELECT *, tus // $BarUs AS bucket FROM ev),
       w AS (SELECT user_id, bucket, cents,
               first_value(cents) OVER (PARTITION BY user_id, bucket
                 ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS open,
               last_value(cents) OVER (PARTITION BY user_id, bucket
                 ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS close
             FROM b)
       SELECT user_id, bucket, count(*) AS n, min(open) AS open,
         max(cents) AS high, min(cents) AS low, min(close) AS close
       FROM w GROUP BY 1, 2 ORDER BY user_id, bucket"""

  // ---------------------------------------------------------------
  // q142 — burst detection on the event-rate series: per-type hourly
  // counts, then each bucket tested against the rolling median of
  // its trailing 8 buckets with the integer 2·|2x−med2| > 3·mad4
  // robust fence (Rolling.medianMad COMPOSED on the aggregated
  // series — the aggregate is tiny, so the window stage costs
  // nothing; the corpus-sized work is the one groupBy). Empty
  // buckets are NOT materialized (a gap simply doesn't test), which
  // keeps the series sparse-safe at scale.
  private val BurstBucketUs = 3600000000L // 1 h

  def q142(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events")
      .select(col("event_type"),
        expr(s"(ts div 1000) div ${BurstBucketUs}L").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))
    Rolling.medianMad(counts, "event_type", Seq("bucket"), "n",
        window = 8, k = 3)
      .select(col("event_type"), col("bucket"), col("n"),
        col("med2"), col("mad4"), col("outlier").as("burst"))
      .orderBy("event_type", "bucket")
  }

  val q142Sql: String =
    s"""WITH c AS (SELECT event_type, epoch_us(ts) // $BurstBucketUs
             AS bucket, count(*) AS n
           FROM events GROUP BY 1, 2),
       w AS (SELECT event_type, bucket, n,
               list_sort(list(n) OVER (PARTITION BY event_type
                 ORDER BY bucket
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) AS arr
             FROM c),
       m AS (SELECT event_type, bucket, n, arr, len(arr) AS ln,
               arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS med2
             FROM w),
       d AS (SELECT event_type, bucket, n, ln, med2,
               list_sort([abs(2 * x - med2) FOR x IN arr]) AS devs
             FROM m)
       SELECT event_type, bucket, n, med2,
         devs[(ln + 1) // 2] + devs[ln // 2 + 1] AS mad4,
         CAST(CASE WHEN 2 * abs(2 * n - med2) >
             3 * (devs[(ln + 1) // 2] + devs[ln // 2 + 1])
           THEN 1 ELSE 0 END AS BIGINT) AS burst
       FROM d ORDER BY event_type, bucket"""

  // ---------------------------------------------------------------
  // q143 — coverage-gap audit (sensor dropout / user churn): per
  // user, consecutive-event gaps over 24 h — count, longest gap, and
  // total uncovered time, from ONE lag window (one exchange + one
  // sort) and a conditional aggregate. µs integers end to end; users
  // with no long gap report zeros (left join back to the user set).
  private val GapUs = 86400000000L // 24 h

  def q143(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tus", "event_id")
    val gaps = t(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("gap") > GapUs, 1L).otherwise(0L)).as("n_gaps"),
        max(when(col("gap") > GapUs, col("gap"))).as("max_gap"),
        sum(when(col("gap") > GapUs, col("gap")).otherwise(lit(0L)))
          .as("uncovered_us"))
    gaps.select(col("user_id"), col("n_events"), col("n_gaps"),
        coalesce(col("max_gap"), lit(0L)).as("max_gap_us"),
        col("uncovered_us"))
      .orderBy("user_id")
  }

  val q143Sql: String =
    s"""WITH g AS (SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
         FROM events)
       SELECT user_id, count(*) AS n_events,
         CAST(sum(CASE WHEN gap > $GapUs THEN 1 ELSE 0 END) AS BIGINT)
           AS n_gaps,
         COALESCE(max(CASE WHEN gap > $GapUs THEN gap END), 0)
           AS max_gap_us,
         CAST(sum(CASE WHEN gap > $GapUs THEN gap ELSE 0 END) AS BIGINT)
           AS uncovered_us
       FROM g GROUP BY 1 ORDER BY user_id"""

  // ---------------------------------------------------------------
  // q144 — REAL FLAC decode (constant-subframe subset): 48 streams
  // whose rate/channels/bps/frame-count are closed-form in id are
  // fully verified (magic, STREAMINFO bit unpacking, per-frame sync
  // + header codes + CRC-8 + CRC-16) and their constant sample
  // values RECONSTRUCTED — value_sum is actual decoded PCM content,
  // not header metadata. The oracle replays the closed forms,
  // including the per-frame constant Σ_f ((id·31 + f·17) mod 200 −
  // 100) · channels, in SQL. All-integer outputs.
  private val FlacN = 48

  def q144(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.flacFixture(s, FlacN)
    graft.operators.Multimodal.decodeFlac(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("channels"), col("bps"),
        col("n_frames"), col("total_samples"), col("value_sum"),
        expr("(total_samples * 1000) div CAST(sample_rate AS BIGINT)")
          .as("dur_ms"),
        col("valid"))
      .orderBy("id")
  }

  val q144Sql: String =
    s"""WITH base AS (SELECT r, r % 3 AS ri, 1 + r % 2 AS ch,
           CASE WHEN r % 4 < 2 THEN 8 ELSE 16 END AS bps,
           3 + r % 7 AS nf
         FROM range(0, $FlacN) t(r))
       SELECT r AS id,
         CAST(CASE ri WHEN 0 THEN 32000 WHEN 1 THEN 44100
              ELSE 48000 END AS INT) AS sample_rate,
         CAST(ch AS INT) AS channels, CAST(bps AS INT) AS bps,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 4096 AS BIGINT) AS total_samples,
         CAST(ch * list_sum([(r * 31 + f * 17) % 200 - 100
           FOR f IN range(0, nf)]) AS BIGINT) AS value_sum,
         CAST(nf * 4096 * 1000 // CASE ri WHEN 0 THEN 32000
           WHEN 1 THEN 44100 ELSE 48000 END AS BIGINT) AS dur_ms,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q145 — REAL MP4/M4A moov walk (ISO-BMFF / MPEG-4 Part 12): 42
  // minimal-but-conforming M4A containers (ftyp + moov{mvhd,
  // trak{mdia{mdhd, hdlr, minf{stbl{stsd{mp4a}}}}}} + mdat) whose
  // rate/channels/sample-count are closed-form in id, walked with
  // byte-exact box nesting, FullBox version checks and the 16.16
  // fixed-point sample-rate cross-check against the media timescale.
  // The catalog surface (timescales, durations, codec fourcc) comes
  // out as integers the oracle replays closed-form.
  private val Mp4N = 42

  def q145(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp4Fixture(s, Mp4N)
    graft.operators.Multimodal.decodeMp4(fx, "id", "media")
      .select(col("id"), col("brand"), col("codec"),
        col("movie_timescale"), col("movie_duration"), col("n_tracks"),
        col("sample_rate"), col("channels"), col("media_duration"),
        col("valid"))
      .orderBy("id")
  }

  val q145Sql: String =
    s"""WITH base AS (SELECT r,
           CASE r % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
             ELSE 48000 END AS rate,
           1 + r % 2 AS ch, 2 + r % 9 AS k
         FROM range(0, $Mp4N) t(r)),
       p AS (SELECT r, rate, ch, rate * k // 2 AS nsamp FROM base)
       SELECT r AS id, 'M4A ' AS brand, 'mp4a' AS codec,
         CAST(1000 AS INT) AS movie_timescale,
         CAST(nsamp * 1000 // rate AS BIGINT) AS movie_duration,
         CAST(1 AS INT) AS n_tracks,
         CAST(rate AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
         CAST(nsamp AS BIGINT) AS media_duration,
         true AS valid
       FROM p ORDER BY id"""

  // ---------------------------------------------------------------
  // q146 — REAL animated-GIF multi-frame decode (GIF89a via the JDK's
  // ImageIO): 36 animations whose dims/frame-count/pixels/delays are
  // closed-form in id, written over a fixed 256-gray indexed palette
  // (so the palette storage round-trips pixels EXACTLY), decoded
  // frame by frame — pixel_sum is actual decoded sample content, and
  // total_delay_cs comes from each frame's GraphicControlExtension.
  // The oracle replays the triple pixel sum and delay sum in SQL.
  private val GifN = 36

  def q146(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.gifFixture(s, GifN)
    graft.operators.Multimodal.decodeGif(fx, "id", "media")
      .select(col("id"), col("width"), col("height"), col("n_frames"),
        col("pixel_sum"), col("total_delay_cs"),
        (col("total_delay_cs") * 10).as("dur_ms"), col("valid"))
      .orderBy("id")
  }

  val q146Sql: String =
    s"""WITH base AS (SELECT r, 2 + r % 5 AS nf FROM range(0, $GifN) t(r))
       SELECT r AS id, CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
         CAST(nf AS INT) AS n_frames,
         CAST(list_sum([list_sum([list_sum([
             (r * 7 + f * 13 + x * 3 + y) % 256
           FOR y IN range(0, 6)]) FOR x IN range(0, 8)])
           FOR f IN range(0, nf)]) AS BIGINT) AS pixel_sum,
         CAST(list_sum([5 + (r + f) % 10 FOR f IN range(0, nf)])
           AS BIGINT) AS total_delay_cs,
         CAST(list_sum([5 + (r + f) % 10 FOR f IN range(0, nf)]) * 10
           AS BIGINT) AS dur_ms,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q147 — REAL MJPEG-in-AVI video decode (RIFF AVI 1.0): 40
  // containers whose dims/fps/frame-count/per-frame gray are
  // closed-form in id, walked chunk-by-chunk (hdrl: avih + strh/strf
  // cross-checks; movi: every '00dc' frame decoded through the JDK's
  // real JPEG codec). Frames are solid-gray JPEGs written at
  // compression quality 1.0, where the quantization tables
  // degenerate to all-ones and decode is bit-exact (spec-gated for
  // all 256 grays) — so pixel_sum is actual decoded R,G,B sample
  // content the oracle replays closed-form, the q146 trick for the
  // lossy codec. Closes the video-decode stub (r10 VERDICT #4).
  private val AviN = 40

  def q147(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.aviFixture(s, AviN)
    graft.operators.Multimodal.decodeAvi(fx, "id", "media")
      .select(col("id"), col("width"), col("height"), col("n_frames"),
        col("usec_per_frame"), col("dur_ms"), col("pixel_sum"),
        col("valid"))
      .orderBy("id")
  }

  val q147Sql: String =
    s"""WITH base AS (SELECT r, 12 + r % 8 AS w, 8 + r % 5 AS h,
           2 + r % 4 AS nf, 10 + r % 15 AS rate
         FROM range(0, $AviN) t(r))
       SELECT r AS id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         CAST(nf AS INT) AS n_frames,
         CAST(1000000 // rate AS BIGINT) AS usec_per_frame,
         CAST(nf * 1000 // rate AS BIGINT) AS dur_ms,
         CAST(3 * w * h * list_sum([(r * 11 + f * 29) % 256
           FOR f IN range(0, nf)]) AS BIGINT) AS pixel_sum,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q148 — FLAC bit-exact PCM decode (fixed-predictor subset, RFC
  // 9639 §9.2.2): 44 streams cycling CONSTANT / VERBATIM / FIXED
  // order 0-4 subframes with 4-bit-Rice residuals, every sample
  // reconstructed through the predictor recurrences and summed —
  // value_sum is the sum of all 4096·nf·ch decoded samples, which
  // the oracle replays closed-form from the ramp-plus-wiggle sample
  // law (Σ per frame = 4096·c0 + 8386560·c1 + 2048·d). Extends
  // q144's constant-catalog subset per r10 VERDICT #5; LPC subframes
  // still reject (spec-gated).
  private val FlacPredN = 44

  def q148(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.flacPredFixture(s, FlacPredN)
    graft.operators.Multimodal.decodeFlacPcm(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("channels"), col("bps"),
        col("n_frames"), col("total_samples"), col("value_sum"),
        col("valid"))
      .orderBy("id")
  }

  val q148Sql: String =
    s"""WITH base AS (SELECT r, r % 3 AS ri, 1 + r % 2 AS ch,
           2 + r % 4 AS nf
         FROM range(0, $FlacPredN) t(r))
       SELECT r AS id,
         CAST(CASE ri WHEN 0 THEN 32000 WHEN 1 THEN 44100
              ELSE 48000 END AS INT) AS sample_rate,
         CAST(ch AS INT) AS channels, CAST(16 AS INT) AS bps,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 4096 AS BIGINT) AS total_samples,
         CAST(ch * list_sum([
             4096 * ((r * 31 + f * 17) % 50 - 25)
             + CASE WHEN (r + f) % 7 = 0 THEN 0
                 ELSE 8386560 * ((r * 13 + f * 7) % 7 - 3)
                      + 2048 * ((r + f) % 4) END
           FOR f IN range(0, nf)]) AS BIGINT) AS value_sum,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q149 — FLAC LPC PCM decode (RFC 9639 §9.2.4): 44 streams whose
  // every frame is an LPC subframe — orders 1-8, quantized 12-bit
  // coefficients, shifts 1-4, partitioned Rice residuals in both
  // parameter widths with escaped raw partitions — decoded sample by
  // sample through the real predictor recurrence. The fixture's
  // TARGET signal keeps q148's ramp-plus-wiggle law, so value_sum
  // replays closed-form no matter which predictor coded it (the
  // residuals, not the law, change per frame). Closes the r10
  // "missing" item 2 (LPC subframes flagged instead of decoding).
  private val FlacLpcN = 44

  def q149(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.flacLpcFixture(s, FlacLpcN)
    graft.operators.Multimodal.decodeFlacPcm(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("channels"), col("bps"),
        col("n_frames"), col("total_samples"), col("value_sum"),
        col("valid"))
      .orderBy("id")
  }

  val q149Sql: String =
    s"""WITH base AS (SELECT r, r % 3 AS ri, 1 + r % 2 AS ch,
           2 + r % 4 AS nf
         FROM range(0, $FlacLpcN) t(r))
       SELECT r AS id,
         CAST(CASE ri WHEN 0 THEN 32000 WHEN 1 THEN 44100
              ELSE 48000 END AS INT) AS sample_rate,
         CAST(ch AS INT) AS channels, CAST(16 AS INT) AS bps,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 4096 AS BIGINT) AS total_samples,
         CAST(ch * list_sum([
             4096 * ((r * 31 + f * 17) % 50 - 25)
             + 8386560 * ((r * 13 + f * 7) % 7 - 3)
             + 2048 * ((r + f) % 4)
           FOR f IN range(0, nf)]) AS BIGINT) AS value_sum,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q150 — FLAC stereo-decorrelation PCM decode (RFC 9639 §9.1.3):
  // 44 two-channel streams whose frames cycle independent /
  // left-side / right-side / mid-side channel assignments (the side
  // subframe one bit wider), with wasted-bits subframes on the
  // independent and left/side frames. Both channel laws are
  // closed-form ramps, so Σ(L+R) — what the decoder must reproduce
  // after undoing the decorrelation — replays exactly in SQL.
  private val FlacStereoN = 44

  def q150(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.flacStereoFixture(s, FlacStereoN)
    graft.operators.Multimodal.decodeFlacPcm(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("channels"), col("bps"),
        col("n_frames"), col("total_samples"), col("value_sum"),
        col("valid"))
      .orderBy("id")
  }

  val q150Sql: String =
    s"""WITH base AS (SELECT r, r % 3 AS ri, 2 + r % 4 AS nf
         FROM range(0, $FlacStereoN) t(r))
       SELECT r AS id,
         CAST(CASE ri WHEN 0 THEN 32000 WHEN 1 THEN 44100
              ELSE 48000 END AS INT) AS sample_rate,
         CAST(2 AS INT) AS channels, CAST(16 AS INT) AS bps,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 4096 AS BIGINT) AS total_samples,
         CAST(list_sum([
             (CASE WHEN f % 4 <= 1
                THEN CASE (r + f) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END
                ELSE 1 END)
             * (4096 * ((r * 31 + f * 17) % 50 - 25)
                + 8386560 * ((r * 13 + f * 7) % 3 - 1)
                + 2048 * ((r + f) % 4))
             + 4096 * ((r * 19 + f * 23) % 50 - 25)
             + 8386560 * ((r * 11 + f * 5) % 7 - 3)
             + 2048 * ((r + 2 * f) % 4)
           FOR f IN range(0, nf)]) AS BIGINT) AS value_sum,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q151 — IMA-ADPCM WAV decode (wFormatTag 0x11, the IMA DVI
  // algorithm): 40 REAL compressed-audio containers — fmt extension
  // with samplesPerBlock, fact chunk, per-block per-channel state
  // headers, interleaved 4-byte channel words — fully decoded
  // through the 89-entry step-size state machine. The fixture
  // supplies the nibble stream closed-form in id (the DECODER is the
  // operator; a quantizing encoder would make samples opaque), so
  // the oracle replays the identical state machine sample by sample:
  // step/index tables as SQL literals, one recursive-CTE chain per
  // (id, block, channel), both clamps exact. Any slip — table entry,
  // clamp bound, nibble order, word interleave, header-sample
  // accounting — shifts value_sum/min/max and fails the hash gate.
  // Corruption matrix (truncated/PCM-tagged/oversized-index/bad
  // fact) is spec-gated in MultimodalSpec.
  private val AdpcmN = 40

  def q151(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.adpcmFixture(s, AdpcmN)
    graft.operators.Multimodal.decodeAdpcm(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("channels"),
        col("samples_per_block"), col("n_blocks"), col("total_samples"),
        col("value_sum"), col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q151Sql: String =
    s"""WITH RECURSIVE base AS (
         SELECT r, 8000 + (r % 3) * 4000 AS rate, 1 + r % 2 AS ch,
                2 + r % 3 AS w, 2 + r % 4 AS nb
         FROM range(0, $AdpcmN) t(r)),
       hb AS ( -- range() can't take lateral params: unnest comprehensions
         SELECT r, ch, w, unnest([x for x in range(0, nb)]) AS b FROM base),
       hc AS (
         SELECT r, ch, w, b, unnest([x for x in range(0, ch)]) AS c FROM hb),
       heads AS (
         SELECT r, ch, w, b, c,
                ((r * 31 + b * 17 + c * 29) % 4001) - 2000 AS p0,
                (r * 7 + b * 3 + c * 5) % 89 AS i0
         FROM hc),
       dec(r, b, c, j, pred, idx, nmax) AS (
         SELECT r, b, c, 0, p0, i0, 8 * w FROM heads
         UNION ALL
         SELECT r, b, c, j + 1,
           CASE WHEN nib >= 8 THEN greatest(pred - diff, -32768)
                ELSE least(pred + diff, 32767) END,
           least(greatest(idx + ([-1,-1,-1,-1,2,4,6,8])[(nib % 8) + 1], 0), 88),
           nmax
         FROM (
           SELECT r, b, c, j, pred, idx, nmax, nib, step,
             (step // 8)
               + CASE WHEN nib % 8 >= 4 THEN step ELSE 0 END
               + CASE WHEN nib % 4 >= 2 THEN step // 2 ELSE 0 END
               + CASE WHEN nib % 2 = 1 THEN step // 4 ELSE 0 END AS diff
           FROM (
             SELECT dec.*,
               (r * 13 + b * 7 + c * 3 + j * 5) % 16 AS nib,
               ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,
                 50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,
                 230,253,279,307,337,371,408,449,494,544,598,658,724,796,
                 876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,
                 2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,7132,
                 7845,8630,9493,10442,11487,12635,13899,15289,16818,18500,
                 20350,22385,24623,27086,29794,32767])[idx + 1] AS step
             FROM dec WHERE j < nmax)))
       SELECT base.r AS id,
         CAST(rate AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
         CAST(1 + 8 * w AS INT) AS samples_per_block,
         CAST(nb AS INT) AS n_blocks,
         CAST(ch * nb * (1 + 8 * w) AS BIGINT) AS total_samples,
         s.vsum AS value_sum, s.vmin AS min_sample, s.vmax AS max_sample,
         true AS valid
       FROM base JOIN (
         SELECT r, CAST(sum(pred) AS BIGINT) AS vsum,
                CAST(min(pred) AS INT) AS vmin, CAST(max(pred) AS INT) AS vmax
         FROM dec GROUP BY r) s ON base.r = s.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q152 — G.711 μ-law / A-law WAV decode (wFormatTag 7 / 6, the
  // ITU-T telephony companding laws): 40 real containers (even ids
  // μ-law, odd A-law), every byte decoded through the CCITT
  // reference formulas to linear PCM16. Stateless table decode, so
  // the oracle computes the SAME formula per byte in plain SQL (the
  // complement/xor, segment shift and bias arithmetic inline) and
  // aggregates — any slip in bias, segment handling or either sign
  // convention (μ-law sign bit set = negative AFTER complement;
  // A-law set = positive AFTER xor 0x55) fails the hash gate.
  private val G711N = 40

  def q152(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.g711Fixture(s, G711N)
    graft.operators.Multimodal.decodeG711(fx, "id", "media")
      .select(col("id"), col("codec"), col("sample_rate"), col("channels"),
        col("total_samples"), col("value_sum"), col("min_sample"),
        col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q152Sql: String =
    s"""WITH base AS (
         SELECT r, 8000 * (1 + r % 2) AS rate, 1 + r % 2 AS ch,
                40 + r % 25 AS frames
         FROM range(0, $G711N) t(r)),
       samp AS (
         SELECT r, unnest([
           CASE WHEN r % 2 = 0 THEN
             -- ulaw2linear(v), v = (r*11 + j*13) % 256: u = ~v;
             -- t = ((u&15)*8 + 132) << ((u>>4)&7); sign(u&128): 132-t
             CASE WHEN (255 - (r * 11 + j * 13) % 256) >= 128
               THEN 132 - ((((255 - (r * 11 + j * 13) % 256) % 16) * 8 + 132)
                           * (1 << ((255 - (r * 11 + j * 13) % 256) // 16 % 8)))
               ELSE ((((255 - (r * 11 + j * 13) % 256) % 16) * 8 + 132)
                     * (1 << ((255 - (r * 11 + j * 13) % 256) // 16 % 8))) - 132
             END
           ELSE
             -- alaw2linear(v): a = v ^ 85; seg = (a>>4)&7;
             -- t = seg=0 ? m*16+8 : seg=1 ? m*16+264 : (m*16+264)<<(seg-1);
             -- sign(a&128): positive
             CASE WHEN xor((r * 11 + j * 13) % 256, 85) >= 128 THEN 1 ELSE -1 END
             * CASE WHEN xor((r * 11 + j * 13) % 256, 85) // 16 % 8 = 0
                 THEN (xor((r * 11 + j * 13) % 256, 85) % 16) * 16 + 8
                 WHEN xor((r * 11 + j * 13) % 256, 85) // 16 % 8 = 1
                 THEN (xor((r * 11 + j * 13) % 256, 85) % 16) * 16 + 264
                 ELSE ((xor((r * 11 + j * 13) % 256, 85) % 16) * 16 + 264)
                      * (1 << (xor((r * 11 + j * 13) % 256, 85) // 16 % 8 - 1))
               END
           END
           FOR j IN range(0, frames * ch)]) AS v
         FROM base)
       SELECT base.r AS id,
         CASE WHEN base.r % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS codec,
         CAST(rate AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
         CAST(frames * ch AS BIGINT) AS total_samples,
         s.vsum AS value_sum, s.vmin AS min_sample, s.vmax AS max_sample,
         true AS valid
       FROM base JOIN (
         SELECT r, CAST(sum(v) AS BIGINT) AS vsum,
                CAST(min(v) AS INT) AS vmin, CAST(max(v) AS INT) AS vmax
         FROM samp GROUP BY r) s ON base.r = s.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q153 — URL canonicalization (the web-corpus dedup-key pass):
  // every doc gets a deterministically MESSY url (mixed-case scheme/
  // host, default and non-default ports, duplicate and trailing
  // slashes, tracking params out of order, a fragment), the engine
  // normalizes it with UrlOps.normalizeUrl (pure Column chain — no
  // UDF, stays in codegen), and docs sharing a canonical form are
  // counted (the URL-dedup group size). The oracle rebuilds the same
  // messy url and applies the IDENTICAL rule chain in SQL — every
  // rule (case, ports, slashes, fragment, tracking filter, param
  // sort) is exercised by some residue class, so a slipped rule
  // flips at least one url_norm and fails the hash gate.
  def q153(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    def ds(m: Int) = (d % m).cast("string")
    val url = concat(
      when(d % 3 === 0, lit("HTTP")).when(d % 3 === 1, lit("https"))
        .otherwise(lit("HtTpS")),
      lit("://WWW.Site"), ds(5), lit(".COM"),
      when(d % 4 === 0, lit(":443")).when(d % 4 === 1, lit(":80"))
        .when(d % 4 === 2, lit(":8080")).otherwise(lit("")),
      lit("//a"), ds(7), lit("/b//c"),
      when(d % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=x&z="), ds(3), lit("&a="), ds(2),
      lit("&gclid=foo#frag"), ds(2))
    val withUrl = Tables.load(s, dir, "documents")
      .select(col("doc_id")).withColumn("url", url)
    val norm = withUrl
      .withColumn("url_norm", graft.operators.UrlOps.normalizeUrl(col("url")))
      .withColumn("host", graft.operators.UrlOps.host(col("url")))
    // ≤ 420 distinct canonical urls (lcm of the residue moduli) —
    // the groups table is tiny at any corpus size, so the count
    // attach is a broadcast join, never a corpus shuffle
    val counts = norm.groupBy("url_norm").agg(count(lit(1)).as("n_same_norm"))
    norm.join(broadcast(counts), Seq("url_norm"))
      .select(col("doc_id"), col("url"), col("url_norm"), col("host"),
        col("n_same_norm"))
      .orderBy("doc_id")
  }

  val q153Sql: String =
    raw"""WITH u0 AS (
         SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
                ELSE 'HtTpS' END
           || '://WWW.Site' || (doc_id % 5) || '.COM'
           || CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
                   WHEN 2 THEN ':8080' ELSE '' END
           || '//a' || (doc_id % 7) || '/b//c'
           || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
           || '?utm_source=x&z=' || (doc_id % 3) || '&a=' || (doc_id % 2)
           || '&gclid=foo#frag' || (doc_id % 2) AS url
         FROM documents),
       n AS (
         SELECT doc_id, url,
           lower(regexp_extract(url, '^([^:/?#]+)://', 1)) AS sch,
           regexp_replace(regexp_replace(
             lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
             ':[0-9]*$$', ''), '^www\.', '') AS host,
           regexp_extract(
             lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
             ':([0-9]+)$$', 1) AS port,
           regexp_replace(regexp_replace(
             regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1),
             '/{2,}', '/', 'g'), '/+$$', '') AS path,
           array_to_string(list_sort(list_filter(
             string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
             p -> p != '' AND NOT regexp_matches(p,
               '^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)(=|$$)'))), '&') AS q
         FROM u0),
       m AS (
         SELECT doc_id, url,
           sch || '://' || host
           || CASE WHEN port != '' AND NOT (sch = 'http' AND port = '80')
                    AND NOT (sch = 'https' AND port = '443')
                   THEN ':' || port ELSE '' END
           || path
           || CASE WHEN q != '' THEN '?' || q ELSE '' END AS url_norm,
           host
         FROM n)
       SELECT m.doc_id, m.url, m.url_norm, m.host, c.n_same_norm
       FROM m JOIN (SELECT url_norm, count(*) AS n_same_norm
                    FROM m GROUP BY 1) c USING (url_norm)
       ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q154 — heterogeneous audio-lake catalog: 50 blobs mixing five
  // REAL audio containers (PCM WAV / IMA-ADPCM / G.711 / FLAC / MP3,
  // each reusing its own query's closed-form parameter law) routed
  // through Multimodal.audioCatalog's container-sniff dispatch to one
  // uniform metadata surface — the pass a 100 TB media lake runs
  // before any per-format work. The oracle recomputes every family's
  // metadata closed-form from the id; a mis-sniffed container or a
  // family handed to the wrong parser flips codec/rate/counts and
  // fails the hash gate. Per-format sample-level decode is gated by
  // q60/q151/q152/q148/q93 — this query gates the DISPATCH.
  private val LakeN = 50

  def q154(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.audioLakeFixture(s, LakeN)
    graft.operators.Multimodal.audioCatalog(fx, "id", "media")
      .select(col("id"), col("codec"), col("sample_rate"), col("channels"),
        col("total_samples"), col("valid"))
      .orderBy("id")
  }

  val q154Sql: String =
    s"""SELECT r AS id,
         CASE r % 5 WHEN 0 THEN 'pcm' WHEN 1 THEN 'adpcm'
              WHEN 2 THEN CASE WHEN r % 2 = 0 THEN 'ulaw' ELSE 'alaw' END
              WHEN 3 THEN 'flac' ELSE 'mp3' END AS codec,
         CAST(CASE r % 5
              WHEN 2 THEN 8000 * (1 + r % 2)
              WHEN 3 THEN CASE r % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
                               ELSE 48000 END
              WHEN 4 THEN CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                               ELSE 32000 END
              ELSE 8000 + (r % 3) * 4000 END AS INT) AS sample_rate,
         CAST(CASE WHEN r % 5 = 4 THEN 1 ELSE 1 + r % 2 END AS INT) AS channels,
         CAST(CASE r % 5
              WHEN 0 THEN (50 + r % 20) * (1 + r % 2)
              WHEN 1 THEN (2 + r % 4) * (1 + 8 * (2 + r % 3)) * (1 + r % 2)
              WHEN 2 THEN (40 + r % 25) * (1 + r % 2)
              WHEN 3 THEN (2 + r % 4) * 4096
              ELSE (10 + r % 30) * 1152 END AS BIGINT) AS total_samples,
         true AS valid
       FROM range(0, $LakeN) t(r) ORDER BY id"""

  // ---------------------------------------------------------------
  // q155 — MPEG-1 Audio Layer I payload decode (ISO/IEC 11172-3):
  // 42 REAL Layer I streams — sync/header walk, CRC-16 protection on
  // even ids, padding slots, mono/stereo/dual modes, per-subband
  // 4-bit allocations, 6-bit scalefactors, 12 granules of
  // offset-binary codes — decoded to the subband domain through the
  // conformant requantizer s'' = (2c − 2^nb + 2)/(2^nb − 1), scaled
  // by power-of-two scalefactors and rounded half-even to Q15
  // integers. The oracle replays the identical integer arithmetic
  // (shift/floor-mod/round-half-even inline) per sample; any slip —
  // allocation order, scalefactor law, offset-binary mapping,
  // requantizer constants, rounding parity — shifts value_sum or
  // min/max and fails the hash gate. CRC/corruption matrix (bad CRC,
  // alloc 15, scf 63, intensity-stereo mode, truncation) is
  // spec-gated in MultimodalSpec; the synthesis-window scope
  // boundary is documented at the operator.
  private val Mp1N = 42

  def q155(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp1Fixture(s, Mp1N)
    graft.operators.Multimodal.decodeMp1(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("value_sum"), col("min_sample"),
        col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q155Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE (r // 3) % 3 WHEN 0 THEN 1 ELSE 2 END AS ch,
           416 + 32 * (r % 2) AS kbps,
           2 + r % 4 AS nf, 5 + r % 4 AS na
         FROM range(0, $Mp1N) t(r)),
       jrow AS (
         SELECT r, rate, ch, kbps, nf, na,
                unnest([j for j in range(0, na)]) AS j FROM base),
       sbnb AS (
         SELECT r, ch, nf, j, (r + 3 * j) % 32 AS sb,
                2 + (3 * r + 5 * j) % 14 AS nb FROM jrow),
       frow AS (SELECT *, unnest([f for f in range(0, nf)]) AS f FROM sbnb),
       crow AS (SELECT *, unnest([c for c in range(0, ch)]) AS c FROM frow),
       grow AS (SELECT *, unnest([g for g in range(0, 12)]) AS g FROM crow),
       samp AS (
         SELECT r, nb, (r + sb + 7 * c + 2 * f) % 21 AS e,
           (r * 13 + f * 3 + g * 7 + sb * 5 + c * 11) % (1 << nb) AS code
         FROM grow),
       ab AS (
         SELECT r,
           CAST(2 * code - (1 << nb) + 2 AS BIGINT)
             * (CAST(1 AS BIGINT) << (36 - e)) AS a,
           ((CAST(1 AS BIGINT) << nb) - 1) * (CAST(1 AS BIGINT) << 20) AS b
         FROM samp),
       qv AS ( -- exact round-half-even of a/b: floor quotient + tie parity
         SELECT r, fq + CASE WHEN 2 * rp > b THEN 1
                             WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                             ELSE 0 END AS q
         FROM (SELECT r, b, ((a % b) + b) % b AS rp,
                      (a - (((a % b) + b) % b)) // b AS fq FROM ab))
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 384 * ch AS BIGINT) AS total_samples,
         CAST(nf * 12 * na * ch AS BIGINT) AS n_decoded,
         s.vsum AS value_sum, s.vmin AS min_sample, s.vmax AS max_sample,
         true AS valid
       FROM base JOIN (
         SELECT r, CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS INT) AS vmin, CAST(max(q) AS INT) AS vmax
         FROM qv GROUP BY r) s ON base.r = s.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q156 — MPEG-1 Audio Layer II payload decode (ISO/IEC 11172-3):
  // 42 REAL Layer II streams across both high-rate allocation tables
  // (3-B.2a at 48 kHz, 3-B.2b at 44.1/32 kHz), all class rows
  // including the GROUPED 3/5/9-level quantizers (5/7/10-bit words
  // degrouped by base-nlevels digits), all four scfsi scalefactor-
  // sharing patterns, CRC-16 over allocation+scfsi on even ids —
  // decoded to the subband domain through s'' = (2c − 2^nb + madd)/
  // nlevels (the exact rational form of Table 3-B.4's C·(s'''+D)),
  // scaled by power-of-two scalefactors and rounded half-even to
  // Q15. The oracle replays the allocation tables, the degrouped
  // code law, the scfsi part-sharing map and the integer rounding
  // per sample; any slip — a wrong table entry, group digit order,
  // scfsi expansion, madd constant — shifts value_sum or min/max
  // and fails the hash gate. Corruption/legality matrix is
  // spec-gated in MultimodalSpec.
  private val Mp2N = 42

  def q156(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp2Fixture(s, Mp2N)
    graft.operators.Multimodal.decodeMp2(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("value_sum"), col("min_sample"),
        col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q156Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE (r // 3) % 3 WHEN 0 THEN 1 ELSE 2 END AS ch,
           2 + r % 3 AS nf, 4 + r % 4 AS na
         FROM range(0, $Mp2N) t(r)),
       base2 AS (
         SELECT *, CASE WHEN ch = 1 THEN 192 ELSE 384 END AS kbps,
                CASE WHEN rate = 48000 THEN 27 ELSE 30 END AS sbl
         FROM base),
       jrow AS (
         SELECT r, ch, nf, sbl,
                unnest([j for j in range(0, na)]) AS j FROM base2),
       sbrow AS (SELECT r, ch, nf, j, (r + 7 * j) % sbl AS sb FROM jrow),
       nlrow AS ( -- Table 3-B.2a/b class rows (B.2b = B.2a + tail rows)
         SELECT r, ch, nf, j, sb,
           (CASE WHEN sb < 3 THEN [3,7,15,31,63,127,255,511,1023,
                                   2047,4095,8191,16383,32767,65535]
                 WHEN sb < 11 THEN [3,5,7,9,15,31,63,127,255,511,
                                    1023,2047,4095,8191,65535]
                 WHEN sb < 23 THEN [3,5,7,9,15,31,65535]
                 ELSE [3,5,65535] END)
           [1 + (3 * r + 5 * j) % (CASE WHEN sb < 11 THEN 15
                WHEN sb < 23 THEN 7 ELSE 3 END)] AS nlev
         FROM sbrow),
       nbrow AS (
         SELECT *,
           CASE nlev WHEN 3 THEN 2 WHEN 5 THEN 3 WHEN 9 THEN 4
             WHEN 7 THEN 3 WHEN 15 THEN 4 WHEN 31 THEN 5 WHEN 63 THEN 6
             WHEN 127 THEN 7 WHEN 255 THEN 8 WHEN 511 THEN 9
             WHEN 1023 THEN 10 WHEN 2047 THEN 11 WHEN 4095 THEN 12
             WHEN 8191 THEN 13 WHEN 16383 THEN 14 WHEN 32767 THEN 15
             ELSE 16 END AS nb,
           CASE nlev WHEN 3 THEN 2 WHEN 5 THEN 4 WHEN 9 THEN 8
             ELSE 2 END AS madd
         FROM nlrow),
       crow AS (SELECT *, unnest([c for c in range(0, ch)]) AS c FROM nbrow),
       scfr AS (SELECT *, (r + 2 * j + c) % 4 AS scfsi FROM crow),
       frow AS (SELECT *, unnest([f for f in range(0, nf)]) AS f FROM scfr),
       grow AS (SELECT *, unnest([g for g in range(0, 12)]) AS g FROM frow),
       erow AS ( -- scfsi part sharing: 0=(0,1,2) 1=(0,0,2) 2=(0,0,0) 3=(0,1,1)
         SELECT *, (r + sb + 7 * c + f + 2 *
           (CASE scfsi WHEN 0 THEN g // 4
                 WHEN 1 THEN (CASE WHEN g // 4 = 2 THEN 2 ELSE 0 END)
                 WHEN 2 THEN 0
                 ELSE (CASE WHEN g // 4 = 0 THEN 0 ELSE 1 END) END)) % 21 AS e
         FROM grow),
       krow AS (SELECT *, unnest([k for k in range(0, 3)]) AS k FROM erow),
       ab AS (
         SELECT r,
           CAST(2 * ((r * 13 + f * 3 + g * 7 + k * 17 + sb * 5 + c * 11)
                     % nlev) - (1 << nb) + madd AS BIGINT)
             * (CAST(1 AS BIGINT) << (36 - e)) AS a,
           CAST(nlev AS BIGINT) * (CAST(1 AS BIGINT) << 20) AS b
         FROM krow),
       qv AS ( -- exact round-half-even of a/b: floor quotient + tie parity
         SELECT r, fq + CASE WHEN 2 * rp > b THEN 1
                             WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                             ELSE 0 END AS q
         FROM (SELECT r, b, ((a % b) + b) % b AS rp,
                      (a - (((a % b) + b) % b)) // b AS fq FROM ab))
       SELECT base2.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         CAST(nf * na * ch * 36 AS BIGINT) AS n_decoded,
         s.vsum AS value_sum, s.vmin AS min_sample, s.vmax AS max_sample,
         true AS valid
       FROM base2 JOIN (
         SELECT r, CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS INT) AS vmin, CAST(max(q) AS INT) AS vmax
         FROM qv GROUP BY r) s ON base2.r = s.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q157 — web-archive (WARC / Common Crawl) extraction: 45 archive
  // blobs — per-record gzip members (REAL RFC 1952 walk: optional
  // FNAME/FEXTRA fields, REAL DEFLATE inflate through the JDK, CRC-32
  // AND ISIZE trailer verification) with every fifth blob a plain
  // uncompressed .warc — exploded to one row per WARC record with
  // strict ISO 28500 parsing (version line, mandatory headers, exact
  // Content-Length payload, CRLF CRLF terminator). The digit_sum
  // column is computed from the DECODED payload text, so any
  // decompression or record-framing slip shifts it and fails the
  // hash gate. Corruption matrix (bit-flipped DEFLATE, bad CRC, bad
  // ISIZE, truncation, missing terminator, bad version, bad date) is
  // spec-gated in WarcSpec.
  private val WarcN = 45

  def q157(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Warc.warcFixture(s, WarcN)
    graft.operators.Warc.extractWarc(fx, "id", "media")
      .select(col("id"), col("rec"), col("warc_type"), col("uri"),
        col("date_epoch"), col("content_length"), col("n_words"),
        col("digit_sum"), col("valid"))
      .orderBy("id", "rec")
  }

  val q157Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 3 + r % 4 AS nr FROM range(0, $WarcN) t(r)),
       recs AS (
         SELECT id, unnest([x for x in range(0, nr)]) AS rec FROM base),
       tok AS (SELECT id, rec, 10 + (id + rec) % 6 AS nt FROM recs),
       dig AS (
         SELECT id, rec,
           CAST(list_sum([(id * 7 + rec * 3 + k) % 10
                          for k in range(0, nt)]) AS BIGINT) AS digit_sum
         FROM tok)
       SELECT t.id, CAST(t.rec AS INT) AS rec,
         CASE t.rec % 2 WHEN 0 THEN 'conversion' ELSE 'metadata' END
           AS warc_type,
         'https://example.com/' || t.id || '/' || t.rec AS uri,
         CAST(1704067200 + t.id * 60 + t.rec AS BIGINT) AS date_epoch,
         CAST(3 * t.nt - 1 AS BIGINT) AS content_length,
         CAST(t.nt AS BIGINT) AS n_words,
         d.digit_sum, true AS valid
       FROM tok t JOIN dig d ON t.id = d.id AND t.rec = d.rec
       ORDER BY t.id, t.rec"""

  // ---------------------------------------------------------------
  // q158 — HTML → visible-text extraction (the codegen HtmlToText
  // kernel): 40 documents exercising the whole documented surface —
  // doctype, head/title, style+script elision WITH content (a script
  // whose string literal contains "<p>"), inline-vs-block tag
  // separation, quoted attributes holding '&' entities, comments
  // hiding markup, named + decimal + hex character references, nbsp
  // collapse. The oracle rebuilds the expected TEXT string
  // closed-form from the same laws, so the hash gate pins every
  // rule: a wrong block-tag set, a script leak, an entity slip or a
  // whitespace-collapse change all shift the string. Real-world
  // malformed-input behavior is spec-gated in HtmlToTextSpec.
  private val HtmlN = 40

  def q158(s: SparkSession, dir: String): DataFrame = {
    val rows = (0 until HtmlN).map { i =>
      val ni = 2 + i % 4
      val items = (0 until ni)
        .map(k => s"<li>item${(i + k) % 9}</li>").mkString
      val html =
        s"""<!DOCTYPE html><html><head><title>T$i</title>""" +
          """<style>body{color:#fff}</style>""" +
          """<script>var x = "<p>not text</p>";</script></head>""" +
          s"""<body><h1>Head $i</h1>""" +
          s"""<p>alpha&nbsp;beta &amp; gamma ${i * 3 % 7}</p>""" +
          s"""<div>seg <b>bold$i</b> tail """ +
          s"""<a href="/x?a=1&amp;b=2">link$i</a></div>""" +
          """<!-- hidden <p>comment</p> -->""" +
          s"""<ul>$items</ul>""" +
          s"""<p>&#65;&#x42;C row ${i % 5}</p></body></html>"""
      (i.toLong, html)
    }
    import s.implicits._
    rows.toDF("id", "html").repartition(4)
      .select(col("id"),
        graft.functions.HtmlToText.htmlToText(col("html")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_lines",
        (length(col("text")) -
          length(regexp_replace(col("text"), "\n", "")) + 1).cast("long"))
      .orderBy("id")
  }

  val q158Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 4 AS ni FROM range(0, $HtmlN) t(r)),
       txt AS (
         SELECT id,
           'T' || id || chr(10) ||
           'Head ' || id || chr(10) ||
           'alpha beta & gamma ' || (id * 3 % 7) || chr(10) ||
           'seg bold' || id || ' tail link' || id || chr(10) ||
           array_to_string([('item' || ((id + k) % 9))
                            for k in range(0, ni)], chr(10)) || chr(10) ||
           'ABC row ' || (id % 5) AS text
         FROM base)
       SELECT id, text,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(replace(text, chr(10), '')) + 1
              AS BIGINT) AS n_lines
       FROM txt ORDER BY id"""

  // ---------------------------------------------------------------
  // q159 — web-pipeline capstone: gzip WARC archive → strict HTTP
  // response-envelope parse (RFC 9112 framing: status line, headers,
  // Content-Length cross-check) → media-type filter (only 200
  // text/html pages survive; 404 text/plain misses and metadata
  // records are dropped by the PIPELINE, exercising the filter, not
  // the parser) → the codegen html_to_text kernel → per-page text
  // stats. The oracle rebuilds each page's extracted TEXT closed-form
  // from the fixture laws, so the hash gate spans the whole chain:
  // DEFLATE decode, WARC framing, HTTP headers, HTML rules and the
  // whitespace collapse — any slip anywhere shifts the string.
  private val WarcHttpN = 36

  def q159(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Warc.warcHttpFixture(s, WarcHttpN)
    graft.operators.Warc.extractWarcHttp(fx, "id", "media")
      .where(col("valid") && col("status") === 200 &&
        col("content_type") === "text/html")
      .select(col("id"), col("rec"), col("uri"),
        graft.functions.HtmlToText.htmlToText(col("body")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_words",
        size(split(col("text"), "[ \n]")).cast("long"))
      .orderBy("id", "rec")
  }

  val q159Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 3 AS nr
         FROM range(0, $WarcHttpN) t(r)),
       recs AS (
         SELECT id, unnest([x for x in range(0, nr)]) AS rec FROM base),
       pages AS ( -- the 200 text/html law rows (404s/metadata filtered)
         SELECT id, rec, 4 + (id + rec) % 5 AS nw FROM recs
         WHERE (id + rec) % 6 <> 5 AND (id + rec) % 4 <> 3),
       txt AS (
         SELECT id, rec, nw,
           'Page ' || id || '/' || rec || chr(10) ||
           'Doc ' || id || ' - ' || rec || chr(10) ||
           array_to_string([('t' || ((id * 5 + rec * 7 + k) % 10))
                            for k in range(0, nw)], ' ') || chr(10) ||
           'end ' || id AS text
         FROM pages)
       SELECT id, CAST(rec AS INT) AS rec,
         'https://crawl.example/' || id || '/' || rec AS uri,
         text, CAST(length(text) AS BIGINT) AS n_chars,
         CAST(nw + 8 AS BIGINT) AS n_words
       FROM txt ORDER BY id, rec"""

  // ---------------------------------------------------------------
  // q160 — boilerplate removal (the MainContent link-density kernel):
  // 40 pages each carrying a navigation bar (link-dominated → must
  // drop), 1-3 main paragraphs with one inline reference link each
  // (→ must survive), a sidebar link list (one-word blocks → drop)
  // and a two-word footer (→ drop). The oracle rebuilds the SURVIVING
  // text closed-form, so the hash gate pins the whole keep rule —
  // block segmentation, per-block link-char accounting, the integer
  // density threshold and the word floor. Threshold edge cases are
  // spec-gated in MainContentSpec.
  private val MainN = 40

  def q160(s: SparkSession, dir: String): DataFrame = {
    val rows = (0 until MainN).map { i =>
      val np = 1 + i % 3
      val paras = (0 until np).map { p =>
        val words = (0 until 4 + (i + p) % 3)
          .map(k => s"m${(i * 3 + p * 5 + k) % 10}").mkString(" ")
        s"""<p>$words see <a href="/r">ref${(i + p) % 7}</a> tail$p</p>"""
      }.mkString
      val html =
        """<html><body>""" +
          """<div><a href="/">home</a> <a href="/a">about</a> """ +
          """<a href="/c">contact us</a></div>""" +
          paras +
          """<ul>""" +
          (0 until 3).map(k => s"""<li><a href="/s">s$k</a></li>""").mkString +
          """</ul>""" +
          s"""<div>(c) $i</div></body></html>"""
      (i.toLong, html)
    }
    import s.implicits._
    rows.toDF("id", "html").repartition(4)
      .select(col("id"),
        graft.functions.MainContent.mainContent(col("html")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_lines",
        (length(col("text")) -
          length(regexp_replace(col("text"), "\n", "")) + 1).cast("long"))
      .orderBy("id")
  }

  val q160Sql: String =
    s"""WITH base AS (SELECT r AS id, 1 + r % 3 AS np FROM range(0, $MainN) t(r)),
       prow AS (SELECT id, np, unnest([p for p in range(0, np)]) AS p
                FROM base),
       lines AS (
         SELECT id, p,
           array_to_string([('m' || ((id * 3 + p * 5 + k) % 10))
                            for k in range(0, 4 + (id + p) % 3)], ' ')
           || ' see ref' || ((id + p) % 7) || ' tail' || p AS line
         FROM prow),
       txt AS (
         SELECT id, string_agg(line, chr(10) ORDER BY p) AS text
         FROM lines GROUP BY id)
       SELECT t.id, t.text,
         CAST(length(t.text) AS BIGINT) AS n_chars,
         CAST(b.np AS BIGINT) AS n_lines
       FROM txt t JOIN base b ON t.id = b.id
       ORDER BY t.id"""

  // ---------------------------------------------------------------
  // q161 — charset detection + decode (the byte→text step of web
  // ingestion): 40 buffers cycling BOM'd UTF-8 / UTF-16LE / UTF-16BE
  // / raw windows-1252 (0x80-0x9F-row characters, not valid UTF-8) /
  // BOM-less UTF-8 / BOM-less UTF-16LE / BOM-less UTF-16BE, each
  // decoded through the documented detection ladder (BOM → strict
  // NUL-parity UTF-16 sniff with reject-on-ambiguity → strict RFC
  // 3629 UTF-8 validation → strict cp1252). The BOM-less UTF-16LE
  // rows are the load-bearing part: their ASCII-majority bytes are
  // bytewise VALID UTF-8, so only the parity sniff keeps them from
  // decoding as NUL-riddled UTF-8. The oracle states each row's
  // expected charset and exact decoded text as literals, so the hash
  // gate pins BOM handling, the sniff, the validator and the
  // fallback mapping. Malformed-payload rejects (BOM + truncated
  // sequence, odd UTF-16 length, unpaired surrogates, ambiguous
  // parity, undefined cp1252 bytes) are spec-gated.
  private val CharsetN = 40

  def q161(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TextCharset.charsetFixture(s, CharsetN)
    graft.operators.TextCharset.decodeText(fx, "id", "media")
      .select(col("id"), col("charset"), col("text"), col("n_chars"),
        col("valid"))
      .orderBy("id")
  }

  val q161Sql: String =
    s"""SELECT id, charset, text,
         CAST(length(text) AS BIGINT) AS n_chars, true AS valid
       FROM (
         SELECT r AS id,
           CASE r % 7 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                WHEN 2 THEN 'utf-16be' WHEN 3 THEN 'windows-1252'
                WHEN 4 THEN 'utf-8' WHEN 5 THEN 'utf-16le'
                ELSE 'utf-16be' END AS charset,
           CASE r % 7
             WHEN 0 THEN 'café € menu ' || r
             WHEN 1 THEN '日本語 text ' || r
             WHEN 2 THEN 'snowman ☃ row ' || r
             WHEN 3 THEN 'quote “w' || r || '” dash – eur €'
             WHEN 4 THEN 'plain ascii line ' || r
             WHEN 5 THEN 'win export ' || r || ' é☃'
             ELSE 'be dump ' || r || ' Ω' END AS text
         FROM range(0, $CharsetN) t(r))
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q162 — robots.txt crawl-policy evaluation (RFC 9309): 8 hosts —
  // even ones carry a graftbot-specific group (which must SHADOW the
  // `*` group), odd ones only `*` — each also carrying an `other`
  // group with `Disallow: /` that must never apply (its leakage
  // would flip half the table). Wildcard, end-anchor, longest-match
  // and allow-wins-ties all exercised. The ORACLE is an independent
  // relational implementation of the same RFC semantics (rules UNION
  // + regexp match + the 2·plen+allow score max), not a hardcoded
  // truth table. Parser/group-selection edge cases are spec-gated in
  // RobotsSpec.
  def q162(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hosts = (0 until 8).map { j =>
      val robots =
        if (j % 2 == 0)
          s"""# policy $j
             |User-agent: graftbot
             |Disallow: /private
             |Allow: /private/pub$j
             |
             |User-agent: other
             |Disallow: /
             |
             |User-agent: *
             |Disallow: /tmp*
             |""".stripMargin
        else
          s"""User-agent: other
             |Disallow: /
             |
             |User-agent: *
             |Disallow: /tmp*
             |Allow: /tmp/keep$j$$
             |Disallow: /a*/b$j
             |Disallow:
             |Sitemap: https://h$j.example/sitemap.xml
             |""".stripMargin
      (s"h$j.example", robots)
    }.toDF("host", "robots_txt")
    val urls = (0 until 8).flatMap { j =>
      Seq(s"/private/pub$j/x", "/private/secret", s"/tmp/keep$j",
        s"/tmp/keep$j/more", s"/a${j}x/b${j}z", s"/ok/page$j")
        .map(p => (s"h$j.example", p))
    }.toDF("host", "path").repartition(4)
    graft.operators.Robots.robotsFilter(urls, hosts, "graftbot")
      .orderBy("host", "path")
  }

  val q162Sql: String =
    """WITH hosts AS (
         SELECT r AS j, 'h' || r || '.example' AS host, r % 2 AS kind
         FROM range(0, 8) t(r)),
       rules AS (
         SELECT host, '^/private' AS re, 8 AS plen, 0 AS al
           FROM hosts WHERE kind = 0
         UNION ALL SELECT host, '^/private/pub' || j, 13, 1
           FROM hosts WHERE kind = 0
         UNION ALL SELECT host, '^/tmp', 5, 0 FROM hosts WHERE kind = 1
         UNION ALL SELECT host, '^/tmp/keep' || j || '$', 11, 1
           FROM hosts WHERE kind = 1
         UNION ALL SELECT host, '^/a.*/b' || j, 6, 0
           FROM hosts WHERE kind = 1),
       urls AS (
         SELECT host, unnest([
           '/private/pub' || j || '/x', '/private/secret',
           '/tmp/keep' || j, '/tmp/keep' || j || '/more',
           '/a' || j || 'x/b' || j || 'z', '/ok/page' || j]) AS path
         FROM hosts),
       m AS (
         SELECT u.host, u.path,
           max(CASE WHEN regexp_matches(u.path, r.re)
               THEN r.plen * 2 + r.al END) AS best
         FROM urls u LEFT JOIN rules r ON u.host = r.host
         GROUP BY u.host, u.path)
       SELECT host, path, (best IS NULL OR best % 2 = 1) AS allowed
       FROM m ORDER BY host, path"""

  // ---------------------------------------------------------------
  // q163 — Unicode normalization (UAX #15): 36 strings cycling
  // decomposed vs precomposed accents, combining rings, ligatures /
  // circled digits / full-width forms and strip-immune letters
  // (ø ß 中). The NFC and accent-strip columns are checked against
  // DuckDB's INDEPENDENT implementation (utf8proc's nfc_normalize /
  // strip_accents vs the JDK Normalizer — two unrelated codebases
  // implementing the same Unicode algorithm must agree byte for
  // byte); NFKC (absent in DuckDB) is pinned by the fixture law.
  private val UniN = 36

  def q163(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = (0 until UniN).map { i =>
      val raw = (i % 6) match {
        case 0 => s"cafe\u0301 menu $i"  // decomposed e + combining acute
        case 1 => s"caf\u00e9 latte $i"  // precomposed \u00e9
        case 2 => s"A\u030a ring $i"     // A + combining ring above
        case 3 => s"\ufb01ne \ufb02ow \u2460 $i" // fi fl ligatures + circled 1
        case 4 => s"\uff26\uff57\u3000\uff15 w $i" // full-width F w SPACE 5
        case _ => s"na\u00efve \u00d1 \u00f8 \u00df \u4e2d $i"
      }
      (i.toLong, raw)
    }
    rows.toDF("id", "raw").repartition(4)
      .select(col("id"), col("raw"),
        graft.functions.UnicodeNorm.nfc(col("raw")).as("nfc"),
        graft.functions.UnicodeNorm.nfkc(col("raw")).as("nfkc"),
        graft.functions.UnicodeNorm.stripAccents(col("raw")).as("stripped"))
      .withColumn("len_raw", length(col("raw")).cast("long"))
      .withColumn("len_nfc", length(col("nfc")).cast("long"))
      .orderBy("id")
  }

  val q163Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           CASE r % 6
             WHEN 0 THEN 'caf' || 'e' || chr(769) || ' menu ' || r
             WHEN 1 THEN 'café latte ' || r
             WHEN 2 THEN 'A' || chr(778) || ' ring ' || r
             WHEN 3 THEN 'ﬁne ﬂow ① ' || r
             WHEN 4 THEN 'Ｆｗ' || chr(12288) || '５ w ' || r
             ELSE 'naïve Ñ ø ß 中 ' || r END AS raw
         FROM range(0, $UniN) t(r))
       SELECT id, raw,
         nfc_normalize(raw) AS nfc,
         CASE id % 6
           WHEN 3 THEN 'fine flow 1 ' || id
           WHEN 4 THEN 'Fw 5 w ' || id
           ELSE nfc_normalize(raw) END AS nfkc,
         strip_accents(raw) AS stripped,
         CAST(length(raw) AS BIGINT) AS len_raw,
         CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q164 — ZIP archive extraction (PKWARE APPNOTE): 40 archives
  // built by the JDK's OWN ZipOutputStream (an independent encoder),
  // parsed by the spec-written central-directory walk — EOCD
  // backwards search through archive comments, local-header name
  // cross-check, STORED + DEFLATE (raw Inflater) with CRC-32 and
  // exact-size verification on every payload, data-descriptor
  // streams read from the authoritative central sizes. Stats come
  // from the DECOMPRESSED text, so the hash gate spans the whole
  // container chain. Corruption matrix is spec-gated in ZipLakeSpec.
  private val ZipN = 40

  def q164(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ZipLake.zipFixture(s, ZipN)
    graft.operators.ZipLake.extractZip(fx, "id", "media")
      .select(col("id"), col("entry"), col("name"), col("method"),
        col("uncomp_size"), col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "entry")
  }

  val q164Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 4 AS ne FROM range(0, $ZipN) t(r)),
       ent AS (
         SELECT id, unnest([k for k in range(0, ne)]) AS k FROM base),
       tok AS (SELECT id, k, 8 + (id + k) % 5 AS nt FROM ent),
       dig AS (
         SELECT id, k,
           CAST(list_sum([(id * 7 + k * 3 + j) % 10
                          for j in range(0, nt)]) AS BIGINT) AS digit_sum
         FROM tok)
       SELECT t.id, CAST(t.k AS INT) AS entry,
         'doc_' || t.id || '_' || t.k || '.txt' AS name,
         CASE t.k % 2 WHEN 0 THEN 'deflate' ELSE 'stored' END AS method,
         CAST(3 * t.nt - 1 AS BIGINT) AS uncomp_size,
         CAST(t.nt AS BIGINT) AS n_words, d.digit_sum, true AS valid
       FROM tok t JOIN dig d ON t.id = d.id AND t.k = d.k
       ORDER BY t.id, t.k"""

  // ---------------------------------------------------------------
  // q165 — TAR bundle extraction (POSIX ustar + pax + GNU longname):
  // 40 bundles, each a leading directory entry plus 3-6 file entries.
  // The WIRE encoding routes by bundle index while the decoded laws
  // stay identical (the oracle is format-blind): i%4==0|2 POSIX with
  // prefix[155]-split paths, i%4==1 old-GNU magic (`ustar  \0`) with
  // 'L' longname records, i%4==3 pax with a 'g' global header and
  // per-entry 'x' records whose path/size/mtime OVERRIDE a truncated
  // name, a zeroed size field and a zero mtime (pax mtime carries a
  // fractional part that must floor) — the overrides are load-bearing.
  // Every second bundle is a REAL .tar.gz (single RFC 1952 member,
  // CRC-32 + ISIZE verified, FNAME header field present). Header
  // checksums, strict octal fields, pax record framing, zero-block
  // termination and zero payload padding are all enforced; stats come
  // from the EXTRACTED text so the hash gate spans the gzip + tar
  // chain. Corruption + pax strictness matrices are spec-gated in
  // TarLakeSpec.
  private val TarN = 40

  def q165(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TarLake.tarFixture(s, TarN)
    graft.operators.TarLake.extractTar(fx, "id", "media")
      .select(col("id"), col("entry"), col("name"), col("typeflag"),
        col("size"), col("mtime_epoch"), col("n_words"),
        col("digit_sum"), col("valid"))
      .orderBy("id", "entry")
  }

  val q165Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 4 AS ne FROM range(0, $TarN) t(r)),
       ent AS (
         SELECT id, unnest([k for k in range(0, ne + 1)]) AS e FROM base),
       tok AS (SELECT id, e, 8 + (id + e - 1) % 5 AS nt
               FROM ent WHERE e > 0),
       dig AS (
         SELECT id, e,
           CAST(list_sum([(id * 7 + (e - 1) * 3 + j) % 10
                          for j in range(0, nt)]) AS BIGINT) AS digit_sum
         FROM tok)
       SELECT n.id, CAST(n.e AS INT) AS entry,
         CASE WHEN n.e = 0 THEN 'd' || n.id || '/'
              ELSE 'd' || n.id || '/f_' || n.id || '_' || (n.e - 1) || '.txt'
         END AS name,
         CASE WHEN n.e = 0 THEN 'dir' ELSE 'file' END AS typeflag,
         CASE WHEN n.e = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(3 * t.nt - 1 AS BIGINT) END AS size,
         CAST(1704067200 + n.id * 60 + n.e - 1 AS BIGINT) AS mtime_epoch,
         CASE WHEN n.e = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(t.nt AS BIGINT) END AS n_words,
         CASE WHEN n.e = 0 THEN CAST(0 AS BIGINT)
              ELSE d.digit_sum END AS digit_sum,
         true AS valid
       FROM ent n
       LEFT JOIN tok t ON n.id = t.id AND n.e = t.e
       LEFT JOIN dig d ON n.id = d.id AND n.e = d.e
       ORDER BY n.id, n.e"""

  // ---------------------------------------------------------------
  // q166 — MIME e-mail (EML) extraction: 42 messages — RFC 5322
  // header framing (folding, required fields, strict date profile
  // with day-of-week agreement), multipart/mixed walk (preamble +
  // epilogue skipped, exact delimiter lines, closing delimiter
  // required) and REAL strict transfer decoding (7bit /
  // quoted-printable with soft breaks and uppercase-hex law /
  // base64 produced by the JDK's OWN MIME encoder). Stats come from
  // the DECODED part bodies — the '=' characters planted every
  // fourth token force QP escapes, so a decoder slip shifts
  // n_words/body_len and fails the hash gate. Corruption matrix is
  // spec-gated in MimeLakeSpec.
  private val EmlN = 42

  def q166(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.MimeLake.emlFixture(s, EmlN)
    graft.operators.MimeLake.extractEml(fx, "id", "media")
      .select(col("id"), col("part"), col("content_type"),
        col("encoding"), col("date_epoch"), col("body_len"),
        col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "part")
  }

  val q166Sql: String =
    s"""WITH base AS (
         SELECT r AS id,
           CASE r % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS np
         FROM range(0, $EmlN) t(r)),
       prt AS (
         SELECT id, unnest([k for k in range(0, np)]) AS k FROM base),
       tok AS (SELECT id, k, 8 + (id + k) % 5 AS nt FROM prt),
       dig AS (
         SELECT id, k,
           CAST(list_sum([(id * 7 + k * 3 + j) % 10
                          for j in range(0, nt)]) AS BIGINT) AS digit_sum
         FROM tok)
       SELECT t.id, CAST(t.k AS INT) AS part,
         'text/plain' AS content_type,
         CASE (t.id + t.k) % 3 WHEN 0 THEN '7bit'
              WHEN 1 THEN 'quoted-printable' ELSE 'base64'
         END AS encoding,
         CAST(1704067200 + t.id * 86400 + t.id * 61 AS BIGINT)
           AS date_epoch,
         CAST(3 * t.nt - 1 + t.nt // 4 AS BIGINT) AS body_len,
         CAST(t.nt AS BIGINT) AS n_words, d.digit_sum, true AS valid
       FROM tok t JOIN dig d ON t.id = d.id AND t.k = d.k
       ORDER BY t.id, t.k"""

  // ---------------------------------------------------------------
  // q167 — subtitle/caption extraction (SubRip + WebVTT): 40 files,
  // every second one WebVTT (cue identifiers on every third cue,
  // spec-key settings on every fourth, a NOTE comment block when
  // id % 3 == 0 — all of which must be recognized and NOT leak into
  // cue text), the rest SRT with strict 1,2,3,… indices. Timing laws
  // sweep nonzero hour/minute/second/millis fields through both
  // decimal-separator conventions (comma vs dot); odd (id+cue) cues
  // carry two-line text so the line assembly is exercised. The full
  // cue TEXT is an output column, so the hash gate spans BOM/UTF-8
  // decode, grammar framing and text-block assembly. Corruption
  // matrix is spec-gated in SubLakeSpec.
  private val SubN = 40

  def q167(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.SubLake.subFixture(s, SubN)
    graft.operators.SubLake.extractSubs(fx, "id", "media")
      .select(col("id"), col("cue"), col("kind"), col("ident"),
        col("start_ms"), col("end_ms"), col("text"), col("n_lines"),
        col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "cue")
  }

  val q167Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 4 AS nc FROM range(0, $SubN) t(r)),
       cue AS (SELECT id, unnest([k for k in range(0, nc)]) AS k FROM base),
       tok AS (
         SELECT id, k, 8 + (id + k) % 5 AS nt,
           ['t' || ((id * 7 + k * 3 + j) % 10)
            for j in range(0, 8 + (id + k) % 5)] AS toks
         FROM cue)
       SELECT id, CAST(k AS INT) AS cue,
         CASE WHEN id % 2 = 0 THEN 'srt' ELSE 'vtt' END AS kind,
         CASE WHEN id % 2 = 1 AND k % 3 = 1
              THEN 'c' || id || '_' || k END AS ident,
         CAST((id % 3) * 3600000 + id * 61000 + k * 4000
              + (id * 7 + k * 13) % 1000 AS BIGINT) AS start_ms,
         CAST((id % 3) * 3600000 + id * 61000 + k * 4000
              + (id * 7 + k * 13) % 1000
              + 1500 + 100 * ((id + k) % 5) AS BIGINT) AS end_ms,
         CASE WHEN (id + k) % 2 = 0 THEN array_to_string(toks, ' ')
              ELSE array_to_string(toks[1:5], ' ') || chr(10)
                   || array_to_string(toks[6:], ' ') END AS text,
         CAST(1 + (id + k) % 2 AS INT) AS n_lines,
         CAST(nt AS BIGINT) AS n_words,
         CAST(list_sum([(id * 7 + k * 3 + j) % 10
                        for j in range(0, nt)]) AS BIGINT) AS digit_sum,
         true AS valid
       FROM tok ORDER BY id, cue"""

  // ---------------------------------------------------------------
  // q168 — sitemap extraction (sitemaps.org over the strict XML
  // subset): 40 documents, every fifth a sitemap INDEX; lastmod
  // cycles date-only / full-UTC-datetime / absent so both W3C
  // datetime profiles hit the epoch law; changefreq on every third
  // entry, priority on every third (urlset only) sweeping the exact
  // ppm grammar incl. the 1.0 boundary. DOCTYPE/PI/entity strictness
  // (the XXE posture) is spec-gated in XmlLakeSpec.
  private val SmapN = 40

  def q168(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.XmlLake.sitemapFixture(s, SmapN)
    graft.operators.XmlLake.extractSitemap(fx, "id", "media")
      .select(col("id"), col("seq"), col("kind"), col("loc"),
        col("lastmod_epoch_s"), col("changefreq"), col("priority_ppm"),
        col("valid"))
      .orderBy("id", "seq")
  }

  val q168Sql: String =
    s"""WITH base AS (
         SELECT r AS id, 4 + r % 5 AS nu, r % 5 = 4 AS idx
         FROM range(0, $SmapN) t(r)),
       ent AS (SELECT id, idx, unnest([k for k in range(0, nu)]) AS k
               FROM base)
       SELECT id, CAST(k AS INT) AS seq,
         CASE WHEN idx THEN 'index' ELSE 'urlset' END AS kind,
         CASE WHEN idx
              THEN 'https://ex' || id || '.org/sitemap-' || k || '.xml'
              ELSE 'https://ex' || id || '.org/p/' || (id * 13 + k * 7) % 97
                   || '/page-' || k END AS loc,
         CAST(CASE
           WHEN (id + k) % 4 IN (0, 2) THEN
             CAST(make_date(2024, CAST(1 + (id + k) % 12 AS INT),
                  CAST(1 + (id * 3 + k) % 28 AS INT))
                  - DATE '1970-01-01' AS BIGINT) * 86400
           WHEN (id + k) % 4 = 1 THEN
             CAST(make_date(2024, CAST(1 + (id + k) % 12 AS INT),
                  CAST(1 + (id * 3 + k) % 28 AS INT))
                  - DATE '1970-01-01' AS BIGINT) * 86400
             + ((id + k) % 24) * 3600 + ((id * 5 + k) % 60) * 60
             + (k * 11) % 60
         END AS BIGINT) AS lastmod_epoch_s,
         CASE WHEN NOT idx AND k % 3 = 1 THEN
           ['always', 'hourly', 'daily', 'weekly', 'monthly', 'yearly',
            'never'][CAST((id + k) % 7 AS INT) + 1] END AS changefreq,
         CAST(CASE WHEN NOT idx AND k % 3 = 2 THEN
           CASE WHEN (id + k) % 9 = 0 THEN 1000000
                ELSE ((id + k) % 10) * 100000 END
         END AS BIGINT) AS priority_ppm,
         true AS valid
       FROM ent ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q169 — syndication-feed extraction (RSS 2.0 + Atom over the
  // strict XML subset): 40 feeds, odd ids Atom (RFC 3339 dates,
  // link-as-attribute), even ids RSS (pubDates rendered by the JDK's
  // OWN RFC_1123 formatter over three non-UTC offsets, day-of-week
  // verified on re-parse); titles plant a literal `&` so entity
  // decode is hash-gated; every third body rides a CDATA section.
  private val FeedN = 40

  def q169(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.XmlLake.feedFixture(s, FeedN)
    graft.operators.XmlLake.extractFeed(fx, "id", "media")
      .select(col("id"), col("item"), col("kind"), col("title"),
        col("link"), col("date_epoch"), col("n_words"),
        col("digit_sum"), col("valid"))
      .orderBy("id", "item")
  }

  val q169Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 4 AS ni FROM range(0, $FeedN) t(r)),
       it AS (SELECT id, unnest([k for k in range(0, ni)]) AS k FROM base),
       tok AS (SELECT id, k, 8 + (id + k) % 5 AS nt FROM it)
       SELECT id, CAST(k AS INT) AS item,
         CASE WHEN id % 2 = 1 THEN 'atom' ELSE 'rss' END AS kind,
         'Item ' || id || ' & ' || k AS title,
         'https://feed' || id || '.example.org/item/' || k AS link,
         CAST(1704067200 + id * 86400 + k * 3600 + (id * 7 + k * 13) % 60
              AS BIGINT) AS date_epoch,
         CAST(nt AS BIGINT) AS n_words,
         CAST(list_sum([(id * 7 + k * 3 + j) % 10
                        for j in range(0, nt)]) AS BIGINT) AS digit_sum,
         true AS valid
       FROM tok ORDER BY id, item"""

  // ---------------------------------------------------------------
  // q170 — TFRecord + tf.Example decode (the canonical ML training-
  // data container): 40 shards, 3-6 examples each. Laws exercise the
  // whole wire surface: a NEGATIVE token every fourth example (the
  // 10-byte varint path), embeddings as exact eighths (×8 checksum is
  // integer in both engines), `label` absent every fifth example
  // (nullable projection), and map-entry order rotating per example
  // so decode order ≠ key order. Framing CRCs and the proto
  // strictness matrix are spec-gated in TfRecordLakeSpec.
  private val TfrN = 40

  def q170(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TfRecordLake.tfExampleFixture(s, TfrN)
    graft.operators.TfRecordLake.extractTfExamples(fx, "id", "media")
      .select(col("id"), col("rec"), col("n_feat"), col("text"),
        col("n_tokens"), col("tok_sum"), col("emb_dim"),
        col("emb_sum_x8"), col("label"), col("valid"))
      .orderBy("id", "rec")
  }

  val q170Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 4 AS nr FROM range(0, $TfrN) t(r)),
       recs AS (SELECT id, unnest([k for k in range(0, nr)]) AS k FROM base),
       law AS (SELECT id, k, 8 + (id + k) % 5 AS nt, 4 + (id + k) % 3 AS nk,
                      8 + (id % 3) * 4 AS d, (id + k) % 5 != 4 AS has_label
               FROM recs)
       SELECT id, CAST(k AS INT) AS rec,
         CAST(CASE WHEN has_label THEN 4 ELSE 3 END AS INT) AS n_feat,
         array_to_string(['w' || (id * 7 + k * 3 + j) % 10
                          for j in range(0, nt)], ' ') AS text,
         CAST(nk AS BIGINT) AS n_tokens,
         CAST(list_sum([CASE WHEN j = 0 AND (id + k) % 4 = 0
                             THEN -(id + k + 1)
                             ELSE (id * 5 + k * 11 + j * 3) % 1000 END
                        for j in range(0, nk)]) AS BIGINT) AS tok_sum,
         CAST(d AS INT) AS emb_dim,
         CAST(list_sum([(j * 3 + id + k) % 17
                        for j in range(0, d)]) AS BIGINT) AS emb_sum_x8,
         CAST(CASE WHEN has_label THEN (id + 2 * k) % 7 END AS BIGINT) AS label,
         true AS valid
       FROM law ORDER BY id, rec"""

  // ---------------------------------------------------------------
  // q171 — EPUB e-book extraction (OCF container + OPF package +
  // XHTML chapters): a COMPOSITION of the ZIP and XML parsers — 40
  // books, 2-4 chapters each, chapter text split across two <p> runs
  // plus an <em> so the markup-boundary whitespace law is hash-gated
  // via the text column; book titles plant `&`; a non-spine
  // stylesheet rides in manifest + container; languages cycle
  // en/fr/de. OCF/OPF strictness (mimetype-first-stored, zip-slip
  // paths, spine/manifest laws) is spec-gated in EpubLakeSpec.
  private val EpubN = 40

  def q171(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.EpubLake.epubFixture(s, EpubN)
    graft.operators.EpubLake.extractEpub(fx, "id", "media")
      .select(col("id"), col("seq"), col("href"), col("chapter_title"),
        col("book_title"), col("language"), col("text"),
        col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "seq")
  }

  val q171Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 3 AS nc FROM range(0, $EpubN) t(r)),
       ch AS (SELECT id, unnest([k for k in range(0, nc)]) AS k FROM base),
       tok AS (SELECT id, k, 8 + (id + k) % 5 AS nt FROM ch)
       SELECT id, CAST(k AS INT) AS seq,
         'ch_' || k || '.xhtml' AS href,
         'Chapter ' || id || '.' || k AS chapter_title,
         'Book ' || id || ' & co' AS book_title,
         ['en', 'fr', 'de'][CAST(id % 3 AS INT) + 1] AS language,
         array_to_string(['e' || (id * 7 + k * 3 + j) % 10
                          for j in range(0, nt)], ' ') AS text,
         CAST(nt AS BIGINT) AS n_words,
         CAST(list_sum([(id * 7 + k * 3 + j) % 10
                        for j in range(0, nt)]) AS BIGINT) AS digit_sum,
         true AS valid
       FROM tok ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q172 — MediaWiki dump + wikitext→plaintext (the Wikipedia side
  // of a pretraining corpus): 40 dumps, 2-4 pages of 1-2 sections.
  // Every construct the kernel owns leaves a known plaintext residue
  // (labeled + namespace-dropped links, nested templates every third
  // page, refs, emphasis, external links, list lines, headings), and
  // the full cleaned TEXT is an output column so the hash gate spans
  // entity decode → wikitext parse → whitespace law. Kernel
  // strictness (unclosed constructs, stray brackets, foreign HTML)
  // is spec-gated in WikiLakeSpec.
  private val WikiN = 40

  def q172(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.WikiLake.wikiFixture(s, WikiN)
    graft.operators.WikiLake.extractWiki(fx, "id", "media")
      .select(col("id"), col("page"), col("title"), col("ns"),
        col("page_id"), col("rev_epoch"), col("text"), col("n_words"),
        col("digit_sum"), col("n_links"), col("n_templates"),
        col("n_sections"), col("valid"))
      .orderBy("id", "page")
  }

  val q172Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 3 AS np FROM range(0, $WikiN) t(r)),
       pg AS (SELECT id, unnest([p for p in range(0, np)]) AS p FROM base),
       law AS (SELECT id, p, 1 + (id + p) % 2 AS nsec FROM pg)
       SELECT id, CAST(p AS INT) AS page,
         'Page ' || id || '.' || p || ' & co' AS title,
         CAST((p % 3) * 2 AS INT) AS ns,
         CAST(id * 100 + p AS BIGINT) AS page_id,
         CAST(1704067200 + id * 86400 + p * 3600 AS BIGINT) AS rev_epoch,
         array_to_string([
           'Sec ' || s || ' m' || (id * 3 + p * 5 + s * 7) % 10
             || ' m' || (id * 3 + p * 5 + s * 7 + 1) % 10
             || ' m' || (id * 3 + p * 5 + s * 7 + 2) % 10
             || ' L' || (id + p + s) % 7 || ' b' || (id + s) % 5
             || ' m' || (id * 3 + p * 5 + s * 7 + 3) % 10
             || ' x' || (p + s) % 9
             || ' m' || (id * 3 + p * 5 + s * 7 + 4) % 10
           for s in range(0, nsec)], ' ') AS text,
         CAST(nsec * 10 AS BIGINT) AS n_words,
         CAST(list_sum([s + (id * 3 + p * 5 + s * 7) % 10
             + (id * 3 + p * 5 + s * 7 + 1) % 10
             + (id * 3 + p * 5 + s * 7 + 2) % 10
             + (id + p + s) % 7 + (id + s) % 5
             + (id * 3 + p * 5 + s * 7 + 3) % 10 + (p + s) % 9
             + (id * 3 + p * 5 + s * 7 + 4) % 10
           for s in range(0, nsec)]) AS BIGINT) AS digit_sum,
         CAST(nsec + 1 AS INT) AS n_links,
         CAST(nsec AS INT) AS n_templates,
         CAST(nsec AS INT) AS n_sections,
         true AS valid
       FROM law ORDER BY id, page"""

  // ---------------------------------------------------------------
  // q173 — Jupyter notebook (.ipynb) extraction: 40 notebooks, 3-6
  // cells cycling code/markdown/raw, 1-3 source lines per cell with
  // the nbformat line-list `\n` convention; execution_count absent
  // on every fourth code cell (null-int path). Pure Catalyst
  // (from_json + posexplode_outer, no custom parser) — the schema
  // and invalid-blob laws are spec-gated in NotebookLakeSpec.
  private val NbN = 40

  def q173(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.NotebookLake.notebookFixture(s, NbN)
    graft.operators.NotebookLake.extractNotebooks(fx, "id", "media")
      .orderBy("id", "cell")
  }

  val q173Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 4 AS nc FROM range(0, $NbN) t(r)),
       c AS (SELECT id, unnest([k for k in range(0, nc)]) AS k FROM base),
       law AS (SELECT id, k,
                 ['code', 'markdown', 'raw'][CAST((id + k) % 3 AS INT) + 1] AS tpe,
                 1 + (id + k) % 3 AS nl FROM c)
       SELECT id, CAST(k AS INT) AS cell, tpe AS cell_type,
         CAST(CASE WHEN tpe = 'code' AND (id + k) % 4 != 1
              THEN k + 1 END AS INT) AS exec_count,
         CAST(nl AS INT) AS n_lines,
         array_to_string(['c' || id || '_' || k || '_' || j
                          || ' v' || (id * 5 + k * 3 + j) % 10
                          for j in range(0, nl)], chr(10)) AS source,
         CAST(length(array_to_string(['c' || id || '_' || k || '_' || j
                          || ' v' || (id * 5 + k * 3 + j) % 10
                          for j in range(0, nl)], chr(10))) AS BIGINT) AS n_chars,
         true AS valid
       FROM law ORDER BY id, cell"""

  // ---------------------------------------------------------------
  // q174 — PDF text extraction (ISO 32000 subset): 40 documents of
  // 1-4 pages; every second document's content streams are
  // FlateDecoded; page text exercises escaped parens, an octal
  // escape (\101 = 'A') and a TJ kerning array whose numbers must
  // vanish; titles carry escaped parens via the trailer /Info.
  // Xref/object/stream/operator strictness is spec-gated in
  // PdfLakeSpec.
  private val PdfN = 40

  def q174(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.PdfLake.pdfFixture(s, PdfN)
    graft.operators.PdfLake.extractPdf(fx, "id", "media")
      .select(col("id"), col("page"), col("title"), col("text"),
        col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "page")
  }

  val q174Sql: String =
    s"""WITH base AS (SELECT r AS id, 1 + r % 4 AS np FROM range(0, $PdfN) t(r)),
       pg AS (SELECT id, unnest([p for p in range(0, np)]) AS p FROM base)
       SELECT id, CAST(p AS INT) AS page,
         'Doc ' || id || ' (rev ' || id % 3 || ')' AS title,
         'Pg ' || p || ' d' || (id * 3 + p * 7) % 10
           || ' d' || (id * 3 + p * 7 + 1) % 10
           || ' (q' || (id * 3 + p * 7 + 2) % 10
           || ') Ax' || (id * 3 + p * 7 + 3) % 10
           || ' kern' || (id * 3 + p * 7 + 4) % 10
           || ' z' || (id * 3 + p * 7 + 5) % 10 AS text,
         CAST(8 AS BIGINT) AS n_words,
         CAST(p + (id * 3 + p * 7) % 10 + (id * 3 + p * 7 + 1) % 10
           + (id * 3 + p * 7 + 2) % 10 + (id * 3 + p * 7 + 3) % 10
           + (id * 3 + p * 7 + 4) % 10
           + (id * 3 + p * 7 + 5) % 10 AS BIGINT) AS digit_sum,
         true AS valid
       FROM pg ORDER BY id, page"""

  // ---------------------------------------------------------------
  // q175 — Markdown + YAML front matter (README/docs/blog corpora):
  // 40 documents, 1-3 sections of heading / bold-italic-code-link
  // paragraph / list / quote, a fenced code block on even sections
  // (EXCLUDED from prose, censused as the code/prose split); every
  // fourth document has no front matter (nullable projection).
  // Kernel strictness (unclosed fence/span, stray bracket, bad date,
  // duplicate keys) is spec-gated in MarkdownLakeSpec.
  private[queries] val MdN = 40

  def q175(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.MarkdownLake.markdownFixture(s, MdN)
    graft.operators.MarkdownLake.extractMarkdown(fx, "id", "media")
      .select(col("id"), col("title"), col("date_epoch"), col("n_tags"),
        col("text"), col("n_words"), col("digit_sum"), col("n_headings"),
        col("n_links"), col("n_code_blocks"), col("code_chars"),
        col("valid"))
      .orderBy("id")
  }

  val q175Sql: String =
    s"""WITH base AS (SELECT r AS id, 1 + r % 3 AS ns FROM range(0, $MdN) t(r))
       SELECT id,
         CASE WHEN id % 4 != 3 THEN 'Post ' || id || ' and co' END AS title,
         CAST(CASE WHEN id % 4 != 3 THEN
           CAST(make_date(2024, CAST(1 + id % 12 AS INT),
                CAST(1 + (id * 3) % 28 AS INT))
                - DATE '1970-01-01' AS BIGINT) * 86400 END AS BIGINT)
           AS date_epoch,
         CAST(CASE WHEN id % 4 != 3 THEN 2 END AS INT) AS n_tags,
         array_to_string(['H' || s || ' k' || (id + s) % 10
           || ' p' || (id * 7 + s * 3) % 10
           || ' p' || (id * 7 + s * 3 + 1) % 10
           || ' p' || (id * 7 + s * 3 + 2) % 10
           || ' p' || (id * 7 + s * 3 + 3) % 10
           || ' lk' || (id + s) % 8 || ' li' || (id + s) % 10
           || ' q' || (id + s) % 6
           for s in range(0, ns)], ' ') AS text,
         CAST(ns * 9 AS BIGINT) AS n_words,
         CAST(list_sum([s + (id + s) % 10 + (id * 7 + s * 3) % 10
           + (id * 7 + s * 3 + 1) % 10 + (id * 7 + s * 3 + 2) % 10
           + (id * 7 + s * 3 + 3) % 10 + (id + s) % 8 + (id + s) % 10
           + (id + s) % 6
           for s in range(0, ns)]) AS BIGINT) AS digit_sum,
         CAST(ns AS INT) AS n_headings,
         CAST(ns AS INT) AS n_links,
         CAST((ns + 1) // 2 AS INT) AS n_code_blocks,
         CAST(list_sum([CASE WHEN s % 2 = 0 THEN
             length('code_' || id || '_' || s || '()' || chr(10)
                    || 'x = ' || id)
             ELSE 0 END for s in range(0, ns)]) AS BIGINT) AS code_chars,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q176 — unified-diff / git-patch extraction (the commit side of a
  // code corpus): 40 patches × 1-3 files × 1-2 hunks; each hunk's
  // counts and the cross-hunk start arithmetic are REAL (the parser
  // verifies both); added-side text is assembled per file. Grammar/
  // arithmetic strictness is spec-gated in DiffLakeSpec.
  private val DiffN = 40

  def q176(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.DiffLake.diffFixture(s, DiffN)
    graft.operators.DiffLake.extractDiffs(fx, "id", "media")
      .select(col("id"), col("file"), col("path"), col("n_hunks"),
        col("n_added"), col("n_removed"), col("n_context"),
        col("added_text"), col("digit_sum"), col("valid"))
      .orderBy("id", "file")
  }

  val q176Sql: String =
    s"""WITH base AS (SELECT r AS id, 1 + r % 3 AS nf FROM range(0, $DiffN) t(r)),
       fl AS (SELECT id, unnest([f for f in range(0, nf)]) AS f FROM base),
       law AS (SELECT id, f, 1 + (id + f) % 2 AS nh FROM fl)
       SELECT id, CAST(f AS INT) AS file,
         'src/f' || id || '_' || f || '.scala' AS path,
         CAST(nh AS INT) AS n_hunks,
         CAST(list_sum([1 + (id + f + h) % 2
                        for h in range(0, nh)]) AS INT) AS n_added,
         CAST(nh AS INT) AS n_removed,
         CAST(nh * 2 AS INT) AS n_context,
         array_to_string([array_to_string(
             ['new a' || (id * 5 + f * 3 + h * 2 + j) % 10
               || ' b' || (id + f + h + j) % 7
              for j in range(0, 1 + (id + f + h) % 2)], chr(10))
           for h in range(0, nh)], chr(10)) AS added_text,
         CAST(list_sum([list_sum([(id * 5 + f * 3 + h * 2 + j) % 10
               + (id + f + h + j) % 7
              for j in range(0, 1 + (id + f + h) % 2)])
           for h in range(0, nh)]) AS BIGINT) AS digit_sum,
         true AS valid
       FROM law ORDER BY id, file"""

  // ---------------------------------------------------------------
  // q177 — LaTeX→plaintext (the arXiv side of a corpus): 40 sources,
  // 1-3 sections with emphasis/bold spans, a ~ tie, inline math and
  // (odd sections) display math — both EXCLUDED from prose and
  // censused as the math/prose split — dropped \cite keys, escaped
  // \&, itemize pairs, planted % comments; titles carry \&. Grammar
  // strictness is spec-gated in LatexLakeSpec.
  private val TexN = 40

  def q177(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.LatexLake.latexFixture(s, TexN)
    graft.operators.LatexLake.extractLatex(fx, "id", "media")
      .select(col("id"), col("title"), col("author"), col("text"),
        col("n_words"), col("digit_sum"), col("n_sections"),
        col("n_math"), col("math_chars"), col("n_cites"), col("valid"))
      .orderBy("id")
  }

  val q177Sql: String =
    s"""WITH base AS (SELECT r AS id, 1 + r % 3 AS ns FROM range(0, $TexN) t(r))
       SELECT id,
         'T' || id || ' & co' AS title,
         'A' || id % 7 AS author,
         array_to_string(['S' || s || ' h' || (id + s) % 10
           || ' w' || (id * 7 + s * 3) % 10
           || ' w' || (id * 7 + s * 3 + 1) % 10
           || ' w' || (id * 7 + s * 3 + 2) % 10
           || ' w' || (id * 7 + s * 3 + 3) % 10
           || ' e&f li' || (id + s) % 8 || ' lj' || (id + s) % 6
           for s in range(0, ns)], ' ') AS text,
         CAST(ns * 9 AS BIGINT) AS n_words,
         CAST(list_sum([s + (id + s) % 10 + (id * 7 + s * 3) % 10
           + (id * 7 + s * 3 + 1) % 10 + (id * 7 + s * 3 + 2) % 10
           + (id * 7 + s * 3 + 3) % 10 + (id + s) % 8 + (id + s) % 6
           for s in range(0, ns)]) AS BIGINT) AS digit_sum,
         CAST(ns AS INT) AS n_sections,
         CAST(ns + ns // 2 AS INT) AS n_math,
         CAST(ns * 5 + (ns // 2) * 4 AS BIGINT) AS math_chars,
         CAST(ns AS INT) AS n_cites,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q178 — ID3v2-tagged MP3 catalog: 40 files, even ids v2.3
  // (plain-BE frame sizes, TYER, encodings 0/1), odd ids v2.4
  // (SYNCSAFE sizes, TDRC, encodings 0/1/3); titles carry a ü that
  // must survive Latin-1, UTF-16 (both BOMs) and UTF-8; trailing
  // NUL terminators on every third frame; i%64 padding bytes; the
  // audio remainder is a real CBR Layer III stream whose census
  // rides the same row. Tag strictness is spec-gated in Id3LakeSpec.
  private val Id3N = 40

  def q178(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Id3Lake.taggedMp3Fixture(s, Id3N)
    graft.operators.Id3Lake.extractTagged(fx, "id", "media")
      .select(col("id"), col("ver"), col("title"), col("artist"),
        col("album"), col("year"), col("track"), col("genre"),
        col("n_tag_frames"), col("pad_bytes"), col("sample_rate"),
        col("bitrate_kbps"), col("n_audio_frames"), col("valid"))
      .orderBy("id")
  }

  val q178Sql: String =
    s"""SELECT r AS id,
         CAST(CASE WHEN r % 2 = 0 THEN 3 ELSE 4 END AS INT) AS ver,
         'Song ' || r || ' ü' || (r * 3) % 10 AS title,
         'Artist ' || r % 7 AS artist,
         'Al ' || r % 5 AS album,
         CAST(1990 + r % 30 AS INT) AS year,
         CAST(1 + r % 12 AS INT) AS track,
         'Genre' || r % 4 AS genre,
         CAST(6 AS INT) AS n_tag_frames,
         CAST(r % 64 AS INT) AS pad_bytes,
         CAST([44100, 48000, 32000][CAST(r % 3 AS INT) + 1] AS INT)
           AS sample_rate,
         CAST([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320][CAST(r % 14 AS INT) + 1] AS INT) AS bitrate_kbps,
         CAST(10 + r % 30 AS INT) AS n_audio_frames,
         true AS valid
       FROM range(0, $Id3N) t(r) ORDER BY id"""

  // ---------------------------------------------------------------
  // q179 — DOCX text extraction (OOXML wordprocessing subset over
  // the ZIP+XML composition): 40 documents, 2-4 paragraphs; every
  // paragraph splits a WORD across two runs — the run-concatenation
  // law is hash-gated via the text column — plus an entity, a w:br,
  // a Heading1 style on paragraph 0 and a trailing w:sectPr. OPC/
  // OOXML strictness is spec-gated in DocxLakeSpec.
  private val DocxN = 40

  def q179(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.DocxLake.docxFixture(s, DocxN)
    graft.operators.DocxLake.extractDocx(fx, "id", "media")
      .select(col("id"), col("text"), col("n_words"), col("digit_sum"),
        col("n_paras"), col("n_runs"), col("n_headings"), col("valid"))
      .orderBy("id")
  }

  val q179Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 3 AS np FROM range(0, $DocxN) t(r))
       SELECT id,
         array_to_string(['ha' || (id * 7 + p * 3) % 10
           || 'lf' || (id * 7 + p * 3 + 1) % 10
           || ' amp&' || (id * 7 + p * 3 + 2) % 10
           || ' tail' || (id * 7 + p * 3 + 3) % 10
           for p in range(0, np)], ' ') AS text,
         CAST(np * 3 AS BIGINT) AS n_words,
         CAST(list_sum([(id * 7 + p * 3) % 10 + (id * 7 + p * 3 + 1) % 10
           + (id * 7 + p * 3 + 2) % 10 + (id * 7 + p * 3 + 3) % 10
           for p in range(0, np)]) AS BIGINT) AS digit_sum,
         CAST(np AS INT) AS n_paras,
         CAST(np * 2 AS INT) AS n_runs,
         CAST(1 AS INT) AS n_headings,
         true AS valid
       FROM base ORDER BY id"""

  // ---------------------------------------------------------------
  // q180 — XLSX cell extraction (OOXML spreadsheet subset): 40
  // workbooks, 3-5 rows × A/B/C columns — A a shared string drawn
  // from a 3-value pool (the sst actually DEDUPs and both its count
  // laws are verified cross-part), B a signed integer, C a 2-decimal
  // price projected as an EXACT ×100 integer. OPC/sheet strictness
  // is spec-gated in XlsxLakeSpec.
  private val XlsxN = 40

  def q180(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.XlsxLake.xlsxFixture(s, XlsxN)
    graft.operators.XlsxLake.extractXlsx(fx, "id", "media")
      .select(col("id"), col("sheet"), col("row_idx"), col("col_idx"),
        col("kind"), col("sval"), col("nval_x100"), col("valid"))
      .orderBy("id", "row_idx", "col_idx")
  }

  val q180Sql: String =
    s"""WITH base AS (SELECT r0 AS id, 3 + r0 % 3 AS nr FROM range(0, $XlsxN) t(r0)),
       rws AS (SELECT id, unnest([r for r in range(1, nr + 1)]) AS rw FROM base),
       cells AS (SELECT id, rw, unnest([0, 1, 2]) AS cl FROM rws)
       SELECT id, 'S' || id % 4 AS sheet,
         CAST(rw AS INT) AS row_idx, CAST(cl AS INT) AS col_idx,
         CASE WHEN cl = 0 THEN 's' ELSE 'n' END AS kind,
         CASE WHEN cl = 0 THEN 'name' || (id + rw) % 3 END AS sval,
         CAST(CASE WHEN cl = 1 THEN
                (CASE WHEN (id + rw) % 4 = 0 THEN -1 ELSE 1 END)
                  * (id * 100 + rw * 7) * 100
              WHEN cl = 2 THEN id * 50 + rw * 13 END AS BIGINT) AS nval_x100,
         true AS valid
       FROM cells ORDER BY id, row_idx, col_idx"""

  // ---------------------------------------------------------------
  // q181 — FASTA/FASTQ extraction (genomics corpora): 40 files, even
  // ids FASTA with sequences split across two lines (the assembly
  // law), odd ids FASTQ with the separator repeating the name on odd
  // records; GC/N census and the exact integer Phred sum.
  // Format strictness is spec-gated in BioLakeSpec.
  private val BioN = 40

  def q181(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.BioLake.bioFixture(s, BioN)
    graft.operators.BioLake.extractBio(fx, "id", "media")
      .select(col("id"), col("rec"), col("fmt"), col("name"),
        col("length"), col("gc"), col("n_count"), col("qual_sum"),
        col("valid"))
      .orderBy("id", "rec")
  }

  val q181Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 3 AS nrec FROM range(0, $BioN) t(r)),
       recs AS (SELECT id, unnest([k for k in range(0, nrec)]) AS k FROM base),
       law AS (SELECT id, k, 20 + (id + k * 7) % 30 AS len FROM recs)
       SELECT id, CAST(k AS INT) AS rec,
         CASE WHEN id % 2 = 0 THEN 'fasta' ELSE 'fastq' END AS fmt,
         'seq_' || id || '_' || k AS name,
         CAST(len AS INT) AS length,
         CAST(list_sum([CASE WHEN (id * 3 + k * 5 + j) % 5 IN (1, 2)
                        THEN 1 ELSE 0 END
                        for j in range(0, len)]) AS INT) AS gc,
         CAST(list_sum([CASE WHEN (id * 3 + k * 5 + j) % 5 = 4
                        THEN 1 ELSE 0 END
                        for j in range(0, len)]) AS INT) AS n_count,
         CAST(CASE WHEN id % 2 = 1 THEN
           list_sum([(id + k + j) % 40 for j in range(0, len)])
           END AS BIGINT) AS qual_sum,
         true AS valid
       FROM law ORDER BY id, rec"""

  // ---------------------------------------------------------------
  // q182 — HTTP access-log parsing (Combined Log Format, pure
  // Catalyst: posexplode + regexp + try_to_timestamp, no custom
  // parser): 40 blobs × 4-7 lines with planted junk every seventh
  // line — the valid=false census flows through to the oracle —
  // and timestamps over three RFC 822 offsets that the ENGINE must
  // parse back (the oracle replays the epoch law closed-form).
  private val ClfN = 40

  def q182(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.AccessLog.logFixture(s, ClfN)
    graft.operators.AccessLog.extractLogs(fx, "id", "media")
      .orderBy("id", "line")
  }

  val q182Sql: String =
    s"""WITH base AS (SELECT r AS id, 4 + r % 4 AS nl FROM range(0, $ClfN) t(r)),
       ln AS (SELECT id, unnest([j for j in range(0, nl)]) AS j FROM base),
       law AS (SELECT id, j, (id + j) % 7 != 6 AS ok FROM ln)
       SELECT id, CAST(j AS INT) AS line,
         CASE WHEN ok THEN '10.' || id % 256 || '.' || j || '.'
                           || (id * 7 + j) % 250 END AS ip,
         CAST(CASE WHEN ok THEN 1704067200 + id * 3600 + j * 60
                                + (id * 7 + j) % 50 END AS BIGINT) AS epoch,
         CASE WHEN ok THEN
           ['GET', 'POST', 'HEAD'][CAST((id + j) % 3 AS INT) + 1] END AS method,
         CASE WHEN ok THEN '/p/' || id || '/' || j END AS path,
         CAST(CASE WHEN ok THEN
           [200, 301, 404, 500][CAST((id + j) % 4 AS INT) + 1] END AS INT)
           AS status,
         CAST(CASE WHEN ok THEN (id * 97 + j * 13) % 5000 END AS BIGINT)
           AS bytes,
         CASE WHEN ok THEN 'ua/' || id % 5 END AS ua,
         ok AS valid
       FROM law ORDER BY id, line"""

  // ---------------------------------------------------------------
  // q183 — gettext PO extraction (parallel translation pairs — the
  // aligned-corpus side of a multilingual mix): 40 catalogs, 3-5
  // entries; odd entries split their msgid across adjacent quoted
  // pieces (the concatenation law), every third msgstr plants \"
  // and \n escapes, every fourth entry is a 2-form plural; the
  // header's Language: is projected onto every row. Grammar
  // strictness is spec-gated in PoLakeSpec.
  private val PoN = 40

  def q183(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.PoLake.poFixture(s, PoN)
    graft.operators.PoLake.extractPo(fx, "id", "media")
      .select(col("id"), col("entry"), col("language"), col("msgid"),
        col("msgstr"), col("n_plural"), col("src_words"),
        col("tgt_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "entry")
  }

  val q183Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 3 AS ne FROM range(0, $PoN) t(r)),
       e AS (SELECT id, unnest([k for k in range(0, ne)]) AS k FROM base),
       law AS (SELECT id, k,
                 (id * 7 + k * 3) % 10 AS a0, (id * 7 + k * 3 + 1) % 10 AS a1,
                 (id * 7 + k * 3 + 2) % 10 AS a2, (id * 7 + k * 3 + 3) % 10 AS a3
               FROM e)
       SELECT id, CAST(k AS INT) AS entry,
         ['de', 'fr', 'ja', 'pt'][CAST(id % 4 AS INT) + 1] AS language,
         'source s' || a0 || ' s' || a1 || ' tail' AS msgid,
         CASE WHEN k % 3 = 2
              THEN 'ziel "t' || a2 || '"' || chr(10) || 't' || a3
              ELSE 'ziel t' || a2 || ' t' || a3 END AS msgstr,
         CAST(CASE WHEN k % 4 = 3 THEN 2 ELSE 0 END AS INT) AS n_plural,
         CAST(4 AS BIGINT) AS src_words,
         CAST(CASE WHEN k % 3 = 2 THEN 2 ELSE 3 END AS BIGINT) AS tgt_words,
         CAST(a2 + a3 AS BIGINT) AS digit_sum,
         true AS valid
       FROM law ORDER BY id, entry"""

  // ---------------------------------------------------------------
  // q184 — TMX translation-memory extraction (aligned pairs, the
  // other half of how parallel corpora ship): 40 memories × 3-5
  // translation units; `&` entities every third source, CDATA every
  // fourth target, tuids absent every fifth; the first tuv must
  // carry the header srclang (the alignment law). Dialect
  // strictness is spec-gated in TmxLakeSpec.
  private val TmxN = 40

  def q184(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.TmxLake.tmxFixture(s, TmxN)
    graft.operators.TmxLake.extractTmx(fx, "id", "media")
      .select(col("id"), col("tu"), col("tuid"), col("src_lang"),
        col("tgt_lang"), col("src_text"), col("tgt_text"),
        col("src_words"), col("tgt_words"), col("digit_sum"),
        col("valid"))
      .orderBy("id", "tu")
  }

  val q184Sql: String =
    s"""WITH base AS (SELECT r AS id, 3 + r % 3 AS nt FROM range(0, $TmxN) t(r)),
       e AS (SELECT id, unnest([k for k in range(0, nt)]) AS k FROM base),
       law AS (SELECT id, k,
                 (id * 7 + k * 3) % 10 AS a0, (id * 7 + k * 3 + 1) % 10 AS a1,
                 (id * 7 + k * 3 + 2) % 10 AS a2, (id * 7 + k * 3 + 3) % 10 AS a3
               FROM e)
       SELECT id, CAST(k AS INT) AS tu,
         CASE WHEN k % 5 != 4 THEN 'u' || id || '_' || k END AS tuid,
         'en' AS src_lang,
         ['de', 'fr', 'ja'][CAST(id % 3 AS INT) + 1] AS tgt_lang,
         's' || a0 || CASE WHEN k % 3 = 2 THEN ' & ' ELSE ' and ' END
           || 's' || a1 AS src_text,
         'z' || a2 || ' zz z' || a3 AS tgt_text,
         CAST(3 AS BIGINT) AS src_words,
         CAST(3 AS BIGINT) AS tgt_words,
         CAST(a2 + a3 AS BIGINT) AS digit_sum,
         true AS valid
       FROM law ORDER BY id, tu"""

  // ---------------------------------------------------------------
  // q185 — iCalendar event extraction (RFC 5545): 40 calendars × 2-4
  // events; every second SUMMARY is FOLDED mid-token (the CRLF+SP
  // unfolding law is hash-gated via the summary column), every third
  // plants an escaped comma; derived duration, closed property set.
  // Folding/escape/datetime strictness is spec-gated in IcsLakeSpec.
  private val IcsN = 40

  def q185(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.IcsLake.icsFixture(s, IcsN)
    graft.operators.IcsLake.extractIcs(fx, "id", "media")
      .select(col("id"), col("ev"), col("uid"), col("start_epoch"),
        col("dur_s"), col("summary"), col("location"),
        col("n_categories"), col("n_words"), col("digit_sum"),
        col("valid"))
      .orderBy("id", "ev")
  }

  val q185Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 3 AS nev FROM range(0, $IcsN) t(r)),
       e AS (SELECT id, unnest([k for k in range(0, nev)]) AS k FROM base),
       law AS (SELECT id, k,
                 (id * 7 + k * 3) % 10 AS a0, (id * 7 + k * 3 + 1) % 10 AS a1,
                 (id * 7 + k * 3 + 2) % 10 AS a2, (id * 7 + k * 3 + 3) % 10 AS a3
               FROM e)
       SELECT id, CAST(k AS INT) AS ev,
         'ev-' || id || '-' || k || '@graft' AS uid,
         CAST(1704067200 + id * 86400 + k * 7200 + (id * 3 + k) % 60
              AS BIGINT) AS start_epoch,
         CAST(1800 + ((id + k) % 4) * 900 AS BIGINT) AS dur_s,
         'e' || a0 || ' e' || a1 || ' ' ||
           CASE WHEN k % 3 = 2 THEN 'x,y' || a2
                ELSE 'longe' || a2 || 'r' END || ' e' || a3 AS summary,
         CASE WHEN (id + k) % 3 = 0 THEN 'Room R' || (id + k) % 9 END
           AS location,
         CAST(CASE WHEN k % 2 = 0 THEN 2 ELSE 0 END AS INT) AS n_categories,
         CAST(4 AS BIGINT) AS n_words,
         CAST(a0 + a1 + a2 + a3 AS BIGINT) AS digit_sum,
         true AS valid
       FROM law ORDER BY id, ev"""

  // ---------------------------------------------------------------
  // q186 — mixed-format document catalog (sniff + dispatch over a
  // table interleaving PDF/DOCX/EPUB/Markdown/LaTeX/MediaWiki blobs
  // — the FIRST operator a real document lake runs, because format
  // labels can't be trusted): 8 documents per format, global id =
  // 6·m + f, every format unified onto one text schema. The oracle
  // replays all six fixture laws as a UNION. Sniff strictness is
  // spec-gated in DocCatalogSpec.
  private val CatPerFmt = 8

  def q186(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.DocCatalog.docCatalogFixture(s, CatPerFmt)
    graft.operators.DocCatalog.extractDocs(fx, "id", "media")
      .select(col("id"), col("seq"), col("fmt"), col("text"),
        col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id", "seq")
  }

  val q186Sql: String =
    s"""SELECT * FROM (
       SELECT m * 6 + 0 AS id, CAST(p AS INT) AS seq, 'pdf' AS fmt,
         'Pg ' || p || ' d' || (m * 3 + p * 7) % 10
           || ' d' || (m * 3 + p * 7 + 1) % 10
           || ' (q' || (m * 3 + p * 7 + 2) % 10
           || ') Ax' || (m * 3 + p * 7 + 3) % 10
           || ' kern' || (m * 3 + p * 7 + 4) % 10
           || ' z' || (m * 3 + p * 7 + 5) % 10 AS text,
         CAST(8 AS BIGINT) AS n_words,
         CAST(p + (m * 3 + p * 7) % 10 + (m * 3 + p * 7 + 1) % 10
           + (m * 3 + p * 7 + 2) % 10 + (m * 3 + p * 7 + 3) % 10
           + (m * 3 + p * 7 + 4) % 10 + (m * 3 + p * 7 + 5) % 10
           AS BIGINT) AS digit_sum,
         true AS valid
       FROM (SELECT r AS m, unnest([p for p in range(0, 1 + r % 4)]) AS p
             FROM range(0, $CatPerFmt) t(r))
       UNION ALL
       SELECT m * 6 + 1, 0, 'docx',
         array_to_string(['ha' || (m * 7 + p * 3) % 10
           || 'lf' || (m * 7 + p * 3 + 1) % 10
           || ' amp&' || (m * 7 + p * 3 + 2) % 10
           || ' tail' || (m * 7 + p * 3 + 3) % 10
           for p in range(0, 2 + m % 3)], ' '),
         CAST((2 + m % 3) * 3 AS BIGINT),
         CAST(list_sum([(m * 7 + p * 3) % 10 + (m * 7 + p * 3 + 1) % 10
           + (m * 7 + p * 3 + 2) % 10 + (m * 7 + p * 3 + 3) % 10
           for p in range(0, 2 + m % 3)]) AS BIGINT),
         true
       FROM range(0, $CatPerFmt) t(m)
       UNION ALL
       SELECT m * 6 + 2, CAST(k AS INT), 'epub',
         array_to_string(['e' || (m * 7 + k * 3 + j) % 10
           for j in range(0, 8 + (m + k) % 5)], ' '),
         CAST(8 + (m + k) % 5 AS BIGINT),
         CAST(list_sum([(m * 7 + k * 3 + j) % 10
           for j in range(0, 8 + (m + k) % 5)]) AS BIGINT),
         true
       FROM (SELECT r AS m, unnest([k for k in range(0, 2 + r % 3)]) AS k
             FROM range(0, $CatPerFmt) t(r))
       UNION ALL
       SELECT m * 6 + 3, 0, 'markdown',
         array_to_string(['H' || s || ' k' || (m + s) % 10
           || ' p' || (m * 7 + s * 3) % 10
           || ' p' || (m * 7 + s * 3 + 1) % 10
           || ' p' || (m * 7 + s * 3 + 2) % 10
           || ' p' || (m * 7 + s * 3 + 3) % 10
           || ' lk' || (m + s) % 8 || ' li' || (m + s) % 10
           || ' q' || (m + s) % 6
           for s in range(0, 1 + m % 3)], ' '),
         CAST((1 + m % 3) * 9 AS BIGINT),
         CAST(list_sum([s + (m + s) % 10 + (m * 7 + s * 3) % 10
           + (m * 7 + s * 3 + 1) % 10 + (m * 7 + s * 3 + 2) % 10
           + (m * 7 + s * 3 + 3) % 10 + (m + s) % 8 + (m + s) % 10
           + (m + s) % 6
           for s in range(0, 1 + m % 3)]) AS BIGINT),
         true
       FROM range(0, $CatPerFmt) t(m)
       UNION ALL
       SELECT m * 6 + 4, 0, 'latex',
         array_to_string(['S' || s || ' h' || (m + s) % 10
           || ' w' || (m * 7 + s * 3) % 10
           || ' w' || (m * 7 + s * 3 + 1) % 10
           || ' w' || (m * 7 + s * 3 + 2) % 10
           || ' w' || (m * 7 + s * 3 + 3) % 10
           || ' e&f li' || (m + s) % 8 || ' lj' || (m + s) % 6
           for s in range(0, 1 + m % 3)], ' '),
         CAST((1 + m % 3) * 9 AS BIGINT),
         CAST(list_sum([s + (m + s) % 10 + (m * 7 + s * 3) % 10
           + (m * 7 + s * 3 + 1) % 10 + (m * 7 + s * 3 + 2) % 10
           + (m * 7 + s * 3 + 3) % 10 + (m + s) % 8 + (m + s) % 6
           for s in range(0, 1 + m % 3)]) AS BIGINT),
         true
       FROM range(0, $CatPerFmt) t(m)
       UNION ALL
       SELECT m * 6 + 5, CAST(p AS INT), 'wiki',
         array_to_string([
           'Sec ' || s || ' m' || (m * 3 + p * 5 + s * 7) % 10
             || ' m' || (m * 3 + p * 5 + s * 7 + 1) % 10
             || ' m' || (m * 3 + p * 5 + s * 7 + 2) % 10
             || ' L' || (m + p + s) % 7 || ' b' || (m + s) % 5
             || ' m' || (m * 3 + p * 5 + s * 7 + 3) % 10
             || ' x' || (p + s) % 9
             || ' m' || (m * 3 + p * 5 + s * 7 + 4) % 10
           for s in range(0, 1 + (m + p) % 2)], ' '),
         CAST((1 + (m + p) % 2) * 10 AS BIGINT),
         CAST(list_sum([s + (m * 3 + p * 5 + s * 7) % 10
             + (m * 3 + p * 5 + s * 7 + 1) % 10
             + (m * 3 + p * 5 + s * 7 + 2) % 10
             + (m + p + s) % 7 + (m + s) % 5
             + (m * 3 + p * 5 + s * 7 + 3) % 10 + (p + s) % 9
             + (m * 3 + p * 5 + s * 7 + 4) % 10
           for s in range(0, 1 + (m + p) % 2)]) AS BIGINT),
         true
       FROM (SELECT r AS m, unnest([p for p in range(0, 2 + r % 3)]) AS p
             FROM range(0, $CatPerFmt) t(r))
       ) ORDER BY id, seq"""

  // ---------------------------------------------------------------
  // q187 — SQL dump extraction (mysqldump shape — relational data
  // arriving in a corpus): 40 dumps, one table each, 2-3 INSERT
  // statements of 2-4 tuples; names plant a `;` (the quote-aware
  // statement-splitter law) and doubled-quote escapes; 2-decimal
  // prices project ×100 exactly, NULL on the (i+s+t)%5==4 law.
  // Grammar + cross-statement strictness is spec-gated in
  // SqlDumpLakeSpec.
  private val SqlN = 40

  def q187(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.SqlDumpLake.sqlDumpFixture(s, SqlN)
    graft.operators.SqlDumpLake.extractSqlDump(fx, "id", "media")
      .select(col("id"), col("tbl"), col("stmt"), col("tup"),
        col("row_id"), col("name"), col("price_x100"), col("valid"))
      .orderBy("id", "stmt", "tup")
  }

  val q187Sql: String =
    s"""WITH base AS (SELECT r AS id, 2 + r % 2 AS ns FROM range(0, $SqlN) t(r)),
       st AS (SELECT id, unnest([s for s in range(0, ns)]) AS s FROM base),
       tups AS (SELECT id, s,
                  unnest([t for t in range(0, 2 + (id + s) % 3)]) AS t
                FROM st),
       law AS (SELECT id, s, t, (id * 7 + s * 3 + t * 5) % 10 AS d0,
                      (id * 7 + s * 3 + t * 5 + 1) % 10 AS d1 FROM tups)
       SELECT id, 't' || id % 5 AS tbl,
         CAST(s AS INT) AS stmt, CAST(t AS INT) AS tup,
         CAST(id * 100 + s * 10 + t AS BIGINT) AS row_id,
         CASE WHEN t % 4 = 3 THEN 'a;b' || d0
              WHEN t % 3 = 2 THEN 'it''s' || d0
              ELSE 'n' || d0 || 'x' || d1 END AS name,
         CAST(CASE WHEN (id + s + t) % 5 != 4
              THEN id * 31 + s * 7 + t * 3 END AS BIGINT) AS price_x100,
         true AS valid
       FROM law ORDER BY id, stmt, tup"""

  // ---------------------------------------------------------------
  // q188 — MPEG-1 Audio Layer III payload decode (ISO/IEC 11172-3):
  // 42 REAL Layer III streams — bit reservoir with nonzero
  // main_data_begin back-pointers, CRC-16 over header+side-info on
  // even ids, all 16 scfsi sharing patterns, both scalefac_scale
  // regimes, preflag over band-12 samples (pretab = 1), three-region
  // Huffman decode through checked-in public-spec code tables
  // (region0: tables 1/2/3, region1: 5/6), count1 through Huffman
  // table A AND raw-inverted table B, sign bits, rzero — decoded to
  // CUBE-DOMAIN Q15 integers q = rne(is⁴·2^((3·E4+60)/4)) (exact for
  // every Huffman magnitude; see Multimodal.scala's Layer III block
  // comment). The oracle replays the scalefactor-fit law, the scfsi
  // sharing map, the per-position value/sign/exponent laws and the
  // shift/round-half-even arithmetic per sample; any slip — a wrong
  // Huffman table entry, region boundary, slen pair, sharing group,
  // pretab application, exponent term or rounding parity — shifts
  // huff_sum or value_sum and fails the hash gate. Corruption matrix
  // and the fractional-exponent exact-root path are spec-gated in
  // Mp3Layer3Spec; the parser sits in ParserFuzzSpec's central
  // no-throw gate.
  private val Mp3L3N = 42

  def q188(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3Fixture(s, Mp3L3N)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q188Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE WHEN (r // 3) % 3 = 0 THEN 1 ELSE 2 END AS ch,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf,
           CASE r % 3 WHEN 0 THEN 74 WHEN 1 THEN 72 ELSE 82 END AS s12
         FROM range(0, $Mp3L3N) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS (
         SELECT *, unnest([c for c in range(0, ch)]) AS c FROM frows),
       gc AS ( -- per (granule, channel) side-info law
         SELECT r, s12, f, c, unnest([0, 1]) AS g FROM crows),
       gc2 AS (
         SELECT r, s12, f, c, g,
           210 + 4 * ((r + f + 2 * g + 3 * c) % 4) AS gg,
           (r + f + c) % 2 AS ss,
           (r + 3 * f + 5 * c) % 16 AS nsc,
           CASE WHEN (r + f + c) % 2 = 0 THEN 0
                ELSE (r + f + g + c) % 2 END AS pf,
           1 + (r + f + g + c) % 3 AS t0
         FROM gc),
       -- effective scalefactor per scfsi band group 0..2 (the groups
       -- our samples touch): granule 1 reuses granule 0's value when
       -- the group's scfsi bit (MSB-first) is set
       grp3 AS (SELECT *, unnest([0, 1, 2]) AS grp FROM gc2),
       slens AS (
         SELECT *,
           CASE WHEN grp < 2
             THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4]
                  [1 + (r + 2 * f + 5 * c) % 16]
             ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3]
                  [1 + (r + 2 * f + 5 * c) % 16] END AS sl0,
           CASE WHEN grp < 2
             THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4]
                  [1 + (r + 2 * f + 3 * g + 5 * c) % 16]
             ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3]
                  [1 + (r + 2 * f + 3 * g + 5 * c) % 16] END AS slg
         FROM grp3),
       sfe AS (
         SELECT r, f, c, g, grp,
           CASE WHEN g = 1 AND
                ((nsc // (CASE grp WHEN 0 THEN 8 WHEN 1 THEN 4
                          ELSE 2 END)) % 2) = 1
             THEN CASE WHEN ss = 1
                    THEN (r + 2 * f + 5 * c + 7 * grp) % (1 << sl0)
                  WHEN sl0 = 0 THEN 0
                  ELSE 2 * ((r + 2 * f + 5 * c + 7 * grp)
                            % (1 << (sl0 - 1))) END
             ELSE CASE WHEN ss = 1
                    THEN (r + 2 * f + 3 * g + 5 * c + 7 * grp)
                         % (1 << slg)
                  WHEN slg = 0 THEN 0
                  ELSE 2 * ((r + 2 * f + 3 * g + 5 * c + 7 * grp)
                            % (1 << (slg - 1))) END END AS sf
         FROM slens),
       prows AS ( -- every decoded slot: big values + count1
         SELECT *, unnest([p for p in range(0, s12 + 14)]) AS p FROM gc2),
       vals AS (
         SELECT r, s12, f, c, g, gg, ss, pf, p,
           CASE WHEN p < 24 THEN (r * 7 + f * 5 + g * 3 + c * 9 + p)
                  % (CASE WHEN t0 = 1 THEN 2 ELSE 3 END)
                WHEN p < 36 THEN (r * 11 + f * 3 + g * 7 + c * 5 + p) % 4
                WHEN p < s12 THEN 0
                WHEN p = s12 THEN 1 + (r + f + g + c) % 3
                WHEN p = s12 + 1 THEN 1 + (r + f + g + c + 1) % 3
                ELSE (r + 3 * f + 5 * g + 7 * c + (p - s12 - 2)) % 2
           END AS m,
           CASE WHEN p < 36 THEN (r + f + g + c + p) % 2
                WHEN p = s12 THEN (r + f + g + c) % 2
                WHEN p = s12 + 1 THEN (r + f + g + c + 1) % 2
                ELSE (r + f + g + c + (p - s12 - 2)) % 2
           END AS neg,
           CASE WHEN p < 24 THEN 0 WHEN p < 36 THEN 1 ELSE 2 END AS grp
         FROM prows),
       ev AS (
         SELECT v.r, v.m, v.neg,
           (3 * ((v.gg - 210) - (2 + 2 * v.ss) *
                 (s.sf + CASE WHEN v.p >= v.s12 THEN v.pf ELSE 0 END))
            + 60) // 4 AS e
         FROM vals v JOIN sfe s
           ON v.r = s.r AND v.f = s.f AND v.c = s.c AND v.g = s.g
          AND v.grp = s.grp),
       qv AS ( -- cube-domain Q15: shift up, or round-half-even down
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
           CASE WHEN e >= 0
             THEN CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)
             ELSE fq + CASE WHEN 2 * rp > b THEN 1
                            WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                            ELSE 0 END
           END AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM (
           SELECT r, m, neg, e,
             (CAST(1 AS BIGINT) << (CASE WHEN e < 0 THEN -e ELSE 0 END)) AS b,
             (CAST(m AS BIGINT) * m * m * m)
               // (CAST(1 AS BIGINT) << (CASE WHEN e < 0 THEN -e ELSE 0 END)) AS fq,
             (CAST(m AS BIGINT) * m * m * m)
               % (CAST(1 AS BIGINT) << (CASE WHEN e < 0 THEN -e ELSE 0 END)) AS rp
           FROM ev))
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample, true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q189 — MS-RLE8 video in AVI: REAL INTER-FRAME decode. RLE8 is
  // the public fully-structural inter-frame codec (no tabulated
  // constants): encoded runs, word-padded absolute segments, EOL/EOB
  // escapes, and the DELTA escape that SKIPS pixels so they RETAIN
  // the previous frame's content — one row per FRAME, and each
  // frame's fb_sum depends on every frame before it (the
  // statefulness the GRFT video stub stood in for). 40 streams:
  // keyframe rows alternate run-only and run+absolute(+pad) shapes,
  // each delta frame jumps to a law row and rewrites it; the oracle
  // replays the row-value law (last update wins; rows distinct per
  // stream), the literal ramps (+10 odd keyframe rows, +15 delta
  // rows) and the palette component sum. Corruption matrix
  // (row-overrun runs/absolutes, out-of-bounds delta, clobbered EOB,
  // wrong biCompression, MJPEG cross-discrimination, truncation) is
  // spec-gated in AviRle8Spec; parser in ParserFuzzSpec's gate.
  private val Rle8N = 40

  def q189(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.aviRle8Fixture(s, Rle8N)
    graft.operators.Multimodal.decodeAviRle8(fx, "id", "media")
      .select(col("id"), col("frame"), col("width"), col("height"),
        col("n_written"), col("fb_sum"), col("palette_sum"), col("valid"))
      .orderBy("id", "frame")
  }

  val q189Sql: String =
    s"""WITH base AS (
         SELECT r, 16 + (r % 4) * 8 AS w, 8 + r % 5 AS h, 2 + r % 4 AS nf
         FROM range(0, $Rle8N) t(r)),
       fr AS (SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       yr AS (SELECT *, unnest([y for y in range(0, h)]) AS y FROM fr),
       upd AS ( -- the (unique) delta frame g <= f that rewrote row y
         SELECT r, f, w, h, y,
           list_max([g for g in range(1, f + 1)
                     if (7 * g + r) % h = y]) AS g
         FROM yr),
       rowsum AS (
         SELECT r, f, w, h,
           CASE WHEN g IS NOT NULL THEN w * ((r + 11 * g) % 240) + 15
                WHEN y % 2 = 1 THEN w * ((r + 3 * y) % 240) + 10
                ELSE w * ((r + 3 * y) % 240) END AS s
         FROM upd),
       agg AS (
         SELECT r, f, CAST(sum(s) AS BIGINT) AS fb_sum
         FROM rowsum GROUP BY r, f)
       SELECT b.r AS id, CAST(b.f AS INT) AS frame,
         CAST(b.w AS INT) AS width, CAST(b.h AS INT) AS height,
         CAST(CASE WHEN b.f = 0 THEN b.w * b.h ELSE b.w END AS BIGINT)
           AS n_written,
         a.fb_sum,
         CAST(list_sum([(3 * i) % 256 + (5 * i) % 256 + (7 * i) % 256
                        for i in range(0, 256)]) AS BIGINT) AS palette_sum,
         true AS valid
       FROM fr b JOIN agg a ON b.r = a.r AND b.f = a.f
       ORDER BY id, frame"""

  // ---------------------------------------------------------------
  // q190 — image near-dup by perceptual hash (dHash): the IMAGE
  // member of the near-dup family (LAION-style image dedup), and a
  // real cross-family composition — lossless PNG decode + integer
  // grayscale + nearest-neighbor 9×8 downsample + difference hash,
  // then EXACT ≤3-Hamming retrieval through the SAME banded
  // pigeonhole blocking the text SimHash path uses
  // (Dedup.simhashNearDup — one blocking implementation, not two).
  // 42 images in groups of three: adjacent groups share a base bit
  // pattern (equal fingerprints from DIFFERENT pixels and scales —
  // the Hamming-0 path), members flip 1-2 law bits, scale varies
  // 1×/2×/3× inside every group so equal hashes always cross the
  // real downsample. The oracle rebuilds every fingerprint from the
  // bit law and brute-forces all C(42,2) pairs — any slip in decode,
  // gray law, sampling positions, bit order or the blocking's
  // exactness changes the pair set or a hamming and fails the hash
  // gate. Decode/law/corruption gates live in ImageDHashSpec.
  private[queries] val DHashN = 42

  def q190(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.dhashFixture(s, DHashN)
    // decode ONCE: the banded blocking evaluates its input several
    // times (free on a fingerprint column scan, a full PNG re-decode
    // here) — eager-materialize the 16 B/row fingerprints, which also
    // hands AQE true sizes for the band joins (SCALE.md image row)
    val fps = graft.operators.Multimodal.imageDHash(fx, "id", "media")
      .where(col("valid"))
      .select(col("id"), col("dhash").as("simhash"))
      .localCheckpoint()
    graft.operators.Dedup.simhashNearDup(fps, maxDist = 3)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
      .orderBy("a", "b")
  }

  private[queries] val q190Sql: String =
    s"""WITH base AS (
         SELECT r, r // 3 AS g, r % 3 AS m,
                (r // 3) - ((r // 3) % 2) AS geff
         FROM range(0, $DHashN) t(r)),
       bitv AS (
         SELECT r, k,
           (CASE WHEN (geff * 5 + k * 3) % 7 < 3 THEN 1 ELSE 0 END +
            CASE WHEN m = 1 AND (k = (3 * g) % 63 OR k = (3 * g + 21) % 63)
                   THEN 1
                 WHEN m = 2 AND k = (3 * g + 7) % 63 THEN 1
                 ELSE 0 END) % 2 AS b
         FROM base, unnest([k for k in range(0, 63)]) u(k)),
       fps AS (
         SELECT r, CAST(sum(CASE WHEN b = 1
                  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS fp
         FROM bitv GROUP BY r)
       SELECT x.r AS a, y.r AS b,
         CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
       FROM fps x JOIN fps y ON x.r < y.r
       WHERE bit_count(xor(x.fp, y.fp)) <= 3
       ORDER BY a, b"""

  // ---------------------------------------------------------------
  // q191 — audio energy segmentation (silence trimming): the first
  // pass an audio-corpus curation pipeline runs. 64-sample frames,
  // integer sum-of-squares energy across channels, active iff the
  // per-sample mean energy clears 90 000 (width- and channel-
  // independent bound), consecutive active frames merged into
  // segments, trailing partial frames ignored (the fixture's loud
  // partial tail must never leak into a segment). One row per
  // SEGMENT; the oracle replays frame energies and the gaps-and-
  // islands merge exactly — any slip in sample decode, framing,
  // threshold scaling, merge logic or the full-frames-only contract
  // shifts a boundary or an energy sum and fails the hash gate.
  // 8-bit widening and corruption strictness are spec-gated in
  // EnergySegmentsSpec.
  private val EnergyN = 40
  private val EnergyFrame = 64

  def q191(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.energyFixture(s, EnergyN, EnergyFrame)
    graft.operators.Multimodal
      .energySegments(fx, "id", "media", EnergyFrame, 90000L)
      .select(col("id"), col("seg"), col("sample_rate"), col("channels"),
        col("n_frames"), col("start_frame"), col("seg_frames"),
        col("energy_sum"), col("valid"))
      .orderBy("id", "seg")
  }

  val q191Sql: String =
    s"""WITH base AS (
         SELECT r, 8000 + (r % 3) * 4000 AS rate, 1 + r % 2 AS ch,
                20 + r % 10 AS nf
         FROM range(0, $EnergyN) t(r)),
       fr AS (SELECT *, unnest([j for j in range(0, nf)]) AS j FROM base),
       en AS (
         SELECT r, rate, ch, nf, j, ((r + 3 * j) % 5) * 300 AS a,
           CAST($EnergyFrame AS BIGINT) * ch
             * (((r + 3 * j) % 5) * 300) * (((r + 3 * j) % 5) * 300) AS e
         FROM fr),
       act AS (
         SELECT *, j - ROW_NUMBER() OVER (PARTITION BY r ORDER BY j) AS grp
         FROM en WHERE a >= 300),
       seg AS (
         SELECT r, rate, ch, nf, grp, min(j) AS start_frame,
                count(*) AS seg_frames, sum(e) AS energy_sum
         FROM act GROUP BY r, rate, ch, nf, grp),
       num AS (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY r ORDER BY start_frame)
                   - 1 AS seg
         FROM seg)
       SELECT r AS id, CAST(seg AS INT) AS seg,
         CAST(rate AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
         CAST(nf AS BIGINT) AS n_frames,
         CAST(start_frame AS BIGINT) AS start_frame,
         CAST(seg_frames AS BIGINT) AS seg_frames,
         CAST(energy_sum AS BIGINT) AS energy_sum, true AS valid
       FROM num ORDER BY id, seg"""

  // ---------------------------------------------------------------
  // q192 — rational audio resampling to 16 kHz (the ASR-training
  // front door): linear-interpolation polyphase at the reduced L/M
  // ratio, exact integer arithmetic y = rne(s[k]·(L−f) + s[k+1]·f, L)
  // — pure 1/3 decimation (48 k), the heavy 160/441 rational
  // (44.1 k), and 1/2 (32 k), mono and stereo. The oracle replays
  // every output sample's index arithmetic and round-half-even
  // division; out_first/out_last pin the boundary behavior and
  // n_out pins the (n_in−1)·L/M + 1 count law. Upsampling and
  // corruption strictness are spec-gated in ResampleSpec.
  private val ResampleN = 40

  def q192(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.resampleFixture(s, ResampleN)
    graft.operators.Multimodal.resampleWav(fx, "id", "media", 16000)
      .select(col("id"), col("in_rate"), col("out_rate"), col("channels"),
        col("n_in"), col("n_out"), col("out_sum"), col("out_min"),
        col("out_max"), col("out_first"), col("out_last"), col("valid"))
      .orderBy("id")
  }

  val q192Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                ELSE 32000 END AS rate,
           CASE r % 3 WHEN 0 THEN 1 WHEN 1 THEN 160 ELSE 1 END AS l,
           CASE r % 3 WHEN 0 THEN 3 WHEN 1 THEN 441 ELSE 2 END AS m,
           1 + r % 2 AS ch, 400 + r % 50 AS nin
         FROM range(0, $ResampleN) t(r)),
       b2 AS (SELECT *, (nin - 1) * l // m + 1 AS nout FROM base),
       cn AS (SELECT *, unnest([c for c in range(0, ch)]) AS c FROM b2),
       nn AS (SELECT *, unnest([n for n in range(0, nout)]) AS n FROM cn),
       av AS (
         SELECT r, c, n, nout, l,
           CAST(((r * 31 + ((n * m) // l) * 7 + c * 13) % 401) - 200
                AS BIGINT) * (l - (n * m) % l)
           + CASE WHEN (n * m) % l = 0 THEN 0
                  ELSE CAST(((r * 31 + ((n * m) // l + 1) * 7 + c * 13)
                             % 401) - 200 AS BIGINT) * ((n * m) % l) END
             AS a
         FROM nn),
       yv AS ( -- exact round-half-even of a/l (a may be negative)
         SELECT r, c, n, nout,
           fq + CASE WHEN 2 * rp > b THEN 1
                     WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                     ELSE 0 END AS y
         FROM (SELECT r, c, n, nout, CAST(l AS BIGINT) AS b,
                      ((a % l) + l) % l AS rp,
                      (a - (((a % l) + l) % l)) // l AS fq
               FROM av)),
       agg AS (
         SELECT r, CAST(sum(y) AS BIGINT) AS out_sum,
                CAST(min(y) AS BIGINT) AS out_min,
                CAST(max(y) AS BIGINT) AS out_max,
                CAST(max(CASE WHEN c = 0 AND n = 0 THEN y END) AS BIGINT)
                  AS out_first,
                CAST(max(CASE WHEN c = 0 AND n = nout - 1 THEN y END)
                  AS BIGINT) AS out_last
         FROM yv GROUP BY r)
       SELECT b2.r AS id, CAST(rate AS INT) AS in_rate,
         CAST(16000 AS INT) AS out_rate, CAST(ch AS INT) AS channels,
         CAST(nin AS BIGINT) AS n_in, CAST(nout AS BIGINT) AS n_out,
         a.out_sum, a.out_min, a.out_max, a.out_first, a.out_last,
         true AS valid
       FROM b2 JOIN agg a ON b2.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q193 — EXIF metadata extraction from JPEG APP1 (TIFF 6.0 IFD
  // walk, both byte orders): the catalog pass an image lake runs
  // before any pixel work — camera identity, orientation, capture
  // time, exposure, dimensions, focal length and the full GPS DMS
  // position. 40 REAL JPEGs (the JDK encoder's output) with a
  // spliced APP1 whose IFD0/Exif/GPS structure is built for real
  // (ascending tags, inline vs out-of-line values, a shared data
  // area); II on even ids, MM on odd. The oracle replays every law
  // field; any slip — byte order, inline-value packing, offset
  // arithmetic, NUL handling, type acceptance — shifts a column and
  // fails the hash gate. Strictness matrix in ExifSpec; parser in
  // ParserFuzzSpec's central gate.
  private val ExifN = 40

  def q193(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.ExifLake.exifFixture(s, ExifN)
    graft.operators.ExifLake.extractExif(fx, "id", "media")
      .select(col("id"), col("byte_order"), col("make"), col("model"),
        col("orientation"), col("dt"), col("exposure_num"),
        col("exposure_den"), col("iso"), col("px_width"), col("px_height"),
        col("focal_num"), col("focal_den"), col("lat_ref"), col("lat_deg"),
        col("lat_min"), col("lat_sec_num"), col("lat_sec_den"),
        col("lon_ref"), col("lon_deg"), col("lon_min"), col("lon_sec_num"),
        col("lon_sec_den"), col("valid"))
      .orderBy("id")
  }

  val q193Sql: String =
    s"""SELECT r AS id,
         CASE WHEN r % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
         'Maker' || (r % 5) AS make, 'Cam-' || r AS model,
         CAST(1 + r % 8 AS INT) AS orientation,
         printf('%04d:%02d:%02d %02d:%02d:%02d',
           2020 + r % 5, 1 + r % 12, 1 + r % 28,
           r % 24, (3 * r) % 60, (7 * r) % 60) AS dt,
         CAST(1 AS BIGINT) AS exposure_num,
         CAST(125 + r % 500 AS BIGINT) AS exposure_den,
         CAST(100 * (1 + r % 32) AS INT) AS iso,
         CAST(640 + r * 16 AS BIGINT) AS px_width,
         CAST(480 + r * 9 AS BIGINT) AS px_height,
         CAST(35 + r % 300 AS BIGINT) AS focal_num,
         CAST(10 AS BIGINT) AS focal_den,
         CASE WHEN r % 2 = 0 THEN 'N' ELSE 'S' END AS lat_ref,
         CAST(r % 90 AS BIGINT) AS lat_deg,
         CAST((3 * r) % 60 AS BIGINT) AS lat_min,
         CAST((1101 * r) % 6000 AS BIGINT) AS lat_sec_num,
         CAST(100 AS BIGINT) AS lat_sec_den,
         CASE WHEN r % 3 = 0 THEN 'E' ELSE 'W' END AS lon_ref,
         CAST(r % 180 AS BIGINT) AS lon_deg,
         CAST((7 * r) % 60 AS BIGINT) AS lon_min,
         CAST((2203 * r) % 6000 AS BIGINT) AS lon_sec_num,
         CAST(100 AS BIGINT) AS lon_sec_den,
         true AS valid
       FROM range(0, $ExifN) t(r) ORDER BY id"""

  // ---------------------------------------------------------------
  // q194 — compressed corpus-shard ingestion: .zst / .lz4 / .bz2 /
  // .xz / .gz blobs (the formats corpora actually ship in) routed by
  // magic and decompressed through the codecs every Spark classpath
  // already carries, under the DECOMPRESSION-BOMB CAP (bounded-
  // output read; a real 10 000:1 zstd bomb is spec-gated). The
  // decoded text follows the fixture law, so n_words/digit_sum pin
  // correct decompression per codec; comp_bytes is codec-dependent
  // and deliberately NOT in the oracle surface. Strictness (bombs,
  // truncation, bit flips, magic confusion) in CompressedLakeSpec;
  // every router branch in ParserFuzzSpec's no-throw gate.
  private val CompN = 40

  def q194(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.CompressedLake.compressedFixture(s, CompN)
    graft.operators.CompressedLake.extractCompressed(fx, "id", "media")
      .select(col("id"), col("codec"), col("uncomp_bytes"),
        col("n_words"), col("digit_sum"), col("valid"))
      .orderBy("id")
  }

  val q194Sql: String =
    s"""WITH base AS (
         SELECT r, 10 + r % 6 AS nt,
           ['zstd', 'lz4', 'bzip2', 'xz', 'gzip'][1 + r % 5] AS codec
         FROM range(0, $CompN) t(r)),
       dig AS (
         SELECT r, CAST(list_sum([(r * 7 + j * 3) % 10
                                  for j in range(0, nt)]) AS BIGINT) AS ds
         FROM base)
       SELECT b.r AS id, b.codec,
         CAST(3 * b.nt - 1 AS BIGINT) AS uncomp_bytes,
         CAST(b.nt AS BIGINT) AS n_words, d.ds AS digit_sum,
         true AS valid
       FROM base b JOIN dig d ON b.r = d.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q195 — JSONL-in-zstd corpus shards (the RedPajama / Dolma / C4
  // distribution shape: one JSON document per line inside a
  // compressed frame): the bounded decompressor feeds CATALYST
  // BUILT-INS — split / posexplode / from_json / length — so
  // everything after the codec hop runs inside whole-stage codegen
  // (functions, not UDFs). One row per document; the oracle replays
  // the JSON law field-by-field, so a decompression slip, a line
  // split-off-by-one, or a from_json schema mismatch all shift a
  // column and fail the hash gate.
  private val JsonlN = 40

  def q195(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.CompressedLake.jsonlShardFixture(s, JsonlN)
    val txt = graft.operators.CompressedLake.extractText(fx, "id", "media")
      .where(col("valid"))
    val docSchema = "doc_id BIGINT, lang STRING, score BIGINT, text STRING"
    txt.select(col("id"), posexplode(split(col("text"), "\n"))
        .as(Seq("line", "doc")))
      .select(col("id"), col("line"),
        from_json(col("doc"), org.apache.spark.sql.types.StructType
          .fromDDL(docSchema)).as("j"))
      .select(col("id"), col("line").cast("int").as("line"),
        col("j.doc_id").as("doc_id"), col("j.lang").as("lang"),
        col("j.score").as("score"),
        length(col("j.text")).cast("long").as("text_chars"),
        size(split(col("j.text"), " ")).cast("long").as("n_words"))
      .orderBy("id", "line")
  }

  val q195Sql: String =
    s"""WITH base AS (
         SELECT r, unnest([k for k in range(0, 3 + r % 4)]) AS k
         FROM range(0, $JsonlN) t(r))
       SELECT r AS id, CAST(k AS INT) AS line,
         CAST(r * 100 + k AS BIGINT) AS doc_id,
         ['en', 'de', 'fr'][1 + (r + k) % 3] AS lang,
         CAST((r * 13 + k * 7) % 100 AS BIGINT) AS score,
         CAST(3 * (5 + (r + k) % 4) - 1 AS BIGINT) AS text_chars,
         CAST(5 + (r + k) % 4 AS BIGINT) AS n_words
       FROM base ORDER BY id, line"""

  // ---------------------------------------------------------------
  // q196 — cross-corpus image near-dup (image decontamination: did a
  // training image leak into the eval set?): the dHash fingerprints
  // of two corpora through the SAME banded pigeonhole cross join the
  // text family uses (Dedup.simhashNearDupCross — jaccardJoinCross /
  // minhashLshCross / cosineNearDupCross's image sibling). Corpus B
  // is a 45-image superset of A's laws with ids offset by 1000, so
  // every A image has 1-3 near neighbors across the boundary
  // (including exact-fingerprint hits from the shared-base-pattern
  // groups at different pixel scales). The oracle brute-forces all
  // 42×45 cross pairs from the bit law.
  private val DHashXa = 42
  private val DHashXb = 45

  def q196(s: SparkSession, dir: String): DataFrame = {
    // decode ONCE per corpus (same materialization rationale as q190)
    def fps(n: Int, offset: Long) =
      graft.operators.Multimodal.imageDHash(
          graft.operators.Multimodal.dhashFixture(s, n), "id", "media")
        .where(col("valid"))
        .select((col("id") + lit(offset)).as("id"),
          col("dhash").as("simhash"))
        .localCheckpoint()
    graft.operators.Dedup.simhashNearDupCross(
        fps(DHashXa, 0L), fps(DHashXb, 1000L), maxDist = 3)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
      .orderBy("a", "b")
  }

  val q196Sql: String =
    s"""WITH ids AS (
         SELECT r, r // 3 AS g, r % 3 AS m,
                (r // 3) - ((r // 3) % 2) AS geff
         FROM range(0, $DHashXb) t(r)),
       bitv AS (
         SELECT r, k,
           (CASE WHEN (geff * 5 + k * 3) % 7 < 3 THEN 1 ELSE 0 END +
            CASE WHEN m = 1 AND (k = (3 * g) % 63 OR k = (3 * g + 21) % 63)
                   THEN 1
                 WHEN m = 2 AND k = (3 * g + 7) % 63 THEN 1
                 ELSE 0 END) % 2 AS b
         FROM ids, unnest([k for k in range(0, 63)]) u(k)),
       fps AS (
         SELECT r, CAST(sum(CASE WHEN b = 1
                  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS fp
         FROM bitv GROUP BY r)
       SELECT x.r AS a, y.r + 1000 AS b,
         CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
       FROM fps x JOIN fps y ON x.r < $DHashXa
       WHERE bit_count(xor(x.fp, y.fp)) <= 3
       ORDER BY a, b"""

  // ---------------------------------------------------------------
  // q197 — MPEG-1 Layer III SHORT-BLOCK payload decode: the window-
  // switching granules every real MP3 uses on transients. Frames
  // alternate one pure-short (block_type 2) and one silent long
  // granule per channel, so the reservoir and part2_3 accounting
  // cross long/short boundaries every frame. Short decode adds: the
  // 22-bit window-switching side-info layout, sfb-major/window-minor
  // short scalefactors (slen1 over sfbs 0-5 ×3 windows, slen2 over
  // 6-11 ×3), the FIXED 36-line region0 (no region counts, no
  // region2), per-window subblock gains in the exponent
  //   E4 = (gg−210) − 8·sbgain[w] − (2+2·ss)·sf_short[sfb][w],
  // and the sfb-major/window-mid/line-minor position interleave that
  // maps the linear Huffman index to its (sfb, window). All values
  // live in short sfbs 0-5, whose widths agree across rates, so the
  // oracle's position map is closed-form. scfsi≠0 with a short
  // granule, preflag on short, block types 1/3 and mixed blocks all
  // strict-reject (Mp3Layer3Spec/Mp3L3ShortSpec gates).
  private val Mp3ShortN = 42

  def q197(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3ShortFixture(s, Mp3ShortN)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q197Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE WHEN (r // 3) % 3 = 0 THEN 1 ELSE 2 END AS ch,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf
         FROM range(0, $Mp3ShortN) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS ( -- the short granule of frame f is g = f % 2
         SELECT r, rate, f, f % 2 AS g,
                unnest([c for c in range(0, ch)]) AS c
         FROM frows),
       gc AS (
         SELECT r, rate, f, g, c,
           210 + 4 * ((r + f + 2 * g + 3 * c) % 4) AS gg,
           (r + f + c) % 2 AS ss,
           (r + 2 * f + 3 * g + 5 * c) % 16 AS scomp,
           1 + (r + f + g + c) % 3 AS t0
         FROM crows),
       prows AS (SELECT *, unnest([p for p in range(0, 78)]) AS p FROM gc),
       pos AS ( -- sfb-major interleave, closed-form for lines 0-77
         SELECT *,
           CASE WHEN p < 48 THEN p // 12
                WHEN p < 66 THEN 4 ELSE 5 END AS sfb,
           CASE WHEN p < 48 THEN (p % 12) // 4
                WHEN p < 66 THEN (p - 48) // 6
                ELSE (p - 66) //
                     (CASE WHEN rate = 48000 THEN 6 ELSE 8 END)
           END AS w
         FROM prows),
       vals AS (
         SELECT r, f, g, c, gg, ss, scomp, p, sfb, w,
           CASE WHEN p < 36 THEN (r * 7 + f * 5 + g * 3 + c * 9 + p)
                  % (CASE WHEN t0 = 1 THEN 2 ELSE 3 END)
                WHEN p < 66 THEN (r * 11 + f * 3 + g * 7 + c * 5 + p) % 4
                ELSE (r + 3 * f + 5 * g + 7 * c + (p - 66)) % 2
           END AS m,
           CASE WHEN p < 66 THEN (r + f + g + c + p) % 2
                ELSE (r + f + g + c + (p - 66)) % 2
           END AS neg
         FROM pos),
       ev AS (
         SELECT r, m, neg,
           (3 * ((gg - 210)
                 - 8 * ((r + f + g + c + w) % 8)
                 - (2 + 2 * ss) *
                   (CASE WHEN ss = 1
                      THEN (r + 2*f + 3*g + 5*c + 7*sfb + 11*w)
                           % (1 << (CASE WHEN sfb < 6
                                THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4][1 + scomp]
                                ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3][1 + scomp]
                              END))
                    WHEN (CASE WHEN sfb < 6
                            THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4][1 + scomp]
                            ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3][1 + scomp]
                          END) = 0 THEN 0
                    ELSE 2 * ((r + 2*f + 3*g + 5*c + 7*sfb + 11*w)
                         % (1 << ((CASE WHEN sfb < 6
                              THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4][1 + scomp]
                              ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3][1 + scomp]
                            END) - 1)))
                    END))
            + 60) // 4 AS e
         FROM vals),
       qv AS ( -- e <= -63 underflows to exactly 0 (engine clamp parity)
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
           CASE WHEN e >= 0
             THEN CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)
             WHEN e <= -63 THEN 0
             ELSE fq + CASE WHEN 2 * rp > b THEN 1
                            WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                            ELSE 0 END
           END AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM (
           SELECT r, m, neg, e,
             (CAST(1 AS BIGINT) <<
              (CASE WHEN e < 0 THEN least(-e, 62) ELSE 0 END)) AS b,
             (CAST(m AS BIGINT) * m * m * m)
               // (CAST(1 AS BIGINT) <<
                   (CASE WHEN e < 0 THEN least(-e, 62) ELSE 0 END)) AS fq,
             (CAST(m AS BIGINT) * m * m * m)
               % (CAST(1 AS BIGINT) <<
                  (CASE WHEN e < 0 THEN least(-e, 62) ELSE 0 END)) AS rp
           FROM ev))
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample, true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q198 — MPEG-1 Layer III ESC/linbits Huffman decode: the escape
  // path real-world encoders select on nearly every music-bitrate
  // frame. Every granule's region2 picks one of the sixteen
  // linbits/ESC tables (ids 16-23 share table 16's codewords, 25-31
  // table 24's — the spec's own structure, written as `codes` aliases
  // in mp3_huffman.txt), with magnitudes alternating the escape path
  // (|v| >= 15: Huffman key 15 + a 1..13-bit residual, INCLUDING
  // residual 0 at exactly 15 — the decoder always reads linbits after
  // a 15) and the sub-15 direct path; region0 runs the newly
  // transcribed big-value tables 7/8/9 and region1 10/11/15.
  // global_gain = 210 - 4K pins every quarter exponent to -4K, so the
  // oracle requantizes with a pure left shift q = m^4 << (15 - 3K);
  // per-K magnitude caps bound each sample under 2^52. Any slip in a
  // transcribed codeword, the linbits widths, the escape/sign field
  // order or the alias sharing shifts huff_sum/value_sum and fails
  // the hash gate. Structural table gates (Kraft=1, prefix-free,
  // alias equality) live in Mp3Layer3Spec; the randomized
  // encode/decode property over the new ids in Mp3L3PropertySpec.
  private val Mp3EscN = 48

  def q198(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3EscFixture(s, Mp3EscN)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q198Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE WHEN (r // 3) % 3 = 0 THEN 1 ELSE 2 END AS ch,
           2 + r % 3 AS nf,
           CASE r % 3 WHEN 0 THEN 110 WHEN 1 THEN 106 ELSE 126 END AS e14
         FROM range(0, $Mp3EscN) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS (
         SELECT *, unnest([c for c in range(0, ch)]) AS c FROM frows),
       gc AS (SELECT r, e14, f, c, unnest([0, 1]) AS g FROM crows),
       gc2 AS ( -- per-granule laws: K, linbits of the ESC id, region1 modulus
         SELECT r, e14, f, c, g,
           (r + f + g + c) % 4 AS k,
           [1,2,3,4,6,8,10,13,4,5,6,7,8,9,11,13]
             [1 + (r + 2 * f + 3 * g + 5 * c) % 16] AS lb,
           CASE WHEN (r + g + c) % 3 = 2 THEN 16 ELSE 8 END AS mod1
         FROM gc),
       gc3 AS (
         SELECT *, 15 - 3 * k AS e,
           least(1 << lb, [512,1024,1024,2048][1 + k] - 15) AS extmod
         FROM gc2),
       prows AS (
         SELECT *, unnest([p for p in range(0, e14 + 24)]) AS p FROM gc3),
       vals AS (
         SELECT r, e, p, f, g, c,
           CASE WHEN p < 24 THEN (r*7 + f*5 + g*3 + c*9 + p) % 6
                WHEN p < e14 THEN (r*11 + f*3 + g*7 + c*5 + p) % mod1
                WHEN p < e14 + 12 THEN
                  CASE WHEN (p - e14) % 2 = 0
                    THEN 15 + (r*13 + f*7 + g*11 + c*5 + (p - e14)*17)
                              % extmod
                    ELSE (r*13 + f*7 + g*11 + c*5 + (p - e14)*17) % 15 END
                ELSE (r + 3*f + 5*g + 7*c + (p - e14 - 12)) % 2 END AS m,
           (r + f + g + c + p) % 2 AS neg
         FROM prows),
       qv AS ( -- exponent pinned >= 0: requantization is a pure shift
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
             (CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)) AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM vals)
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(320 AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample, true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q199 — MPEG-1 Layer III MS JOINT STEREO: mode-1 streams whose
  // frames alternate mode_extension 2 (MS stereo on) and 0 (both
  // tools off) — the legality surface stereo music MP3s exercise.
  // The decode emits the MID/SIDE channels' requantized spectra
  // (bitstream-identical to stereo; the MS butterfly (M±S)/√2 is the
  // first synthesis-side linear transform and stays outside exact
  // decode scope — its cross terms are sums of independent 12th-root
  // surds no power domain pins as integers; see Multimodal.scala's
  // Layer III block comment). Intensity stereo is covered by q219
  // (bitstream-identical; only the counters differ). ms_frames
  // counts ext&2 frames.
  private val Mp3MsN = 42

  def q199(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3MsFixture(s, Mp3MsN)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("ms_frames"),
        col("valid"))
      .orderBy("id")
  }

  val q199Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf
         FROM range(0, $Mp3MsN) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS (SELECT *, unnest([0, 1]) AS c FROM frows),
       gc AS (SELECT r, f, c, unnest([0, 1]) AS g FROM crows),
       gc2 AS (
         SELECT r, f, c, g,
           15 - 3 * ((r + f + g + c) % 4) AS e,
           CASE WHEN 1 + (r + f + g + c) % 3 = 1 THEN 2 ELSE 3 END AS mx0
         FROM gc),
       prows AS (SELECT *, unnest([p for p in range(0, 52)]) AS p FROM gc2),
       vals AS (
         SELECT r, e,
           CASE WHEN p < 24 THEN (r*7 + f*5 + g*3 + c*9 + p) % mx0
                WHEN p < 40 THEN (r*11 + f*3 + g*7 + c*5 + p) % 4
                ELSE (r + 3*f + 5*g + 7*c + (p - 40)) % 2 END AS m,
           (r + f + g + c + p) % 2 AS neg
         FROM prows),
       qv AS (
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
             (CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)) AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM vals)
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(2 AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 2304 AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample,
         CAST((nf + CASE WHEN base.r % 2 = 0 THEN 1 ELSE 0 END) // 2 AS INT)
           AS ms_frames,
         true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q200 — MPEG-1 Layer III TRANSITION WINDOWS (block types 1/3):
  // granules cycle block types 0 → 1 (start) → 3 (stop). bt-1/3
  // granules carry the 22-bit window-switching side info (two table
  // selects, subblock gains transmitted but UNUSED per spec — the
  // fixture writes nonzero gains to pin that) with the LONG spectral
  // layout and the fixed [0,36)/[36,576) regions; the bt-0 granules
  // declare region0_count 7 / region1_count 13, landing on the SAME
  // split, so one value law covers all three types and the hash gate
  // pins the side-info layout (a parse slip desyncs the Huffman
  // stream). Scalefactors, scfsi sharing across bt-1/3 granules and
  // preflag run the full q188 laws.
  private val Mp3TransN = 42

  def q200(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3TransitionFixture(s, Mp3TransN)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q200Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE WHEN (r // 3) % 3 = 0 THEN 1 ELSE 2 END AS ch,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf,
           CASE r % 3 WHEN 0 THEN 74 WHEN 1 THEN 72 ELSE 82 END AS s12
         FROM range(0, $Mp3TransN) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS (
         SELECT *, unnest([c for c in range(0, ch)]) AS c FROM frows),
       gc AS ( -- per (granule, channel) side-info law
         SELECT r, s12, f, c, unnest([0, 1]) AS g FROM crows),
       gc2 AS (
         SELECT r, s12, f, c, g,
           210 + 4 * ((r + f + 2 * g + 3 * c) % 4) AS gg,
           (r + f + c) % 2 AS ss,
           (r + 3 * f + 5 * c) % 16 AS nsc,
           CASE WHEN (r + f + c) % 2 = 0 THEN 0
                ELSE (r + f + g + c) % 2 END AS pf,
           1 + (r + f + g + c) % 3 AS t0
         FROM gc),
       grp3 AS (SELECT *, unnest([0, 1, 2]) AS grp FROM gc2),
       slens AS (
         SELECT *,
           CASE WHEN grp < 2
             THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4]
                  [1 + (r + 2 * f + 5 * c) % 16]
             ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3]
                  [1 + (r + 2 * f + 5 * c) % 16] END AS sl0,
           CASE WHEN grp < 2
             THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4]
                  [1 + (r + 2 * f + 3 * g + 5 * c) % 16]
             ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3]
                  [1 + (r + 2 * f + 3 * g + 5 * c) % 16] END AS slg
         FROM grp3),
       sfe AS (
         SELECT r, f, c, g, grp,
           CASE WHEN g = 1 AND
                ((nsc // (CASE grp WHEN 0 THEN 8 WHEN 1 THEN 4
                          ELSE 2 END)) % 2) = 1
             THEN CASE WHEN ss = 1
                    THEN (r + 2 * f + 5 * c + 7 * grp) % (1 << sl0)
                  WHEN sl0 = 0 THEN 0
                  ELSE 2 * ((r + 2 * f + 5 * c + 7 * grp)
                            % (1 << (sl0 - 1))) END
             ELSE CASE WHEN ss = 1
                    THEN (r + 2 * f + 3 * g + 5 * c + 7 * grp)
                         % (1 << slg)
                  WHEN slg = 0 THEN 0
                  ELSE 2 * ((r + 2 * f + 3 * g + 5 * c + 7 * grp)
                            % (1 << (slg - 1))) END END AS sf
         FROM slens),
       prows AS ( -- every decoded slot: big values + count1
         SELECT *, unnest([p for p in range(0, s12 + 14)]) AS p FROM gc2),
       vals AS (
         SELECT r, s12, f, c, g, gg, ss, pf, p,
           CASE WHEN p < 36 THEN (r * 7 + f * 5 + g * 3 + c * 9 + p)
                  % (CASE WHEN t0 = 1 THEN 2 ELSE 3 END)
                WHEN p < s12 THEN 0
                WHEN p = s12 THEN 1 + (r + f + g + c) % 3
                WHEN p = s12 + 1 THEN 1 + (r + f + g + c + 1) % 3
                ELSE (r + 3 * f + 5 * g + 7 * c + (p - s12 - 2)) % 2
           END AS m,
           CASE WHEN p < 36 THEN (r + f + g + c + p) % 2
                WHEN p = s12 THEN (r + f + g + c) % 2
                WHEN p = s12 + 1 THEN (r + f + g + c + 1) % 2
                ELSE (r + f + g + c + (p - s12 - 2)) % 2
           END AS neg,
           CASE WHEN p < 24 THEN 0 WHEN p < 36 THEN 1 ELSE 2 END AS grp
         FROM prows),
       ev AS (
         SELECT v.r, v.m, v.neg,
           (3 * ((v.gg - 210) - (2 + 2 * v.ss) *
                 (s.sf + CASE WHEN v.p >= v.s12 THEN v.pf ELSE 0 END))
            + 60) // 4 AS e
         FROM vals v JOIN sfe s
           ON v.r = s.r AND v.f = s.f AND v.c = s.c AND v.g = s.g
          AND v.grp = s.grp),
       qv AS ( -- cube-domain Q15: shift up, or round-half-even down
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
           CASE WHEN e >= 0
             THEN CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)
             ELSE fq + CASE WHEN 2 * rp > b THEN 1
                            WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                            ELSE 0 END
           END AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM (
           SELECT r, m, neg, e,
             (CAST(1 AS BIGINT) << (CASE WHEN e < 0 THEN -e ELSE 0 END)) AS b,
             (CAST(m AS BIGINT) * m * m * m)
               // (CAST(1 AS BIGINT) << (CASE WHEN e < 0 THEN -e ELSE 0 END)) AS fq,
             (CAST(m AS BIGINT) * m * m * m)
               % (CAST(1 AS BIGINT) << (CASE WHEN e < 0 THEN -e ELSE 0 END)) AS rp
           FROM ev))
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample, true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q201 — MPEG-1 Layer III MIXED BLOCKS (block_type 2 +
  // mixed_block_flag): granule f%2 of every (frame, channel) is a
  // mixed granule — long bands 0-7 over lines 0-35 (long
  // scalefactors, slen1), short sfbs 3+ from line 36 (sfb-major
  // window-minor scalefactors: slen1 through sfb 5, slen2 from 6;
  // per-window subblock gains in the exponent) — the other granule
  // silent long, so reservoir accounting crosses the mixed boundary
  // every frame. Values run past the big values into count1 so short
  // sfb 6 (slen2) is exercised; the mixed line layout reuses the
  // pure-short position map from line 36 (short sfbs 0-2 are 4+4+4
  // wide at every MPEG-1 rate). The oracle replays the long-band map,
  // the short (sfb, window) map across per-rate widths, both
  // scalefactor laws and the subblock-gain exponent per sample.
  private val Mp3MixN = 42

  def q201(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3MixedFixture(s, Mp3MixN)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q201Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE WHEN (r // 3) % 3 = 0 THEN 1 ELSE 2 END AS ch,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf,
           CASE r % 3 WHEN 1 THEN 84 ELSE 90 END AS bvend,
           CASE r % 3 WHEN 1 THEN 6 ELSE 8 END AS w5,
           CASE r % 3 WHEN 2 THEN 12 ELSE 10 END AS w6
         FROM range(0, $Mp3MixN) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS ( -- the mixed granule of frame f is g = f % 2
         SELECT r, bvend, w5, w6, f, f % 2 AS g,
                unnest([c for c in range(0, ch)]) AS c
         FROM frows),
       gc AS (
         SELECT r, bvend, w5, w6, f, g, c,
           210 + 4 * ((r + f + 2 * g + 3 * c) % 4) AS gg,
           (r + f + c) % 2 AS ss,
           (r + 2 * f + 3 * g + 5 * c) % 16 AS scomp,
           1 + (r + f + g + c) % 3 AS t0
         FROM crows),
       prows AS (
         SELECT *, unnest([p for p in range(0, bvend + 12)]) AS p FROM gc),
       pos AS ( -- long band for lines 0-35, short (sfb, window) after
         SELECT *,
           CASE WHEN p < 24 THEN p // 4 WHEN p < 30 THEN 6
                WHEN p < 36 THEN 7
                WHEN p < 48 THEN 3 WHEN p < 66 THEN 4
                WHEN p < bvend THEN 5 ELSE 6 END AS band,
           CASE WHEN p < 36 THEN 0
                WHEN p < 48 THEN (p - 36) // 4
                WHEN p < 66 THEN (p - 48) // 6
                WHEN p < bvend THEN (p - 66) // w5
                ELSE (p - bvend) // w6 END AS w
         FROM prows),
       vals AS (
         SELECT r, f, g, c, gg, ss, scomp, p, band, w,
           CASE WHEN p < 36 THEN (r*7 + f*5 + g*3 + c*9 + p)
                  % (CASE WHEN t0 = 1 THEN 2 ELSE 3 END)
                WHEN p < bvend THEN (r*11 + f*3 + g*7 + c*5 + p) % 4
                ELSE (r + 3*f + 5*g + 7*c + (p - bvend)) % 2 END AS m,
           (r + f + g + c + p) % 2 AS neg
         FROM pos),
       sfl AS ( -- per-sample slen, then the fitted scalefactor law
         SELECT *,
           CASE WHEN p < 36 OR band < 6
             THEN [0,0,0,0,3,1,1,1,2,2,2,3,3,3,4,4][1 + scomp]
             ELSE [0,1,2,3,0,1,2,3,1,2,3,1,2,3,2,3][1 + scomp]
           END AS slv,
           CASE WHEN p < 36 THEN r + 2*f + 3*g + 5*c + 13 * band
                ELSE r + 2*f + 3*g + 5*c + 7 * band + 11 * w END AS sfbase
         FROM vals),
       ev AS (
         SELECT r, m, neg,
           (3 * ((gg - 210)
                 - CASE WHEN p >= 36
                     THEN 8 * ((r + f + g + c + w) % 8) ELSE 0 END
                 - (2 + 2 * ss) *
                   (CASE WHEN ss = 1 THEN sfbase % (1 << slv)
                         WHEN slv = 0 THEN 0
                         ELSE 2 * (sfbase % (1 << (slv - 1))) END))
            + 60) // 4 AS e
         FROM sfl),
       qv AS ( -- e <= -63 underflows to exactly 0 (engine clamp parity)
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
           CASE WHEN e >= 0
             THEN CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)
             WHEN e <= -63 THEN 0
             ELSE fq + CASE WHEN 2 * rp > b THEN 1
                            WHEN 2 * rp = b AND fq % 2 <> 0 THEN 1
                            ELSE 0 END
           END AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM (
           SELECT r, m, neg, e,
             (CAST(1 AS BIGINT) <<
              (CASE WHEN e < 0 THEN least(-e, 62) ELSE 0 END)) AS b,
             (CAST(m AS BIGINT) * m * m * m)
               // (CAST(1 AS BIGINT) <<
                   (CASE WHEN e < 0 THEN least(-e, 62) ELSE 0 END)) AS fq,
             (CAST(m AS BIGINT) * m * m * m)
               % (CAST(1 AS BIGINT) <<
                  (CASE WHEN e < 0 THEN least(-e, 62) ELSE 0 END)) AS rp
           FROM ev))
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample, true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""

  // ---------------------------------------------------------------
  // q202 — ID3-WRAPPED MP3 decode: the real-world MP3 FILE shape.
  // Nearly every MP3 in the wild opens with an ID3v2 tag and many
  // close with the 128-byte ID3v1 trailer — streams the raw decoder
  // used to strict-reject at byte 0. The fixture wraps real Layer III
  // audio with REAL ID3v2 frames (both tag majors, padding) on ids
  // ≢ 2 (mod 3) and an ID3v1 "TAG" trailer on even ids (v2-only /
  // v1-only / both / neither across the corpus); the decoder locates
  // the audio via the syncsafe tag size and the exact-128-byte
  // trailer rule, and the decode output is tag-invariant — the
  // oracle replays only the audio laws. Malformed tags (bad syncsafe
  // byte, truncated tag, major out of range) strict-reject
  // (Mp3Layer3Spec's matrix).
  private val Mp3Id3N = 42

  def q202(s: SparkSession, dir: String): DataFrame = {
    val fx = graft.operators.Multimodal.mp3L3Id3Fixture(s, Mp3Id3N)
    graft.operators.Multimodal.decodeMp3L3(fx, "id", "media")
      .select(col("id"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("total_samples"),
        col("n_decoded"), col("huff_sum"), col("value_sum"),
        col("min_sample"), col("max_sample"), col("valid"))
      .orderBy("id")
  }

  val q202Sql: String =
    s"""WITH base AS (
         SELECT r,
           CASE r % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           CASE WHEN (r // 3) % 3 = 0 THEN 1 ELSE 2 END AS ch,
           CASE r % 2 WHEN 0 THEN 256 ELSE 320 END AS kbps,
           2 + r % 3 AS nf
         FROM range(0, $Mp3Id3N) t(r)),
       frows AS (
         SELECT *, unnest([f for f in range(0, nf)]) AS f FROM base),
       crows AS (
         SELECT *, unnest([c for c in range(0, ch)]) AS c FROM frows),
       gc AS (SELECT r, f, c, unnest([0, 1]) AS g FROM crows),
       gc2 AS (
         SELECT r, f, c, g,
           15 - 3 * ((r + f + g + c) % 4) AS e,
           CASE WHEN 1 + (r + f + g + c) % 3 = 1 THEN 2 ELSE 3 END AS mx0
         FROM gc),
       prows AS (SELECT *, unnest([p for p in range(0, 52)]) AS p FROM gc2),
       vals AS (
         SELECT r, e,
           CASE WHEN p < 24 THEN (r*7 + f*5 + g*3 + c*9 + p) % mx0
                WHEN p < 40 THEN (r*11 + f*3 + g*7 + c*5 + p) % 4
                ELSE (r + 3*f + 5*g + 7*c + (p - 40)) % 2 END AS m,
           (r + f + g + c + p) % 2 AS neg
         FROM prows),
       qv AS (
         SELECT r,
           CASE WHEN neg = 1 AND m <> 0 THEN -1 ELSE 1 END *
             (CAST(m AS BIGINT) * m * m * m * (CAST(1 AS BIGINT) << e)) AS q,
           CASE WHEN neg = 1 AND m <> 0 THEN -m ELSE m END AS hv
         FROM vals)
       SELECT base.r AS id, CAST(rate AS INT) AS sample_rate,
         CAST(kbps AS INT) AS bitrate_kbps, CAST(ch AS INT) AS channels,
         CAST(nf AS INT) AS n_frames,
         CAST(nf * 1152 * ch AS BIGINT) AS total_samples,
         a.ndec AS n_decoded, a.hsum AS huff_sum, a.vsum AS value_sum,
         a.vmin AS min_sample, a.vmax AS max_sample, true AS valid
       FROM base JOIN (
         SELECT r, CAST(count(*) AS BIGINT) AS ndec,
                CAST(sum(hv) AS BIGINT) AS hsum,
                CAST(sum(q) AS BIGINT) AS vsum,
                CAST(min(q) AS BIGINT) AS vmin,
                CAST(max(q) AS BIGINT) AS vmax
         FROM qv GROUP BY r) a ON base.r = a.r
       ORDER BY id"""


  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_label_propagation" -> (q125 _),
    "q126_pmi_cooccur" -> (q126 _),
    "q127_snapshot_diff" -> (q127 _),
    "q128_rolling_mad" -> (q128 _),
    "q129_hash_split" -> (q129 _),
    "q130_encoding_quality" -> (q130 _),
    "q131_copurchase_topk" -> (q131 _),
    "q132_transition_matrix" -> (q132 _),
    "q133_integrity_checksum" -> (q133 _),
    "q134_negative_sampling" -> (q134 _),
    "q135_record_linkage" -> (q135 _),
    "q136_attribution" -> (q136 _),
    "q137_grouped_quantile_bins" -> (q137 _),
    "q138_fk_audit" -> (q138 _),
    "q139_streaming_enrich" -> (q139 _),
    "q140_running_distinct" -> (q140 _),
    "q141_ohlc_bars" -> (q141 _),
    "q142_burst_detection" -> (q142 _),
    "q143_coverage_gaps" -> (q143 _),
    "q144_flac_decode" -> (q144 _),
    "q145_mp4_moov" -> (q145 _),
    "q146_gif_frames" -> (q146 _),
    "q147_avi_frames" -> (q147 _),
    "q148_flac_pcm" -> (q148 _),
    "q149_flac_lpc" -> (q149 _),
    "q150_flac_stereo" -> (q150 _),
    "q151_adpcm_wav" -> (q151 _),
    "q152_g711_wav" -> (q152 _),
    "q153_url_normalize" -> (q153 _),
    "q154_audio_catalog" -> (q154 _),
    "q155_mp1_decode" -> (q155 _),
    "q156_mp2_decode" -> (q156 _),
    "q157_warc_extract" -> (q157 _),
    "q158_html_text" -> (q158 _),
    "q159_web_pipeline" -> (q159 _),
    "q160_main_content" -> (q160 _),
    "q161_charset_sniff" -> (q161 _),
    "q162_robots_policy" -> (q162 _),
    "q163_unicode_norm" -> (q163 _),
    "q164_zip_extract" -> (q164 _),
    "q165_tar_extract" -> (q165 _),
    "q166_eml_extract" -> (q166 _),
    "q167_subtitle_extract" -> (q167 _),
    "q168_sitemap_extract" -> (q168 _),
    "q169_feed_extract" -> (q169 _),
    "q170_tfrecord_extract" -> (q170 _),
    "q171_epub_extract" -> (q171 _),
    "q172_wiki_extract" -> (q172 _),
    "q173_ipynb_extract" -> (q173 _),
    "q174_pdf_extract" -> (q174 _),
    "q175_markdown_extract" -> (q175 _),
    "q176_diff_extract" -> (q176 _),
    "q177_latex_extract" -> (q177 _),
    "q178_id3_catalog" -> (q178 _),
    "q179_docx_extract" -> (q179 _),
    "q180_xlsx_extract" -> (q180 _),
    "q181_bio_extract" -> (q181 _),
    "q182_access_log" -> (q182 _),
    "q183_po_extract" -> (q183 _),
    "q184_tmx_extract" -> (q184 _),
    "q185_ics_extract" -> (q185 _),
    "q186_doc_catalog" -> (q186 _),
    "q187_sqldump_extract" -> (q187 _),
    "q188_mp3_decode" -> (q188 _),
    "q189_rle8_video" -> (q189 _),
    "q190_image_neardup" -> (q190 _),
    "q191_energy_segments" -> (q191 _),
    "q192_resample_audio" -> (q192 _),
    "q193_exif_extract" -> (q193 _),
    "q194_compressed_shards" -> (q194 _),
    "q195_jsonl_shards" -> (q195 _),
    "q196_image_neardup_cross" -> (q196 _),
    "q197_mp3_short_blocks" -> (q197 _),
    "q198_mp3_esc_tables" -> (q198 _),
    "q199_mp3_ms_stereo" -> (q199 _),
    "q200_mp3_transition_blocks" -> (q200 _),
    "q201_mp3_mixed_blocks" -> (q201 _),
    "q202_mp3_id3_wrapped" -> (q202 _))

  val oracles: Map[String, String] = Map(
    "q125_label_propagation" -> q125Sql,
    "q126_pmi_cooccur" -> q126Sql,
    "q127_snapshot_diff" -> q127Sql,
    "q128_rolling_mad" -> q128Sql,
    "q129_hash_split" -> q129Sql,
    "q130_encoding_quality" -> q130Sql,
    "q131_copurchase_topk" -> q131Sql,
    "q132_transition_matrix" -> q132Sql,
    "q133_integrity_checksum" -> q133Sql,
    "q134_negative_sampling" -> q134Sql,
    "q135_record_linkage" -> q135Sql,
    "q136_attribution" -> q136Sql,
    "q137_grouped_quantile_bins" -> q137Sql,
    "q138_fk_audit" -> q138Sql,
    "q139_streaming_enrich" -> q139Sql,
    "q140_running_distinct" -> q140Sql,
    "q141_ohlc_bars" -> q141Sql,
    "q142_burst_detection" -> q142Sql,
    "q143_coverage_gaps" -> q143Sql,
    "q144_flac_decode" -> q144Sql,
    "q145_mp4_moov" -> q145Sql,
    "q146_gif_frames" -> q146Sql,
    "q147_avi_frames" -> q147Sql,
    "q148_flac_pcm" -> q148Sql,
    "q149_flac_lpc" -> q149Sql,
    "q150_flac_stereo" -> q150Sql,
    "q151_adpcm_wav" -> q151Sql,
    "q152_g711_wav" -> q152Sql,
    "q153_url_normalize" -> q153Sql,
    "q154_audio_catalog" -> q154Sql,
    "q155_mp1_decode" -> q155Sql,
    "q156_mp2_decode" -> q156Sql,
    "q157_warc_extract" -> q157Sql,
    "q158_html_text" -> q158Sql,
    "q159_web_pipeline" -> q159Sql,
    "q160_main_content" -> q160Sql,
    "q161_charset_sniff" -> q161Sql,
    "q162_robots_policy" -> q162Sql,
    "q163_unicode_norm" -> q163Sql,
    "q164_zip_extract" -> q164Sql,
    "q165_tar_extract" -> q165Sql,
    "q166_eml_extract" -> q166Sql,
    "q167_subtitle_extract" -> q167Sql,
    "q168_sitemap_extract" -> q168Sql,
    "q169_feed_extract" -> q169Sql,
    "q170_tfrecord_extract" -> q170Sql,
    "q171_epub_extract" -> q171Sql,
    "q172_wiki_extract" -> q172Sql,
    "q173_ipynb_extract" -> q173Sql,
    "q174_pdf_extract" -> q174Sql,
    "q175_markdown_extract" -> q175Sql,
    "q176_diff_extract" -> q176Sql,
    "q177_latex_extract" -> q177Sql,
    "q178_id3_catalog" -> q178Sql,
    "q179_docx_extract" -> q179Sql,
    "q180_xlsx_extract" -> q180Sql,
    "q181_bio_extract" -> q181Sql,
    "q182_access_log" -> q182Sql,
    "q183_po_extract" -> q183Sql,
    "q184_tmx_extract" -> q184Sql,
    "q185_ics_extract" -> q185Sql,
    "q186_doc_catalog" -> q186Sql,
    "q187_sqldump_extract" -> q187Sql,
    "q188_mp3_decode" -> q188Sql,
    "q189_rle8_video" -> q189Sql,
    "q190_image_neardup" -> q190Sql,
    "q191_energy_segments" -> q191Sql,
    "q192_resample_audio" -> q192Sql,
    "q193_exif_extract" -> q193Sql,
    "q194_compressed_shards" -> q194Sql,
    "q195_jsonl_shards" -> q195Sql,
    "q196_image_neardup_cross" -> q196Sql,
    "q197_mp3_short_blocks" -> q197Sql,
    "q198_mp3_esc_tables" -> q198Sql,
    "q199_mp3_ms_stereo" -> q199Sql,
    "q200_mp3_transition_blocks" -> q200Sql,
    "q201_mp3_mixed_blocks" -> q201Sql,
    "q202_mp3_id3_wrapped" -> q202Sql)
}
