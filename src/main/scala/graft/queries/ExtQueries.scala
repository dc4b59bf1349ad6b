package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.RollingHash
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data-pipeline queries (SURVEY.md §7.1 ext): dedup,
  * similarity search, text analysis, multimodal plumbing — over the
  * driver's `documents`/`embeddings` tables. Oracle-checked where the
  * computation is SQL-expressible in DuckDB; hash-based operators
  * (MinHash itself, SimHash, rolling hash) get rows-only checks plus
  * closed-form ScalaTest specs.
  *
  * q23 (MinHash LSH) deliberately shares q22's oracle: with 32
  * bands × 4 rows and the testdata's pair separation (true pairs at
  * J ≥ 0.9, background ≤ 0.07), candidate recall is 1 − ~1e-15, so
  * LSH + exact verification must equal the exact join.
  */
object ExtQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------
  // q21 — exact dedup (hash groupBy on content key)
  def q21(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
      .select(col("keep_id"), col("n_dups"))
      .orderBy("keep_id")

  val q21Sql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
       FROM documents GROUP BY text ORDER BY keep_id"""

  private val jaccardOracle =
    """WITH toks AS (SELECT doc_id, string_split(text,' ') w FROM documents),
       sh AS (SELECT doc_id, list_distinct([array_to_string(w[i:i+2],' ')
                for i in range(1, len(w)-1)]) s FROM toks)
       SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(len(list_intersect(a.s,b.s)) AS BIGINT) AS n_inter,
         CAST(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)) AS BIGINT) AS n_union
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
             >= 0.5*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))
       ORDER BY a, b"""

  // ---------------------------------------------------------------
  // q22 — n-gram Jaccard near-dup join (inverted index + exact verify)
  def q22(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardJoin(t(s, dir, "documents"), "doc_id", "text", 0.5)
      .orderBy("a", "b")

  // ---------------------------------------------------------------
  // q23 — MinHash+LSH near-dup join (banded candidates + exact verify)
  def q23(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text", 0.5)
      .orderBy("a", "b")

  // ---------------------------------------------------------------
  // q24 — SimHash fingerprints + Hamming-≤3 near-dup pairs
  // (hash-defined values ⇒ rows-only; semantics in DedupSpec)
  def q24(s: SparkSession, dir: String): DataFrame = {
    val fps = Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")
    Dedup.simhashNearDup(fps).orderBy("a", "b")
  }

  // ---------------------------------------------------------------
  // q25 — exact cosine top-5 neighbors (brute force, broadcast corpus)
  def q25(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 5)
      .select(col("q"), col("n"))
      .orderBy("q", "n")
  }

  val q25Sql: String =
    """SELECT q, n FROM (
       SELECT a.vec_id AS q, b.vec_id AS n,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding,b.embedding) DESC,
                    b.vec_id) AS rn
       FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id)
       WHERE rn <= 5 ORDER BY q, n"""

  // ---------------------------------------------------------------
  // q26 — ANN top-5 via IVF (sampled k-means quantizer + nprobe list
  // search; recall vs q25 asserted in SimilaritySpec; approximate ⇒
  // rows-only)
  def q26(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.ivfTopK(e, "vec_id", "embedding", 5)
      .select(col("q"), col("rank"), col("n"))
      .orderBy("q", "rank")
  }

  // ---------------------------------------------------------------
  // q27 — heuristic language ID (script + stopword voting; rows-only,
  // accuracy asserted on real multilingual samples in TextSpec)
  def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // q28 — quality metrics (pure arithmetic ⇒ oracle-exact doubles)
  def q28(s: SparkSession, dir: String): DataFrame = {
    val metrics = TextAnalysis.qualityMetrics(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id") +: metrics.map { case (n, c) => c.as(n) }
        :+ TextAnalysis.qualityPass(col("text")).as("pass"): _*)
      .orderBy("doc_id")
  }

  val q28Sql: String =
    """SELECT doc_id,
       length(text) AS n_chars,
       len(string_split_regex(trim(text), '\s+')) AS n_words,
       CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
         / len(string_split_regex(trim(text), '\s+')) AS avg_word_len,
       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
         / length(text) AS punct_ratio,
       CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS DOUBLE)
         / len(string_split_regex(trim(text), '\s+')) AS stopword_ratio,
       CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
         / length(text) AS alpha_ratio,
       (len(string_split_regex(trim(text), '\s+')) >= 5
        AND CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(trim(text), '\s+')) BETWEEN 2.0 AND 14.0
        AND CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
            / length(text) <= 0.2
        AND CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
            / length(text) >= 0.5) AS pass
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q29 — token counting: whitespace + BPE-ish subword pieces
  def q29(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_tokens"))
      .orderBy("doc_id")

  val q29Sql: String =
    """SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpeish_tokens
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q30 — rolling-hash fingerprint (native codegen Expression;
  // hash-defined ⇒ rows-only, spec-tested against a reference impl)
  def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), RollingHash.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // q31 — multimodal plumbing: deterministic binary fixture → header
  // decode → metadata (codec stubbed; plumbing real — rows-only)
  def q31(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMeta(Multimodal.fixture(s, 60), "id", "media")
      .orderBy("id")

  // ---------------------------------------------------------------
  // q33 — embedding-cosine near-dup pairs (LSH buckets + exact
  // verify). The testdata has no high-cosine pairs, so the query
  // plants one perturbed twin per corpus vector (deterministic) and
  // must recover exactly the twin pairs at cos ≥ 0.99 (rows-only;
  // pair-exactness asserted in SimilaritySpec).
  def q33(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val twins = e.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + when(i === 0, lit(0.05f)).otherwise(lit(0.0f)))
        .as("embedding"))
    Similarity.cosineNearDup(e.select("vec_id", "embedding").union(twins),
        "vec_id", "embedding", threshold = 0.99)
      .select(col("a"), col("b"))
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------
  // q36 — full near-dup deduplication: MinHash-LSH pairs → connected
  // components (iterative min-label) → keep each cluster's min id.
  // Oracle: recursive-CTE transitive closure over the exact Jaccard
  // pair graph.
  def q36(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupNear(t(s, dir, "documents"), "doc_id", "text", 0.5)
      .select(col("doc_id"))
      .orderBy("doc_id")

  val q36Sql: String =
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text,' ') w FROM documents),
       sh AS (SELECT doc_id, list_distinct([array_to_string(w[i:i+2],' ')
                for i in range(1, len(w)-1)]) s FROM toks),
       p AS (SELECT a.doc_id AS a, b.doc_id AS b
             FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
                   >= 0.5*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))),
       e AS (SELECT a AS x, b AS y FROM p UNION ALL SELECT b, a FROM p),
       reach(id, r) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.x, reach.r FROM e JOIN reach ON reach.id = e.y)
       SELECT id AS doc_id FROM (SELECT id, min(r) AS m FROM reach GROUP BY id)
       WHERE id = m ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // q42 — corpus vocabulary statistics: term frequency + document
  // frequency per token (the integer core of TF-IDF; scores stay
  // integer-exact across engines).
  def q42(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy("token")

  val q42Sql: String =
    """SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents)
       GROUP BY token ORDER BY token"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_dedup_exact" -> (q21 _),
    "q22_jaccard_join" -> (q22 _),
    "q23_minhash_lsh" -> (q23 _),
    "q24_simhash" -> (q24 _),
    "q25_cosine_topk" -> (q25 _),
    "q26_ann_lsh" -> (q26 _),
    "q27_langid" -> (q27 _),
    "q28_quality" -> (q28 _),
    "q29_tokens" -> (q29 _),
    "q30_fingerprint" -> (q30 _),
    "q31_multimodal" -> (q31 _),
    "q33_embed_neardup" -> (q33 _),
    "q36_dedup_clusters" -> (q36 _),
    "q42_vocab_stats" -> (q42 _),
  )

  val oracles: Map[String, String] = Map(
    "q21_dedup_exact" -> q21Sql,
    "q22_jaccard_join" -> jaccardOracle,
    "q23_minhash_lsh" -> jaccardOracle,
    "q25_cosine_topk" -> q25Sql,
    "q28_quality" -> q28Sql,
    "q29_tokens" -> q29Sql,
    "q36_dedup_clusters" -> q36Sql,
    "q42_vocab_stats" -> q42Sql,
  )
}
