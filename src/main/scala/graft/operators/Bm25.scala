package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword ranking over a document corpus (Robertson/Spärck
  * Jones probabilistic relevance — the scoring function behind
  * Lucene/Elasticsearch and the standard first-stage retriever for
  * RAG/training-data curation pipelines).
  *
  * Scale shape (100 TB): the per-document work is SHUFFLE-FREE — term
  * frequencies come from `filter()` over the token array (no explode,
  * no posting-list join: the query term set is small and known), and
  * the corpus statistics (N, Σdl, per-term document frequencies) are
  * ONE map-side-combined aggregate whose single row rides a broadcast
  * nested-loop join back onto the scan. The only exchange in a top-k
  * retrieval is the final TakeOrderedAndProject. With thousands of
  * query terms one would flip to the inverted-index plan
  * ([[Dedup]]-style posting join); for the ≤ dozens-of-terms serving
  * shape this plan reads the corpus once and shuffles nothing.
  *
  * Cross-engine exactness: `lnIdf = false` (the gated configuration)
  * replaces the classic ln-idf with its rational argument
  * (N − df + ½)/(df + ½) — the same df-monotonicity, but the score
  * then uses ONLY IEEE-754 correctly-rounded ops (+, −, ×, ÷) in a
  * PINNED evaluation order, so the double is bit-identical in any
  * compliant engine (the suite's q20-sqrt precedent; ln is the one op
  * libms disagree on). `lnIdf = true` gives the textbook
  * ln(1 + (N − df + ½)/(df + ½)) for production use. */
object Bm25 {

  /** Per-document BM25 evidence and score for a fixed term list:
    * (id, dl, tf_<term>…, score). k1/b are the classic defaults. */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      lnIdf: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one query term")
    require(terms.distinct == terms, s"bm25: duplicate query terms in $terms")
    val w = split(col(textCol), " ")
    val tfCols = terms.map(t =>
      size(filter(w, x => x === lit(t))).cast("long").as(s"tf_$t"))
    val base = df.select(
      col(idCol).as("id") +: size(w).cast("long").as("dl") +: tfCols: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl") +:
        terms.map(t =>
          sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t")): _*)
    val scored = base.crossJoin(broadcast(stats))
    // pinned arithmetic: every subexpression below is IEEE
    // correctly-rounded and explicitly ordered — keep textually in
    // sync with the DuckDB oracle formulation
    val nD = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / nD
    def contrib(t: String): Column = {
      val dfD = col(s"df_$t").cast("double")
      val tfD = col(s"tf_$t").cast("double")
      val idfRational = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
      val idf = if (lnIdf) log(idfRational + lit(1.0)) else idfRational
      val tfPart = (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
      idf * tfPart
    }
    val score = terms.map(contrib).reduceLeft(_ + _) // left-assoc, term order
    scored.select(
      col("id") +: col("dl") +: terms.map(t => col(s"tf_$t")) :+
        score.as("score"): _*)
  }

  /** Top-k retrieval: [[score]] then TakeOrderedAndProject on
    * (score desc, id) — the id tiebreak makes the cut deterministic. */
  def topK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      lnIdf: Boolean = true): DataFrame =
    score(df, idCol, textCol, terms, k1, b, lnIdf)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
}
