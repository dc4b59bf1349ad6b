package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality filter — the CCNet/KenLM-style "does
  * a reference LM find this document plausible" gate, re-expressed
  * for integer-exact cross-engine comparison.
  *
  * Model: add-one-smoothed bigram LM over single-space word tokens
  * (the dedup family's tokenization): P(w2|w1) = (c12+1)/(c1+V) with
  * c12 = training bigram count, c1 = training unigram count, V =
  * training vocab size. Instead of summing floating-point logs (whose
  * value would hinge on libm ulps and fold order), a transition is
  * SURPRISING when P < 1/D for an integer threshold denominator D —
  * i.e. D·(c12+1) < c1+V, exact long arithmetic — and a document's
  * quality evidence is (n_bigrams, n_surprise). The pass rule
  * F·n_surprise ≤ n_bigrams (surprise fraction ≤ 1/F) is a single
  * integer cross-multiplication (invariant: ratio metrics never
  * divide twice).
  *
  * Scale shape (100 TB): training is two map-side-combined count
  * aggregates (unigram, bigram) — the same shuffle profile as exact
  * dedup; scoring pre-aggregates per-(doc, bigram) multiplicities
  * before the model joins, so the two equi-joins carry one row per
  * DISTINCT doc-bigram, and the 1-row vocab frame rides a broadcast.
  * The model tables shuffle-join on token keys (a corpus-sized model
  * cannot broadcast); stopword-pair keys are Zipf-hot — at extreme
  * skew route them through [[Salting.saltedEquiJoin]] exactly like
  * the posting-index joins ([[Dedup]] hot-token guard).
  */
object LangModel {

  /** One row per bigram POSITION (multiplicity kept): (id, w1, bg)
    * with bg = "w1 w2" (single-space join is unambiguous: tokens are
    * split on that very character). Docs under 2 tokens emit no rows. */
  def bigramsFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    df.select(col(idCol).as("id"), w.as("w"))
      .where(size(col("w")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("w")) - 2),
        i => struct(
          element_at(col("w"), i + 1).as("w1"),
          concat_ws(" ",
            element_at(col("w"), i + 1),
            element_at(col("w"), i + 2)).as("bg")))).as("p"))
      .select(col("id"), col("p.w1"), col("p.bg"))
  }

  /** Trained model: bigram counts (bg, c12), unigram counts (w1, c1),
    * and the 1-row vocab size (v). All lazy count aggregates. */
  final case class BigramLm(bigrams: DataFrame, unigrams: DataFrame, vocab: DataFrame)

  def trainBigramLm(df: DataFrame, idCol: String, textCol: String): BigramLm = {
    val uni = df.select(explode(split(col(textCol), " ")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = bigramsFrame(df, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    BigramLm(big, uni, vocab)
  }

  /** Score `docs` against a trained [[BigramLm]]: per document,
    * n_tokens, n_bigrams, n_surprise (bigram positions whose smoothed
    * probability is below 1/thresholdDen), and the lm_pass gate
    * (surprise fraction ≤ 1/passFactor AND at least one bigram).
    * Unseen words/bigrams take the smoothed-zero path (c = 0). */
  def surprisalScore(
      docs: DataFrame,
      lm: BigramLm,
      idCol: String,
      textCol: String,
      thresholdDen: Long = 1024L,
      passFactor: Long = 2L): DataFrame = {
    require(thresholdDen >= 2, s"thresholdDen must be >= 2, got $thresholdDen")
    require(passFactor >= 1, s"passFactor must be >= 1, got $passFactor")
    val perDoc = bigramsFrame(docs, idCol, textCol)
      .groupBy("id", "w1", "bg").agg(count(lit(1)).as("m"))
    val scored = perDoc
      .join(lm.bigrams, Seq("bg"), "left")
      .join(lm.unigrams, Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocab))
      .withColumn("surprise",
        lit(thresholdDen) * (coalesce(col("c12"), lit(0L)) + 1L) <
          coalesce(col("c1"), lit(0L)) + col("v"))
      .groupBy("id")
      .agg(sum(col("m")).as("n_bigrams"),
        sum(when(col("surprise"), col("m")).otherwise(0L)).as("n_surprise"))
    docs
      .select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_surprise"), lit(0L)).as("n_surprise"),
        (coalesce(col("n_bigrams"), lit(0L)) > 0 &&
          lit(passFactor) * coalesce(col("n_surprise"), lit(0L)) <=
            coalesce(col("n_bigrams"), lit(0L))).as("lm_pass"))
  }

  /** DSIR-style domain relevance (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much its tokens lean toward a small TARGET
    * corpus versus the remaining RAW corpus, using two add-one
    * unigram models over the shared vocabulary.
    *
    * Exactness variant: instead of the paper's summed log-importance
    * weight (libm-dependent), a token is TARGET-LEANING when
    * p_target(w) > p_raw(w), decided by one integer
    * cross-multiplication — (c_t+1)·(N_r+V) > (c_r+1)·(N_t+V) — and a
    * document's evidence is (n_tokens, n_lean) plus the one-division
    * fraction. Products ride decimal(38,0) so corpus-scale counts
    * cannot overflow under ANSI mode.
    *
    * Scale shape: one conditional-count aggregate builds BOTH models
    * in a single pass over the token stream (map-side combined); the
    * scoring join carries one row per DISTINCT (doc, word) via the
    * multiplicity pre-aggregation; the totals frame is 1 row,
    * broadcast. Same shuffle profile as [[surprisalScore]].
    *
    * @param isTarget boolean Column selecting the target split
    * @return (id, n_tokens, n_lean, lean_frac, dsir_pass) where
    *         dsir_pass ⇔ passFactor·n_lean ≥ n_tokens
    */
  def domainRelevance(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      passFactor: Long = 4L): DataFrame = {
    require(passFactor >= 1, s"passFactor must be >= 1, got $passFactor")
    val toks = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
      explode(split(col(textCol), " ")).as("w"))
    // Both unigram models in one pass; V is the shared vocab.
    val stats = toks.groupBy("w").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val totals = stats.agg(
      sum(col("ct")).as("nt"), sum(col("cr")).as("nr"),
      count(lit(1)).as("v"))
    val dec = "decimal(38,0)"
    val perDocWord = toks.groupBy("id", "w").agg(count(lit(1)).as("m"))
    val leaned = perDocWord
      .join(stats, Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("lean",
        (col("ct") + 1L).cast(dec) * (col("nr") + col("v")).cast(dec) >
          (col("cr") + 1L).cast(dec) * (col("nt") + col("v")).cast(dec))
      .groupBy("id")
      .agg(sum(col("m")).as("n_tokens"),
        sum(when(col("lean"), col("m")).otherwise(0L)).as("n_lean"))
    leaned.select(col("id"), col("n_tokens"), col("n_lean"),
      (col("n_lean").cast("double") / col("n_tokens").cast("double"))
        .as("lean_frac"),
      (lit(passFactor) * col("n_lean") >= col("n_tokens")).as("dsir_pass"))
  }
}
