package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting (SURVEY.md §7.1 ext). All pure
  * `Column` expressions — codegen'd, shuffle-free, scale linearly. */
object TextAnalysis {

  /** Per-language stopword anchors for latin-script languages. Tiny
    * on purpose: the heuristic is frequency-of-anchor-words, the
    * classic cheap n-gram/stopword language detector. */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "une", "dans", "que"),
    "it" -> Seq("il", "di", "che", "la", "per", "con", "del", "una", "sono", "non"),
    "pt" -> Seq("o", "de", "que", "do", "da", "em", "um", "para", "com", "uma"))

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Lowercased whitespace tokens — the shared input of the stopword
    * voters. Project this ONCE into a named column before scoring:
    * the six voters sit in a conditional branch of the script
    * when-chain, where codegen's subexpression elimination does not
    * hoist, so an inline `split` would re-tokenize the text 6×/row. */
  def langIdTokens(text: Column): Column = split(lower(text), "\\s+")

  /** Per-language distinct-anchor vote counts over [[langIdTokens]],
    * packed into ONE array so the argmax evaluates each score once
    * (a when-chain would re-evaluate every score per branch).
    * Set-intersect = hash-set build per row instead of
    * |tokens|×|stopwords| equality tests. */
  def langIdScores(tokens: Column): Column =
    array(stopwords.map { case (_, words) =>
      size(array_intersect(tokens, array(words.map(lit): _*)))
    }: _*)

  /** Final decision given precomputed [[langIdScores]]: script
    * detection first (CJK/kana/hangul/cyrillic/arabic are
    * unambiguous), then the latin-script stopword argmax; 'und' when
    * nothing matches. */
  def langIdDecide(text: Column, scores: Column): Column = {
    val names = array(stopwords.map { case (lang, _) => lit(lang) }: _*)
    val best = array_max(scores)
    // array_position returns the FIRST max ⇒ earlier languages win ties
    val latinVote = when(best > 0,
      element_at(names, array_position(scores, best).cast("int")))
      .otherwise(lit("und"))
    // rlike (first-match, not a full count) — script presence is a
    // boolean question; kana before CJK: Japanese mixes kanji + kana
    when(text.rlike("[\\u3040-\\u30ff]"), "ja")
      .when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(text.rlike("[\\uac00-\\ud7af]"), "ko")
      .when(text.rlike("[\\u0400-\\u04ff]"), "ru")
      .when(text.rlike("[\\u0600-\\u06ff]"), "ar")
      .when(text.rlike("[\\u0370-\\u03ff]"), "el")
      .otherwise(latinVote)
  }

  /** Heuristic language ID as one expression (convenience form;
    * tokenizes inline 6×). Hot paths should use [[langIdDF]] /
    * the staged columns instead. */
  def langId(text: Column): Column =
    langIdDecide(text, langIdScores(langIdTokens(text)))

  /** Tokenize-once language ID over a DataFrame: three stacked
    * Projects (tokens → scores → decision). CollapseProject keeps
    * them separate (each intermediate is non-cheap and referenced
    * more than once) while whole-stage codegen fuses all three into
    * one pass, so the text is split exactly once per row. */
  def langIdDF(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val keep = df.columns.map(col)
    df.withColumn("__lid_toks", langIdTokens(col(textCol)))
      .withColumn("__lid_scores", langIdScores(col("__lid_toks")))
      .select(keep :+
        langIdDecide(col(textCol), col("__lid_scores")).as(outCol): _*)
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))

  /** LEGACY heuristic piece count: letter runs, digit runs, and
    * single non-alphanumeric marks each count as one token. Kept for
    * the q29 gate and zero-dependency callers; the token count of
    * record is [[bpeTokenCount]] (a real trained tokenizer). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** REAL subword token count: total greedy-BPE pieces over the
    * checked-in merge table ([[graft.functions.Bpe]], Sennrich et
    * al. 2016) — the default for token budgeting. Shuffle-free,
    * codegen Expression per row; oracle-gated by q57. */
  def bpeTokenCount(text: Column): Column =
    aggregate(graft.functions.Bpe.pieceCounts(text), lit(0L), _ + _)

  /** Quality metrics (length / punctuation / stopword ratios — the
    * classic cheap quality filters for web-scale corpora). All
    * single-division doubles over integer counts, so every engine
    * computes bit-identical values. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = split(trim(text), "\\s+")
    val nWords = wsTokenCount(text)
    val enStop = stopwords.head._2
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "avg_word_len" -> (length(regexp_replace(text, "\\s+", "")).cast("double") /
        nWords.cast("double")),
      "punct_ratio" -> (countMatches(text, "[.,;:!?]").cast("double") /
        nChars.cast("double")),
      // occurrence count (dups kept — array_intersect would dedup and
      // change the ratio); isin compiles to one In membership test
      // instead of a 10-term OR chain per token
      "stopword_ratio" -> (size(filter(split(lower(text), "\\s+"),
        t => t.isin(enStop: _*))).cast("double") /
        nWords.cast("double")),
      "alpha_ratio" -> (countMatches(text, "[A-Za-z]").cast("double") /
        nChars.cast("double")))
  }

  // PII patterns shared by counting and scrubbing — deliberately
  // restricted to constructs Java regex and RE2 (DuckDB) interpret
  // identically, so the oracle replays them verbatim
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ ]+"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** PII occurrence counts over the ORIGINAL text (the audit signal
    * logged before scrubbing). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> countMatches(text, EmailRe),
    "n_urls" -> countMatches(text, UrlRe),
    "n_ips" -> countMatches(text, Ipv4Re))

  /** Scrub PII spans with typed placeholders — the compliance pass
    * web-corpus pipelines run before training. URL first (addresses
    * embedded in URLs vanish with the URL), then email, then bare
    * IPv4. Pure Column regexp_replace chain: codegen'd, shuffle-free,
    * deterministic. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      Ipv4Re, "<IP>")

  /** Intra-document repetition counts (Rae et al. 2021 "Gopher"
    * repetition filters): total vs distinct n-token windows. A
    * low distinct/total ratio flags boilerplate loops and degenerate
    * generations. One O(bytes) pass per row via
    * [[graft.functions.WindowFingerprints]]; integer outputs so every
    * engine agrees exactly. */
  def repetitionCounts(text: Column, n: Int = 3): (Column, Column) = {
    val fps = graft.functions.WindowFingerprints.windowFingerprints(text, n)
    (size(fps).cast("long"), size(array_distinct(fps)).cast("long"))
  }

  /** Composite keep/drop signal: a document passes the quality gate
    * when it is long enough, word-like, and not punctuation soup. */
  def qualityPass(text: Column): Column = {
    val m = qualityMetrics(text).toMap
    (m("n_words") >= 5) && (m("avg_word_len") >= 2.0) &&
      (m("avg_word_len") <= 14.0) && (m("punct_ratio") <= 0.2) &&
      (m("alpha_ratio") >= 0.5)
  }
}
