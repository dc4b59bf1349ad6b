package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a POSITIONAL inverted index — the lookup
  * path of a corpus search / decontamination-by-phrase service. The
  * index is (term, doc, position) postings; a phrase of terms
  * t₀ t₁ … tₙ₋₁ matches at position p iff tᵢ's postings contain
  * (doc, p+i) for every i.
  *
  * Scale shape: the corpus-sized token stream is filtered to the
  * PHRASE'S OWN TERMS before anything wide happens (an index lookup,
  * not a scan — pushed into the parquet read as an isin filter), so
  * the positional intersection joins touch only matching postings:
  * |postings(t₀)| + … rows, each join an equi-join on (doc, aligned
  * position). Rare-first evaluation order (join the n-1 followers
  * onto t₀'s postings) keeps intermediate size ≤ the running
  * intersection. No windows, no crossJoin; skew would need one term
  * hot in one doc at one position — impossible by key construction.
  *
  * Tokenization is single-space split (the corpus convention, q99).
  * Output: one row per document with ≥ 1 occurrence — (doc, n_hits,
  * first_pos), positions 0-based, integer-exact. */
object PhraseSearch {

  def phraseHits(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 16,
      s"phraseHits: phrase length in [1, 16], got ${phrase.size}")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      "phraseHits: phrase terms must be non-empty single tokens")
    val postings = df
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ", -1)).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
    val anchor = postings.where(col("term") === phrase.head)
      .select(col("doc"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(postings.where(col("term") === t)
            .select(col("doc"), (col("pos") - i).as("pos")),
          Seq("doc", "pos"))
    }
    matched.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
  }
}
