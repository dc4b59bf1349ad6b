package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / long-context
  * preprocessing step that turns each document into fixed-size token
  * windows with overlap (chunk i starts at i·stride; the final chunk
  * keeps the tail remainder). Pure per-row computation: tokenize
  * once, derive the chunk count in closed form, explode a
  * `sequence()` — NO shuffle at all (one Generate inside the scan
  * stage), so throughput is scan-bound at any corpus size.
  */
object Chunking {

  /** One row per (doc, chunk): 0-based chunk_idx, start_tok,
    * chunk_len = min(chunkTokens, n - start), plus the first/last
    * token of the chunk (slice witnesses — they make an oracle catch
    * off-by-one slicing immediately). Chunk count for an n-token doc
    * is 1 + ⌈max(n − chunkTokens, 0) / stride⌉ — every token is
    * covered, consecutive chunks overlap by chunkTokens − stride, and
    * the last chunk may be short (never empty). Tokenization is
    * single-space split (corpus convention, q99). All integer
    * arithmetic on non-negative values: `div` ≡ floor division in
    * every engine. */
  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"slidingChunks: chunkTokens >= 1")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"slidingChunks: stride in [1, chunkTokens], got $strideTokens")
    val C = chunkTokens.toLong
    val S = strideTokens.toLong
    df.select(col(idCol), split(col(textCol), " ", -1).as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          expr(s"(greatest(_n - ${C}L, 0L) + ${S - 1}L) div ${S}L"))))
      .withColumn("start_tok", col("chunk_idx") * S)
      .withColumn("chunk_len", least(lit(C), col("_n") - col("start_tok")))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        col("chunk_len"),
        element_at(col("_toks"), (col("start_tok") + 1L).cast("int"))
          .as("head_tok"),
        element_at(col("_toks"),
          (col("start_tok") + col("chunk_len")).cast("int")).as("tail_tok"))
  }
}
