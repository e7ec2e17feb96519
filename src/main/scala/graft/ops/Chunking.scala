package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data preparation (SURVEY.md §2.6
  * extension): split each document into fixed-token-width chunks with
  * overlap — the context-window segmentation step that runs between
  * curation and sequence packing (long documents must become
  * model-sized pieces; overlap preserves cross-boundary context).
  *
  * Entirely MAP-ONLY: tokenize, compute the chunk count with exact
  * integer arithmetic, explode one row per chunk, slice the token array
  * per chunk. No shuffle at any size — the operator scales embarrassingly
  * and composes with [[Sampling.packSequences]] downstream.
  *
  * Chunk i covers tokens `[i·stride, i·stride + chunkTokens)` where
  * `stride = chunkTokens − overlap`; the last chunk may be shorter.
  * Chunk count is `(max(n − chunkTokens, 0) + stride − 1) div stride + 1`
  * — the `max(_, 0)` keeps the dividend non-negative so truncating and
  * flooring division agree (negative `div` truncates toward zero on the
  * JVM but floors in most SQL engines; clamping removes the divergence
  * instead of documenting it).
  */
object Chunking {

  /** One output row per (document, chunk): `(idCol, chunk_idx, chunk_text,
    * n_tok)`. Tokens are whitespace-split (`\s+`, matching
    * [[TextAnalysis.tokens]]); chunks rejoin with single spaces, so
    * original inter-token whitespace is normalized, not preserved.
    * Null-text documents drop. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    df.filter(col(textCol).isNotNull)
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("__chunks",
        expr(s"(greatest(__n - $chunkTokens, 0L) + ${stride - 1}L) div ${stride}L + 1L"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__chunks") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_idx") * stride).as("n_tok"))
  }
}
