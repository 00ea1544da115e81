package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Sliding-window document chunking — the context-prep step for
  * embedding / RAG indexing: split each document's token stream into
  * windows of `windowTokens` tokens advancing by `strideTokens`
  * (stride < window ⇒ overlapping chunks, the usual retrieval setting
  * so a passage straddling a boundary still lands whole in some
  * chunk). Chunks start at 0, stride, 2·stride, … while the start is
  * inside the doc; the final windows may be shorter (content is never
  * dropped). Token definition is [[TextAnalysis.tokens]] (\s+, empties
  * filtered); docs with no tokens yield no chunks.
  *
  * Output: (id, chunk_idx, n_tokens, chunk_text), chunk text re-joined
  * with single spaces.
  *
  * Shape: pure row-local projection + posexplode — ZERO shuffles; at
  * any scale this is a map-only pass that pipelines into whatever
  * consumes the chunks (embedding UDF batch, similarity index build).
  */
object Chunker {

  def chunkWindows(df: DataFrame, textCol: Column, idCol: Column,
                   windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(strideTokens > 0, "strideTokens must be positive")
    val toks = TextAnalysis.tokens(textCol)
    // one start per stride step while start < n_tokens
    // Column./ is DOUBLE division — floor to int before the +1
    val nWin = when(size(toks) <= 0, lit(0))
      .otherwise(((size(toks) - 1) / strideTokens).cast("int") + 1)
    val chunks = when(nWin <= 0, array().cast("array<array<string>>"))
      .otherwise(transform(sequence(lit(0), nWin - 1),
        i => slice(toks, i * strideTokens + 1, lit(windowTokens))))
    df.select(idCol.as("id"), posexplode(chunks))
      .select(col("id"), col("pos").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }
}
