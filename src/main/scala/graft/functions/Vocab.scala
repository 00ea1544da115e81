package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary builder — the tokenizer-training precursor: rank
  * the corpus's whitespace tokens by frequency and report, for each of
  * the top `k`, the cumulative fraction of ALL token occurrences a
  * vocabulary truncated at that rank would cover. The coverage curve is
  * what picks a vocab size (e.g. "top 32k tokens cover 97.1% of
  * occurrences") before training a real subword tokenizer.
  *
  * Determinism / oracle exactness: ranking ties break by token ASC;
  * coverage is ONE IEEE double division of two exact integers
  * (cumulative count / total count), the same log-free idiom as
  * [[TfIdf]] — bit-identical across engines, so the whole result is
  * exactly oracle-checkable.
  *
  * Shape: explode -> one hash aggregation with map-side partials (the
  * only corpus-width shuffle, carrying (token, count) partials, not raw
  * tokens) -> global top-k via sort-limit (planned as
  * TakeOrderedAndProject: each partition reduces to k rows locally and
  * the driver merges k-row partials — never a full sort) -> a window
  * over the k-row result only (bounded by construction) for rank and
  * the running coverage sum. The count table is materialized once
  * because its two consumers (top-k and the total) prune different
  * columns — without the barrier each would re-scan and re-tokenize
  * the corpus (the [[TfIdf]] hazard).
  */
object Vocab {

  /** Top `k` tokens of `lower(textCol)` with
    * (rank, token, cnt, coverage); coverage = cumulative occurrence
    * count through this rank / total occurrences corpus-wide. */
  def topTokens(df: DataFrame, textCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val counts = df
      .select(explode(TextAnalysis.tokens(lower(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val top = counts.orderBy(col("cnt").desc, col("token").asc).limit(k)
    val totals = counts.agg(sum(col("cnt")).as("__total"))
    // window over at most k rows (post-limit), not the corpus
    val w = Window.orderBy(col("cnt").desc, col("token").asc)
    top.crossJoin(broadcast(totals))
      .select(
        row_number().over(w).as("rank"),
        col("token"), col("cnt"),
        (sum(col("cnt")).over(w).cast("double") / col("__total"))
          .as("coverage"))
  }
}
