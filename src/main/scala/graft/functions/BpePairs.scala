package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BPE merge-candidate counting — the inner step of byte-pair-encoding
  * tokenizer training (Sennrich et al. 2016): collapse the corpus to
  * its word-frequency table ONCE, then count adjacent symbol pairs
  * weighted by word frequency; the top pair is the next merge. This is
  * the shape that makes BPE training tractable at 100 TB — every merge
  * iteration after the first touches only the VOCABULARY (hundreds of
  * thousands of rows), never the corpus again, so the expensive pass
  * happens exactly once however many merges are trained.
  *
  * This operator materializes iteration one (symbols = characters) as
  * the declared, oracle-checked instance; the iterate-on-vocab loop is
  * a driver loop over the same pair-count aggregation with the winning
  * pair merged into the word symbolization (same plan shape each
  * round, vocab-sized input).
  *
  * Determinism / oracle exactness: tokenization is the shared
  * [[TextAnalysis.tokens]] contract; pair counts are exact integer
  * sums; ranking ties break by pair string ASC. Character indexing is
  * code-point based in both engines (Spark `substring` on UTF8String,
  * DuckDB `substr`).
  *
  * Shape: one corpus-width explode collapsing to (word, freq) with
  * map-side combine; the pair explode runs over the VOCAB (bounded by
  * total vocab characters); global top-k plans as
  * TakeOrderedAndProject (k-row partials, never a full sort); the
  * rank window runs over the k-row result only.
  */
object BpePairs {

  private def wordFreqs(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent-symbol pair counts over a (w, freq) vocabulary, ranked
    * (cnt desc, pair asc) and capped at k — the post-limit window runs
    * over at most k rows, never the pair table. */
  private def rankedPairs(vocab: DataFrame, k: Int): DataFrame = {
    val pairs = vocab
      .filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(concat(expr("substring(w, i, 1)"), lit(" "),
        expr("substring(w, i + 1, 1)")).as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
    val top = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("pair").asc)
    top.select(row_number().over(w).as("rank"), col("pair"), col("cnt"))
  }

  /** Top `k` adjacent character pairs by corpus-weighted count:
    * (rank, pair, cnt), pair = "left right". */
  def topPairs(df: DataFrame, textCol: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    rankedPairs(wordFreqs(df, textCol), k)
  }

  /** BPE TRAINING ROUND TWO: apply the round-1 winning merge and
    * recount — the step that proves the iteration actually iterates.
    * The winning pair (c1, c2) collapses into one symbol via
    * left-to-right non-overlapping `replace(w, c1c2, sentinel)`, which
    * IS greedy BPE merging ("aaaa" → [aa][aa], "aaa" → [aa]a); the
    * sentinel (\\u0001, absent from any corpus) then counts as a
    * single symbol in the round-2 pair scan, rendered back as
    * "[c1c2]" in the output. The winner is ONE driver-collected row;
    * both rounds stay vocabulary-sized. */
  def topPairsAfterMerge(df: DataFrame, textCol: Column,
                         k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val vocab = wordFreqs(df, textCol).localCheckpoint()
    val winner = rankedPairs(vocab, 1).select(col("pair"))
      .head().getString(0)
    val merged = winner.replace(" ", "")
    val S = "\u0001"
    val vocab2 = vocab.select(
      call_function("replace", col("w"), lit(merged), lit(S)).as("w"),
      col("freq"))
    rankedPairs(vocab2, k)
      .select(col("rank"),
        call_function("replace", col("pair"), lit(S), lit(s"[$merged]"))
          .as("pair"),
        col("cnt"))
  }
}
