package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear text scorer — the fastText / Vowpal-Wabbit
  * INFERENCE shape (Joulin et al. 2016; Weinberger et al. 2009 for the
  * hashing trick): features are the document's unigrams plus adjacent
  * bigrams, each feature hashes to one of `buckets` weight slots
  * (collisions share a slot — the fixed-memory property that lets a
  * trained model ship as a dense `buckets`-long array no matter the
  * vocabulary), and the document score is the mean of its slot weights
  * (fastText's mean pooling readout).
  *
  * At 100 TB inference is the common case — a classifier trained
  * offline applied corpus-wide to gate documents — and this plan is
  * ONE projection pass: tokenize, featurize, hash, fold, threshold,
  * zero shuffles, zero UDFs, no model join (the model rides inside the
  * expression; with real weights it becomes one broadcast array
  * literal and `element_at(weights, slot + 1)` — nothing else in the
  * plan changes).
  *
  * Determinism / oracle exactness: the weight table is md5-DERIVED —
  * slot b holds integer weight u32(md5('w:' || b)) mod 2001 - 1000 in
  * [-1000, 1000] — and the per-document accumulation is an exact
  * INTEGER sum (no float fold at all); the score is a single IEEE
  * division of two exact integers, round-6 — bit-identical in any
  * engine (the repo's log-free discipline). The keep/drop label
  * compares the INTEGER sum against zero, so the gate itself never
  * touches a float.
  *
  * The slot/weight hash reuses [[CountMin]]'s u32(md5) formula;
  * tokenization is the shared [[TextAnalysis.tokens]] contract. The
  * token array appears in two batteries (count + fold) of the same
  * projection — physical-level CSE evaluates it once per row (the
  * TextStatsExpr precedent). The fold itself is an ArrayAggregate
  * (interpreted lambda, not codegen) — measured fine at bench scale;
  * the custom-Expression swap is the known upgrade if it ever shows
  * in profiles.
  */
object HashedLinear {

  /** u32(md5(tag || v)) — the deterministic hash both engines replay:
    * DuckDB `('0x' || substr(md5(tag || v), 1, 8))::BIGINT`. */
  private def u32(tag: String, v: Column): Column =
    graft.expressions.Md5Hex.u32(concat(lit(tag), v))

  /** Unigrams + adjacent bigrams of a token array. */
  private def featsOf(t: Column): Column = {
    val bigrams = when(size(t) >= 2,
      transform(slice(t, lit(1), size(t) - 1),
        (x, i) => concat(x, lit(" "), element_at(t, i + lit(2)))))
      .otherwise(array().cast("array<string>"))
    concat(t, bigrams)
  }

  private def weightOf(f: Column, buckets: Int): Column = {
    val slot = pmod(u32("f:", f), lit(buckets.toLong))
    pmod(u32("w:", slot.cast("string")), lit(2001L)) - lit(1000L)
  }

  /** The exact integer weight sum over the hashed features of `text` —
    * the classifier's accumulator as a standalone Column, for
    * composing the gate into wider projections (e.g. the corpus
    * refresh pipeline computes fingerprint + w_sum in one pass behind
    * one barrier). Gate on `weightSum >= 0`: pure integers, no float
    * anywhere. */
  def weightSum(text: Column, buckets: Int = 4096): Column =
    weightSumOfTokens(TextAnalysis.tokens(lower(text)), buckets)

  /** [[weightSum]] over an already-staged TOKEN column. Callers should
    * stage the token array as an attribute (a separate select) and
    * pass it here: with the tokenizer inlined, the interpreted
    * `aggregate`/`transform` lambdas re-evaluate the token expression
    * at every reference — including `element_at(t, i+2)` inside the
    * bigram lambda, i.e. once PER TOKEN — turning the fold quadratic
    * in document length (measured 5.5s vs 2.0s over 5k docs at
    * sf0.1). Same fold, same integers: results are unchanged, only
    * re-evaluation is removed. */
  def weightSumOfTokens(tokens: Column, buckets: Int = 4096): Column = {
    require(buckets > 0, "buckets must be positive")
    aggregate(featsOf(tokens), lit(0L),
      (acc, f) => acc + weightOf(f, buckets))
  }

  /** (doc_id, n_feats, w_sum, score, label): the exact-integer weight
    * sum over hashed unigram+bigram features, the round-6 mean-pooled
    * score, and the integer-compared keep/drop gate. */
  def score(df: DataFrame, id: Column, text: Column,
            buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val feats = featsOf(col("__t"))
    val wsum = aggregate(feats, lit(0L),
      (acc, f) => acc + weightOf(f, buckets))
    // parallelism floor BEFORE the tokenizer (guide §2.5): the whole
    // tokenize+hash+fold battery otherwise runs on however few
    // partitions the scan produced; per-doc output rows are a set, so
    // redistribution cannot change results
    graft.Tables.parallelismFloor(
        df.select(id.as("doc_id"), text.as("__text")))
      .select(col("doc_id"),
        TextAnalysis.tokens(lower(col("__text"))).as("__t"))
      .select(col("doc_id"),
        size(feats).as("n_feats"),
        wsum.as("w_sum"),
        round(when(size(feats) === 0, 0.0)
          .otherwise(wsum.cast("double") /
            (lit(1000.0) * size(feats).cast("double"))), 6).as("score"),
        when(wsum >= 0, lit("keep")).otherwise(lit("drop")).as("label"))
  }
}
