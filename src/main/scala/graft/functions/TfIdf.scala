package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group distinctive terms by a log-free tf-idf.
  *
  * score(term, group) = tf(term, group) / df(term): tf counts token
  * occurrences inside the group, df counts DISTINCT docs containing the
  * term corpus-wide. Dropping the usual log keeps the score ONE IEEE
  * double division of two exact integers — bit-identical across
  * engines, so the result is exactly oracle-checkable (ln() can differ
  * by ulps between libm implementations, which an exact hash compare
  * catches). For a fixed corpus the ranking equals tf * (N / df).
  *
  * Shape: explode -> two hash aggregations (both with map-side
  * partials) -> equi-join on term -> bounded top-k aggregate
  * ([[TopK.perGroupTerms]]) — no window over an unbounded per-group
  * partition anywhere, so every stage carries bounded state at corpus
  * scale.
  */
object TfIdf {

  /** Top `k` terms per group with (rank, score, tf, df) — ties broken
    * by term ASC. Tokens shorter than `minTermLen` are dropped (they
    * are overwhelmingly punctuation/stopword noise and every engine
    * agrees on `length`). */
  def topTerms(df: DataFrame, groupCol: Column, textCol: Column,
               idCol: Column, k: Int, minTermLen: Int = 3): DataFrame = {
    val toks = df.select(groupCol.as("group"), idCol.as("doc_id"),
        explode(TextAnalysis.tokens(lower(textCol))).as("term"))
      // the isNotNull conjuncts are semantically no-ops (explode output
      // and a grouping attribute), but making them EXPLICIT stops the
      // downstream join-backs from inferring asymmetric isnotnull
      // filters into only one of the two aggregate branches, which
      // would defeat ReuseExchange and re-scan the corpus
      .filter(col("term").isNotNull && col("group").isNotNull &&
        length(col("term")) >= minTermLen)
    // collapse to per-(doc, term) counts FIRST: the only full-width
    // shuffle carries map-side-combined (doc, term) partials, not raw
    // tokens. The count table is then MATERIALIZED once: its four
    // consumers (tf, df, and the two join-backs) prune different
    // columns, so exchange reuse can't unify them and each would
    // otherwise re-scan and re-tokenize the whole corpus. This is the
    // batch equivalent of writing the doc-term matrix; on a real
    // cluster swap localCheckpoint for a reliable checkpoint/parquet
    // write — the table is compact (distinct doc-term pairs), the
    // corpus is not.
    val dtc = toks.groupBy(col("doc_id"), col("group"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tf = dtc.groupBy(col("group"), col("term"))
      .agg(sum(col("cnt")).as("tf"))
    // df = distinct docs containing the term = one dtc row per (doc, term)
    val dfreq = dtc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .select(col("group"), col("term"),
        (col("tf").cast("double") / col("df")).as("score"))
    TopK.perGroupTerms(scored, k)
      .join(tf, Seq("group", "term"))
      .join(dfreq, Seq("term"))
      .select(col("group"), col("term"), col("rank"), col("score"),
        col("tf"), col("df"))
  }
}
