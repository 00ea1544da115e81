package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed token co-occurrence with PMI-style association ranking —
  * the collocation miner of a corpus-analysis pass (phrase discovery,
  * tokenizer merge candidates beyond adjacent BPE pairs, topic drift
  * probes). For every ordered token pair (a, b) with b at most
  * `window` positions after a in the same document, count joint
  * occurrences and rank by LIFT n_ab*N/(n_a*n_b) — the PMI argument
  * before the log; log is monotone, so the top-k by lift IS the top-k
  * by PMI, with every score an exact integer (lift_e6, integer DIV)
  * instead of a cross-engine-fragile float log. The classic PMI
  * rare-pair pathology (a pair seen once between two hapaxes maxes the
  * score) is handled the standard way: `minCount` prunes joint counts
  * before ranking.
  *
  * Shape: per-doc pair generation is a local array transform (zero
  * joins, no token-position shuffle) -> ONE corpus-width hash
  * aggregation on (a, b) with map-side partials -> minCount prune
  * SHRINKS the pair table before anything joins it -> two token-keyed
  * joins against the (checkpointed) unigram table -> global top-k via
  * sort-limit (TakeOrderedAndProject: k-row partials per partition,
  * never a full sort). At 100 TB every stage is linear in token count
  * x window; the only quadratic-looking object — the pair table — is
  * capped by minCount before the joins.
  *
  * lift_e6 = (n_ab * N * 1e6) DIV (n_a * n_b) in LONG: exact while
  * n_ab * N * 1e6 < 2^63 (ample for the test scales; at corpus sizes
  * where N approaches 1e13, swap the literals to DECIMAL(38,0) — the
  * DIV semantics carry over unchanged). */
object Cooccurrence {

  /** Top `k` windowed pairs of `lower(textCol)` by lift:
    * (rank, tok_a, tok_b, n_ab, n_a, n_b, lift_e6). Ties break
    * (tok_a, tok_b) ASC for a deterministic board. */
  def topPairsByLift(df: DataFrame, textCol: Column, window: Int,
                     minCount: Long, k: Int): DataFrame =
    topPairsFromSequences(
      df.select(TextAnalysis.tokens(lower(textCol)).as("__t")),
      col("__t"), window, minCount, k)

  /** Same miner over PRE-BUILT symbol sequences — e.g. each user's
    * time-ordered item stream (co-visitation mining: "items viewed
    * near each other", the classic recommender association signal),
    * or pre-tokenized documents. `seqCol` is an array<string>. */
  def topPairsFromSequences(df: DataFrame, seqCol: Column, window: Int,
                            minCount: Long, k: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(k > 0, "k must be positive")
    val toks = df.select(seqCol.as("__t"))
      .localCheckpoint() // two consumers (pairs, unigrams): scan once
    val uni = toks
      .select(explode(col("__t")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // three consumers: join a, join b, total
    val totals = uni.agg(sum(col("n")).as("__N"))
    val t = col("__t")
    val n = size(t)
    // (t[i], t[j]) for 1 <= i < j <= min(i+window, len) — 1-based
    // element_at so the oracle's list indexing replays verbatim
    val pairExpr = flatten(transform(sequence(lit(1), n - 1), i =>
      transform(sequence(i + 1, least(i + window, n)), j =>
        struct(element_at(t, i).as("a"), element_at(t, j).as("b")))))
    val pc = toks.filter(n >= 2)
      .select(explode(pairExpr).as("p"))
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val ua = uni.select(col("token").as("tok_a"), col("n").as("n_a"))
    val ub = uni.select(col("token").as("tok_b"), col("n").as("n_b"))
    val scored = pc.join(ua, Seq("tok_a")).join(ub, Seq("tok_b"))
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        // product in DECIMAL(38,0): n_ab * N * 1e6 wraps a LONG once
        // n_ab*N nears 9.2e12 (realistic at 100 TB); DIV on decimals
        // still returns BIGINT, so the output schema is unchanged
        expr("(CAST(n_ab AS DECIMAL(38,0)) * __N * 1000000)" +
          " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_e6"))
    val top = scored
      .orderBy(col("lift_e6").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(k)
    // window over at most k rows (post-limit), not the pair table
    val w = Window.orderBy(col("lift_e6").desc, col("tok_a").asc,
      col("tok_b").asc)
    top.select(row_number().over(w).as("rank"), col("tok_a"),
      col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
      col("lift_e6"))
  }
}
