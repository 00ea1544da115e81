package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-self-trained bigram language-model NOVELTY scoring — the
  * cheap, fully-distributed stand-in for the KenLM-perplexity quality
  * signal of CCNet-style pipelines: documents whose token transitions
  * are rare in the corpus score high (novel/unusual text), templated
  * or boilerplate documents score low. Trained on the corpus itself,
  * so no external model artifact is needed.
  *
  * Log-free for cross-engine exactness: instead of log-perplexity the
  * score is the (scaled) SUM OF INVERSE conditional probabilities —
  * each bigram contributes c_uni(prev) / c_bi(prev, cur), one IEEE
  * division of two exact integers, rounded to 6 dp and accumulated in
  * DECIMAL, emitted as a scaled integer (1e-6 units) plus the bigram
  * count. ln() differs by ulps across libm implementations, which an
  * exact hash compare catches — the repo's oracles avoid it
  * everywhere (see [[TfIdf]]); monotonically, high mean inverse
  * probability == high perplexity.
  *
  * Shape: one tokens explode for unigram counts, one bigram explode
  * behind a (prev, cur) exchange that BOTH the bigram-count aggregate
  * and the count join reuse (co-partitioned — zero extra shuffle for
  * the join), one equi-join on prev for unigram counts (AQE may
  * broadcast a small vocab), one per-doc aggregation. Linear, no
  * windows; count tables are vocab-sized with map-side partials.
  */
object NgramModel {

  /** (id, n_bigrams, novelty_e6) for every doc with >= 2 tokens.
    * novelty_e6 = 1e6 * sum over bigram positions of
    * round(c_uni(prev)/c_bi(prev,cur), 6); divide by n_bigrams
    * downstream for a length-normalized mean. */
  def bigramNovelty(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    // tokenize behind an exchange (single-row-group scan hazard); the
    // exchange is reused by the unigram and bigram branches
    val toks = df.select(idCol.as("id"), textCol.as("__text"))
      .repartition(col("id"))
      .select(col("id"), TextAnalysis.tokens(col("__text")).as("t"))
    val unis = toks.select(explode(col("t")).as("prev"))
      .groupBy(col("prev")).agg(count(lit(1)).as("c_uni"))
    val big = toks.filter(size(col("t")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("prev"),
          element_at(col("t"), i + 1).as("cur")))).as("bg"))
      .select(col("id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      // ONE exchange on the join/group key: the count aggregate and the
      // count join both read it co-partitioned
      .repartition(col("prev"), col("cur"))
    val bcnt = big.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_bi"))
    big
      .join(bcnt, Seq("prev", "cur"))
      .join(unis, Seq("prev"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        // per-item round -> DECIMAL accumulation -> scaled long: exact
        // and order-independent (the repo's exactValueSumE4 pattern)
        (sum(round(col("c_uni").cast("double") / col("c_bi").cast("double"), 6)
          .cast("decimal(28,6)")) * 1000000).cast("long").as("novelty_e6"))
  }
}
