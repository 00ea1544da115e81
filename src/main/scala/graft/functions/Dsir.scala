package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
  * score every document by how much its HASHED-BIGRAM profile looks
  * like a target domain versus the raw corpus, then keep the top
  * scorers — the importance-resampling step that tilts a web-scale
  * corpus toward a domain without a trained classifier.
  *
  * Log-free exact scoring: the paper's importance weight is a
  * log-probability ratio; logs differ in the last ulp across libm
  * implementations, so this engine ranks by the integer discriminant
  *   score(x) = Σ_b c_x(b) · w(b),
  *   w(b) = (cnt_target(b)·10^6 div T_target)
  *        − (cnt_raw(b)·10^6 div T_raw)
  * — the per-bucket ppm frequency difference between the two
  * distributions, weighted by the doc's bucket counts. Monotone in the
  * same direction as the likelihood ratio per bucket, every step
  * integer (|w| <= 10^6; scores bounded by 10^6 · doc tokens — far
  * inside BIGINT at any corpus scale), so the ranked result replays
  * bit-for-bit in SQL.
  *
  * Scale shape: ONE corpus pass explodes bigrams to hashed buckets
  * (u32(md5) mod nBuckets — engine-independent), one shuffle to
  * (doc, bucket) counts; the bucket weight table is nBuckets rows
  * (256) — aggregated from the same counts, its two scalar totals
  * attached via a single-row broadcast cross join — and broadcast back
  * onto the doc-bucket counts; top-k is the bounded [[TopK]]
  * aggregate. The target-membership flag rides the first aggregation,
  * so the corpus is scanned exactly once. */
object Dsir {

  /** Top-`k` docs by target-likeness. `isTarget` marks the in-domain
    * rows (e.g. a trusted source or language). Output:
    * (doc_id, rank, score, n_bigrams). */
  def topKByImportance(df: DataFrame, idCol: Column, textCol: Column,
                       isTarget: Column, k: Int = 50,
                       nBuckets: Int = 256): DataFrame = {
    val grams = Gopher.ngrams(TextAnalysis.tokens(textCol), 2)
    val pairs = df
      .select(idCol.cast("long").as("id"), isTarget.as("__tgt"),
        grams.as("__grams"))
      .select(col("id"), col("__tgt"), explode_outer(col("__grams")).as("g"))
      .filter(col("g").isNotNull)
      .select(col("id"), col("__tgt"),
        (graft.expressions.Md5Hex.u32(col("g"))
          % nBuckets).as("bucket"))
    // materialized once: docBucket feeds BOTH the weight table and the
    // scoring join. ReuseExchange USUALLY dedups the two subtrees, but
    // that is a physical-planner courtesy, not a contract — a second
    // tokenize+explode pass over the raw corpus is the one cost that
    // must never happen at 100 TB, so pin it. The pinned table is
    // (doc × ≤nBuckets) counts — orders of magnitude under the corpus.
    val docBucket = pairs.groupBy(col("id"), col("__tgt"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val bucketStats = docBucket.groupBy(col("bucket"))
      .agg(sum(col("c")).as("cnt_raw"),
        sum(when(col("__tgt"), col("c")).otherwise(0L)).as("cnt_tgt"))
    val totals = bucketStats.agg(sum(col("cnt_raw")).as("t_raw"),
      sum(col("cnt_tgt")).as("t_tgt"))
    val weights = bucketStats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (expr("cnt_tgt * 1000000L div t_tgt") -
          expr("cnt_raw * 1000000L div t_raw")).as("w"))
    // materialized once: both consumers below (the TopK ranking and the
    // n_bigrams re-join on the 50 winners) would otherwise re-run the
    // whole bigram pipeline (the Vocab.counts idiom)
    val scored = docBucket
      .join(broadcast(weights), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("c") * col("w")).as("score"),
        sum(col("c")).as("n_bigrams"))
      .localCheckpoint()
    // scores can tie heavily (docs over the same vocab): TopK ranks
    // (score desc, id asc), deterministic
    TopK.perQuery(
      scored.select(lit(0L).as("query_id"), col("id").as("neighbor_id"),
        col("score").cast("double").as("score")), k)
      .join(scored.select(col("id").as("neighbor_id"), col("n_bigrams")),
        "neighbor_id")
      .select(col("neighbor_id").as("doc_id"), col("rank"),
        col("score").cast("long").as("score"), col("n_bigrams"))
  }

  /** DuckDB replay over `documents(doc_id, text, lang)` with
    * target = one language. */
  object Sql {
    def query(targetLang: String, k: Int = 50, nBuckets: Int = 256): String =
      s"""WITH toks AS (
         |  SELECT doc_id, lang = '$targetLang' AS tgt,
         |    ${TextAnalysis.Sql.tokens("text")} AS l
         |  FROM documents),
         |pairs AS (
         |  SELECT doc_id, tgt,
         |    ('0x' || substr(md5(unnest([l[i] || ' ' || l[i+1]
         |        FOR i IN range(1, len(l))])), 1, 8))::BIGINT
         |      % $nBuckets AS bucket
         |  FROM toks WHERE len(l) >= 2),
         |db AS (SELECT doc_id, tgt, bucket, count(*) AS c
         |       FROM pairs GROUP BY 1, 2, 3),
         |bs AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cnt_raw,
         |         CAST(sum(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT)
         |           AS cnt_tgt
         |       FROM db GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS t_raw,
         |               CAST(sum(cnt_tgt) AS BIGINT) AS t_tgt FROM bs),
         |wt AS (SELECT bucket,
         |         cnt_tgt * 1000000 // t_tgt - cnt_raw * 1000000 // t_raw
         |           AS w
         |       FROM bs, tot),
         |sc AS (SELECT db.doc_id, CAST(sum(db.c * wt.w) AS BIGINT)
         |           AS score,
         |         CAST(sum(db.c) AS BIGINT) AS n_bigrams
         |       FROM db JOIN wt USING (bucket) GROUP BY 1)
         |SELECT doc_id, CAST(rank AS INT) AS rank, score, n_bigrams
         |FROM (SELECT *, row_number() OVER
         |        (ORDER BY score DESC, doc_id) AS rank FROM sc)
         |WHERE rank <= $k""".stripMargin
  }
}
