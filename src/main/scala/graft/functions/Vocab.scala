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

  /** Frequency-aware token subsampling (the word2vec recipe, Mikolov
    * et al. 2013): each token OCCURRENCE is kept with probability
    * min(1, sqrt(t / f_rel)) where f_rel is the token's corpus-relative
    * frequency — stopwords are aggressively thinned, rare content
    * words survive untouched — the standard rebalancing pass before
    * embedding / LM training on raw text. The keep decision is an
    * md5-uniform of (doc, position) against the threshold, so the
    * sample is reproducible under repartitioning AND cross-engine: the
    * threshold is one sqrt of one division of exact integers (both
    * IEEE-correctly-rounded — identical doubles in any engine), and
    * the uniform is the u32 idiom. Reports the top `k` tokens by
    * frequency with kept counts and the realized keep rate in ppm.
    *
    * Shape: one tokenize pass -> token-keyed count aggregation -> the
    * occurrence stream joins the (checkpointed) count table on token
    * (linear, map-side combinable) -> top-k sort-limit. */
  def subsampleCounts(df: DataFrame, idCol: Column, textCol: Column,
                      t: Double, k: Int): DataFrame = {
    require(t > 0, "subsample threshold must be positive")
    require(k > 0, "k must be positive")
    val occ = df.select(idCol.as("__id"),
      posexplode(TextAnalysis.tokens(lower(textCol)))
        .as(Seq("pos", "token")))
      .localCheckpoint() // two consumers: counts and the decision join
    val counts = occ.groupBy(col("token"))
      .agg(count(lit(1)).as("f"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("f")).as("__N"))
    val u = (graft.functions.Kmv.u32(
      concat(col("__id").cast("string"), lit(":"),
        col("pos").cast("string"))).cast("double")
      / lit(4294967296.0))
    val byTok = occ.join(counts, "token")
      .crossJoin(broadcast(totals))
      .withColumn("__keep",
        u < least(lit(1.0), sqrt(lit(t) * col("__N") / col("f"))))
      .groupBy(col("token"))
      .agg(max(col("f")).as("f"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("kept"))
    val top = byTok.orderBy(col("f").desc, col("token").asc).limit(k)
    val w = Window.orderBy(col("f").desc, col("token").asc)
    top.select(row_number().over(w).as("rank"), col("token"), col("f"),
      col("kept"), expr("(kept * 1000000) DIV f").as("keep_ppm"))
  }

  /** [[subsampleCounts]]' APPLY side, feeding the LM-block assembler:
    * the per-occurrence keep decision (same md5-uniform vs
    * sqrt(t·N/f) threshold) filters the token stream, survivors
    * encode against the top-`k` vocabulary (rank 1..k from the SAME
    * count table, OOV → 0, word2vec convention: vocabulary from raw
    * counts, subsampling applied to the stream), and each document's
    * kept ids re-assemble in position order — the (doc_id, ids,
    * n_tokens) shape [[graft.operators.Pack.inputTargetBlocks]]
    * consumes. Documents whose every occurrence is dropped vanish
    * (they own no tokens in the packed stream). One tokenize pass,
    * one count aggregation, a linear token-keyed join, one per-doc
    * regroup. */
  def subsampleIds(df: DataFrame, idCol: Column, textCol: Column,
                   t: Double, k: Int): DataFrame = {
    require(t > 0, "subsample threshold must be positive")
    require(k > 0, "k must be positive")
    val occ = df.select(idCol.as("__id"),
      posexplode(TextAnalysis.tokens(lower(textCol)))
        .as(Seq("pos", "token")))
      .localCheckpoint() // two consumers: counts and the decision join
    val counts = occ.groupBy(col("token"))
      .agg(count(lit(1)).as("f"))
      .localCheckpoint()
    val totals = counts.agg(sum(col("f")).as("__N"))
    val vocab = counts.orderBy(col("f").desc, col("token").asc)
      .limit(k).collect() // bounded: k rows
      .zipWithIndex.map { case (r, i) => r.getString(0) -> (i + 1) }
      .toMap
    val vmap = typedLit(vocab)
    val u = (graft.functions.Kmv.u32(
      concat(col("__id").cast("string"), lit(":"),
        col("pos").cast("string"))).cast("double")
      / lit(4294967296.0))
    occ.join(counts, "token")
      .crossJoin(broadcast(totals))
      .filter(u < least(lit(1.0), sqrt(lit(t) * col("__N") / col("f"))))
      .select(col("__id").as("doc_id"), col("pos"),
        coalesce(element_at(vmap, col("token")), lit(0)).as("tid"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("pos"), col("tid")))).as("__ps"))
      .select(col("doc_id"),
        transform(col("__ps"), p => p.getField("tid")).as("ids"),
        size(col("__ps")).cast("long").as("n_tokens"))
  }

  /** The APPLY side of vocabulary training: encode every document
    * against the top-`k` vocab (token → its rank; out-of-vocabulary →
    * 0) and report per doc the token count, OOV count, and an md5
    * digest of the comma-joined id sequence — the integrity artifact
    * for a tokenized-corpus export.
    *
    * Scale shape: the trained vocab is DRIVER-BOUNDED (k entries) and
    * embedded as one map literal, so encoding is a pure projection —
    * zero shuffles, zero joins, one corpus scan; a token-granular
    * explode+join formulation would shuffle |corpus tokens| rows just
    * to do a k-entry dictionary lookup. Vocab ranks tie-break (cnt
    * desc, token asc), so the id assignment — and therefore every
    * digest — is deterministic and SQL-replayable. */
  /** The raw (doc_id, ids, n_tokens) encoding — the library surface a
    * training-block assembler consumes ([[graft.operators.Pack
    * .inputTargetBlocks]]); [[encode]] is its digest-rendered declared
    * twin. Same zero-shuffle map-literal projection. OOV encodes as
    * id 0 — which downstream doubles as the zero-class-weight mark. */
  def encodeIds(df: DataFrame, idCol: Column, textCol: Column,
                k: Int): DataFrame = {
    val vocab = topTokens(df, textCol, k)
      .select(col("token"), col("rank"))
      .collect() // bounded: k rows
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val vmap = typedLit(vocab)
    val toks = TextAnalysis.tokens(lower(textCol))
    df.select(idCol.as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"),
        transform(col("__toks"),
          t => coalesce(element_at(vmap, t), lit(0))).as("ids"),
        size(col("__toks")).cast("long").as("n_tokens"))
  }

  def encode(df: DataFrame, idCol: Column, textCol: Column,
             k: Int): DataFrame =
    encodeIds(df, idCol, textCol, k)
      .select(col("doc_id"), col("n_tokens"),
        size(filter(col("ids"), i => i === 0)).cast("long").as("n_oov"),
        md5(array_join(transform(col("ids"), _.cast("string")), ","))
          .as("ids_digest"))

  /** DuckDB replay of [[encode]] over `documents(doc_id, text)`:
    * the vocab CTE re-ranks, ids re-derive via a position-aligned
    * left join, digests re-hash in token order. */
  object Sql {
    def encodeQuery(k: Int): String =
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    ${TextAnalysis.Sql.tokens("lower(text)")} AS l
         |  FROM documents),
         |cnt AS (
         |  SELECT token, count(*) AS cnt
         |  FROM (SELECT unnest(l) AS token FROM toks) GROUP BY 1),
         |vocab AS (
         |  SELECT token, CAST(row_number() OVER
         |    (ORDER BY cnt DESC, token) AS INT) AS rank
         |  FROM cnt ORDER BY cnt DESC, token LIMIT $k),
         |pos AS (
         |  SELECT doc_id, unnest(l) AS token,
         |    generate_subscripts(l, 1) AS p
         |  FROM toks),
         |enc AS (
         |  SELECT pos.doc_id, count(*) AS n_tokens,
         |    count(*) FILTER (WHERE v.rank IS NULL) AS n_oov,
         |    md5(string_agg(CAST(coalesce(v.rank, 0) AS VARCHAR), ','
         |        ORDER BY pos.p)) AS ids_digest
         |  FROM pos LEFT JOIN vocab v ON v.token = pos.token
         |  GROUP BY pos.doc_id)
         |SELECT t.doc_id AS doc_id, coalesce(e.n_tokens, 0) AS n_tokens,
         |  coalesce(e.n_oov, 0) AS n_oov,
         |  coalesce(e.ids_digest, md5('')) AS ids_digest
         |FROM toks t LEFT JOIN enc e ON e.doc_id = t.doc_id""".stripMargin
  }
}
