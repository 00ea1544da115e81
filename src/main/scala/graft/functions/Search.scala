package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conjunctive (boolean-AND) term search over the corpus — the serving
  * query the inverted-index artifact ([[InvertedIndex]]) exists for:
  * "documents containing ALL of these terms, best first". Ranking is an
  * integer-exact tf-idf surrogate, score = Σ_t tf(t,d) · (N − df(t)):
  * rarer terms weigh more (N − df is the classic idf numerator) with no
  * logarithm, so every score is an exact integer and the whole ranked
  * result replays bit-for-bit in any SQL engine (the repo's log-free
  * exactness discipline — logs differ across libm implementations).
  *
  * Scale shape (100 TB corpus, |Q| query terms):
  *  - tokenize ONCE per row, then `filter(toks, isin(Q))` BEFORE the
  *    explode — only occurrences of query terms leave the scan, so the
  *    exploded stream is |Q|-sparse, not |corpus tokens| wide;
  *  - one shuffle to (doc, term) tf granularity; term df re-aggregates
  *    from those partials (|Q| rows) and broadcasts back;
  *  - the corpus total N is ONE driver-side count inlined as a plan
  *    literal (parquet-footer cheap; a joined 1-row total either plans
  *    as a nested loop or — with a literal equi-key — gets its
  *    condition constant-folded back into one);
  *  - AND semantics = `count(distinct term) == |Q|` per doc (cheap:
  *    at most |Q| rows per doc after the tf aggregate);
  *  - final ranking is the bounded [[TopK]] aggregate (map-side
  *    partials hold ≤ k rows per partition; no global window sort).
  */
object Search {

  /** Top-k docs containing ALL `terms`, ranked by
    * Σ tf·(N−df) desc, ties to the lower doc id. Output:
    * (doc_id, rank, score, n_terms). */
  def booleanAnd(df: DataFrame, idCol: Column, textCol: Column,
                 terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val q = terms.distinct
    val pairs = df
      .select(idCol.cast("long").as("id"),
        filter(TextAnalysis.tokens(textCol),
          t => t.isInCollection(q)).as("__hits"))
      // explode_outer: a plain explode would let InferFiltersFromGenerate
      // push a size()>0 scan filter with the tokenize battery inlined
      // (the PlanAuditSpec duplication shape)
      .select(col("id"), explode_outer(col("__hits")).as("term"))
      .filter(col("term").isNotNull)
    val tf = pairs.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nDocs = df.count() // bounded side work at declaration, by design
    val weighted = tf
      .join(broadcast(dfCounts), "term")
      .select(col("id"), col("term"),
        (col("tf") * (lit(nDocs) - col("df"))).as("w"))
    val matched = weighted.groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("w")).as("score"))
      .filter(col("n_terms") === q.length)
    // n_terms == |Q| on every surviving row (the AND filter), so it
    // rides as a literal — no second pass over `matched` to re-join it
    TopK.perQuery(
      matched.select(lit(0L).as("query_id"), col("id").as("neighbor_id"),
        col("score").cast("double").as("score")), k)
      .select(col("neighbor_id").as("doc_id"), col("rank"),
        col("score").cast("long").as("score"),
        lit(q.length.toLong).as("n_terms"))
  }

  /** Exact PHRASE search through a positional postings stream: the
    * i-th phrase term must occur at anchor position + i. The (pos,
    * term) pairs are filtered to phrase terms BEFORE the explode (the
    * index-shaped |phrase|-sparse stream, never a corpus-wide token
    * explode), and alignment is |phrase|−1 equi-joins on (doc,
    * shifted position) — at 100 TB this touches the postings of the
    * phrase's terms only, like a positional inverted index would.
    * Output: (doc_id, n_matches, first_pos); overlapping occurrences
    * each count. */
  def phrase(df: DataFrame, idCol: Column, textCol: Column,
             terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty phrase")
    val termSet = terms.distinct
    val hits = df
      .select(idCol.cast("long").as("id"),
        filter(transform(TextAnalysis.tokens(textCol),
          (t, i) => struct(i.cast("long").as("pos"), t.as("term"))),
          s => s.getField("term").isInCollection(termSet)).as("__h"))
      // explode_outer: see booleanAnd's InferFiltersFromGenerate note
      .select(col("id"), explode_outer(col("__h")).as("h"))
      .filter(col("h").isNotNull)
      .select(col("id"), col("h.pos").as("pos"), col("h.term").as("term"))
      .repartition(col("id"))
    val anchor = hits.filter(col("term") === terms.head)
      .select(col("id"), col("pos"))
    val aligned = terms.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(hits.filter(col("term") === t)
          .select(col("id"), (col("pos") - i).as("pos")), Seq("id", "pos"))
    }
    aligned.groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
  }

  /** Reciprocal-Rank Fusion (Cormack, Clarke & Buettcher 2009, SIGIR)
    * of two ranked lists — the hybrid-retrieval combiner: keyword and
    * dense scores are incomparable, but RANKS fuse without
    * calibration, score = Σ_systems 10^6 div (kRrf + rank) (the
    * integer surrogate of the 1/(k+r) classic; div keeps it
    * engine-exact, and k = 60 is the published default). Inputs are
    * (doc_id, rank) lists ALREADY bounded by their producers' top-k —
    * the fusion is a full-outer join of two ≤k-row lists plus a
    * bounded TopK; at scale the cost lives in the producers. Output:
    * (doc_id, lex_rank, dense_rank, rrf_e6, rank). */
  def rrfFusion(a: DataFrame, b: DataFrame, kRrf: Int = 60,
                topN: Int = 10): DataFrame = {
    val fa = a.select(col("doc_id"), col("rank").as("lex_rank"))
    val fb = b.select(col("doc_id"), col("rank").as("dense_rank"))
    val fused = fa.join(fb, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e6",
        coalesce(expr(s"1000000 DIV ($kRrf + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($kRrf + dense_rank)"), lit(0L)))
    TopK.perQuery(
      fused.select(lit(0L).as("query_id"),
        col("doc_id").as("neighbor_id"),
        col("rrf_e6").cast("double").as("score")), topN)
      .select(col("neighbor_id").as("doc_id"), col("rank"))
      .join(fused, "doc_id")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        col("rrf_e6"), col("rank"))
  }

  /** DuckDB replay over `documents(doc_id, text)`. */
  object Sql {
    def query(terms: Seq[String], k: Int = 20): String = {
      val q = terms.distinct
      val lst = q.map(t => s"'$t'").mkString("[", ",", "]")
      s"""WITH pairs AS (
         |  SELECT doc_id AS id, unnest(list_filter(
         |    ${TextAnalysis.Sql.tokens("text")},
         |    x -> list_contains($lst, x))) AS term
         |  FROM documents),
         |tf AS (SELECT id, term, count(*) AS tf FROM pairs GROUP BY 1, 2),
         |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |matched AS (
         |  SELECT tf.id, count(*) AS n_terms,
         |    sum(tf.tf * (n.n_docs - dfc.df)) AS score
         |  FROM tf JOIN dfc USING (term) CROSS JOIN n
         |  GROUP BY tf.id HAVING count(*) = ${q.length})
         |SELECT id AS doc_id, CAST(rank AS INT) AS rank,
         |  CAST(score AS BIGINT) AS score, n_terms
         |FROM (SELECT *, row_number() OVER
         |        (ORDER BY score DESC, id) AS rank FROM matched)
         |WHERE rank <= $k""".stripMargin
    }

    /** Positional replay: parallel unnest zips (term, pos); alignment
      * joins mirror [[Search.phrase]]. */
    def phraseQuery(terms: Seq[String]): String = {
      val joins = terms.zipWithIndex.drop(1).map { case (t, i) =>
        s"JOIN p p$i ON p$i.doc_id = a.doc_id AND p$i.term = '$t'" +
          s" AND p$i.pos = a.pos + $i"
      }.mkString("\n  ")
      s"""WITH toks AS (
         |  SELECT doc_id, ${TextAnalysis.Sql.tokens("text")} AS l
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, unnest(l) AS term,
         |    unnest(range(0, len(l))) AS pos
         |  FROM toks),
         |a AS (SELECT doc_id, pos FROM p WHERE term = '${terms.head}'),
         |m AS (SELECT a.doc_id, a.pos FROM a
         |  $joins)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |  min(pos) AS first_pos
         |FROM m GROUP BY 1""".stripMargin
    }
  }
}
