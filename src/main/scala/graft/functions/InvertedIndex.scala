package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index export: term → document-frequency + a BOUNDED,
  * ascending posting list — the search-index artifact a corpus platform
  * ships next to the corpus itself (BM25 serving, contamination lookup,
  * "which docs contain this term" debugging).
  *
  * Scale shape: one explode to (doc, distinct-term) pairs, then the
  * bounded [[TopK]] aggregate per term — map-side partials with O(cap)
  * state at every stage, so a stop-word's posting list can NOT blow up
  * an aggregation buffer (the naive `sort_array(collect_list(id))`
  * holds an unbounded per-term buffer — at 100 TB a common term's
  * postings are billions of ids). The df count rides the same
  * pair-granularity shuffle; postings keep the `cap` SMALLEST doc ids
  * (deterministic, oracle-replayable with an ORDER BY id LIMIT cap).
  *
  * Ids must be exact in a Double for the TopK ordering (< 2^53) —
  * true for every table here; hash-ids wider than 53 bits would need a
  * dedicated ordering.
  */
object InvertedIndex {

  /** Build the index roster: (term, df, n_postings, posting_digest)
    * where posting_digest is md5 of the comma-joined ascending capped
    * posting list. `minDf` prunes the hapax tail (df 1 terms are most
    * of the vocabulary and useless to serve); `cap` bounds postings. */
  def build(df: DataFrame, textCol: Column, idCol: Column,
            minDf: Long = 2L, cap: Int = 100): DataFrame = {
    require(cap > 0, "cap must be positive")
    // distinct terms per doc FIRST (array_distinct on the row) so the
    // exploded pair stream is already df-granular — no second distinct.
    // explode_OUTER, not explode: InferFiltersFromGenerate turns a plain
    // explode into a pushed `size(...) > 0` scan filter with the
    // tokenize battery INLINED (the PlanAuditSpec shape); the outer
    // variant infers nothing, and the empty-doc null rows die on the
    // cheap attribute filter above the Generate.
    val pairs = df
      .select(idCol.cast("long").as("id"),
        array_distinct(TextAnalysis.tokens(textCol)).as("__terms"))
      .select(col("id"), explode_outer(col("__terms")).as("term"))
      .filter(col("term").isNotNull)
    // smallest-cap ids per term == TopK by score DESC with score = -id
    val ranked = TopK.perQuery(
      pairs.select(col("term").as("query_id"),
        col("id").as("neighbor_id"),
        (-col("id")).cast("double").as("score")),
      cap)
    val postings = ranked
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(col("neighbor_id"))).as("__post"),
        count(lit(1)).as("n_postings"))
    val dfCounts = pairs
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    dfCounts
      .join(postings, dfCounts("term") === postings("query_id"))
      .select(col("term"), col("df"), col("n_postings"),
        md5(array_join(transform(col("__post"), i => i.cast("string")),
          ",")).as("posting_digest"))
  }

  /** DuckDB replay over `documents(doc_id, text)` — same pair stream,
    * postings via ordered LIMIT-cap list aggregation. */
  object Sql {
    def query(minDf: Long = 2L, cap: Int = 100): String =
      s"""WITH pairs AS (
         |  SELECT DISTINCT doc_id AS id, unnest(${TextAnalysis.Sql.tokens("text")}) AS term
         |  FROM documents),
         |post AS (
         |  SELECT term, id,
         |    row_number() OVER (PARTITION BY term ORDER BY id) AS rk
         |  FROM pairs),
         |agg AS (
         |  SELECT term, count(*) AS df,
         |    CAST(count(*) FILTER (WHERE rk <= $cap) AS BIGINT) AS n_postings,
         |    md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY id)
         |        FILTER (WHERE rk <= $cap)) AS posting_digest
         |  FROM post GROUP BY term)
         |SELECT term, df, n_postings, posting_digest
         |FROM agg WHERE df >= $minDf""".stripMargin
  }
}
