package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style REPETITION filters (Rae et al. 2021 §A1.1 — the
  * duplicate-text heuristics that sit beside the quality gate in every
  * LLM data pipeline): per document, the duplicate-token fraction, the
  * most-frequent word bigram and the character mass it covers, and the
  * character mass covered by word trigrams occurring more than once.
  * A document dominated by a repeated phrase scores high and gets
  * routed out before training.
  *
  * Scale shape: ZERO shuffles — every signal folds over the document's
  * own sorted token/n-gram arrays (duplicates are adjacent after
  * array_sort, so run-length aggregation is one linear lambda pass per
  * row; no explode, no per-gram groupBy of a 100 TB corpus). The
  * DuckDB oracle replays the same numbers relationally (per-doc gram
  * GROUP BY — fine at oracle scale), which also pins the fold's
  * semantics: top bigram ties break to the lexicographically smallest
  * (the fold visits sorted order and only strictly-greater runs
  * replace the champion), duplicate char mass counts ALL occurrences
  * of a duplicated gram (c*len for c >= 2), and gram length includes
  * the joining spaces.
  *
  * The trigram char mass over-counts overlapping occurrences relative
  * to Gopher's positional-coverage definition (a 3x repeated phrase
  * counts each occurrence fully); the approximation is standard,
  * monotone in repetition, and what keeps the signal a per-row fold.
  */
object Repetition {

  /** Run-length fold over a SORTED gram array: returns struct
    * (best_cnt, best, dup_chars) — the champion run's length and gram
    * (ties to the first == smallest), and Σ c*octet_length(gram) over
    * runs with c >= 2. */
  private def runFold(sortedGrams: Column): Column =
    aggregate(sortedGrams,
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("best_cnt"), lit("").as("best"),
        lit(0L).as("dup_chars")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        val better = run > acc.getField("best_cnt")
        val dup = acc.getField("dup_chars") +
          when(run === 2L, octet_length(x).cast("long") * lit(2L))
            .when(run > 2L, octet_length(x).cast("long"))
            .otherwise(lit(0L))
        struct(x.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("best_cnt"))
            .as("best_cnt"),
          when(better, x).otherwise(acc.getField("best")).as("best"),
          dup.as("dup_chars"))
      })

  /** Per-document repetition signals over whitespace tokens. Output:
    * (doc_id, n_tokens, dup_token_ppm, top_bigram, top_bigram_n,
    * top_bigram_char_ppm, dup_trigram_char_ppm). */
  def signals(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val t = TextAnalysis.tokens(textCol)
    val base = df.select(idCol.as("doc_id"), t.as("__t"),
      octet_length(textCol).cast("long").as("__chars"))
    val n = size(col("__t")).cast("long")
    val sorted = array_sort(col("__t"))
    // sorted adjacency: distinct = n - (# positions equal to their
    // left neighbor); linear, never array_distinct's quadratic scan
    val adjDups = when(n >= 2L, size(filter(zip_with(
        slice(sorted, lit(1), (n - 1L).cast("int")),
        slice(sorted, lit(2), (n - 1L).cast("int")),
        (a, b) => a === b), x => x)).cast("long"))
      .otherwise(lit(0L))
    def gram(k: Int): Column =
      when(n >= k.toLong, transform(sequence(lit(1L), n - (k - 1).toLong),
        i => concat_ws(" ", (0 until k).map(o =>
          element_at(col("__t"), (i + o.toLong).cast("int"))): _*)))
        .otherwise(array().cast("array<string>"))
    val bg = runFold(array_sort(gram(2)))
    val tg = runFold(array_sort(gram(3)))
    base.select(col("doc_id"),
        n.as("n_tokens"), col("__chars"), adjDups.as("__dups"),
        bg.as("__bg"), tg.as("__tg"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0L,
          expr("(__dups * 1000000) DIV n_tokens")).otherwise(0L)
          .as("dup_token_ppm"),
        col("__bg.best").as("top_bigram"),
        col("__bg.best_cnt").as("top_bigram_n"),
        when(col("__chars") > 0L,
          expr("(__bg.best_cnt * octet_length(__bg.best) * 1000000)" +
            " DIV __chars")).otherwise(0L).as("top_bigram_char_ppm"),
        when(col("__chars") > 0L,
          expr("(__tg.dup_chars * 1000000) DIV __chars")).otherwise(0L)
          .as("dup_trigram_char_ppm"))
  }

  /** DuckDB replay: per-doc gram GROUP BYs (oracle scale only). */
  object Sql {
    def documents: String = {
      val toks = TextAnalysis.Sql.tokens("text")
      s"""WITH toks AS (
         |  SELECT doc_id, strlen(text) AS chars, $toks AS t
         |  FROM documents),
         |base AS (SELECT doc_id, chars, len(t) AS n, t FROM toks),
         |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |d AS (SELECT doc_id, CAST(count(DISTINCT w) AS BIGINT) AS nd
         |      FROM tok GROUP BY 1),
         |bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
         |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |             FROM toks)),
         |bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |bb AS (SELECT doc_id, g, c FROM (
         |         SELECT *, row_number() OVER (PARTITION BY doc_id
         |           ORDER BY c DESC, g ASC) AS rk FROM bgc)
         |       WHERE rk = 1),
         |tg AS (SELECT doc_id,
         |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
         |       FROM (SELECT doc_id, t,
         |               unnest(range(1, len(t) - 1)) AS i
         |             FROM toks)),
         |tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
         |td AS (SELECT doc_id,
         |         CAST(coalesce(sum(c * strlen(g))
         |           FILTER (WHERE c >= 2), 0) AS BIGINT) AS dup3
         |       FROM tgc GROUP BY 1)
         |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
         |  CASE WHEN b.n > 0
         |    THEN ((b.n - d.nd) * 1000000) // b.n ELSE 0 END
         |    AS dup_token_ppm,
         |  coalesce(bb.g, '') AS top_bigram,
         |  CAST(coalesce(bb.c, 0) AS BIGINT) AS top_bigram_n,
         |  CASE WHEN b.chars > 0
         |    THEN (coalesce(bb.c, 0) * strlen(coalesce(bb.g, ''))
         |          * 1000000) // b.chars ELSE 0 END
         |    AS top_bigram_char_ppm,
         |  CASE WHEN b.chars > 0
         |    THEN (coalesce(td.dup3, 0) * 1000000) // b.chars
         |    ELSE 0 END AS dup_trigram_char_ppm
         |FROM base b
         |LEFT JOIN d USING (doc_id)
         |LEFT JOIN bb USING (doc_id)
         |LEFT JOIN td USING (doc_id)""".stripMargin
    }
  }
}
