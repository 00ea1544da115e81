package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style repetition / quality filters (Rae et al. 2021, public
  * arXiv:2112.11446 Table A1 — the rule family used by most open LLM
  * data pipelines): word-count bounds, mean word length, alphabetic
  * word fraction, top n-gram character fraction, duplicate n-gram
  * fraction, and a required-stopword count, combined into one boolean
  * verdict per document.
  *
  * Scale shape: every signal is a pure Column composition over the
  * token array — zero joins, zero shuffles, one projection pass over
  * the corpus. The top-2-gram mode is computed per row by sorting the
  * gram array and scanning runs with an `aggregate` HOF (O(L log L)
  * per doc) instead of the explode → groupBy → max topology, which
  * would shuffle |corpus tokens| rows twice. Every ratio is one IEEE
  * division of two exactly-computed integers, so the DuckDB oracle
  * (which computes the mode via unnest+GROUP BY — different plan,
  * same integers) matches bit-for-bit.
  */
object Gopher {

  /** Space-joined word n-grams over a token array (empty when the doc
    * has fewer than n tokens). Built as a zip_with chain against
    * shifted slices — the lambdas receive element VALUES, so the token
    * subtree is evaluated O(n) times per row. The obvious
    * transform(sequence, i -> element_at(toks, i)...) formulation
    * inlines the whole tokenize subtree into every element_at call
    * (lambdas defeat subexpression elimination), going O(L^2) per doc
    * — measured 50x slower on sf0.1. zip_with pads the shorter side
    * with nulls; those mark the truncated tail and are filtered. */
  def ngrams(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      val joined = (2 to n).foldLeft(toks) { (acc, j) =>
        zip_with(acc,
          slice(toks, lit(j), greatest(size(toks) - (j - 1), lit(0))),
          (x, y) => when(y.isNull || x.isNull, lit(null: String))
            .otherwise(concat(x, lit(" "), y)))
      }
      filter(joined, x => x.isNotNull)
    }

  /** Characters covered by the most frequent n-gram: max over distinct
    * grams of count * length(gram), as a long (0 when no grams).
    * Occurrences overlap, so the derived fraction can exceed 1 on
    * degenerate docs ("a a a a") — same convention as the public
    * implementations, which sum occurrence lengths. */
  def topNgramCharCount(toks: Column, n: Int): Column = {
    val sorted = array_sort(ngrams(toks, n))
    val init = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    aggregate(sorted, init,
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run * length(x).cast("long")).as("best"))
      },
      st => st.getField("best"))
  }

  /** Fraction of n-gram occurrences that are repeats of an earlier
    * occurrence: (count - distinct) / count; 0 when no grams. */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val g = ngrams(toks, n)
    when(size(g) === 0, 0.0d).otherwise(
      (size(g) - size(array_distinct(g))).cast("double") /
        size(g).cast("double"))
  }

  /** Fraction of words containing at least one ASCII letter. */
  def alphaWordFrac(toks: Column): Column =
    when(size(toks) === 0, 0.0d).otherwise(
      size(filter(toks, x => x.rlike("[a-zA-Z]"))).cast("double") /
        size(toks).cast("double"))

  /** The Gopher required-stopword rule: how many of these 8 common
    * English words appear in the doc (rule: at least 2). */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def requiredStopCount(toks: Column): Column =
    size(filter(typedLit(RequiredStops), s => array_contains(toks, s)))
      .cast("long")

  /** Gopher paper thresholds (subset implemented; word-salad testdata
    * has no line structure, so the line-based rules are out of scope). */
  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinAlphaFrac = 0.80
  val MaxTop2CharFrac = 0.20
  val MaxDup5Frac = 0.15

  /** All signals + the combined pass/fail verdict, rooted at an
    * ALREADY-MATERIALIZED token-array column and the doc's char count.
    * Root these at attribute references (see [[stats]]), not at a
    * tokenize subtree: each signal column evaluates its own tree, so a
    * computed `toks` would be re-tokenized ~20x per row. */
  def signalsFromToks(toks: Column, totalChars: Column): Seq[Column] = {
    val nWords = size(toks).cast("long")
    val meanLen = when(size(toks) === 0, 0.0d).otherwise(
      aggregate(toks, lit(0L), (acc, x) => acc + octet_length(x))
        .cast("double") / size(toks).cast("double"))
    val alpha = alphaWordFrac(toks)
    val top2 = when(totalChars === 0, 0.0d).otherwise(
      topNgramCharCount(toks, 2).cast("double") / totalChars.cast("double"))
    val dup5 = dupNgramFrac(toks, 5)
    val nStops = requiredStopCount(toks)
    val pass = nWords.between(MinWords, MaxWords) &&
      meanLen.between(MinMeanWordLen, MaxMeanWordLen) &&
      alpha >= MinAlphaFrac && top2 < MaxTop2CharFrac &&
      dup5 < MaxDup5Frac && nStops >= 2L
    Seq(nWords.as("n_words"), meanLen.as("mean_word_len"),
      alpha.as("alpha_frac"), top2.as("top2_charfrac"),
      dup5.as("dup5_frac"), nStops.as("n_req_stops"),
      pass.as("gopher_pass"))
  }

  /** Inline variant for small data / tests: tokenizes inside each
    * signal column (fine on a handful of rows; use [[stats]] at scale). */
  def signals(text: Column): Seq[Column] =
    signalsFromToks(TextAnalysis.tokens(text), length(text))

  /** The corpus-scale entry: tokenize ONCE per row, then a repartition
    * barrier so (a) the gram chains reference a materialized attribute
    * — CollapseProject would otherwise inline the tokenize subtree
    * into every signal column and every lambda — and (b) the signal
    * battery runs on all cores even when the upstream scan has few
    * splits (single-row-group files). The shuffle moves (id, toks)
    * once — cheaper than 20 re-tokenizations per row, and the signal
    * stage stays map-local after it. */
  def stats(df: org.apache.spark.sql.DataFrame, idCol: Column,
            textCol: Column): org.apache.spark.sql.DataFrame =
    df.select(idCol.as("doc_id"), length(textCol).as("__chars"),
        TextAnalysis.tokens(textCol).as("__toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id") +:
        signalsFromToks(col("__toks"), col("__chars")): _*)

  /** DuckDB mirrors. The mode is computed via unnest + GROUP BY + max —
    * a different algorithm than the Spark run-scan, but over the same
    * exact integers, so results are bit-identical. */
  object Sql {
    /** Full oracle query over `documents(doc_id, text)`. */
    def query: String = {
      val stops = RequiredStops.map(s => s"'$s'").mkString("[", ",", "]")
      s"""WITH t AS MATERIALIZED (
         |  SELECT doc_id, ${TextAnalysis.Sql.tokens("text")} AS l,
         |    strlen(text) AS total_chars
         |  FROM documents),
         |g AS (
         |  SELECT doc_id,
         |    unnest([l[i] || ' ' || l[i+1] FOR i IN range(1, len(l))]) AS gram
         |  FROM t WHERE len(l) >= 2),
         |m AS (
         |  SELECT doc_id, max(cnt * strlen(gram)) AS top2_chars
         |  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
         |  GROUP BY 1),
         |s AS (
         |  SELECT t.doc_id, len(l) AS n_words,
         |    CASE WHEN len(l) = 0 THEN 0.0
         |         ELSE list_sum(list_transform(l, x -> strlen(x))) * 1.0 / len(l)
         |    END AS mean_word_len,
         |    CASE WHEN len(l) = 0 THEN 0.0
         |         ELSE len(list_filter(l, x -> regexp_matches(x, '[a-zA-Z]')))
         |              * 1.0 / len(l)
         |    END AS alpha_frac,
         |    CASE WHEN total_chars = 0 OR m.top2_chars IS NULL THEN 0.0
         |         ELSE m.top2_chars * 1.0 / total_chars
         |    END AS top2_charfrac,
         |    CASE WHEN len(l) < 5 THEN 0.0
         |         ELSE (len(l) - 4 - len(list_distinct(
         |                [array_to_string(l[i:i+4], ' ')
         |                 FOR i IN range(1, len(l) - 3)]))) * 1.0 / (len(l) - 4)
         |    END AS dup5_frac,
         |    len(list_filter($stops, s -> list_contains(l, s))) AS n_req_stops
         |  FROM t LEFT JOIN m ON t.doc_id = m.doc_id)
         |SELECT doc_id, n_words, mean_word_len, alpha_frac, top2_charfrac,
         |  dup5_frac, n_req_stops,
         |  (n_words BETWEEN $MinWords AND $MaxWords
         |   AND mean_word_len BETWEEN $MinMeanWordLen AND $MaxMeanWordLen
         |   AND alpha_frac >= $MinAlphaFrac
         |   AND top2_charfrac < $MaxTop2CharFrac
         |   AND dup5_frac < $MaxDup5Frac
         |   AND n_req_stops >= 2) AS gopher_pass
         |FROM s""".stripMargin
    }
  }
}
