package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM-data pipelines (BASELINE.json north
  * star): tokenization, token counting, quality scoring, language ID and
  * document fingerprinting — all pure Column compositions (codegen'd,
  * scan-stays-columnar), each with an exact DuckDB-SQL mirror so every
  * operator is oracle-checkable.
  */
object TextAnalysis {

  /** Whitespace tokens, empties removed. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword segmentation count: a GPT-2-style pretokenizer
    * pattern (letters / digits / punctuation runs with optional leading
    * space, contractions) WITHOUT lookahead so the same pattern runs on
    * Java regex (Spark) and RE2 (DuckDB). */
  val BpePattern = "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpePattern)).cast("long")

  /** Canonical text normalization for dedup/fingerprinting: lowercase,
    * strip, collapse inner whitespace runs to single spaces. */
  def normalized(c: Column): Column =
    regexp_replace(
      regexp_replace(lower(c), "^\\s+|\\s+$", ""), "\\s+", " ")

  /** Deterministic document fingerprint = md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Rolling polynomial hash over whitespace tokens (shift-add over a
    * 64-bit token hash, mod 1e9+7) — an order-sensitive fingerprint
    * that, unlike [[fingerprint]], can be computed incrementally and
    * compared per-prefix. Spark-only (xxhash64 has no DuckDB twin).
    * The accumulator stays < 1e9+7 so `acc * 131 + h` never exceeds
    * ~1.3e11 — safe under ANSI overflow checking (a 2^61 modulus would
    * overflow the multiply after ~6 tokens and throw). */
  def rollingHash(c: Column): Column = {
    val p = 1000000007L
    aggregate(tokens(c), lit(0L),
      (acc, t) => pmod(acc * 131L + pmod(xxhash64(t), lit(p)), lit(p)))
  }

  // ------------------------------------------------------------- quality

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "at", "by")

  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    val stops = filter(t, x => x.isInCollection(Stopwords))
    when(size(t) === 0, 0.0d)
      .otherwise(size(stops).cast("double") / size(t).cast("double"))
  }

  def punctRatio(c: Column): Column = {
    val n = octet_length(c)
    val punct = n - octet_length(regexp_replace(c, "[^\\s\\p{L}\\p{N}]", ""))
    when(n === 0, 0.0d).otherwise(punct.cast("double") / n.cast("double"))
  }

  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0d).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + octet_length(x))
        .cast("double") / size(t).cast("double"))
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length docs and
    * natural stopword density, penalizes punctuation soup. The exact
    * formula matters less than its determinism — it is mirrored 1:1 in
    * SQL for the oracle. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(tokenCount(c).cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    val punctPenalty = punctRatio(c)
    round(lenScore * 0.5 + stopScore * 0.5 - punctPenalty * 0.25, 6)
  }

  // ------------------------------------------------------------- lang id

  /** Marker stopword sets per language for the n-gram/stopword heuristic
    * language identifier. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "une", "est"))

  /** Heuristic language ID: count marker hits per language over the
    * token set; argmax with deterministic first-wins tie-break in the
    * fixed order de/en/es/fr; all-zero -> 'und'.
    *
    * Shape: a single `aggregate` scan over an array of (score, code)
    * structs. The naive formulation — `best = greatest(s1..s4)` + a CASE
    * chain `WHEN s_i = best` — embeds every count expression in every
    * branch, and the counts are higher-order filters which neither
    * whole-stage codegen nor its subexpression elimination cover, so
    * each marker filter would be re-evaluated ~10x per row (this was
    * the dominant cost of the corpus-clean bench line). Here each
    * filter appears exactly once; strictly-greater keeps the FIRST
    * maximum, and the s=0/'und' start means a language must score > 0 —
    * bit-identical semantics to the CASE chain the DuckDB oracle still
    * uses. */
  def langId(c: Column): Column = {
    val t = tokens(lower(c))
    val scored = array(LangMarkers.map { case (code, markers) =>
      struct(size(filter(t, x => x.isInCollection(markers))).as("s"),
        lit(code).as("code"))
    }: _*)
    aggregate(scored,
      struct(lit(0).as("s"), lit("und").as("code")),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc),
      acc => acc.getField("code"))
  }

  // ------------------------------------------ single-pass fast battery

  /** Single-pass profile struct (codegen'd kernel,
    * [[graft.expressions.TextStats]]): every battery counter from ONE
    * scan of the UTF-8 bytes. Reference it from several derived columns
    * freely — whole-stage subexpression elimination evaluates the
    * identical deterministic subtree once per row (the composed HOF
    * formulations above are outside codegen AND outside CSE, so they
    * re-scan the string per signal). The derived columns below mirror
    * the legacy compositions' arithmetic operation-for-operation; the
    * equivalence is differentially spec-pinned in TextStatsKernelSpec. */
  def profile(c: Column): Column = graft.expressions.TextStats(c)

  def tokenCountOf(p: Column): Column = p.getField("n_tokens")

  def meanTokenLenOf(p: Column): Column =
    when(p.getField("n_tokens") === 0L, 0.0d).otherwise(
      p.getField("token_bytes").cast("double") /
        p.getField("n_tokens").cast("double"))

  def stopwordRatioOf(p: Column): Column =
    when(p.getField("n_tokens") === 0L, 0.0d).otherwise(
      p.getField("n_stops").cast("double") /
        p.getField("n_tokens").cast("double"))

  def punctRatioOf(p: Column): Column =
    when(p.getField("text_bytes") === 0L, 0.0d).otherwise(
      p.getField("punct_bytes").cast("double") /
        p.getField("text_bytes").cast("double"))

  def qualityScoreOf(p: Column): Column = {
    val lenScore =
      least(tokenCountOf(p).cast("double") / lit(100.0), lit(1.0))
    val stopScore = least(stopwordRatioOf(p) * 4.0, lit(1.0))
    round(lenScore * 0.5 + stopScore * 0.5 - punctRatioOf(p) * 0.25, 6)
  }

  def langIdOf(p: Column): Column = {
    val scores = LangMarkers.map { case (code, _) =>
      code -> p.getField(s"m_$code")
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((code, s), acc) =>
      when(best > 0 && s === best, lit(code)).otherwise(acc)
    }
  }

  /** The same heuristics as DuckDB SQL fragments (oracle mirrors). */
  object Sql {
    def tokens(c: String): String =
      s"list_filter(string_split_regex($c, '\\s+'), x -> x <> '')"
    def tokenCount(c: String): String = s"len(${tokens(c)})"
    def bpeTokenCount(c: String): String =
      s"len(regexp_extract_all($c, '${BpePattern.replace("'", "''")}'))"
    def normalized(c: String): String =
      s"regexp_replace(regexp_replace(lower($c), '^\\s+|\\s+$$', '', 'g'), '\\s+', ' ', 'g')"
    def fingerprint(c: String): String = s"md5(${normalized(c)})"
    def stopwordRatio(c: String): String = {
      val set = Stopwords.map(s => s"'$s'").mkString("[", ",", "]")
      s"(CASE WHEN ${tokenCount(c)} = 0 THEN 0.0 ELSE " +
        s"len(list_filter(${tokens(c)}, x -> list_contains($set, x))) * 1.0 / ${tokenCount(c)} END)"
    }
    def punctRatio(c: String): String =
      s"(CASE WHEN strlen($c) = 0 THEN 0.0 ELSE " +
        s"(strlen($c) - strlen(regexp_replace($c, '[^\\s\\p{L}\\p{N}]', '', 'g'))) * 1.0 / strlen($c) END)"
    def meanTokenLen(c: String): String =
      s"(CASE WHEN ${tokenCount(c)} = 0 THEN 0.0 ELSE " +
        s"list_sum(list_transform(${tokens(c)}, x -> strlen(x))) * 1.0 / ${tokenCount(c)} END)"
    def qualityScore(c: String): String =
      s"round(least(${tokenCount(c)} / 100.0, 1.0) * 0.5 + " +
        s"least(${stopwordRatio(c)} * 4.0, 1.0) * 0.5 - ${punctRatio(c)} * 0.25, 6)"
    def langId(c: String): String = {
      val toks = tokens(s"lower($c)")
      val scores = LangMarkers.map { case (code, markers) =>
        val set = markers.map(s => s"'$s'").mkString("[", ",", "]")
        code -> s"len(list_filter($toks, x -> list_contains($set, x)))"
      }
      val best = scores.map(_._2).mkString("greatest(", ", ", ")")
      scores.foldRight("'und'") { case ((code, s), acc) =>
        s"(CASE WHEN $best > 0 AND $s = $best THEN '$code' ELSE $acc END)"
      }
    }
  }
}
