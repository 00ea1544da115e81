package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier CALIBRATION sweep — the evaluation artifact that picks a
  * quality-filter operating point: confusion counts of the hashed-
  * linear classifier ([[HashedLinear]]) against a Gopher rule label
  * ([[Gopher]] — the word-count bound, the one rule the driver corpus
  * meaningfully splits on; the FULL gate is constant-false on
  * word-salad text, which would make every sweep cell degenerate) at a
  * ladder of decision thresholds, with ppm precision and recall.
  * Before a corpus platform gates 100 TB on "score >= t", this table
  * is how t gets chosen.
  *
  * Exactness: the classifier score is reduced to integer per-mille
  * (w_sum * 1000 div n_feats — Spark `div` and DuckDB `//` both
  * truncate toward zero, verified for negative sums), thresholds are
  * integer literals, and precision/recall are ppm integer divisions —
  * every cell replays bit-for-bit.
  *
  * Shape: the two per-doc batteries run as their own one-pass
  * pipelines (each tokenizes once behind its own barrier) and join on
  * doc_id; the 7-threshold explode happens on the JOINED 2-column
  * rows, and the confusion aggregate reduces map-side — the corpus is
  * never replicated 7x through a shuffle. */
object ClassifierEval {

  /** Thresholds swept over score_pm = 1000 * mean feature weight
    * (range ±10^6; per-doc std ~8*10^4 at ~50 features): a ladder that
    * actually splits the score distribution. Integer, inclusive
    * lower. */
  val Thresholds: Seq[Int] =
    Seq(-150000, -100000, -50000, 0, 50000, 100000, 150000)

  /** (threshold, tp, fp, fn, tn, precision_ppm, recall_ppm): predicted
    * keep = score_pm >= threshold; truth = gopher_pass. */
  def thresholdSweep(df: DataFrame, id: Column, text: Column): DataFrame = {
    val cls = HashedLinear.score(df, id, text)
      .select(col("doc_id"),
        when(col("n_feats") === 0, 0L)
          .otherwise(expr("w_sum * 1000L div n_feats")).as("score_pm"))
    val gph = Gopher.stats(df, id, text)
      .select(col("doc_id"),
        col("n_words").between(Gopher.MinWords, Gopher.MaxWords)
          .as("truth"))
    val joined = cls.join(gph, "doc_id")
    val pred = col("score_pm") >= col("threshold")
    joined
      .select(col("score_pm"), col("truth"),
        explode(typedLit(Thresholds)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        count(when(pred && col("truth"), 1)).as("tp"),
        count(when(pred && !col("truth"), 1)).as("fp"),
        count(when(!pred && col("truth"), 1)).as("fn"),
        count(when(!pred && !col("truth"), 1)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("tp * 1000000L div greatest(tp + fp, 1L)").as("precision_ppm"),
        expr("tp * 1000000L div greatest(tp + fn, 1L)").as("recall_ppm"))
  }

  /** Score range covered by the reliability bins: scores clamp into 8
    * 50k-per-mille-wide bins over [-200k, +200k). */
  val BinWidth = 50000L
  val BinLo = -200000L
  val NBins = 8

  /** RELIABILITY DIAGRAM (calibration) of the quality classifier
    * against the Gopher rule labels: per score bin, sample count and
    * the observed positive rate in ppm. A calibrated score has rate
    * rising with bin; a cliff or inversion says the score can gate but
    * not weight. Complements [[thresholdSweep]] (which fixes operating
    * points): this is the view that picks soft-label weights. One join
    * of two per-doc batteries + one 8-group aggregation — all integer
    * arithmetic. */
  def calibrationBins(df: DataFrame, id: Column, text: Column): DataFrame = {
    val cls = HashedLinear.score(df, id, text)
      .select(col("doc_id"),
        when(col("n_feats") === 0, 0L)
          .otherwise(expr("w_sum * 1000L div n_feats")).as("score_pm"))
    val gph = Gopher.stats(df, id, text)
      .select(col("doc_id"),
        col("n_words").between(Gopher.MinWords, Gopher.MaxWords)
          .as("truth"))
    cls.join(gph, "doc_id")
      .select(
        least(greatest(
          expr(s"(score_pm - $BinLo) DIV $BinWidth"), lit(0L)),
          lit(NBins - 1L)).as("bin"),
        col("truth"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col("truth"), 1)).as("positives"))
      .select(col("bin"), col("n"), col("positives"),
        expr("positives * 1000000L div n").as("rate_ppm"))
  }

  /** DuckDB replay: composes the classifier and Gopher oracle queries
    * as nested-WITH subqueries, so the sweep's truth and scores are BY
    * CONSTRUCTION the same as the declared per-doc queries'. */
  object Sql {
    def query(classifierSql: String, gopherSql: String): String = {
      val ts = Thresholds.mkString("[", ",", "]")
      s"""WITH c AS (
         |  SELECT doc_id, CASE WHEN n_feats = 0 THEN 0
         |    ELSE w_sum * 1000 // n_feats END AS score_pm
         |  FROM ($classifierSql) qc),
         |g AS (SELECT doc_id,
         |        n_words BETWEEN ${Gopher.MinWords} AND ${Gopher.MaxWords}
         |          AS truth
         |      FROM ($gopherSql) qg),
         |j AS (SELECT c.score_pm, g.truth
         |      FROM c JOIN g USING (doc_id)),
         |t AS (SELECT unnest($ts) AS threshold),
         |cf AS (
         |  SELECT t.threshold,
         |    count(*) FILTER (score_pm >= threshold AND truth) AS tp,
         |    count(*) FILTER (score_pm >= threshold AND NOT truth) AS fp,
         |    count(*) FILTER (score_pm < threshold AND truth) AS fn,
         |    count(*) FILTER (score_pm < threshold AND NOT truth) AS tn
         |  FROM t CROSS JOIN j GROUP BY 1)
         |SELECT CAST(threshold AS INT) AS threshold, tp, fp, fn, tn,
         |  tp * 1000000 // greatest(tp + fp, 1) AS precision_ppm,
         |  tp * 1000000 // greatest(tp + fn, 1) AS recall_ppm
         |FROM cf""".stripMargin
    }

    /** Reliability-bin replay — same composed batteries, same clamped
      * integer binning. */
    def calibrationQuery(classifierSql: String,
                         gopherSql: String): String =
      s"""WITH c AS (
         |  SELECT doc_id, CASE WHEN n_feats = 0 THEN 0
         |    ELSE w_sum * 1000 // n_feats END AS score_pm
         |  FROM ($classifierSql) qc),
         |g AS (SELECT doc_id,
         |        n_words BETWEEN ${Gopher.MinWords} AND ${Gopher.MaxWords}
         |          AS truth
         |      FROM ($gopherSql) qg),
         |j AS (
         |  SELECT least(greatest(
         |      (c.score_pm - $BinLo) // $BinWidth, 0), ${NBins - 1})
         |      AS bin,
         |    g.truth
         |  FROM c JOIN g USING (doc_id)),
         |b AS (
         |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (truth) AS BIGINT) AS positives
         |  FROM j GROUP BY 1)
         |SELECT bin, n, positives,
         |  positives * 1000000 // n AS rate_ppm
         |FROM b""".stripMargin
  }
}
