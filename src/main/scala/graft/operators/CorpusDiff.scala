package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus VERSION diffing — the dataset-versioning audit step: given
  * two snapshots of a document corpus, classify every id as `added`
  * (new only), `removed` (old only), `changed` (both, content
  * fingerprint differs), or `unchanged`. Production pipelines run this
  * between crawl refreshes / cleaning-rule changes to bound blast
  * radius ("this rule rewrote 40% of the corpus") before promoting a
  * snapshot; paired with [[Dedup.incremental]] it gives the full
  * version story (what changed + what the delta adds that's genuinely
  * new).
  *
  * Content identity is [[TextAnalysis.fingerprint]] (md5 of normalized
  * text), so whitespace-only edits read as `unchanged` and the whole
  * classification is engine-exact (oracle-checkable).
  *
  * Shape: one fingerprint projection per side (one scan each — no
  * pre-shuffle), a single full-outer equi-join on id (the only
  * shuffle, both sides co-partitioned on the join key), and a
  * null/compare case — linear end to end, no corpus-sized state. At
  * 100 TB both sides shuffle once on id; if snapshots are stored
  * bucketed by id the join is exchange-free. */
object CorpusDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: Column, textCol: Column): DataFrame = {
    val o = oldDf.select(idCol.cast("long").as("id"),
      TextAnalysis.fingerprint(textCol).as("__old_fp"))
    val n = newDf.select(idCol.cast("long").as("id"),
      TextAnalysis.fingerprint(textCol).as("__new_fp"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__old_fp").isNull, lit("added"))
          .when(col("__new_fp").isNull, lit("removed"))
          .when(col("__old_fp") === col("__new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Roll-up of [[diff]]: one row per status with counts — the
    * promote/abort gate number. */
  def summary(oldDf: DataFrame, newDf: DataFrame,
              idCol: Column, textCol: Column): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
