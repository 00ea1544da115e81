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

  /** Distribution DRIFT between two snapshots along a categorical
    * dimension — the monitoring twin of [[diff]]: where diff asks
    * "which rows changed", drift asks "did the corpus MIX shift"
    * (language balance after a crawl refresh, source balance after a
    * filter change). Per dimension value: both counts, both
    * parts-per-million shares, and the absolute ppm shift — the
    * per-cell contribution to total variation distance (sum(drift_ppm)
    * / 2e6 = TV), the standard promote/abort drift gate.
    *
    * Exactness: shares are INTEGER ppm (n * 1,000,000 DIV total — the
    * repo's exact-share idiom), so every cell replays bit-for-bit in
    * any engine; no KL/log anywhere.
    *
    * Shape: each side collapses to dimension cardinality with
    * map-combined counts (ONE linear pass per side — at 100 TB these
    * two aggregations are the whole cost); the joined count table is
    * materialized ONCE at dim size (localCheckpoint), the two totals
    * collapse to one driver row off it, and the share arithmetic
    * inlines them as literals — no re-aggregation of either corpus, no
    * broadcast-nested-loop of a totals row (the assignShards idiom). */
  /** Cross-source duplication matrix from a duplicate-PAIR graph (any
    * (id_a, id_b) pairs table — exact-fp, n-gram, MinHash, SimHash):
    * for every unordered source pair, how many duplicate pairs connect
    * them — the "which feeds duplicate each other" report that sets
    * crawl-dedup priorities (e.g. a CC snapshot vs C4). The diagonal
    * (source_a == source_b) is the within-source duplication rate.
    *
    * Shape: the pairs table (|dup pairs| rows, orders of magnitude
    * under the corpus) joins the (id, source) membership twice on id,
    * then reduces to a |sources|² matrix — never a corpus self-join;
    * the corpus contributes only its id→source projection. */
  def sourceOverlap(pairs: DataFrame, corpus: DataFrame,
                    idCol: Column, srcCol: Column): DataFrame = {
    val m = corpus.select(idCol.as("__id"), srcCol.as("__src"))
    pairs
      .join(m.select(col("__id").as("id_a"), col("__src").as("sa")),
        "id_a")
      .join(m.select(col("__id").as("id_b"), col("__src").as("sb")),
        "id_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  def drift(oldDf: DataFrame, newDf: DataFrame, dim: Column): DataFrame = {
    val a = oldDf.groupBy(dim.as("dim")).agg(count(lit(1)).as("n_v1"))
    val b = newDf.groupBy(dim.as("dim")).agg(count(lit(1)).as("n_v2"))
    val j = a.join(b, Seq("dim"), "full_outer")
      .select(col("dim"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"))
      .localCheckpoint()
    val tot = j.agg(sum(col("n_v1")), sum(col("n_v2"))).collect().head
    val (t1, t2) = (math.max(tot.getLong(0), 1L),
      math.max(tot.getLong(1), 1L))
    j.select(col("dim"), col("n_v1"), col("n_v2"),
        expr(s"n_v1 * 1000000L DIV ${t1}L").as("ppm_v1"),
        expr(s"n_v2 * 1000000L DIV ${t2}L").as("ppm_v2"))
      .withColumn("drift_ppm", abs(col("ppm_v1") - col("ppm_v2")))
  }
}
