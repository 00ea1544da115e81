package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
  * J. Algorithms 2005) — the fixed-state answer to "how often does each
  * term occur" when the term universe is too large to count exactly:
  * `depth` hash rows of `width` counters each; a term's estimate is the
  * MIN of its `depth` cells, which can only OVERcount (collisions add),
  * never undercount — estimate >= true count always, and with
  * probability 1 - (1/2)^depth the excess is under 2·N/width.
  *
  * Scale shape: building the sketch explodes each occurrence over the
  * `depth` row indices, but the following hash aggregation combines
  * map-side, so each task emits at most depth*width counter partials —
  * the shuffle carries O(depth*width) per task regardless of corpus
  * size, and the finished sketch is depth*width rows (a few KB). That's
  * the whole point vs an exact groupBy, whose shuffle and result scale
  * with the DISTINCT-term count. Estimation broadcasts the finished
  * sketch (tiny) against the candidate list.
  *
  * Determinism / oracle exactness: cells are md5-derived
  * (u32(md5(depth ':' term)) mod width) — no seeds, no JVM hashing —
  * so any engine replays the identical sketch cell-for-cell
  * (DuckDB: ('0x'||substr(md5(...),1,8))::BIGINT % width).
  */
object CountMin {

  /** The sketch cell of `term` on hash row `d` (both engines replay
    * this formula exactly). */
  private def cellOf(d: Column, term: Column, width: Int): Column =
    pmod(graft.expressions.Md5Hex.u32(
      concat(d.cast("string"), lit(":"), term)), lit(width.toLong))

  /** Build the sketch from one-row-per-occurrence `terms`: returns
    * (d, cell, cnt) with at most depth*width rows. Absent cells are
    * zero (they simply don't appear). */
  def sketch(terms: DataFrame, termCol: Column,
             depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    terms.select(termCol.as("__t"))
      .withColumn("d", explode(sequence(lit(0), lit(depth - 1))))
      .select(col("d"), cellOf(col("d"), col("__t"), width).as("cell"))
      .groupBy(col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** End-to-end heavy hitters: build the sketch over the occurrence
    * stream, estimate every DISTINCT term against it, and keep the
    * terms whose estimate clears a `phiNum/phiDen` fraction of the
    * stream length — the full pipeline (sketch -> candidate extraction
    * -> estimate -> threshold), not just the primitive. The threshold
    * compare is integer-exact (`est * phiDen >= n * phiNum`), so it
    * replays in any engine with no float in sight. Because the CMS only
    * ever OVERcounts, the result is a guaranteed superset of the true
    * phi-heavy hitters (no false negatives — the property downstream
    * exact rescans rely on).
    *
    * Scale shape: two linear passes over the stream (length + sketch)
    * and one distinct-vocabulary shuffle for candidates — vocabulary-
    * not corpus-sized. At extreme vocabularies swap the candidate pass
    * for an external/a-priori candidate list; sketch and threshold
    * stages are unchanged. */
  def heavyHitters(terms: DataFrame, termCol: Column, depth: Int,
                   width: Int, phiNum: Long, phiDen: Long): DataFrame = {
    require(phiNum > 0 && phiDen > 0, "phi must be positive")
    val stream = terms.select(termCol.as("term"))
    val n = stream.count() // exact stream length: one driver scalar
    val sk = sketch(stream, col("term"), depth, width)
    estimate(sk, stream.distinct(), col("term"), depth, width)
      .filter(col("cms_count") * phiDen >= lit(n) * phiNum)
  }

  /** [[sketch]] from a PRE-AGGREGATED (term, count) table instead of
    * the raw occurrence stream — when a groupBy-counts table already
    * exists (profiling pass), the sketch build is key-domain-sized
    * instead of corpus-sized. Identical output to [[sketch]] over the
    * stream the counts summarize. */
  def sketchWeighted(counts: DataFrame, termCol: Column, cntCol: Column,
                     depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    counts.select(termCol.as("__t"), cntCol.as("__c"))
      .withColumn("d", explode(sequence(lit(0), lit(depth - 1))))
      .select(col("d"), cellOf(col("d"), col("__t"), width).as("cell"),
        col("__c"))
      .groupBy(col("d"), col("cell"))
      .agg(sum(col("__c")).as("cnt"))
  }

  /** Equi-join SIZE estimation from two sketches built with the SAME
    * (depth, width) over the two join-key occurrence streams (AMS /
    * Alon-Gian-Matias-Szegedy style, via the CMS inner product —
    * Cormode & Muthukrishnan §4.2): |A ⋈ B on k| = Σ_v fA(v)·fB(v),
    * and each hash row's cell-wise inner product Σ_c AT[d,c]·BT[d,c]
    * equals that sum PLUS non-negative collision cross-terms — so
    * every row OVERestimates and min over rows is the tightest bound.
    * Returns (d, ip): one row per hash row; min(ip) is the estimate.
    *
    * The planner use case: size a join from two sketch-sized inputs
    * (depth*width rows each) WITHOUT touching either table — at 100 TB
    * the sketches are built once per column in the profiling pass and
    * every candidate join sizes from them for free. */
  def joinCardinalityByRow(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("d"), col("cell"), col("cnt").as("__ca"))
      .join(b.select(col("d"), col("cell"), col("cnt").as("__cb")),
        Seq("d", "cell"))
      .groupBy(col("d"))
      .agg(sum(col("__ca") * col("__cb")).as("ip"))

  /** Point-query the sketch for every row of `candidates`: min over the
    * term's `depth` cells (missing cell = 0 occurrences hashed there,
    * so the estimate — and hence the true count — is 0). The sketch is
    * broadcast: depth*width rows, never a corpus-side shuffle. */
  def estimate(sketch: DataFrame, candidates: DataFrame, termCol: Column,
               depth: Int, width: Int): DataFrame = {
    val cand = candidates.withColumn("__term", termCol)
      .withColumn("d", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("cell", cellOf(col("d"), col("__term"), width))
    val keep = candidates.columns
    cand.join(broadcast(sketch), Seq("d", "cell"), "left")
      .groupBy(keep.toIndexedSeq.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
