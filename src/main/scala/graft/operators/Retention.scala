package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted corpus deletion — the right-to-be-forgotten / takedown
  * operation every governed 100 TB corpus runs on a schedule: remove
  * the rows named by a (tiny) delete-request list and emit the audit a
  * compliance pipeline needs to prove the rewrite did what it claimed.
  *
  * Scale shape: the delete list is per-request (thousands of keys vs
  * billions of rows), so it BROADCASTS into one marker join — the
  * corpus is scanned once and never shuffled on the key; the audit is
  * one map-combined aggregation over the marked rows. The physical
  * rewrite (writing the kept rows back out) is the same kept-side
  * filter feeding any writer — the audit digest is what a verifier
  * re-computes over the rewritten files to certify no survivor was
  * dropped and no target survived.
  *
  * Determinism / oracle exactness: every output is an exact integer —
  * counts, and an ORDER-INDEPENDENT survivor digest (the exact sum of
  * u32(md5(key)) over kept rows, the repo's md5 idiom), so any engine
  * replays the audit bit for bit.
  */
object Retention {

  /** Per-`group` deletion audit of `corpus` against `deletes` (a
    * one-column key frame): (group, n_kept, n_deleted, kept_hash). */
  def deleteAudit(corpus: DataFrame, deletes: DataFrame,
                  key: Column, group: Column): DataFrame = {
    val marked = corpus
      .select(group.as("group"), key.as("__k"))
      .join(broadcast(deletes.select(key.as("__k"),
        lit(true).as("__del"))), Seq("__k"), "left_outer")
    val u32 = graft.expressions.Md5Hex.u32(col("__k").cast("string"))
    marked.groupBy(col("group"))
      .agg(
        count(when(col("__del").isNull, 1)).as("n_kept"),
        count(col("__del")).as("n_deleted"),
        coalesce(sum(when(col("__del").isNull, u32)), lit(0L))
          .as("kept_hash"))
  }

  /** The survivor rows themselves (broadcast LEFT ANTI — the frame a
    * physical rewrite persists; [[deleteAudit]]'s kept side must agree
    * with a digest recomputed over this). */
  def survivors(corpus: DataFrame, deletes: DataFrame,
                key: Column): DataFrame =
    corpus.join(broadcast(deletes.select(key.as("__k"))),
      key === col("__k"), "left_anti")

  /** Robust time-series ANOMALY detection per key: fixed windows of
    * `windowNs`, a window's event count flagged when
    * |count − median| > nMads·1.4826·MAD — the median/MAD rule,
    * because a mean/σ z-score is poisoned by the very outliers it
    * hunts on heavy-tailed rates. Both medians are exact interpolated
    * percentiles over the per-key WINDOW-COUNT series (bounded by
    * windows-per-key, never event count — the repo's
    * quantile_cont-parity path), each |keys|-row table broadcast
    * back. The 1.4826 σ-consistency factor multiplies nMads
    * driver-side, so both engines compare against the identical
    * double. Output: the anomalous windows only,
    * (key, window_start, cnt, med, mad). */
  def anomalyWindows(df: DataFrame, tsCol: Column, keyCol: Column,
                     windowNs: Long, nMads: Double = 3.0): DataFrame = {
    require(windowNs > 0, "window must be positive")
    val wstart = tsCol - pmod(tsCol, lit(windowNs))
    val wc = df.groupBy(keyCol.as("key"), wstart.as("window_start"))
      .agg(count(lit(1)).as("cnt"))
    anomalyFromWindowCounts(wc, nMads)
  }

  /** The flagging half of [[anomalyWindows]], decoupled from how the
    * per-(key, window) counts were produced — in particular a
    * STREAMING aggregation's snapshot (the counts are the stream's
    * state; median/MAD are re-derived over the tiny windows-x-keys
    * table a dashboard reads, never over raw events). `wc` = (key,
    * window_start, cnt). */
  def anomalyFromWindowCounts(wc: DataFrame,
                              nMads: Double = 3.0): DataFrame = {
    val med = wc.groupBy(col("key"))
      .agg(expr("percentile(cnt, 0.5)").as("med"))
    val dev = wc.join(broadcast(med), "key")
      .withColumn("ad", abs(col("cnt") - col("med")))
    val mad = dev.groupBy(col("key"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    dev.join(broadcast(mad), "key")
      .filter(col("ad") > lit(nMads * 1.4826) * col("mad"))
      .select(col("key"), col("window_start"), col("cnt"),
        col("med"), col("mad"))
  }

  /** Time-DECAYED totals per key — the recency-weighted leaderboard
    * (trending keys, hot users) — with EXPONENTIAL decay and not one
    * transcendental: the elapsed WHOLE half-life count k is integer,
    * the weight is 10^6 >> k (power-of-two decay is exact; k >= 20
    * clamps to 0), and values accumulate as e4 decimals × ppm weights,
    * so the result replays bit-for-bit in SQL. The decay anchor is the
    * corpus' max timestamp — ONE driver-side scalar inlined as a plan
    * literal (the Profiler.outliers idiom; a joined 1-row anchor would
    * plan as a nested loop). One aggregation, map-combined.
    * Output: (key, n_events, decayed_value_e10). */
  /** Watermark-lateness audit — the table that PICKS a streaming
    * watermark delay before committing 100 TB/day to it: replay the
    * arrival sequence against event time and count, per key, the rows
    * a `withWatermark(delay)` pipeline would DROP — those whose event
    * time is older than the maximum event time across all PRIOR
    * arrivals minus the delay (the canonical watermark rule). The
    * output (count, dropped count, drop rate in bp, worst overshoot)
    * per key is read as: "at this delay, stream X loses N ppm — widen
    * the delay by the max overshoot to lose none".
    *
    * Scale shape: a watermark is an inherently sequential prefix-max,
    * replayed here as the classic two-level scan — a window
    * PARTITIONED by arrival block (parallel, no global sort of the
    * corpus) for the within-block prior max, plus a prefix max over
    * the tiny block-maxima table (one window over span/blockNs rows)
    * broadcast back. `arrivalCol` must be unique per row (ties would
    * make "prior" ambiguous); `blockNs` buckets it. All comparisons
    * are epoch-ns integers — exact in any engine. */
  def watermarkLateness(df: DataFrame, arrivalCol: Column, tsCol: Column,
                        keyCol: Column, delayNs: Long,
                        blockNs: Long = 3600L * 1000000000L): DataFrame = {
    require(delayNs >= 0, "delay must be non-negative")
    require(blockNs > 0, "block width must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(arrivalCol.as("__a"), tsCol.as("__t"),
      keyCol.as("key"))
      .withColumn("__blk",
        ((col("__a") - pmod(col("__a"), lit(blockNs)))
          / lit(blockNs.toDouble)).cast("long"))
    val wIn = Window.partitionBy(col("__blk")).orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blkMax = base.groupBy(col("__blk")).agg(max(col("__t")).as("__bm"))
    // prefix over the BLOCK table only — span/blockNs rows, not the
    // corpus (the single-partition window is bounded by construction)
    val wBlk = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = blkMax.select(col("__blk"),
      max(col("__bm")).over(wBlk).as("__pm"))
    val marked = base.join(broadcast(prefix), Seq("__blk"))
      // greatest skips nulls; null only for the very first arrival
      .withColumn("__prior",
        greatest(max(col("__t")).over(wIn), col("__pm")))
      .withColumn("__late", col("__prior").isNotNull &&
        col("__t") < col("__prior") - lit(delayNs))
    marked.groupBy(col("key")).agg(
      count(lit(1)).as("n_events"),
      sum(when(col("__late"), 1L).otherwise(0L)).as("n_late"),
      coalesce(max(when(col("__late"),
        col("__prior") - lit(delayNs) - col("__t"))), lit(0L))
        .as("max_late_ns"))
      .withColumn("late_bp", expr("(n_late * 10000) DIV n_events"))
  }

  def decayTotals(df: DataFrame, tsCol: Column, keyCol: Column,
                  valueCol: Column, halfLifeNs: Long): DataFrame = {
    require(halfLifeNs > 0, "half-life must be positive")
    val anchorRow = df.agg(max(tsCol)).head()
    val anchor =
      if (anchorRow.isNullAt(0)) 0L else anchorRow.getLong(0)
    val dt = lit(anchor) - tsCol
    // exact integer floor(dt / h): subtract the remainder first — the
    // double division of an exact multiple is exact below 2^53
    val k = ((dt - pmod(dt, lit(halfLifeNs))) / lit(halfLifeNs.toDouble))
      .cast("long")
    val weight = (0 until 20).foldLeft(when(k >= 20L, lit(0L))) {
      (acc, i) => acc.when(k === i.toLong, lit(1000000L >> i))
    }.otherwise(lit(0L))
    df.groupBy(keyCol.as("key"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(valueCol, 4).cast("decimal(18,4)") * weight) * 10000)
          .cast("long").as("decayed_value_e10"))
  }
}
