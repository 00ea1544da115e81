package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered event funnel — the product-analytics staple: how many users
  * completed stage 1, then stage 2 AFTER their stage-1 time, then
  * stage 3 after that, with exact conversion shares. Order matters —
  * a purchase before the signup does not count — which is what makes
  * this harder than three filters.
  *
  * Shape: one aggregation per stage, each keyed on user — the stage-k
  * threshold (the user's earliest qualifying stage-k time) joins back
  * onto the events co-partitioned on the same key, so every shuffle in
  * the chain reuses one partitioning (AQE/exchange reuse keeps the
  * event table's hash exchange shared across stages; at 100 TB,
  * pre-bucketing events by user makes the whole chain exchange-free).
  * No per-user sort, no window over the corpus: each stage is a
  * map-combined min() — per-task state is one row per distinct user.
  *
  * Determinism: stage times are exact epoch-nanos mins; conversion
  * shares are integer ppm (n * 1,000,000 DIV prior-stage count — the
  * repo's exact-share idiom). Everything replays bit-for-bit in SQL.
  */
object Funnel {

  /** Single-row funnel summary over `events` (user, type, ts):
    * per-stage completer counts and ppm conversion vs the prior
    * stage. `stages` must list 2+ event types in funnel order. */
  def ordered(events: DataFrame, user: Column, eventType: Column,
              ts: Column, stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "a funnel needs at least 2 stages")
    val ev = events.select(user.as("__u"), eventType.as("__e"),
      ts.as("__ts"))
    // stage 1: earliest stage-1 event per user
    var cur = ev
      .groupBy(col("__u"))
      .agg(min(when(col("__e") === stages.head, col("__ts")))
        .as("t_1"))
    // stage k: earliest stage-k event at/after the user's stage-(k-1)
    // time; users without stage k-1 can never qualify (null >= null)
    stages.zipWithIndex.tail.foreach { case (st, i) =>
      val prior = cur.withColumnRenamed("__u", "__cu")
      val aggs = (min(col(s"t_$i")).as(s"t_$i") +:
        (1 until i).map(j => min(col(s"t_$j")).as(s"t_$j")) :+
        min(when(col("__e") === st && col("__ts") >= col(s"t_$i"),
          col("__ts"))).as(s"t_${i + 1}"))
      cur = ev.join(prior, col("__u") === col("__cu")).drop("__cu")
        .groupBy(col("__u"))
        .agg(aggs.head, aggs.tail: _*)
    }
    val counts = stages.indices.map(i =>
      count(col(s"t_${i + 1}")).as(s"n_stage${i + 1}"))
    val summary = cur.agg(counts.head, counts.tail: _*)
    val ppm = stages.indices.tail.map(i =>
      expr(s"n_stage${i + 1} * 1000000L DIV " +
        s"greatest(n_stage$i, 1L)").as(s"ppm_stage${i + 1}"))
    summary.select(stages.indices.map(i =>
      col(s"n_stage${i + 1}")) ++ ppm: _*)
  }

  /** The funnel recursion over per-user stage-time ARRAYS — the
    * post-aggregation half of the STREAMING twin. The arrays are the
    * stream's aggregation state (per user, per stage: every qualifying
    * event time), which makes the computation ORDER-INVARIANT by
    * construction: collect order varies with micro-batch slicing, but
    * `array_min` and the >=-threshold filters don't read order, so any
    * slicing lands on the batch result exactly — including late
    * arrivals that retroactively lower an earlier stage's time (the
    * case an incremental min-only state would get wrong: a late
    * earlier signup can unlock clicks already seen). State per user is
    * bounded by that user's stage-event count; a production deployment
    * caps it with a watermark horizon. `perUser` = (user col,
    * times_1 .. times_N arrays of epoch-ns longs). */
  def orderedFromStageTimes(perUser: DataFrame, nStages: Int): DataFrame = {
    require(nStages >= 2, "a funnel needs at least 2 stages")
    var cur = perUser.withColumn("t_1", array_min(col("times_1")))
    (2 to nStages).foreach { k =>
      cur = cur.withColumn(s"t_$k",
        array_min(filter(col(s"times_$k"), x => x >= col(s"t_${k - 1}"))))
    }
    val counts = (1 to nStages).map(i =>
      count(col(s"t_$i")).as(s"n_stage$i"))
    val summary = cur.agg(counts.head, counts.tail: _*)
    val ppm = (2 to nStages).map(i =>
      expr(s"n_stage$i * 1000000L DIV greatest(n_stage${i - 1}, 1L)")
        .as(s"ppm_stage$i"))
    summary.select((1 to nStages).map(i =>
      col(s"n_stage$i")) ++ ppm: _*)
  }
}
