package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time operators in
  * graft.operators.Relational (SURVEY §2.4: streaming comes from Spark
  * built-ins). All transforms take an unbounded DataFrame from any
  * `readStream` source with columns (ts timestamp, user_id long,
  * event_type string, value double) and compose watermarks + windowed
  * aggregation / session windows / arbitrary keyed state.
  */
object EventStream {

  /** Tumbling 5-minute windows with a 10-minute watermark — the
    * streaming twin of Relational.eventsTumbling. */
  def tumbling(events: DataFrame,
               windowDuration: String = "5 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Session windows with a 30-minute inactivity gap — the built-in
    * `session_window` twin of Relational.eventsSessions. */
  def sessions(events: DataFrame,
               gap: String = "30 minutes",
               watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup: drop events whose key columns repeat within
    * the watermark horizon (bounded state — the streaming twin of
    * Dedup.exact for at-least-once sources that can replay events). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class UserRunning(user_id: Long, n_events: Long, total: Double)

  /** Arbitrary keyed state via flatMapGroupsWithState: per-user running
    * totals across micro-batches (the reference's per-group custom
    * processing surface, SURVEY §2.5, in streaming form). */
  def runningTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[UserRunning]
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
      .toDF()
  }
}
