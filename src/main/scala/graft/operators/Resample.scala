package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap materialization and forward fill —
  * the "regular grid" step monitoring and feature pipelines need
  * before rate math (a missing bin is NOT a zero-rate bin until it
  * exists as a row).
  *
  * Shape: one aggregation to per-(key, bin) observations, one tiny
  * per-key span aggregate, a `sequence` explode to the dense grid, a
  * left join back, and ONE per-key ordered window for the
  * last-observation-carried-forward column. Everything partitions by
  * the series key — no global window, no driver loop. Grid size is
  * keys x (span / bin): pick the bin so a key's span stays bounded
  * (hourly bins over a 30-day corpus = 720 rows/key; a minute grain
  * over years would not be — the caller owns that product, same
  * contract as any resample).
  *
  * Exactness: sums use the repo's e4-decimal idiom (round to 4dp,
  * DECIMAL accumulation, scaled long) so the DuckDB replay is
  * bit-exact; counts, bins, and the gap flag are integers.
  */
object Resample {

  /** Per-(key, bin) grid over each key's own [min, max] bin span:
    * (key, bin, bin_start_ns, n_events, value_e4, filled_value_e4,
    * is_gap). `filled_value_e4` carries the last OBSERVED bin's sum
    * forward across gap rows (the first bin of a key is always
    * observed, so it is never null). */
  def gapFill(df: DataFrame, keyCol: Column, tsCol: Column,
              valueCol: Column, binNs: Long): DataFrame = {
    require(binNs > 0, "binNs must be positive")
    val obs = df
      .select(keyCol.as("key"), tsCol.as("__ts"), valueCol.as("__v"))
      .select(col("key"), expr(s"__ts div ${binNs}L").as("bin"), col("__v"))
      .groupBy(col("key"), col("bin"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("__v"), 4).cast("decimal(18,4)")) * 10000)
          .cast("long").as("value_e4"))
    val grid = obs.groupBy(col("key"))
      .agg(min(col("bin")).as("bmin"), max(col("bin")).as("bmax"))
      .select(col("key"),
        explode(sequence(col("bmin"), col("bmax"))).as("bin"))
    val byKey = Window.partitionBy(col("key")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bin"), "left")
      .select(col("key"), col("bin"),
        (col("bin") * binNs).as("bin_start_ns"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_e4"), lit(0L)).as("value_e4"),
        last(col("value_e4"), ignoreNulls = true).over(byKey)
          .as("filled_value_e4"),
        when(col("n_events").isNull, 1L).otherwise(0L).as("is_gap"))
  }

  /** SEASONALITY-AWARE gap audit at hour grain — [[gapFill]]'s grid
    * machinery composed with the hourly seasonality profile
    * (`events_hourly_seasonality`'s hour-of-day counts): every grid
    * bin carries the hour's EXPECTED event count (the key's total for
    * that hour-of-day, split evenly over the span's slots of that
    * hour, e3-scaled integer DIV) and the bin's deviation from it —
    * so a 3 a.m. gap reads as "expected ~0, fine" while a 2 p.m. gap
    * on a peaked profile reads as an outage. Carry-forward fill
    * ([[gapFill]]) answers "what was the level"; the seasonal
    * expectation answers "was this bin NORMAL".
    *
    * Shape: one corpus scan into (key, hour-bin) counts (map-side
    * combined); profile and slot tables are (keys x 24) rows,
    * BROADCAST into the span-sized metadata grid — the corpus is
    * never rescanned or re-shuffled. */
  def seasonalGapFill(df: DataFrame, keyCol: Column,
                      tsCol: Column): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val obs = df
      .select(keyCol.as("key"), tsCol.as("__ts"))
      .select(col("key"), expr(s"__ts div ${hourNs}L").as("bin"))
      .groupBy(col("key"), col("bin"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint() // three consumers: span, profile, the join
    val grid = obs.groupBy(col("key"))
      .agg(min(col("bin")).as("bmin"), max(col("bin")).as("bmax"))
      .select(col("key"),
        explode(sequence(col("bmin"), col("bmax"))).as("bin"))
      .withColumn("hour", pmod(col("bin"), lit(24L)))
    val prof = obs.withColumn("hour", pmod(col("bin"), lit(24L)))
      .groupBy(col("key"), col("hour"))
      .agg(sum(col("n_events")).as("n_h"))
    val slots = grid.groupBy(col("key"), col("hour"))
      .agg(count(lit(1)).as("d_h"))
    grid.join(obs, Seq("key", "bin"), "left")
      .join(broadcast(prof), Seq("key", "hour"), "left")
      .join(broadcast(slots), Seq("key", "hour"))
      .select(col("key"), col("bin"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_events").isNull, 1L).otherwise(0L).as("is_gap"),
        coalesce(col("n_h"), lit(0L)).as("__nh"), col("d_h"))
      .withColumn("expected_n_e3", expr("(__nh * 1000) DIV d_h"))
      .select(col("key"), col("bin"), col("hour"), col("n_events"),
        col("is_gap"), col("expected_n_e3"),
        (col("n_events") * 1000 - col("expected_n_e3"))
          .as("deviation_e3"))
  }

  /** DuckDB replay of [[gapFill]] over `events(event_type, ts, value)`.
    * `//` == Spark `div` (bins are non-negative epoch quotients);
    * `last_value(x IGNORE NULLS)` == Spark `last(x, ignoreNulls)` under
    * the same frame. */
  object Sql {
    def eventsByType(binNs: Long): String =
      s"""WITH e AS (
         |  SELECT event_type AS key, epoch_ns(ts) // ${binNs} AS bin, value
         |  FROM events),
         |obs AS (
         |  SELECT key, bin, count(*) AS n_events,
         |    CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) * 10000
         |         AS BIGINT) AS value_e4
         |  FROM e GROUP BY 1, 2),
         |span AS (SELECT key, min(bin) AS bmin, max(bin) AS bmax
         |         FROM obs GROUP BY 1),
         |grid AS (SELECT key, unnest(generate_series(bmin, bmax)) AS bin
         |         FROM span),
         |j AS (SELECT g.key, g.bin, o.n_events, o.value_e4
         |      FROM grid g LEFT JOIN obs o
         |        ON o.key = g.key AND o.bin = g.bin)
         |SELECT key, bin, bin * ${binNs} AS bin_start_ns,
         |  COALESCE(n_events, CAST(0 AS BIGINT)) AS n_events,
         |  COALESCE(value_e4, CAST(0 AS BIGINT)) AS value_e4,
         |  last_value(value_e4 IGNORE NULLS) OVER (
         |    PARTITION BY key ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS filled_value_e4,
         |  CAST(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_gap
         |FROM j""".stripMargin

    /** DuckDB replay of [[Resample.seasonalGapFill]] over events. */
    val eventsSeasonal: String =
      """WITH obs AS (
        |  SELECT event_type AS key, epoch_ns(ts) // 3600000000000
        |      AS bin,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT key, min(bin) AS bmin, max(bin) AS bmax
        |         FROM obs GROUP BY 1),
        |grid AS (SELECT key, unnest(generate_series(bmin, bmax)) AS bin
        |         FROM span),
        |g AS (SELECT key, bin, bin % 24 AS hour FROM grid),
        |prof AS (SELECT key, bin % 24 AS hour,
        |           CAST(sum(n_events) AS BIGINT) AS n_h
        |         FROM obs GROUP BY 1, 2),
        |slots AS (SELECT key, hour, CAST(count(*) AS BIGINT) AS d_h
        |          FROM g GROUP BY 1, 2)
        |SELECT g.key, g.bin, CAST(g.hour AS BIGINT) AS hour,
        |  COALESCE(o.n_events, CAST(0 AS BIGINT)) AS n_events,
        |  CAST(CASE WHEN o.n_events IS NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_gap,
        |  (COALESCE(p.n_h, CAST(0 AS BIGINT)) * 1000) // s.d_h
        |    AS expected_n_e3,
        |  COALESCE(o.n_events, CAST(0 AS BIGINT)) * 1000
        |    - (COALESCE(p.n_h, CAST(0 AS BIGINT)) * 1000) // s.d_h
        |    AS deviation_e3
        |FROM g
        |LEFT JOIN obs o ON o.key = g.key AND o.bin = g.bin
        |LEFT JOIN prof p ON p.key = g.key AND p.hour = g.hour
        |JOIN slots s ON s.key = g.key AND s.hour = g.hour""".stripMargin
  }
}
