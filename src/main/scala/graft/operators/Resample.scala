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
  }
}
