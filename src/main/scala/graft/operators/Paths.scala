package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-pattern mining over per-entity ordered event streams:
  * the n-gram census of event-type paths ("view -> click -> purchase
  * happened 12k times across 3k users"). The windows partition by the
  * entity — per-user state only, no global ordering — and the census
  * is one map-combined groupBy on the path, so the operator scales
  * like any aggregation. Complements [[PageRank.transitionEdges]]
  * (bigram transitions) with length-3 paths and per-path entity reach.
  */
object Paths {

  /** Trigram census: (t1, t2, t3, n_paths, n_users) for every ordered
    * run of three consecutive events of the same entity. `n_users` is
    * an exact distinct count of entities that ever walked the path. */
  def trigramCensus(events: DataFrame, entityCol: Column, tsCol: Column,
                    tieCol: Column, stepCol: Column): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(tsCol, tieCol)
    events
      .select(entityCol.as("entity"), stepCol.as("t1"),
        lead(stepCol, 1).over(w).as("t2"),
        lead(stepCol, 2).over(w).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_paths"),
        countDistinct(col("entity")).as("n_users"))
  }

  /** DuckDB replay over `events(user_id, ts, event_id, event_type)`. */
  object Sql {
    def eventsTrigrams: String =
      s"""WITH seq AS (
         |  SELECT user_id, event_type AS t1,
         |    lead(event_type, 1) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         |    lead(event_type, 2) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS t3
         |  FROM events)
         |SELECT t1, t2, t3, count(*) AS n_paths,
         |  count(DISTINCT user_id) AS n_users
         |FROM seq WHERE t3 IS NOT NULL
         |GROUP BY 1, 2, 3""".stripMargin
  }
}
