package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * that makes per-key statistics affordable at 100 TB: the base
  * corpus's aggregate state (key-sized, persisted) is NEVER recomputed;
  * each refresh aggregates only the DELTA (map-combined, delta-sized
  * shuffle) and merges it into the state with one key-sized full-outer
  * join. Correct for the distributive aggregates (count/sum/min/max);
  * algebraic ones (avg = sum/count) derive from them at read time;
  * holistic ones (exact median) need the repo's sketch twins
  * ([[graft.functions.Kmv]]-style mergeable state) instead.
  *
  * The merge is associative and commutative, so refreshes compose:
  * day-level deltas can merge into week state, weeks into the total —
  * the standard lambda/compaction ladder.
  */
object IncrementalAgg {

  /** Merge two aggregate-state frames sharing `key` + measure columns:
    * `sums` add (absent key = 0), `mins`/`maxs` take the defined
    * extreme (absent side ignored). One full-outer join on the key —
    * both inputs are key-sized, never corpus-sized. */
  def merge(base: DataFrame, delta: DataFrame, key: Seq[String],
            sums: Seq[String], mins: Seq[String] = Nil,
            maxs: Seq[String] = Nil): DataFrame = {
    val b = (sums ++ mins ++ maxs).foldLeft(base) {
      (df, c) => df.withColumnRenamed(c, s"__b_$c")
    }
    val d = (sums ++ mins ++ maxs).foldLeft(delta) {
      (df, c) => df.withColumnRenamed(c, s"__d_$c")
    }
    val merged = b.join(d, key, "full_outer")
    val sumCols = sums.map { c =>
      (coalesce(col(s"__b_$c"), lit(0L)) +
        coalesce(col(s"__d_$c"), lit(0L))).as(c)
    }
    val minCols = mins.map { c =>
      coalesce(least(col(s"__b_$c"), col(s"__d_$c")),
        col(s"__b_$c"), col(s"__d_$c")).as(c)
    }
    val maxCols = maxs.map { c =>
      coalesce(greatest(col(s"__b_$c"), col(s"__d_$c")),
        col(s"__b_$c"), col(s"__d_$c")).as(c)
    }
    merged.select(key.map(col) ++ sumCols ++ minCols ++ maxCols: _*)
  }
}
