package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-partitioned sorted export — the terasort-shaped "write the
  * corpus globally ordered by a key, in N shards whose key ranges don't
  * overlap" step every large-scale dataset release runs (sorted shards
  * make downstream merge/bisect/range-read trivial).
  *
  * Spark's own `repartitionByRange` draws its range boundaries from a
  * reservoir SAMPLE — balanced, but nondeterministic run to run. This
  * operator fixes the boundaries as the key's EXACT interior quantiles
  * (one aggregation), then assigns shard = #cuts strictly below the
  * key. Same two-pass topology as terasort, but reproducible: identical
  * input always yields identical shard membership, which an external
  * engine can replay (the correctness oracle does).
  *
  * Scale shape: pass 1 is one `percentile` aggregation (exact; its
  * per-task state is a value-frequency map — for keys with unbounded
  * cardinality at extreme scale, swap in `approx_percentile`: shard
  * BALANCE softens but the manifest/write path is unchanged). Pass 2 is
  * a scan with the (nShards-1)-element cut array broadcast — shard
  * assignment is a per-row fold over the cuts, no shuffle. The manifest
  * aggregation and the partitioned write shuffle on the shard id only.
  * Skew note: duplicate keys all land in one shard by design (cuts
  * can't split equal keys); salt the key upstream if one value
  * dominates.
  */
object SortedExport {

  /** Input plus `shard` (0-based, nShards buckets by exact quantile
    * cuts of `key`): shard = number of interior quantiles strictly
    * below the row's key, so all rows of shard i sort before all rows
    * of shard i+1 (ties on a cut value stay in the lower shard).
    *
    * `exact = false` swaps `percentile` (whose per-task state is a
    * value-frequency map — unbounded for unbounded key cardinality)
    * for `approx_percentile` (GK sketch, bounded state): shard BALANCE
    * softens slightly, membership determinism and the manifest/write
    * path are unchanged in shape. Keep `exact` for oracle-replayable
    * boundaries and bounded-cardinality keys; use approx at extreme
    * key cardinality. */
  def assignShards(df: DataFrame, key: String, nShards: Int,
                   exact: Boolean = true): DataFrame = {
    require(nShards > 1, "nShards must be > 1")
    val ps = (1 until nShards).map(i => i.toDouble / nShards)
    val fn = if (exact) "percentile" else "approx_percentile"
    // Bounded driver-side collect of the (nShards-1)-element cut array,
    // inlined as literals: the assignment pass is then a pure scan (no
    // join of any kind — same idiom as Profiler.outliers). Null cuts
    // (empty input / all-null key) degrade to a single shard 0. The
    // key casts to double so both percentile variants return doubles.
    val cutsRow = df
      .agg(expr(
        s"$fn(CAST(`$key` AS DOUBLE), array(${ps.mkString(", ")}))"))
      .head()
    val cuts: Seq[Double] =
      if (cutsRow.isNullAt(0)) Seq.empty else cutsRow.getSeq[Double](0)
    val shard = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(key) > lit(c), 1).otherwise(0)
    }
    df.withColumn("shard", shard)
  }

  /** Per-shard export manifest: row count, key range, and an
    * order-insensitive membership digest (sum of the rows' u32 md5 id
    * hashes — commutative, so it aggregates map-side and pins shard
    * MEMBERSHIP exactly without collecting or sorting anything). */
  def manifest(df: DataFrame, key: String, id: String,
               nShards: Int): DataFrame = {
    val u32 = graft.expressions.Md5Hex.u32(col(id).cast("string"))
    assignShards(df, key, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(key)).as("min_key"),
        max(col(key)).as("max_key"),
        sum(u32).as("member_sum"))
  }

  /** Physically write the shards: one directory per shard
    * (`shard=<i>/`), every file within a shard an ascending (key, id)
    * run (tasks each write a sorted run; shard-local merge on read is
    * linear). Returns the shard count written. */
  def write(df: DataFrame, key: String, id: String, nShards: Int,
            path: String): Int = {
    assignShards(df, key, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(key), col(id))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    nShards
  }
}
