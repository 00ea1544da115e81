package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
  * 1996, the consistent-placement scheme behind cache rings and
  * shard-stable storage layouts: a key lands on the shard whose
  * md5(shard ":" key) weight is highest. When the shard count grows
  * n → n+1, ONLY the keys whose new shard wins move (≈ 1/(n+1) of
  * them) — mod-hashing reshuffles ≈ n/(n+1) of the corpus, which at
  * 100 TB is the difference between topping up a layout and rewriting
  * it. md5 weights make placement engine-exact.
  */
object Rendezvous {

  /** The winning shard for `id` among shards 0..nShards-1: argmax of
    * u32(md5(shard ":" id)), ties (impossible below u32 collision) to
    * the lower shard. One sorted struct array per row — the
    * cellsByAffinity idiom; nShards md5 evaluations per key, so keep
    * nShards to physical-shard counts (not hash-space sizes). */
  def shardOf(id: Column, nShards: Int): Column = {
    require(nShards > 0, "nShards must be positive")
    val scored = array((0 until nShards).map { sh =>
      struct(
        (-graft.expressions.Md5Hex.u32(
          concat(lit(s"$sh:"), id.cast("string")))).as("negw"),
        lit(sh.toLong).as("sh"))
    }: _*)
    element_at(transform(array_sort(scored), x => x.getField("sh")), 1)
  }

  /** WEIGHTED rendezvous via virtual replicas: shard s with integer
    * capacity w_s competes with w_s independent md5 weights (replica
    * keys "s#r:key"), so its win probability is exactly
    * w_s / Σw — heterogeneous shard capacities without the classic
    * weighted-HRW -w/ln(u) formula, whose log the repo's exactness
    * discipline forbids (libm ulps differ across engines). Keys keep
    * the consistency property: changing ONE shard's weight only moves
    * keys into or out of that shard. Cost: Σw md5 evaluations per
    * key — fine for physical-shard counts. */
  def shardOfWeighted(id: Column, weights: Seq[Int]): Column = {
    require(weights.nonEmpty && weights.forall(_ >= 1),
      "weights must be positive")
    val scored = array(weights.zipWithIndex.flatMap { case (w, sh) =>
      (0 until w).map { r =>
        struct(
          (-graft.expressions.Md5Hex.u32(
            concat(lit(s"$sh#$r:"), id.cast("string")))).as("negw"),
          lit(sh.toLong).as("sh"))
      }
    }: _*)
    element_at(transform(array_sort(scored), x => x.getField("sh")), 1)
  }

  /** The resize TRANSITION MATRIX between an nFrom- and an nTo-shard
    * layout: (shard_from, shard_to, n_keys). Off-diagonal mass is the
    * churn the resize pays; rendezvous keeps shard IDENTITY for
    * unmoved keys, so "unmoved" is literally shard_from == shard_to. */
  def resizeChurn(df: DataFrame, idCol: Column, nFrom: Int,
                  nTo: Int): DataFrame =
    df.select(shardOf(idCol, nFrom).as("shard_from"),
        shardOf(idCol, nTo).as("shard_to"))
      .groupBy(col("shard_from"), col("shard_to"))
      .agg(count(lit(1)).as("n_keys"))
}
