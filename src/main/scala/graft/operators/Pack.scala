package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Accumulator for [[PackWithLimit]]: the packed payloads plus their total
  * byte size (reference `MergeAccumulator = tuple[list[bytes], int]`,
  * beam_transforms.py:28). */
final case class PackBuffer(items: Seq[Array[Byte]], total: Long)

/** Byte-capped group packer — the reference's `MergeWithLimitFn`
  * (dataset_grouper/beam_transforms.py:27-78) as a typed Spark
  * [[Aggregator]]. The four CombineFn lifecycle methods map 1:1 onto
  * zero/reduce/merge/finish; Spark's ObjectHashAggregate gives the same
  * partial (map-side reduce) + final (post-shuffle merge) split that
  * Beam's combiner lifting gives, and additionally spills to sort-based
  * aggregation when the hash map grows — strictly safer at scale.
  *
  * Drop-don't-fail semantics (pinned by beam_transforms_test.py:26-122):
  *  - `reduce` drops an element when `total + size >= limit` (the exact
  *    boundary also drops) and KEEPS TRYING later, smaller elements;
  *  - `merge` first tries to append the whole right-hand accumulator;
  *    if it doesn't fit it falls back to element-by-element and STOPS at
  *    the first element that doesn't fit, discarding the remainder — the
  *    reference's asymmetry (beam_transforms.py:54-74).
  *
  * Which examples survive a binding cap is arrival-order-dependent, same
  * as the reference under a distributed runner. For an oracle-checkable
  * deterministic variant see [[Pack.packCappedDeterministic]].
  */
final class PackWithLimit(limit: Long)
    extends Aggregator[Array[Byte], PackBuffer, Seq[Array[Byte]]] {

  override def zero: PackBuffer = PackBuffer(Vector.empty, 0L)

  override def reduce(b: PackBuffer, e: Array[Byte]): PackBuffer = {
    val n = e.length.toLong
    if (b.total + n >= limit) b
    else PackBuffer(b.items :+ e, b.total + n)
  }

  override def merge(l: PackBuffer, r: PackBuffer): PackBuffer =
    if (l.total + r.total < limit)
      PackBuffer(l.items ++ r.items, l.total + r.total)
    else {
      var items = l.items
      var total = l.total
      val it = r.items.iterator
      var stopped = false
      while (!stopped && it.hasNext) {
        val e = it.next()
        val n = e.length.toLong
        if (total + n >= limit) stopped = true
        else { items = items :+ e; total += n }
      }
      PackBuffer(items, total)
    }

  override def finish(b: PackBuffer): Seq[Array[Byte]] = b.items

  override def bufferEncoder: Encoder[PackBuffer] = Encoders.product[PackBuffer]
  override def outputEncoder: Encoder[Seq[Array[Byte]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Array[Byte]]]()
}

/** Partition-and-pack — the reference's flagship pipeline
  * (tfds_pipelines.py:25-78) re-expressed relationally. Groups are
  * first-class rows: `(group_id, examples array<binary>, num_examples,
  * num_bytes)`.
  */
object Pack {

  /** Reference protobuf size ceiling (beam_transforms.py:27). */
  val BytesLimit: Long = 2000000000L

  /** The capped packer as a DataFrame aggregation column:
    * `df.groupBy("group_id").agg(packWithLimit(limit)($"bytes"))`. */
  def packWithLimit(limit: Long = BytesLimit): Column => Column = {
    val u = udaf(new PackWithLimit(limit))
    c => u(c)
  }

  /** Faithful pack pipeline: key, serialize (caller supplies the payload
    * column — e.g. a proto-encoding expression or a raw binary column),
    * pack with the byte cap. One shuffle (partial agg map-side), exactly
    * one output row per group (reference invariant §1.4.1). */
  def packGroups(df: DataFrame, grouper: Grouper, payload: Column,
                 limit: Long = BytesLimit): DataFrame =
    grouper.keyed(df)
      .select(col(grouper.name), payload.cast("binary").as("__payload"))
      .groupBy(col(grouper.name))
      .agg(packWithLimit(limit)(col("__payload")).as("examples"))
      .select(
        col(grouper.name),
        col("examples"),
        size(col("examples")).cast("long").as("num_examples"),
        coalesce(aggregate(col("examples"), lit(0L),
          (acc, x) => acc + octet_length(x).cast("long")), lit(0L))
          .as("num_bytes"))

  /** Deterministic capped pack: rows are packed greedily in ascending
    * (byte size, tiebreak) order, which makes the surviving set — not
    * just the totals — independent of arrival order and partitioning,
    * hence oracle-checkable. With ascending sizes, greedy-with-skip
    * equals the maximal prefix with running total < limit, so the whole
    * thing is one window + one conditional aggregation.
    *
    * Scale shape: the window and the groupBy hash-partition on the same
    * key, so Catalyst plans a single exchange; the per-group sort is
    * the only extra cost over the faithful packer. Groups where even the
    * smallest row exceeds the cap still emit one row with an empty
    * examples array (reference invariant: one output record per group,
    * empty-but-present — serialization_test.py:45-58).
    */
  def packCappedDeterministic(df: DataFrame, grouper: Grouper,
                              payload: Column, tiebreak: Column,
                              limit: Long = BytesLimit): DataFrame =
    packCappedBy(df, grouper, payload, tiebreak,
      p => octet_length(p).cast("long"), limit)

  /** [[packCappedDeterministic]] with a caller-supplied WEIGHT function
    * over the BINARY payload — the byte cap is one instance; a TOKEN
    * budget (`TextAnalysis.tokenCount` over a decoded string payload)
    * turns the same operator into training-sequence packing: fill each
    * group's context window up to `limit` tokens with the deterministic
    * ascending-(weight, tiebreak) greedy. Same single-exchange
    * window+agg shape. */
  def packCappedBy(df: DataFrame, grouper: Grouper,
                   payload: Column, tiebreak: Column,
                   weigh: Column => Column,
                   limit: Long): DataFrame = {
    val keyed = grouper.keyed(df).select(
      col(grouper.name),
      payload.cast("binary").as("__payload"),
      tiebreak.as("__tb"))
      .withColumn("__bytes",
        coalesce(weigh(col("__payload")).cast("long"), lit(0L)))
    // the payload itself is the final tie-break: the caller's tiebreak
    // column may collide (duplicate ids in the wild), and the packed
    // order must be total for the digest to be engine-independent
    val w = Window.partitionBy(col(grouper.name))
      .orderBy(col("__bytes"), col("__tb"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = col("__cum") < limit
    keyed
      .withColumn("__cum", sum(col("__bytes")).over(w))
      .groupBy(col(grouper.name))
      .agg(
        // collect_list skips nulls => dropped rows vanish but the group
        // row itself survives (one record per group, possibly empty)
        sort_array(collect_list(when(kept,
          struct(col("__bytes"), col("__tb"), col("__payload"))))).as("__kept"),
        count(when(kept, lit(1))).as("num_examples"),
        coalesce(sum(when(kept, col("__bytes")).otherwise(0L)), lit(0L)).as("num_bytes"))
      .select(
        col(grouper.name),
        transform(col("__kept"), x => x.getField("__payload")).as("examples"),
        col("num_examples"),
        col("num_bytes"))
  }

  /** Uncapped fast path — plain `collect_list` (the built-in Spark shape
    * of the reference's packer when the 2 GB cap can't bind), sorted for
    * determinism. */
  def packUncapped(df: DataFrame, grouper: Grouper, payload: Column): DataFrame =
    grouper.keyed(df)
      .select(col(grouper.name), payload.cast("binary").as("__payload"))
      .groupBy(col(grouper.name))
      .agg(sort_array(collect_list(col("__payload"))).as("examples"))
      .select(col(grouper.name), col("examples"),
        size(col("examples")).cast("long").as("num_examples"))
}
