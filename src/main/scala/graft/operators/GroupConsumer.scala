package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Consumer-side per-group preprocessing (SURVEY §2.6) — the reference's
  * tokenize → concatenate → chunk-into-fixed-blocks pipeline
  * (examples/dataset_utils.py:112-148, applied per group at
  * train_jax.py:118-122), expressed relationally: explode tokens with
  * positions, assign a global per-group sequence, bucket into blocks.
  *
  * Scale shape: one shuffle on the group key serves the sequence window
  * AND the per-block aggregation; token explosion is linear and never
  * collects a group in memory (unlike the tf.data original, which
  * buffers per group).
  */
object GroupConsumer {

  /** Fixed-size token blocks per group: (group_id, block_idx, n_tokens,
    * block_digest). Order within a group is (orderCol, content hash,
    * token position) — the content-hash tiebreak makes offsets (and
    * hence digests) deterministic even when orderCol has duplicates
    * within a group; rows identical in BOTH are interchangeable, so the
    * result is always oracle-checkable. The final (ragged) block is kept
    * iff `dropRemainder` is false (the reference batches with
    * drop_remainder=True for train blocks). */
  def chunkedBlocks(df: DataFrame, grouper: Grouper, textCol: Column,
                    orderCol: Column, blockSize: Int,
                    dropRemainder: Boolean = false): DataFrame = {
    // global token sequence = per-DOC running offset + within-doc token
    // position: the window sorts only the document rows, not the
    // exploded tokens (15M-token stress case: the token-level
    // row_number sort was the pipeline's dominant cost)
    val docs = grouper.keyed(df)
      .select(col(grouper.name), orderCol.as("__ord"),
        TextAnalysis.tokens(textCol).as("__toks"))
    // xxhash64 of the token array breaks orderCol ties deterministically:
    // without it the running-sum offsets below would depend on the
    // engine's tie order (nondeterministic digests). Two rows tying on
    // BOTH columns carry identical token lists, so their order is
    // immaterial.
    val wDoc = Window.partitionBy(col(grouper.name))
      .orderBy(col("__ord"), xxhash64(col("__toks")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withOffset = docs.withColumn("__offset",
      coalesce(sum(size(col("__toks"))).over(wDoc).cast("long"), lit(0L)))
    val seqd = withOffset
      .select(col(grouper.name), col("__offset"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .withColumn("__seq", col("__offset") + col("__pos") + 1)
      .withColumn("block_idx", expr(s"CAST((__seq - 1) DIV $blockSize AS BIGINT)"))
    val blocks = seqd
      .groupBy(col(grouper.name), col("block_idx"))
      .agg(
        count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("__seq"), col("__tok")))),
          x => x.getField("__tok")), " ")).as("block_digest"))
    if (dropRemainder) blocks.filter(col("n_tokens") === blockSize) else blocks
  }

  /** Deterministic per-group example shuffle (dataset_utils.py:64-65
    * runs tf.data shuffle per group): reorder each group's packed
    * examples by a seeded hash of their content — reproducible across
    * runs and partitionings, unlike engine-random shuffles. */
  def shuffleExamples(packed: DataFrame, seed: Long): DataFrame =
    packed.withColumn("examples",
      transform(
        array_sort(transform(col("examples"),
          e => struct(xxhash64(e, lit(seed)).as("h"), e.as("e")))),
        x => x.getField("e")))

  /** Per-group repeat/take (dataset_utils.py:74-77): bounded sampling of
    * each group's examples — `take` keeps the first n after the
    * deterministic order, `repeat` tiles the array. */
  def takeExamples(packed: DataFrame, n: Int): DataFrame =
    packed.withColumn("examples", slice(col("examples"), 1, n))

  def repeatExamples(packed: DataFrame, times: Int): DataFrame = {
    require(times >= 0, s"times must be >= 0, got $times")
    if (times == 0)
      // sequence(1, 0) would count DOWN ([1,0]) and double the data
      packed.withColumn("examples",
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.BinaryType)))
    else
      packed.withColumn("examples",
        flatten(transform(sequence(lit(1), lit(times)), _ => col("examples"))))
  }
}
