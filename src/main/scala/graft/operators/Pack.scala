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

  /** FIXED-CONTEXT sequence packing — the GPT-style training prep the
    * budget packers above deliberately avoid: concatenate each group's
    * token stream in ascending-id order and cut it into examples of
    * EXACTLY `seqLen` tokens, documents spanning example boundaries
    * (the last example of a group may be short). [[packCappedBy]] keeps
    * documents whole and drops what doesn't fit; this keeps every token
    * and splits documents — both shapes ship in production, for
    * different trainers.
    *
    * Topology: no token ever becomes its own row. Per-doc token arrays
    * are materialized once behind a repartition barrier (alias-inlining
    * hazard — the tokenize battery must not be rebuilt inside the
    * window/agg); one window computes each doc's running token offset;
    * each doc explodes into only the examples it overlaps (≈ 1 + k/L
    * rows per doc, NOT k); array slices carve the per-example pieces;
    * one groupBy glues pieces in stream order. Two exchanges total
    * (group, then group × example), both carrying doc-granularity rows.
    *
    * Output: (group_id, example_id, n_tokens, n_docs, digest) where
    * digest is md5 of the space-joined example tokens — order-sensitive,
    * so the oracle must replay the exact stream, not a multiset. */
  def packFixedContext(df: DataFrame, groupCol: Column, idCol: Column,
                       toksCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val L = lit(seqLen.toLong)
    val base = df
      .select(groupCol.as("group_id"), idCol.cast("long").as("id"),
        toksCol.as("__toks"))
      .withColumn("__k", size(col("__toks")).cast("long"))
      .repartition(col("group_id"))
    val w = Window.partitionBy(col("group_id")).orderBy(col("id"))
    glueSpans(
      base
        .withColumn("__end", sum(col("__k")).over(w))
        .withColumn("__start", col("__end") - col("__k"))
        .drop("__end"),
      seqLen)
  }

  /** [[packFixedContext]] without the per-group window — the 100 TB
    * path when groups are FEW and huge (5 languages over a corpus puts
    * a window's whole partition on one reducer). Token offsets come
    * from the repo's two-pass prefix-sum shape instead
    * (`Splits.sliceByPosition`): range-partition + sort by (group, id),
    * collect per-partition per-group token totals (groups are
    * contiguous under the range partitioning, so this is
    * O(partitions + groups) driver state — ONE entry per partition per
    * resident group), fold base offsets on the driver, broadcast back,
    * and let each partition number its own rows. Both `.rdd` passes
    * share one RDD instance, so the sampled range boundaries are
    * computed once and consistent. Group ids travel as strings here
    * (offset-map keys); results are identical to the window path. */
  def packFixedContextScalable(df: DataFrame, groupCol: Column,
                               idCol: Column, toksCol: Column,
                               seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    val base = df
      .select(groupCol.cast("string").as("group_id"),
        idCol.cast("long").as("id"), toksCol.as("__toks"))
      .withColumn("__k", size(col("__toks")).cast("long"))
      .repartitionByRange(col("group_id"), col("id"))
      .sortWithinPartitions(col("group_id"), col("id"))
    val rdd = base.rdd // single reference: both passes see one partitioning
    val gIdx = base.schema.fieldIndex("group_id")
    val kIdx = base.schema.fieldIndex("__k")
    val perPart = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      it.foreach { r =>
        val g = r.getString(gIdx)
        m.update(g, m.getOrElse(g, 0L) + r.getLong(kIdx))
      }
      Iterator.single(i -> m.toVector)
    }.collect().sortBy(_._1)
    val running = scala.collection.mutable.HashMap[String, Long]()
    val bases = Map.newBuilder[(Int, String), Long]
    perPart.foreach { case (i, gs) =>
      gs.foreach { case (g, k) =>
        bases += ((i, g) -> running.getOrElse(g, 0L))
        running.update(g, running.getOrElse(g, 0L) + k)
      }
    }
    val bcast = spark.sparkContext.broadcast(bases.result())
    val outSchema = base.schema
      .add(org.apache.spark.sql.types.StructField("__start",
        org.apache.spark.sql.types.LongType, nullable = false))
    val withStart = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { (i, it) =>
        val local = scala.collection.mutable.HashMap[String, Long]()
        it.map { r =>
          val g = r.getString(gIdx)
          val start = bcast.value.getOrElse((i, g), 0L) +
            local.getOrElse(g, 0L)
          local.update(g, local.getOrElse(g, 0L) + r.getLong(kIdx))
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ start)
        }
      }, outSchema)
    glueSpans(withStart, seqLen)
  }

  /** Shared tail of the fixed-context packers: input carries
    * (group_id, __toks, __k, __start); explode each doc into the
    * examples it overlaps, slice the pieces, glue per example. */
  private def glueSpans(withStart: DataFrame, seqLen: Int): DataFrame =
    gluedParts(withStart, seqLen)
      .select(
        col("group_id"),
        col("example_id"),
        col("n_tokens"),
        col("n_docs"),
        md5(concat_ws(" ", col("__blk"))).as("digest"))

  /** The span-glue core shared by [[packFixedContext]]'s digest view
    * and [[inputTargetBlocks]]' id view: (group_id, example_id,
    * n_tokens, n_docs, __blk = the glued token array in stream
    * order). */
  private def gluedParts(withStart: DataFrame, seqLen: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    val spans = withStart
      // zero-token docs are dropped HERE (explode of null emits no
      // rows) rather than by an early filter: a filter above the
      // tokenize projection gets pushed into the scan with the
      // tokenize battery INLINED, running it twice per row. Empty
      // docs add 0 to the cumsum, so offsets are unaffected.
      .withColumn("example_id", explode(when(col("__k") > 0, sequence(
        expr(s"__start DIV $seqLen"),
        expr(s"(__start + __k - 1) DIV $seqLen")))))
      .withColumn("__lo",
        greatest(lit(0L), col("example_id") * L - col("__start")))
      .withColumn("__hi",
        least(col("__k"), (col("example_id") + lit(1L)) * L - col("__start")))
      .withColumn("__piece",
        expr("slice(__toks, CAST(__lo + 1 AS INT), CAST(__hi - __lo AS INT))"))
    spans
      .groupBy(col("group_id"), col("example_id"))
      .agg(
        sum(col("__hi") - col("__lo")).as("n_tokens"),
        count(lit(1)).as("n_docs"),
        // __start is strictly increasing within a group (k > 0), so the
        // struct sort restores stream order before the glue
        array_sort(collect_list(
          struct(col("__start"), col("__piece")))).as("__parts"))
      .select(
        col("group_id"),
        col("example_id"),
        col("n_tokens"),
        col("n_docs"),
        flatten(transform(col("__parts"), p => p.getField("__piece")))
          .as("__blk"))
  }

  /** LM TRAINING BLOCKS with the next-token shift (the reference's
    * group_and_split_input_target_fn — examples/training/
    * dataset_utils.py:112-140): each group's token-ID stream packs
    * into FULL blocks of seqLen+1 ids (the ragged remainder drops,
    * matching the reference), then input = block[0:L], target =
    * block[1:L+1], and class_weights mark non-padding targets (id 0 =
    * padding/OOV → weight 0). Same one-window glue as
    * [[packFixedContext]] (the scalable-offset twin applies
    * unchanged). Output: (group_id, example_id, input_ids, target_ids,
    * class_weights) — arrays; digest them for row-hash gates. */
  def inputTargetBlocks(df: DataFrame, groupCol: Column, idCol: Column,
                        idsCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val B = seqLen + 1
    val base = df
      .select(groupCol.as("group_id"), idCol.cast("long").as("id"),
        idsCol.as("__toks"))
      .withColumn("__k", size(col("__toks")).cast("long"))
      .repartition(col("group_id"))
    val w = Window.partitionBy(col("group_id")).orderBy(col("id"))
    gluedParts(
      base
        .withColumn("__end", sum(col("__k")).over(w))
        .withColumn("__start", col("__end") - col("__k"))
        .drop("__end"),
      B)
      .filter(col("n_tokens") === B.toLong) // full blocks only
      .select(col("group_id"), col("example_id"),
        slice(col("__blk"), 1, seqLen).as("input_ids"),
        slice(col("__blk"), 2, seqLen).as("target_ids"),
        transform(slice(col("__blk"), 2, seqLen),
          x => when(x =!= 0, 1).otherwise(0)).as("class_weights"))
  }

  /** DOCUMENT-BOUNDARY descriptors for the packed blocks of
    * [[inputTargetBlocks]] / [[packFixedContext]]: per (group, block),
    * the in-block offsets where a new document begins — the
    * attention-reset positions a trainer needs to build block-diagonal
    * masks so packed neighbors cannot attend across document seams. A
    * block with no entry is a pure continuation (its doc started in an
    * earlier block, no reset at offset 0 either). Offsets are emitted
    * as a comma-joined string (type-stable across engines) plus the
    * segment count. Same window topology as the packer itself: one
    * per-group running sum, then integer DIV/% against the block
    * width — zero extra shuffles beyond the group exchange. */
  def blockBoundaries(df: DataFrame, groupCol: Column, idCol: Column,
                      idsCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val B = seqLen + 1
    val base = df
      .select(groupCol.as("group_id"), idCol.cast("long").as("id"),
        idsCol.as("__toks"))
      .withColumn("__k", size(col("__toks")).cast("long"))
      .repartition(col("group_id"))
    val w = Window.partitionBy(col("group_id")).orderBy(col("id"))
    base
      .withColumn("__end", sum(col("__k")).over(w))
      .withColumn("__start", col("__end") - col("__k"))
      .filter(col("__k") > 0) // empty docs own no tokens, no seam
      .select(col("group_id"),
        expr(s"__start DIV $B").as("example_id"),
        expr(s"__start % $B").as("off"))
      .groupBy(col("group_id"), col("example_id"))
      .agg(count(lit(1)).as("n_segments"),
        array_join(array_sort(collect_list(col("off"))), ",")
          .as("seg_starts"))
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
