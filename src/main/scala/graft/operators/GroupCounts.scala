package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ByteSize, WordCount}

/** Per-group statistics — the reference's `compute_group_counts` pipeline
  * (dataset_grouper/beam_transforms.py:112-131, count_utils.py:29-65),
  * re-expressed as one declarative aggregation.
  *
  * Output schema: (group_id, num_examples, num_bytes, num_words).
  *
  * Scale notes: the reference shuffles every raw per-row triple through a
  * plain GroupByKey with NO map-side combine (beam_transforms.py:124 —
  * a perf bug at C4 scale). Here Catalyst plans partial+final
  * HashAggregate automatically, so the shuffle carries one partial triple
  * per (partition, group) instead of one per row — the 100 TB-safe shape.
  * Byte sizes of fixed-width columns are schema-time constants, so the
  * scan only reads the string columns it actually needs.
  */
object GroupCounts {

  def apply(df: DataFrame, grouper: Grouper): DataFrame = {
    val schema = df.schema // stats cover the original columns, not the key
    grouper
      .keyed(df)
      .groupBy(col(grouper.name))
      .agg(
        count(lit(1)).as("num_examples"),
        sum(ByteSize.exprFor(schema)).as("num_bytes"),
        sum(WordCount.exprFor(schema)).as("num_words"))
  }

  /** Skew-resistant two-phase variant: aggregate on (group, salt) first,
    * then re-aggregate per group. Identical results to [[apply]] (both
    * share the same DuckDB oracle); use when a handful of mega-groups
    * (e.g. one domain owning 10% of a 100 TB corpus) would overload
    * single reducers. Spark's partial aggregation already combats skew
    * map-side, but a hot final reducer still bottlenecks — salting
    * splits it across `saltBuckets` reducers at the cost of one extra
    * (tiny, one-row-per-group-per-bucket) shuffle. */
  def salted(df: DataFrame, grouper: Grouper, saltBuckets: Int): DataFrame = {
    val schema = df.schema
    grouper.keyed(df)
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(grouper.name), col("__salt"))
      .agg(
        count(lit(1)).as("n"),
        sum(ByteSize.exprFor(schema)).as("b"),
        sum(WordCount.exprFor(schema)).as("w"))
      .groupBy(col(grouper.name))
      .agg(
        sum(col("n")).as("num_examples"),
        sum(col("b")).as("num_bytes"),
        sum(col("w")).as("num_words"))
  }

  /** Reference text-line output format (count_utils.py:50-58):
    * `group_id<d>num_examples<d>num_bytes<d>num_words`. A BinaryType
    * group key ([[Grouper.byBytes]]) re-encodes as base64 HERE, at the
    * text boundary — never earlier (raw digest bytes aren't valid
    * UTF-8; everything upstream grouped on the bytes themselves). */
  def formatted(counts: DataFrame, delimiter: String = ",",
                groupCol: String = Grouper.GroupCol): DataFrame = {
    val key = counts.schema(groupCol).dataType match {
      case org.apache.spark.sql.types.BinaryType => base64(col(groupCol))
      case _ => col(groupCol)
    }
    counts.select(concat_ws(delimiter,
      key, col("num_examples"),
      col("num_bytes"), col("num_words")).as("line"))
  }

  /** Reference header line. Faithfully reproduces the reference's
    * latent inconsistency: the header is ALWAYS comma-separated even
    * when `delimiter` differs (tfds_pipelines.py:93-103,134-139 — noted
    * in SURVEY §2.1 S3). */
  val Header = "group_id,num_examples,num_bytes,num_words"

  /** Text sink for formatted counts (reference WriteToText with header,
    * tfds_pipelines.py:134-139): one header per shard, shards = input
    * partitions. */
  def writeFormatted(counts: DataFrame, dir: String,
                     delimiter: String = ",",
                     groupCol: String = Grouper.GroupCol): Unit = {
    val spark = counts.sparkSession
    import spark.implicits._
    formatted(counts, delimiter, groupCol).as[String]
      .mapPartitions(it => Iterator.single(Header) ++ it)
      .write.mode("overwrite").text(dir)
  }
}
