package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table writer/reader: the co-located-join primitive.
  *
  * A shuffle on the join key at every query is the dominant cost of a
  * repeated big-to-big join; writing both sides bucketed (and sorted)
  * by the key ONCE moves that shuffle to write time — every subsequent
  * join of tables bucketed into the same count on the same key plans
  * as a zero-exchange sort-merge join. This is the standard 100 TB
  * pattern for fact-to-fact joins (the reference's grouped TFRecord
  * shards are the same idea — co-partitioned persisted layout;
  * /root/reference/dataset_grouper/core/beam_transforms.py partitions
  * by group key at write time).
  *
  * Tables are registered as EXTERNAL (explicit path), so no warehouse
  * directory or Hive metastore is involved — just parquet files plus
  * bucket metadata in the session catalog.
  */
object Bucketed {

  /** Write `df` bucketed+sorted by `key` into `path`, registered as
    * external table `table` (replacing any previous registration). */
  def write(df: DataFrame, table: String, path: String,
            key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Hive-style partitioned layout: one directory per value of
    * `partitionCol` (`path/col=value/...`). A filter on the partition
    * column then prunes whole directories at PLANNING time — the scan
    * never lists, opens, or reads excluded partitions (shows as
    * `PartitionFilters` in the plan). THE first-order lever at 100 TB:
    * partition by coarse selectors (date, language, source), bucket by
    * join keys, sort within buckets. Keep partition cardinality modest
    * (thousands, not millions) or the file listing itself becomes the
    * bottleneck. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
