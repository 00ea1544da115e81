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
}
