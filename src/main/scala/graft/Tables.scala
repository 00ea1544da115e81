package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (driver parquet, /root/repo/TESTDATA.md).
  *
  * events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
  * rejects by default; `nanosAsLong` maps it to epoch-nanosecond longs
  * (the DuckDB oracle mirrors with `epoch_ns(ts)`). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }
}
