package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table access (driver parquet, /root/repo/TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
