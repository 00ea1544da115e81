package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Time a single declared query repeatedly (bench-identical digest). */
object QProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables(spark, dir, "region").count() // warm session
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
        .collect()
      println(f"[qprofile] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
