package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Scale stress harness (not part of the driver contract): generates a
  * multi-million-row synthetic corpus in /tmp and times the core
  * operators at local[32], to validate that the operator topologies
  * scale linearly before they meet a real cluster.
  * Run: sbt "runMain graft.tools.ScaleStress [rows]"
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val dir = "/tmp/graft-stress"
    // synthetic docs: ~15 tokens of a 1000-word vocabulary, zipf-ish key
    // distribution with deliberate skew (group 0 gets ~25% of rows)
    time(s"generate $rows docs") {
      spark.range(rows)
        .select(
          col("id"),
          concat(lit("g"),
            when(pmod(col("id"), lit(4)) === 0, 0)
              .otherwise(pmod(xxhash64(col("id")), lit(1000)))).as("key"),
          array_join(transform(sequence(lit(0), lit(14)),
            i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(1000)))),
            " ").as("text"))
        .write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)

    time("group counts (skewed 1001 groups)") {
      GroupCounts(docs, Grouper.byColumn("key")).count()
    }
    time("group counts salted x16") {
      GroupCounts.salted(docs, Grouper.byColumn("key"), 16).count()
    }
    time("capped pack deterministic (1MB cap)") {
      Pack.packCappedDeterministic(docs, Grouper.byColumn("key"),
        col("text"), col("id"), limit = 1000000L).count()
    }
    time("exact dedup") {
      Dedup.exact(docs, col("text"), col("id")).count()
    }
    time("simhash pairs (hamming<=3)") {
      Dedup.simhashPairs(docs.limit(1000000), col("text"), col("id")).count()
    }
    time("chunked blocks 512") {
      GroupConsumer.chunkedBlocks(docs.limit(1000000),
        Grouper.byColumn("key"), col("text"), col("id"), 512).count()
    }
    spark.stop()
  }
}
