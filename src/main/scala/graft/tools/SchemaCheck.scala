package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: how does Spark 4 read the driver's events.parquet
  * (timestamp[ns]) and orders.parquet (timestamp[ms])? */
object SchemaCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("events", "orders")) {
      try {
        val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        println(s"[schema] $t: ${df.schema.simpleString}")
        df.show(2, truncate = false)
      } catch {
        case e: Throwable => println(s"[schema] $t FAILED: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
