package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
