package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity
object ExplainIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val which = args.headOption.getOrElse("ivf")
    val df = which match {
      case "ivf" => Similarity.ivfTopK(emb.filter(col("vec_id") < 50), emb, 10,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        nCells = 16, nProbe = 4, seed = 42L)
      case "lsh" => Similarity.lshTopK(emb.filter(col("vec_id") < 50), emb, 10,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), dim = 64)
      case "pairs" => Similarity.cosinePairsLsh(emb, col("vec_id"), col("embedding"),
        threshold = 0.45, dim = 64, nBits = 6, nTables = 8, seed = 42L)
    }
    println("[PLAN-START]")
    val full = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/ivf_plan.txt"), full)
    println(s"plan chars: ${full.length}")
    println("[PLAN-END]")
    spark.stop()
  }
}
