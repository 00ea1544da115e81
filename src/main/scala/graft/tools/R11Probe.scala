package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis

/** Round-11 decomposition probes (guide §1.4 noop sink): adjudicate
  * the duplicated-spans freq-join variants — (old) inner join against
  * the full counts table, (tail) left join against the f >= 2 tail,
  * (tailx) the tail join with an explicit fp-exchange barrier under
  * both consumers — with the final ADAPTIVE plan printed so the
  * broadcast decision and any double-evaluated chunk projection are
  * visible. Run: sbt "runMain graft.tools.R11Probe <sfDir> <variant...>"
  */
object R11Probe {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def chunkFps(t: org.apache.spark.sql.Column, chunkTokens: Int) = {
    val toks = split(t, " ")
    val nChunks = (size(toks) / chunkTokens).cast("int")
    when(nChunks <= 0, array()).otherwise(
      transform(sequence(lit(0), nChunks - 1),
        i => md5(array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " "))))
  }

  def spansVariant(spark: SparkSession, dir: String, variant: String,
                   chunkTokens: Int = 16): DataFrame = {
    val df = Tables(spark, dir, "documents")
    val chunks0 = df.select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(col("id"))
      .select(col("id"), explode(chunkFps(col("__text"), chunkTokens)).as("fp"))
    val chunks =
      if (variant == "tailx") chunks0.repartition(col("fp")) else chunks0
    val countsAll = chunks.groupBy(col("fp")).agg(count(lit(1)).as("c"))
    variant match {
      case "old" =>
        chunks.join(countsAll, "fp")
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      case "tail" | "tailx" =>
        chunks.join(countsAll.filter(col("c") >= 2), Seq("fp"), "left")
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      case other => sys.error(s"unknown variant $other")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants =
      if (args.length > 1) args.drop(1).toSeq else Seq("old", "tail", "tailx")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up
    try Tables(spark, dir, "region").count() catch { case _: Throwable => () }
    variants.foreach { v =>
      val df = spansVariant(spark, dir, v)
      spark.sparkContext.setJobDescription(s"spans:$v cold")
      time(s"spans $v cold")(noop(df))
      spark.sparkContext.setJobDescription(s"spans:$v warm")
      time(s"spans $v warm")(noop(spansVariant(spark, dir, v)))
      time(s"spans $v warm2")(noop(spansVariant(spark, dir, v)))
      println(s"=== spans $v FINAL ADAPTIVE PLAN ===")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
