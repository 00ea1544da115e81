package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints the formatted physical plan of every SparkEntry query plus a
  * quick scorecard: exchanges (shuffles), broadcasts, whole-stage
  * codegen coverage, and parquet scan column pruning. Run:
  *   sbt "runMain graft.tools.ExplainAudit /root/testdata/sf0.01 [query]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // audit-only: AQE wraps the plan in AdaptiveSparkPlan whose
      // toString hides WholeStageCodegen spans until execution — turn it
      // off HERE so the static plan shows codegen coverage (production
      // sessions keep AQE on)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_ == n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString()
          val exchanges = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
            .findAllIn(plan).size
          val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
          val scans = "Scan parquet|FileScan".r.findAllIn(plan).size
          // executedPlan.toString marks codegen'd operators as "*(id) Op"
          // — count DISTINCT ids (one id = one fused codegen span)
          val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
            .map(_.group(1)).toSet.size
          val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(plan).toSeq
          val pushed = "PushedFilters: [^\\n]+".r.findAllIn(plan).toSeq
          println(s"== $name: shuffles=$exchanges broadcasts=$broadcasts " +
            s"scans=$scans codegenSpans=$codegen")
          readSchemas.foreach(r => println(s"   $r"))
          pushed.filter(!_.contains("[]")).foreach(p => println(s"   $p"))
          if (only.isDefined) println(plan)
        } catch {
          case e: Throwable => println(s"== $name: EXPLAIN FAILED ${e.getMessage.take(200)}")
        }
      }
    spark.stop()
  }
}
