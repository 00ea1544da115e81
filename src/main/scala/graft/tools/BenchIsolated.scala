package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Isolated cold/warm timing for a set of declared queries, written as
  * one JSON file (`BENCH_ISOLATED.json`) committed alongside the round's
  * bench artifact — so a reader can separate host-throttle anomalies in
  * a driver bench run from genuine plan regressions without re-deriving
  * the isolation runs (this host's documented throttling windows have
  * inflated identical binaries 10-70x).
  *
  * cold = first materialization in the session (includes codegen +
  * plan warm-up for that query's operators); warm = best of the
  * remaining reps. Usage:
  *   sbt "runMain graft.tools.BenchIsolated <sfDir> <out.json> q1 q2 ..."
  */
object BenchIsolated {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("BENCH_ISOLATED.json")
    // "auto" = adjudicate the FINAL run's actual outliers, not a
    // hand-picked list: read the bench artifact this session just wrote
    // (which embeds per-query ratios vs the prior committed run) and
    // measure every >2.5x line plus the top entries — so each committed
    // outlier carries a same-HEAD cold/warm pair.
    val names: Seq[String] =
      if (args.length > 2 && args(2) == "auto") {
        val artifact = if (args.length > 3) args(3) else "BENCH_OUT.json"
        val auto = autoOutliers(artifact)
        require(auto.nonEmpty,
          s"auto mode found no ratios_vs_prior in $artifact — run Bench first")
        System.err.println(s"[isolated] auto outliers: ${auto.mkString(", ")}")
        auto
      } else if (args.length > 2) args.drop(2).toSeq
      else Seq("dedup_keep_best_documents", "dedup_clusters_documents",
        "events_stream_interval_join", "dedup_ngram_documents",
        "pack_token_budget_documents")
    val reps = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // parity with Bench/Smoke/Verify: extension-registered SQL
      // (sql_text_stats_extension) must resolve here too
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables(spark, dir, "region").count() // absorb session warm-up
    val rows = names.map { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = times.head
      val warm = times.tail.min
      System.err.println(f"[isolated] $name cold=$cold%.2f warm=$warm%.2f")
      f"""  "$name": {"cold": $cold%.3f, "warm": $warm%.3f}"""
    }
    Files.writeString(Paths.get(out),
      rows.mkString(s"""{\n  "sf": "$dir", "cpus": $cpus,\n""", ",\n", "\n}\n"))
    spark.stop()
  }

  /** The outlier list embedded by Bench: every ratios_vs_prior.top
    * entry with ratio > 2.5, or (if none cross the bar) the single
    * worst one as a sanity anchor. */
  def autoOutliers(artifact: String): Seq[String] =
    try {
      import org.json4s._
      val j = jackson.JsonMethods.parse(
        Files.readString(Paths.get(artifact)))
      j \ "ratios_vs_prior" \ "top" match {
        case JObject(fs) =>
          val parsed = fs.collect {
            case (k, JDouble(v))  => k -> v
            case (k, JInt(v))     => k -> v.toDouble
            case (k, JDecimal(v)) => k -> v.toDouble
          }
          val over = parsed.filter(_._2 > 2.5).map(_._1)
          if (over.nonEmpty) over
          else parsed.sortBy(-_._2).take(1).map(_._1)
        case _ => Seq.empty
      }
    } catch { case _: Throwable => Seq.empty }
}
