package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // sbt wraps stdout in [info] decoration, which broke the driver's
    // JSON extraction in round 1 (BENCH_r01 "parsed": null) — the result
    // line is ALSO written verbatim to a file
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    // Snapshot the PRIOR committed artifact before this run clobbers it:
    // per-query ratios vs that run go INTO the new artifact, so the
    // throttle-vs-regression adjudication (this host inflates identical
    // binaries 1.4-70x in throttle windows; see BENCH_ISOLATED.json) is
    // one artifact instead of three cross-referenced ones.
    val prior: Map[String, Double] = priorQueries(outPath)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // the ScaleStress sweep lessons apply to this 222-query session
      // too: the ContextCleaner frees dead broadcasts/shuffle state
      // only after a GC, and its default periodic GC is longer than
      // the whole run
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warm-up outside the timed region so the
    // first query's number is comparable to the rest
    try {
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7))
        .count().count()
      Tables(spark, sfDir, "region").count()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // snapshot persistent RDD ids so the post-query cleanup below can
      // drop ONLY blocks this query created — unpersisting everything
      // would invalidate any future cross-query cached/checkpointed
      // DataFrame with a missing-block error traceable only to this loop
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      // force FULL materialization of every output column: a bare
      // .count() lets Catalyst prune unused projections, so projection-
      // heavy queries would time little more than the parquet scan.
      // xxhash64 over all columns consumes each value produced. The
      // digest sums as DECIMAL(38,0): summing raw longs overflows under
      // ANSI after ~2 random hashes, aborting the job MID-MATERIALIZATION
      // and silently under-reporting the query (the catch below ate it).
      try {
        val df = fn(spark, sfDir)
        df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
          .collect()
      } catch {
        case t: Throwable =>
          // record the failure IN the artifact: a time-to-failure summed
          // into the total would read as a plausible fast success
          failed += name
          System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop this query's localCheckpoint blocks before the next one:
      // checkpoint-heavy queries otherwise pile storage onto the heap
      // and every LATER query pays the GC drag (~40% uniform inflation
      // observed across the 222-query run before this unpersist)
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!persistedBefore.contains(id)) rdd.unpersist(blocking = false)
        }
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // The full artifact (with the 68-entry per-query map, ~2,900 chars)
    // goes to the file ONLY: the driver captures just a 2,000-char tail
    // of stdout, so printing the long line left the perf gate reading
    // "parsed": null for three straight rounds (it arrived truncated
    // mid-JSON). Stdout gets a short total-only summary — well under the
    // tail budget — printed LAST so it survives the tail capture.
    // Per-query ratios vs the prior committed run. Sub-0.3s prior lines
    // are skipped (ratio of noise); the top offenders land in the
    // artifact so BenchIsolated's auto mode can re-measure exactly them.
    val ratios = results.toSeq.flatMap { case (k, v) =>
      prior.get(k).filter(_ >= 0.3).map(p => (k, v / p))
    }
    // Locale.ROOT: f"" uses the JVM default locale, and a comma-decimal
    // locale (de_DE) would render 0,95 and corrupt the JSON artifact.
    def num(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f",
        java.lang.Double.valueOf(v))
    val ratioJson =
      if (ratios.isEmpty) "null"
      else {
        val sortedR = ratios.map(_._2).sorted
        val median = sortedR(sortedR.length / 2)
        val top = ratios.sortBy(-_._2).take(8)
          .map { case (k, r) => s""""$k":${num(r, 2)}""" }
          .mkString("{", ",", "}")
        s"""{"n":${ratios.length},"median":${num(median, 3)},"top":$top}"""
      }
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"queries":$qs,"failed":$failedJson,"ratios_vs_prior":$ratioJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), fullLine + "\n")
    val medianStr =
      if (ratios.isEmpty) "null"
      else num(ratios.map(_._2).sorted.apply(ratios.length / 2), 3)
    // r11 (VERDICT item 2): ALSO print the full line (per-query map +
    // cores) so a driver that reads more than the 2,000-char stdout
    // tail regains per-query/geomean/scaling comparability. Printed
    // FIRST and additions-only: the short line stays LAST, so a
    // tail-only parser sees exactly the r5-r10 contract (the full
    // line's own "{"metric" head is cut out of any 2,000-char tail,
    // so it can never shadow the short line there).
    println(fullLine)
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"n":${results.size},"failed":$failedJson,"ratio_median":$medianStr,"sf":"$sfDir"}"""
    println(shortLine)
    spark.stop()
  }

  /** Parse the per-query seconds map out of a prior bench artifact
    * (json4s ships with Spark; absent/corrupt artifact -> empty). */
  def priorQueries(path: String): Map[String, Double] =
    try {
      import org.json4s._
      val j = jackson.JsonMethods.parse(Files.readString(Paths.get(path)))
      j \ "queries" match {
        case JObject(fs) => fs.collect {
          case (k, JDouble(v))  => k -> v
          case (k, JInt(v))     => k -> v.toDouble
          case (k, JDecimal(v)) => k -> v.toDouble
          case (k, JLong(v))    => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }
}
