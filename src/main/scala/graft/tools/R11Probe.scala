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

  /** ngram rarest-first ordering A/B: (old) inner join against the
    * full frequency table vs (tail) left join against the f >= 2 tail
    * with coalesce(f, 1) — the r11 Dedup.ngramJaccardPairs change,
    * isolated to the ordered-prefix stage. */
  def ngramVariant(spark: SparkSession, dir: String, variant: String,
                   n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val df = Tables(spark, dir, "documents")
    val sets = df.select(col("doc_id").as("id"), col("text").as("__text"))
      .repartition(col("id"))
      .filter(size(TextAnalysis.tokens(col("__text"))) >= n)
      .select(col("id"), graft.operators.Dedup.shingles(col("__text"), n).as("sh"))
      .repartition(col("id"))
    val exploded = sets.select(col("id"), explode(col("sh")).as("g"))
    val freq = exploded.groupBy("g").agg(count(lit(1)).as("f"))
    val joined = variant match {
      case "old" => exploded.join(freq, "g")
      case "tail" => exploded.join(freq.filter(col("f") >= 2), Seq("g"), "left")
        .select(col("id"), col("g"), coalesce(col("f"), lit(1L)).as("f"))
      case other => sys.error(s"unknown variant $other")
    }
    joined.groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("f"), col("g")))),
        x => x.getField("g")).as("osh"))
      .withColumn("n_sh", size(col("osh")).cast("long"))
      .withColumn("plen",
        (floor(size(col("osh")) * lit(1.0 - threshold) + lit(1e-9)) + 2).cast("int"))
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
    variants.foreach {
      case v @ ("old" | "tail" | "tailx") =>
        val df = spansVariant(spark, dir, v)
        spark.sparkContext.setJobDescription(s"spans:$v cold")
        time(s"spans $v cold")(noop(df))
        spark.sparkContext.setJobDescription(s"spans:$v warm")
        time(s"spans $v warm")(noop(spansVariant(spark, dir, v)))
        time(s"spans $v warm2")(noop(spansVariant(spark, dir, v)))
        println(s"=== spans $v FINAL ADAPTIVE PLAN ===")
        println(df.queryExecution.executedPlan.toString.take(6000))
      case v @ ("ngram-old" | "ngram-tail") =>
        val variant = v.stripPrefix("ngram-")
        val df = ngramVariant(spark, dir, variant)
        spark.sparkContext.setJobDescription(s"$v cold")
        time(s"$v cold")(noop(df))
        time(s"$v warm")(noop(ngramVariant(spark, dir, variant)))
        time(s"$v warm2")(noop(ngramVariant(spark, dir, variant)))
        println(s"=== $v FINAL ADAPTIVE PLAN (joins/exchanges) ===")
        println(df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("Aggregate"))
          .mkString("\n"))
      case v @ ("card-floor" | "card-nofloor") =>
        val docs = Tables(spark, dir, "documents")
        val in = if (v == "card-floor") docs else docs.coalesce(1)
        spark.sparkContext.setJobDescription(s"$v cold")
        time(s"$v cold")(noop(
          graft.operators.DatasetCard.card(in, fuseScans = true)))
        time(s"$v warm")(noop(
          graft.operators.DatasetCard.card(in, fuseScans = true)))
        time(s"$v warm2")(noop(
          graft.operators.DatasetCard.card(in, fuseScans = true)))
      case other => sys.error(s"unknown variant $other")
    }
    spark.stop()
  }
}
