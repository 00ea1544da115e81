package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.Dedup
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ngp] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    time("warmup")(docs.count())
    val sets = docs.select($"doc_id".as("id"), $"text".as("__text"))
      .repartition($"id")
      .filter(size(TextAnalysis.tokens($"__text")) >= 3)
      .select($"id", Dedup.shingles($"__text", 3).as("sh"))
    time("sets")(sets.count())
    val exploded = sets.select($"id", explode($"sh").as("g"))
    time("exploded")(exploded.count())
    val freq = exploded.groupBy("g").agg(count(lit(1)).as("f"))
    time("freq")(freq.count())
    val ordered = exploded.join(freq, "g").groupBy($"id")
      .agg(transform(array_sort(collect_list(struct($"f", $"g"))), x => x.getField("g")).as("osh"))
      .withColumn("n_sh", size($"osh").cast("long"))
      .withColumn("plen", (floor(size($"osh") * lit(0.2) + lit(1e-9)) + 2).cast("int"))
      .repartition($"id")
    time("ordered+prefixlen")(ordered.count())
    val prefixes = ordered.select($"id", $"n_sh",
      posexplode(slice($"osh", lit(1), $"plen")).as(Seq("p0", "g")))
      .withColumn("p", ($"p0" + 1).cast("long")).drop("p0")
    time("prefixes")(prefixes.count())
    val candidates = prefixes.as("a").join(prefixes.as("b"),
      $"a.g" === $"b.g" && $"a.id" < $"b.id" &&
      $"b.n_sh" * lit(0.8) <= $"a.n_sh" + lit(1e-6) &&
      $"a.n_sh" * lit(0.8) <= $"b.n_sh" + lit(1e-6) &&
      least($"a.n_sh" - $"a.p", $"b.n_sh" - $"b.p") + 1 >=
        ($"a.n_sh" + $"b.n_sh") * lit(0.8 / 1.8) - lit(1e-6))
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    time("candidates")(candidates.count())
    val withSets = candidates
      .join(sets.select($"id".as("id_a"), $"sh".as("sh_a")), "id_a")
      .join(sets.select($"id".as("id_b"), $"sh".as("sh_b")), "id_b")
    time("verified")(withSets
      .withColumn("ni", size(array_intersect($"sh_a", $"sh_b"))).filter($"ni" > 0).count())
    time("full")(Dedup.ngramJaccardPairs(docs, $"text", $"doc_id", 3, 0.8).count())
    spark.stop()
  }
}
