package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors
import graft.operators.Dedup

/** Scratch profiler for operator hot paths (not part of the driver
  * contract; run with `sbt "runMain graft.tools.Profile <sfdir>"`). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROFILE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }

    val emb = Tables(spark, dir, "embeddings")
    val docs = Tables(spark, dir, "documents")

    time("warmup count")(emb.count())

    // A: current cosine pairs (3 HOFs per pair)
    val v = emb.select($"vec_id".as("id"), $"embedding".as("vec"))
    time("pairs: dot/(norm*norm) per pair") {
      v.as("a").join(v.as("b"), $"a.id" < $"b.id")
        .withColumn("c", round(Vectors.cosine($"a.vec", $"b.vec"), 6))
        .filter($"c" >= 0.45).count()
    }
    // B: pre-normalized, 1 HOF per pair
    val nv = emb.select($"vec_id".as("id"),
      transform($"embedding", x => x.cast("double") / Vectors.norm($"embedding")).as("vec"))
    time("pairs: prenormalized dot") {
      nv.as("a").join(nv.as("b"), $"a.id" < $"b.id")
        .withColumn("c", round(Vectors.dot($"a.vec", $"b.vec"), 6))
        .filter($"c" >= 0.45).count()
    }
    // C: prenormalize + repartition barrier
    val nvb = nv.repartition(32)
    time("pairs: prenormalized+barrier dot") {
      nvb.as("a").join(nvb.as("b"), $"a.id" < $"b.id")
        .withColumn("c", round(Vectors.dot($"a.vec", $"b.vec"), 6))
        .filter($"c" >= 0.45).count()
    }

    // minhash: signature only
    val sets = docs.select($"doc_id".as("id"), Dedup.shingles($"text", 3).as("sh"))
      .filter(size($"sh") > 0)
    time("shingle sets")(sets.count())
    val signed = sets.withColumn("sig", Dedup.minhashSignature($"sh", 64, 42L))
    time("signatures")(signed.count())
    val banded = signed.select($"id",
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice($"sig", b * 4 + 1, lit(4)), b))))
    time("banded (collapse risk)")(banded.count())
    val bandedBarrier = signed.repartition(32).select($"id",
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice($"sig", b * 4 + 1, lit(4)), b))))
    time("banded (repartition barrier)")(bandedBarrier.count())

    time("full minhashLshPairs") {
      Dedup.minhashLshPairs(docs, $"text", $"doc_id").count()
    }
    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, $"text", $"doc_id", 3, 0.8).count()
    }
    // minhash stage breakdown
    val sets2 = docs.select($"doc_id".as("id"), Dedup.shingles($"text", 3).as("sh"))
      .filter(size($"sh") > 0).repartition($"id")
    val signed2 = sets2.withColumn("sig", Dedup.minhashSignature($"sh", 64, 42L))
    val banded2 = signed2.select($"id",
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice($"sig", b * 4 + 1, lit(4)), b))))
      .select($"id", $"pos".as("band"), $"col".as("bucket"))
      .repartition($"band", $"bucket")
    time("mh: banded")(banded2.count())
    val cand2 = banded2.as("a").join(banded2.as("b"),
      $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
    time("mh: candidates")(cand2.count())
    val withSets2 = cand2
      .join(sets2.select($"id".as("id_a"), $"sh".as("sh_a")), "id_a")
      .join(sets2.select($"id".as("id_b"), $"sh".as("sh_b")), "id_b")
    time("mh: verified")(withSets2
      .withColumn("n_inter", size(array_intersect($"sh_a", $"sh_b")).cast("long")).count())
    // ngram breakdown
    val ex2 = sets2.select($"id", explode($"sh").as("g")).repartition($"g")
    time("ng: exploded")(ex2.count())
    time("ng: inter pairs")(ex2.as("a").join(ex2.as("b"),
      $"a.g" === $"b.g" && $"a.id" < $"b.id")
      .groupBy($"a.id", $"b.id").count().count())
    spark.stop()
  }
}
