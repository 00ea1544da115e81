package graft

import org.apache.spark.sql.functions._

import graft.functions.HashedLinear

/** Hashed-linear classifier: feature construction, md5 weight-formula
  * replay, score/label invariants, and the empty-document path. */
class HashedLinearSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def weightOf(f: String): Long =
    u32("w:" + (u32("f:" + f) % 4096L)) % 2001L - 1000L

  test("feature count, bounds, sign gate, empty doc") {
    val df = Seq(
      (1L, "the cat sat"),
      (2L, "   "),
      (3L, "one"))
      .toDF("doc_id", "text")
    val got = HashedLinear.score(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    got(1L).getInt(1) shouldBe 5 // 3 unigrams + 2 bigrams
    got(3L).getInt(1) shouldBe 1 // single token, no bigram
    got(2L).getInt(1) shouldBe 0 // whitespace-only -> no features
    got(2L).getLong(2) shouldBe 0L
    got(2L).getDouble(3) shouldBe 0.0
    got(2L).getString(4) shouldBe "keep" // zero sum gates as keep

    got.values.foreach { r =>
      val (nf, ws, score, label) =
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getString(4))
      label shouldBe (if (ws >= 0) "keep" else "drop")
      if (nf > 0) {
        score shouldBe BigDecimal(ws / (1000.0 * nf))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        score should (be >= -1.0 and be <= 1.0)
      }
    }
  }

  test("weight sum replays the md5 slot/weight formula") {
    val got = HashedLinear.score(
      Seq((7L, "alpha beta")).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect().head
    val want = Seq("alpha", "beta", "alpha beta").map(weightOf).sum
    got.getLong(2) shouldBe want
  }

  test("on real documents: n_feats = 2*tokens - 1, plan has no shuffle") {
    val docs = Tables(spark, sf0001, "documents")
    val scored = HashedLinear.score(docs, col("doc_id"), col("text"))
    val toks = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.functions.TextAnalysis.tokens(lower(col("text"))))
        .as("n_tok"))
    val joined = scored.join(toks, "doc_id")
    joined.filter(col("n_tok") > 0 &&
      col("n_feats") =!= col("n_tok") * 2 - 1).count() shouldBe 0L
    joined.filter(col("n_tok") === 0 && col("n_feats") =!= 0)
      .count() shouldBe 0L
    // inference stays one scan. The single allowed exchange is the
    // r10 parallelism FLOOR (round-robin, fires only because this
    // single-row-group fixture scans into fewer partitions than the
    // session has cores — Tables.parallelismFloor doc); the scorer
    // itself must add no aggregation/join exchange.
    val plan = scored.queryExecution.executedPlan.toString
    "Exchange [a-zA-Z]*".r.findAllIn(plan).toSeq shouldBe
      Seq("Exchange RoundRobinPartitioning")
    // over an input that is already at session parallelism the floor
    // is a no-op and the plan has NO exchange beyond the explicit one
    val wide = HashedLinear.score(
      docs.repartition(spark.sparkContext.defaultParallelism * 2),
      col("doc_id"), col("text"))
    "Exchange [a-zA-Z]*".r.findAllIn(
      wide.queryExecution.executedPlan.toString).toSeq shouldBe
      Seq("Exchange RoundRobinPartitioning") // only the test's own repartition
  }
}
