package graft

import org.apache.spark.sql.functions._
import graft.functions.{Gopher, TextAnalysis}

/** Gopher repetition/quality filters: hand-computed golden values on
  * tiny docs, plus differential checks of the per-row sorted-run mode
  * against an explode+groupBy reference on real testdata. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def sig(text: String): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(Gopher.signals(col("text")): _*).head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("golden: degenerate repetition 'a a a a'") {
    val s = sig("a a a a")
    s("n_words") shouldBe 4L
    s("mean_word_len") shouldBe 1.0
    // 2-grams: "a a" x3, each 3 chars -> 9 covered vs 7 total (overlap
    // convention: occurrences sum, fraction may exceed 1)
    s("top2_charfrac") shouldBe (9.0 / 7.0)
    s("dup5_frac") shouldBe 0.0 // fewer than 5 words -> no 5-grams
    s("gopher_pass") shouldBe false
  }

  test("golden: mixed doc") {
    val s = sig("the cat sat on the mat the cat sat again")
    s("n_words") shouldBe 10L
    // top 2-gram: "the cat" x2 (7 chars) = 14; "cat sat" x2 = 14 ties.
    // max over products is deterministic regardless of which gram wins.
    s("top2_charfrac") shouldBe (14.0 / 40.0)
    // 5-grams: 6 total, all distinct
    s("dup5_frac") shouldBe 0.0
    s("n_req_stops") shouldBe 1L // only "the" from the required set
    s("alpha_frac") shouldBe 1.0
  }

  test("golden: duplicate 5-grams") {
    // "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5" -> 6 5-grams, the last one
    // ("w1 w2 w3 w4 w5") repeats the first -> 1 dup / 6
    val s = sig("w1 w2 w3 w4 w5 w1 w2 w3 w4 w5")
    s("dup5_frac") shouldBe (1.0 / 6.0)
    s("alpha_frac") shouldBe 1.0 // every token contains a letter
  }

  test("golden: empty and non-alpha docs") {
    val e = sig("")
    e("n_words") shouldBe 0L
    e("top2_charfrac") shouldBe 0.0
    e("gopher_pass") shouldBe false
    val nums = sig("123 456 789")
    nums("alpha_frac") shouldBe 0.0
  }

  test("pass verdict: a doc engineered to pass every rule") {
    // >=50 words, mean len in [3,10], >=2 required stops, low repetition
    val words = (1 to 60).map(i => s"word$i")
    val text = (words ++ Seq("the", "of")).mkString(" ")
    val s = sig(text)
    s("n_words") shouldBe 62L
    s("n_req_stops") shouldBe 2L
    s("gopher_pass") shouldBe true
  }

  test("differential: run-scan top-2-gram == explode+groupBy on sf0.001") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
    val fast = docs.select($"doc_id",
      Gopher.topNgramCharCount($"toks", 2).as("top2"))
    val slow = docs
      .select($"doc_id", explode(Gopher.ngrams($"toks", 2)).as("gram"))
      .groupBy($"doc_id", $"gram").count()
      .groupBy($"doc_id")
      .agg(max($"count" *
        org.apache.spark.sql.functions.length($"gram").cast("long")).as("top2"))
    // docs with <2 tokens produce no exploded rows; fast emits 0 for them
    val joined = fast.join(slow, Seq("doc_id"), "left")
      .select($"doc_id", fast("top2").as("f"),
        coalesce(slow("top2"), lit(0L)).as("s"))
    joined.filter($"f" =!= $"s").count() shouldBe 0L
    fast.count() shouldBe 500L
  }

  test("stats (barrier) == inline signals on sf0.001") {
    val docs = Tables(spark, sf0001, "documents")
    val a = Gopher.stats(docs, $"doc_id", $"text")
    val b = docs.select(col("doc_id") +: Gopher.signals($"text"): _*)
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
    // the tokenize happens BELOW the exchange (once per row), the gram
    // battery above it on attribute references
    val plan = a.queryExecution.executedPlan.toString
    plan should include("Exchange")
  }

  test("plan: gopher signals stay a single projection over the scan") {
    val q = Tables(spark, sf0001, "documents")
      .select(col("doc_id") +: Gopher.signals(col("text")): _*)
    val plan = q.queryExecution.executedPlan.toString
    plan should not include "Exchange" // zero shuffles: pure map work
  }
}
