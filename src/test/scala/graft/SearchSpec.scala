package graft

import org.apache.spark.sql.functions._

import graft.functions.Search

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("booleanAnd: hand-computed scores on a tiny corpus") {
    // N=4 docs; df(a)=3, df(b)=2 -> weights: a->1, b->2
    val df = Seq(
      (1L, "a b a"),   // tf(a)=2, tf(b)=1 -> score 2*1 + 1*2 = 4
      (2L, "a b b b"), // tf(a)=1, tf(b)=3 -> score 1*1 + 3*2 = 7
      (3L, "a x"),     // missing b -> excluded
      (4L, "x y")      // missing both -> excluded
    ).toDF("doc_id", "text")
    val got = Search.booleanAnd(df, $"doc_id", $"text", Seq("a", "b"), k = 10)
      .select("doc_id", "rank", "score", "n_terms")
      .as[(Long, Int, Long, Long)].collect().sortBy(_._2)
    got shouldBe Array((2L, 1, 7L, 2L), (1L, 2, 4L, 2L))
  }

  test("phrase: exact alignment, overlaps counted, repeated terms handled") {
    val docs = Seq(
      (1L, "a b c d a b c"),      // "a b c" twice
      (2L, "a b x c"),            // broken phrase: no match
      (3L, "c b a"),              // reversed: no match
      (4L, "a a a"),              // overlapping "a a": positions 0 and 1
      (5L, "x y a b c"),          // one match at pos 2
      (6L, "")).toDF("doc_id", "text")
    val abc = Search.phrase(docs, $"doc_id", $"text", Seq("a", "b", "c"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    abc shouldBe Map(1L -> ((2L, 0L)), 5L -> ((1L, 2L)))
    val aa = Search.phrase(docs, $"doc_id", $"text", Seq("a", "a"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    aa shouldBe Map(4L -> ((2L, 0L)))
    // single-term phrase degenerates to term occurrence counting
    val a1 = Search.phrase(docs, $"doc_id", $"text", Seq("a"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    a1 shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 1L)
    // driver cross-check on the real corpus: sliding-window count
    val corpus = Tables(spark, sf0001, "documents")
    val got = Search.phrase(corpus, $"doc_id", $"text",
      Seq("small", "query", "line"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expect = corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect().flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val hits = toks.indices.dropRight(2).filter(i =>
          toks(i) == "small" && toks(i + 1) == "query" &&
            toks(i + 2) == "line")
        if (hits.isEmpty) None
        else Some(id -> ((hits.length.toLong, hits.head.toLong)))
      }.toMap
    got shouldBe expect
    got should not be empty
  }

  test("rrfFusion: both-list docs beat single-list docs; golden scores") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = Search.rrfFusion(lex, dense, kRrf = 60, topN = 10)
      .as[(Long, Option[Int], Option[Int], Long, Int)].collect()
      .sortBy(_._5)
    // golden: 1e6 div (60+r) per side
    def s(r: Int) = 1000000L / (60 + r)
    val byDoc = out.map(r => r._1 -> r._4).toMap
    byDoc(20L) shouldBe s(2) + s(1) // in both lists
    byDoc(10L) shouldBe s(1)
    byDoc(30L) shouldBe s(3)
    byDoc(40L) shouldBe s(2)
    // doc 20 (both lists) outranks every single-list doc, even the
    // lexical #1 — the hybrid consensus effect
    out.head._1 shouldBe 20L
    // per-system ranks surface, with nulls for the missing side
    val d40 = out.find(_._1 == 40L).get
    d40._2 shouldBe None
    d40._3 shouldBe Some(2)
    // topN caps the fused list
    Search.rrfFusion(lex, dense, topN = 2).count() shouldBe 2L
  }

  test("booleanAnd on documents: AND semantics, rank order, cap") {
    val docs = Tables(spark, sf0001, "documents")
    val terms = Seq("dup", "join", "window")
    val rows = Search.booleanAnd(docs, $"doc_id", $"text", terms, k = 5)
      .collect()
    rows.length should be <= 5
    rows.map(_.getAs[Int]("rank")).sorted.toSeq shouldBe (1 to rows.length)
    // every hit really contains ALL terms
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val texts = docs.filter($"doc_id".isInCollection(ids))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    ids.foreach { id =>
      val toks = texts(id).split("\\s+").toSet
      terms.foreach(t => toks should contain(t))
    }
    // scores non-increasing in rank
    val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score"))
    scores.zip(scores.tail).foreach { case (a, b) => a should be >= b }
    // duplicate query terms collapse (same result as distinct)
    val dup = Search.booleanAnd(docs, $"doc_id", $"text",
      terms ++ Seq("dup"), k = 5).collect()
    dup.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq shouldBe
      rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSeq
  }
}
