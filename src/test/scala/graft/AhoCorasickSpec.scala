package graft

import org.apache.spark.sql.functions._

import graft.functions.AhoCorasick

class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("classic AC corner cases: overlaps, nesting, shared prefixes") {
    val pats = Seq("he", "she", "his", "hers")
    val auto = new AhoCorasick.Automaton(pats)
    val c = auto.countMatches("ushers")
    // "ushers": she@1, he@2, hers@2
    c.toSeq shouldBe Seq(1L, 1L, 0L, 1L)
  }

  test("overlapping self-matches: 'aa' in 'aaaa' = 3") {
    val auto = new AhoCorasick.Automaton(Seq("aa", "aaa"))
    auto.countMatches("aaaa").toSeq shouldBe Seq(3L, 2L)
  }

  test("nested pattern inside a longer one via suffix links") {
    val auto = new AhoCorasick.Automaton(Seq("window", "in", "do"))
    auto.countMatches("window window").toSeq shouldBe Seq(2L, 2L, 2L)
  }

  test("matches brute force on fuzzed synthetic strings") {
    val pats = Seq("ab", "aba", "ba", "bb", "abab")
    val auto = new AhoCorasick.Automaton(pats)
    (0 until 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val t = (0 until 40).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
        .mkString
      auto.countMatches(t).toSeq shouldBe pats.map(brute(t, _))
    }
  }

  test("DenseAutomaton == Automaton on the classic cases") {
    for (pats <- Seq(
        Seq("he", "she", "his", "hers"),
        Seq("aa", "aaa"),
        Seq("window", "in", "do"))) {
      val sparse = new AhoCorasick.Automaton(pats)
      val dense = new AhoCorasick.DenseAutomaton(pats)
      for (t <- Seq("ushers", "aaaa", "window window", "", "zzz"))
        dense.countMatches(t).toSeq shouldBe sparse.countMatches(t).toSeq
    }
  }

  test("DenseAutomaton differential fuzz: random pattern sets, random " +
      "texts, chars outside the pattern alphabet") {
    (0 until 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val alpha = "abc"
      val pats = (0 until 3 + rnd.nextInt(8)).map(_ =>
        (0 until 1 + rnd.nextInt(5))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
        .distinct.filter(_.nonEmpty)
      if (pats.nonEmpty) {
        val sparse = new AhoCorasick.Automaton(pats)
        val dense = new AhoCorasick.DenseAutomaton(pats)
        // text over a WIDER alphabet than the patterns: the "other"
        // char class must reset correctly mid-match
        val t = (0 until 60).map(_ => "abcxy"(rnd.nextInt(5))).mkString
        val got = dense.countMatches(t)
        got.toSeq shouldBe sparse.countMatches(t).toSeq
        got.toSeq shouldBe pats.map(brute(t, _))
      }
    }
  }

  test("DenseAutomaton rejects duplicate patterns loudly") {
    intercept[IllegalArgumentException](
      new AhoCorasick.DenseAutomaton(Seq("ab", "ab")))
      .getMessage should include("duplicate")
  }

  test("scanCountsDense == scanCounts on a toy corpus") {
    val pats = Seq("lo", "hello", "ll")
    val docs = Seq((1L, "hello hello"), (2L, "lollol"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val sparse = AhoCorasick.scanCounts(docs, col("doc_id"), col("text"),
        pats).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toSet
    val dense = AhoCorasick.scanCountsDense(docs, col("doc_id"),
        col("text"), pats).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toSet
    dense shouldBe sparse
  }

  test("scanCounts: distributed scan matches per-row brute force") {
    val pats = Seq("lo", "hello", "ll")
    val docs = Seq((1L, "hello hello"), (2L, "lollol"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val got = AhoCorasick.scanCounts(docs, col("doc_id"), col("text"), pats)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      .toMap
    val expect = (for {
      (id, t) <- Seq((1L, "hello hello"), (2L, "lollol"), (3L, "xyz"))
      p <- pats
      n = brute(t, p) if n > 0
    } yield ((id, p), n)).toMap
    got shouldBe expect
  }
}
