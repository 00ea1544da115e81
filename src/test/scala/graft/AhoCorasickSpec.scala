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
