package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("2-cycle is a fixed point of the integer rounds") {
    // A->B, B->A, outdeg 1 each: pr' = 0.15e12 + (0.85 * 1e12) = 1e12
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.run(edges, iters = 3)
      .select("node", "outdeg", "rank_fp").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    got shouldBe Array((1L, 1L, PageRank.InitMass),
      (2L, 1L, PageRank.InitMass))
  }

  test("chain with dangling sink: hand-computed two rounds") {
    // A->B only. Round 1: pr(A) = base (no in-edges);
    // pr(B) = base + (1e12 * 17) div 20 = base + 0.85e12.
    // Round 2: pr(B) = base + (pr1(A) * 17) div 20
    //                = 150e9 + (150e9 * 17) div 20 = 150e9 + 127.5e9.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r2 = PageRank.run(edges, iters = 2)
      .select("node", "outdeg", "rank_fp").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val base = PageRank.TeleportBase
    r2 shouldBe Array(
      (1L, 1L, base),
      (2L, 0L, base + (base * 17L) / 20L))
  }

  test("parallel edges carry multiplicity; self-loops allowed") {
    // A->B twice, B->B once: outdeg(A)=2, outdeg(B)=1
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L)).toDF("src", "dst")
    val r1 = PageRank.run(edges, iters = 1)
      .select("node", "outdeg", "rank_fp").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val m = PageRank.InitMass; val base = PageRank.TeleportBase
    // A gets nothing; B gets 2*(m div 2) from A + (m div 1) from itself
    r1 shouldBe Array(
      (1L, 2L, base),
      (2L, 1L, base + ((2L * (m / 2L) + m) * 17L) / 20L))
  }

  test("transitionEdges: per-user consecutive pairs, ts order, ties by id") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (10L, ts(1), 1L, "a"), (11L, ts(2), 1L, "b"), (12L, ts(3), 1L, "c"),
      (20L, ts(5), 2L, "x"), (21L, ts(5), 2L, "y") // same ts: id breaks tie
    ).toDF("event_id", "ts", "user_id", "item")
    val got = PageRank.transitionEdges(ev, $"user_id", $"ts", $"event_id",
      $"item").as[(String, String)].collect().sorted
    got shouldBe Array(("a", "b"), ("b", "c"), ("x", "y"))
  }

  test("events graph: deterministic, ranks bounded below by teleport base") {
    val ev = Tables(spark, sf0001, "events")
    val a = PageRank.overEventTransitions(ev, iters = 5)
      .select("node", "rank_fp").as[(Long, Long)].collect().sortBy(_._1)
    val b = PageRank.overEventTransitions(ev, iters = 5)
      .select("node", "rank_fp").as[(Long, Long)].collect().sortBy(_._1)
    a shouldBe b
    a.length should be > 10
    a.foreach { case (_, pr) => pr should be >= PageRank.TeleportBase }
    // total mass never exceeds the initial pool (floors only lose mass)
    a.map(_._2).sum should be <= PageRank.InitMass * a.length
  }

  test("uniformWalks: hand-replayed md5 picks; sinks terminate; determinism") {
    import graft.operators.Walks
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def u32(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(8), 16)
    // graph: 1 -> {2, 3}; 2 -> {3}; 3 is a SINK
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Walks.uniformWalks(edges, steps = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    // sink walk: never moves, zero hops
    got(3L) shouldBe (("3", 3L, 0L))
    // 2 -> 3 (only edge), then stuck at the sink: exactly one hop
    got(2L) shouldBe (("2->3", 3L, 1L))
    // walk 1 step 1: rank = u32(md5("1:1")) % 2 picks 2 or 3 (dst asc)
    val first = if (u32("1:1") % 2 == 0) 2L else 3L
    val expPath = if (first == 2L) "1->2->3" else "1->3"
    val expHops = if (first == 2L) 2L else 1L
    got(1L) shouldBe ((expPath, 3L, expHops))
    // determinism: a second run is identical
    val again = Walks.uniformWalks(edges, steps = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    again shouldBe got
  }
}
