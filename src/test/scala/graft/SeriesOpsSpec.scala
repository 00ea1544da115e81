package graft

import org.apache.spark.sql.functions._

import graft.operators.{Paths, Resample, Retention, RetrievalEval}

/** Resample/gap-fill, path census, and retrieval-eval specs. */
class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- Resample

  test("gapFill: gaps materialized, LOCF carries the last observed sum") {
    // key a: bins 0 and 3 observed -> 1, 2 are gaps carrying bin 0's sum
    val df = Seq(
      ("a", 5L, 1.5), ("a", 8L, 2.0),   // bin 0 (binNs = 10)
      ("a", 31L, 4.25),                 // bin 3
      ("b", 12L, 7.0)                   // single bin
    ).toDF("k", "t", "value")
    val got = Resample.gapFill(df, $"k", $"t", $"value", binNs = 10L)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    got shouldBe Array(
      ("a", 0L, 0L, 2L, 35000L, 35000L, 0L),
      ("a", 1L, 10L, 0L, 0L, 35000L, 1L),
      ("a", 2L, 20L, 0L, 0L, 35000L, 1L),
      ("a", 3L, 30L, 1L, 42500L, 42500L, 0L),
      ("b", 1L, 10L, 1L, 70000L, 70000L, 0L))
  }

  test("gapFill: dense series has no gap rows") {
    val df = Seq(("x", 0L, 1.0), ("x", 10L, 1.0), ("x", 20L, 1.0))
      .toDF("k", "t", "value")
    val got = Resample.gapFill(df, $"k", $"t", $"value", binNs = 10L)
    got.count() shouldBe 3L
    got.agg(sum("is_gap")).as[Long].head() shouldBe 0L
  }

  test("gapFill: e4 sums are exact for 4dp values") {
    val df = Seq(("x", 0L, 0.0001), ("x", 1L, 0.0002))
      .toDF("k", "t", "value")
    val got = Resample.gapFill(df, $"k", $"t", $"value", binNs = 10L)
      .select("value_e4").as[Long].head()
    got shouldBe 3L
  }

  test("seasonalGapFill: hour expectations split the profile over slots") {
    val hr = 3600L * 1000000000L
    // key a: events at hour-of-day 0 on two days, hour 1 once -> the
    // day-2 hour-0 slot is a gap but EXPECTED busy; hour-2..23 slots
    // inside the span expect 0
    val df = Seq(
      ("a", 0L * hr), ("a", 0L * hr + 1), ("a", 24L * hr), // h0: 3 events
      ("a", 1L * hr),                                       // h1: 1
      ("a", 25L * hr)                                       // spans to h1 day2
    ).toDF("k", "t")
    val got = Resample.seasonalGapFill(df, $"k", $"t")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._2)
    // span bins 0..25 -> 26 rows; hours 0 and 1 occur twice (d_h=2)
    got.length shouldBe 26
    val h0 = got.filter(_._3 == 0L)
    h0.map(_._4).sum shouldBe 3L // n_events at hour 0
    // expected_n_e3 for hour 0 = 3*1000 DIV 2 slots = 1500 on BOTH
    h0.foreach(_._6 shouldBe 1500L)
    // gap bins inside the span at never-seen hours expect 0, flag gap
    val h5 = got.find(_._3 == 5L).get
    h5._4 shouldBe 0L; h5._5 shouldBe 1L; h5._6 shouldBe 0L
    // deviations reconcile: sum(n*1000) - sum(expected) == sum(dev)
    got.map(_._7).sum shouldBe
      got.map(_._4 * 1000L).sum - got.map(_._6).sum
  }

  // ------------------------------------------------------------- Paths

  test("trigramCensus: per-user windows, ties by the tie column") {
    val ev = Seq(
      // user 1 walks a b c d -> (a,b,c), (b,c,d)
      (1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"),
      (1L, 3L, 12L, "c"), (1L, 4L, 13L, "d"),
      // user 2 walks a b c (same ts -> event_id order)
      (2L, 5L, 20L, "a"), (2L, 5L, 21L, "b"), (2L, 5L, 22L, "c"))
      .toDF("user_id", "ts", "event_id", "t")
    val got = Paths.trigramCensus(ev, $"user_id", $"ts", $"event_id", $"t")
      .as[(String, String, String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    got shouldBe Array(
      ("a", "b", "c", 2L, 2L),
      ("b", "c", "d", 1L, 1L))
  }

  test("trigramCensus: n_users counts an entity once per path") {
    // one user walks a b a b a -> (a,b,a) twice? windows: (a,b,a),
    // (b,a,b), (a,b,a) -> path (a,b,a) n_paths 2, n_users 1
    val ev = (1L to 5L).map(i =>
      (9L, i, i, if (i % 2 == 1) "a" else "b"))
      .toDF("user_id", "ts", "event_id", "t")
    val got = Paths.trigramCensus(ev, $"user_id", $"ts", $"event_id", $"t")
      .as[(String, String, String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    got shouldBe Array(
      ("a", "b", "a", 2L, 1L),
      ("b", "a", "b", 1L, 1L))
  }

  // ----------------------------------------------------- RetrievalEval

  private def lists(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("perQuery: hit at rank r yields rr_ppm = 1e6 div r") {
    val truth = lists(Seq((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3)))
    val ann = lists(Seq((1L, 101L, 1), (1L, 100L, 2), (1L, 999L, 3)))
    val got = RetrievalEval.perQuery(ann, truth)
      .as[(Long, Long, Long, Long, Long)].collect()
    // true top1=100 found at ann rank 2; overlap {100, 101} = 2
    got shouldBe Array((1L, 100L, 2L, 500000L, 2L))
  }

  test("perQuery: miss reports found_rank -1, rr 0, overlap 0") {
    val truth = lists(Seq((7L, 50L, 1), (7L, 51L, 2)))
    val ann = lists(Seq((7L, 60L, 1), (7L, 61L, 2)))
    val got = RetrievalEval.perQuery(ann, truth)
      .as[(Long, Long, Long, Long, Long)].collect()
    got shouldBe Array((7L, 50L, -1L, 0L, 0L))
  }

  test("perQuery: one row per query, perfect index scores 1e6") {
    val truth = lists(Seq((1L, 10L, 1), (1L, 11L, 2),
      (2L, 20L, 1), (2L, 21L, 2)))
    val got = RetrievalEval.perQuery(truth, truth)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe Array(
      (1L, 10L, 1L, 1000000L, 2L),
      (2L, 20L, 1L, 1000000L, 2L))
  }

  test("watermarkLateness: equals a sequential replay; blocks invisible") {
    def truth(rows: Seq[(Long, Long, String)], delay: Long)
        : Map[String, (Long, Long, Long, Long)] = {
      var prior = Long.MinValue
      val marked = rows.sortBy(_._1).map { case (_, t, k) =>
        val late = prior != Long.MinValue && t < prior - delay
        val lateness = if (late) prior - delay - t else 0L
        prior = math.max(prior, t)
        (k, late, lateness)
      }
      marked.groupBy(_._1).map { case (k, ms) =>
        val n = ms.size.toLong
        val nl = ms.count(_._2).toLong
        k -> (n, nl, ms.map(_._3).max, nl * 10000 / n)
      }
    }
    def run(rows: Seq[(Long, Long, String)], delay: Long, blk: Long) =
      Retention.watermarkLateness(rows.toDF("a", "t", "k"),
        $"a", $"t", $"k", delayNs = delay, blockNs = blk)
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // golden: arrival out of order around a delay-10 watermark
    val rows = Seq(
      (1L, 100L, "x"), // first: no prior, never late
      (2L, 50L, "x"),  // prior 100, 50 < 90 -> late by 40
      (3L, 95L, "y"),  // 95 >= 90 -> on time
      (4L, 200L, "y"),
      (5L, 150L, "x")) // prior 200, 150 < 190 -> late by 40
    val exp = truth(rows, 10L)
    run(rows, 10L, 7L) shouldBe exp
    exp("x") shouldBe ((3L, 2L, 40L, 6666L))
    // block width must be invisible: one giant block == tiny blocks
    run(rows, 10L, 1000000L) shouldBe exp
    // fuzz: random jittered arrivals across many block boundaries
    val rnd = new scala.util.Random(13)
    val fuzz = (0 until 400).map { i =>
      val t = rnd.nextInt(10000).toLong
      (t * 100 + i, t, if (rnd.nextBoolean()) "a" else "b")
    }
    val fexp = truth(fuzz, 500L)
    run(fuzz, 500L, 333L) shouldBe fexp
    run(fuzz, 500L, 100000000L) shouldBe fexp
  }
}
