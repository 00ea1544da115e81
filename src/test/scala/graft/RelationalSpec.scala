package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Invariant checks for the relational coverage queries (exact-value
  * correctness is carried by the DuckDB oracles in SparkEntry). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("revenue rollup covers every region with orders") {
    val r = Relational.revenueByRegion(spark, sf0001)
    r.count() shouldBe 5
    r.agg(min($"revenue")).as[Double].head() should be > 0.0
  }

  test("semi + anti partition the customer set") {
    val df = Relational.customerOrderCoverage(spark, sf0001)
    val total = df.agg(sum($"n_with_orders" + $"n_without_orders"))
      .as[Long].head()
    total shouldBe Tables(spark, sf0001, "customer").count()
  }

  test("set ops: kinds are disjoint and within nation universe") {
    val df = Relational.nationSetOps(spark, sf0001)
    val byKind = df.groupBy("kind").count().as[(String, Long)].collect().toMap
    (byKind.getOrElse("both", 0L) + byKind.getOrElse("customer_only", 0L)) should be <= 25L
    df.select("nation_name").distinct().count() shouldBe df.count() // no overlap
  }

  test("running revenue is non-decreasing per supplier") {
    val df = Relational.supplierRunningRevenue(spark, sf0001)
    val bad = df.as("a").join(df.as("b"),
      $"a.suppkey" === $"b.suppkey" && ($"a.ship_seq" + 1) === $"b.ship_seq" &&
        $"a.running_revenue_e4" > $"b.running_revenue_e4")
    bad.count() shouldBe 0L
  }

  test("sessions: per-user session_seq is contiguous from 1") {
    val df = Relational.eventsSessions(spark, sf0001)
    val agg = df.groupBy("user_id")
      .agg(min($"session_seq").as("mn"), max($"session_seq").as("mx"),
        count(lit(1)).as("n"))
    agg.filter($"mn" =!= 1L || $"mx" =!= $"n").count() shouldBe 0L
  }

  test("tumbling windows cover all events exactly once") {
    val e = Tables(spark, sf0001, "events")
    Relational.eventsTumbling(spark, sf0001)
      .agg(sum($"n_events")).as[Long].head() shouldBe e.count()
  }

  test("saltedJoin == plain join, and the salt actually spreads rows") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity")
    val sup = Tables(spark, sf0001, "supplier")
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    val fast = Relational.saltedJoin(li, sup, "l_suppkey",
      Seq($"l_orderkey", $"l_linenumber"))
    val plain = li.join(sup, "l_suppkey")
    fast.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(fast).count() shouldBe 0L
    // every salt bucket is hit for the biggest supplier
    val spread = li
      .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(8L)))
      .groupBy($"l_suppkey").agg(countDistinct($"salt").as("nsalts"),
        count(lit(1)).as("n"))
      .orderBy($"n".desc).select($"nsalts").as[Long].head()
    spread shouldBe 8L
  }

  test("bucketed join: no pre-join exchange, same result as plain join") {
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val ord = Tables(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_orderstatus")
    graft.sources.Bucketed.write(li, "spec_li_b",
      "/tmp/graft_spec_bucketed/li", "l_orderkey", 4)
    graft.sources.Bucketed.write(ord, "spec_ord_b",
      "/tmp/graft_spec_bucketed/ord", "o_orderkey", 4)
    val joined = graft.sources.Bucketed.read(spark, "spec_li_b").hint("merge")
      .join(graft.sources.Bucketed.read(spark, "spec_ord_b").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString()
    plan should include("SortMergeJoin")
    plan should not include "Exchange hashpartitioning"
    val expected = li.join(ord, $"l_orderkey" === $"o_orderkey")
    joined.exceptAll(expected).count() shouldBe 0L
    expected.exceptAll(joined).count() shouldBe 0L
  }

  test("asofJoin: backward match, equal-ts tie, strict mode, no-match null") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "t", "v")
    val inc = Relational.asofJoin(left, right, Seq("k"), "t")
      .select($"name", $"asof.t", $"asof.v")
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    // p1 at t=10 sees the equal-ts right row; p2 sees the later t=15;
    // p3 (k=2) has no right rows at all
    inc("p1") shouldBe (Some(10L), Some(100.0))
    inc("p2") shouldBe (Some(15L), Some(150.0))
    inc("p3") shouldBe (None, None)
    val st = Relational.asofJoin(left, right, Seq("k"), "t", strict = true)
      .select($"name", $"asof.t")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    // strict: the equal-ts row is no longer visible for p1
    st("p1") shouldBe None
    st("p2") shouldBe Some(15L)
  }

  test("asofJoin matches the naive per-row max formulation on events") {
    val ev = Tables(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"event_type",
        expr("ts DIV 1000").as("t_us"))
    val l = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"t_us")
    val r = ev.filter($"event_type" === "click")
      .select($"user_id", $"t_us", $"event_id".as("click_id"))
    val fast = Relational.asofJoin(l, r, Seq("user_id"), "t_us")
      .select($"event_id", $"asof.click_id".as("click_id"))
    // naive oracle: range join + keep latest (latest = max t then max id)
    val naive = l.as("a").join(r.as("b"),
        $"a.user_id" === $"b.user_id" && $"b.t_us" <= $"a.t_us", "left")
      .groupBy($"a.event_id".as("event_id"))
      .agg(max(struct($"b.t_us", $"b.click_id")).as("m"))
      .select($"event_id", $"m.click_id".as("click_id"))
    fast.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(fast).count() shouldBe 0L
  }

  test("rangeJoinBinned: inclusive bounds, no duplicate pairs, golden") {
    val left = Seq((1L, 1000L), (2L, 5000L)).toDF("lid", "lt")
    val right = Seq((10L, 700L), (11L, 1000L), (12L, 1300L), (13L, 1301L),
      (14L, 4699L), (15L, 9999L)).toDF("rid", "rt")
    // window [lt-300, lt+300], bin 600 (= span, so 2 bins per left row)
    val got = Relational.rangeJoinBinned(left, right, "lt", "rt",
        lowerNs = -300L, upperNs = 300L, binNs = 600L)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    // lid=1: 700 and 1300 are the INCLUSIVE edges, 1301 is out;
    // lid=2: 4699 misses by 1 below, 9999 far out -> no pairs
    got shouldBe Set((1L, 10L), (1L, 11L), (1L, 12L))
  }

  test("rangeJoinBinned == naive inequality join on events, no BNLJ") {
    val ev = Tables(spark, sf0001, "events")
    val l = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"))
    val r = ev.filter($"event_type" === "error")
      .select($"event_id".as("e_id"), $"ts".as("e_ts"))
    val span = 300000000000L // ±5 min in nanos
    val fast = Relational.rangeJoinBinned(l, r, "p_ts", "e_ts",
      -span, span, binNs = 2 * span).select($"p_id", $"e_id")
    val naive = l.join(r,
      $"e_ts" >= $"p_ts" - span && $"e_ts" <= $"p_ts" + span)
      .select($"p_id", $"e_id")
    fast.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(fast).count() shouldBe 0L
    // the whole point: the binned plan must be an equi-join
    val plan = fast.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("sliding windows: every event in exactly 2; each = 2 tumbling halves") {
    val ev = Tables(spark, sf0001, "events")
    val slid = Relational.eventsSliding(spark, sf0001)
    slid.agg(sum($"n_events")).collect().head.getLong(0) shouldBe
      2L * ev.count()
    // a 10-min sliding window [ws, ws+600) is its two 5-min tumbling
    // halves [ws, ws+300) + [ws+300, ws+600)
    val tumb = Relational.eventsTumbling(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    slid.collect().foreach { r =>
      val (ws, et) = (r.getLong(0), r.getString(1))
      val a = tumb.getOrElse((ws, et), (0L, 0L))
      val b = tumb.getOrElse((ws + 300, et), (0L, 0L))
      r.getLong(2) shouldBe a._1 + b._1
      r.getLong(3) shouldBe a._2 + b._2
    }
  }

  test("cohort retention: offset-0 row covers each cohort; mass conserved") {
    val got = Relational.eventsRetentionCohorts(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.keys.foreach { case (_, off) => off should be >= 0L }
    // every user is active on their cohort day, so offset 0 exists per
    // cohort and its user count equals the cohort size
    val ev = Tables(spark, sf0001, "events")
      .select($"user_id", expr("ts DIV 86400000000000").as("day"))
    val cohortSizes = ev.groupBy($"user_id")
      .agg(min($"day").as("c")).groupBy($"c").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cohortSizes.foreach { case (c, n) => got((c, 0L)) shouldBe n }
    // total matrix mass = distinct (user, day) activity rows
    got.values.sum shouldBe ev.distinct().count()
  }
}
