package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Funnel, IncrementalAgg}

/** Incremental-maintenance operators: aggregate-state merge, SCD2
  * history, bloom-prefiltered join, ordered funnel. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("IncrementalAgg.merge == full recompute, including delta-only keys") {
    val docs = Tables(spark, sf0001, "documents")
    def state(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"lang").agg(
        count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"))
    val merged = IncrementalAgg.merge(
      state(docs.filter($"doc_id" < 200)),
      state(docs.filter($"doc_id" >= 200)),
      Seq("lang"), sums = Seq("n_docs", "sum_chars"),
      mins = Seq("min_chars"), maxs = Seq("max_chars"))
    val full = state(docs)
    merged.exceptAll(full).count() shouldBe 0L
    full.exceptAll(merged).count() shouldBe 0L
  }

  test("IncrementalAgg.merge goldens: one-sided keys take the present side") {
    val base = Seq(("a", 2L, 10L, 1L, 9L), ("b", 1L, 5L, 5L, 5L))
      .toDF("k", "n", "s", "mn", "mx")
    val delta = Seq(("b", 3L, 30L, 2L, 20L), ("c", 1L, 7L, 7L, 7L))
      .toDF("k", "n", "s", "mn", "mx")
    val got = IncrementalAgg.merge(base, delta, Seq("k"),
      sums = Seq("n", "s"), mins = Seq("mn"), maxs = Seq("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got("a") shouldBe ((2L, 10L, 1L, 9L))
    got("b") shouldBe ((4L, 35L, 2L, 20L))
    got("c") shouldBe ((1L, 7L, 7L, 7L))
  }

  test("scd2History: intervals chain by seq; only the last non-delete is current") {
    val ch = Seq(
      (1L, 1L, "I", "v1"), (1L, 3L, "U", "v2"), (1L, 7L, "U", "v3"),
      (2L, 2L, "I", "w1"), (2L, 5L, "D", null))
      .toDF("id", "seq", "op", "payload")
    val got = Cdc.scd2History(ch, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))).toMap
    got((1L, 1L)) shouldBe ((Some(3L), false))
    got((1L, 3L)) shouldBe ((Some(7L), false))
    got((1L, 7L)) shouldBe ((None, true))
    got((2L, 2L)) shouldBe ((Some(5L), false))
    got((2L, 5L)) shouldBe ((None, false)) // delete: latest but not current
  }

  test("bloom-prefiltered join == plain join (no false negatives)") {
    val orders = Tables(spark, sf0001, "orders")
      .filter($"o_orderstatus" === "P")
      .select($"o_orderkey", $"o_orderpriority")
    val li = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_extendedprice")
    val m = 1 << 14
    val words = graft.functions.BloomMd5.build(
      orders, $"o_orderkey".cast("string"), m, k = 3)
    val pre = graft.functions.BloomMd5.markPositive(
        li, $"l_orderkey".cast("string"), words, m, k = 3, "__maybe")
      .filter($"__maybe").drop("__maybe")
    val got = pre.join(orders, $"l_orderkey" === $"o_orderkey")
    val want = li.join(orders, $"l_orderkey" === $"o_orderkey")
    got.count() shouldBe want.count()
    got.exceptAll(want).count() shouldBe 0L
    // and the prefilter actually prunes (bloom-negative rows exist)
    pre.count() should be < li.count()
  }

  test("funnel goldens: order matters, boundary equality counts") {
    val ev = Seq(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "purchase", 15L),
      (3L, "purchase", 99L),
      (4L, "signup", 10L), (4L, "click", 10L), (4L, "purchase", 9L))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.ordered(ev, col("user_id"), col("event_type"),
      col("ts"), Seq("signup", "click", "purchase")).collect().head
    // u1 full; u2 blocked at click-before-signup; u3 no signup;
    // u4 click at exactly signup time counts, purchase precedes click
    got.getLong(0) shouldBe 3L // signups: u1, u2, u4
    got.getLong(1) shouldBe 2L // ordered clicks: u1, u4
    got.getLong(2) shouldBe 1L // ordered purchases: u1
    got.getLong(3) shouldBe 666666L // 2e6/3
    got.getLong(4) shouldBe 500000L // 1e6/2
  }
}
