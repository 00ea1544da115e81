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
}
