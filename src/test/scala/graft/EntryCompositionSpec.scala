package graft

import org.apache.spark.sql.functions._

/** Invariant checks for driver-contract compositions that have no
  * dedicated operator object (built inline in SparkEntry from proven
  * primitives) — run on the sf0.001 testdata. */
class EntryCompositionSpec extends SparkSpec {

  test("group quantiles: ordered quartiles, counts sum to corpus size") {
    val got = SparkEntry.queries("group_quantiles_documents")(spark, sf0001)
      .collect()
    got.length should be > 1
    var total = 0L
    got.foreach { r =>
      total += r.getLong(1)
      val (p25, p50, p75) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      p25 should be <= p50
      p50 should be <= p75
    }
    total shouldBe graft.Tables(spark, sf0001, "documents").count()
  }

  test("preference pairs: chosen beats rejected, ids differ, one pair per source") {
    val got = SparkEntry.queries("preference_pairs_documents")(spark, sf0001)
      .collect()
    got.length should be > 1
    got.map(_.getString(0)).distinct.length shouldBe got.length
    got.foreach { r =>
      r.getLong(1) should not be r.getLong(2)       // chosen != rejected
      r.getLong(3) should be >= r.getLong(4)        // token margin >= 0
      r.getLong(5) shouldBe r.getLong(3) - r.getLong(4)
    }
  }
}
