package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bucket and rank match the md5 definition by hand") {
    val terms = Seq("alpha", "beta", "42", "x y z")
    terms.foreach { t =>
      val hx = md5Hex(t)
      val bucket = java.lang.Long.parseLong(hx.substring(0, 2), 16)
      val v = java.lang.Long.parseLong(hx.substring(2, 10), 16)
      val rank = if (v == 0) 33L else 33L - (64 - java.lang.Long.numberOfLeadingZeros(v))
      val row = terms.toDF("t").filter(col("t") === t)
        .select(Hll.bucketOf(col("t")), Hll.rankOf(col("t")))
        .head()
      row.getLong(0) shouldBe bucket
      row.getLong(1) shouldBe rank
    }
  }

  test("registers merge by MAX: union equals merged halves") {
    val a = (0 until 400).map(i => ("g", s"u$i"))
    val b = (300 until 700).map(i => ("g", s"u$i"))
    val all = (a ++ b).toDF("grp", "t")
    val rAll = Hll.registers(all, col("grp"), col("t"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val rA = Hll.registers(a.toDF("grp", "t"), col("grp"), col("t"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val rB = Hll.registers(b.toDF("grp", "t"), col("grp"), col("t"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    val merged = (rA.keySet ++ rB.keySet).map(k =>
      k -> math.max(rA.getOrElse(k, 0L), rB.getOrElse(k, 0L))).toMap
    rAll shouldBe merged
  }

  test("estimate accuracy: mid-range cardinality within 15%") {
    val df = (0 until 5000).map(i => ("g", s"user-$i")).toDF("grp", "t")
    val est = Hll.estimateWithExact(df, col("grp"), col("t"))
      .head()
    val n = est.getAs[Long]("n_exact")
    val e = est.getAs[Long]("est_distinct")
    n shouldBe 5000L
    math.abs(e - n).toDouble / n should be < 0.15
  }

  test("linear-counting branch: small cardinality corrected via the table") {
    val df = (0 until 100).map(i => ("g", s"k$i")).toDF("grp", "t")
    val row = Hll.estimateWithExact(df, col("grp"), col("t")).head()
    val vZero = row.getAs[Long]("v_zero")
    vZero should be > 0L
    val raw = row.getAs[Long]("est_hll")
    val corrected = row.getAs[Long]("est_distinct")
    // corrected must equal the pinned-table formula exactly
    val expect = Hll.M.toLong * Hll.LnTableE6(vZero.toInt) / 1000000L
    corrected shouldBe expect
    // and be meaningfully closer to truth than the raw estimate
    math.abs(corrected - 100L) should be < math.abs(raw - 100L)
  }
}
