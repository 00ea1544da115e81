package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hilbert, ZOrder}

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("bits=2 grid: full 16-cell enumeration matches the known curve") {
    // the order-2 Hilbert curve visits (x, y) in this exact sequence
    val expect = Seq(
      (0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L),
      (0L, 2L), (0L, 3L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L), (3L, 3L), (3L, 2L),
      (3L, 1L), (2L, 1L), (2L, 0L), (3L, 0L))
    val byD = (for (x <- 0L to 3L; y <- 0L to 3L)
      yield (Hilbert.xy2d(2, x, y), (x, y))).sortBy(_._1).map(_._2)
    byD shouldBe expect
  }

  test("adjacency: consecutive keys are always grid neighbors (bits=4)") {
    val cells = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (Hilbert.xy2d(4, x, y), x, y)).sortBy(_._1)
    cells.map(_._1) shouldBe (0L until 256L)
    cells.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1L
    }
  }

  test("column implementation matches the scalar transform at bits=16") {
    val coords = Seq((0L, 0L), (65535L, 65535L), (12345L, 54321L),
      (1L, 65534L), (40000L, 3L), (32768L, 32767L))
    val rows = coords.toDF("a", "b")
    val got = Hilbert.withHilbert(rows, "a", "b", bits = 16, out = "h")
      .select(col("a"), col("b"), col("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    coords.foreach { case (x, y) =>
      got((x, y)) shouldBe Hilbert.xy2d(16, x, y)
    }
  }

  test("prune soundness: every matching row lives in a kept group") {
    val df = spark.range(4000).select(
      (pmod(xxhash64(col("id")), lit(200L))).as("a"),
      (pmod(xxhash64(col("id"), lit(1)), lit(50L))).as("b"))
    val manifest = Hilbert.layout(df, "a", "b", bits = 8, nFiles = 8)
      .localCheckpoint()
    val kept = Hilbert.prune(manifest, 0L, 20L, 0L, 10L)
      .select(col("file_group")).as[Int].collect().toSet
    // recompute each matching row's group through the same cuts
    val h = Hilbert.withHilbert(df.filter(col("a") <= 20 && col("b") <= 10),
      "a", "b", bits = 8, out = "h")
    val cuts = manifest.orderBy(col("file_group"))
      .select(col("h_max")).as[Long].collect().dropRight(1)
    val groups = h.select(
      cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col("h") > lit(c), 1).otherwise(0)
      }.as("g")).as[Int].collect().toSet
    groups.subsetOf(kept) shouldBe true
  }

  test("incremental plan: every delta row lands in exactly one group") {
    val df = spark.range(3000).select(
      col("id"),
      (pmod(xxhash64(col("id")), lit(200L))).as("a"),
      (pmod(xxhash64(col("id"), lit(1)), lit(50L))).as("b"))
    val base = df.filter(col("id") % 5 < 4)
    val delta = df.filter(col("id") % 5 === 4)
    val manifest = Hilbert.layout(base, "a", "b", bits = 8, nFiles = 8)
    val plan = Hilbert.incrementalPlan(manifest, delta, "a", "b", bits = 8)
      .collect()
    plan.map(_.getAs[Int]("file_group")).sorted shouldBe (0 until 8)
    plan.map(_.getAs[Long]("n_delta")).sum shouldBe delta.count()
    plan.map(_.getAs[Long]("n_base")).sum shouldBe base.count()
  }

  test("locality: hilbert per-file rectangles no looser than z-order overall") {
    // the measurable claim: total box area across file groups (the
    // pruning surface) — Hilbert should not exceed Morton on the same
    // data, cuts, and file count
    val df = spark.range(8000).select(
      (pmod(xxhash64(col("id")), lit(256L))).as("a"),
      (pmod(xxhash64(col("id"), lit(1)), lit(256L))).as("b"))
    def area(m: org.apache.spark.sql.DataFrame): Long =
      m.select(sum((col("a_max") - col("a_min") + 1) *
        (col("b_max") - col("b_min") + 1))).head().getLong(0)
    val ha = area(Hilbert.layout(df, "a", "b", bits = 8, nFiles = 8))
    val za = area(ZOrder.layout(df, "a", "b", bits = 8, nFiles = 8))
    ha should be <= za
  }
}
