package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin
import graft.operators.{Cdc, SortedExport, ZOrder}

/** Specs for the round-5 layout/maintenance operators: Morton-order
  * file layout, CDC changeset application, and the end-to-end CMS
  * heavy-hitters pipeline. */
class LayoutCdcSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------- ZOrder

  /** Reference deinterleave: recover (a, b) from a Morton key. */
  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var a = 0L; var b = 0L
    (0 until bits).foreach { i =>
      a |= ((z >> (2 * i + 1)) & 1L) << i
      b |= ((z >> (2 * i)) & 1L) << i
    }
    (a, b)
  }

  test("zValue golden: interleave(5, 3, bits=3) = 39") {
    // a=101b -> bits at positions 5,1; b=011b -> positions 2,0
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 3).as("z"))
      .head().getLong(0)
    z shouldBe 39L
  }

  test("zValue is a bijection on the 32x32 grid and inverts by deinterleave") {
    val grid = for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong)
    val zs = grid.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", 5).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    zs.map(_._3).distinct.length shouldBe 1024 // injective
    zs.map(_._3).max shouldBe 1023L            // onto [0, 2^10)
    zs.foreach { case (a, b, z) => deinterleave(z, 5) shouldBe ((a, b)) }
  }

  test("zValue wraps dims mod 2^bits") {
    val z = Seq((5L + 8L, 3L + 16L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 3).as("z"))
      .head().getLong(0)
    z shouldBe 39L // (13 mod 8, 19 mod 8) == (5, 3)
  }

  test("layout on a full grid: file groups are exact quadrants with tight stats") {
    val grid = for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong)
    val m = ZOrder.layout(grid.toDF("a", "b"), "a", "b", bits = 5,
        nFiles = 4)
      .collect().map(r => r.getInt(0) -> r).toMap
    m.keySet shouldBe Set(0, 1, 2, 3)
    m.values.foreach { r =>
      r.getLong(1) shouldBe 256L // n_rows: exact quarter
      // Morton quartiles of a full square are its quadrants: each file
      // covers a 16x16 rectangle — the file-skipping guarantee
      (r.getLong(5) - r.getLong(4)) shouldBe 15L // a_max - a_min
      (r.getLong(7) - r.getLong(6)) shouldBe 15L // b_max - b_min
    }
    // z ranges of consecutive groups never overlap
    val sorted = m.toSeq.sortBy(_._1).map(_._2)
    sorted.sliding(2).foreach {
      case Seq(lo, hi) =>
        lo.getLong(3) should be < hi.getLong(2) // z_max(i) < z_min(i+1)
      case _ => ()
    }
  }

  test("prune on the full grid: a quadrant box keeps exactly its file group") {
    val grid = for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong)
    val mani = ZOrder.layout(grid.toDF("a", "b"), "a", "b", bits = 5,
      nFiles = 4)
    // the low quadrant is one file group; a box inside it keeps 1 of 4
    val kept = ZOrder.prune(mani, 2L, 9L, 3L, 12L).collect()
    kept.length shouldBe 1
    kept.head.getLong(4) shouldBe 0L // a_min of the low quadrant
    // a box spanning the a-midline intersects two quadrants
    ZOrder.prune(mani, 10L, 20L, 0L, 10L).count() shouldBe 2L
    // a box outside the grid prunes everything
    ZOrder.prune(mani, 40L, 50L, 40L, 50L).count() shouldBe 0L
  }

  test("prune never loses a matching row (no false negatives)") {
    val li = Tables(spark, sf0001, "lineitem")
    val (aLo, aHi, bLo, bHi) = (0L, 100L, 0L, 8L)
    val withGroup = SortedExport.assignShards(
      li.withColumn("__z",
        ZOrder.zValue($"l_partkey", $"l_suppkey", 16)), "__z", 8)
    val keptGroups = ZOrder.prune(
      ZOrder.layout(li, "l_partkey", "l_suppkey", bits = 16, nFiles = 8),
      aLo, aHi, bLo, bHi)
      .collect().map(_.getInt(0)).toSet
    keptGroups should not be empty
    // every row matching the predicate box sits in a kept file group
    val lost = withGroup.filter(
      $"l_partkey".between(aLo, aHi) && $"l_suppkey".between(bLo, bHi) &&
        !$"shard".isin(keptGroups.toSeq: _*)).count()
    lost shouldBe 0L
  }

  test("incrementalPlan: counts reconcile, assignment honors the stored cuts") {
    val li = Tables(spark, sf0001, "lineitem")
    val base = li.filter($"l_orderkey" % 10 < 8)
    val delta = li.filter($"l_orderkey" % 10 >= 8)
    val manifest = ZOrder.layout(base, "l_partkey", "l_suppkey",
      bits = 16, nFiles = 8)
    val plan = ZOrder.incrementalPlan(manifest, delta,
      "l_partkey", "l_suppkey", bits = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    plan.map(_._1).toSeq shouldBe (0 until 8)
    plan.map(_._2).sum shouldBe base.count()
    plan.map(_._3).sum shouldBe delta.count()
    // replay the cut rule row-by-row: group = # stored z maxima < z
    val cuts = manifest.select($"file_group".cast("int"), $"z_max")
      .collect().sortBy(_.getInt(0)).dropRight(1).map(_.getLong(1))
    val dz = delta.select(
        ZOrder.zValue($"l_partkey", $"l_suppkey", 16)).as[Long].collect()
    val expect = dz.groupBy(z => cuts.count(z > _)).view
      .mapValues(_.length.toLong).toMap
    plan.foreach { case (g, _, nd, ppm, rw) =>
      nd shouldBe expect.getOrElse(g, 0L)
      rw shouldBe (ppm >= 200000L)
    }
  }

  // ----------------------------------------------------------------- Cdc

  private def snap = Seq(
    (1L, "en", "one"), (2L, "fr", "two"), (3L, "de", "three"),
    (4L, "en", "four")).toDF("id", "lang", "text")

  test("applyChangeset: upsert, delete, insert, and latest-seq-wins") {
    val changes = Seq(
      (2L, 1L, "U", "fr", "two-v2"),
      (3L, 1L, "D", "de", "three"),
      (5L, 1L, "I", "es", "five"),
      // key 4: updated at seq 1, deleted at seq 2 -> gone
      (4L, 1L, "U", "en", "four-v2"),
      (4L, 2L, "D", "en", "four-v2"),
      // key 1: deleted at seq 1, re-inserted at seq 2 -> back with new text
      (1L, 1L, "D", "en", "one"),
      (1L, 2L, "I", "en", "one-v2")
    ).toDF("id", "seq", "op", "lang", "text")
    val got = Cdc.applyChangeset(snap, changes, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    got shouldBe Set(
      (1L, "en", "one-v2"),
      (2L, "fr", "two-v2"),
      (5L, "es", "five"))
  }

  test("applyChangeset with an empty changeset is the identity") {
    val none = Seq.empty[(Long, Long, String, String, String)]
      .toDF("id", "seq", "op", "lang", "text")
    Cdc.applyChangeset(snap, none, "id", "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet shouldBe
      snap.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
  }

  test("applyChangeset is idempotent for upserts (re-applying changes nothing)") {
    val changes = Seq((2L, 1L, "U", "fr", "two-v2"),
      (5L, 1L, "I", "es", "five")).toDF("id", "seq", "op", "lang", "text")
    val once = Cdc.applyChangeset(snap, changes, "id", "seq", "op")
    val twice = Cdc.applyChangeset(once, changes, "id", "seq", "op")
    twice.collect().map(_.toSeq).toSet shouldBe
      once.collect().map(_.toSeq).toSet
  }

  // --------------------------------------------- CMS pipeline

  test("rendezvous: ~1/(n+1) churn on grow (mod-hash reshuffles ~n/(n+1))") {
    import graft.operators.Rendezvous
    val keys = spark.range(4000).toDF("id")
    val m = Rendezvous.resizeChurn(keys, $"id", nFrom = 8, nTo = 9)
      .as[(Long, Long, Long)].collect()
    val total = m.map(_._3).sum
    total shouldBe 4000L
    val moved = m.filter(r => r._1 != r._2).map(_._3).sum
    // expectation 1/9 ~ 444; allow generous slack either side
    moved.toDouble / total should be < 0.2
    moved should be > 0L
    // the same keys under mod-hashing move ~8/9 — the property HRW buys
    val modMoved = (0L until 4000L).count(k => k % 8 != k % 9)
    modMoved.toDouble / 4000 should be > 0.8
    // placement is deterministic and balanced-ish across 8 shards
    val s8 = keys.select(Rendezvous.shardOf($"id", 8).as("s"))
      .groupBy("s").count().as[(Long, Long)].collect().toMap
    s8.keySet shouldBe (0L until 8L).toSet
    s8.values.foreach { c => c should (be > 300L and be < 700L) }
    val again = Rendezvous.resizeChurn(keys, $"id", 8, 9)
      .as[(Long, Long, Long)].collect()
    again.sortBy(r => (r._1, r._2)) shouldBe m.sortBy(r => (r._1, r._2))
  }

  test("weighted rendezvous: w-proportional load; weight bumps only pull keys in") {
    import graft.operators.Rendezvous
    val keys = spark.range(3000).toDF("id")
    def place(ws: Seq[Int]) = keys
      .select($"id", Rendezvous.shardOfWeighted($"id", ws).as("s"))
      .as[(Long, Long)].collect().toMap
    val p = place(Seq(1, 2, 4))
    val byShard = p.values.groupBy(identity).view.mapValues(_.size).toMap
    // expectation 3000 * w/7: 429 / 857 / 1714, generous band
    byShard(0L).toDouble / 3000 should (be > 0.10 and be < 0.19)
    byShard(1L).toDouble / 3000 should (be > 0.22 and be < 0.35)
    byShard(2L).toDouble / 3000 should (be > 0.50 and be < 0.65)
    // bump shard 1's weight: keys may move INTO shard 1, but never
    // between shards 0 and 2 (their replica weights are unchanged)
    val q = place(Seq(1, 3, 4))
    keys.as[Long].collect().foreach { k =>
      if (q(k) != p(k)) q(k) shouldBe 1L
    }
    (0L until 3000L).count(k => q(k) != p(k)) should be > 0
  }

  test("pointInTime: boundary semantics, open current version, no double match") {
    val dim = Seq(
      (1L, 0, 100L, Some(200L), "bronze"),
      (1L, 1, 200L, Some(300L), "silver"),
      (1L, 2, 300L, None, "gold"),
      (2L, 0, 150L, None, "flat"))
      .toDF("uid", "v", "valid_from", "valid_to", "tier")
      .select($"uid", $"v", $"valid_from",
        $"valid_to".cast("long").as("valid_to"), $"tier")
    val facts = Seq(
      (1L, 100L), // == valid_from: inclusive -> bronze
      (1L, 199L), // bronze
      (1L, 200L), // == valid_to: exclusive -> silver
      (1L, 999L), // open-ended current -> gold
      (1L, 50L),  // before any version: drops
      (2L, 150L), (3L, 500L)) // unknown key drops
      .toDF("uid_f", "ts")
    val out = Cdc.pointInTime(facts, $"uid_f", $"ts",
      dim, $"uid", $"valid_from", $"valid_to")
      .select($"uid_f", $"ts", $"tier")
      .as[(Long, Long, String)].collect().toSet
    out shouldBe Set(
      (1L, 100L, "bronze"), (1L, 199L, "bronze"),
      (1L, 200L, "silver"), (1L, 999L, "gold"), (2L, 150L, "flat"))
    // SCD2 intervals are disjoint, so no fact matches twice
    out.size shouldBe out.map(t => (t._1, t._2)).size
  }

  test("rollup levels: leaf counts roll into subtotals and the grand total") {
    val out = SparkEntry.queries("rel_orders_rollup")(spark, sf0001)
      .as[(String, String, Long, Long, Long)].collect()
    val leaves = out.filter(_._5 == 0L)
    val bySubtotal = out.filter(_._5 == 1L)
    val grand = out.filter(_._5 == 3L)
    grand.length shouldBe 1
    grand.head._3 shouldBe leaves.map(_._3).sum
    grand.head._4 shouldBe leaves.map(_._4).sum
    bySubtotal.foreach { s =>
      s._3 shouldBe leaves.filter(_._1 == s._1).map(_._3).sum
    }
  }

  test("heavyHitters returns a superset of the true phi-heavy hitters") {
    val terms = (Seq.fill(300)("hot1") ++ Seq.fill(150)("hot2") ++
      (0 until 550).map(i => s"cold${i % 200}")).toDF("term")
    val got = CountMin.heavyHitters(terms, $"term", depth = 4,
        width = 2048, phiNum = 1L, phiDen = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=1000, threshold 100: true heavy hitters are hot1 (300), hot2 (150)
    got.keySet should contain allOf ("hot1", "hot2")
    got("hot1") should be >= 300L
    got("hot2") should be >= 150L
    // no cold term (true count <= 3) can clear 100 without colliding
    // with a hot term in ALL 4 rows — astronomically unlikely at width
    // 2048; assert the candidate set is exactly the two hot terms
    got.keySet shouldBe Set("hot1", "hot2")
  }

  test("rendezvous balance + seasonality: shares sum, dispersion floors") {
    val bal = SparkEntry.queries("layout_rendezvous_balance")(
      spark, sf0001).collect()
    bal.length shouldBe 8
    // ppm shares sum to ~1e6 (integer DIV floors at most 1 ppm each)
    val shareSum = bal.map(_.getLong(3)).sum
    shareSum should (be >= 999992L and be <= 1000000L)
    bal.map(_.getLong(1)).sum shouldBe 500L // every doc placed once
    val sea = SparkEntry.queries("events_hourly_seasonality")(
      spark, sf0001).collect()
    sea.length should be > 1
    sea.foreach { r =>
      r.getLong(2) should (be >= 0L and be <= 23L) // peak hour in range
      // peak share at least the uniform 1/24
      r.getLong(3) should be >= (1000000L / 24)
      r.getLong(4) should be >= 0L // chi-square never negative
    }
  }
}
