package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dsir, Vocab}
import graft.operators.Cdc

/** Data-selection + corpus-versioning operators: tokenizer-apply
  * encoding, DSIR importance ranking, SCD2 time travel. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("Vocab.encode: hand-computed ids, OOV as 0, digest replays") {
    // corpus: "a" x3, "b" x2, "c" x1 -> vocab(k=2): a->1, b->2; c OOV
    val df = Seq((1L, "a b a"), (2L, "b c a")).toDF("doc_id", "text")
    val got = Vocab.encode(df, $"doc_id", $"text", k = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "ids_digest")
      .as[(Long, Long, Long, String)].collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got shouldBe Array(
      (1L, 3L, 0L, md5hex("1,2,1")),
      (2L, 3L, 1L, md5hex("2,0,1")))
  }

  test("Vocab.encode: empty and all-OOV docs survive") {
    val df = Seq((1L, "x x"), (2L, " ")).toDF("doc_id", "text")
    // k=1 vocab = {x}; doc 2 tokenizes to zero tokens
    val got = Vocab.encode(df, $"doc_id", $"text", k = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov").as[(Long, Long, Long)]
      .collect()
    got shouldBe Array((1L, 2L, 0L), (2L, 0L, 0L))
  }

  test("selectPareto: exactly the non-dominated set, ties kept") {
    import graft.operators.Splits
    val pts = Seq(
      (1L, 10L, 100L), (2L, 10L, 90L),   // 2 dominated by 1 (same x)
      (3L, 20L, 80L), (4L, 20L, 80L),    // tie on both axes: both kept
      (5L, 30L, 50L), (6L, 25L, 60L),
      (7L, 5L, 120L), (8L, 5L, 100L),    // 8 dominated by 7; 1 NOT by 7
      (9L, 30L, 50L), (10L, 15L, 100L))  // 10 dominated by 1 (y tie, x<)
      .toDF("id", "x", "y")
    val got = Splits.selectPareto(pts, $"id", $"x", $"y")
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    // brute-force dominance
    val all = Seq((1L, 10L, 100L), (2L, 10L, 90L), (3L, 20L, 80L),
      (4L, 20L, 80L), (5L, 30L, 50L), (6L, 25L, 60L), (7L, 5L, 120L),
      (8L, 5L, 100L), (9L, 30L, 50L), (10L, 15L, 100L))
    val expect = all.filterNot { case (i, x, y) =>
      all.exists { case (j, x2, y2) =>
        j != i && x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet
    got shouldBe expect
    got should contain allOf (3L, 4L) // the both-axes tie survives twice
    // fuzz vs brute force
    val rnd = new scala.util.Random(11)
    val fz = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val fgot = Splits.selectPareto(fz.toDF("id", "x", "y"),
      $"id", $"x", $"y").as[(Long, Long, Long)].collect().map(_._1).toSet
    val fexp = fz.filterNot { case (i, x, y) =>
      fz.exists { case (j, x2, y2) =>
        j != i && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    fgot shouldBe fexp
  }

  test("Dsir: target-heavy docs outrank raw-typical docs") {
    // target rows share the 'q r' bigram; raw rows share 's t'
    val rows = (1L to 20L).map { i =>
      if (i <= 5) (i, "q r q r q r", true) // in-domain
      else (i, "s t s t s t", false)
    } ++ Seq((21L, "q r q r s t", false), (22L, "s t s t q r", false))
    val df = rows.toDF("doc_id", "text", "tgt")
    val top = Dsir.topKByImportance(df, $"doc_id", $"text", $"tgt",
      k = 22, nBuckets = 16)
      .orderBy("rank").select("doc_id", "rank", "score")
      .as[(Long, Int, Long)].collect()
    // every target doc must outrank every pure-raw doc; the mixed docs
    // sit in between (21 leans target, 22 leans raw)
    val rankOf = top.map(r => r._1 -> r._2).toMap
    (1L to 5L).foreach { t =>
      (6L to 20L).foreach { r => rankOf(t) should be < rankOf(r) }
    }
    rankOf(21L) should be < rankOf(22L)
    // deterministic across runs
    val again = Dsir.topKByImportance(df, $"doc_id", $"text", $"tgt",
      k = 22, nBuckets = 16)
      .orderBy("rank").select("doc_id", "rank", "score")
      .as[(Long, Int, Long)].collect()
    again shouldBe top
  }

  test("Cdc.asOf: updates/deletes visible at their seq, inserts later") {
    val base = Seq((1L, "v0-1"), (2L, "v0-2"), (3L, "v0-3"))
      .toDF("doc_id", "fp")
    val changes = Seq(
      (1L, 1L, "U", "v1-1"), // update doc 1 at seq 1
      (2L, 2L, "D", null), // delete doc 2 at seq 2
      (4L, 3L, "I", "v3-4"), // insert doc 4 at seq 3
      (1L, 4L, "D", null) // re-delete doc 1 at seq 4
    ).toDF("doc_id", "seq", "op", "fp")
    def at(t: Long) = Cdc.asOf(base, changes, "doc_id", "seq", "op", t)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    at(0L) shouldBe Seq((1L, "v0-1"), (2L, "v0-2"), (3L, "v0-3"))
    at(1L) shouldBe Seq((1L, "v1-1"), (2L, "v0-2"), (3L, "v0-3"))
    at(2L) shouldBe Seq((1L, "v1-1"), (3L, "v0-3"))
    at(3L) shouldBe Seq((1L, "v1-1"), (3L, "v0-3"), (4L, "v3-4"))
    at(4L) shouldBe Seq((3L, "v0-3"), (4L, "v3-4"))
  }

  test("calibration bins: partition the corpus; agree with the sweep's totals") {
    import graft.functions.ClassifierEval
    val docs = Tables(spark, sf0001, "documents")
    val bins = ClassifierEval.calibrationBins(docs, $"doc_id", $"text")
      .as[(Long, Long, Long, Long)].collect()
    bins.foreach { case (bin, nb, pos, rate) =>
      bin should (be >= 0L and be <= 7L)
      pos should be <= nb
      rate shouldBe pos * 1000000L / nb
    }
    bins.map(_._2).sum shouldBe docs.count()
    // total positives must equal the sweep's threshold-independent
    // tp+fn (same truth battery)
    val sweep = ClassifierEval.thresholdSweep(docs, $"doc_id", $"text")
      .select("tp", "fn").as[(Long, Long)].collect()
    bins.map(_._3).sum shouldBe (sweep.head._1 + sweep.head._2)
  }

  test("ClassifierEval sweep: cells partition the corpus, tp monotone") {
    val docs = Tables(spark, sf0001, "documents")
    val sweep = graft.functions.ClassifierEval.thresholdSweep(
      docs, $"doc_id", $"text")
      .orderBy("threshold")
      .select("threshold", "tp", "fp", "fn", "tn")
      .as[(Int, Long, Long, Long, Long)].collect()
    sweep.length shouldBe graft.functions.ClassifierEval.Thresholds.length
    val n = docs.count()
    sweep.foreach { case (_, tp, fp, fn, tn) =>
      tp + fp + fn + tn shouldBe n
    }
    // positives (tp+fn) are threshold-independent; tp non-increasing
    sweep.map(r => r._2 + r._4).distinct.length shouldBe 1
    val tps = sweep.map(_._2)
    tps.zip(tps.tail).foreach { case (a, b) => a should be >= b }
  }

  test("KMV sketch union: exact below k, inclusion-exclusion exact") {
    import graft.functions.Kmv
    // A = {1..30}, B = {21..50}: |A|=30 |B|=30 |A∪B|=50 |A∩B|=10 —
    // all below k, so every estimate is EXACT (distinct u32 hashes;
    // md5 collisions at 50 values are vanishingly unlikely and would
    // fold identically anyway)
    val df = (1L to 50L).toDF("id")
    val out = Kmv.sketchUnionEstimate(df, Kmv.u32($"id"),
      inA = $"id" <= 30, inB = $"id" >= 21, k = 256)
      .select("est_a", "est_b", "est_union", "est_intersect")
      .as[(Long, Long, Long, Long)].head()
    out shouldBe ((30L, 30L, 50L, 10L))
  }

  test("KMV sketch union: estimate within error when sketches saturate") {
    import graft.functions.Kmv
    val df = (1L to 4000L).toDF("id")
    val out = Kmv.sketchUnionEstimate(df, Kmv.u32($"id"),
      inA = $"id" <= 3000, inB = $"id" >= 1001, k = 256)
      .select("est_a", "est_b", "est_union", "est_intersect")
      .as[(Long, Long, Long, Long)].head()
    // ~1/sqrt(k-2) ≈ 6.3%; assert within 4 sigma
    math.abs(out._1 - 3000L) should be < 760L
    math.abs(out._2 - 3000L) should be < 760L
    math.abs(out._3 - 4000L) should be < 1010L
  }

  test("slidingDistinctEstimate: exact below k per window; saturates within error") {
    import graft.functions.Kmv
    // 10 buckets x 20 fresh users each; window 3 -> trailing distinct
    // is 20/40/60 (below k=256: all EXACT)
    val rows = for {
      b <- 0L until 10L; u <- 0L until 20L
    } yield (b * 1000000000L + u, b * 20 + u)
    val df = rows.toDF("ts", "user")
    val got = Kmv.slidingDistinctEstimate(df, $"ts", Kmv.u32($"user"),
      k = 256, windowBuckets = 3, bucketNs = 1000000000L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    got.map(_._1) shouldBe (0L until 10L).toArray
    got.foreach(_._2 shouldBe 20L) // per-bucket event counts
    got.map(_._3) shouldBe
      Array(20L, 40L, 60L, 60L, 60L, 60L, 60L, 60L, 60L, 60L)
    // saturation: same shape with k=16 — estimates within 4 sigma
    // (~1/sqrt(14) per window) of the true trailing distinct
    val small = Kmv.slidingDistinctEstimate(df, $"ts", Kmv.u32($"user"),
      k = 16, windowBuckets = 3, bucketNs = 1000000000L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    small.drop(2).foreach { case (_, _, est) =>
      math.abs(est - 60L) should be < 65L
    }
    // overlapping windows REUSE sketches: bucket 5's window must not
    // see bucket 0-2 users (window is trailing-3, not cumulative)
    small.last._3 should be < 200L
  }

  test("corpus_filter_fates: fates partition the corpus; dup branch fires") {
    val out = SparkEntry.queries("corpus_filter_fates")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.values.sum shouldBe 500L // every doc gets exactly one fate
    out.keySet should contain allOf ("kept", "low_quality", "eval_holdout")
    // exact-dup branch on a corpus with a real duplicate: doc 3 copies
    // doc 1's text; the higher id must lose (priority below quality
    // and contamination, which don't fire here)
    val docs = Seq(
      (1L, ("the to of and " * 30).trim), // quality-passing
      (3L, ("the to of and " * 30).trim),
      (5L, ("be that have with " * 30).trim)
    ).toDF("doc_id", "text")
    val scored = docs.repartition($"doc_id")
      .select($"doc_id",
        graft.functions.TextAnalysis.qualityScoreOf(
          graft.functions.TextAnalysis.profile($"text")).as("quality"),
        graft.functions.TextAnalysis.fingerprint($"text").as("fp"))
    val keepers = scored.groupBy($"fp").agg(min($"doc_id").as("keeper"))
    val fates = scored.join(keepers, "fp")
      .select($"doc_id",
        when($"quality" < 0.3, "low_quality")
          .when($"doc_id" =!= $"keeper", "duplicate")
          .otherwise("kept").as("fate"))
      .as[(Long, String)].collect().toMap
    fates(1L) shouldBe "kept"
    fates(3L) shouldBe "duplicate"
    fates(5L) shouldBe "kept"
  }

  test("Cdc.asOf at max seq == applyChangeset current snapshot size") {
    val docs = Tables(spark, sf0001, "documents")
    val base = docs.select($"doc_id", md5($"text").as("fp"))
    val upd = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id", lit(1L).as("seq"), lit("U").as("op"),
        md5(concat($"text", lit(" rev1"))).as("fp"))
    val del = docs.filter($"doc_id" % 17 === 0)
      .select($"doc_id", lit(2L).as("seq"), lit("D").as("op"),
        lit(null).cast("string").as("fp"))
    val ins = docs.filter($"doc_id" < 40)
      .select(($"doc_id" + 100000L).as("doc_id"),
        lit(3L).as("seq"), lit("I").as("op"), md5($"text").as("fp"))
    val ch = upd.unionByName(del).unionByName(ins)
    val full = Cdc.asOf(base, ch, "doc_id", "seq", "op", atSeq = 3L)
    // 500 - 30 deleted + 40 inserted
    full.count() shouldBe 510L
    // monotone visibility: seq=2 view has no inserted ids
    Cdc.asOf(base, ch, "doc_id", "seq", "op", atSeq = 2L)
      .filter($"doc_id" >= 100000L).count() shouldBe 0L
  }
}
