package graft

import org.apache.spark.sql.functions._

import graft.functions.Redact
import graft.operators.{Decontaminate, Dedup, Splits}

/** LLM-pipeline hygiene operators: decontamination, deterministic
  * stratified sampling, PII redaction. */
class PipelineOpsSpec extends SparkSpec {

  test("dataset card: shares sum to ~1e6, sections complete, volume exact") {
    import spark.implicits._
    val card = SparkEntry.queries("dataset_card_documents")(spark, sf0001)
      .as[(String, String, Long)].collect()
    val docs = Tables(spark, sf0001, "documents")
    val bySec = card.groupBy(_._1)
    bySec.keySet shouldBe Set("corpus", "lang_share_ppm",
      "source_share_ppm", "dedup", "quality")
    card.find(r => r._1 == "corpus" && r._2 == "n_docs").get._3 shouldBe
      docs.count()
    // integer-floor shares: within |groups| ppm of exactly 1e6
    Seq("lang_share_ppm", "source_share_ppm").foreach { sec =>
      val vs = bySec(sec).map(_._3)
      vs.sum should be <= 1000000L
      vs.sum should be > 1000000L - vs.length.toLong
    }
    val q = card.find(r => r._2 == "gopher_pass_ppm").get._3
    q should (be >= 0L and be <= 1000000L)
  }
  import spark.implicits._

  test("decontamination: overlap stats match a driver-side recompute") {
    val docs = Tables(spark, sf0001, "documents")
    val corpus = docs.filter($"doc_id" % 97 =!= 0)
    val evalSet = docs.filter($"doc_id" % 97 === 0)
    val got = Decontaminate.ngramOverlap(corpus, evalSet,
      $"text", $"doc_id", $"text", $"doc_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference recompute: shingle both sides on the driver
    def shingleMap(rows: Array[(Long, String)]): Map[Long, Set[String]] =
      rows.map { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        id -> toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
      }.toMap
    val cs = shingleMap(corpus.select($"doc_id", $"text")
      .as[(Long, String)].collect())
    val es = shingleMap(evalSet.select($"doc_id", $"text")
      .as[(Long, String)].collect())
    val expected = cs.flatMap { case (id, grams) =>
      val hits = es.filter { case (_, eg) => (grams & eg).nonEmpty }
      if (hits.isEmpty) None
      else {
        val shared = grams & hits.values.flatten.toSet
        Some((id, shared.size.toLong, hits.size.toLong))
      }
    }.toSet
    got shouldBe expected
    got should not be empty // the synthetic corpus has planted near-dups
  }

  test("decontamination: eval shingles broadcast (no corpus-side shuffle join)") {
    val docs = Tables(spark, sf0001, "documents")
    val plan = Decontaminate.ngramOverlap(
      docs.filter($"doc_id" % 97 =!= 0), docs.filter($"doc_id" % 97 === 0),
      $"text", $"doc_id", $"text", $"doc_id", n = 4)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("stratified sample: membership is exactly the md5 rule, rates honored") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"lang", $"source")
    val rates = Map("en" -> 0.5, "fr" -> 0.25)
    val got = Splits.stratifiedSample(docs, $"doc_id", $"lang", rates, 0.1)
      .select($"doc_id").as[Long].collect().toSet

    val all = docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    val expected = all.filter { case (id, lang) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      u < rates.getOrElse(lang, 0.1)
    }.map(_._1).toSet
    got shouldBe expected

    // sampling is monotone: raising every rate only adds rows
    val bigger = Splits.stratifiedSample(docs, $"doc_id", $"lang",
      rates.view.mapValues(_ * 1.5).toMap, 0.2)
      .select($"doc_id").as[Long].collect().toSet
    got.subsetOf(bigger) shouldBe true
  }

  test("profiler: nulls, cardinality, rendered ranges (one row per column)") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("a")),
      (Some(2L), None, Some("b")),
      (None, Some(1.25), Some("a"))).toDF("k", "v", "s")
    // below k distinct values the KMV sketch is exact, so the default
    // and the exact twin must agree cell for cell
    for (got <- Seq(
        graft.functions.Profiler.profile(df, Seq("k", "v", "s")),
        graft.functions.Profiler.profileExact(df, Seq("k", "v", "s")))
      .map(_.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap)) {
      got("k") shouldBe ((1L, 2L, "1", "2"))
      got("v") shouldBe ((1L, 2L, "1.2500", "2.5000"))
      got("s") shouldBe ((0L, 2L, "a", "b"))
    }
  }

  test("profiler: KMV == exact below k across partitions; bounded error above") {
    // 500 distinct over 8 partitions: merges + compactions exercised,
    // estimate must be the EXACT count (sketch unsaturated)
    val small = spark.range(0, 2000, 1, 8)
      .selectExpr("id % 500 AS g")
    val est = graft.functions.Profiler.profile(small.toDF(), Seq("g"))
      .collect().head.getLong(2)
    est shouldBe 500L

    // 50k distinct with k = 256: saturated sketch; KMV theory gives
    // ~1/sqrt(k-2) ≈ 6.3% stderr — assert a generous 4-sigma envelope
    // (deterministic md5 hashes, so this can never flake)
    val big = spark.range(0, 50000, 1, 8).toDF()
    val estBig = graft.functions.Profiler.profile(big, Seq("id"), k = 256)
      .collect().head.getLong(2)
    estBig.toDouble shouldBe 50000.0 +- 50000.0 * 0.25
  }

  test("csv interchange: hostile strings survive the roundtrip") {
    val rows = Seq(
      (1L, "plain text"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "line\nbreak and \r carriage"),
      (5L, ""),
      (6L, "trailing space "),
      (7L, "unicode ✓ ünïcode 中文"))
    val df = rows.toDF("id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-csvspec")
    try {
      df.write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(tmp.toString)
      val back = spark.read.schema(df.schema)
        .option("header", "true").option("escape", "\"")
        .option("multiLine", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(tmp.toString)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // Spark's CSV writer emits empty string as an empty (null) field;
      // every OTHER value must round-trip byte-identically
      rows.filter(_._2.nonEmpty).foreach { case (id, t) =>
        back(id) shouldBe t
      }
      (back(5L) == null || back(5L) == "") shouldBe true
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("redact: typed placeholders replace every match, counts agree") {
    val df = Seq(
      (1L, "mail a@b.co and c.d-e@f.org now"),
      (2L, "call 555-123-4567 or 555-000-1111 from 10.0.0.1"),
      (3L, "no pii here at all"),
      (4L, "x 1.2.3.4 y 255.255.255.255 z")).toDF("id", "t")
    val out = df.select($"id",
      Redact.countMatches($"t", Redact.EmailPattern).as("e"),
      Redact.countMatches($"t", Redact.PhonePattern).as("p"),
      Redact.countMatches($"t", Redact.Ipv4Pattern).as("i"),
      Redact.redact($"t").as("r"))
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    out(1L) shouldBe ((2, 0, 0, "mail <EMAIL> and <EMAIL> now"))
    out(2L) shouldBe ((0, 2, 1, "call <PHONE> or <PHONE> from <IP>"))
    out(3L) shouldBe ((0, 0, 0, "no pii here at all"))
    out(4L) shouldBe ((0, 0, 2, "x <IP> y <IP> z"))
  }

  test("auditRollup: golden counts, rates in bp, drift; empty cell safe") {
    // v0 (ver=0): s1 has 2 docs (1 with pii), s2 has 1 doc (0 pii)
    // v1 (ver=1): s1 has 1 doc (1 with pii, 2 emails), s2 has none
    val df = Seq(
      ("s1", 0, "mail a@b.co now"),
      ("s1", 0, "clean"),
      ("s1", 1, "a@b.co and c@d.org"),
      ("s2", 0, "call 1-2 no match")).toDF("src", "ver", "t")
    val out = Redact.auditRollup(df, $"t", $"src", $"ver")
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    s1.getLong(s1.fieldIndex("docs_v0")) shouldBe 2L
    s1.getLong(s1.fieldIndex("docs_v1")) shouldBe 1L
    s1.getLong(s1.fieldIndex("pii_docs_v0")) shouldBe 1L
    s1.getLong(s1.fieldIndex("pii_docs_v1")) shouldBe 1L
    s1.getLong(s1.fieldIndex("emails_v1")) shouldBe 2L
    s1.getLong(s1.fieldIndex("pii_rate_bp_v0")) shouldBe 5000L
    s1.getLong(s1.fieldIndex("pii_rate_bp_v1")) shouldBe 10000L
    s1.getLong(s1.fieldIndex("drift_bp")) shouldBe 5000L
    val s2 = out("s2")
    s2.getLong(s2.fieldIndex("docs_v1")) shouldBe 0L
    s2.getLong(s2.fieldIndex("pii_rate_bp_v0")) shouldBe 0L
    // empty v1 cell: rate and drift degrade to null, never divide-by-0
    s2.isNullAt(s2.fieldIndex("pii_rate_bp_v1")) shouldBe true
    s2.isNullAt(s2.fieldIndex("drift_bp")) shouldBe true
  }

  test("domainRollup: extraction goldens, doc reach vs url count, blocklist") {
    import graft.functions.Urls
    val docs = Seq(
      (1L, "see https://a.com/x and https://a.com/y plus http://b.org"),
      (2L, "only https://a.com here"),
      (3L, "no links at all"),
      (4L, "tricky https://a.com. trailing dot stays in the class"))
      .toDF("doc_id", "text")
    val out = Urls.domainRollup(docs, $"doc_id", $"text",
      blocklist = Seq("b.org"))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc1 cites a.com twice -> n_urls 3+1 vs n_docs 3 (incl. "a.com.")
    out("a.com") shouldBe ((3L, 2L, false))
    out("b.org") shouldBe ((1L, 1L, true))
    // '.' is in the domain class: the trailing dot is captured — the
    // documented dialect trade-off (same in both engines)
    out("a.com.") shouldBe ((1L, 1L, false))
    out.keySet should not contain "no"
  }

  test("subsampleCounts: matches a driver replay; rare kept, frequent thinned") {
    import graft.functions.Vocab
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def u32(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).take(8), 16)
    // corpus: "the" dominates, "rara" is a hapax
    val docs = Seq(
      (1L, "the the the the the rara the the"),
      (2L, "the the the the the the the the")).toDF("doc_id", "text")
    val occ = for {
      (id, txt) <- Seq((1L, "the the the the the rara the the"),
        (2L, "the the the the the the the the"))
      (tok, pos) <- txt.split("\\s+").zipWithIndex
    } yield (id, pos, tok)
    val n = occ.size.toDouble
    val f = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val t = 0.5
    val expected = occ.groupBy(_._3).map { case (tok, os) =>
      val p = math.min(1.0, math.sqrt(t * n / f(tok)))
      val kept = os.count { case (id, pos, _) =>
        u32(s"$id:$pos").toDouble / 4294967296.0 < p
      }
      tok -> (f(tok), kept.toLong)
    }
    val got = Vocab.subsampleCounts(docs, $"doc_id", $"text", t, k = 10)
      .as[(Int, String, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    got shouldBe expected
    // hapax survives: p = sqrt(0.5*16/1) > 1 -> always kept
    got("rara") shouldBe ((1L, 1L))
    // the dominant token is actually thinned
    got("the")._2 should be < got("the")._1
  }

  test("cooccurrence: golden window pairs, minCount prune, lift ties") {
    import graft.functions.Cooccurrence
    val docs = Seq((1L, "a B c a b"), (2L, "b c")).toDF("doc_id", "text")
    // window 2 pairs: doc1 [a b c a b] -> (a,b)x2,(a,c),(b,c),(b,a),
    // (c,a),(c,b); doc2 -> (b,c). uni: a=2 b=3 c=2, N=7.
    val out = Cooccurrence.topPairsByLift(docs, $"text",
      window = 2, minCount = 2, k = 10)
      .as[(Int, String, String, Long, Long, Long, Long)].collect()
    // minCount=2 keeps (a,b)=2 and (b,c)=2; both lift
    // (2*7*1e6) DIV 6 = 2333333 — the tie breaks (tok_a, tok_b) ASC
    out shouldBe Array(
      (1, "a", "b", 2L, 2L, 3L, 2333333L),
      (2, "b", "c", 2L, 3L, 2L, 2333333L))
    // window 1 (adjacent only): (a,b) doc1 positions 1,4; (b,c) doc1
    // position 2 + doc2 — the skip pairs (a,c),(b,a),(c,b) are gone
    val adj = Cooccurrence.topPairsByLift(docs, $"text",
      window = 1, minCount = 2, k = 10)
      .as[(Int, String, String, Long, Long, Long, Long)].collect()
    adj.map(r => (r._2, r._3, r._4)) shouldBe
      Array(("a", "b", 2L), ("b", "c", 2L))
    // the sequence variant is the same miner: feeding the tokenized
    // docs as arrays reproduces the text result exactly
    val seqs = Seq(Seq("a", "b", "c", "a", "b"), Seq("b", "c"))
      .toDF("seq")
    val viaSeq = Cooccurrence.topPairsFromSequences(seqs, $"seq",
      window = 2, minCount = 2, k = 10)
      .as[(Int, String, String, Long, Long, Long, Long)].collect()
    viaSeq shouldBe out
  }

  test("sampleFixedK: exact size, nested prefixes, md5-determined") {
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"source")
    val k10 = Splits.sampleFixedK(docs, $"doc_id", 10)
      .collect().map(_.getLong(0)).toSet
    val k30 = Splits.sampleFixedK(docs, $"doc_id", 30)
      .collect().map(_.getLong(0)).toSet
    k10.size shouldBe 10
    k30.size shouldBe 30
    k10.subsetOf(k30) shouldBe true // samples nest
    // k >= n returns everything
    val n = docs.count()
    Splits.sampleFixedK(docs, $"doc_id", 100000)
      .count() shouldBe n
    // matches the full-sort definition
    val expect = docs.select($"doc_id",
        md5($"doc_id".cast("string")).as("k"))
      .orderBy($"k").limit(10).collect().map(_.getLong(0)).toSet
    k10 shouldBe expect
  }

  test("chunkWindows: overlap, short tails kept, empty docs dropped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5"), // window 4 stride 2: [t1..t4][t3..t5][t5]
      (2L, "a b"),            // one short chunk
      (3L, "  "),             // no tokens -> no chunks
      (4L, "x1 x2 x3 x4")     // exact window: [x1..x4][x3 x4]
    ).toDF("doc_id", "text")
    val out = graft.operators.Chunker
      .chunkWindows(docs, $"text", $"doc_id", windowTokens = 4,
        strideTokens = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    out((1L, 0)) shouldBe ((4L, "t1 t2 t3 t4"))
    out((1L, 1)) shouldBe ((3L, "t3 t4 t5"))
    out((1L, 2)) shouldBe ((1L, "t5"))
    out((2L, 0)) shouldBe ((2L, "a b"))
    out((4L, 0)) shouldBe ((4L, "x1 x2 x3 x4"))
    out((4L, 1)) shouldBe ((2L, "x3 x4"))
    out.keys.map(_._1).toSet shouldBe Set(1L, 2L, 4L)
    out.size shouldBe 6
  }

  test("corpus diff: added/removed/changed/unchanged by normalized fp") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "text")
    // 2: whitespace-only edit -> unchanged (normalized fingerprint);
    // 3: content edit -> changed; 4 added; 1 removed
    val neu = Seq((2L, "  b "), (3L, "C!"), (4L, "d"))
      .toDF("doc_id", "text")
    val out = graft.operators.CorpusDiff.diff(old, neu, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added")
    val sum = graft.operators.CorpusDiff
      .summary(old, neu, $"doc_id", $"text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sum shouldBe Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L)
  }
}
