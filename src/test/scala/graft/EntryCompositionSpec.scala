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

  test("type transitions: edge total = events - users; outflows sum to ~1e6") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val got = SparkEntry.queries("events_type_transitions")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val ev = Tables(spark, sf0001, "events")
    val nUsers = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    // each user's k events yield k-1 transitions
    got.map(_._3).sum shouldBe ev.count() - nUsers
    got.groupBy(_._1).values.foreach { rows =>
      val s2 = rows.map(_._4).sum
      s2 should (be >= 1000000L - rows.size and be <= 1000000L)
    }
  }

  test("dup rate by source: totals match exact dedup; rates consistent") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("dedup_rate_by_source")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val docs = Tables(spark, sf0001, "documents")
    got.values.map(_._1).sum shouldBe docs.count()
    // total dupes across sources == corpus rows minus distinct contents
    val distinctContents = Dedup.exact(docs, col("text"), col("doc_id"))
      .count()
    got.values.map(_._2).sum shouldBe docs.count() - distinctContents
    got.values.foreach { case (n, d, ppm) =>
      d should be <= n
      ppm shouldBe d * 1000000L / n
    }
  }

  test("sft render: template goldens via driver replay on tiny docs") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("sft_render_documents")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getString(4)))
      .toMap
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (id, text) =>
      val pos = text.indexOf('.')
      val (p, resp) =
        if (pos >= 0)
          (text.substring(0, pos + 1),
            text.substring(pos + 1).dropWhile(_ == ' '))
        else (text, "")
      val rendered = s"<|user|>\n$p\n<|assistant|>\n$resp"
      val toks = rendered.split("\\s+").count(_.nonEmpty).toLong
      got(id) shouldBe ((toks, toks <= 2048, resp.nonEmpty,
        md5hex(rendered)))
    }
  }

  test("readability, code signals, canaries: formulas and planted hits") {
    import org.apache.spark.sql.functions.col
    val docs = Tables(spark, sf0001, "documents")
    val rd = SparkEntry.queries("text_readability_documents")(
      spark, sf0001).collect()
    rd.length should be > 0
    rd.foreach { r =>
      val (w, s2, syl, fk) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      w should be > 0L
      fk shouldBe 390 * w / s2 + 11800 * syl / w - 15590
    }
    val cs = SparkEntry.queries("text_code_signals")(spark, sf0001)
      .collect()
    cs.foreach { r =>
      r.getLong(4) shouldBe
        (r.getLong(2) + r.getLong(3)) * 1000000L / r.getLong(1)
    }
    val can = SparkEntry.queries("decontaminate_canaries")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    can("c4n4ry-alpha-7f3e") shouldBe
      docs.filter(col("doc_id") % 97 === 1).count()
    can("c4n4ry-beta-00d1") shouldBe
      docs.filter(col("doc_id") % 89 === 2).count()
    can("c4n4ry-gamma-9a2b") shouldBe 0L // never planted, never found
  }

  test("repetition signals: hand-derived goldens and fold tie rule") {
    import spark.implicits._
    // "a b a b a c": 6 tokens, 3 distinct -> dup 500000 ppm; bigrams
    // "a b"x2 / "b a"x2 / "a c" -> champion "a b" (tie of 2 breaks to
    // the lexicographically smaller); chars=11 -> 2*3*1e6 DIV 11;
    // trigram "a b a"x2 -> dup mass 2*5 -> 909090 ppm
    val df = Seq((1L, "a b a b a c"), (2L, "x"), (3L, "")).toDF("id", "text")
    val got = graft.functions.Repetition.signals(df, $"id", $"text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    r1.getLong(1) shouldBe 6L
    r1.getLong(2) shouldBe 500000L
    r1.getString(3) shouldBe "a b"
    r1.getLong(4) shouldBe 2L
    r1.getLong(5) shouldBe 2L * 3L * 1000000L / 11L
    r1.getLong(6) shouldBe 10L * 1000000L / 11L
    // single token: no grams, zero signals, champion empty
    val r2 = got(2L)
    r2.getLong(1) shouldBe 1L
    r2.getLong(2) shouldBe 0L
    r2.getString(3) shouldBe ""
    r2.getLong(4) shouldBe 0L
    // empty doc: everything zero, no division blowups
    val r3 = got(3L)
    r3.getLong(1) shouldBe 0L
    r3.getLong(2) shouldBe 0L
    r3.getLong(5) shouldBe 0L
    r3.getLong(6) shouldBe 0L
  }

  test("last-touch attribution: purchases partition across channels") {
    // named imports: functions.not would shadow the matcher word
    import org.apache.spark.sql.functions.{col, round, sum}
    val got = SparkEntry.queries("events_attribution_lasttouch")(
      spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables(spark, sf0001, "events")
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    got.values.map(_._1).sum shouldBe nPurch // every purchase lands once
    got.keySet should not contain "purchase" // never self-attributes
    // total attributed value equals the exact purchase-value sum
    val totalE4 = ev.filter(col("event_type") === "purchase")
      .agg(sum(round(col("value"), 4).cast("decimal(18,4)") * 10000)
        .cast("long")).head().getLong(0)
    got.values.map(_._2).sum shouldBe totalE4
  }

  test("truncation loss and norm audit: internal consistency on sf0.001") {
    val tl = SparkEntry.queries("pack_truncation_loss")(spark, sf0001)
      .collect()
    tl.length should be > 1
    tl.foreach { r =>
      val (nDocs, over, total, lost, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      over should be <= nDocs
      lost should be <= total
      ppm shouldBe lost * 1000000L / total
      // a doc can lose at most all-but-128 of its tokens
      if (over == 0) lost shouldBe 0L
    }
    val na = SparkEntry.queries("embedding_norm_audit")(spark, sf0001)
      .collect()
    na.length should be > 1
    na.foreach { r =>
      r.getLong(2) shouldBe 0L // no zero vectors in the testdata
      r.getLong(3) should be > 0L // min norm positive
      r.getLong(3) should be <= r.getLong(4)
      r.getLong(5) should be >= r.getLong(4) // sum >= max
    }
  }

  test("percentile normalize: per-source ppm spans [0, 1e6], monotone in q") {
    val got = SparkEntry.queries("quality_percentile_normalize")(
      spark, sf0001)
      .collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3)))
    got.length should be > 1
    val bySrc = got.groupBy(_._1)
    bySrc.values.foreach { rows =>
      val ps = rows.map(_._3)
      ps.min shouldBe 0L
      if (rows.length > 1) ps.max shouldBe 1000000L
      // percentile respects the score order within a source
      rows.sortBy(_._3).map(_._2).sliding(2).foreach {
        case Array(a, b) => a should be <= b
        case _ =>
      }
    }
  }

  test("label balance: effective labels between 1 and n_labels") {
    val r = SparkEntry.queries("embedding_label_balance")(spark, sf0001)
      .collect().head
    val (nVecs, nLabels) = (r.getLong(0), r.getLong(1))
    val eff = r.getLong(4)
    nVecs should be > nLabels
    eff should be >= 1000L // >= 1.0 effective label
    eff should be <= nLabels * 1000L // <= n_labels (uniform case)
    r.getLong(3) should be >= (1000000L / nLabels) // max share >= mean
  }

  test("entity resolution pipeline: keeper is the balance-max member of its cluster") {
    import graft.operators.{Dedup, EntityMatch}
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("entity_resolution_pipeline")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    got.size should be > 0
    // recompute assignments and balances independently
    val cust = graft.Tables(spark, sf0001, "customer")
    val pairs = EntityMatch.deletionNeighborhoodPairs(cust,
      col("c_custkey"), substring(col("c_name"), 10, 9),
      col("c_nationkey"), verifyCol = Some(col("c_name")))
    val assign = Dedup.clusters(cust, col("c_custkey"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val bal = cust.select(col("c_custkey"), col("c_acctbal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = assign.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    for ((cid, (keeper, score, size)) <- got) {
      val members = byCluster(cid)
      members.length.toLong shouldBe size
      size should be >= 2L
      members should contain(keeper)
      score shouldBe bal(keeper)
      // keeper rule: max balance, lowest id on ties
      val best = members.map(m => (bal(m), m)).sortBy(t => (-t._1, t._2)).head
      keeper shouldBe best._2
    }
    // every multi-member cluster is in the output (none dropped)
    byCluster.count(_._2.length >= 2) shouldBe got.size
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
