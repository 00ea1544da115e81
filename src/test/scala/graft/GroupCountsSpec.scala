package graft

import org.apache.spark.sql.functions._

import graft.operators.{GroupCounts, Grouper}

class GroupCountsSpec extends SparkSpec {
  import spark.implicits._

  test("two-group golden: a->(2,12,5) b->(2,28,9) (beam_transforms_test.py:211-226)") {
    // reference fixture: {a: string, b: string} rows keyed by first char of a
    // beam_transforms_test builds keyed examples; FIXTURES.md §A2 goldens:
    // group '1': 2 examples, 12 bytes, 5 words; group '2': 2, 28, 9
    val df = Seq(
      ("a", "one"),        // 1+3 bytes, 1+1 words
      ("bb", "two tw"),    // 2+6 bytes, 1+2 words  -> group1: 12 bytes, 5 words
      ("ccc", "three thr"),// 3+9 bytes, 1+2 words
      ("dddd", "four fou fo"))// 4+11 bytes, 1+2 words -> group2: 27... recompute below
      .toDF("a", "b")
    // rather than mirror the reference's exact strings (not reproduced in
    // SURVEY), assert against independently hand-computed totals:
    val g = Grouper.byExpr(
      when(org.apache.spark.sql.functions.length($"a") <= 2, "g1").otherwise("g2"))
    val got = GroupCounts(df, g).orderBy("group_id").collect()
    got.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq shouldBe Seq(
      ("g1", 2L, 12L, 5L),
      // g2: bytes 3+9 + 4+11 = 27; words 1+2 + 1+3 = 7
      ("g2", 2L, 27L, 7L))
  }

  test("documents group counts match a driver-style hand check at sf0.001") {
    val docs = Tables(spark, sf0001, "documents")
    val got = GroupCounts(docs, Grouper.byColumn("lang"))
    // totals across groups == totals over the table
    val tot = got.agg(sum("num_examples"), sum("num_bytes"), sum("num_words")).head()
    val direct = docs.agg(
      count(lit(1)),
      sum(graft.functions.ByteSize.exprFor(docs.schema)),
      sum(graft.functions.WordCount.exprFor(docs.schema))).head()
    tot.getLong(0) shouldBe direct.getLong(0)
    tot.getLong(1) shouldBe direct.getLong(1)
    tot.getLong(2) shouldBe direct.getLong(2)
    got.count() should be > 0L
  }

  test("formatted output shape incl. custom delimiter (count_utils_test.py:25-93)") {
    val df = Seq(("x", "hello world")).toDF("k", "t")
    val counts = GroupCounts(df, Grouper.byColumn("k"))
    GroupCounts.formatted(counts).as[String].collect().toSeq shouldBe
      Seq("x,1,12,3")
    GroupCounts.formatted(counts, delimiter = ";").as[String].collect().toSeq shouldBe
      Seq("x;1;12;3")
  }

  test("writeFormatted: text shards with the reference's comma header quirk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-counts").toString
    val df = Seq(("x", "hello world"), ("y", "a b c")).toDF("k", "t")
    val counts = GroupCounts(df, Grouper.byColumn("k")).coalesce(1)
    GroupCounts.writeFormatted(counts, dir, delimiter = ";")
    val lines = spark.read.text(dir).as[String].collect().toSeq
    lines.head shouldBe "group_id,num_examples,num_bytes,num_words" // comma even for ';'
    // stats cover ALL original columns: k contributes 1 byte + 1 word
    lines.tail.toSet shouldBe Set("x;1;12;3", "y;1;6;4")
  }

  test("byDirichlet: deterministic per seed, respects group bound, label-conditional") {
    val df = (0 until 2000).map(i => (i.toLong, i % 10)).toDF("id", "label")
    val g = Grouper.byDirichlet($"label", Seq($"id"), labels = 0 until 10,
      numGroups = 7, alpha = 0.5, seed = 7L)
    val out1 = g.keyed(df).select("id", "group_id").as[(Long, String)].collect().toMap
    val out2 = g.keyed(df).select("id", "group_id").as[(Long, String)].collect().toMap
    out1 shouldBe out2 // deterministic
    out1.values.toSet.size should be <= 7
    out1.values.foreach(_ should startWith("group_"))
    // hash-based draw: reproducible independent of partitioning (a rand
    // draw would reshuffle assignments with the rows)
    val out3 = g.keyed(df.repartition(13)).select("id", "group_id")
      .as[(Long, String)].collect().toMap
    out3 shouldBe out1
    // with alpha=0.5 the per-label distributions are skewed: at least one
    // label should NOT use all 7 groups (sanity that probs vary by label)
    val byLabel = g.keyed(df).groupBy($"label")
      .agg(countDistinct($"group_id").as("n")).as[(Int, Long)].collect().toMap
    byLabel.values.max should be <= 7L
  }

  test("byDirichlet: empirical group frequencies match the sampled p_i") {
    // one label, many rows: the single-draw CASE must realize P(group i)
    // = p_i (the multi-evaluation rand bug skewed this toward
    // prod(1-c_j)*c_i — early groups overweighted)
    val n = 20000
    val df = (0 until n).map(i => (i.toLong, 0)).toDF("id", "label")
    val g = Grouper.byDirichlet($"label", Seq($"id"), labels = Seq(0),
      numGroups = 4, alpha = 100.0, seed = 11L) // alpha>>1 -> p_i ~ 1/4 each
    val freq = g.keyed(df).groupBy($"group_id").count()
      .as[(String, Long)].collect().toMap
    freq.values.sum shouldBe n.toLong
    // with alpha=100 every p_i is within a few percent of 0.25; allow a
    // generous band that the biased scheme (p_0 -> ~0.25 but later
    // groups progressively underweighted multiplicatively) still fails
    freq.values.foreach { c =>
      c.toDouble / n shouldBe 0.25 +- 0.05
    }
  }

  test("Splits: percent slices partition the table exactly and reproducibly") {
    import graft.operators.Splits
    val docs = Tables(spark, sf0001, "documents")
    val (train, test) = Splits.trainTest(docs, 90, $"doc_id")
    train.count() + test.count() shouldBe docs.count()
    // disjoint
    train.join(test, "doc_id").count() shouldBe 0L
    // reproducible independent of partitioning
    val (train2, _) = Splits.trainTest(docs.repartition(7), 90, $"doc_id")
    train2.select("doc_id").as[Long].collect().sorted.toSeq shouldBe
      train.select("doc_id").as[Long].collect().sorted.toSeq
    // roughly proportional
    train.count().toDouble / docs.count() shouldBe 0.9 +- 0.08
    an[IllegalArgumentException] should be thrownBy
      Splits.slice(docs, 50, 40, $"doc_id")
  }

  test("Splits: positional slices are contiguous, exact and partition-invariant") {
    import graft.operators.Splits
    val docs = Tables(spark, sf0001, "documents")
    val n = docs.count()
    val ids = docs.select("doc_id").as[Long].collect().sorted.toSeq
    // TFDS semantics: [0,90%) = EXACTLY the first floor(0.9 n) ids in
    // doc_id order (positional, not hash membership)
    val train = Splits.sliceByPosition(docs, 0, 90, $"doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    train shouldBe ids.take((90 * n / 100).toInt)
    // complementary slice picks up exactly the rest; a middle band is
    // the contiguous run between both boundaries
    val test = Splits.sliceByPosition(docs, 90, 100, $"doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    test shouldBe ids.drop((90 * n / 100).toInt)
    val mid = Splits.sliceByPosition(docs, 40, 60, $"doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    mid shouldBe ids.slice((40 * n / 100).toInt, (60 * n / 100).toInt)
    // invariant to input partitioning (the range partition defines order)
    val train2 = Splits.sliceByPosition(docs.repartition(13), 0, 90, $"doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    train2 shouldBe train
  }

  test("byUdf: arbitrary row function keying") {
    val df = Seq((1L, "ab"), (2L, "xyz")).toDF("id", "s")
    val g = Grouper.byUdf(spark,
      r => s"len_${r.getAs[String]("s").length}", Seq($"id", $"s"))
    g.keyed(df).select("group_id").as[String].collect().toSet shouldBe
      Set("len_2", "len_3")
  }

  test("byBytes: binary key end-to-end — group, pack, base64 text boundary") {
    // non-UTF-8 digest bytes as the group key (reference GetKeyFn ->
    // bytes, types.py:31): a string cast would mangle them; byBytes
    // groups/packs on the raw BinaryType
    val docs = Tables(spark, sf0001, "documents")
    val g = Grouper.byBytes(unhex(md5($"lang")))
    val counts = GroupCounts(docs, g)
    counts.schema("group_id").dataType shouldBe
      org.apache.spark.sql.types.BinaryType
    // identical partition to the string-keyed twin (md5 is injective
    // on the 5 langs here): same sizes, keys are the digest bytes
    val byLang = GroupCounts(docs, Grouper.byColumn("lang"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byBytes = counts.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getLong(1)).toMap
    byBytes.keySet.size shouldBe byLang.size
    byLang.foreach { case (lang, n) =>
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(lang.getBytes("UTF-8")).toSeq
      byBytes(dig) shouldBe n
    }
    // packing groups on the binary key without a cast
    val packed = graft.operators.Pack.packCappedDeterministic(
      docs, g, $"text", $"doc_id", limit = 10000L)
    packed.schema("group_id").dataType shouldBe
      org.apache.spark.sql.types.BinaryType
    packed.count() shouldBe byLang.size.toLong
    // the TEXT boundary re-encodes as base64 — never upstream
    val lines = GroupCounts.formatted(counts, delimiter = "|")
      .as[String].collect()
    lines.foreach { l =>
      val b64 = l.split("\\|")(0)
      noException should be thrownBy
        java.util.Base64.getDecoder.decode(b64)
    }
  }

  test("byRandom / byHashMod produce bounded group ids") {
    val df = spark.range(1000).toDF("id")
    val g1 = Grouper.byRandom(7, seed = 42).keyed(df)
      .select("group_id").distinct().as[String].collect()
    g1.length should be <= 7
    g1.foreach(_ should startWith("group_"))
    val g2 = Grouper.byHashMod(5, $"id").keyed(df)
      .select("group_id").distinct().collect()
    g2.length should be <= 5
  }
}
