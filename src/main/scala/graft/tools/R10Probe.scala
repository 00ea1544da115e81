package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 decomposition probes: times labeled sub-plans of the
  * wave-2 hot queries with the noop sink (guide §1.4) so optimization
  * targets the measured component, not a guess. Diagnostic only.
  *   sbt "runMain graft.tools.R10Probe <sfDir> [probe ...]"
  */
object R10Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, dir, "region").count()

    def t(label: String)(df: => DataFrame): Unit = {
      // warm-up rep then best-of-2 timed reps
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-46s cold=${reps.head}%6.2f warm=${reps.tail.min}%6.2f")
    }
    def on(p: String) = which.isEmpty || which(p)

    if (on("profile")) {
      val li = Tables(spark, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_linestatus")
      t("profile: scan 7 cols")(li.select(cols.map(col): _*))
      t("profile: 7x md5-u32 only")(li.select(cols.map(c =>
        graft.functions.Kmv.u32(col(c)).as(c)): _*))
      t("profile: 7x xx-u32 only")(li.select(cols.map(c =>
        graft.functions.Kmv.u32Xx(col(c)).as(c)): _*))
      t("profile: full (md5 kmv)")(graft.functions.Profiler.profile(
        li, cols, hashFn = graft.functions.Kmv.u32))
      t("profile: full (xx kmv)")(graft.functions.Profiler.profile(
        li, cols, hashFn = graft.functions.Kmv.u32Xx))
      t("profile: basic aggs only (no kmv)") {
        val aggs = cols.flatMap { c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max")) }
        li.agg(aggs.head, aggs.tail: _*)
      }
    }

    if (on("classifier")) {
      val docs = Tables(spark, dir, "documents")
      t("classifier: tokens only")(docs.select(
        graft.functions.TextAnalysis.tokens(lower(col("text"))).as("t")))
      t("classifier: full score")(graft.functions.HashedLinear.score(
        docs, col("doc_id"), col("text")))
    }

    if (on("entity")) {
      val cust = Tables(spark, dir, "customer")
      def segs(name: org.apache.spark.sql.Column) = (0 until 3).map(j =>
        concat(substring(name, 13 + j, 1), substring(name, 16 + j, 1)))
      val base = cust.select(col("c_custkey").as("id"),
        col("c_name").as("name"), col("c_nationkey").as("blk"))
      val segged = base.select(col("id"), col("name"), col("blk"),
          posexplode(array(segs(col("name")): _*)).as(Seq("seg", "segval")))
        .repartition(col("blk"), col("seg"), col("segval"))
      t("entity: segged")(segged)
      val joined = segged.as("a").join(segged.as("b"),
        col("a.blk") === col("b.blk") && col("a.seg") === col("b.seg") &&
          col("a.segval") === col("b.segval") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.blk").as("block"),
          col("a.name").as("__na"), col("b.name").as("__nb"))
      t("entity: join (no distinct)")(joined)
      t("entity: join+distinct")(joined.distinct())
      t("entity: full")(graft.operators.EntityMatch.blockedPairs(cust,
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        segs = n => segs(n), maxDist = 2))
    }

    if (on("refresh")) {
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("text"))
      t("refresh: fingerprint only")(docs.select(
        graft.functions.TextAnalysis.fingerprint(col("text")).as("fp")))
      t("refresh: weightSum only")(docs.select(
        graft.functions.HashedLinear.weightSum(col("text")).as("w")))
      val upd = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" rev1")))
        .withColumn("seq", lit(1L)).withColumn("op", lit("U"))
      val del = docs.filter(col("doc_id") % 17 === 0)
        .withColumn("seq", lit(2L)).withColumn("op", lit("D"))
      val ins = docs.filter(col("doc_id") < 40)
        .withColumn("doc_id", col("doc_id") + lit(100000L))
        .withColumn("seq", lit(3L)).withColumn("op", lit("I"))
      val v2 = graft.operators.Cdc.applyChangeset(docs,
        upd.unionByName(del).unionByName(ins), "doc_id", "seq", "op")
      t("refresh: v2 (cdc only)")(v2)
      val enriched = v2.repartition(col("doc_id")).select(
        col("doc_id"), col("lang"),
        graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"),
        graft.functions.HashedLinear.weightSum(col("text")).as("w_sum"))
      t("refresh: enriched (cdc+hash)")(enriched)
      t("refresh: full")(graft.SparkEntry.queries(
        "corpus_refresh_pipeline")(spark, dir))
    }

    if (on("profilepar")) {
      val li = Tables(spark, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_linestatus")
      t("profilepar: full md5 kmv over repartition(32)")(
        graft.functions.Profiler.profile(li.repartition(32), cols,
          hashFn = graft.functions.Kmv.u32))
      t("profilepar: classifier over repartition(32)")(
        graft.functions.HashedLinear.score(
          Tables(spark, dir, "documents").repartition(32),
          col("doc_id"), col("text")))
    }

    if (on("entity2")) {
      val cust = Tables(spark, dir, "customer")
      def segs(name: org.apache.spark.sql.Column) = (0 until 3).map(j =>
        concat(substring(name, 13 + j, 1), substring(name, 16 + j, 1)))
      val base = cust.select(col("c_custkey").as("id"),
        col("c_name").as("name"), col("c_nationkey").as("blk"))
      val segged = base.select(col("id"), col("name"), col("blk"),
          posexplode(array(segs(col("name")): _*)).as(Seq("seg", "segval")))
        .repartition(col("blk"), col("seg"), col("segval"))
      val joined = segged.as("a").join(segged.as("b"),
        col("a.blk") === col("b.blk") && col("a.seg") === col("b.seg") &&
          col("a.segval") === col("b.segval") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.blk").as("block"),
          col("a.name").as("__na"), col("b.name").as("__nb"))
      println("[probe] entity pre-distinct rows = " + joined.count() +
        ", post-distinct = " + joined.distinct().count())
      // levenshtein BEFORE the distinct: evaluated once per joined row,
      // filter shrinks the distinct input
      t("entity2: leven-first variant")(joined
        .select(col("id_a"), col("id_b"), col("block"),
          levenshtein(col("__na"), col("__nb")).cast("long").as("name_dist"))
        .filter(col("name_dist") <= 2)
        .distinct())
    }

    if (on("entity3")) {
      val cust = Tables(spark, dir, "customer")
      def segs(name: org.apache.spark.sql.Column) = (0 until 3).map(j =>
        concat(substring(name, 13 + j, 1), substring(name, 16 + j, 1)))
      val base = cust.select(col("c_custkey").as("id"),
        col("c_name").as("name"), col("c_nationkey").as("blk"))
      val segged = base.select(col("id"), col("name"), col("blk"),
          posexplode(array(segs(col("name")): _*)).as(Seq("seg", "segval")))
        .repartition(col("blk"), col("seg"), col("segval"))
      val joined = segged.as("a").join(segged.as("b"),
        col("a.blk") === col("b.blk") && col("a.seg") === col("b.seg") &&
          col("a.segval") === col("b.segval") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.blk").as("block"),
          col("a.name").as("__na"), col("b.name").as("__nb"))
      t("entity3: joined only")(joined)
      t("entity3: joined + plain lev")(joined.select(
        levenshtein(col("__na"), col("__nb")).as("d")))
      t("entity3: joined + lev(threshold=2)")(joined.select(
        levenshtein(col("__na"), col("__nb"), 2).as("d")))
      t("entity3: joined + lev + filter + distinct")(joined
        .withColumn("name_dist",
          levenshtein(col("__na"), col("__nb")).cast("long"))
        .filter(col("name_dist") <= 2)
        .select(col("id_a"), col("id_b"), col("block"), col("name_dist"))
        .distinct())
    }

    if (on("text")) {
      val docs = Tables(spark, dir, "documents")
      t("text: gopher")(graft.functions.Gopher.stats(
        docs, col("doc_id"), col("text")))
      t("text: gopher repartition(32)")(graft.functions.Gopher.stats(
        docs.repartition(32), col("doc_id"), col("text")))
      t("text: text_stats query")(graft.SparkEntry.queries(
        "text_stats_documents")(spark, dir))
      t("text: threshold_sweep")(graft.SparkEntry.queries(
        "classifier_threshold_sweep")(spark, dir))
    }

    if (on("containment")) {
      t("containment: full")(graft.SparkEntry.queries(
        "dedup_containment_documents")(spark, dir))
    }

    if (on("semantic")) {
      val emb = Tables(spark, dir, "embeddings")
      val pairs = graft.operators.Similarity.cosinePairsLshAnchored(emb,
        col("vec_id"), col("embedding"), threshold = 0.45,
        dim = 64, nBits = 6, nTables = 8)
      t("semantic: pairs only")(pairs)
      t("semantic: clusters")(graft.operators.Dedup.clusters(
        emb, col("vec_id"), pairs))
      t("semantic: full")(graft.SparkEntry.queries(
        "dedup_semantic_embeddings")(spark, dir))
    }

    if (on("advisor")) {
      t("advisor: full")(graft.SparkEntry.queries(
        "profile_join_advisor")(spark, dir))
      t("advisor: cardinality")(graft.SparkEntry.queries(
        "profile_join_cardinality")(spark, dir))
    }

    if (on("card")) {
      t("card: fused")(graft.operators.DatasetCard.card(
        Tables(spark, dir, "documents"), fuseScans = true))
      t("card: brute")(graft.operators.DatasetCard.card(
        Tables(spark, dir, "documents"), fuseScans = false))
    }

    spark.stop()
  }
}
