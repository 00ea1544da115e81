package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Stage-level timing of the IVF ANN path (scratch profiling tool). */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprofile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val emb = Tables(spark, dir, "embeddings")
    time("warmup count")(emb.count())
    time("scan+limit(4096).collect raw") {
      emb.select(col("embedding")).limit(4096).collect()
    }
    val full = time("full ivfTopK") {
      Similarity.ivfTopK(emb.filter(col("vec_id") < 50), emb, 10,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        nCells = 16, nProbe = 4, seed = 42L)
    }
    time("full ivfTopK action") {
      full.agg(sum(xxhash64(full.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
        .collect()
    }
    time("2nd run action") {
      val df = Similarity.ivfTopK(emb.filter(col("vec_id") < 50), emb, 10,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        nCells = 16, nProbe = 4, seed = 42L)
      df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
        .collect()
    }
    // job-level attribution of the real composed query
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b
        val rdds = i.rddInfos.map(r => r.name).mkString(",").take(120)
        println(f"[ivfstage] ${i.stageId}%3d ${ms.getOrElse(-1L)}%6dms tasks=${i.numTasks}%3d rdds=$rdds")
      }
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.executorRunTime + m.executorDeserializeTime > 500)
          println(s"[ivftask] stage=${t.stageId} run=${m.executorRunTime}ms " +
            s"deser=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms " +
            s"cpu=${m.executorCpuTime / 1000000}ms")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("3rd run action (with stage log)") {
      val df = Similarity.ivfTopK(emb.filter(col("vec_id") < 50), emb, 10,
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        nCells = 16, nProbe = 4, seed = 42L)
      df.agg(sum(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
        .collect()
    }
    spark.sparkContext.removeSparkListener(listener)

    // sub-stage attribution
    import graft.functions.{TopK, Vectors}
    val v0 = emb.select(col("vec_id").as("id"), col("embedding").as("__v"))
      .withColumn("__nrm", Vectors.norm(col("__v")))
      .repartition(col("id"))
      .select(col("id"),
        transform(col("__v"), x => x.cast("double") / col("__nrm")).as("vec"))
    time("normalized materialize")(v0.count())
    val prng = new java.util.Random(1)
    val planes = Seq.fill(16)(Seq.fill(64)(prng.nextGaussian()))
    val scoredCells = {
      val s = array(planes.zipWithIndex.map { case (p, i) =>
        struct((-Vectors.dot(col("vec"), typedLit(p))).as("negs"),
          lit(i).as("cell"))
      }: _*)
      transform(array_sort(s), x => x.getField("cell"))
    }
    time("assign+repartition(cell)") {
      v0.withColumn("cell", element_at(scoredCells, 1))
        .repartition(col("cell")).count()
    }
    val scored = v0.as("a").join(broadcast(v0.as("b")), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        round(Vectors.dot(col("a.vec"), col("b.vec")), 6).as("score"))
      .filter(col("query_id") < 50)
    time("scored pairs no topk")(scored.count())
    time("topk over scored")(TopK.perQuery(scored, 10).count())

    // exact real-pipeline bisection (mirrors ivfTopK internals)
    val probeCellsOf = {
      val s = array(planes.zipWithIndex.map { case (p, i) =>
        struct((-Vectors.dot(col("qv"), typedLit(p))).as("negs"),
          lit(i).as("cell"))
      }: _*)
      slice(transform(array_sort(s), x => x.getField("cell")), 1, 4)
    }
    val q = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("__v"))
      .withColumn("__nrm", Vectors.norm(col("__v")))
      .repartition(col("query_id"))
      .select(col("query_id"),
        transform(col("__v"), x => x.cast("double") / col("__nrm")).as("qv"))
      .withColumn("cells", probeCellsOf)
      .select(col("query_id"), col("qv"), explode(col("cells")).as("cell"))
    time("q probe side materialize")(q.count())
    time("q probe side 2nd")(q.count())
    // full inline composition mirroring ivfTopK exactly
    val assigned2 = v0.withColumn("cell", element_at(scoredCells, 1))
      .repartition(col("cell"))
      .select(col("cell"), col("id").as("neighbor_id"), col("vec").as("cv"))
    val joined2 = assigned2.join(broadcast(q), Seq("cell"))
    val scored2 = joined2
      .withColumn("score", round(Vectors.dot(col("qv"), col("cv")), 6))
      .filter(col("query_id") =!= col("neighbor_id"))
    val out2 = TopK.perQuery(scored2, 10)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
    time("composed inline ivf digest") {
      out2.agg(sum(xxhash64(out2.columns.toIndexedSeq.map(col): _*).cast("decimal(38,0)")))
        .collect()
    }
    spark.stop()
  }
}
