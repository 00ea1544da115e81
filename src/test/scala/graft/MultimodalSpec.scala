package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(
    Tables(spark, sf0001, "documents"), $"doc_id", $"text")

  test("media schema: opaque binary payload + typed metadata") {
    val m = media
    m.schema("payload").dataType.typeName shouldBe "binary"
    m.count() shouldBe 500
    m.filter($"kind" === "image").count() shouldBe 250
  }

  test("decodeFeatures: batch-shaped, deterministic, partition-invariant") {
    val a = Multimodal.decodeFeatures(media.repartition(13), dim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.decodeFeatures(media.coalesce(1), dim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    a shouldBe b // stub decode is deterministic across partitionings
    a.values.foreach(_.length shouldBe 8)
    // n_bytes preserved
    val nb = Multimodal.decodeFeatures(media).filter(_.media_id == 0L)
      .head().n_bytes
    nb shouldBe media.filter($"media_id" === 0L).head().payload.length.toLong
  }

  test("decodeFeatures: lane_sums are the exact byte sums; features = sums/255") {
    val m = media.filter($"media_id" === 1L).head()
    val f = Multimodal.decodeFeatures(media.filter($"media_id" === 1L), dim = 8)
      .head()
    val expected = new Array[Long](8)
    m.payload.zipWithIndex.foreach { case (b, i) =>
      expected(i % 8) += (b & 0xff)
    }
    f.lane_sums.toSeq shouldBe expected.toSeq
    f.lane_sums.sum shouldBe m.payload.map(_ & 0xff).map(_.toLong).sum
    f.features.toSeq shouldBe expected.map(_ / 255.0f).toSeq
  }

  test("sampleFrames: byte-addressed frames, stride sampling") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "t")
      .select($"id", $"t".cast("binary").as("payload"))
    // frameSize=3 -> frames abc def ghi j ; stride 2 keeps abc, ghi
    val frames = df.select(Multimodal.sampleFrames($"payload", 3, 2).as("f"))
      .as[Seq[Array[Byte]]].head()
    frames.map(new String(_, "UTF-8")) shouldBe Seq("abc", "ghi")
  }

  test("resizeStub: factor-2 decimation halves the payload") {
    val df = Seq("abcdefgh").toDF("t")
      .select($"t".cast("binary").as("payload"))
    val out = df.select(Multimodal.resizeStub($"payload", 2).as("r"))
      .as[Array[Byte]].head()
    new String(out, "UTF-8") shouldBe "aceg"
  }
}
