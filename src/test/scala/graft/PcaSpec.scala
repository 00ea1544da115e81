package graft

import org.apache.spark.sql.functions._

import graft.functions.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // anisotropic cloud: lane 0 carries ~16x the variance of lanes 1..3
  // (deterministic md5-derived noise, zero-mean by symmetric pairing)
  private def cloud = {
    val rows = (0 until 128).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f // symmetric pairs
      val big = s * (1.0f + (i / 2 % 7) * 0.1f)
      (i.toLong, Array(big, s * 0.1f * (i / 2 % 3),
        s * 0.05f * (i / 2 % 5), 0.0f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("power iteration finds the dominant axis; extra steps stabilize") {
    val v3 = Pca.topComponentInt(cloud, $"embedding", dim = 4)
    // lane 0 dominates and renormalization pins max |component| = 256
    math.abs(v3(0)) shouldBe 256L
    v3.drop(1).foreach(x => math.abs(x) should be < 128L)
    // converged: more iterations do not move the integer direction
    val v6 = Pca.topComponentInt(cloud, $"embedding", dim = 4, iters = 6)
    v6.toSeq shouldBe v3.toSeq
  }

  test("projection is the exact integer dot of centered quantized lanes") {
    val mean = Pca.laneMeans(cloud, $"embedding", dim = 4)
    val v = Pca.topComponentInt(cloud, $"embedding", dim = 4)
    val projs = Pca.projectInt(cloud, $"vec_id", $"embedding", mean, v)
      .as[(Long, Long)].collect().toMap
    val q = cloud.as[(Long, Array[Float])].collect()
    q.foreach { case (id, e) =>
      val want = e.zipWithIndex.map { case (x, j) =>
        (math.floor(x.toDouble * 256).toLong - mean(j)) * v(j)
      }.sum
      projs(id) shouldBe want
    }
    // symmetric-pair construction: projections pair up with opposite
    // signs modulo the centering shift, so the total is bounded small
    math.abs(projs.values.sum) should be < (4L * 256 * 256 * 128)
  }

  test("variance explained: dominant-axis cloud carries most variance") {
    val ve = Pca.varianceExplainedPpm(cloud, $"embedding", dim = 4)
      .as[(Long, Long)].head()
    ve._1 shouldBe 128L
    // lane 0 holds ~16x the per-lane variance of the noise lanes
    ve._2 should be > 900000L
    ve._2 should be <= 1000000L
  }

  test("degenerate input fails loudly (zero matrix)") {
    val z = Seq((1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    an[Exception] should be thrownBy
      Pca.topComponentInt(z, $"embedding", dim = 2)
  }
}
