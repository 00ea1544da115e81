package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 plus a pendant: counts and ppm coefficients by hand") {
    // K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant 5-1.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("src", "dst")
    val got = Triangles.perNode(edges, $"src", $"dst")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got shouldBe Array(
      (1L, 4L, 3L, 500000L),  // 2*3e6 / (4*3)
      (2L, 3L, 3L, 1000000L), // 2*3e6 / (3*2)
      (3L, 3L, 3L, 1000000L),
      (4L, 3L, 3L, 1000000L),
      (5L, 1L, 0L, 0L))
  }

  test("self-loops, reversed and parallel edges collapse") {
    val messy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L), // one undirected edge
      (2L, 3L), (3L, 1L),
      (3L, 3L) // self-loop dropped
    ).toDF("src", "dst")
    val und = Triangles.undirectedEdges(messy, $"src", $"dst")
      .as[(Long, Long)].collect().sorted
    und shouldBe Array((1L, 2L), (1L, 3L), (2L, 3L))
    val got = Triangles.perNode(messy, $"src", $"dst")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.map(r => (r._1, r._3)) shouldBe Array((1L, 1L), (2L, 1L), (3L, 1L))
  }

  test("triangle-free bipartite graph reports zeros") {
    val edges = (for (a <- 1L to 3L; b <- 10L to 12L) yield (a, b))
      .toDF("src", "dst")
    val got = Triangles.perNode(edges, $"src", $"dst")
      .as[(Long, Long, Long, Long)].collect()
    got.length shouldBe 6
    all(got.map(_._3)) shouldBe 0L
  }

  test("fuzz: per-node counts match brute-force triple enumeration") {
    val rnd = new scala.util.Random(7)
    val n = 24
    val edgeSet = scala.collection.mutable.Set.empty[(Long, Long)]
    (1 to 90).foreach { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      if (a != b) edgeSet += ((math.min(a, b), math.max(a, b)))
    }
    val edges = edgeSet.toSeq.toDF("src", "dst")
    val adj = edgeSet.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def connected(x: Long, y: Long) =
      edgeSet.contains((math.min(x, y), math.max(x, y)))
    val nodes = edgeSet.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = nodes.map { v =>
      val nbrs = nodes.filter(u => u != v && connected(u, v))
      val t = nbrs.combinations(2).count { case Seq(a, b) => connected(a, b) }
      v -> (nbrs.size.toLong, t.toLong)
    }.toMap
    val got = Triangles.perNode(edges, $"src", $"dst")
      .as[(Long, Long, Long, Long)].collect()
    got.length shouldBe brute.size
    got.foreach { case (node, deg, tri, ppm) =>
      val (bd, bt) = brute(node)
      deg shouldBe bd
      tri shouldBe bt
      ppm shouldBe (if (deg >= 2) 2000000L * tri / (deg * (deg - 1)) else 0L)
    }
  }
}
