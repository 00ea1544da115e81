package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Sequential-fill compaction planning: golden bins, the straddle
  * bound, oversized-file isolation, and conservation. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def manifest(sizes: (String, Long)*) =
    sizes.toSeq.toDF("file_id", "n_bytes")

  test("golden: descending fill with start DIV target") {
    // target 100; desc order: a=90, b=60, c=50, d=30, e=10
    // starts:              a=0, b=90, c=150, d=200, e=230
    // bins:                a=0, b=0,  c=1,   d=2,   e=2
    val got = Compaction.assignBins(
      manifest("d" -> 30L, "a" -> 90L, "e" -> 10L, "b" -> 60L, "c" -> 50L),
      "file_id", "n_bytes", targetBytes = 100L)
      .select($"file_id", $"start", $"bin").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    got shouldBe Map(
      "a" -> ((0L, 0)), "b" -> ((90L, 0)), "c" -> ((150L, 1)),
      "d" -> ((200L, 2)), "e" -> ((230L, 2)))
  }

  test("equal sizes tie-break on file_id for a total order") {
    val got = Compaction.assignBins(
      manifest("x" -> 40L, "y" -> 40L, "w" -> 40L),
      "file_id", "n_bytes", targetBytes = 80L)
      .select($"file_id", $"bin").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    got shouldBe Map("w" -> 0, "x" -> 0, "y" -> 1)
  }

  test("an oversized file never shares its bin") {
    val got = Compaction.assignBins(
      manifest("big" -> 250L, "s1" -> 40L, "s2" -> 40L, "s3" -> 30L),
      "file_id", "n_bytes", targetBytes = 100L)
      .select($"file_id", $"bin").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // big spans offsets [0, 250) -> bin 0; the tail starts at 250 ->
    // bin 2 onward; bins 0 and 1 belong to big alone
    got("big") shouldBe 0
    Seq("s1", "s2", "s3").map(got) should contain noneOf (0, 1)
  }

  test("plan: conservation and the straddle bound on random sizes") {
    val rng = new scala.util.Random(7)
    val files = (0 until 200).map(i =>
      (f"f$i%03d", 1L + rng.nextInt(5000).toLong))
    val target = 8192L
    val bins = Compaction.plan(manifest(files: _*), "file_id", "n_bytes",
      target).collect()
    bins.map(_.getAs[Long]("total_bytes")).sum shouldBe files.map(_._2).sum
    bins.map(_.getAs[Long]("n_files")).sum shouldBe 200L
    // a bin only exceeds the target by less than its largest member
    // (the file that straddles the boundary)
    bins.foreach { b =>
      b.getAs[Long]("total_bytes") should be <
        (target + b.getAs[Long]("max_file_bytes"))
    }
  }

  test("plan matches a sequential replay on the documents manifest") {
    val docs = Tables(spark, sf0001, "documents")
      .groupBy($"source", $"lang")
      .agg(sum(octet_length($"text")).cast("long").as("n_bytes"))
      .select(concat($"source", lit("/"), $"lang").as("file_id"),
        $"n_bytes")
    val target = 16384L
    val local = docs.collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }
    val starts = local.scanLeft(0L) { case (acc, (_, n)) => acc + n }
    val want = local.zip(starts).map { case ((id, _), s) =>
      id -> (s / target).toInt
    }.toMap
    val got = Compaction.assignBins(docs, "file_id", "n_bytes", target)
      .select($"file_id", $"bin").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    got shouldBe want
  }
}
