package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunker, CorpusDiff, Dedup, Splits}

/** Seeded random-input invariants for the text/dataset ops added late in
  * round 4 — the properties a refactor must not break, checked on
  * corpora a hand-golden can't cover (ragged lengths, repeated tokens,
  * single-token docs, docs shorter than one window).
  */
class TextOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260813L)

  /** Random docs over a tiny vocabulary (forces chunk-level repeats)
    * plus unique-token docs (forces none). */
  private def randomDocs(n: Int, maxLen: Int): Seq[(Long, String)] =
    (0 until n).map { i =>
      val len = rng.nextInt(maxLen) + 1
      val text =
        if (i % 3 == 0) // unique tokens: no cross-doc chunk repeats
          (0 until len).map(j => s"u${i}_$j").mkString(" ")
        else (0 until len).map(_ => s"w${rng.nextInt(6)}").mkString(" ")
      (i.toLong, text)
    }

  test("chunkWindows stride==window partitions the token stream exactly") {
    val docs = randomDocs(60, 40) // materialize once: rng is stateful
    val out = Chunker.chunkWindows(docs.toDF("doc_id", "text"),
        $"text", $"doc_id", windowTokens = 7, strideTokens = 7)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getString(3)).mkString(" ")
      }
    docs.foreach { case (id, text) =>
      out(id) shouldBe text // lossless, in order, no overlap
    }
  }

  test("chunkWindows overlapping: starts, lengths, and coverage counts") {
    val window = 5
    val stride = 2
    val docs = randomDocs(60, 23)
    val out = Chunker.chunkWindows(docs.toDF("doc_id", "text"),
        $"text", $"doc_id", window, stride)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val nWin = (toks.length - 1) / stride + 1
      (0 until nWin).foreach { i =>
        val expect = toks.slice(i * stride,
          math.min(i * stride + window, toks.length))
        out((id, i)) shouldBe ((expect.length.toLong, expect.mkString(" ")))
      }
      // no phantom chunks past the last start
      out.keys.count(_._1 == id) shouldBe nWin
    }
  }

  test("trimDuplicatedSpans is identity on an all-unique corpus") {
    val docs = randomDocs(60, 40).filter(_._1 % 3 == 0) // unique tokens
    val out = Dedup.trimDuplicatedSpans(docs.toDF("doc_id", "text"),
        $"text", $"doc_id", chunkTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    docs.foreach { case (id, text) =>
      val (nChunks, nKept, trimmed) = out(id)
      nChunks shouldBe nKept // nothing duplicated anywhere
      trimmed shouldBe text  // reassembly is lossless
    }
  }

  test("rolling trim is identity on unique corpora; agrees with flag scan") {
    val uniq = randomDocs(40, 30).filter(_._1 % 3 == 0)
    val outU = Dedup.trimDuplicatedSpansRolling(uniq.toDF("doc_id", "text"),
        $"text", $"doc_id", windowTokens = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3))))
      .toMap
    uniq.foreach { case (id, text) =>
      outU(id) shouldBe ((text.split(" ").length.toLong, text))
    }
    // on a repeat-heavy corpus, every doc the rolling flag scan marks
    // must lose >= 1 token in the rolling trim (identical hash fn)
    val docs = randomDocs(90, 30).toDF("doc_id", "text")
    val flagged = Dedup.duplicatedSpansRolling(docs, $"text", $"doc_id",
        windowTokens = 5)
      .filter($"n_dup_windows" > 0).collect().map(_.getLong(0)).toSet
    val lost = Dedup.trimDuplicatedSpansRolling(docs, $"text", $"doc_id",
        windowTokens = 5)
      .filter($"n_kept" < $"n_tokens").collect().map(_.getLong(0)).toSet
    flagged shouldBe lost // same windows, same counts -> same docs
  }

  test("trim + flag scan agree on which docs carry duplicated chunks") {
    val docs = randomDocs(90, 40).toDF("doc_id", "text")
    // flag scan ignores the partial tail; compare on full-chunk counts:
    // any doc the flag scan calls dirty must lose >=1 chunk in the trim
    val flagged = Dedup.duplicatedSpans(docs, $"text", $"doc_id",
        chunkTokens = 4)
      .filter($"n_dup_chunks" > 0).collect().map(_.getLong(0)).toSet
    val trimmedLoss = Dedup.trimDuplicatedSpans(docs, $"text", $"doc_id",
        chunkTokens = 4)
      .filter($"n_kept" < $"n_chunks")
      .collect().map(_.getLong(0)).toSet
    flagged.subsetOf(trimmedLoss) shouldBe true
  }

  test("packFixedContext invariants on random ragged corpora (both paths)") {
    // random groups, ragged docs incl. empties; window and scalable
    // paths must agree with each other and with the stream invariants
    for (l <- Seq(1, 3, 8)) {
      val docs = (0 until 50).map { i =>
        val len = rng.nextInt(12) // 0-length docs included
        (i.toLong, s"g${i % 4}",
          (0 until len).map(_ => s"w${rng.nextInt(5)}").mkString(" "))
      }
      val df = docs.toDF("doc_id", "g", "text")
      val toks = graft.functions.TextAnalysis.tokens($"text")
      def run(d: org.apache.spark.sql.DataFrame) = d
        .select($"group_id", $"example_id", $"n_tokens", $"n_docs", $"digest")
        .as[(String, Long, Long, Long, String)].collect().toSet
      val a = run(graft.operators.Pack.packFixedContext(
        df, $"g", $"doc_id", toks, seqLen = l))
      val b = run(graft.operators.Pack.packFixedContextScalable(
        df, $"g", $"doc_id", toks, seqLen = l))
      withClue(s"L=$l") {
        b shouldBe a
        // per group: total tokens conserved; example ids contiguous
        // from 0; every example but the last is exactly L
        val totals = docs.groupBy(_._2).view.mapValues(
          _.map(_._3.split("\\s+").count(_.nonEmpty).toLong).sum).toMap
        a.groupBy(_._1).foreach { case (g, exs) =>
          val byId = exs.toSeq.sortBy(_._2)
          byId.map(_._2) shouldBe (0L until byId.size.toLong)
          byId.map(_._3).sum shouldBe totals(g)
          byId.dropRight(1).foreach(_._3 shouldBe l.toLong)
          byId.last._3 should be <= l.toLong
        }
      }
    }
  }

  test("capPerSource + sampleFixedK: random caps stay consistent") {
    val rows = (0 until 500).map(i => (i.toLong, s"s${i % 7}"))
    val df = rows.toDF("id", "src")
    val bysrc = rows.groupBy(_._2).view.mapValues(_.size).toMap
    Seq(1, 13, 80, 200).foreach { cap =>
      val got = Splits.capPerSource(df, $"id", $"src", cap)
        .groupBy($"src").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      bysrc.foreach { case (s, n) =>
        got(s) shouldBe math.min(cap.toLong, n.toLong)
      }
    }
    val sizes = Seq(1, 17, 499, 500, 501)
      .map(k => Splits.sampleFixedK(df, $"id", k).count())
    sizes shouldBe Seq(1L, 17L, 499L, 500L, 500L)
  }

  test("corpus diff partitions ids; statuses match a driver recompute") {
    val oldRows = randomDocs(80, 20)
    val newRows = oldRows.drop(10) // 10 removed
      .map { case (id, t) =>
        if (id % 7 == 0) (id, t + " edited") else (id, t)
      } ++ (1000L until 1010L).map(i => (i, s"new_$i"))
    val got = CorpusDiff.diff(oldRows.toDF("doc_id", "text"),
        newRows.toDF("doc_id", "text"), $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val oldM = oldRows.toMap
    val newM = newRows.toMap
    got.keySet shouldBe (oldM.keySet ++ newM.keySet)
    got.foreach { case (id, status) =>
      val expect = (oldM.get(id), newM.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      }
      status shouldBe expect
    }
  }
}
