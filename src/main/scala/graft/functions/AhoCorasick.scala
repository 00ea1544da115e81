package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aho-Corasick multi-pattern scan (Aho & Corasick, CACM 1975) — the
  * governance/blocklist primitive: match EVERY occurrence of every
  * pattern (including overlaps and patterns nested inside other
  * patterns, via suffix links) in ONE pass per document, independent
  * of pattern count. A contamination phrase list or PII blocklist of
  * thousands of entries costs the same single scan as one entry —
  * the property per-pattern `contains` loops lose at 100 TB.
  *
  * Scale shape: the automaton compiles ONCE on the driver from the
  * pattern list (pattern-list-sized, tiny), ships to executors inside
  * the task closure, and each partition runs the byte-at-a-time
  * matcher over its rows — no shuffle until the per-(doc, pattern)
  * count aggregation, which is bounded by matches, not text volume.
  *
  * Determinism: pure automaton over exact characters — the oracle
  * recounts every overlapping occurrence positionally in SQL.
  */
object AhoCorasick {

  /** Compiled automaton: goto/fail/output over a dense node table.
    * Serializable (arrays + maps of primitives) so the one driver
    * build ships in the closure. */
  final class Automaton(val patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    // trie build
    private val gotoMap = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    private val out = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { ch =>
        s = gotoMap(s).getOrElseUpdate(ch, {
          gotoMap += mutable.Map.empty[Char, Int]
          out += Nil
          gotoMap.length - 1
        })
      }
      out(s) = pi :: out(s)
    }
    // BFS failure links; output sets merge along them
    private val fail = Array.fill(gotoMap.length)(0)
    locally {
      val q = mutable.Queue.empty[Int]
      gotoMap(0).values.foreach(q.enqueue(_))
      while (q.nonEmpty) {
        val u = q.dequeue()
        gotoMap(u).foreach { case (ch, v) =>
          q.enqueue(v)
          var f = fail(u)
          while (f != 0 && !gotoMap(f).contains(ch)) f = fail(f)
          fail(v) = gotoMap(f).get(ch).filter(_ != v).getOrElse(0)
          out(v) = out(v) ++ out(fail(v))
        }
      }
    }
    private val gotoFrozen: Array[Map[Char, Int]] =
      gotoMap.map(_.toMap).toArray
    private val outFrozen: Array[Array[Int]] =
      out.map(_.toArray).toArray

    /** Count every match per pattern index (overlaps and nested
      * patterns included — the suffix-link semantics). */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !gotoFrozen(s).contains(ch)) s = fail(s)
        s = gotoFrozen(s).getOrElse(ch, 0)
        val os = outFrozen(s)
        var j = 0
        while (j < os.length) {
          counts(os(j)) += 1L
          j += 1
        }
        i += 1
      }
      counts
    }
  }

  /** DENSE-TABLE automaton — the >10k-pattern shape. The map-per-node
    * trie above is right for hand-sized blocklists (tiny build, tiny
    * closure); at 10k-100k patterns the per-char map probe and the
    * per-task closure ship both become the cost. This variant
    * compiles the classic flat next-move DFA:
    *
    *  - characters collapse to DENSE CLASSES (distinct pattern chars
    *    + 1 "other" class; a 64Ki int table maps any BMP char);
    *  - next(state * nClasses + cls) is the full delta function
    *    (goto-or-fail precomputed by BFS), so the matcher inner loop
    *    is ONE array read per input char — no fail-chain walk, no map
    *    probe, no boxing;
    *  - matches emit via the output-link chain (nearest suffix state
    *    that terminates a pattern), identical overlap/nesting
    *    semantics to [[Automaton]] (differential-fuzz-pinned).
    *
    * Ship as a BROADCAST, not a closure: the table is
    * states x classes ints (~50 MB at 100k patterns) and must cross
    * the wire once per executor, not once per task —
    * [[scanCountsDense]] does this. */
  final class DenseAutomaton(val patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    require(patterns.distinct.length == patterns.length,
      "duplicate patterns (dedupe the blocklist first)")

    /** char -> dense class (0 = not in any pattern). */
    val charCls: Array[Int] = {
      val t = new Array[Int](65536)
      var next = 0
      patterns.foreach(_.foreach { ch =>
        if (t(ch) == 0) { next += 1; t(ch) = next }
      })
      t
    }
    val nClasses: Int = charCls.max + 1

    val (next: Array[Int], outPat: Array[Int], outLink: Array[Int]) = {
      // trie keyed by class id
      val children = mutable.ArrayBuffer(mutable.Map.empty[Int, Int])
      val pat = mutable.ArrayBuffer(-1)
      patterns.zipWithIndex.foreach { case (p, pi) =>
        var s = 0
        p.foreach { ch =>
          s = children(s).getOrElseUpdate(charCls(ch), {
            children += mutable.Map.empty[Int, Int]
            pat += -1
            children.length - 1
          })
        }
        pat(s) = pi
      }
      val n = children.length
      val nc = nClasses
      // unchecked Int multiply would wrap on huge pattern sets over
      // wide alphabets (e.g. 100k CJK patterns: ~400k states x ~6k
      // classes) and die with a bare NegativeArraySizeException
      require(n.toLong * nc <= Int.MaxValue,
        s"dense table $n states x $nc char classes exceeds a JVM array " +
          "— shard the pattern list or use the sparse Automaton")
      val nxt = new Array[Int](n * nc)
      val fail = new Array[Int](n)
      val link = Array.fill(n)(-1)
      val q = mutable.Queue.empty[Int]
      children(0).foreach { case (c, v) => nxt(c) = v; q.enqueue(v) }
      while (q.nonEmpty) {
        val u = q.dequeue()
        val fu = fail(u)
        link(u) = if (pat(fu) >= 0) fu else link(fu)
        // full delta row: child where present, delta(fail(u), c) else
        var c = 0
        while (c < nc) {
          children(u).get(c) match {
            case Some(v) => fail(v) = nxt(fu * nc + c); nxt(u * nc + c) = v
              q.enqueue(v)
            case None => nxt(u * nc + c) = nxt(fu * nc + c)
          }
          c += 1
        }
      }
      (nxt, pat.toArray, link)
    }

    /** Array view of the pattern list — `patterns(pi)` on a linked
      * Seq would be O(n) per emitted match. */
    val patternsArr: Array[String] = patterns.toArray

    /** Same counting contract as [[Automaton.countMatches]]: every
      * occurrence of every pattern, overlaps and nesting included. */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      val touched = new Array[Int](patterns.length)
      countInto(text, counts, touched)
      counts
    }

    /** Sparse-emit matcher for the DISTRIBUTED scan: accumulate into a
      * caller-owned `counts` buffer (all zeros on entry), recording
      * each first-touched pattern index in `touched`; returns the
      * touch count. Per-row work is O(chars + matches) — a fresh
      * 100k-long counts array per document (800 KB x rows) was the
      * measured 10x scan blowup at 100k patterns, not the automaton. */
    def countInto(text: String, counts: Array[Long],
                  touched: Array[Int]): Int = {
      val nc = nClasses
      var nT = 0
      var s = 0
      var i = 0
      while (i < text.length) {
        s = next(s * nc + charCls(text.charAt(i)))
        var t = if (outPat(s) >= 0) s else outLink(s)
        while (t >= 0) {
          val pi = outPat(t)
          if (counts(pi) == 0L) { touched(nT) = pi; nT += 1 }
          counts(pi) += 1L
          t = outLink(t)
        }
        i += 1
      }
      nT
    }
  }

  /** Scan `textCol` for every pattern: one automaton pass per row,
    * emitting (id, pattern, n_matches) for patterns with >= 1 match. */
  def scanCounts(df: DataFrame, idCol: Column, textCol: Column,
                 patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val auto = new Automaton(patterns) // one driver build, closure-shipped
    df.select(idCol.cast("long").as("id"), textCol.as("t"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, t) =>
        val c = auto.countMatches(if (t == null) "" else t)
        c.indices.collect {
          case pi if c(pi) > 0 => (id, auto.patterns(pi), c(pi))
        }
      })
      .toDF("doc_id", "pattern", "n_matches")
  }

  /** [[scanCounts]] over the dense-table automaton, broadcast once
    * per executor (the table is tens of MB at 100k patterns — a task
    * closure would re-ship it per task). Same output and the same
    * oracle as the sparse path. */
  def scanCountsDense(df: DataFrame, idCol: Column, textCol: Column,
                      patterns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val auto = spark.sparkContext.broadcast(new DenseAutomaton(patterns))
    df.select(idCol.cast("long").as("id"), textCol.as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = auto.value
        // one counts buffer per PARTITION, reset sparsely per row via
        // the touched list — O(matches) per doc, never O(patterns)
        val counts = new Array[Long](a.patternsArr.length)
        val touched = new Array[Int](a.patternsArr.length)
        it.flatMap { case (id, t) =>
          val nT = a.countInto(if (t == null) "" else t, counts, touched)
          val out = new Array[(Long, String, Long)](nT)
          var x = 0
          while (x < nT) {
            val pi = touched(x)
            out(x) = (id, a.patternsArr(pi), counts(pi))
            counts(pi) = 0L
            x += 1
          }
          out
        }
      }
      .toDF("doc_id", "pattern", "n_matches")
  }

  /** DuckDB replay: positional overlap-inclusive occurrence counting
    * per (doc, pattern). Contract: BMP-only text/patterns — the Spark
    * matcher walks UTF-16 code units while DuckDB's length()/substr()
    * count codepoints; the two coincide exactly on the Basic
    * Multilingual Plane (no surrogate pairs), which the synthetic
    * corpus satisfies. Pattern literals are quote-escaped, so
    * apostrophes in patterns are safe. */
  object Sql {
    def query(patterns: Seq[String]): String = {
      val lst = patterns
        .map(p => s"'${p.replace("'", "''")}'").mkString("[", ", ", "]")
      s"""WITH pats AS (SELECT unnest($lst) AS p),
         |m AS (
         |  SELECT d.doc_id, pats.p AS pattern,
         |    CAST(len([i FOR i IN range(1,
         |        length(d.text) - length(pats.p) + 2)
         |      IF substr(d.text, CAST(i AS BIGINT), length(pats.p))
         |         = pats.p]) AS BIGINT) AS n_matches
         |  FROM documents d CROSS JOIN pats)
         |SELECT doc_id, pattern, n_matches FROM m
         |WHERE n_matches >= 1""".stripMargin
    }
  }
}
