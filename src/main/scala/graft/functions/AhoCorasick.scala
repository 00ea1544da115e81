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
