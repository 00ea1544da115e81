package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list, in INTEGER fixed-point
  * arithmetic — the iterative-graph-analytics member of the operator
  * family (connected components = [[Dedup]] pointer jumping; this is
  * the other classic, used for page/domain quality weighting in web
  * corpus curation, e.g. Common-Crawl-derived training sets).
  *
  * Exactness: ranks are BIGINT "micro-rank" units (init 10^12 per
  * node). One round is
  *   pr'(v) = B + (17 * Σ_{u→v} (pr(u) div outdeg(u))) div 20
  * with B = 0.15 * 10^12 and `div` integer division — the damping
  * d=0.85 as the rational 17/20. Every step is integer, so the result
  * replays bit-for-bit in any SQL engine (the repo's log-free/
  * integer-exact oracle discipline; float PageRank would drift by
  * summation order). Floors lose < outdeg units per node per round —
  * relative error < 10^-9 against real-valued PageRank, irrelevant for
  * ranking. Dangling-node mass is dropped (not redistributed), the
  * common simplification; multiset edges each carry a contribution.
  *
  * Scale shape: per round, ONE join of the rank vector to the edge
  * list on src (both hash-partitioned on the same key — a 1000-node
  * cluster re-uses the edge exchange every round), one groupBy(dst)
  * with map-side partial sums, one left join back to the node roster.
  * Iterations are a fixed small count (convergence to ranking
  * stability is fast at d=0.85); for long runs, checkpoint the rank
  * vector every few rounds to truncate lineage (the [[Dedup]]
  * pointer-jumping idiom).
  */
object PageRank {

  val InitMass = 1000000000000L // 10^12 micro-units per node
  val TeleportBase = 150000000000L // floor(0.15 * 10^12)

  /** Run `iters` rounds over `edges` (columns src, dst — a MULTISET:
    * parallel edges each contribute). Output: (node, outdeg, rank_fp)
    * with outdeg 0 for dangling nodes. */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outd, "src") // (src, dst, outdeg)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    var pr = nodes.select(col("node"), lit(InitMass).as("pr"))
    (1 to iters).foreach { _ =>
      val contrib = e.join(pr, e("src") === pr("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inmass"))
      pr = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(TeleportBase) +
            expr("(coalesce(inmass, 0L) * 17L) div 20L")).as("pr"))
    }
    pr.join(outd, pr("node") === outd("src"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        col("pr").as("rank_fp"))
  }

  /** Edge list from an event stream: consecutive events of the same
    * user (ordered by ts, tie-broken by `tieCol`) form a directed
    * item→item transition. The window partitions by user — scalable
    * (state per user, not global). */
  def transitionEdges(events: DataFrame, userCol: Column, tsCol: Column,
                      tieCol: Column, itemCol: Column): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    events
      .select(itemCol.as("src"), lead(itemCol, 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
  }

  /** PageRank over the event-transition graph: items are
    * `props.k`, edges are consecutive events per user. */
  def overEventTransitions(events: DataFrame, iters: Int = 5): DataFrame =
    run(
      transitionEdges(events, col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long")),
      iters)

  /** DuckDB replay over `events(event_id, ts, user_id, props)`:
    * unrolled integer rounds, `//` == Spark's `div` on non-negative
    * BIGINTs. */
  object Sql {
    private def round(prev: String, next: String): String =
      s"""$next AS (
         |  SELECT n.node, CAST($TeleportBase +
         |      (COALESCE(m.inmass, 0) * 17) // 20 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(p.pr // o.outdeg) AS inmass
         |    FROM edges e
         |    JOIN $prev p ON p.node = e.src
         |    JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst) m ON m.dst = n.node)"""
        .stripMargin

    def query(iters: Int = 5): String = {
      val rounds = (1 to iters)
        .map(i => round(s"pr${i - 1}", s"pr$i")).mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events),
         |tr AS (
         |  SELECT item AS src, lead(item) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM ev),
         |edges AS (SELECT src, dst FROM tr WHERE dst IS NOT NULL),
         |outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |pr0 AS (SELECT node, CAST($InitMass AS BIGINT) AS pr FROM nodes),
         |$rounds
         |SELECT p.node, COALESCE(o.outdeg, 0) AS outdeg, p.pr AS rank_fp
         |FROM pr$iters p LEFT JOIN outd o ON o.src = p.node""".stripMargin
    }
  }
}
