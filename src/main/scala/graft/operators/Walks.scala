package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Kmv

/** Deterministic random walks over an item graph — the corpus
  * generator for graph-embedding training (DeepWalk/node2vec style:
  * walk sequences become "sentences" a skip-gram model trains on).
  * Randomness is an md5-uniform of (walk, step), so the walk corpus is
  * reproducible under repartitioning and every hop replays exactly in
  * SQL — the whole generator carries an exact oracle, which sampled
  * `rand()` walks cannot.
  *
  * Topology per step: ONE equi-join of the walk frontier against the
  * rank-indexed adjacency (src, rank -> dst), with the chosen rank
  * computed as u32(md5(walk:step)) % outdeg — no per-node sampling
  * state, no driver loop over nodes. k steps = k joins, the same
  * unrolled-iteration shape as [[PageRank.run]]; adjacency ranks come
  * from a per-src window (bounded by out-degree, never a global
  * sort). Sinks self-terminate: a frontier row with no out-edges
  * keeps its node and stops accumulating hops.
  *
  * Multi-edges collapse to DISTINCT adjacency (uniform over distinct
  * successors); a weighted variant would rank over edge multiplicity
  * instead — same topology. */
object Walks {

  /** One walk per distinct node of `edges` (src, dst), `steps` hops.
    * Output: (walk_id, path, end_node, n_hops). */
  def uniformWalks(edges: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val w = Window.partitionBy(col("src")).orderBy(col("dst"))
    val adj = edges.select(col("src"), col("dst")).distinct()
      .select(col("src"), col("dst"),
        (row_number().over(w) - 1).as("rk"),
        count(lit(1)).over(Window.partitionBy(col("src"))).as("outdeg"))
      .localCheckpoint() // k consumers: one join per step
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    var walks = nodes.select(col("node").as("walk_id"),
      col("node").as("cur"), col("node").cast("string").as("path"),
      lit(0).as("hops"))
    (1 to steps).foreach { i =>
      val pick = pmod(Kmv.u32(concat(col("walk_id").cast("string"),
        lit(s":$i"))), col("outdeg"))
      walks = walks.join(adj,
          col("cur") === col("src") && col("rk") === pick, "left")
        .select(col("walk_id"),
          coalesce(col("dst"), col("cur")).as("cur"),
          when(col("dst").isNull, col("path"))
            .otherwise(concat(col("path"), lit("->"),
              col("dst").cast("string"))).as("path"),
          (col("hops") + when(col("dst").isNull, 0).otherwise(1))
            .as("hops"))
    }
    walks.select(col("walk_id"), col("path"),
      col("cur").as("end_node"), col("hops").cast("long").as("n_hops"))
  }

  /** Walks over the event item-transition graph (the
    * [[PageRank.overEventTransitions]] graph). */
  def overEventTransitions(events: DataFrame, steps: Int): DataFrame =
    uniformWalks(
      PageRank.transitionEdges(events, col("user_id"), col("ts"),
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long")),
      steps)

  /** DuckDB replay: same transition graph, same rank-indexed
    * adjacency, the md5 pick unrolled per step. */
  object Sql {
    // NOTE: this text is re-interpolated into a string that applies
    // its own stripMargin — no line here may start with (whitespace +)
    // '|', or the outer stripMargin eats one bar of a '||' concat
    private def step(i: Int, prev: String, next: String): String =
      s"""$next AS (
         |  SELECT w.walk_id,
         |    COALESCE(a.dst, w.cur) AS cur,
         |    CASE WHEN a.dst IS NULL THEN w.path
         |      ELSE w.path || '->' || a.dst::VARCHAR END AS path,
         |    w.hops + CASE WHEN a.dst IS NULL THEN 0 ELSE 1 END AS hops
         |  FROM $prev w LEFT JOIN adj a ON a.src = w.cur
         |    AND a.rk = ('0x' || substr(md5(w.walk_id::VARCHAR ||
         |      ':$i'), 1, 8))::BIGINT % a.outdeg)""".stripMargin

    def query(steps: Int): String = {
      val rounds = (1 to steps)
        .map(i => step(i, s"w${i - 1}", s"w$i")).mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events),
         |tr AS (
         |  SELECT item AS src, lead(item) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id) AS dst
         |  FROM ev),
         |edges AS (SELECT DISTINCT src, dst FROM tr
         |          WHERE dst IS NOT NULL),
         |adj AS (
         |  SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY dst) - 1
         |      AS rk,
         |    count(*) OVER (PARTITION BY src) AS outdeg
         |  FROM edges),
         |nodes AS (SELECT src AS node FROM edges
         |          UNION SELECT dst FROM edges),
         |w0 AS (SELECT node AS walk_id, node AS cur,
         |       node::VARCHAR AS path, 0 AS hops FROM nodes),
         |$rounds
         |SELECT walk_id, path, cur AS end_node,
         |  CAST(hops AS BIGINT) AS n_hops
         |FROM w$steps""".stripMargin
    }
  }
}
