package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: score an ANN index's answer lists
  * against exact brute-force ground truth — the accept/reject gate for
  * every approximate index before it serves ([[Similarity.lshTopKAnchored]],
  * [[Similarity.ivfTopKAnchored]], IVF-PQ, ...).
  *
  * Metrics are integer-exact on purpose (driver-oracle discipline):
  * reciprocal rank as 1e6 div rank (MRR = avg over queries downstream),
  * overlap count instead of a recall ratio (recall@k = n_overlap / k).
  * Both inputs are (query_id, neighbor_id, rank, ...) as produced by the
  * TopK aggregate, so the whole evaluation is three equi-joins on
  * query-sized tables — the corpus is never touched again.
  */
object RetrievalEval {

  /** Per-query evaluation rows: (query_id, true_top1, found_rank,
    * rr_ppm, n_overlap) where found_rank is the ANN rank of the TRUE
    * nearest neighbor (-1 when the index missed it), rr_ppm =
    * floor(1e6 / found_rank) (0 on a miss), and n_overlap =
    * |ann top-k  ∩  true top-k|. */
  def perQuery(ann: DataFrame, truth: DataFrame): DataFrame = {
    val top1 = truth.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("true_top1"))
    val found = ann.select(col("query_id"),
      col("neighbor_id").as("true_top1"), col("rank").as("__fr"))
    val overlap = ann.select(col("query_id"), col("neighbor_id"))
      .join(truth.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_overlap"))
    top1
      .join(found, Seq("query_id", "true_top1"), "left")
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), col("true_top1"),
        coalesce(col("__fr").cast("long"), lit(-1L)).as("found_rank"),
        when(col("__fr").isNotNull,
          expr("1000000L div cast(__fr as bigint)"))
          .otherwise(lit(0L)).as("rr_ppm"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }
}
