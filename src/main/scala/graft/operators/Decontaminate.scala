package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find corpus documents sharing word
  * n-grams with an evaluation/benchmark set, the standard train-set
  * hygiene pass of an LLM data pipeline (n-gram overlap against eval
  * prompts; production pipelines use n≈8-13).
  *
  * Scale shape: the eval set is tiny relative to the corpus (thousands
  * of prompts vs billions of documents), so its distinct shingles are
  * BROADCAST — the corpus is scanned once, shingled once post-exchange,
  * and matches resolve map-side; the only corpus-sized shuffle is the
  * final per-doc aggregation of matched rows (already filtered down to
  * actual overlaps, normally a vanishing fraction of the corpus).
  */
object Decontaminate {

  /** Overlap stats per contaminated corpus doc: `n_shared` distinct
    * shared n-grams and `n_eval_hit` distinct eval docs sharing at
    * least one. Docs with no overlap are absent (the common case —
    * emitting them would make the output corpus-sized). */
  def ngramOverlap(corpus: DataFrame, evalSet: DataFrame,
                   textCol: Column, idCol: Column,
                   evalTextCol: Column, evalIdCol: Column,
                   n: Int): DataFrame = {
    // shuffle RAW corpus rows before the shingle HOF (single-row-group
    // parquet would otherwise run it on one task), then keep only
    // (doc_id, gram) — the text is dead weight past this point
    val cs = corpus
      .select(idCol.as("doc_id"), textCol.as("__text"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(Dedup.shingles(col("__text"), n)).as("gram"))
    val es = evalSet
      .select(evalIdCol.as("eval_id"), evalTextCol.as("__text"))
      .select(col("eval_id"),
        explode(Dedup.shingles(col("__text"), n)).as("gram"))
      .distinct()
    cs.join(broadcast(es), "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_hit"))
  }
}
