package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Targeted corpus deletion — the right-to-be-forgotten / takedown
  * operation every governed 100 TB corpus runs on a schedule: remove
  * the rows named by a (tiny) delete-request list and emit the audit a
  * compliance pipeline needs to prove the rewrite did what it claimed.
  *
  * Scale shape: the delete list is per-request (thousands of keys vs
  * billions of rows), so it BROADCASTS into one marker join — the
  * corpus is scanned once and never shuffled on the key; the audit is
  * one map-combined aggregation over the marked rows. The physical
  * rewrite (writing the kept rows back out) is the same kept-side
  * filter feeding any writer — the audit digest is what a verifier
  * re-computes over the rewritten files to certify no survivor was
  * dropped and no target survived.
  *
  * Determinism / oracle exactness: every output is an exact integer —
  * counts, and an ORDER-INDEPENDENT survivor digest (the exact sum of
  * u32(md5(key)) over kept rows, the repo's md5 idiom), so any engine
  * replays the audit bit for bit.
  */
object Retention {

  /** Per-`group` deletion audit of `corpus` against `deletes` (a
    * one-column key frame): (group, n_kept, n_deleted, kept_hash). */
  def deleteAudit(corpus: DataFrame, deletes: DataFrame,
                  key: Column, group: Column): DataFrame = {
    val marked = corpus
      .select(group.as("group"), key.as("__k"))
      .join(broadcast(deletes.select(key.as("__k"),
        lit(true).as("__del"))), Seq("__k"), "left_outer")
    val u32 = conv(substring(md5(col("__k").cast("string")), 1, 8), 16, 10)
      .cast("long")
    marked.groupBy(col("group"))
      .agg(
        count(when(col("__del").isNull, 1)).as("n_kept"),
        count(col("__del")).as("n_deleted"),
        coalesce(sum(when(col("__del").isNull, u32)), lit(0L))
          .as("kept_hash"))
  }

  /** The survivor rows themselves (broadcast LEFT ANTI — the frame a
    * physical rewrite persists; [[deleteAudit]]'s kept side must agree
    * with a digest recomputed over this). */
  def survivors(corpus: DataFrame, deletes: DataFrame,
                key: Column): DataFrame =
    corpus.join(broadcast(deletes.select(key.as("__k"))),
      key === col("__k"), "left_anti")
}
