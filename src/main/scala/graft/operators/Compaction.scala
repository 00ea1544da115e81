package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the maintenance pass a 100 TB
  * lakehouse runs between rewrites: given the table's FILE MANIFEST
  * (one metadata row per data file), group under-sized files into
  * target-sized rewrite bins so a later pass can coalesce each bin
  * with one sequential read (reference analogue: the shard-sizing
  * concern of dataset_grouper's sharded TFRecord output,
  * `dataset_grouper/core.py:105-151` — shard count is fixed up front
  * there; this operator plans the re-shard AFTER sizes are known).
  *
  * Bin rule — deterministic sequential fill: files ordered by
  * (bytes DESC, file_id) are laid end-to-end and each file's bin is
  * `start_offset DIV target`. Consequences the spec pins down:
  *  - a file >= target starts at a bin boundary multiple of its own
  *    making and never shares: every bin holding >1 file has
  *    total < target + its largest member (the straddle bound);
  *  - descending order puts the oversized files first (each claiming
  *    its own bin span) and packs the small-file tail densely;
  *  - the rule is a pure function of the manifest — any engine
  *    replays the plan exactly (window sum + integer division).
  *
  * Scale shape: the window runs over METADATA (one row per file —
  * ~10^6 rows for 100 TB at 128 MB/file), not the corpus; a
  * single-task ordered window over a million 16-byte rows is
  * milliseconds and is the standard planner shape. The corpus itself
  * is never read: planning consumes sizes the writer already logged
  * (or one `ls -l` of the table dir).
  */
object Compaction {

  /** Input manifest plus (start, bin): `start` is the exclusive
    * running byte offset in (bytes DESC, file_id) order, `bin` is
    * `start DIV targetBytes`. */
  def assignBins(manifest: DataFrame, fileId: String, bytes: String,
                 targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be > 0")
    val w = Window.orderBy(col(bytes).desc, col(fileId))
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .select(col(fileId).as("file_id"), col(bytes).cast("long").as("n_bytes"))
      .withColumn("start", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"start DIV $targetBytes").cast("int"))
  }

  /** The per-bin rewrite plan: how many files each output task
    * coalesces and the byte envelope it will read. */
  def plan(manifest: DataFrame, fileId: String, bytes: String,
           targetBytes: Long): DataFrame =
    assignBins(manifest, fileId, bytes, targetBytes)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_file_bytes"),
        min(col("n_bytes")).as("min_file_bytes"))
}
