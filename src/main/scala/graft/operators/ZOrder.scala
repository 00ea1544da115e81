package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout — the clustering step a
  * 100 TB lakehouse runs so file-level min/max statistics prune scans
  * on TWO predicate columns at once: interleave the bits of both
  * dimensions into one sort key, range-partition on it, and every file
  * ends up covering a small axis-aligned rectangle of (a, b) space
  * (a linear sort key clusters only its leading column; Morton order
  * bounds BOTH widths per file, which is what makes `WHERE a=… AND
  * b=…` skip ~all files).
  *
  * Determinism: the z-value is pure integer bit-interleaving (no
  * sampling, no hashing), and the file-group cuts come from
  * [[SortedExport.assignShards]]'s exact percentiles — identical input
  * yields identical file membership, replayable by any engine.
  *
  * Scale shape: z-value is a per-row integer expression (codegen'd, no
  * shuffle); group assignment is one bounded percentile aggregation +
  * a pure scan (see SortedExport); the manifest aggregates on the
  * group id only. Nothing in the topology is corpus-quadratic or
  * driver-bound. For unbounded key cardinality swap
  * `approx_percentile` exactly as in SortedExport.
  */
object ZOrder {

  /** Morton key of the low `bits` bits of two non-negative integral
    * dims: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Dims are taken mod 2^bits so the key is total on any input;
    * callers pick `bits` to cover their real cardinality. Built from
    * shift/mask ops both Spark and DuckDB evaluate identically on
    * longs. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val am = pmod(a.cast("long"), lit(1L << bits))
    val bm = pmod(b.cast("long"), lit(1L << bits))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)),
          2 * i + 1))
        .bitwiseOR(shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)),
          2 * i))
    }
  }

  /** Plan a z-ordered file layout: assign every row to one of `nFiles`
    * groups by exact-percentile cuts of the Morton key, and emit the
    * per-file manifest a scan planner would keep — row count, z range,
    * and the min/max of EACH dimension (the file-skipping stats; their
    * per-file tightness is the whole point of the layout). */
  def layout(df: DataFrame, dimA: String, dimB: String, bits: Int,
             nFiles: Int, exact: Boolean = true): DataFrame = {
    val z = df.withColumn("__z", zValue(col(dimA), col(dimB), bits))
    SortedExport.assignShards(z, "__z", nFiles, exact)
      .groupBy(col("shard").as("file_group"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__z")).as("z_min"), max(col("__z")).as("z_max"),
        min(col(dimA)).as("a_min"), max(col(dimA)).as("a_max"),
        min(col(dimB)).as("b_min"), max(col(dimB)).as("b_max"))
  }

  /** INCREMENTAL layout maintenance — the top-up plan that keeps a
    * z-ordered 100 TB table clustered without rewriting it: a DELTA
    * batch is assigned to the EXISTING file groups using the stored
    * manifest's realized z maxima as cuts (group = count of maxima
    * the delta z exceeds, so every delta row lands in the group whose
    * z range it extends least — the base is NEVER re-laid-out or even
    * re-read), and each group reports its base/delta mix plus a
    * rewrite flag once the delta share crosses `rewritePpm`. Only
    * flagged groups get re-sorted on the next maintenance pass; the
    * rest absorb their deltas as-is. Cuts are a bounded driver
    * collect of the (nFiles-row) manifest; the delta pass is one scan
    * + one group-id aggregation.
    *
    * Output per group: (file_group, n_base, n_delta, delta_ppm,
    * needs_rewrite), every group present even with zero delta. */
  def incrementalPlan(baseManifest: DataFrame, delta: DataFrame,
                      dimA: String, dimB: String, bits: Int,
                      rewritePpm: Long = 200000L): DataFrame = {
    val m = baseManifest
      .select(col("file_group").cast("int"), col("n_rows"), col("z_max"))
      .collect().sortBy(_.getInt(0)) // bounded: nFiles rows
    val cuts = m.dropRight(1).map(_.getLong(2))
    val zc = zValue(col(dimA), col(dimB), bits)
    val grp = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(zc > lit(c), 1).otherwise(0)
    }
    val dcounts = delta.groupBy(grp.as("file_group"))
      .agg(count(lit(1)).as("n_delta"))
    val spark = delta.sparkSession
    import spark.implicits._
    val baseRows = m.map(r => (r.getInt(0), r.getLong(1))).toSeq
      .toDF("file_group", "n_base")
    baseRows.join(dcounts, Seq("file_group"), "left")
      .select(col("file_group"), col("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"))
      .withColumn("delta_ppm",
        expr("(n_delta * 1000000) DIV (n_base + n_delta)"))
      .withColumn("needs_rewrite", col("delta_ppm") >= lit(rewritePpm))
  }

  /** Min/max file skipping over a [[layout]] manifest — the planner
    * step the per-file dim stats exist FOR: keep exactly the file
    * groups whose (a, b) bounding rectangle intersects the query box
    * `[aLo, aHi] x [bLo, bHi]`; every dropped group provably contains
    * no matching row (its rectangle misses the box on some axis), so
    * pruning is sound by construction — the spec additionally pins
    * that every matching ROW lives in a kept group. Pure metadata
    * filter: the corpus is untouched, cost is O(nFiles). */
  def prune(manifest: DataFrame, aLo: Long, aHi: Long,
            bLo: Long, bHi: Long): DataFrame =
    manifest.filter(
      !(col("a_max") < lit(aLo) || col("a_min") > lit(aHi) ||
        col("b_max") < lit(bLo) || col("b_min") > lit(bHi)))
}
