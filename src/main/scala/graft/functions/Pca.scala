package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Top-principal-direction extraction by INTEGER power iteration — the
  * PCA/whitening family's workhorse (embedding decorrelation, drift
  * axes, Matryoshka-style truncation diagnostics), built so the trained
  * direction replays bit-for-bit in SQL like the repo's other trained
  * artifacts (the `similarity_ivf_lloyd` recipe applied to a matvec):
  *
  *  - lanes quantize to `floor(x * scale)` BIGINTs (the
  *    `Pq.fitLloydQuantized` move), centering subtracts the
  *    floor-divided lane mean — everything after the one initial floor
  *    is exact integer arithmetic;
  *  - each power step is ONE corpus scan: dot_i = c_i . v evaluated
  *    once per row in the projection feeding a posexplode, so the
  *    O(dim) dot never inlines into a per-lane lambda (the
  *    CollapseProject hazard), and w_j = sum_i c_ij * dot_i map-side
  *    combines onto `dim` keys — a ~KB shuffle regardless of corpus
  *    size;
  *  - the per-step renormalization v_j = w_j * scale // max|w| runs on
  *    the DRIVER over the dim-bounded w vector (BigInt; truncating
  *    division — DuckDB's `//` and Spark's DIV both truncate toward
  *    zero), then inlines into the next step's plan as literals,
  *    exactly like the IVF centroid batteries.
  *
  * Overflow headroom: |c| <= 2*scale, |v| <= scale, so |dot| <=
  * dim * 2 * scale^2 and each product |c * dot| <= dim * 4 * scale^3
  * (2^32 at the defaults) — the row-sum stays inside BIGINT up to
  * ~2^30 rows per aggregation; larger corpora drop `scale` a notch.
  */
object Pca {

  /** Lanes are UNROLLED into static expressions up to this dim:
    * higher-order functions (transform/zip_with/aggregate) run
    * INTERPRETED in Spark, and the 3-scan matvec spends its whole
    * budget in lambda eval (measured 95s over 1M x 64 HOF vs unrolled
    * whole-stage codegen); past ~128 terms the generated method nears
    * Janino's 64KB limit, so wider vectors fall back to HOFs. */
  private val UnrollMax = 128

  /** The quantized-lane projection shared by train and apply. */
  private def quant(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** One quantized centered lane as a static (codegen'd) expression. */
  private def qcLane(vec: Column, j: Int, scale: Int, m: Long): Column =
    floor(element_at(vec, j + 1).cast("double") * scale).cast("long") -
      lit(m)

  /** Centered row dot a constant vector — unrolled when dim allows. */
  private def dotConst(vec: Column, dim: Int, scale: Int,
                       mean: Array[Long], v: Array[Long]): Column =
    if (dim <= UnrollMax)
      (0 until dim).map(j => qcLane(vec, j, scale, mean(j)) * lit(v(j)))
        .reduce(_ + _)
    else
      aggregate(
        zip_with(
          zip_with(quant(vec, scale), array(mean.map(lit(_)): _*),
            (a, b) => a - b),
          array(v.map(lit(_)): _*), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)

  /** Centered lanes as an array Column — unrolled when dim allows. */
  private def centeredArr(vec: Column, dim: Int, scale: Int,
                          mean: Array[Long]): Column =
    if (dim <= UnrollMax)
      array((0 until dim).map(j => qcLane(vec, j, scale, mean(j))): _*)
    else
      zip_with(quant(vec, scale), array(mean.map(lit(_)): _*),
        (a, b) => a - b)

  /** Lane means of the quantized matrix, floor-divided (driver-bounded:
    * `dim` values). */
  def laneMeans(df: DataFrame, vecCol: Column, dim: Int,
                scale: Int = 256): Array[Long] = {
    // explode the RAW array and quantize the exploded scalar: the
    // floor/cast then runs codegen'd per element instead of inside an
    // interpreted transform lambda
    val sums = df.select(posexplode(vecCol))
      .groupBy(col("pos")).agg(
        sum(floor(col("col").cast("double") * scale).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .orderBy(col("pos")).collect()
    require(sums.length == dim, s"expected $dim lanes, saw ${sums.length}")
    // Long `/` truncates toward zero = DuckDB `//` = Spark DIV
    sums.map(r => r.getAs[Long]("s") / r.getAs[Long]("n"))
  }

  /** Run `iters` integer power steps; returns the final direction as
    * `dim` integers in [-scale, scale] (sign fixed by the all-ones
    * seed). Each step is one scan + a dim-key aggregation. */
  def topComponentInt(df: DataFrame, vecCol: Column, dim: Int,
                      scale: Int = 256, iters: Int = 3): Array[Long] =
    topComponentWithMean(df, vecCol, dim, scale, iters,
      laneMeans(df, vecCol, dim, scale))

  /** [[topComponentInt]] with precomputed lane means — callers that
    * already ran [[laneMeans]] (the deflation chain) skip the duplicate
    * corpus scan. */
  private[graft] def topComponentWithMean(df: DataFrame, vecCol: Column,
                                          dim: Int, scale: Int, iters: Int,
                                          mean: Array[Long]): Array[Long] = {
    require(iters >= 1 && dim >= 1 && scale >= 2)
    val qc = centeredPersisted(df, vecCol, dim, scale, mean)
    try powerLoopPersisted(qc, dim, scale, iters, decimalAcc = false, "")
    finally qc.unpersist(blocking = false)
  }

  /** The quantized centered lane ARRAY, staged once and PERSISTED
    * (MEMORY_AND_DISK): every power step used to re-derive the lanes
    * from the raw vectors — iters scans of the base table per
    * component, each re-evaluating the floor/center chain per lane —
    * where one corpus-sized materialization serves all of them (at
    * 100 TB: one write per train instead of `iters` full re-reads;
    * locally: the per-step plan collapses from the 64-term qcLane
    * battery to `element_at` over a cached attribute). Values are
    * identical integers, so every trained direction replays
    * bit-for-bit as before. Callers MUST unpersist. */
  private def centeredPersisted(df: DataFrame, vecCol: Column, dim: Int,
                                scale: Int, mean: Array[Long]): DataFrame =
    df.select(centeredArr(vecCol, dim, scale, mean).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** `iters` integer power steps over a persisted lane-array column
    * "c": dot with the current direction staged as an attribute below
    * the Generate (the CollapseProject lesson — aliasing it in the
    * posexplode's own select re-evaluates it per exploded lane,
    * measured 166us/row at dim 64), posexplode of the array itself,
    * map-side-combined aggregation onto `dim` keys, driver-side
    * truncating renormalization (BigInt `/` truncates toward zero —
    * exactly DuckDB's `//` and Spark's DIV). `decimalAcc` keeps each
    * caller's historical accumulator type: LONG for the top-component
    * loop, DECIMAL(38,0) for the deflated loops — bit-compatible with
    * the pre-persist implementations. */
  private def powerLoopPersisted(src: DataFrame, dim: Int, scale: Int,
                                 iters: Int, decimalAcc: Boolean,
                                 label: String): Array[Long] = {
    var v = Array.fill(dim)(scale.toLong) // deterministic all-ones seed
    for (_ <- 1 to iters) {
      val dot = persistedDot(dim, v)
      val grouped = src.select(dot.as("d"), col("c"))
        .select(col("d"), posexplode(col("c")))
        .groupBy(col("pos"))
      val agg =
        if (decimalAcc)
          grouped.agg(sum((col("col") * col("d")).cast("decimal(38,0)"))
            .as("w"))
        else grouped.agg(sum(col("col") * col("d")).as("w"))
      val rows = agg.orderBy(col("pos")).collect()
      val w: Array[BigInt] =
        if (decimalAcc) rows.map(r => BigInt(r.getDecimal(1).toBigInteger))
        else rows.map(r => BigInt(r.getAs[Long]("w")))
      require(w.length == dim)
      val maxAbs = w.map(_.abs).max
      require(maxAbs > 0,
        s"${label}power iteration collapsed to the zero vector")
      v = w.map(x => ((x * scale) / maxAbs).toLong)
    }
    v
  }

  /** One truncating deflation over a persisted lane-array column "c"
    * (d_j = c_j - (v_j * (c . v)) // |v|^2), returned as a NEW
    * persisted lane-array DataFrame (same column name, so the power
    * loop and further deflations compose) — the k-component deflation
    * step. The projection dot is staged as an attribute so
    * CollapseProject cannot re-inline the dim-term sum per lane.
    * Caller unpersists. */
  private def deflatedPersisted(src: DataFrame, dim: Int,
                                v: Array[Long]): DataFrame = {
    val vsq = v.map(x => x * x).sum
    val deflated =
      if (dim <= UnrollMax)
        array((0 until dim).map(j =>
          element_at(col("c"), j + 1) - divT(lit(v(j)) * col("d"), vsq)): _*)
      else
        zip_with(col("c"), array(v.map(lit(_)): _*),
          (c, vj) => c - divT(vj * col("d"), vsq))
    src.select(persistedDot(dim, v).as("d"), col("c"))
      .select(deflated.as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Persisted-lane-array dot a constant direction — unrolled
    * element_at terms when dim allows, else the zip_with/aggregate HOF
    * fold over the SAME left-to-right op order (identical LONG values;
    * past ~128 unrolled terms the generated method would blow Janino's
    * 64KB limit and silently drop the stage to interpreted eval —
    * ADVICE r10, mirroring [[dotConst]]'s guard). */
  private def persistedDot(dim: Int, v: Array[Long]): Column =
    if (dim <= UnrollMax)
      (0 until dim)
        .map(j => element_at(col("c"), j + 1) * lit(v(j)))
        .reduce(_ + _)
    else
      aggregate(
        zip_with(col("c"), array(v.map(lit(_)): _*), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)

  /** The declared-query surface: (lane, v) rows of the trained
    * direction, plus each input row's integer projection onto it is
    * available via [[projectInt]]. */
  def topComponentTable(df: DataFrame, vecCol: Column, dim: Int,
                        scale: Int = 256, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = topComponentInt(df, vecCol, dim, scale, iters)
    v.zipWithIndex.map { case (x, i) => (i, x) }.toSeq
      .toDF("lane", "v")
  }

  /** Variance explained by the trained direction, in ppm — the
    * integer Rayleigh share: 10^6 * sum_i (c_i . v)^2 divided by
    * |v|^2 * sum_i |c_i|^2 (the |v|^2 factor keeps everything in the
    * same quantized units without a normalization divide). Per-row
    * squares fit LONG (|dot| <= dim * 2 * scale^2); the two corpus
    * sums accumulate as DECIMAL(38,0) — the engine-exact idiom for
    * sums past 2^63 (DuckDB's HUGEINT twin) — and the final ratio is
    * one BigInt truncating division on the driver over the two
    * collected scalars. Output: one row (n_rows, ve_ppm). */
  def varianceExplainedPpm(df: DataFrame, vecCol: Column, dim: Int,
                           scale: Int = 256, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mean = laneMeans(df, vecCol, dim, scale)
    val v = topComponentInt(df, vecCol, dim, scale, iters)
    val dot = dotConst(vecCol, dim, scale, mean, v)
    val rowSq = (0 until dim)
      .map(j => qcLane(vecCol, j, scale, mean(j)))
      .map(c => c * c).reduce(_ + _)
    val agg = df.select((dot * dot).cast("decimal(38,0)").as("n2"),
        rowSq.cast("decimal(38,0)").as("c2"))
      .agg(sum(col("n2")).as("num"), sum(col("c2")).as("den"),
        count(lit(1)).as("n"))
      .head()
    val num = BigInt(agg.getDecimal(0).toBigInteger)
    val den = BigInt(agg.getDecimal(1).toBigInteger)
    val vsq = v.map(x => BigInt(x) * BigInt(x)).sum
    require(den > 0 && vsq > 0, "degenerate corpus or direction")
    val ve = (num * 1000000) / (den * vsq) // truncating = SQL //
    Seq((agg.getLong(2), ve.toLong)).toDF("n_rows", "ve_ppm")
  }

  /** Integer projection of each row onto a trained direction — the
    * apply step (rank-1 compression / drift coordinate). Exact: same
    * quantized centered lanes, same integer dot. */
  def projectInt(df: DataFrame, idCol: Column, vecCol: Column,
                 mean: Array[Long], v: Array[Long],
                 scale: Int = 256): DataFrame =
    df.select(idCol.as("vec_id"),
      dotConst(vecCol, mean.length, scale, mean, v).as("proj"))

  /** Truncating integer division as a Column (toward zero — matches
    * Scala Long `/`, BigInt `/`, Spark DIV and DuckDB `//`): the
    * numerator minus its remainder is exactly divisible, and the
    * double divide is exact below 2^53. */
  private def divT(x: Column, d: Long): Column =
    ((x - (x % lit(d))) / lit(d)).cast("long")

  /** SECOND principal direction by integer DEFLATION. The naive
    * deflation c' = c*|v1|^2 - v1*(c.v1) overflows the quantization
    * budget (|c'| <= 2*scale * dim * scale^2 ~ 2^31 per LANE, and the
    * power step then squares it); the shrink step that keeps
    * everything replayable is a per-lane truncating division by
    * |v1|^2:
    *
    *   d_ij = c_ij - (v1_j * (c_i . v1)) // |v1|^2
    *
    * — i.e. subtract the component-1 projection rounded toward zero.
    * |d| <= |c_ij| + |c_i|_2 (Cauchy-Schwarz on the subtracted term),
    * ~2^13 at the defaults, so the second power iteration's per-row
    * products stay <= ~2^40; the lane aggregation accumulates them as
    * DECIMAL(38,0) (HUGEINT in DuckDB), making the step scale-safe to
    * ~2^86 rows. Truncated deflation is not exactly orthogonal —
    * determinism and exact replay are the contract, and the residual
    * parallel component is O(1/|v1|) of a lane unit.
    *
    * The deflated lane array is persisted once per depth (see
    * [[deflationChain]]) — the power steps re-read the persisted
    * integers instead of re-deriving the lane chain per step.
    */
  /** The shared deflation chain: persisted centered lanes -> v1 ->
    * persisted once-deflated lanes -> v2 [-> persisted twice-deflated
    * lanes -> v3]. ONE code path trains every depth (the second- and
    * third-component trains must produce identical v2 for the chained
    * oracle to replay — a divergence between two copies was exactly
    * the maintenance hazard), and each deflation depth persists its
    * lane array ONCE instead of re-deriving it per power step. The
    * parent level stays persisted until the child level has
    * materialized (the child's first power step), so no step ever
    * falls back to recomputing from the base table. */
  private def deflationChain(df: DataFrame, vecCol: Column, dim: Int,
                             scale: Int, iters: Int,
                             depth: Int): Array[Long] = {
    require(iters >= 1 && dim >= 1 && scale >= 2 && depth >= 1)
    val mean = laneMeans(df, vecCol, dim, scale)
    var lanes = centeredPersisted(df, vecCol, dim, scale, mean)
    try {
      var v = powerLoopPersisted(lanes, dim, scale, iters,
        decimalAcc = false, "")
      for (d <- 2 to depth) {
        val next = deflatedPersisted(lanes, dim, v)
        val label = if (d == 2) "deflated " else "doubly-deflated "
        // the first step over `next` materializes it while the parent
        // is still cached; only then drop the parent. If the power
        // loop throws (zero-vector collapse), `next` must be dropped
        // HERE: the finally below only sees `lanes`, which still
        // points at the parent at that moment (ADVICE r10).
        try {
          v = powerLoopPersisted(next, dim, scale, iters,
            decimalAcc = true, label)
        } catch {
          case t: Throwable =>
            next.unpersist(blocking = false)
            throw t
        }
        lanes.unpersist(blocking = false)
        lanes = next
      }
      v
    } finally lanes.unpersist(blocking = false)
  }

  def secondComponentInt(df: DataFrame, vecCol: Column, dim: Int,
                         scale: Int = 256, iters: Int = 3): Array[Long] =
    deflationChain(df, vecCol, dim, scale, iters, depth = 2)

  /** Declared-query surface for the second component: (lane, v) rows. */
  def secondComponentTable(df: DataFrame, vecCol: Column, dim: Int,
                           scale: Int = 256, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    secondComponentInt(df, vecCol, dim, scale, iters)
      .zipWithIndex.map { case (x, i) => (i, x) }.toSeq
      .toDF("lane", "v")
  }

  /** THIRD principal direction: the [[secondComponentInt]] truncating
    * deflation applied TWICE —
    *
    *   d_ij = c_ij - (v1_j * (c_i . v1)) // |v1|^2     (first shrink)
    *   e_ij = d_ij - (v2_j * (d_i . v2)) // |v2|^2     (second shrink)
    *
    * then power iteration over e. Magnitudes stay replayable:
    * |e| <= |d| + |d|_2 <= (1 + sqrt(dim)) * |d| (Cauchy-Schwarz on
    * the subtracted projection), ~2^16.5 per lane at the defaults, so
    * the third power step's per-row products are <= ~2^47 and the
    * DECIMAL(38,0) lane accumulation stays scale-safe past 2^70 rows.
    * Each truncating shrink leaves an O(1/|v|) residual along the
    * deflated-out direction; the accumulated drift across BOTH
    * deflations is measured against an exactly-orthogonalized double
    * reference in PcaSpec (the bound, not a hope). Each deflation
    * depth persists its lane array once ([[deflationChain]]); dots are
    * staged as attributes below the Generate — the CollapseProject
    * lesson. */
  def thirdComponentInt(df: DataFrame, vecCol: Column, dim: Int,
                        scale: Int = 256, iters: Int = 3): Array[Long] =
    deflationChain(df, vecCol, dim, scale, iters, depth = 3)

  /** Declared-query surface for the third component: (lane, v) rows. */
  def thirdComponentTable(df: DataFrame, vecCol: Column, dim: Int,
                          scale: Int = 256, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    thirdComponentInt(df, vecCol, dim, scale, iters)
      .zipWithIndex.map { case (x, i) => (i, x) }.toSeq
      .toDF("lane", "v")
  }
}
