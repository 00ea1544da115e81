package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet,
  * Meunier, AofA 2007) — the industry-standard fixed-state distinct
  * estimator, complementing the repo's KMV (k minimum values) family:
  * HLL state is m = 2^p registers of one byte each (here p = 8,
  * m = 256), mergeable by register-wise MAX, so it composes across
  * groups, partitions, and stream micro-batches for free.
  *
  * Determinism / oracle exactness (the repo contract): everything is
  * md5-derived integer arithmetic —
  *
  *  - bucket  = first 8 md5 hex chars' top byte (hex[1..2]), 0..255;
  *  - rank    = leading zeros of the NEXT 32 bits + 1 (computed as
  *    33 - bit_length(v) via `length(bin(v))`, which both engines
  *    implement identically for non-negative integers; v = 0 ranks 33);
  *  - registers = max(rank) per (group, bucket) — at most 256 rows per
  *    group no matter the input volume;
  *  - the harmonic sum is EXACT integer: S40 = sum(2^(40 - M_j)) with
  *    absent buckets contributing 2^40 (M = 0), max 256 * 2^40 < 2^49;
  *  - estimate = C DIV S40 with C = floor(alpha_256 * m^2 * 2^40 / 1e6)
  *    a fixed BIGINT constant (alpha_256 = 0.7213/(1 + 1.079/256)
  *    pinned as 718273 ppm) — one integer division, bit-identical in
  *    any engine.
  *
  * The small-range linear-counting correction (m * ln(m/V)) IS
  * applied — through a PINNED integer table, not a runtime ln():
  * ln(m/V) for V = 1..m is precomputed once (StrictMath, e6-scaled)
  * and embedded as LITERALS in both the Spark plan and the oracle SQL,
  * so the correction is a table lookup + one truncating division —
  * hash-exact by construction, no libm in either engine's plan. The
  * raw `est_hll` and `v_zero` stay emitted next to the corrected
  * `est_distinct` so the branch is auditable (at 150 true distinct:
  * raw 267, corrected 156).
  *
  * Scale shape: one explode-free scan -> groupBy (group, bucket) MAX
  * (map-side combining to <= 256 partials per group per task) ->
  * per-group fold over <= 256 rows. The sketch never carries the
  * distinct-key cardinality anywhere — that is its entire point vs
  * exact countDistinct, whose shuffle is key-domain-sized.
  */
object Hll {

  val P = 8
  val M = 1 << P // 256 registers
  val MaxRank = 33L

  /** floor(alpha_256 * m^2 * 2^40 / 1e6) with alpha pinned at 718273
    * ppm — the whole numerator as one BIGINT constant. */
  val EstNumerator: Long =
    ((BigInt(718273) * M * M * (BigInt(1) << 40)) / 1000000).toLong

  /** ln(m/V) * 1e6 for V = 0..m, pinned once (StrictMath for bit-stable
    * generation) and embedded as literals on BOTH engines — the
    * linear-counting branch never calls a runtime ln. Index 0 unused. */
  val LnTableE6: IndexedSeq[Long] =
    IndexedSeq.tabulate(M + 1)(v =>
      if (v == 0) 0L
      else math.round(StrictMath.log(M.toDouble / v) * 1e6))

  /** Raw-estimate ceiling below which linear counting applies
    * (the HLL paper's 5/2 * m). */
  val LcThreshold: Long = 5L * M / 2

  /** (bucket, rank) columns for a term. */
  def bucketOf(term: Column): Column =
    graft.expressions.Md5Hex(term, 1, 2)

  def rankOf(term: Column): Column = {
    val v = graft.expressions.Md5Hex(term, 3, 8)
    when(v === 0, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(v)).cast("long"))
  }

  /** Register table: (group, bucket, r) with r = max rank; <= m rows
    * per group. Mergeable by further MAX — the stream-state shape. */
  def registers(df: DataFrame, groupCol: Column, termCol: Column): DataFrame =
    df.select(groupCol.as("group"), termCol.as("__t"))
      .select(col("group"), bucketOf(col("__t")).as("bucket"),
        rankOf(col("__t")).as("r"))
      .groupBy(col("group"), col("bucket"))
      .agg(max(col("r")).as("r"))

  /** Fold a register table into per-group
    * (v_zero, s40, est_hll, est_distinct). */
  def estimateFromRegisters(regs: DataFrame): DataFrame = {
    val lnArr = array(LnTableE6.map(lit(_)): _*)
    regs.groupBy(col("group"))
      .agg(count(lit(1)).as("__nb"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - r AS INT))"))
          .as("__s_present"))
      .select(col("group"),
        (lit(M.toLong) - col("__nb")).as("v_zero"),
        (col("__s_present") +
          (lit(M.toLong) - col("__nb")) * lit(1L << 40)).as("s40"))
      .withColumn("est_hll", expr(s"$EstNumerator DIV s40"))
      // truncating div via double is exact here: the product is <=
      // 256 * 5,545,177 < 2^31 (double-exact), and integer/1e6
      // quotients sit at least 1e-6 away from any integer they don't
      // equal, far beyond the 1-ulp division error
      .withColumn("est_distinct",
        when(col("v_zero") > 0 && col("est_hll") <= lit(LcThreshold),
          ((lit(M.toLong) *
            element_at(lnArr, (col("v_zero") + 1).cast("int"))) /
            lit(1000000L)).cast("long"))
          .otherwise(col("est_hll")))
  }

  /** End to end: per-group HLL estimate next to the exact distinct
    * count (the verification column — the sketch is the scale path,
    * the exact count is corpus-checkable at test SF). */
  def estimateWithExact(df: DataFrame, groupCol: Column,
                        termCol: Column): DataFrame = {
    val est = estimateFromRegisters(registers(df, groupCol, termCol))
    val exact = df.select(groupCol.as("group"), termCol.as("__t"))
      .groupBy(col("group"))
      .agg(countDistinct(col("__t")).as("n_exact"))
    exact.join(est, "group")
      .select(col("group"), col("n_exact"), col("v_zero"), col("s40"),
        col("est_hll"), col("est_distinct"))
  }

  /** DuckDB replay over any (group, term) relation; `outName` is the
    * emitted group-column alias (must match the Spark side). */
  object Sql {
    def query(rel: String, groupExpr: String, termExpr: String,
              outName: String = "group_id"): String =
      s"""WITH h AS (
         |  SELECT $groupExpr AS grp, md5($termExpr) AS hx
         |  FROM $rel),
         |br AS (
         |  SELECT grp,
         |    ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
         |    CASE WHEN ('0x' || substr(hx, 3, 8))::BIGINT = 0 THEN 33
         |         ELSE 33 - length(bin(('0x' || substr(hx, 3, 8))::BIGINT))
         |    END AS r
         |  FROM h),
         |regs AS (
         |  SELECT grp, bucket, max(r) AS r FROM br GROUP BY 1, 2),
         |f AS (
         |  SELECT grp, CAST(count(*) AS BIGINT) AS nb,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(40 - r AS INT))
         |      AS BIGINT) AS sp
         |  FROM regs GROUP BY 1),
         |e AS (
         |  SELECT grp, 256 - nb AS v_zero,
         |    sp + (256 - nb) * (CAST(1 AS BIGINT) << 40) AS s40
         |  FROM f),
         |e2 AS (
         |  SELECT grp, v_zero, s40, $EstNumerator // s40 AS est_hll
         |  FROM e),
         |x AS (
         |  SELECT $groupExpr AS grp,
         |    CAST(count(DISTINCT $termExpr) AS BIGINT) AS n_exact
         |  FROM $rel GROUP BY 1)
         |SELECT x.grp AS $outName, x.n_exact, e2.v_zero, e2.s40,
         |  e2.est_hll,
         |  CAST(CASE WHEN e2.v_zero > 0 AND e2.est_hll <= $LcThreshold
         |    THEN (256 * (${LnTableE6.mkString("[", ", ", "]")}
         |      )[e2.v_zero + 1]) // 1000000
         |    ELSE e2.est_hll END AS BIGINT) AS est_distinct
         |FROM x JOIN e2 USING (grp)""".stripMargin
  }
}
