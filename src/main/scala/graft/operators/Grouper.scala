package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Keying API — the engine's equivalent of the reference's single user
  * extension point `GetKeyFn: Example -> bytes`
  * (dataset_grouper/types.py:31).
  *
  * The reference's shipped partitioners are all reproducible as pure
  * Column expressions, which is the preferred form: a Column key stays
  * inside Catalyst (codegen, pushdown, no serialization wall), while a
  * function key degrades to a Scala UDF only when genuinely needed.
  *
  *  - feature keying (examples/datasets/group_by_feature.py:75-81)
  *    -> [[Grouper.byColumn]]
  *  - URL-host keying for C4 (examples/datasets/group_c4.py:79-83)
  *    -> `byColumn(parse_url(col("url"), "HOST"))`
  *  - uniform random partitioning (examples/datasets/group_randomly.py:75-79)
  *    -> [[Grouper.byRandom]]
  *  - Dirichlet-process label mixture
  *    (examples/datasets/group_by_dirichlet_process.py:130-145)
  *    -> [[Grouper.byDirichlet]]
  */
final case class Grouper(key: Column, name: String = Grouper.GroupCol) {
  /** Attach the group id column (reference 'KeyExamples',
    * beam_transforms.py:103). */
  def keyed(df: DataFrame): DataFrame = df.withColumn(name, key)
}

object Grouper {
  val GroupCol = "group_id"

  /** Key by an arbitrary Column expression (preferred — stays in
    * Catalyst). The key is rendered to string — the convenient form for
    * text sinks and readable group ids; for raw-bytes keys (digests,
    * serialized structs) use [[byBytes]], which preserves the
    * reference's `GetKeyFn -> bytes` contract without UTF-8 mangling. */
  def byExpr(key: Column): Grouper = Grouper(key.cast("string"))

  /** Key by a BINARY Column kept as raw bytes end-to-end — the exact
    * key type of the reference's extension point (`GetKeyFn: Example ->
    * bytes`, dataset_grouper/types.py:31). A string cast here would
    * UTF-8-mangle non-text bytes (a digest or image-bytes key);
    * grouping, packing, and aggregation all operate on BinaryType
    * natively, and only the TEXT sink boundary re-encodes (base64, in
    * [[GroupCounts.formatted]]). */
  def byBytes(key: Column): Grouper = Grouper(key)

  /** Key by an existing column, cast to string (the reference's
    * group-by-feature partitioner casts every dtype to bytes —
    * group_by_feature.py:75-81). */
  def byColumn(colName: String): Grouper = Grouper(col(colName).cast("string"))

  /** Uniform random assignment to `numGroups` synthetic groups with a fixed
    * seed (group_randomly.py:75-79). Deterministic per (seed, row order is
    * irrelevant — rand is per-row). */
  def byRandom(numGroups: Int, seed: Long): Grouper =
    Grouper(concat(lit("group_"),
      floor(rand(seed) * numGroups).cast("long").cast("string")))

  /** Deterministic random assignment derived from a hash of id columns —
    * unlike [[byRandom]] this is reproducible independent of partitioning,
    * which makes it oracle-checkable. */
  def byHashMod(numGroups: Int, idCols: Column*): Grouper =
    Grouper(concat(lit("group_"),
      pmod(xxhash64(idCols: _*), lit(numGroups.toLong)).cast("string")))

  /** [[byHashMod]] twin whose hash is md5 (first 8 hex chars parsed as an
    * unsigned integer) instead of xxhash64 — marginally slower, but md5
    * exists in every SQL engine, so the assignment has an EXACT
    * cross-engine oracle (xxhash64 has no DuckDB twin). Id columns are
    * rendered to strings and joined with '|' before hashing; use it when
    * reproducibility outside Spark matters more than hash throughput. */
  def byMd5Mod(numGroups: Int, idCols: Column*): Grouper = {
    val rendered = concat_ws("|", idCols.map(_.cast("string")): _*)
    val bucket = pmod(
      graft.expressions.Md5Hex.u32(rendered),
      lit(numGroups.toLong))
    Grouper(concat(lit("group_"), bucket.cast("string")))
  }

  /** Dirichlet-process-style group assignment: a label->group probability
    * matrix is sampled ONCE at plan-construction time on the driver (the
    * reference builds it with numpy at pipeline construction,
    * group_by_dirichlet_process.py:130-143, and broadcasts it inside the
    * key fn closure); each row then samples a group from its label's
    * categorical distribution using a per-row uniform draw. Here the
    * matrix becomes a broadcast-joinable literal CASE expression.
    *
    * The per-row uniform draw is derived from xxhash64(idCols, seed) —
    * NOT `rand`: the draw is referenced once per CASE branch, and Rand
    * is nondeterministic, so each branch would see a FRESH value,
    * giving P(group i) = prod_{j<i}(1-c_j)*c_i instead of p_i. A hash
    * draw evaluates to the same value everywhere (matching the
    * reference's single rng.choice(p=pvals) per example) and is
    * reproducible independent of partitioning. */
  /** Driver-side label -> Dirichlet(alpha) probability row, shared by
    * [[byDirichlet]], [[byDirichletMd5]] and [[dirichletOracleSelect]] —
    * the three MUST draw the identical matrix for a given seed. */
  private[graft] def dirichletProbs(labels: Seq[Int], numGroups: Int,
                                    alpha: Double,
                                    seed: Long): Map[Int, Array[Double]] = {
    val rng = new java.util.Random(seed)
    // Driver-side Dirichlet(alpha) sample per label via Gamma draws
    // (Marsaglia-Tsang not needed for test-scale alpha; use the sum-of
    // -exponentials trick for alpha==1, else gamma via Johnk/accept-reject).
    def gamma(a: Double): Double = {
      // Marsaglia–Tsang for a >= 1; boost trick for a < 1.
      if (a < 1.0) {
        val u = rng.nextDouble()
        gamma(a + 1.0) * math.pow(u, 1.0 / a)
      } else {
        val d = a - 1.0 / 3.0
        val c = 1.0 / math.sqrt(9.0 * d)
        var res = 0.0
        var done = false
        while (!done) {
          var x = 0.0; var v = 0.0
          do { x = rng.nextGaussian(); v = 1.0 + c * x } while (v <= 0)
          v = v * v * v
          val u = rng.nextDouble()
          if (u < 1 - 0.0331 * x * x * x * x ||
              math.log(u) < 0.5 * x * x + d * (1 - v + math.log(v))) {
            res = d * v; done = true
          }
        }
        res
      }
    }
    labels.map { l =>
      val g = Array.fill(numGroups)(gamma(alpha))
      val s = g.sum
      l -> g.map(_ / s)
    }.toMap
  }

  /** Shared CASE assembly: per label, cumulative probabilities -> pick
    * the smallest group index whose cumsum exceeds the per-row uniform. */
  private def dirichletAssign(u: Column, labelCol: Column,
                              probs: Map[Int, Array[Double]],
                              numGroups: Int): Grouper = {
    val groupForLabel: Map[Int, Column] = probs.map { case (l, p) =>
      val cum = p.scanLeft(0.0)(_ + _).tail
      // nested CASE over cumulative thresholds
      val c = cum.init.zipWithIndex.foldRight(lit(numGroups - 1)) {
        case ((thr, idx), acc) => when(u < thr, idx).otherwise(acc)
      }
      l -> c
    }
    val assign = groupForLabel.foldLeft(lit(0)) { case (acc, (l, c)) =>
      when(labelCol === l, c).otherwise(acc)
    }
    Grouper(concat(lit("group_"), assign.cast("string")))
  }

  def byDirichlet(labelCol: Column, idCols: Seq[Column], labels: Seq[Int],
                  numGroups: Int, alpha: Double, seed: Long): Grouper = {
    val probs = dirichletProbs(labels, numGroups, alpha, seed)
    // per-row uniform draw at 40-bit hash resolution
    val uScale = 1L << 40
    val u = pmod(xxhash64((idCols :+ lit(seed)): _*), lit(uScale))
      .cast("double") / lit(uScale.toDouble)
    dirichletAssign(u, labelCol, probs, numGroups)
  }

  /** [[byDirichlet]] twin whose per-row uniform is the md5 32-bit
    * fraction of the rendered id (same draw as [[byMd5Mod]]): the whole
    * assignment — matrix, thresholds, uniform — is then exactly
    * reproducible in any engine with md5, via the SQL that
    * [[dirichletOracleSelect]] emits from the SAME probability matrix.
    * Division by 2^32 is exact, and the cumulative thresholds are
    * rendered as exact decimal expansions of the driver doubles, so the
    * CASE branches bit-agree cross-engine. */
  def byDirichletMd5(labelCol: Column, idCol: Column, labels: Seq[Int],
                     numGroups: Int, alpha: Double, seed: Long): Grouper = {
    val probs = dirichletProbs(labels, numGroups, alpha, seed)
    val u = graft.expressions.Md5Hex.u32(idCol.cast("string"))
      .cast("double") / 4294967296.0
    dirichletAssign(u, labelCol, probs, numGroups)
  }

  /** DuckDB SQL expression computing the SAME group id as
    * [[byDirichletMd5]]: `idSql`/`labelSql` are SQL expressions for the
    * id and integer label columns. Thresholds are emitted as exact
    * decimal expansions (BigDecimal.toPlainString) of the driver-sampled
    * doubles — parsing recovers the identical binary64, so the oracle's
    * CASE takes the same branch for every row. */
  def dirichletOracleSelect(idSql: String, labelSql: String,
                            labels: Seq[Int], numGroups: Int, alpha: Double,
                            seed: Long): String = {
    val probs = dirichletProbs(labels, numGroups, alpha, seed)
    val u = s"(('0x' || substr(md5(CAST($idSql AS VARCHAR)), 1, 8))::BIGINT" +
      " / 4294967296.0)"
    def litD(d: Double): String = new java.math.BigDecimal(d).toPlainString
    val labelCases = labels.map { l =>
      val cum = probs(l).scanLeft(0.0)(_ + _).tail
      val inner = cum.init.zipWithIndex.map { case (thr, idx) =>
        s"WHEN $u < ${litD(thr)} THEN $idx"
      }.mkString(" ")
      s"WHEN $labelSql = $l THEN (CASE $inner ELSE ${numGroups - 1} END)"
    }.mkString(" ")
    s"('group_' || CAST((CASE $labelCases ELSE 0 END) AS VARCHAR))"
  }

  /** Escape hatch mirroring the reference's arbitrary-Python keying: a
    * Scala function over the whole row, lifted to a UDF. Slower than a
    * Column key (breaks codegen) — prefer [[byExpr]]. */
  def byUdf(spark: SparkSession, f: Row => String, inputCols: Seq[Column]): Grouper = {
    val u = udf((r: Row) => f(r))
    Grouper(u(struct(inputCols: _*)))
  }
}
