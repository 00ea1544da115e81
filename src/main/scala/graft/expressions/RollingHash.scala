package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Rabin-Karp rolling-hash fingerprints of every OVERLAPPING w-token
  * window in a token-hash array: output(i) = polynomial hash of tokens
  * [i, i+w) — H(i) = sum_j h(i+j) * B^(w-1-j) mod M — computed with the
  * O(1)-per-step rolling update (drop the outgoing term, shift, add the
  * incoming token), so the whole array costs O(n) instead of the
  * O(n*w) a per-window HOF recompute would pay.
  *
  * Inputs must already be reduced mod M (see `Dedup.spanTokenHash*`).
  * M = 2^31-1 keeps every intermediate product inside a signed long:
  * drop-term h*B^(w-1) < M^2 ~ 4.6e18 < 2^63; the shifted remainder
  * |(H - drop)| * B + h < 2*M*131 + M. The direct polynomial form is
  * what the DuckDB oracle replays (list comprehension over a
  * precomputed power list, same integer arithmetic — bit-exact), and
  * rolling == direct is pinned in spec.
  *
  * CodegenFallback like [[WordShingles]]: one virtual dispatch per row,
  * the loop body is already JVM-compiled.
  */
case class RollingWindowHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback with Serializable {

  require(w >= 1, s"window size must be >= 1, got $w")

  import RollingWindowHashes.{B, M}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_window_hashes needs array<long>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // B^(w-1) mod M — the outgoing token's positional weight
  private val bw: Long = {
    var p = 1L
    var i = 1
    while (i < w) { p = p * B % M; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var h = 0L
    var i = 0
    while (i < w) {
      h = (h * B + a.getLong(i)) % M
      i += 1
    }
    out(0) = h
    while (i < n) {
      val drop = a.getLong(i - w) * bw % M
      h = Math.floorMod((h - drop) * B + a.getLong(i), M)
      i += 1
      out(i - w) = h
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

object RollingWindowHashes {
  /** Polynomial base / modulus (Mersenne 2^31-1); shared with the
    * DuckDB oracle replay. */
  val B = 131L
  val M = 2147483647L

  def apply(tokenHashes: Column, w: Int): Column =
    GraftSql.column(RollingWindowHashes(GraftSql.expression(tokenHashes), w))

  /** Positional weights B^(w-1-j) mod M for j = 0..w-1 — used to build
    * the oracle's direct-polynomial replay (and the spec's driver-side
    * recompute). */
  def powers(w: Int): Seq[Long] =
    Iterator.iterate(1L)(p => p * B % M).take(w).toSeq.reverse
}
