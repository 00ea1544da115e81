package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index of a 2-D point — the xy->d state machine as ONE
  * codegen'd expression (a tight generated loop), replacing the
  * chained-projection formulation that carried (x, y, d) through
  * `bits` stacked Projects: 112 projections per row pushed the stage
  * off whole-stage codegen and ran ~13us/row interpreted (measured
  * 10.5s vs z-order's 2.8s on the same layout query); the loop runs
  * in the nanosecond range like [[DotProduct]].
  *
  * Semantics identical to `Hilbert.xy2d` (spec-pinned): inputs wrap to
  * [0, 2^bits) by non-negative mod; per level s from the top quadrant
  * bits contribute s^2 * ((3*rx) XOR ry) and the lower half-plane
  * reflects + swaps the frame. Null input -> null.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with Serializable {
  require(bits > 0 && bits <= 31, "bits must be in [1, 31]")

  private val side = 1L << bits

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs two longs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = ((a.asInstanceOf[Long] % side) + side) % side
    var y = ((b.asInstanceOf[Long] % side) + side) % side
    var d = 0L
    var s = side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = ((($a) % ${side}L) + ${side}L) % ${side}L;
         |long $y = ((($b) % ${side}L) + ${side}L) % ${side}L;
         |long $d = 0L;
         |for (long $s = ${side >> 1}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-level entry point (casts pushed to the caller's dims). */
  def apply(a: Column, b: Column, bits: Int): Column =
    GraftSql.column(
      HilbertIndex(GraftSql.expression(a), GraftSql.expression(b), bits))
}
