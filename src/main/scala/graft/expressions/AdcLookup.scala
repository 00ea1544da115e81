package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Asymmetric-distance (ADC) table lookup: given a candidate's PQ
  * `codes` (array<int>, one centroid index per subspace) and a query's
  * FLAT distance LUT (array<double>, subspace-major: entry j*k + c is
  * the query's distance to centroid c of subspace j), return
  * sum_j lut[j*k + codes[j]].
  *
  * This replaces the nested `element_at(element_at(lut, j), code+1)`
  * chain, whose per-pair cost was measured to OUTWEIGH ADC's 8x
  * arithmetic advantage over the brute 64-mult dot
  * (STRESS_HYBRID_r09.txt: 23.9s indexed vs 17.7s brute at 200q x 1M)
  * — two levels of array-of-array indirection per subspace per pair,
  * versus this expression's single flat primitive-array loop (the
  * [[DotProduct]] codegen lesson applied to the ADC hot path).
  *
  * k derives from the array lengths (lut.length / codes.length);
  * summation is ascending-j, identical to the chain it replaces and
  * to the oracle's `list_sum(list(d ORDER BY j))`. Null input -> null;
  * an out-of-range code fails loudly (index check in both paths).
  */
case class AdcLookup(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"adc_lookup needs (array<int> codes, array<double> lut), got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0)
      throw new IllegalArgumentException(
        s"adc_lookup shape: ${lut.numElements()}-entry LUT is not a " +
          s"positive multiple of $m codes")
    val k = lut.numElements() / m
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      val idx = j * k + c
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"ADC code $c out of range [0, $k) in subspace $j")
      s += lut.getDouble(idx)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.numElements();
         |if ($m == 0 || $b.numElements() % $m != 0) {
         |  throw new IllegalArgumentException(
         |    "adc_lookup shape: " + $b.numElements() +
         |    "-entry LUT is not a positive multiple of " + $m + " codes");
         |}
         |int $k = $b.numElements() / $m;
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = $a.getInt($j);
         |  if ($c < 0 || $c >= $k) {
         |    throw new IllegalArgumentException(
         |      "ADC code " + $c + " out of range [0, " + $k + ") in subspace " + $j);
         |  }
         |  $s += $b.getDouble($j * $k + $c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(left = newLeft, right = newRight)
}

object AdcLookup {
  /** Column-level entry point: codes array<int>, flat LUT array<double>. */
  def apply(codes: Column, lut: Column): Column =
    GraftSql.column(
      AdcLookup(GraftSql.expression(codes), GraftSql.expression(lut)))
}
