package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * interpreted — a per-element lambda call breaks whole-stage codegen,
  * which is ruinous when the dot product sits inside a pairwise join
  * (O(pairs * dim) lambda invocations). This expression generates a tight
  * Java loop instead (SURVEY §4: "custom Expressions we add should prefer
  * codegen where hot").
  *
  * Summation order is left-to-right, identical to the HOF fold it
  * replaces and to DuckDB's `list_sum` — oracle arithmetic is unchanged.
  * Mismatched lengths dot the common prefix; null input -> null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  // callers cast to array<double> (Vectors.dot does); enforce here
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<double>, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftSql.column(
      DotProduct(GraftSql.expression(a), GraftSql.expression(b)))
}
