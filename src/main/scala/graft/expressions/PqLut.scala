package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The QUERY-side ADC lookup table as ONE generated loop — [[PqBest]]'s
  * third sibling (r10 VERDICT item 5, the last `least(struct)`-era
  * battery): the m*k per-subspace distances `d(j,i) = (x.x - 2*x.c_i)
  * + cc_i` emitted as a flat subspace-major array<double> (entry
  * j*k + i), exactly the layout [[AdcLookup]] consumes. Replaces the
  * `array(subDists(...))` forest of m*k expressions (each wrapping two
  * DotProduct kernels) in `Pq.adcTopK` / `ivfAdcTopK` / `ivfAdcTopKInt`
  * — bounded by query count at runtime, but the forest cost planning +
  * codegen per query plan.
  *
  * Bit-identity: same IEEE op sequence per entry as the battery — the
  * subvector (optionally floor(x*2^20)-quantized) folds x.x and each
  * dot left-to-right, `(xx - 2.0*dot) + cc` — identical to [[PqBest]]'s
  * inner loop with the argmin dropped. Null vector -> null (the
  * battery produced an array of null entries; every consumer reaches
  * the LUT only behind a non-null cell join or feeds AdcLookup, which
  * is null-safe either way — pinned by the differential spec and the
  * oracle sweep).
  */
case class PqLut(vec: Expression, books: Expression, cc: Expression,
                 m: Int, quantize: Boolean)
    extends TernaryExpression with Serializable {

  override def first: Expression = vec
  override def second: Expression = books
  override def third: Expression = cc

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, books.dataType, cc.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _)) if m >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_lut needs (array<double> vec, array<double> books, " +
            s"array<double> cc) and m >= 1, got $a / $b / $c (m=$m)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any, b: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val cc = c.asInstanceOf[ArrayData]
    val mk = cc.numElements()
    if (mk % m != 0 || mk == 0 || books.numElements() % mk != 0)
      throw new IllegalArgumentException(
        s"pq_lut shape: ${books.numElements()} book entries / $mk norms " +
          s"vs m=$m")
    val k = mk / m
    val sub = books.numElements() / mk
    if (vec.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"pq_lut shape: ${vec.numElements()}-lane vector vs m=$m sub=$sub")
    val xs = new Array[Double](sub)
    val out = new Array[Double](mk)
    var j = 0
    while (j < m) {
      var xx = 0.0
      var l = 0
      while (l < sub) {
        var x = vec.getDouble(j * sub + l)
        if (quantize) x = math.floor(x * 1048576.0)
        xs(l) = x
        xx += x * x
        l += 1
      }
      var i = 0
      while (i < k) {
        val cb = (j * k + i) * sub
        var dot = 0.0
        l = 0
        while (l < sub) { dot += xs(l) * books.getDouble(cb + l); l += 1 }
        out(j * k + i) = (xx - 2.0 * dot) + cc.getDouble(j * k + i)
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, c) => {
      val buf = ctx.addMutableState("double[]", "pqLutXs",
        n => s"$n = new double[0];", forceInline = false)
      val mk = ctx.freshName("mk")
      val k = ctx.freshName("k")
      val sub = ctx.freshName("sub")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val l = ctx.freshName("l")
      val xx = ctx.freshName("xx")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val cb = ctx.freshName("cb")
      val out = ctx.freshName("out")
      val quantLine =
        if (quantize) s"$x = java.lang.Math.floor($x * 1048576.0);" else ""
      s"""
         |int $mk = $c.numElements();
         |if ($mk == 0 || $mk % $m != 0 || $b.numElements() % $mk != 0) {
         |  throw new IllegalArgumentException(
         |    "pq_lut shape: " + $b.numElements() + " book entries / " +
         |    $mk + " norms vs m=" + $m);
         |}
         |int $k = $mk / $m;
         |int $sub = $b.numElements() / $mk;
         |if ($v.numElements() != $m * $sub) {
         |  throw new IllegalArgumentException(
         |    "pq_lut shape: " + $v.numElements() +
         |    "-lane vector vs m=" + $m + " sub=" + $sub);
         |}
         |if ($buf.length < $sub) $buf = new double[$sub];
         |double[] $out = new double[$mk];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $xx = 0.0;
         |  for (int $l = 0; $l < $sub; $l++) {
         |    double $x = $v.getDouble($j * $sub + $l);
         |    $quantLine
         |    $buf[$l] = $x;
         |    $xx += $x * $x;
         |  }
         |  for (int $i = 0; $i < $k; $i++) {
         |    int $cb = ($j * $k + $i) * $sub;
         |    double $dot = 0.0;
         |    for (int $l = 0; $l < $sub; $l++) {
         |      $dot += $buf[$l] * $b.getDouble($cb + $l);
         |    }
         |    $out[$j * $k + $i] = ($xx - 2.0 * $dot) + $c.getDouble($j * $k + $i);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqLut =
    copy(vec = newFirst, books = newSecond, cc = newThird)
}

object PqLut {
  def apply(vec: Column, books: Column, cc: Column, m: Int,
            quantize: Boolean): Column =
    GraftSql.column(PqLut(GraftSql.expression(vec),
      GraftSql.expression(books), GraftSql.expression(cc), m, quantize))
}
