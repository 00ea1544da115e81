package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** PQ nearest-centroid battery as ONE generated loop — the encode-side
  * twin of [[AdcLookup]] (the same lesson: a per-row battery of m*k
  * `least(struct(dist, i))` expressions, each wrapping a [[DotProduct]]
  * kernel, costs far more in expression-tree size, codegen compile
  * time, and per-row dispatch than a single flat primitive loop).
  *
  * Inputs: the RAW vector (array<double>, length m*sub), the FLAT
  * codebook (array<double>, subspace-major: entry (j*k + i)*sub + l is
  * lane l of centroid i of subspace j), and the FLAT per-centroid
  * squared norms (array<double>, entry j*k + i — folded left-to-right
  * on the driver exactly like the battery it replaces). Per subspace j
  * it computes `d(i) = (x.x - 2*x.c_i) + cc_i` over the (optionally
  * floor(x*2^20)-quantized) subvector — each dot a left-to-right lane
  * fold, the same IEEE op sequence as [[graft.functions.Vectors.dot]]
  * — and takes the argmin with ties to the LOWER centroid index and
  * NaN ordered largest, exactly the `least(struct(d, i))` semantics it
  * replaces. Every distance double is therefore bit-identical to the
  * expression battery, so codes, LUTs, and the DuckDB oracles replay
  * unchanged.
  *
  * `dists = false` returns the m codes (array<int>); `dists = true`
  * returns the m best distances (array<double>) for quantization-error
  * reporting. Null input -> null; shape mismatches fail loudly.
  */
case class PqBest(vec: Expression, books: Expression, cc: Expression,
                  m: Int, quantize: Boolean, dists: Boolean)
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
          s"pq_best needs (array<double> vec, array<double> books, " +
            s"array<double> cc) and m >= 1, got $a / $b / $c (m=$m)")
    }

  override def dataType: DataType =
    if (dists) ArrayType(DoubleType, containsNull = false)
    else ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, b: Any, c: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val cc = c.asInstanceOf[ArrayData]
    val mk = cc.numElements()
    if (mk % m != 0 || mk == 0 || books.numElements() % mk != 0)
      throw new IllegalArgumentException(
        s"pq_best shape: ${books.numElements()} book entries / $mk norms " +
          s"vs m=$m")
    val k = mk / m
    val sub = books.numElements() / mk
    if (vec.numElements() != m * sub)
      throw new IllegalArgumentException(
        s"pq_best shape: ${vec.numElements()}-lane vector vs m=$m sub=$sub")
    val xs = new Array[Double](sub)
    val outI = if (dists) null else new Array[Int](m)
    val outD = if (dists) new Array[Double](m) else null
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
      var best = 0
      var bestD = Double.NaN
      var i = 0
      while (i < k) {
        val cb = (j * k + i) * sub
        var dot = 0.0
        l = 0
        while (l < sub) { dot += xs(l) * books.getDouble(cb + l); l += 1 }
        val d = (xx - 2.0 * dot) + cc.getDouble(j * k + i)
        // least(struct(d, i)) semantics: strict improvement only (ties
        // keep the lower index), NaN ordered LARGEST (replaced by any
        // non-NaN)
        if (if (bestD.isNaN) !d.isNaN else d < bestD) { bestD = d; best = i }
        i += 1
      }
      if (dists) outD(j) = bestD else outI(j) = best
      j += 1
    }
    new GenericArrayData(if (dists) outD else outI)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, c) => {
      val buf = ctx.addMutableState("double[]", "pqXs",
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
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cb = ctx.freshName("cb")
      val out = ctx.freshName("out")
      val outTpe = if (dists) "double" else "int"
      val quantLine =
        if (quantize) s"$x = java.lang.Math.floor($x * 1048576.0);" else ""
      val store = if (dists) s"$out[$j] = $bestD;" else s"$out[$j] = $best;"
      s"""
         |int $mk = $c.numElements();
         |if ($mk == 0 || $mk % $m != 0 || $b.numElements() % $mk != 0) {
         |  throw new IllegalArgumentException(
         |    "pq_best shape: " + $b.numElements() + " book entries / " +
         |    $mk + " norms vs m=" + $m);
         |}
         |int $k = $mk / $m;
         |int $sub = $b.numElements() / $mk;
         |if ($v.numElements() != $m * $sub) {
         |  throw new IllegalArgumentException(
         |    "pq_best shape: " + $v.numElements() +
         |    "-lane vector vs m=" + $m + " sub=" + $sub);
         |}
         |if ($buf.length < $sub) $buf = new double[$sub];
         |$outTpe[] $out = new $outTpe[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $xx = 0.0;
         |  for (int $l = 0; $l < $sub; $l++) {
         |    double $x = $v.getDouble($j * $sub + $l);
         |    $quantLine
         |    $buf[$l] = $x;
         |    $xx += $x * $x;
         |  }
         |  int $best = 0;
         |  double $bestD = Double.NaN;
         |  for (int $i = 0; $i < $k; $i++) {
         |    int $cb = ($j * $k + $i) * $sub;
         |    double $dot = 0.0;
         |    for (int $l = 0; $l < $sub; $l++) {
         |      $dot += $buf[$l] * $b.getDouble($cb + $l);
         |    }
         |    double $d = ($xx - 2.0 * $dot) + $c.getDouble($j * $k + $i);
         |    if (Double.isNaN($bestD) ? !Double.isNaN($d) : $d < $bestD) {
         |      $bestD = $d; $best = $i;
         |    }
         |  }
         |  $store
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqBest =
    copy(vec = newFirst, books = newSecond, cc = newThird)
}

object PqBest {
  /** Codes column: per-subspace argmin centroid index (array<int>). */
  def codes(vec: Column, books: Column, cc: Column, m: Int,
            quantize: Boolean): Column =
    GraftSql.column(PqBest(GraftSql.expression(vec),
      GraftSql.expression(books), GraftSql.expression(cc), m,
      quantize, dists = false))

  /** Best-distance column: per-subspace min distance (array<double>). */
  def dists(vec: Column, books: Column, cc: Column, m: Int,
            quantize: Boolean): Column =
    GraftSql.column(PqBest(GraftSql.expression(vec),
      GraftSql.expression(books), GraftSql.expression(cc), m,
      quantize, dists = true))
}
