package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns. The dot
  * product is a custom codegen'd Catalyst expression
  * ([[graft.expressions.DotProduct]]) — Spark's higher-order functions
  * are interpreted per element, which dominates pairwise-join hot paths.
  * Arithmetic is promoted to double with left-to-right accumulation to
  * match the DuckDB oracle bit-for-bit at round(…, 6). */
object Vectors {

  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct(
      a.cast("array<double>"), b.cast("array<double>"))

  /** The pre-DotProduct HOF formulation, kept for differential testing. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
