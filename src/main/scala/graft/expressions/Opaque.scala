package graft.expressions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer barrier: evaluates to exactly its child (same value, same
  * nullability, pass-through codegen) but reports non-deterministic,
  * so the optimizer may not push, duplicate, or constant-fold the
  * expression across operators — the guide §4.4 trick
  * (`asNondeterministic` for expensive UDFs) made available to
  * built-in expressions.
  *
  * Use case that motivated it: a selective `levenshtein(...) <= d`
  * filter above a blocked self-join gets pushed INTO the join as a
  * residual condition, where it re-evaluates per hash-bucket CANDIDATE
  * (measured 2-3x the row count) inside the probe loop, instead of
  * once per surviving row in a codegen'd projection. Wrapping the
  * predicate in Opaque keeps it where it was written. The value is
  * unchanged — only placement freedom is removed — so query results
  * are bit-identical; like any non-deterministic expression it is only
  * legal in Project/Filter/Aggregate/Window/Generate. */
case class Opaque(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  // nondeterministic expressions must be initialized per partition;
  // there is no state, so initialization is a no-op via foldable=false
  override def foldable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object Opaque {
  def apply(c: Column): Column =
    GraftSql.column(Opaque(GraftSql.expression(c)))
}
