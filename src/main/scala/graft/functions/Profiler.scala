package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Column-level data profiling — the corpus-audit pass of a pipeline
  * (null rates, exact cardinalities, value ranges per column), emitted
  * as one narrow (column, stat...) table.
  *
  * One corpus pass: all per-column aggregates run in a single
  * aggregation (Spark plans multi-distinct via Expand — rows multiply
  * by #profiled columns, the standard cost of exact multi-column
  * cardinality; swap countDistinct for approx_count_distinct when
  * profiling wide tables at full scale). Floating-point min/max are
  * rounded into DECIMAL(18,4) before rendering so the report is
  * engine-exact (raw double→string rendering differs across engines).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exact = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def rendered(name: String): Column = exact(name) match {
      case DoubleType | FloatType =>
        round(col(name).cast("double"), 4).cast("decimal(18,4)")
      case _ => col(name)
    }
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(rendered(c)).cast("string").as(s"${c}__min"),
        max(rendered(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = one.select(explode(array(cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__nulls").cast("long").as("n_nulls"),
        col(s"${c}__distinct").cast("long").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }: _*)).as("p"))
    packed.select(col("p.col_name"), col("p.n_nulls"),
      col("p.n_distinct"), col("p.min_val"), col("p.max_val"))
  }
}
