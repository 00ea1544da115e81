package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Column-level data profiling — the corpus-audit pass of a pipeline
  * (null rates, exact cardinalities, value ranges per column), emitted
  * as one narrow (column, stat...) table.
  *
  * Two linear passes, NO multi-distinct Expand: `count(DISTINCT c)`
  * over many columns at once plans as an Expand that multiplies every
  * row by #columns and double-aggregates the blown-up stream (measured
  * ~10s on 600k x 7 — the single most expensive declared query before
  * this shape). Instead:
  *   1. nulls + min/max: one ordinary aggregation (map-side partials,
  *      bytes of state);
  *   2. cardinalities: melt to (column, rendered value), per-partition
  *      distinct, count groups — one shuffle of the melted stream,
  *      state bounded by the distinct set like any exact distinct.
  * Doubles render via value-preserving string casts for the distinct
  * melt (injective, so group counts equal raw-value counts) and are
  * rounded into DECIMAL(18,4) only for the REPORTED min/max (raw
  * double→string rendering differs across engines).
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
        min(rendered(c)).cast("string").as(s"${c}__min"),
        max(rendered(c)).cast("string").as(s"${c}__max"))
    }
    val basic = df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"),
          col(s"${c}__nulls").cast("long").as("n_nulls"),
          col(s"${c}__min").as("min_val"),
          col(s"${c}__max").as("max_val"))
      }: _*)).as("p"))
      .select(col("p.col_name"), col("p.n_nulls"),
        col("p.min_val"), col("p.max_val"))
    val distincts = df
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))
      }: _*)).as("m"))
      .select(col("m.col_name"), col("m.v"))
      .filter(col("v").isNotNull) // count(DISTINCT) ignores nulls
      .distinct()
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_distinct"))
    basic.join(distincts, Seq("col_name"), "left")
      .select(col("col_name"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
  }
}
