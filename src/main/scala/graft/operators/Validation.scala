package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation suite (the Deequ-style contract gate a
  * corpus platform runs before publishing a table): named rules
  * evaluate to per-rule violation counts + a pass verdict, unioned
  * into one small report.
  *
  * Scale shape: every ROW-LOCAL rule folds into ONE conditional-sum
  * aggregation pass over the table (no per-rule scan); uniqueness is
  * one keyed aggregation (violations = Σ max(cnt-1, 0), map-side
  * partials); referential integrity is one anti-join with the parent
  * side broadcast when small. The report is |rules| rows. */
object Validation {

  /** All `rules` (name -> "this row violates" predicate) in one scan. */
  def rowRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val sums = rules.map { case (name, bad) =>
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__v_$name")
    }
    val one = df.agg(sums.head, sums.tail: _*)
    val stacked = rules.map { case (name, _) =>
      s"'$name', __v_$name"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${rules.length}, $stacked) AS (rule, n_violations)")
  }

  /** Duplicate-key violations: rows beyond the first per key. */
  def uniqueness(df: DataFrame, name: String, keys: Column*): DataFrame =
    df.groupBy(keys: _*)
      .agg(count(lit(1)).as("__cnt"))
      .agg(coalesce(sum(col("__cnt") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Orphaned child keys (no matching parent). Parent side is
    * distinct-projected; broadcast it when the parent key set fits. */
  def referential(child: DataFrame, childKey: Column,
                  parent: DataFrame, parentKey: Column,
                  name: String): DataFrame =
    child.select(childKey.as("__k"))
      .join(parent.select(parentKey.as("__k")).distinct(), Seq("__k"),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))

  /** Functional-dependency CHECK lhs → rhs (schema profiling / key
    * discovery): a dependency holds when every lhs value maps to
    * exactly one rhs value. Reports the determinant group count, how
    * many groups violate, and the worst fan-out — the numbers that
    * separate "this is a key" from "this is 99% a key" (which usually
    * means dirty data, cf. the (l_orderkey, l_linenumber) duplicates
    * [[uniqueness]] caught in the driver corpus). One groupBy to lhs
    * granularity with a distinct-rhs aggregate, then a scalar rollup.
    * Output: (fd, n_groups, n_violating, max_fanout, holds). */
  def functionalDependency(df: DataFrame, name: String, lhs: Column,
                           rhs: Column): DataFrame =
    df.groupBy(lhs.as("__l"))
      .agg(countDistinct(rhs).as("__d"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("__d") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("n_violating"),
        coalesce(max(col("__d")), lit(0L)).as("max_fanout"))
      .select(lit(name).as("fd"), col("n_groups"), col("n_violating"),
        col("max_fanout"), (col("n_violating") === 0L).as("holds"))

  /** Union rule reports into the final (rule, n_violations, passed)
    * contract table. */
  def suite(reports: DataFrame*): DataFrame =
    reports.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
}
