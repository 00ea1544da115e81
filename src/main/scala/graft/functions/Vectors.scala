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

/** Grouped vector aggregation: element-wise statistics over an
  * embedding column per group — e.g. per-label centroids (class means
  * used for IVF seeding, prototype classifiers, drift monitoring).
  * Relational formulation: posexplode to (group, lane, value), aggregate
  * per lane, reassemble — linear, one shuffle on (group, lane), no UDAF
  * state. */
object VectorAgg {

  /** (group, lane, centroid_val): element-wise mean per group, exploded
    * shape (directly oracle-able; use [[centroidArrays]] for the
    * assembled array<double> form). */
  def centroidLanes(df: org.apache.spark.sql.DataFrame,
                    groupCol: Column, vecCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{avg, count, lit, posexplode, round}
    df.select(groupCol.as("group_id"), posexplode(vecCol))
      .select(org.apache.spark.sql.functions.col("group_id"),
        org.apache.spark.sql.functions.col("pos").cast("long").as("lane"),
        org.apache.spark.sql.functions.col("col").cast("double").as("v"))
      .groupBy("group_id", "lane")
      .agg(count(lit(1)).as("n"), round(avg("v"), 6).as("centroid_val"))
  }

  /** Per-group centroid as an assembled array<double> column. */
  def centroidArrays(df: org.apache.spark.sql.DataFrame,
                     groupCol: Column, vecCol: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    centroidLanes(df, groupCol, vecCol)
      .groupBy("group_id")
      .agg(transform(
        array_sort(collect_list(struct(col("lane"), col("centroid_val")))),
        x => x.getField("centroid_val")).as("centroid"),
        max(col("n")).as("n_vectors"))
  }
}
