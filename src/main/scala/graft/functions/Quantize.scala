package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for ANN at corpus scale: per-lane int8
  * codes cut vector memory/IO 4x (float32 -> uint8), which is the
  * difference between an in-memory index and not at 1e9+ vectors;
  * search runs on codes with optional float rescoring of the top
  * candidates.
  *
  * The mapping is q = clamp(floor((v - mn) * 255 / (mx - mn)), 0, 255)
  * per lane — FLOOR, not round: both engines floor identically, while
  * round() tie-handling differs (Spark HALF_UP vs DuckDB's
  * away-from-zero on doubles), so floor keeps the codes bit-identical
  * cross-engine. All arithmetic is explicitly double (float inputs
  * widen exactly); constant lanes (mx == mn) map to 0.
  *
  * Shape: one distributed pass for per-lane extrema (dim rows collected
  * to the driver — the same bounded-collect pattern as the IVF centroid
  * sample), then one stateless projection pass over the corpus with the
  * extrema inlined as literals. No joins, no second corpus pass.
  */
object Quantize {

  /** Quantize `vecCol` (array<float>) to int8 codes; emits exact
    * integer/digest outputs per vector: (vec_id, q_sum, q_digest).
    * The code array itself is available via [[int8Codes]] for library
    * use (kept out of the declared query: array outputs crash the
    * driver's row-sorting compare). */
  def int8(df: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    val qs = int8Codes(df, vecCol)
    df.select(idCol.as("vec_id"),
      aggregate(qs, lit(0L), (a, q) => a + q).as("q_sum"),
      md5(array_join(transform(qs, q => q.cast("string")), ","))
        .as("q_digest"))
  }

  /** The int8 code array (as longs 0..255) for `vecCol`. */
  def int8Codes(df: DataFrame, vecCol: Column): Column = {
    val stats = df.select(posexplode(vecCol).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy(col("i")).collect()
    val mns = typedLit(stats.map(_.getAs[Float]("mn").toDouble).toSeq)
    val mxs = typedLit(stats.map(_.getAs[Float]("mx").toDouble).toSeq)
    transform(vecCol, (x, i) => {
      val mn = element_at(mns, i + 1)
      val mx = element_at(mxs, i + 1)
      when(mx === mn, lit(0L)).otherwise(
        least(floor((x.cast("double") - mn) * lit(255.0) / (mx - mn)),
          lit(255L)))
    })
  }
}
