package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TFDS-style percent split slicing (SURVEY §2.1 S1: the reference
  * passes splits like `train[:90%]` straight to TFDS —
  * examples/datasets/group_by_feature.py:57-64). Spark reading Parquet
  * has no named splits, so slices are defined deterministically by
  * hashing id columns into 100 buckets: `slice(df, 0, 90, id)` and
  * `slice(df, 90, 100, id)` partition the table exactly, reproducibly,
  * and independently of row order or partitioning.
  */
object Splits {

  private def bucket(seedCols: Seq[Column]): Column =
    pmod(xxhash64(seedCols: _*), lit(100L))

  /** Rows whose hash bucket falls in [loPercent, hiPercent). */
  def slice(df: DataFrame, loPercent: Int, hiPercent: Int,
            seedCols: Column*): DataFrame = {
    require(0 <= loPercent && loPercent < hiPercent && hiPercent <= 100,
      s"invalid slice [$loPercent%, $hiPercent%)")
    val b = bucket(seedCols)
    df.filter(b >= loPercent && b < hiPercent)
  }

  /** Convenience train/test pair: ([0, p), [p, 100)). */
  def trainTest(df: DataFrame, trainPercent: Int,
                seedCols: Column*): (DataFrame, DataFrame) =
    (slice(df, 0, trainPercent, seedCols: _*),
      slice(df, trainPercent, 100, seedCols: _*))
}
