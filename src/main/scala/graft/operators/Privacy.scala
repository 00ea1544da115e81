package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy/governance operators beyond targeted deletion
  * ([[Retention]]): keyed pseudonymization and k-anonymity
  * suppression — what a corpus platform runs before sharing data
  * outside its trust boundary.
  */
object Privacy {

  /** Stable keyed pseudonym: md5 of salt + rendered id. Deterministic
    * per (salt, id), so REFERENTIAL INTEGRITY survives — two tables
    * pseudonymized independently with the same salt still join on the
    * pseudonym, which is the property that makes pseudonymized
    * exports analytically useful. Irreversible without the salt
    * (keep the salt out of the export); rotate the salt to unlink
    * releases. Pure projection — zero shuffles. */
  def pseudonym(id: Column, salt: String): Column =
    md5(concat(lit(salt + ":"), id.cast("string")))

  /** k-ANONYMITY audit over quasi-identifier columns: every QI cell
    * with its row count and whether it must be SUPPRESSED (fewer than
    * k rows — those rows are re-identifiable by their QI combination
    * alone). One hash aggregation on the QI key; map-side partials. */
  def kAnonymityAudit(df: DataFrame, k: Long, qi: Column*): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("suppressed", col("n_rows") < k)
}
