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

  /** l-DIVERSITY audit (Machanavajjhala et al. 2007) — the attack
    * k-anonymity misses: a QI cell can hold k rows yet leak the
    * sensitive attribute when all k share ONE sensitive value
    * (homogeneity attack). Every QI cell with its row count, its
    * count of DISTINCT sensitive values, and whether it must be
    * suppressed (fewer than l distinct sensitive values — an attacker
    * who places a subject in the cell learns the sensitive value with
    * certainty below l=2, or to within l-1 candidates generally).
    * One hash aggregation on the QI key; the distinct count is
    * map-side partial like any count(distinct) over a grouped key. */
  def lDiversityAudit(df: DataFrame, l: Long, sensitive: Column,
                      qi: Column*): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("suppressed", col("n_sensitive") < l)
}
