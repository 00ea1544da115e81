package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over text columns — the scrubbing pass
  * of an LLM training-data pipeline (emails / phone numbers / IPs →
  * typed placeholder tokens, plus per-class match counts for corpus
  * audit reports).
  *
  * Patterns are restricted to the Java-regex ∩ RE2 dialect (character
  * classes, bounded repetition; no lookaround, no backreferences) so
  * the same pattern string produces identical matches in Spark and in
  * RE2-based SQL engines — which is what lets the redaction digest
  * carry an exact cross-engine oracle. Everything is built-in
  * `regexp_replace`/`regexp_count` Column expressions: codegen'd,
  * no UDF.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"
  val Ipv4Pattern = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def countMatches(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Per-group PII audit rollup across two corpus versions — the
    * governance report a scrubbing pass feeds: for each `group`
    * (source, domain, …), per-version doc counts, docs carrying ANY
    * PII class, per-class match totals, and the redaction-need rate in
    * basis points, plus the v0→v1 drift. A jump in one source's rate
    * between snapshots is the signal that an upstream feed started
    * leaking contact data. ONE corpus scan, one aggregation keyed by
    * group (versions fold into conditional sums, not a second
    * shuffle); rates are integer DIV in basis points so every output
    * cell is engine-exact. `version` must be 0 or 1. */
  def auditRollup(df: DataFrame, text: Column, group: Column,
                  version: Column): DataFrame = {
    val base = df.select(group.as("source"), version.as("__v"),
      countMatches(text, EmailPattern).cast("long").as("__e"),
      countMatches(text, PhonePattern).cast("long").as("__p"),
      countMatches(text, Ipv4Pattern).cast("long").as("__i"))
    def v0(x: Column) = sum(when(col("__v") === 0, x).otherwise(0L))
    def v1(x: Column) = sum(when(col("__v") === 1, x).otherwise(0L))
    val hasPii =
      when(col("__e") + col("__p") + col("__i") > 0, 1L).otherwise(0L)
    base.groupBy(col("source")).agg(
      v0(lit(1L)).as("docs_v0"), v1(lit(1L)).as("docs_v1"),
      v0(hasPii).as("pii_docs_v0"), v1(hasPii).as("pii_docs_v1"),
      v0(col("__e")).as("emails_v0"), v1(col("__e")).as("emails_v1"),
      v0(col("__p")).as("phones_v0"), v1(col("__p")).as("phones_v1"),
      v0(col("__i")).as("ips_v0"), v1(col("__i")).as("ips_v1"))
      .withColumn("pii_rate_bp_v0",
        expr("(pii_docs_v0 * 10000) DIV nullif(docs_v0, 0)"))
      .withColumn("pii_rate_bp_v1",
        expr("(pii_docs_v1 * 10000) DIV nullif(docs_v1, 0)"))
      .withColumn("drift_bp",
        col("pii_rate_bp_v1") - col("pii_rate_bp_v0"))
  }

  /** Replace every email, then phone, then IPv4 with a typed
    * placeholder. Email first: its pattern can span digit runs that
    * the narrower patterns would otherwise nibble at. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")
}
