package graft.functions

import org.apache.spark.sql.Column
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
