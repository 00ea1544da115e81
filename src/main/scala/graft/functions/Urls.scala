package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and per-domain rollup — the provenance audit of a
  * web-scraped corpus: which domains feed the dataset, how many docs
  * cite each, and which hits a blocklist (spam / SEO-farm / opt-out
  * domains are the first thing a web pipeline filters by). The
  * pattern lives in the Java-regex ∩ RE2 dialect (character classes
  * only, no lookaround) — the same restriction as [[Redact]] — so
  * extraction replays exactly in RE2-based SQL engines and the whole
  * rollup carries an exact oracle.
  *
  * Shape: one corpus scan, an explode of the per-doc URL list (docs
  * carry a handful of URLs, not corpus-scale fan-out), ONE hash
  * aggregation on domain; the blocklist is a tiny literal set folded
  * into the projection (no join at all). */
object Urls {

  val UrlPattern: String =
    "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9/._-]*)?"
  val DomainPattern: String = "https?://([A-Za-z0-9.-]+)"

  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  def domainOf(url: Column): Column =
    regexp_extract(url, DomainPattern, 1)

  /** Per-domain rollup: (domain, n_urls, n_docs, blocked). `idCol`
    * distinguishes docs for the distinct-doc count. */
  def domainRollup(df: DataFrame, idCol: Column, textCol: Column,
                   blocklist: Seq[String]): DataFrame =
    df.select(idCol.as("__id"),
        explode(extractUrls(textCol)).as("url"))
      .select(col("__id"), domainOf(col("url")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("__id")).as("n_docs"))
      .withColumn("blocked",
        col("domain").isin(blocklist: _*))
}
