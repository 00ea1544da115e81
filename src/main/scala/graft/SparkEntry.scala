package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GroupCounts, Grouper, Pack, PartitionedDataset}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions)
  * gets a named entry in [[queries]]; SQL-expressible ones also get a
  * DuckDB oracle in [[oracleSql]]. Column names are aligned between the
  * Spark result and the oracle SQL (the driver sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference flagship trace: read -> key -> groupBy -> per-group stats
    * (SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    GroupCounts(li, Grouper.byColumn("l_returnflag"))
  }

  // ---------------------------------------------------------------------
  // DuckDB-SQL oracle helpers (kept tiny and readable; see
  // graft.functions.{ByteSize,WordCount} for the Spark-side semantics)
  // ---------------------------------------------------------------------

  /** Reference word-count in DuckDB SQL: strip, split on single space,
    * count tokens (empty tokens included). */
  private def duckWords(c: String): String =
    s"len(string_split(regexp_replace($c, '^\\s+|\\s+$$', '', 'g'), ' '))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3/A4 group-counts aggregation (SURVEY §2.3) over documents, keyed
    // by lang — the reference's domain-partitioned counts pipeline shape.
    "group_counts_documents" -> { (s, dir) =>
      GroupCounts(Tables(s, dir, "documents"), Grouper.byColumn("lang"))
    },
    // Same operator over lineitem keyed by return flag (numeric-heavy
    // schema exercises the fixed-width byte accounting).
    "group_counts_lineitem" -> { (s, dir) =>
      GroupCounts(Tables(s, dir, "lineitem"), Grouper.byColumn("l_returnflag"))
    },
    // A1/A2 capped partition-and-pack (SURVEY §2.3), deterministic
    // variant: greedy pack in ascending (size, doc_id) order with a
    // 10 KB cap so the cap actually binds on the test data. Output is a
    // per-group summary + an order-sensitive digest of the packed texts.
    "pack_capped_documents" -> { (s, dir) =>
      val packed = Pack.packCappedDeterministic(
        Tables(s, dir, "documents"), Grouper.byColumn("lang"),
        col("text"), col("doc_id"), limit = 10000L)
      packed.select(
        col("group_id"),
        col("num_examples"),
        col("num_bytes"),
        md5(concat_ws("",
          transform(col("examples"), b => b.cast("string")))).as("digest"))
    },
    // Uncapped pack (reference fast path = collect_list), multiset
    // digest via sorted payloads.
    "pack_uncapped_documents" -> { (s, dir) =>
      Pack.packUncapped(
        Tables(s, dir, "documents"), Grouper.byColumn("source"), col("text"))
        .select(
          col("group_id"),
          col("num_examples"),
          md5(concat_ws("",
            transform(col("examples"), b => b.cast("string")))).as("digest"))
    },
    // Full serialization loop (SURVEY §3.1+§3.3): key documents by lang,
    // proto-serialize each row (tf.train.Example), pack per group, write
    // TFRecords of SequenceExamples, read them back, decode — the result
    // must be the original table. Exercises the whole wire-compat stack.
    "roundtrip_documents" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-roundtrip").toString
      val packed = PartitionedDataset.packExamples(
        docs, Grouper.byColumn("lang"))
      PartitionedDataset.writeTFRecords(packed, tmp)
      PartitionedDataset.decodeExamples(
        PartitionedDataset.loadTFRecords(s, s"$tmp/groups.tfrecord-*"),
        docs.schema)
    }
  )

  def oracleSql: Map[String, String] = Map(
    "group_counts_documents" ->
      s"""SELECT lang AS group_id,
         |  count(*) AS num_examples,
         |  CAST(sum(16 + strlen(text) + strlen(lang) + strlen(source)) AS BIGINT) AS num_bytes,
         |  CAST(sum(${duckWords("text")} + ${duckWords("lang")} + ${duckWords("source")}) AS BIGINT) AS num_words
         |FROM documents GROUP BY lang""".stripMargin,
    "group_counts_lineitem" ->
      s"""SELECT l_returnflag AS group_id,
         |  count(*) AS num_examples,
         |  CAST(sum(68 + strlen(l_returnflag) + strlen(l_linestatus)) AS BIGINT) AS num_bytes,
         |  CAST(sum(${duckWords("l_returnflag")} + ${duckWords("l_linestatus")}) AS BIGINT) AS num_words
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "pack_capped_documents" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id, text, strlen(text) AS len,
        |    sum(strlen(text)) OVER (PARTITION BY lang
        |      ORDER BY strlen(text), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |SELECT lang AS group_id,
        |  count(*) FILTER (WHERE cum < 10000) AS num_examples,
        |  CAST(coalesce(sum(len) FILTER (WHERE cum < 10000), 0) AS BIGINT) AS num_bytes,
        |  md5(coalesce(string_agg(text, chr(1) ORDER BY len, doc_id)
        |    FILTER (WHERE cum < 10000), '')) AS digest
        |FROM ranked GROUP BY lang""".stripMargin,
    "pack_uncapped_documents" ->
      """SELECT source AS group_id, count(*) AS num_examples,
        |  md5(string_agg(text, chr(1) ORDER BY text)) AS digest
        |FROM documents GROUP BY source""".stripMargin,
    "roundtrip_documents" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents"
  )
}
