package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic md5-derived Bloom filter — membership's answer to
  * [[CountMin]]: `k` cell indices per key (u32(md5(i ':' key)) mod m),
  * a key is POSITIVE iff all `k` bits are set. Unlike
  * `DataFrameStatFunctions.bloomFilter` (Murmur3 + library-private
  * layout), every bit here is replayable by any engine from the md5
  * formula alone, so bloom-NEGATIVE verdicts — "this key is DEFINITELY
  * not in the base set", the guarantee Blooms exist for — are
  * cross-engine exact and oracle-checkable.
  *
  * Scale shape: the build is one hash aggregation to <= m distinct
  * set-bit positions (map-side combined; the collect is BOUNDED BY m
  * rows regardless of base size), packed into an m-bit bitmap of m/64
  * longs — a few KB, shipped to executors as one array literal. The
  * probe is a pure per-row expression over that literal (codegen'd
  * element_at + shift + mask, no join, no state) — which is what makes
  * it legal in a STREAMING filter: stateless, deterministic, no
  * watermark needed. This is the new-crawl-vs-100 TB-base topology:
  * the base never rescans; only its bitmap rides along.
  *
  * Sizing: standard Bloom math — fpp ~ (1 - e^{-kn/m})^k; ~10 bits
  * per expected distinct key gives ~1% at k=4. False positives only
  * hold a key back for downstream exact confirmation; negatives are
  * never wrong (no false negatives — bit-union is commutative and
  * insertion-order-free).
  */
object BloomMd5 {

  /** Cell index of `key` for hash row i — the [[CountMin]] cell
    * formula with the Bloom's bit space as the width. */
  private def cellOf(i: Int, key: Column, m: Int): Column =
    pmod(graft.expressions.Md5Hex.u32(
      concat(lit(i.toString), lit(":"), key)), lit(m.toLong))

  /** Build the m-bit bitmap from `keys`: m/64 longs, bit b of word w
    * = cell 64w+b. */
  def build(keys: DataFrame, keyCol: Column, m: Int, k: Int): Array[Long] = {
    require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
    require(k > 0, "k must be positive")
    val cells = keys.select(keyCol.as("__k"))
      .filter(col("__k").isNotNull)
      .select(explode(array((0 until k).map(i =>
        cellOf(i, col("__k"), m)): _*)).as("cell"))
      .distinct()
      .collect().map(_.getLong(0))
    val words = new Array[Long](m / 64)
    cells.foreach { c => words((c / 64).toInt) |= (1L << (c % 64).toInt) }
    words
  }

  /** Add boolean `flag`: true iff ALL k bits for `keyCol` are set
    * (bloom-positive — MAYBE in base; negate for definitely-new).
    * Implemented as named temp columns + SQL shift/mask so the shift
    * amount can be a column; everything is a stateless per-row
    * expression, streaming-safe. A null key yields a null flag. */
  def markPositive(df: DataFrame, keyCol: Column, words: Array[Long],
                   m: Int, k: Int, flag: String): DataFrame = {
    require(words.length * 64 == m, s"bitmap must be m/64 = ${m / 64} words")
    var cur = df.withColumn("__bm", typedlit(words.toSeq))
    (0 until k).foreach { i =>
      cur = cur.withColumn(s"__c$i", cellOf(i, keyCol, m))
    }
    val hit = (0 until k).map { i =>
      expr(s"(shiftrightunsigned(element_at(__bm, " +
        s"CAST(__c$i DIV 64 AS INT) + 1), " +
        s"CAST(__c$i % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)
    cur.withColumn(flag, hit)
      .drop((0 until k).map(i => s"__c$i") :+ "__bm": _*)
  }
}
