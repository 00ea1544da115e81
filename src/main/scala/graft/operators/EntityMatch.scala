package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching with two-level blocking: a coarse BLOCK key
  * (nation, zip, …) bounds the universe, and SEGMENT keys (PassJoin-
  * style: disjoint substrings of the discriminative part of the name)
  * bound candidates INSIDE a block — for maxDist substitutions over
  * maxDist+1 disjoint segments, pigeonhole guarantees at least one
  * segment matches exactly, so an equi-join per segment finds every
  * substitution-distance pair (indel-shifted pairs can evade aligned
  * segments; full PassJoin adds ±maxDist shifted segment probes —
  * same topology, more probe rows). Every candidate is then VERIFIED
  * by exact levenshtein, which is the same DP integer in every
  * engine.
  *
  * Why not levenshtein inside the block join: a B-row block costs
  * B^2/2 edit-distance evaluations — measured 15s on 15k customers
  * (4.5M pairs); with segment blocking the same result takes the
  * segment equi-join (linear bucketing) plus levenshtein on only the
  * surviving candidates. Same shape as [[Dedup.simhashPairs]]. */
object EntityMatch {

  /** Candidate-blocked pairs: same `block`, at least one of `segs`
    * equal, verified `levenshtein <= maxDist`. `segs` derives the
    * segment values from the name column (choose substrings that
    * actually discriminate — constant prefixes make every row collide
    * and give the quadratic block back). Output:
    * (id_a, id_b, block, name_dist). */
  /** Every string reachable from `s` by deleting at most `maxDist`
    * single characters (FastSS / deletion-neighborhood blocking,
    * Bocek et al. 2007): if lev(a, b) <= d then some string is
    * reachable from BOTH by <= d deletions (delete, from each side,
    * the positions the optimal alignment edits), so an equi-join on
    * the variant value finds every pair — INCLUDING indel-shifted
    * ones that evade aligned-segment blocking ([[blockedPairs]]'
    * documented gap). Variants keep every undeleted character, so
    * the join key carries the string's full entropy minus <= d chars:
    * no universal hot key even on zero-padded tails, where contiguous
    * PassJoin segments collide on the constant run. Cost: 1 + L +
    * L*(L-1)/2 variant rows per string of length L (172 for L = 18) —
    * a bounded blow-up of the short KEY column, never of the corpus
    * payload. maxDist is fixed at 2 (the explode is hand-unrolled;
    * d >= 3 neighborhoods grow combinatorially and PassJoin wins). */
  private[graft] def deletionVariants(s: Column): Column = {
    val len = length(s)
    val emptyArr = array().cast("array<string>")
    // sequence(0, -1) DESCENDS in Spark — guard the short-string ends
    val del1 = when(len >= 1, transform(sequence(lit(0), len - 1), i =>
      concat(s.substr(lit(1), i), s.substr(i + lit(2), len))))
      .otherwise(emptyArr)
    // delete 0-based positions i < j: three surviving runs
    val del2 = when(len >= 2,
      flatten(transform(sequence(lit(0), len - 2), i =>
        transform(sequence(i + 1, len - 1), j =>
          concat(s.substr(lit(1), i),
            s.substr(i + lit(2), j - i - 1),
            s.substr(j + lit(2), len))))))
      .otherwise(emptyArr)
    array_distinct(concat(array(s), del1, del2))
  }

  /** Candidate pairs complete for FULL edit distance <= 2 (not just
    * substitutions): same `block`, deletion neighborhoods of `strCol`
    * intersect, verified `levenshtein(verify) <= 2` (verify defaults
    * to strCol). Passing a SHORTER key for strCol — e.g. the digit
    * tail after a constant prefix — cuts the variant blow-up from
    * 1+L+L(L−1)/2 to the tail's (46 vs 172 for 9-of-18 chars, a
    * measured 3x on the declared query) and stays complete as long as
    * ed(key) <= 2 whenever ed(verify) <= 2 (true under a shared
    * constant prefix by the common-prefix-trimming property of edit
    * distance); the gate-side oracle is the brute-force within-block
    * levenshtein join — the ground truth — so the assumption is
    * re-proven on the actual data every round.
    * Output: (id_a, id_b, block, name_dist). */
  def deletionNeighborhoodPairs(df: DataFrame, idCol: Column,
                                strCol: Column, blockCol: Column,
                                verifyCol: Option[Column] = None)
      : DataFrame = {
    val base = df.select(idCol.as("id"), strCol.as("name"),
      verifyCol.getOrElse(strCol).as("vname"),
      blockCol.as("blk"))
    val varred = base
      .select(col("id"), col("vname"), col("blk"),
        explode(deletionVariants(col("name"))).as("variant"))
      .repartition(col("blk"), col("variant"))
    varred.as("a")
      .join(varred.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.variant") === col("b.variant") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.blk").as("block"),
        col("a.vname").as("__na"), col("b.vname").as("__nb"))
      .distinct()
      .withColumn("name_dist",
        levenshtein(col("__na"), col("__nb")).cast("long"))
      .filter(col("name_dist") <= 2)
      .drop("__na", "__nb")
  }

  def blockedPairs(df: DataFrame, idCol: Column, nameCol: Column,
                   blockCol: Column, segs: Column => Seq[Column],
                   maxDist: Int): DataFrame = {
    val base = df.select(idCol.as("id"), nameCol.as("name"),
      blockCol.as("blk"))
    val segArr = array(segs(col("name")): _*)
    val segged = base
      .select(col("id"), col("name"), col("blk"),
        posexplode(segArr).as(Seq("seg", "segval")))
      .repartition(col("blk"), col("seg"), col("segval"))
    segged.as("a")
      .join(segged.as("b"),
        col("a.blk") === col("b.blk") && col("a.seg") === col("b.seg") &&
          col("a.segval") === col("b.segval") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.blk").as("block"),
        col("a.name").as("__na"), col("b.name").as("__nb"))
      .distinct()
      .withColumn("name_dist",
        levenshtein(col("__na"), col("__nb")).cast("long"))
      .filter(col("name_dist") <= maxDist)
      .drop("__na", "__nb")
  }
}
