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
