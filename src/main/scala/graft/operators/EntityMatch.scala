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

  /** Even-partition segment geometry of a length-`len` string split
    * into `k` contiguous segments: segment `i` starts (1-based) at
    * floor(i*len/k)+1 with length floor((i+1)*len/k)-floor(i*len/k).
    * Exact for len < 2^50 (double floor on small integers). */
  private def segStart(len: Column, i: Int, k: Int): Column =
    floor(len * i / k).cast("int") + 1
  private def segLen(len: Column, i: Int, k: Int): Column =
    (floor(len * (i + 1) / k) - floor(len * i / k)).cast("int")

  /** PassJoin candidate pairs, complete for FULL edit distance
    * <= `maxDist` at ANY maxDist (Li et al., PassJoin, VLDB 2012
    * topology): the INDEXED side partitions each key into
    * maxDist+1 disjoint contiguous segments; the PROBE side emits,
    * for every candidate indexed length L in [|t|-d, |t|+d] and every
    * segment of that geometry, the substrings of t at start positions
    * shifted by up to +-d from the segment's home position. Pigeonhole
    * completeness: an optimal alignment with <= d operations leaves at
    * least one of the d+1 segments untouched, and the indels before it
    * shift its image in t by at most d — so the equi-join on
    * (block, L, segment#, substring) finds every true pair, INCLUDING
    * indel-shifted ones. Survivors verify by exact levenshtein.
    *
    * Cost: the probe side emits <= (2d+1)^2 * (d+1) short substrings
    * per row (196 for d=3; length filtering below usually cuts the
    * first (2d+1) factor to the handful of lengths the index actually
    * holds) — POLYNOMIAL in d,
    * vs the deletion neighborhood's O(L^d) combinatorial blow-up,
    * which is why [[deletionNeighborhoodPairs]] (FastSS) is the d<=2
    * path and PassJoin takes over at d>=3. Both are a bounded blow-up
    * of the short KEY column, never of a corpus payload, followed by a
    * linear equi-join: the 100 TB shape.
    *
    * Caveat (same as [[blockedPairs]]): segment values inherit the
    * key's entropy — a constant run (zero-padded serials) makes that
    * segment's bucket quadratic within the block. Pass a
    * discriminative key (trimming a shared constant prefix is exact by
    * the common-prefix property of edit distance, so distances — and
    * the verify below — are unchanged). The pigeonhole argument needs
    * keys longer than maxDist (floor-split then makes every segment
    * non-empty, so one must survive); indexed keys at or below that —
    * a bounded family of at most alphabet^maxDist strings — route
    * through the built-in short-key side path below, keeping the
    * operator complete for ALL inputs. Output:
    * (id_a, id_b, block, name_dist) with id_a from `indexed`, id_b
    * from `probes`. */
  def passJoinPairs(indexed: DataFrame, probes: DataFrame,
                    idI: Column, strI: Column, blkI: Column,
                    idP: Column, strP: Column, blkP: Column,
                    maxDist: Int): DataFrame =
    passJoinProbe(passJoinIndexBuild(indexed, idI, strI, blkI, maxDist),
      probes, idP, strP, blkP)

  /** The PERSISTABLE PassJoin registry index — the R-S topology where
    * a clean registry is segmented ONCE and stored, and each incoming
    * delta batch probes it ([[MinhashLshIndex]]'s pattern for edit
    * distance): `segments` = one row per (key, segment) with the key
    * kept for the exact verify, `lens` = the distinct key lengths the
    * probe side length-filters against (tiny, broadcast), `shortRows`
    * = the <= maxDist-char keys the pigeonhole argument doesn't cover
    * (bounded family, broadcast side path). Write with
    * [[writePassJoinIndex]]; per-batch cost is then probe-sized — the
    * registry is never re-segmented. */
  final case class PassJoinIndex(segments: DataFrame, lens: DataFrame,
                                 shortRows: DataFrame, maxDist: Int)

  def passJoinIndexBuild(indexed: DataFrame, idI: Column, strI: Column,
                         blkI: Column, maxDist: Int): PassJoinIndex = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k = maxDist + 1
    val segSide = {
      val base = indexed.select(idI.as("id_a"), strI.as("__ka"),
        blkI.as("blk"))
      val len = length(col("__ka"))
      val segs = (0 until k).map { i =>
        struct(lit(i).as("seg"), len.as("klen"),
          col("__ka").substr(segStart(len, i, k), segLen(len, i, k))
            .as("segval"))
      }
      base.select(col("id_a"), col("__ka"), col("blk"),
        explode(array(segs: _*)).as("sv"))
        .select(col("id_a"), col("__ka"), col("blk"),
          col("sv.seg").as("seg"), col("sv.klen").as("klen"),
          col("sv.segval").as("segval"))
        .filter(length(col("segval")) > 0)
    }
    val idxLens = indexed.select(length(strI).cast("int").as("klen"))
      .distinct()
    val shortIdx = indexed.select(idI.as("id_a"), strI.as("__ka"),
      blkI.as("blk")).filter(length(col("__ka")) <= maxDist)
    PassJoinIndex(segSide, idxLens, shortIdx, maxDist)
  }

  /** Persist / reload the registry index (three parquet tables + a
    * one-row meta table pinning the segment geometry). maxDist is part
    * of the index's GEOMETRY (k = maxDist+1 segments were cut at build
    * time), so it is stored with the index and re-derived on read — a
    * caller-supplied mismatch would silently generate incomplete
    * candidates (probe segments cut with the wrong k never equal the
    * stored ones), not an error. */
  def writePassJoinIndex(index: PassJoinIndex, dir: String): Unit = {
    index.segments.write.mode("overwrite").parquet(s"$dir/segments")
    index.lens.write.mode("overwrite").parquet(s"$dir/lens")
    index.shortRows.write.mode("overwrite").parquet(s"$dir/short")
    index.segments.sparkSession.range(1)
      .select(lit(index.maxDist).as("max_dist"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Reload a stored registry index; maxDist comes from the index's
    * own meta table. `expectMaxDist` (optional) cross-checks the
    * caller's assumption against the stored geometry and fails loudly
    * on drift. */
  def readPassJoinIndex(spark: org.apache.spark.sql.SparkSession,
                        dir: String, expectMaxDist: Int = -1): PassJoinIndex = {
    val stored = spark.read.parquet(s"$dir/meta")
      .select(col("max_dist")).head().getInt(0)
    require(expectMaxDist < 0 || expectMaxDist == stored,
      s"index at $dir was built with maxDist=$stored, caller expected " +
        s"$expectMaxDist — probe segments would silently miss candidates")
    PassJoinIndex(spark.read.parquet(s"$dir/segments"),
      spark.read.parquet(s"$dir/lens"),
      spark.read.parquet(s"$dir/short"), stored)
  }

  /** Probe a delta batch against a (stored) registry index — the
    * per-batch half of [[passJoinPairs]], which is build + probe. */
  def passJoinProbe(index: PassJoinIndex, probes: DataFrame,
                    idP: Column, strP: Column, blkP: Column): DataFrame = {
    val maxDist = index.maxDist
    val k = maxDist + 1
    val segSide = index.segments
    // LENGTH FILTERING (the standard PassJoin refinement): a probe
    // only needs the segment geometry of lengths that actually occur
    // on the indexed side, so candidate lengths [|t|-d, |t|+d] are
    // exploded (2d+1 short rows/probe) and equi-joined against the
    // index's distinct key lengths (tiny, broadcast) BEFORE the
    // (d+1)(2d+1) per-length substring fan-out — measured 4x fewer
    // probe rows than the blind +-d length window on 12-char keys,
    // and the join stays a BroadcastHashJoin (no range condition).
    val idxLens = index.lens
    val probeSide = {
      val base = probes.select(idP.as("id_b"), strP.as("__kb"),
        blkP.as("blk"))
      val lenP = length(col("__kb"))
      val withLen = base
        .select(col("id_b"), col("__kb"), col("blk"),
          explode(sequence(greatest(lenP - maxDist, lit(1)),
            lenP + maxDist)).as("klen"))
        .join(broadcast(idxLens), Seq("klen"))
      val L = col("klen")
      // probe structs built as nested transform LOOPS (one compact
      // codegen loop body) — a flat literal array of every
      // (length, segment, shift) combination blows Janino's 64 KB
      // method limit and drops the stage to interpreted mode
      val subs = flatten(transform(
        sequence(lit(-maxDist), lit(maxDist)), sh =>
          transform(sequence(lit(0), lit(maxDist)), i => {
            val st = floor(L * i / k).cast("int") + 1 + sh
            val sl = (floor(L * (i + 1) / k) - floor(L * i / k))
              .cast("int")
            // out-of-range probes collapse to null and are filtered
            when(st >= 1 && sl >= 1 && st + sl - 1 <= lenP,
              struct(i.cast("int").as("seg"),
                col("__kb").substr(st, sl).as("segval")))
          })))
      withLen.select(col("id_b"), col("__kb"), col("blk"), col("klen"),
          explode(subs).as("sv"))
        .filter(col("sv").isNotNull)
        .select(col("id_b"), col("__kb"), col("blk"),
          col("sv.seg").as("seg"), col("klen"),
          col("sv.segval").as("segval"))
    }
    val segCand = segSide.as("a")
      .join(probeSide.as("b"),
        col("a.blk") === col("b.blk") && col("a.seg") === col("b.seg") &&
          col("a.klen") === col("b.klen") &&
          col("a.segval") === col("b.segval"))
      .select(col("a.id_a"), col("b.id_b"), col("a.blk").as("block"),
        col("a.__ka"), col("b.__kb"))
    // SHORT-KEY side path: an indexed key with <= maxDist chars has
    // empty floor segments, so the pigeonhole guarantee above doesn't
    // cover it — but there are at most |alphabet|^maxDist such
    // strings, and any partner within edit distance d is <= 2d chars,
    // so a broadcast of the short index rows against the length-
    // filtered probe side is bounded by design (both sides are tiny
    // fixed families, never corpus-scale)
    val shortIdx = index.shortRows
    val shortCand = probes
      .select(idP.as("id_b"), strP.as("__kb"), blkP.as("blk"))
      .filter(length(col("__kb")) <= 2 * maxDist)
      .join(broadcast(shortIdx), Seq("blk"))
      .select(col("id_a"), col("id_b"), col("blk").as("block"),
        col("__ka"), col("__kb"))
    segCand.union(shortCand)
      .distinct()
      .withColumn("name_dist",
        levenshtein(col("__ka"), col("__kb")).cast("long"))
      .filter(col("name_dist") <= maxDist)
      .drop("__ka", "__kb")
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
    // The edit distance runs ONCE per joined row in a codegen'd
    // projection, BANDED at maxDist (threshold levenshtein returns the
    // exact distance when <= maxDist, -1 past the band — the kept rows
    // and their distances are identical to the unbanded form). The
    // name_dist COLUMN itself is Opaque-wrapped (r10 wrapped only the
    // filter condition, and alias substitution still inlined the
    // levenshtein into the pushed-down predicate — up to three evals
    // per joined row in the r10 after-plan): a non-deterministic
    // projection blocks both predicate pushdown INTO the join (where
    // the full-matrix levenshtein ran per hash-bucket CANDIDATE,
    // ~5.6s -> ~2s at sf0.1) and alias substitution, so the single
    // eval is structural — the filter above references only the
    // attribute. The distinct then dedups the few SURVIVING pairs
    // instead of every seg match (name_dist is functionally dependent
    // on the id pair, so distinct-after-project equals the old
    // distinct-on-names).
    segged.as("a")
      .join(segged.as("b"),
        col("a.blk") === col("b.blk") && col("a.seg") === col("b.seg") &&
          col("a.segval") === col("b.segval") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.blk").as("block"),
        graft.expressions.Opaque(
          levenshtein(col("a.name"), col("b.name"), maxDist)
            .cast("long")).as("name_dist"))
      .filter(col("name_dist") >= 0 && col("name_dist") <= maxDist)
      .distinct()
  }
}
