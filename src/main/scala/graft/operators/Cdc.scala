package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changeset application — the MERGE INTO of a versioned corpus:
  * fold a stream of keyed change events (insert / update / delete,
  * each with a monotone sequence number) into a base snapshot,
  * latest-event-per-key wins. This is how a 100 TB training corpus is
  * maintained between full rebuilds: the base never rewrites wholesale;
  * each release applies the delta.
  *
  * Semantics: for every key, the change with the highest `seq` decides
  * — `D` removes the row, `I`/`U` upsert the event's full payload;
  * keys untouched by the changeset pass through. Events carry complete
  * rows (full-row CDC, the Debezium-style contract), so `I` vs `U` is
  * metadata: both replace.
  *
  * Scale shape: latest-per-key is ONE bounded struct-max aggregation
  * over the CHANGESET (map-side combine, no window, state = one row
  * per distinct changed key); the apply is one full-outer shuffle join
  * keyed on the id — the snapshot's single unavoidable exchange, and
  * it shuffles the delta-sized right side along for the ride. Spark
  * cannot broadcast a full-outer side; when the changeset is tiny and
  * the extra exchange matters, decompose into a broadcast anti-join
  * (drop deleted/updated keys) + union of upserts instead — same
  * result, two broadcast-able ops.
  */
object Cdc {

  /** Apply `changes` (id + seq + op + the snapshot's payload columns)
    * to `snapshot` (id + payload columns). Within one key, `seq` must
    * be unique (a real CDC log's offset); ties would fall back to
    * struct order on (op, payload...) — deterministic but meaningless,
    * so don't. */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame,
                     id: String, seq: String, op: String): DataFrame = {
    val payload =
      snapshot.columns.filterNot(_ == id).toSeq
    // latest event per key: struct-max with seq as the leading field —
    // commutative/associative, combines map-side (no per-key sort)
    val latest = changes.groupBy(col(id))
      .agg(max(struct((col(seq) +: col(op) +: payload.map(col)): _*))
        .as("__c"))
    snapshot.join(latest, Seq(id), "full_outer")
      .filter(col("__c").isNull || col("__c").getField(op) =!= "D")
      .select(col(id) +: payload.map { p =>
        when(col("__c").isNotNull, col("__c").getField(p))
          .otherwise(col(p)).as(p)
      }: _*)
  }

  /** SCD Type-2 history from the same changeset: one validity interval
    * per change event — `seq_from` = the event's own sequence,
    * `seq_to` = the key's NEXT event (null while still latest),
    * `is_current` = latest AND not a delete. This is the
    * slowly-changing-dimension table warehouses keep alongside the
    * [[applyChangeset]] snapshot: "what did key X look like at seq S"
    * is one range predicate against it.
    *
    * Shape: ONE window per key over the CHANGESET ordered by seq —
    * state is bounded by a key's change count (CDC logs are
    * per-key-shallow however wide the corpus); the corpus itself is
    * never touched. `seq` must be unique within a key, as in
    * [[applyChangeset]]. */
  def scd2History(changes: DataFrame, id: String, seq: String,
                  op: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col(seq))
    changes
      .withColumn("seq_to", lead(col(seq), 1).over(w))
      .withColumn("is_current",
        col("seq_to").isNull && col(op) =!= "D")
      .withColumnRenamed(seq, "seq_from")
  }

  /** POINT-IN-TIME join of facts against an SCD2 dimension: each fact
    * row pairs with the dimension VERSION valid at its timestamp
    * (valid_from <= ts < valid_to, open-ended current version) — the
    * correctness rule that prevents attributing events to attributes
    * the entity only acquired later. The join key stays the equi
    * dimension key; the validity interval is a residual predicate, so
    * this plans as a plain shuffled/broadcast hash join (per-key
    * version counts are small by SCD2 construction), never a range
    * join. */
  def pointInTime(facts: DataFrame, factKey: Column, factTs: Column,
                  dim: DataFrame, dimKey: Column, validFrom: Column,
                  validTo: Column): DataFrame =
    facts.join(dim, factKey === dimKey && factTs >= validFrom &&
      (validTo.isNull || factTs < validTo))

  /** TIME TRAVEL: reconstruct the corpus as of change-sequence
    * `atSeq` from the base snapshot + the change log — the
    * reproducibility primitive a training platform needs ("rebuild the
    * exact corpus run X trained on") without storing a full snapshot
    * per version. A key's state at `atSeq` is its latest change with
    * seq <= atSeq (dropped if that change is a delete); keys the log
    * never touched come from the base unchanged.
    *
    * Shape: the change log filters to <= atSeq and reduces to
    * latest-per-key via ONE struct-max aggregation (no window over the
    * corpus; map-side partials carry one struct per key) — then a
    * broadcast-friendly anti join pulls the untouched base through.
    * The base is scanned once and never shuffles. `seq` must be unique
    * per key (as in [[applyChangeset]]); payload columns = every
    * changeset column except (id, seq, op), and the base must carry
    * the same payload columns. */
  def asOf(base: DataFrame, changes: DataFrame, id: String, seq: String,
           op: String, atSeq: Long): DataFrame = {
    val payload = changes.columns.filterNot(c => c == id || c == seq || c == op)
    val latest = changes.filter(col(seq) <= atSeq)
      .groupBy(col(id))
      .agg(max_by(struct((op +: payload.toSeq).map(col): _*), col(seq))
        .as("__last"))
    val changedAlive = latest.filter(col("__last")(op) =!= "D")
      .select(col(id) +: payload.toSeq.map(c => col("__last")(c).as(c)): _*)
    val untouched = base.join(latest.select(col(id)), Seq(id), "left_anti")
      .select((id +: payload.toSeq).map(col): _*)
    untouched.unionByName(changedAlive)
  }
}
