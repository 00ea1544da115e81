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
}
