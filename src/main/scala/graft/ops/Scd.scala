package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Kimball Type 2) history built from a CDC
  * changelog feed — the warehouse-side consumer of the Iceberg changelog
  * (IcebergSink.readChangelogFrom) or any (key, payload, change_type,
  * change_ordinal) stream: every 'insert' opens a version at its ordinal,
  * and the first 'delete' for the same key at a LATER ordinal closes it.
  * A delete at the SAME ordinal as an insert is the retraction half of a
  * merge/upsert commit: it closes the previous version, never the one the
  * commit itself opens (deletes order before inserts within an ordinal).
  *
  * 100 TB shape: one window over the changelog partitioned by key — the
  * same key-hash shuffle a GROUP BY on the key would pay, no join, no
  * second corpus pass. Per-key change chains are short (bounded by commit
  * count, not corpus size), so the window frame never spills.
  */
object Scd {

  /** Versioned history: the 'insert' rows of `changes` with `valid_from`
    * (the opening ordinal), `valid_to` (the closing delete's ordinal, null
    * while current) and `is_current` appended; the ordinal and change-type
    * columns are consumed. Delete rows only need their key columns
    * populated — payload nulls (Iceberg key-level retractions) are fine.
    *
    * ILLEGAL-FEED DISCIPLINE (what a real at-least-once CDC pipe
    * produces): EXACT duplicate deliveries — the same (key, ordinal,
    * type, payload) row twice — collapse silently; CONFLICTING
    * duplicates — two DIFFERING rows claiming the same (key, ordinal,
    * type) slot — raise at execution time, because either choice would
    * silently fork history. Out-of-order delivery needs no special case:
    * the fold orders by ordinal inside the key window, so any
    * arrival/drain order produces the same history (ScdSpec pins this).
    * Both guards ride the SAME key-hash shuffle as the fold (duplicates
    * are made adjacent by the sort; no extra shuffle, no groupBy pass).
    * Payload columns must be hashable (no map columns) for the
    * adjacency sort. */
  def scd2(changes: DataFrame, keyCols: Seq[String],
      ordCol: String = "_change_ordinal",
      typeCol: String = "_change_type"): DataFrame = {
    val rowStruct = struct(changes.columns.map(col): _*)
    // the hash tiebreaker is materialized ONCE as a real column: an
    // inline hash(...) in each window's ORDER BY is re-extracted with a
    // fresh projected column per Window node, which splits the guard's
    // three lags into three Window+Sort pairs and forces the fold to
    // re-sort — ordering every window by the SAME attribute lets
    // CollapseWindow merge the lags and lets the fold's required
    // ordering be satisfied by the guard's output, so the whole operator
    // runs on ONE Exchange + ONE Sort (PlanSpec pins the plan shape)
    val hashed = changes.withColumn("_slot_hash", hash(rowStruct))
    // duplicates of one (key, ordinal, type) slot sort adjacent: equal
    // rows share the hash tiebreaker, so an exact dup always follows its
    // original, and a slot with two DISTINCT rows always has some
    // adjacent differing pair — which is exactly the conflict signal
    val dw = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col(typeCol), col("_slot_hash"))
    val sameSlot = col("_prev_ord") === col(ordCol) &&
      col("_prev_type") === col(typeCol)
    val dupOfPrev = sameSlot && (col("_prev_row") <=> rowStruct)
    val conflict = sameSlot && !(col("_prev_row") <=> rowStruct)
    val deduped = hashed
      .withColumn("_prev_row", lag(rowStruct, 1).over(dw))
      .withColumn("_prev_ord", lag(col(ordCol), 1).over(dw))
      .withColumn("_prev_type", lag(col(typeCol), 1).over(dw))
      .where(when(conflict, raise_error(concat(
          lit("conflicting changelog duplicates: differing rows claim " +
            "one (key, ordinal, type) slot at ordinal "),
          col(ordCol).cast("string"))))
        .otherwise(!coalesce(dupOfPrev, lit(false))))
      .drop("_prev_row", "_prev_ord", "_prev_type")
    // 'delete' < 'insert' lexicographically, so a same-ordinal delete sits
    // BEFORE the insert and the strictly-following frame can't see it.
    // The fold orders by the guard's EXACT key — (ord, type, _slot_hash),
    // not the (ord, type) prefix it semantically needs: after the guard,
    // every (key, ord, type) slot holds one row (dups collapsed,
    // conflicts aborted), so the hash suffix is inert and the two orders
    // are row-identical — sharing the key is what elides the second Sort.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol), col(typeCol), col("_slot_hash"))
      .rowsBetween(1, Window.unboundedFollowing)
    deduped
      .withColumn("_next_del",
        min(when(col(typeCol) === "delete", col(ordCol))).over(w))
      .where(col(typeCol) === "insert")
      .withColumn("valid_from", col(ordCol))
      .withColumn("valid_to", col("_next_del"))
      .withColumn("is_current", col("_next_del").isNull)
      .drop("_next_del", "_slot_hash", ordCol, typeCol)
  }
}
