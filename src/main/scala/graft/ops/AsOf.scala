package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — each left row picks the single latest right row with
  * `r.ts <= l.ts` for the same key; unmatched left rows keep NULLs (LEFT
  * semantics). The stream-history lookup the reference's WITHIN band join
  * approximates (SURVEY §2.5), but exact: "the state as of this event" —
  * feature values, latest model version, last error before a purchase.
  *
  * Physical strategy (the 100 TB shape): UNION the sides, shuffle ONCE on
  * the key, and run an `ignoreNulls` running `last` over (ts, side) within
  * each key partition. No range cross-product and no per-row binary search:
  * cost is one shuffle + one sort, independent of how long the right-side
  * history is — a banded `WITHIN` join degrades quadratically as the band
  * widens, this does not. Ties on (key, ts) among right rows are resolved
  * BEFORE the union (one row per (key, ts), greatest pick value) so results
  * are deterministic and oracle-checkable against DuckDB's native ASOF JOIN.
  */
object AsOf {

  /** Left-as-of-join `right` onto `left`.
    *
    * @param keyCol equality key present on both sides
    * @param tsCol  ordering column present on both sides (numeric or ts)
    * @param pick   right-side columns to carry; emitted as `asof_<name>`
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      pick: Seq[String]): DataFrame =
    joinImpl(left, right, keyCol, tsCol, pick, forward = false)

  /** Forward variant: each left row picks the single EARLIEST right row
    * with `r.ts >= l.ts` (inclusive) — "the next event at-or-after": next
    * error following a purchase, next deploy after a commit. Identical
    * one-shuffle physical shape, with the scan direction reversed. */
  def joinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, pick: Seq[String]): DataFrame =
    joinImpl(left, right, keyCol, tsCol, pick, forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, pick: Seq[String], forward: Boolean): DataFrame = {
    require(pick.nonEmpty, "pick at least one right-side column")
    val asofNames = pick.map("asof_" + _)
    // one row per (key, ts): greatest pick values — removes ordering ties.
    // ALL pick columns ride in ONE never-null struct: the running last()
    // must treat "matched right row whose value is NULL" as a real match
    // (emit the NULL, exactly like a native ASOF join), not skip back to a
    // farther row's value — and with several pick columns a per-column
    // last() could stitch values from different right rows.
    val rDedup = right.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(pick.head)).as(asofNames.head),
        pick.tail.map(c => max(col(c)).as("asof_" + c)): _*)
      .select(col(keyCol), col(tsCol),
        struct(asofNames.map(col): _*).as("_asof_payload"))
      .withColumn("_is_left", lit(0))
    val lPrep = left.withColumn("_is_left", lit(1))
    val u = lPrep.unionByName(rDedup, allowMissingColumns = true)

    // right rows sort before left rows at equal ts, so an exactly-
    // simultaneous right row IS visible (both directions are inclusive);
    // forward scans ts DESC, so the running `last` is the earliest
    // at-or-after instead of the latest at-or-before
    val ord = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ord, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("_asof_payload",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
    asofNames.foldLeft(filled) { (df, c) =>
        df.withColumn(c, col("_asof_payload").getField(c))
      }
      .filter(col("_is_left") === 1)
      .drop("_is_left", "_asof_payload")
  }
}
