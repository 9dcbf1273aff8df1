package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff between two versions of a keyed table — "what changed
  * between corpus v1 and v2": inserts (key only in the new version),
  * deletes (key only in the old), updates (key in both, compared columns
  * differ). The audit-side complement of the CDC feed: a changelog tells
  * you what a writer SAID it did, a diff tells you what ACTUALLY differs.
  *
  * Scale shape: each side is reduced MAP-SIDE to (key, row-hash) — the
  * compared payload never shuffles, only keys and 16-byte hashes — then
  * one full-outer hash join on the key classifies every row. Cost is one
  * shuffle per side regardless of row width. On co-located layouts
  * (bucketed tables, or the KFS catalog's storage-partitioned scans with
  * `_partition` in the key) even that exchange vanishes. Null-safe:
  * nulls hash as a typed sentinel, so null→value and value→null both
  * classify as updates.
  *
  * Keys must be unique within each version (the contract of a keyed
  * table; duplicate keys would make 'update' ill-defined).
  */
object Diff {

  /** Engine-portable row hash of `cols`: md5 over a 0x01-joined
    * canonical string form with an explicit null sentinel. */
  def rowHash(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("<null>"))): _*))

  /** Classify every key present in either version. Output: keyCols...,
    * `_diff_type` in ('insert' | 'delete' | 'update'); unchanged rows are
    * absent. */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val ah = a.select(keyCols.map(col) :+
      rowHash(compareCols.map(col)).as("_h_a"): _*)
    val bh = b.select(keyCols.map(col) :+
      rowHash(compareCols.map(col)).as("_h_b"): _*)
    ah.join(bh, keyCols, "full_outer")
      .withColumn("_diff_type",
        when(col("_h_b").isNull, "delete")
          .when(col("_h_a").isNull, "insert")
          .when(col("_h_a") =!= col("_h_b"), "update"))
      .where(col("_diff_type").isNotNull)
      .select(keyCols.map(col) :+ col("_diff_type"): _*)
  }
}
