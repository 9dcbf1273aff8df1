package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiler: per-column row count, null count,
  * value-length envelope, and a KMV distinct-count estimate — the
  * statistics a planner (or a data-quality gate watching a 100 TB ingest)
  * wants.
  *
  * Shape: columns are melted to (col_name, val) rows with a single
  * `stack` projection — narrow, codegen'd — so every per-column statistic
  * becomes a per-GROUP aggregate of one stacked frame. Two passes over
  * that pruned projection (a plain aggregate for the counts; distinct →
  * rank-filter (WindowGroupLimit) → aggregate for the sketch) — constant
  * in the number of profiled columns, where the per-column-job
  * alternative re-reads the table once per column and at 100 TB the scan
  * is the cost. The NDV sketch shuffles ≤ k hashes per column where
  * exact NDV would shuffle every distinct value.
  *
  * Values are profiled through their string casts (hash domain must be
  * engine-portable); doubles are excluded by callers when cross-engine
  * string formatting matters (see `t21_table_profile`).
  */
object Profiler {

  /** Profile `cols` (string-castable) of `df`. Output, one row per
    * column: (col_name, n_rows, n_nulls, min_len, max_len, ndv_kmv). */
  def profile(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    val pairs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val stacked = df.select(
      expr(s"stack(${cols.size}, $pairs) AS (col_name, val)"))

    // per-column counts + length envelope: one aggregate over the stack
    val counts = stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col("val"))).as("n_nulls"),
      min(length(col("val"))).as("min_len"),
      max(length(col("val"))).as("max_len"))

    // KMV NDV per column over the same stacked frame (nulls excluded —
    // NDV counts values). Inlined rather than via Sketches.kmvSketch so
    // the profile is one plan over one stack.
    val hashed = stacked.where(col("val").isNotNull)
      .select(col("col_name"), Sketches.hash60(col("val")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("col_name")).orderBy(col("h"))
    val ndv = hashed.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy(col("col_name"))
      .agg(sort_array(collect_list(col("h"))).as("kmv"),
        count(lit(1)).cast("int").as("n_kept"))
      .select(col("col_name"),
        Sketches.kmvEstimate(col("kmv"), col("n_kept"), k).as("ndv_kmv"))

    counts.join(ndv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("min_len"), col("max_len"),
        coalesce(col("ndv_kmv"), lit(0L)).as("ndv_kmv"))
  }
}
