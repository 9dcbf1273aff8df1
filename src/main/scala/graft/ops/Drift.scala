package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus versions — the ML-ops
  * check that the data feeding a model still looks like the data it was
  * trained on: the Population Stability Index over fixed-width bins,
  * `PSI = Σ (p_b − q_b) · ln(p_b / q_b)`. Composes with Iceberg time
  * travel: `base` = the snapshot a model was trained against (a tagged
  * ref), `current` = what has landed since ([[graft.etl.IcebergSink
  * .readIncremental]]), so "did ingest drift" is a metadata-planned
  * two-aggregate query.
  *
  * Determinism: bins are FIXED-width over a declared [lo, hi) domain
  * (values outside clamp to the edge bins; NULLs land in their own
  * `bin = -1` missing-category — a null-rate explosion is a canonical
  * ingest failure and must move the index, not silently renormalize
  * away), counts are integers, and both proportions carry +1 Laplace
  * smoothing — `p_b = (c_b + 1)/(n + bins + 1)` — so no bin is ever empty
  * and `ln` never sees zero; the log is rounded to 6 dp at birth (the
  * cross-engine libm guard used repo-wide).
  *
  * 100 TB shape: one map-side-combined hash aggregate per side over the
  * pruned metric column (bins-many rows out), a bins-sized join, no
  * windows, no sort. */
object Drift {

  /** Per-bin drift rows: bin (−1 = the NULL/missing category, with null
    * edges), [lo, hi) edges, both counts, both smoothed proportions, and
    * the bin's rounded PSI contribution. Sum `psi_term` for the index
    * (> 0.25 is the conventional "major shift" alarm). */
  def psiBins(base: DataFrame, current: DataFrame, valCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, s"need a positive domain, got [$lo,$hi)x$bins")
    val width = (hi - lo) / bins
    // the null test must be EXPLICIT: Spark's greatest/least SKIP null
    // arguments (null only when all inputs are null), so a
    // coalesce-around-clamp would quietly count nulls in bin 0
    def binned(df: DataFrame, cnt: String) = df
      .select(when(col(valCol).isNull, lit(-1))
        .otherwise(least(greatest(
          floor((col(valCol).cast("double") - lit(lo)) / lit(width)), lit(0L)),
          lit(bins - 1L)).cast("int")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    val grid = base.sparkSession.range(-1, bins)
      .select(col("id").cast("int").as("bin"))
    val joined = grid
      .join(binned(base, "base_cnt"), Seq("bin"), "left")
      .join(binned(current, "cur_cnt"), Seq("bin"), "left")
      .na.fill(0L, Seq("base_cnt", "cur_cnt"))
    val nb = sum(col("base_cnt")).over()
    val nc = sum(col("cur_cnt")).over()
    // window-total over a bins-sized frame: the frame is `bins + 1` rows,
    // not the corpus, so the single-partition window is a constant step
    val p = (col("base_cnt") + 1).cast("double") / (nb + lit(bins + 1))
    val q = (col("cur_cnt") + 1).cast("double") / (nc + lit(bins + 1))
    joined
      .withColumn("bin_lo", when(col("bin") >= 0,
        round(lit(lo) + col("bin") * lit(width), 6)))
      .withColumn("bin_hi", when(col("bin") >= 0,
        round(lit(lo) + (col("bin") + 1) * lit(width), 6)))
      .withColumn("p", p).withColumn("q", q)
      .withColumn("psi_term",
        round((col("p") - col("q")) * round(log(col("p") / col("q")), 6), 8))
      .select(col("bin"), col("bin_lo"), col("bin_hi"), col("base_cnt"),
        col("cur_cnt"), round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        col("psi_term"))
  }
}
