package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series RESAMPLING with gap fill — the "regularize this event
  * stream" pipeline step (metric rollups, training-feature grids): bucket
  * an event stream onto a fixed interval per key, materialize the missing
  * buckets, and forward-fill each key's last observation across its gaps.
  *
  * Scale shape: one (key, bucket) hash aggregate; the grid generates from
  * each key's OWN [min, max] span (`sequence` + explode — no global time
  * range, so one long-lived key cannot explode every key's grid); the
  * gap join is key-bucket co-partitioned; the fill is a per-key running
  * `last(ignoreNulls)` window — per-shard sort, never a global one. Grid
  * size is spans/interval, independent of event count: at 100 TB of
  * events the resampled frame is usually orders of magnitude smaller.
  *
  * The bucket sum runs in DECIMAL so results are bit-reproducible (a
  * double sum depends on partition order); `filled` marks synthesized
  * rows. */
object Resample {

  /** Resample `df` to `intervalMs` buckets of `sum(valCol)` per `keyCol`,
    * forward-filling empty buckets from the key's last non-empty one.
    * Output: (keyCol, bucket, filled, val) — bucket = epochMs div
    * intervalMs, val = DECIMAL(18,4) sum cast to double. */
  def ffill(df: DataFrame, keyCol: String, tsMsCol: String, valCol: String,
      intervalMs: Long): DataFrame = {
    val bucketed = df
      .groupBy(col(keyCol),
        expr(s"`$tsMsCol` div $intervalMs").as("bucket")) // exact int div
      .agg(sum(col(valCol).cast("decimal(18,4)")).as("v"))
    val spans = bucketed.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .withColumn("filled", col("v").isNull)
      .withColumn("val", last(col("v"), ignoreNulls = true).over(w)
        .cast("double"))
      .drop("v")
  }
}
