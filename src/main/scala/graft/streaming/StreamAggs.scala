package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation — the continuous counterpart of the
  * reference's LAST-window aggregates (which are wall-clock at query time,
  * St5): tumbling/sliding windows over event time with late-data handling,
  * state bounded by the watermark.
  *
  * At 100 TB-rates state is (keys × windows-in-watermark-horizon), not
  * history: the watermark evicts closed windows, so memory is bounded by
  * rate × delay regardless of stream age.
  */
object StreamAggs {

  /** Tumbling-window counts per key. Input needs `ts` (TimestampType) and
    * `key`. Append mode emits each window once, when the watermark passes
    * its end. */
  def tumblingCounts(
      events: DataFrame,
      windowDur: String,
      watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("value").cast("double")).as("sum_v"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("key"), col("cnt"), col("sum_v"))

  /** Sliding-window variant (length, slide). */
  def slidingCounts(
      events: DataFrame,
      windowDur: String,
      slideDur: String,
      watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("key"), col("cnt"))
}
