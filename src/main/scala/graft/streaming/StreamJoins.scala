package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous-query superset of the reference's bounded WITHIN join
  * (SURVEY §2.9 St5): the reference re-scans history per query and has no
  * event-time watermarks; on Structured Streaming the same `|l.ts − r.ts| ≤
  * w` band becomes a stream-stream interval join whose state is bounded by
  * watermarks — the idiomatic continuous form of
  * `SELECT … FROM a JOIN b ON … WITHIN w LAST …`.
  *
  * State math (what makes this safe at scale): each side keeps only rows
  * within `watermark + within` of the max seen event time, so state size is
  * rate × (delay + band), independent of total history.
  */
object StreamJoins {

  /** Inner continuous WITHIN join on an equi-key with a symmetric time band.
    * `left`/`right` must carry `key` and an event-time column `ts`
    * (TimestampType). Columns are emitted as l_/r_ prefixed. */
  def within(
      left: DataFrame,
      right: DataFrame,
      withinMs: Long,
      watermarkDelay: String = "10 seconds",
      joinType: String = "inner"): DataFrame = {

    val l = left.select(col("key").as("l_key"), col("ts").as("l_ts"),
      col("value").as("l_value"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(col("key").as("r_key"), col("ts").as("r_ts"),
      col("value").as("r_value"))
      .withWatermark("r_ts", watermarkDelay)

    val band = expr(
      s"""l_key = r_key AND
         |r_ts >= l_ts - INTERVAL ${withinMs / 1000.0} SECONDS AND
         |r_ts <= l_ts + INTERVAL ${withinMs / 1000.0} SECONDS""".stripMargin)
    l.join(r, band, joinType)
  }
}
