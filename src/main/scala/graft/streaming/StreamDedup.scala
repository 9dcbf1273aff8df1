package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the continuous counterpart of the batch
  * `Dedup.exactGroups` path (beyond-reference superset; the reference has
  * no streaming queries at all, `sql-processor/README.md:44-48`).
  *
  * State discipline at 100 TB-rates: a naive `dropDuplicates` on a stream
  * keeps every key ever seen — unbounded state. Both operators here bound
  * state with the watermark: a key is only held while a duplicate could
  * still arrive inside the delay horizon, so memory is rate × delay, not
  * stream age. That is the only formulation that survives an unbounded
  * ingest pipeline (the training-data case: near-real-time corpus feeds
  * where duplicates cluster in time — re-crawls, retries, mirror posts).
  */
object StreamDedup {

  /** Exact streaming dedup on normalized content: first record per content
    * hash inside the watermark horizon survives. `eventTimeCol` must be a
    * TimestampType column (not NTZ — Spark watermarks reject it). */
  def exactByContent(
      stream: DataFrame,
      textCol: String,
      eventTimeCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withColumn("_content_hash", md5(lower(trim(col(textCol)))))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("_content_hash")

  /** Keyed variant: dedup on explicit key columns (e.g. the Kafka-native
    * `(_topic, _partition, _offset)` replay identity the ETL sink also
    * dedups on — St3). */
  def byKeys(
      stream: DataFrame,
      eventTimeCol: String,
      watermarkDelay: String,
      keyCols: String*): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
