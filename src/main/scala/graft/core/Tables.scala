package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table + topic access layer.
  *
  * The reference engine (KafScale sql-processor) exposes every Kafka topic as
  * a relation with eight implicit columns — `_topic _partition _offset _ts
  * _key _value _headers _segment` (reference: `addons/processors/
  * sql-processor/internal/server/server.go:1503-1512`, SURVEY §1.2). Here the
  * driver's deterministic parquet tables play the role of topics: `events` is
  * materialized as a topic view with those implicit columns synthesized
  * deterministically, so every KAFSQL operator (LAST / TAIL / WITHIN /
  * json_value / …) is exercisable against a DuckDB oracle over the very same
  * parquet files.
  *
  * Scale note: every implicit column, including `_offset`, is a narrow
  * scan-projection expression (no shuffle — see [[eventsTopic]] for why the
  * offset is pure arithmetic on this fixture). On real KFS segments the
  * offset comes from the log itself (see `graft.kfs`) and costs nothing.
  */
object Tables {

  val TopicPartitions = 4

  /** Runtime-settable confs every graft session needs. Spark 4 rejects
    * parquet TIMESTAMP(NANOS) unless read as long (SPARK-40819 legacy flag);
    * the driver's `events.parquet` carries ns timestamps.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` as a usable NTZ timestamp plus `ts_ms` epoch ms.
    *
    * The driver's parquet has shipped `ts` in two physical layouts across
    * testdata generations: TIMESTAMP(NANOS) (read as long via the
    * SPARK-40819 legacy flag) and TIMESTAMP(MICROS) (read natively as
    * timestamp / timestamp_ntz). Branch on the loaded dtype so both work —
    * the derived `ts`/`ts_ms` values are identical either way, and the
    * DuckDB oracle's `epoch_ms(ts)` agrees with both.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // ns-as-long legacy layout
        raw
          .withColumn("ts_ms", expr("ts div 1000000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => // TIMESTAMP / TIMESTAMP_NTZ (µs); session tz is UTC so the
        // cast chain below is value-preserving in both directions.
        raw
          .withColumn("ts_ms", expr("unix_micros(cast(ts as timestamp)) div 1000"))
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** `events` parquet as a Kafka-like topic with the 8 implicit columns.
    * Deterministic synthesis (mirrored 1:1 by [[eventsTopicSql]] for DuckDB):
    *   _partition = event_id % 4
    *   _offset    = dense per-partition row number ordered by event_id.
    *                event_ids are dense from 0 (driver testdata invariant,
    *                asserted by RelationalSpec's density test), so this is
    *                `event_id div 4` — pure arithmetic in the scan
    *                projection. The window formulation it replaces forced
    *                ALL rows into 4 sort tasks per query (the partition-key
    *                cardinality), which is the anti-plan at 100 TB; the
    *                oracle CTE deliberately keeps the independent
    *                row_number() formulation, so the equivalence is itself
    *                hash-checked by every events-topic query.
    *   _ts        = ts (µs, NTZ) with `_ts_ms` epoch-ms twin for arithmetic
    *   _key       = 'user-' || user_id          (string; reference uses bytes)
    *   _value     = props                        (JSON payload)
    *   _headers   = map('src' -> event_type)
    *   _segment   = synthetic segment name by offset range (1000 records/seg)
    */
  def eventsTopic(spark: SparkSession, sfDir: String): DataFrame = {
    val part = (col("event_id") % TopicPartitions).cast("int")
    events(spark, sfDir)
      .withColumn("_topic", lit("events"))
      .withColumn("_partition", part)
      .withColumn("_offset", expr(s"event_id div $TopicPartitions"))
      .withColumn("_ts", col("ts"))
      .withColumn("_ts_ms", col("ts_ms"))
      .withColumn("_key", concat(lit("user-"), col("user_id").cast("string")))
      .withColumn("_value", col("props"))
      .withColumn("_headers", map(lit("src"), col("event_type")))
      .withColumn(
        "_segment",
        concat(
          lit("events/"), col("_partition").cast("string"), lit("/segment-"),
          lpad((col("_offset") - col("_offset") % 1000).cast("string"), 20, "0"),
          lit(".kfs")))
  }

  /** DuckDB CTE computing the identical topic view — prefix for oracle SQL.
    * DuckDB reads the ns timestamps natively; `epoch_ms` matches `ts div 1e6`.
    */
  val eventsTopicSql: String =
    """events_topic AS (
      |  SELECT 'events' AS _topic,
      |         CAST(event_id % 4 AS INTEGER) AS _partition,
      |         CAST(row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS _offset,
      |         ts AS _ts,
      |         epoch_ms(ts) AS _ts_ms,
      |         'user-' || CAST(user_id AS VARCHAR) AS _key,
      |         props AS _value,
      |         'events/' || CAST(event_id % 4 AS VARCHAR) || '/segment-' ||
      |           lpad(CAST((row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1) -
      |                     (row_number() OVER (PARTITION BY event_id % 4 ORDER BY event_id) - 1) % 1000 AS VARCHAR), 20, '0') ||
      |           '.kfs' AS _segment,
      |         event_id, user_id, event_type, value
      |  FROM events
      |)""".stripMargin

  /** Wrap a query body with the events-topic CTE. */
  def withEventsTopic(body: String): String =
    s"WITH $eventsTopicSql\n$body"

  /** Fixed "now" injected for LAST-window queries so the oracle is
    * reproducible (the reference's LAST is wall-clock relative,
    * `server.go:1368-1384`; its own result cache has the same
    * non-determinism). 2024-01-31 00:00:00 UTC — just past max(events.ts). */
  val FixedNowMs: Long = 1706659200000L
  val FixedNowSql: String = "TIMESTAMP '2024-01-31 00:00:00'"
}
