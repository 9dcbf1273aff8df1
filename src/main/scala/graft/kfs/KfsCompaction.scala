package graft.kfs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log compaction — Kafka compacted-topic semantics (public Kafka docs:
  * per topic-partition, retain only the record with the highest offset
  * for each key; a tombstone — latest record with a null value — removes
  * the key entirely once cleaning passes it). The reference serves
  * Kafka-compatible topics, so a user switching to this engine needs the
  * compacted read view and a way to physically shrink a cold log.
  *
  * 100 TB shape: [[latestByKey]] is ONE hash aggregate on the grouping
  * key (`max_by` carries the payload, so there is no join-back and no
  * window sort — the t6 lesson applied); [[compact]] streams the
  * surviving records back out through the DSv2 write path, which plans
  * the clustering shuffle + per-task offset sort itself and publishes
  * the new segment estate with an atomic manifest flip. Original offsets
  * are PRESERVED (`require_dense=false`) — compacted logs are sparse by
  * definition, and consumers resume by the offsets they stored.
  */
object KfsCompaction {

  private val LogCols = Seq("_topic", "_partition", "_offset", "_ts",
    "_ts_ms", "_key", "_value", "_headers")

  /** Compacted view of a KFS log frame: the latest record per
    * (topic, partition, key); keyed tombstones drop their key; null-key
    * records pass through untouched (Kafka refuses them on compacted
    * topics — a log that somehow contains them must not lose data to an
    * optimization; they ride the aggregate under a per-record synthetic
    * grouping key instead of a second scan + union).
    *
    * Shape: groupBy(key).max(_offset) + semi-join back on the unique
    * (topic, partition, offset) — hash-only end to end (the t6 lesson).
    * The tempting one-pass `max_by(_value, _offset)` puts binary columns
    * in the aggregation buffer, which forces SortAggregate: a full sort
    * of the log by key. The offsets-only aggregate keeps a primitive
    * buffer (HashAggregate with map-side partials), and the semi-join is
    * hinted shuffle-hash so Catalyst never falls back to a sort-merge —
    * no operator in the plan sorts 100 TB. */
  def latestByKey(log: DataFrame): DataFrame = {
    val gk = when(col("_key").isNull,
        concat(lit("o:"), col("_partition").cast("string"), lit(":"),
          col("_offset").cast("string")))
      .otherwise(concat(lit("k:"), hex(col("_key"))))
    val src = log.select(LogCols.map(col): _*)
    val latest = src
      .groupBy(col("_topic"), col("_partition"), gk.as("_gk"))
      .agg(max(col("_offset")).as("_offset"))
      .select(col("_topic"), col("_partition"), col("_offset"))
    src.join(latest.hint("shuffle_hash"),
        Seq("_topic", "_partition", "_offset"), "left_semi")
      .where(col("_key").isNull || col("_value").isNotNull) // tombstones out
      .select(LogCols.map(col): _*)
  }

  /** Physically compact `srcRoot` into `dstRoot`: read the log, keep the
    * latest record per (topic, partition, key), rewrite through the DSv2
    * batch write (clustering shuffle, size-capped segments, sidecars,
    * atomic per-partition manifest commit). Rewrite-into-new-generation,
    * not in-place — the object-store-native shape (same as the Iceberg
    * replace-snapshot compaction): readers of the old root are never
    * disturbed, and the swap point is the caller flipping its root. */
  def compact(spark: SparkSession, srcRoot: String, dstRoot: String): Unit =
    latestByKey(spark.read.format("kfs").option("path", srcRoot).load())
      .write.format("kfs").mode("append")
      .option("path", dstRoot)
      .option("require_dense", "false")
      .save()
}
