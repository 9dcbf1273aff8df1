package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-maintained additive aggregate (an incrementally-maintained
  * materialized view): per-key COUNT and SUM kept current as micro-batches
  * land, WITHOUT recomputing over the topic.
  *
  * Exactly-once by construction — merge-on-read, not read-modify-write:
  * each micro-batch appends its own PARTIAL aggregate rows stamped with
  * the streaming batch id; a replayed batch is dropped by an anti-join on
  * that id (same shape as the sink's offset-dedup), so a crash between
  * append and checkpoint commit can never double-count, and there is no
  * transactional coupling between an aggregate table and a cursor. The
  * read view merges partials with one hash aggregate; [[compact]]
  * periodically folds all partials into a single generation (atomic
  * directory swap via [[TableSink.compact]]'s machinery) so the partials
  * table stays ≈ |keys|, not |keys| × |batches|.
  *
  * Scale shape: the per-batch partial is a map-side-combined aggregate of
  * just that batch; what lands is |batch keys| rows, not records. The
  * read-side merge shuffles only the compact partials. This is how
  * incremental MV maintenance works at 100 TB: additive state, append-only
  * commits, merge on read, fold in the background.
  */
object AggMaintenance {

  /** Drain the KFS topic through a checkpointed stream, maintaining
    * per-`keyCols` count + sum of `valueCol` (a Column over the decoded
    * 7-column record frame, e.g. a json_value extraction). */
  def run(
      spark: SparkSession,
      kfsRoot: String,
      tablePath: String,
      checkpointDir: String,
      keyCols: Seq[String],
      valueCol: Column,
      maxSegmentsPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.format("kfs").option("path", kfsRoot)
    maxSegmentsPerTrigger.foreach(n =>
      reader.option("max_segments_per_trigger", n.toString))
    val decoded = reader.load().select(col("_topic"), col("_partition"),
      col("_offset"), col("_ts_ms"), col("_key"), col("_value"), col("_headers"))
    val query = decoded.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val partial = batch
          .withColumn("_v", valueCol.cast("double"))
          .groupBy(keyCols.map(col): _*)
          .agg(count(lit(1)).as("cnt"),
            sum(col("_v")).as("sum_v"))
          .withColumn("batch_id", lit(batchId))
        // replay guard: a batch id already in the table appends nothing
        val existing = TableSink.read(ss, tablePath)
        val deduped =
          if (existing.isEmpty) partial
          else partial.join(
            existing.select(col("batch_id")).distinct(),
            Seq("batch_id"), "left_anti")
        if (!deduped.isEmpty) TableSink.append(ss, tablePath, deduped)
      }
      .start()
    query.awaitTermination()
  }

  /** Current aggregate: one hash merge over the compact partials. */
  def read(spark: SparkSession, tablePath: String,
      keyCols: Seq[String]): DataFrame =
    TableSink.read(spark, tablePath)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_v")).as("sum_v"))

  /** Fold all partials into a single generation so the table stays
    * ≈ |keys|. The merged frame is stamped with the highest batch id seen,
    * preserving the replay guard across the fold; the swap itself is
    * [[TableSink.compact]]'s atomic-rename path, so readers never observe
    * a partially-folded table. */
  def compact(spark: SparkSession, tablePath: String,
      keyCols: Seq[String]): Unit = {
    val t = TableSink.read(spark, tablePath)
    if (t.isEmpty) return
    val merged = t
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_v")).as("sum_v"))
      .crossJoin(broadcast(t.agg(max(col("batch_id")).as("batch_id"))))
    TableSink.replace(spark, tablePath, merged)
  }
}
