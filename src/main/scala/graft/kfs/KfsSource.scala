package graft.kfs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark scan over KFS segment logs → the 8 implicit topic columns
  * (SURVEY §1.2; reference `server.go:1503-1512`).
  *
  * v0 physical strategy: `binaryFile` source + per-file `flatMap` decode.
  * Each segment file is one task — with the reference's flush policy capping
  * segments at a few hundred MB this gives natural 100-TB parallelism
  * (≈ 400k tasks at 256 MB/segment), and the whole-file read matches how the
  * reference decodes (it always downloads the full segment,
  * `decoder.go:58-131`). Driver-side pruning (topic/partition/offset/time via
  * [[KfsLayout.prune]]) happens before the scan, so Spark never opens a
  * segment whose stats exclude the predicate — the moral equivalent of the
  * reference's `filterSegments` + our file-stats data skipping.
  */
object KfsSource {

  /** Decoded topic row. LocalDateTime → TimestampNTZ (µs, UTC semantics). */
  final case class TopicRow(
      _topic: String,
      _partition: Int,
      _offset: Long,
      _ts: java.time.LocalDateTime,
      _ts_ms: Long,
      _key: Array[Byte],
      _value: Array[Byte],
      _headers: Map[String, String],
      _segment: String)

  /** Scan `root` (optionally pruned) into a topic DataFrame. */
  def read(
      spark: SparkSession,
      root: String,
      topics: Option[Set[String]] = None,
      partitions: Option[Set[Int]] = None,
      offsetRange: Option[(Long, Long)] = None,
      tsRangeMs: Option[(Long, Long)] = None): DataFrame = {

    val refs0 = KfsLayout.listCompleted(root, topics, partitions)
    val refs = KfsLayout.prune(refs0,
      offsetRange.map(_._1), offsetRange.map(_._2),
      tsRangeMs.map(_._1), tsRangeMs.map(_._2))
    if (refs.isEmpty) return emptyTopicFrame(spark)

    import spark.implicits._
    val ds: Dataset[TopicRow] = spark.read.format("binaryFile")
      .load(refs.map(_.path): _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val (topic, partition) = topicPartitionOf(path)
        KfsCodec.decodeSegment(content).map { r =>
          TopicRow(
            topic, partition, r.offset,
            java.time.LocalDateTime.ofEpochSecond(
              r.timestampMs / 1000, (r.timestampMs % 1000).toInt * 1000000,
              java.time.ZoneOffset.UTC),
            r.timestampMs,
            r.key, r.value,
            // reference renders headers as a JSON object → duplicate keys
            // collapse last-wins (`server.go:2810-2828`)
            r.headers.map(h => h.k -> (if (h.v == null) null else new String(h.v, "UTF-8"))).toMap,
            path)
        }
      }
    val df = ds.toDF()
    // residual record-level bounds (segments only prune at file granularity)
    val withOff = offsetRange.fold(df) { case (lo, hi) =>
      df.filter(col("_offset") >= lo && col("_offset") <= hi)
    }
    tsRangeMs.fold(withOff) { case (lo, hi) =>
      withOff.filter(col("_ts_ms") >= lo && col("_ts_ms") <= hi)
    }
  }

  def topicPartitionOf(path: String): (String, Int) = {
    // .../{topic}/{partition}/segment-*.kfs (file:// URI or plain path)
    val parts = path.stripPrefix("file:").split('/').filter(_.nonEmpty)
    (parts(parts.length - 3), parts(parts.length - 2).toInt)
  }

  def emptyTopicFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[TopicRow].toDF()
  }
}
