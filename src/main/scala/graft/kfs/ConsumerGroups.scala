package graft.kfs

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Consumer-group committed offsets + lag over the KFS estate — the
  * metadata half of the reference's group coordinator re-expressed for an
  * analytics engine.
  *
  * The reference persists one record per (group, topic, partition) under
  * the etcd key `/kafscale/consumers/<group>/offsets/<topic>/<partition>`
  * with `{offset, metadata, committed_at}` and last-write-wins Put
  * semantics (`pkg/metadata/etcd_store.go:175-196`); a fetch of an
  * uncommitted partition returns offset 0, not an error
  * (`etcd_store.go:199-211`). The rebalance/generation state machine
  * around commits (`pkg/broker/coordinator.go:353-397`) is a Kafka-client
  * liveness concern and stays out of scope (SURVEY St6) — Spark's own
  * scheduler replaces member leases. What an analytics engine DOES need
  * from groups is the data: committed positions and consumer lag.
  *
  * Here the store is one JSON file per (group, topic, partition) under
  * `<root>/_groups/…` on the same Hadoop `FileSystem` as the segment
  * estate (file/hdfs/s3a). Lag is METADATA-ONLY: the log-end offset comes
  * from the partition manifests' max committed offset + 1 — at 100 TB a
  * lag report over thousands of partitions reads a few KB of manifests
  * and zero segment bytes.
  */
object ConsumerGroups {

  final case class Committed(
      group: String, topic: String, partition: Int,
      offset: Long, metadata: String, committedAtMs: Long)

  private def offsetPath(root: String, group: String, topic: String,
      partition: Int): HPath =
    new HPath(new HPath(new HPath(new HPath(root, "_groups"), group),
      s"offsets/$topic"), s"$partition.json")

  private def fsFor(p: HPath): FileSystem =
    p.getFileSystem(KfsLayout.hadoopConf)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Last-write-wins commit (the etcd Put, `etcd_store.go:180-196`):
    * temp-write + rename so a concurrent fetch never reads a torn file. */
  def commit(root: String, group: String, topic: String, partition: Int,
      offset: Long, metadata: String = "",
      nowMs: Long = System.currentTimeMillis()): Unit = {
    val p = offsetPath(root, group, topic, partition)
    val fs = fsFor(p)
    fs.mkdirs(p.getParent)
    val json =
      s"""{"offset":$offset,"metadata":"${esc(metadata)}","committed_at_ms":$nowMs}"""
    val tmp = new HPath(p.getParent, s".${p.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"cannot commit offset at $p")
    }
  }

  /** Committed offset, or None when the group never committed this
    * partition — callers defaulting to 0 get the reference's fetch
    * semantics (`etcd_store.go:206-208` returns 0 for a missing key). */
  def fetch(root: String, group: String, topic: String, partition: Int)
      : Option[Committed] = {
    val p = offsetPath(root, group, topic, partition)
    val fs = fsFor(p)
    if (!fs.exists(p)) return None
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val body = new String(bytes, StandardCharsets.UTF_8)
    def field(n: String): Option[String] =
      s""""$n"\\s*:\\s*("(?:[^"\\\\]|\\\\.)*"|-?\\d+)""".r
        .findFirstMatchIn(body).map(_.group(1))
    val off = field("offset").map(_.toLong).getOrElse(
      throw new java.io.IOException(s"malformed offset record at $p"))
    val meta = field("metadata").map { raw =>
      val inner = raw.stripPrefix("\"").stripSuffix("\"")
      val sb = new StringBuilder
      var i = 0
      while (i < inner.length) {
        val c = inner.charAt(i)
        if (c == '\\' && i + 1 < inner.length) {
          inner.charAt(i + 1) match {
            case 'u' if i + 5 < inner.length =>
              sb.append(Integer.parseInt(inner.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case e => sb.append(e); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }.getOrElse("")
    val at = field("committed_at_ms").map(_.toLong).getOrElse(0L)
    Some(Committed(group, topic, partition, off, meta, at))
  }

  /** Groups that have committed anything under this root. */
  def listGroups(root: String): Seq[String] = {
    val dir = new HPath(root, "_groups")
    val fs = fsFor(dir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
  }

  private val lagSchema = StructType(Seq(
    StructField("group", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("committed_offset", LongType, nullable = false),
    StructField("log_end_offset", LongType, nullable = false),
    StructField("lag", LongType, nullable = false)))

  /** One poll of the Kafka consume loop as a batch frame: records from
    * each partition's committed offset (0 when never committed —
    * `etcd_store.go:206-208`) capped at `maxPerPartition`, in offset
    * order — the fetch-RPC bound re-expressed for incremental batch jobs
    * (the broker fetch path itself, S7, stays out of scope).
    *
    * Scale shape: the global `_offset >= min(committed)` bound is a plain
    * pushable predicate (segments prune via manifest stats before any
    * read); the per-partition committed positions apply via a broadcast
    * join against the tiny offsets frame; the cap is a per-partition
    * rank window that truncates map-side (WindowGroupLimit) — no global
    * sort, no shuffle of more than `partitions × maxPerPartition` rows. */
  def consume(spark: SparkSession, root: String, group: String,
      topic: String, maxPerPartition: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val refs = KfsLayout.listCompletedCached(root, Some(Set(topic)))
    val parts = refs.map(_.partition).distinct.sorted
    val committed = parts.map(p =>
      p -> fetch(root, group, topic, p).map(_.offset).getOrElse(0L))
    if (committed.isEmpty) return KfsSource.emptyTopicFrame(spark)
    val cdf = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        committed.map { case (p, o) => Row(p, o) }: _*)),
      StructType(Seq(StructField("_cpart", IntegerType, nullable = false),
        StructField("_coff", LongType, nullable = false))))
    val w = Window.partitionBy(col("_partition")).orderBy(col("_offset"))
    KfsSource.read(spark, root, Some(Set(topic)))
      .filter(col("_offset") >= committed.map(_._2).min) // pushable prune
      .join(broadcast(cdf), col("_partition") === col("_cpart") &&
        col("_offset") >= col("_coff"))
      .drop("_cpart", "_coff")
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxPerPartition)
      .drop("_rk")
  }

  /** Advance the group past a consumed batch: per partition, commit
    * max(_offset) + 1 (the next-to-read position, Kafka's commit
    * convention). The aggregate collapses to one row per partition before
    * the driver sees it. */
  def commitConsumed(root: String, group: String, topic: String,
      batch: DataFrame,
      nowMs: Long = System.currentTimeMillis()): Unit = {
    import org.apache.spark.sql.functions._
    batch.groupBy(col("_partition"))
      .agg(max(col("_offset")).as("m")).collect()
      .foreach { r =>
        commit(root, group, topic, r.getInt(0), r.getLong(1) + 1,
          nowMs = nowMs)
      }
  }

  /** Kafka's `offsetsForTimes`: per partition, the earliest offset whose
    * timestamp is >= `tsMs` (partitions with no such record are absent —
    * the client's null). The ts lower bound pushes into the DSv2 scan, so
    * segments whose `.kfst` max timestamp predates the target never read
    * — on a month-long estate a seek near the tail touches the tail
    * segments only. */
  def offsetsForTimes(spark: SparkSession, root: String, topic: String,
      tsMs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    KfsSource.read(spark, root, Some(Set(topic)),
        tsRangeMs = Some((tsMs, Long.MaxValue)))
      .groupBy(col("_partition").as("partition"))
      .agg(min(col("_offset")).as("offset"))
  }

  /** Seek the group to a point in time: commit each partition's
    * `offsetsForTimes` position (the replay-from-timestamp operation —
    * reprocess everything since T). Partitions with no record at/after
    * `tsMs` are left uncommitted/unchanged, mirroring the client
    * convention of skipping null seek results. */
  def seekToTime(root: String, group: String, topic: String, tsMs: Long,
      spark: SparkSession,
      nowMs: Long = System.currentTimeMillis()): Unit =
    offsetsForTimes(spark, root, topic, tsMs).collect().foreach { r =>
      commit(root, group, topic, r.getInt(0), r.getLong(1), nowMs = nowMs)
    }

  /** One group × partition committed position, lag included. */
  final case class GroupPosition(group: String, topic: String,
      partition: Int, committedOffset: Long, metadata: String,
      committedAtMs: Long, logEndOffset: Long) {
    def lag: Long = logEndOffset - committedOffset
  }

  /** Every group's per-partition position on `topic` — the ListGroups
    * (key 16) + DescribeGroups (key 15) + OffsetFetch (key 9) data halves
    * in one metadata-only pass (`pkg/broker/coordinator.go:425-486,
    * 614-652`): manifests give each partition's log-end, one tiny JSON
    * per committed partition gives the position; never a segment byte.
    * Partitions a group never committed read as offset 0 with empty
    * metadata (`etcd_store.go:206-208`), so lag there is the full log —
    * exactly what `kafka-consumer-groups.sh --describe` reports. */
  def describeGroups(root: String, topic: String): Seq[GroupPosition] =
    listGroups(root).flatMap(g => groupPositions(root, g, topic))

  /** The ONE place the high-water-mark / committed-default arithmetic
    * lives (log end = manifest max offset + 1; uncommitted partitions
    * read offset 0 with empty metadata, the reference's fetch default) —
    * `describeGroups`, `lag`, and through them SHOW GROUPS / DESCRIBE
    * GROUP all serve these positions, so the rule cannot drift between
    * surfaces. Metadata-only: manifests + one tiny JSON per commit. */
  def groupPositions(root: String, group: String, topic: String)
      : Seq[GroupPosition] = {
    val refs = KfsLayout.listCompletedCached(root, Some(Set(topic)))
    refs.groupBy(_.partition).view
      .mapValues(_.map(_.lastOffset).max + 1).toSeq.sortBy(_._1)
      .map { case (p, logEnd) =>
        val c = fetch(root, group, topic, p)
        GroupPosition(group, topic, p, c.map(_.offset).getOrElse(0L),
          c.map(_.metadata).getOrElse(""),
          c.map(_.committedAtMs).getOrElse(0L), logEnd)
      }
  }

  /** Per-partition lag for `group` on `topic` as a DataFrame — the same
    * [[groupPositions]] arithmetic, framed. */
  def lag(spark: SparkSession, root: String, group: String, topic: String)
      : DataFrame = {
    val rows = groupPositions(root, group, topic).map(gp =>
      Row(gp.group, gp.topic, gp.partition, gp.committedOffset,
        gp.logEndOffset, gp.lag))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      lagSchema)
  }
}
