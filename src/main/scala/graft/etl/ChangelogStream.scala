package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Checkpointed consumption of an Iceberg CHANGELOG — a CDC subscription
  * pulled as micro-batches: each [[drain]] reads exactly the commits that
  * landed since the checkpointed snapshot, appends them to a parquet CDC
  * sink, and advances the checkpoint; the first drain is the initial load
  * (full history as inserts). The Iceberg analog of the KFS micro-batch
  * stream's offset WAL (`kfs/KfsStreamV2.scala`): the durable cursor here
  * is a SNAPSHOT ID, because Iceberg's unit of atomic change is the
  * commit, not a record offset.
  *
  * Exactly-once delivery without a transactional sink:
  *   1. write the batch tagged with `_commit_snapshot_id`;
  *   2. THEN advance the checkpoint (temp file + atomic rename).
  * A crash between the two re-reads the same range next drain, and the
  * replay filter — drop commits whose snapshot id already appears in the
  * sink — makes the retry a no-op. The filter reads ONE small column of
  * the sink (columnar prune), and at scale would be replaced by sink
  * partitioning on `_commit_snapshot_id` (overwrite-by-partition is then
  * naturally idempotent).
  *
  * Cost ∝ the changes: planning is metadata-only (lineage walk + each
  * in-range snapshot's own manifests), compaction commits in range emit
  * nothing, and an up-to-date subscription returns without touching data.
  */
object ChangelogStream {

  /** Pull everything committed since the last drain into `sinkDir`.
    * Returns the number of newly processed commits (0 = already caught
    * up; replace commits count — they advance the cursor — but emit no
    * rows). */
  def drain(spark: SparkSession, table: String, sinkDir: String,
      checkpointFile: String): Int = {
    val m = IcebergSink.load(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no Iceberg table at $table"))
    val current = m.currentSnapshotId.getOrElse(return 0)
    val last = readCheckpoint(checkpointFile)
    if (last.contains(current)) return 0
    val feed = IcebergSink.readChangelogFrom(spark, table, last, Some(current))

    // replay guard: ids already landed in the sink (crash after write,
    // before checkpoint advance)
    val sinkPath = Paths.get(sinkDir)
    val sinkHasData = Files.isDirectory(sinkPath) && {
      val s = Files.list(sinkPath)
      try s.anyMatch(p => p.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val seen: Set[Long] =
      if (sinkHasData)
        spark.read.parquet(sinkDir).select(col("_commit_snapshot_id"))
          .distinct().collect().map(_.getLong(0)).toSet
      else Set.empty
    val fresh =
      if (seen.isEmpty) feed
      else feed.where(!col("_commit_snapshot_id").isin(seen.toSeq: _*))
    fresh.write.mode("append").parquet(sinkDir)

    writeCheckpoint(checkpointFile, current)
    // commits advanced past (by lineage distance), for observability
    val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
    Iterator.iterate(byId.get(current))(_.flatMap(_.parentId).flatMap(byId.get))
      .takeWhile(c => c.isDefined && !last.contains(c.get.snapshotId))
      .size
  }

  def readCheckpoint(path: String): Option[Long] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
  }

  def writeCheckpoint(path: String, snapshotId: Long): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, snapshotId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
