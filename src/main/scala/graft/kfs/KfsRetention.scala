package graft.kfs

import org.apache.hadoop.fs.{Path => HPath}

/** Kafka `retention.ms` semantics on the KFS segment estate: delete whole
  * COMPLETED segments whose newest record (`maxTsMs`) is older than the
  * cutoff, per (topic, partition). Retention is segment-granular by design
  * — exactly Kafka's contract: a segment lives until its newest record
  * expires, so a retained segment may still hold some records older than
  * the cutoff (readers apply `_ts` predicates for exact bounds; the scan
  * path already pushes them).
  *
  * Ordering: each partition's manifest FLIPS ATOMICALLY FIRST (manifest
  * readers stop planning doomed segments immediately), then data +
  * `.kfst`/`.kfsb` sidecars delete. A crash between the two strands
  * orphan files (re-running `enforce` reclaims them), never a manifest
  * pointing at deleted data. LIST-discovery readers observe deletions at
  * the next TTL refresh; an in-flight scan holding refs to a deleted
  * segment fails like a Kafka consumer past the retention horizon — the
  * inherent race of time-based retention, not a defect. Cost is
  * metadata-only: one listing + one manifest write per touched partition,
  * no data reads. */
object KfsRetention {

  final case class Result(kept: Int, deleted: Int, reclaimedBytes: Long)

  def enforce(root: String, topic: String, cutoffMs: Long): Result =
    enforceWith(root, topic, rs => rs.partition(_.maxTsMs >= cutoffMs))

  /** Kafka `retention.bytes`: per partition, delete the OLDEST segment
    * only while the log remaining after the deletion would still be at or
    * over the budget — Kafka's rule exactly (`UnifiedLog`'s size-breach
    * deletion: a segment is deletable iff `totalSize - deletedSoFar -
    * segment.size >= retentionSize`). Equivalently, walking newest-first:
    * a segment is KEPT while the cumulative size of strictly-newer kept
    * segments is under the budget — so the budget-straddling segment
    * survives whole and the log may exceed `maxBytes` by up to one
    * segment, never split. */
  def enforceSize(root: String, topic: String, maxBytes: Long): Result =
    enforceWith(root, topic, { rs =>
      val newestFirst = rs.sortBy(-_.baseOffset)
      val cumNewer = newestFirst.scanLeft(0L)(_ + _.sizeBytes).init
      val keepSet = newestFirst.zip(cumNewer).takeWhile(_._2 < maxBytes)
        .map(_._1.baseOffset).toSet
      rs.partition(r => keepSet(r.baseOffset))
    })

  /** Kafka `DeleteRecords` — the data half (the reference broker reports
    * `LogStartOffset: 0` but never serves the API, `cmd/broker/main.go:407`;
    * this is the superset): per partition, advance the log start offset to
    * `target`. Whole segments below the horizon are physically deleted
    * (manifest flips first, same crash ordering as [[enforce]]); the
    * straddling segment SURVIVES WHOLE and readers trim its sub-horizon
    * records via the persisted horizon ([[KfsLayout.writeLogStarts]]) —
    * record-exact deletion without rewriting a byte of data, exactly
    * Kafka's `UnifiedLog.maybeIncrementLogStartOffset` + async segment
    * delete. Monotonic (a target at or below the current horizon is a
    * no-op) and capped at the log end (Kafka's OFFSET_OUT_OF_RANGE guard,
    * relaxed to a clamp). The horizon publishes BEFORE any file delete,
    * so a crash mid-delete leaves only logically-invisible segments that
    * a re-run reclaims.
    *
    * Plan-path consequences, all handled in [[KfsV2]]: segments wholly
    * below the horizon never plan; the straddler plans with a per-task
    * `minOffset` the reader enforces (batch-granular seek + record trim);
    * pushed-limit / top-N covering arithmetic counts the straddler as its
    * trimmed size; metadata-only aggregate pushdown is VETOED for topics
    * carrying a horizon (a trimmed segment's min-ts is unknowable from
    * flush-time stats). */
  def deleteRecords(root: String, topic: String,
      targets: Map[Int, Long]): Result = {
    val existing = KfsLayout.readLogStarts(root, topic, fresh = true)
    val refs = KfsLayout.listCompleted(root, Some(Set(topic)))
    val merged = collection.mutable.Map[Int, Long](existing.toSeq: _*)
    targets.foreach { case (partition, rawTarget) =>
      val rs = refs.filter(_.partition == partition)
      val logEnd = if (rs.isEmpty) 0L else rs.map(_.lastOffset).max + 1
      val target = math.max(0L, math.min(rawTarget, logEnd))
      if (target > merged.getOrElse(partition, 0L)) merged(partition) = target
    }
    // deletion runs against the MERGED horizon even when this call did not
    // advance it: a crash between writeLogStarts and the delete loop leaves
    // logically-invisible segments behind, and the re-run (same target, no
    // advancement) is exactly what must reclaim them
    val toDrop = targets.keysIterator
      .filter(merged.contains).map { partition =>
        partition -> refs.filter(_.partition == partition)
          .partition(_.lastOffset >= merged(partition))
      }.toMap
    if (merged != existing) KfsLayout.writeLogStarts(root, topic, merged.toMap)
    var kept = 0
    var deleted = 0
    var bytes = 0L
    toDrop.foreach { case (partition, (keep, drop)) =>
      if (drop.nonEmpty) {
        KfsLayout.writeManifest(root, topic, partition,
          keep.sortBy(_.baseOffset))
        drop.foreach { r =>
          val p = new HPath(r.path)
          val fs = p.getFileSystem(KfsLayout.hadoopConf)
          fs.delete(p, false)
          fs.delete(new HPath(r.path + ".kfst"), false)
          fs.delete(new HPath(r.path + ".kfsb"), false)
          bytes += r.sizeBytes
        }
      }
      kept += keep.size
      deleted += drop.size
    }
    KfsLayout.invalidateDiscoveryCache(root)
    Result(kept, deleted, bytes)
  }

  private def enforceWith(root: String, topic: String,
      split: Seq[KfsLayout.SegmentRef] =>
        (Seq[KfsLayout.SegmentRef], Seq[KfsLayout.SegmentRef])): Result = {
    val refs = KfsLayout.listCompleted(root, Some(Set(topic)))
    var kept = 0
    var deleted = 0
    var bytes = 0L
    refs.groupBy(_.partition).foreach { case (partition, rs) =>
      val (keep, drop) = split(rs)
      if (drop.nonEmpty) {
        KfsLayout.writeManifest(root, topic, partition,
          keep.sortBy(_.baseOffset))
        drop.foreach { r =>
          val p = new HPath(r.path)
          val fs = p.getFileSystem(KfsLayout.hadoopConf)
          fs.delete(p, false)
          fs.delete(new HPath(r.path + ".kfst"), false)
          fs.delete(new HPath(r.path + ".kfsb"), false)
          bytes += r.sizeBytes
        }
      }
      kept += keep.size
      deleted += drop.size
    }
    KfsLayout.invalidateDiscoveryCache(root)
    Result(kept, deleted, bytes)
  }
}
