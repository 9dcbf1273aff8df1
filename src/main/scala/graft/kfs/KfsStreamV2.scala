package graft.kfs

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}

import graft.gov.Guardrails

/** DataSource V2 micro-batch stream over a KFS segment log — the
  * Spark-native form of the reference's checkpointed incremental
  * consumption (SURVEY §2.1 S9, `processor.go:109-250`): the engine's
  * checkpoint WAL replaces etcd offsets, completed-segment gating is the
  * same END!-footer rule the batch source uses, and replay after failure
  * re-plans from the committed offset map.
  *
  * Offset model: `{"topic/partition": nextRecordOffset}` — the durable
  * per-partition high-watermark, exactly the reference's etcd checkpoint
  * shape (`checkpoint/etcd.go`). Segments are immutable and their base
  * offsets strictly increase, so (start, end] selects whole segments:
  * a segment belongs to the batch iff `base >= start(tp)` and
  * `last < end(tp)`.
  *
  * Backlog control: `max_segments_per_trigger` implements
  * SupportsAdmissionControl the same way the built-in file source does.
  * When it is not set, the scan-admission rails (`max_scan_segments`)
  * become the per-trigger cap instead of a rejection: a batch query over
  * a too-large backlog refuses up front (X8), but a STREAM's contract is
  * incremental progress, so the same envelope meters the backlog into
  * bounded micro-batches — a cold start against years of history advances
  * with fixed task count and sink commit size instead of one giant batch.
  * The per-trigger selection round-robins across (topic, partition) so a
  * hot partition cannot starve the others.
  *
  * `Trigger.AvailableNow` drains implement [[SupportsTriggerAvailableNow]]
  * so the SAME admission envelope meters a bounded backfill: without it,
  * Spark wraps the source in a single-batch fallback that silently ignores
  * the read limit — at estate scale that is the exact unbounded batch the
  * cap exists to prevent. `prepareForTriggerAvailableNow` freezes one
  * listing and a per-partition offset fence; every subsequent trigger
  * selects from that frozen listing (segments are immutable, so the
  * listing cannot go stale within the fence), and the drain terminates
  * when the fence is reached — segments produced after prepare belong to
  * the next run.
  *
  * `spark.readStream.format("kfs").option("path", root).load()`
  */
class KfsMicroBatchStream(
    scan: KfsScan, maxSegsPerTrigger: Option[Int], rails: Guardrails,
    fieldNames: Array[String], conf: SerializableHadoopConf,
    allowCompressed: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def tpKey(r: KfsLayout.SegmentRef): String =
    r.topic + "/" + r.partition

  /** One listing per trigger: latestOffset caches it; planInputPartitions
    * (called right after, same trigger) reuses it. Correct because
    * segments are immutable and the (start, end] offset map — computed
    * from this very listing — bounds the batch: a newer segment missing
    * from the cache can only fall outside `end` and belongs to the next
    * trigger anyway. */
  @volatile private var lastListing: Seq[KfsLayout.SegmentRef] = Nil

  /** AvailableNow fence: per-(topic/partition) next-record-offset captured
    * at prepare time. While set, triggers select only from the frozen
    * prepare-time listing and the drain ends when every partition reaches
    * its fence. None under ProcessingTime/Once triggers. */
  @volatile private var availableNowFence: Option[Map[String, Long]] = None
  @volatile private var frozenListing: Seq[KfsLayout.SegmentRef] = Nil

  override def prepareForTriggerAvailableNow(): Unit = {
    val listing = scan.listPruned()
    frozenListing = listing
    availableNowFence = Some(
      listing.groupBy(tpKey).map { case (k, refs) =>
        k -> (refs.map(_.lastOffset).max + 1)
      })
  }

  override def initialOffset(): Offset = KfsStreamOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(maxSegsPerTrigger.getOrElse(rails.maxScanSegments))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[KfsStreamOffset].next
    // under an AvailableNow fence, reuse the prepare-time listing: no
    // per-trigger relisting IO during the drain, and segments landing
    // after prepare stay out of this run by construction
    val listing = availableNowFence match {
      case Some(_) => frozenListing
      case None => scan.listPruned()
    }
    lastListing = listing
    val fresh = listing
      .filter { r =>
        r.baseOffset >= startMap.getOrElse(tpKey(r), 0L) &&
          availableNowFence.forall(f =>
            r.lastOffset < f.getOrElse(tpKey(r), Long.MinValue))
      }
    val cap = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => Int.MaxValue
    }
    // fair selection: round-robin one segment per (topic, partition) in
    // base-offset order until the cap fills — a hot partition cannot
    // monopolize the trigger
    val queues = fresh.groupBy(tpKey).toSeq.sortBy(_._1)
      .map { case (_, refs) => scala.collection.mutable.Queue(
        refs.sortBy(_.baseOffset): _*) }
    val picked = scala.collection.mutable.ArrayBuffer.empty[KfsLayout.SegmentRef]
    var progress = true
    while (picked.size < cap && progress) {
      progress = false
      queues.foreach { q =>
        if (q.nonEmpty && picked.size < cap) { picked += q.dequeue(); progress = true }
      }
    }
    val next = picked.foldLeft(startMap) { (m, r) =>
      val k = tpKey(r)
      m.updated(k, math.max(m.getOrElse(k, 0L), r.lastOffset + 1))
    }
    KfsStreamOffset(next)
  }

  /** Under AvailableNow, the fence is the known latest offset — Spark
    * surfaces it in progress reporting and uses it to decide the drain is
    * done. Outside a fence we keep the default (null = unknown) rather
    * than pay a listing just for the progress line. */
  override def reportLatestOffset(): Offset =
    availableNowFence.map(KfsStreamOffset(_)).orNull

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KfsStreamOffset].next
    val e = end.asInstanceOf[KfsStreamOffset].next
    // on restart-recovery replans, lastListing is empty — list again
    val listing = if (lastListing.nonEmpty) lastListing else scan.listPruned()
    listing
      .filter { r =>
        val k = tpKey(r)
        e.get(k).exists(endNext =>
          r.baseOffset >= s.getOrElse(k, 0L) && r.lastOffset < endNext)
      }
      .sortBy(r => (r.topic, r.partition, r.baseOffset))
      .map(r => KfsInputPartition(r.topic, r.partition, r.path,
        r.sizeBytes, scan.minOffsetFor(r)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KfsReaderFactory(fieldNames, conf, allowCompressed = allowCompressed)

  override def deserializeOffset(json: String): Offset =
    KfsStreamOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  // NOTE: must not touch scan.description()/refs — that path runs batch
  // scan admission over the full backlog, and Spark renders this string
  // from progress-reporting/log paths on every trigger
  override def toString: String = s"KfsMicroBatchStream[${scan.rootDescription}]"
}

/** Per-(topic, partition) next-record-offset map, JSON-serialized into the
  * streaming checkpoint WAL. */
case class KfsStreamOffset(next: Map[String, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
}

object KfsStreamOffset {
  private val Entry = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(-?\\d+)".r

  /** Parse the flat `{"topic/partition":n,...}` object. Regex-extracts
    * quoted-key/integer pairs, so topic names with commas survive;
    * quotes/backslashes in topic names are rejected at segment-write time
    * (see [[KfsLayout.writeSegment]]). */
  def parse(json: String): KfsStreamOffset =
    KfsStreamOffset(
      Entry.findAllMatchIn(json).map(m => m.group(1) -> m.group(2).toLong).toMap)
}
