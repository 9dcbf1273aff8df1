package graft.kfs

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}

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
  * SupportsAdmissionControl the same way the built-in file source does —
  * a cold start against years of history advances in bounded micro-batches
  * (bounded task count + sink commit size) instead of one giant batch; at
  * 100 TB this is the difference between a streamable backfill and an OOM.
  *
  * `spark.readStream.format("kfs").option("path", root).load()`
  */
class KfsMicroBatchStream(
    scan: KfsScan, maxSegsPerTrigger: Option[Int], fieldNames: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl {

  private def tpKey(r: KfsLayout.SegmentRef): String =
    r.topic + "/" + r.partition

  override def initialOffset(): Offset = KfsStreamOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit =
    maxSegsPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startMap = start.asInstanceOf[KfsStreamOffset].next
    val fresh = scan.listPruned()
      .filter(r => r.baseOffset >= startMap.getOrElse(tpKey(r), 0L))
      .sortBy(r => (r.topic, r.partition, r.baseOffset))
    val limited = limit match {
      case mf: ReadMaxFiles => fresh.take(mf.maxFiles())
      case _ => fresh
    }
    val next = limited.foldLeft(startMap) { (m, r) =>
      val k = tpKey(r)
      m.updated(k, math.max(m.getOrElse(k, 0L), r.lastOffset + 1))
    }
    KfsStreamOffset(next)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KfsStreamOffset].next
    val e = end.asInstanceOf[KfsStreamOffset].next
    scan.listPruned()
      .filter { r =>
        val k = tpKey(r)
        e.get(k).exists(endNext =>
          r.baseOffset >= s.getOrElse(k, 0L) && r.lastOffset < endNext)
      }
      .sortBy(r => (r.topic, r.partition, r.baseOffset))
      .map(r => KfsInputPartition(r.topic, r.partition, r.path): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KfsReaderFactory(fieldNames)

  override def deserializeOffset(json: String): Offset =
    KfsStreamOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"KfsMicroBatchStream[${scan.description()}]"
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
  /** Parse the flat `{"topic/partition":n,...}` object. Keys are
    * `topic/partition` path components, which the layout restricts to
    * file-system-safe names (no quotes/escapes possible). */
  def parse(json: String): KfsStreamOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) KfsStreamOffset(Map.empty)
    else KfsStreamOffset(body.split(",").map { kv =>
      val i = kv.lastIndexOf(':')
      val k = kv.substring(0, i).trim.stripPrefix("\"").stripSuffix("\"")
      k -> kv.substring(i + 1).trim.toLong
    }.toMap)
  }
}
