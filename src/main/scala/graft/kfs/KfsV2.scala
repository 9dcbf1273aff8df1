package graft.kfs

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.gov.{Guardrails, ScanAdmission}

/** DataSource V2 KFS source — the SURVEY §7.2 v1 scan path: a real
  * `TableProvider` whose `ScanBuilder` pushes column pruning and
  * partition/offset/time predicates down to *segment-level file pruning*
  * (manifest/`.kfst` stats), so Spark never opens a segment the predicate
  * excludes — the reference's `filterSegments` (X1–X3) as a first-class
  * Spark source:
  *
  * {{{
  * spark.read.format("kfs").option("path", root).load()
  *   .where($"_partition" === 2 && $"_offset" >= 100)   // pruned at planning
  * }}}
  *
  * One InputPartition per segment file (the reference's flush policy caps
  * segments at a few hundred MB, so this yields even task sizing at 100 TB).
  * Pushed filters are also kept as residuals — file stats prune at segment
  * granularity; record-level evaluation still runs above the scan.
  * Scan admission (`max_scan_segments`/`max_scan_bytes`, X8) runs at plan
  * time against the pruned ref set.
  */
class KfsTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kfs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KfsV2.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new KfsTable(properties.asScala.toMap)
}

object KfsV2 {
  val Schema: StructType = StructType(Seq(
    StructField("_topic", StringType),
    StructField("_partition", IntegerType),
    StructField("_offset", LongType),
    StructField("_ts", TimestampNTZType),
    StructField("_ts_ms", LongType),
    StructField("_key", BinaryType),
    StructField("_value", BinaryType),
    StructField("_headers", MapType(StringType, StringType)),
    StructField("_segment", StringType)))
}

class KfsTable(options: Map[String, String]) extends Table with SupportsRead {
  private val root = options.getOrElse("path",
    throw new IllegalArgumentException("kfs source requires option 'path'"))

  override def name(): String = s"kfs:$root"
  override def schema(): StructType = KfsV2.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new KfsScanBuilder(root, options)
}

class KfsScanBuilder(root: String, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = KfsV2.Schema
  private var pushed: Array[Filter] = Array.empty

  // pruning bounds accumulated from pushed predicates
  private var partitions: Option[Set[Int]] = None
  private var offMin: Option[Long] = None
  private var offMax: Option[Long] = None
  private var tsMin: Option[Long] = None
  private var tsMax: Option[Long] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach(absorb)
    pushed = filters.filter(isPrunable)
    filters // all remain residual: file stats prune segments, not records
  }

  private def absorb(f: Filter): Unit = f match {
    case sources.EqualTo("_partition", v: Int) =>
      partitions = Some(partitions.getOrElse(Set.empty) + v)
    case sources.In("_partition", vs) =>
      partitions = Some(vs.collect { case i: Int => i }.toSet)
    case sources.GreaterThanOrEqual("_offset", v: Long) => offMin = maxOf(offMin, v)
    case sources.GreaterThan("_offset", v: Long) => offMin = maxOf(offMin, v + 1)
    case sources.LessThanOrEqual("_offset", v: Long) => offMax = minOf(offMax, v)
    case sources.LessThan("_offset", v: Long) => offMax = minOf(offMax, v - 1)
    case sources.GreaterThanOrEqual("_ts_ms", v: Long) => tsMin = maxOf(tsMin, v)
    case sources.GreaterThan("_ts_ms", v: Long) => tsMin = maxOf(tsMin, v + 1)
    case sources.LessThanOrEqual("_ts_ms", v: Long) => tsMax = minOf(tsMax, v)
    case sources.LessThan("_ts_ms", v: Long) => tsMax = minOf(tsMax, v - 1)
    case sources.And(l, r) => absorb(l); absorb(r)
    case _ =>
  }

  private def isPrunable(f: Filter): Boolean = f match {
    case e: sources.EqualTo => e.attribute == "_partition"
    case e: sources.In => e.attribute == "_partition"
    case e: sources.GreaterThanOrEqual => e.attribute == "_offset" || e.attribute == "_ts_ms"
    case e: sources.GreaterThan => e.attribute == "_offset" || e.attribute == "_ts_ms"
    case e: sources.LessThanOrEqual => e.attribute == "_offset" || e.attribute == "_ts_ms"
    case e: sources.LessThan => e.attribute == "_offset" || e.attribute == "_ts_ms"
    case sources.And(l, r) => isPrunable(l) && isPrunable(r)
    case _ => false
  }

  private def maxOf(a: Option[Long], b: Long) = Some(a.fold(b)(math.max(_, b)))
  private def minOf(a: Option[Long], b: Long) = Some(a.fold(b)(math.min(_, b)))

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = StructType(
      KfsV2.Schema.fields.filter(f => required.fieldNames.contains(f.name)))

  override def build(): Scan = {
    val topics = options.get("topics").map(_.split(',').toSet)
    val rails = Guardrails(
      maxScanSegments = options.get("max_scan_segments").map(_.toInt)
        .getOrElse(Guardrails().maxScanSegments),
      maxScanBytes = options.get("max_scan_bytes").map(_.toLong)
        .getOrElse(Guardrails().maxScanBytes))
    // snapshot the driver's Hadoop conf (s3a credentials/endpoints live in
    // spark.hadoop.*) so executor-side readers open segments the same way
    val conf = new SerializableHadoopConf(KfsLayout.hadoopConf)
    new KfsScan(root, topics, partitions, offMin, offMax, tsMin, tsMax,
      rails, options.get("max_segments_per_trigger").map(_.toInt),
      requiredSchema, conf)
  }
}

class KfsScan(
    root: String, topics: Option[Set[String]], partitions: Option[Set[Int]],
    offMin: Option[Long], offMax: Option[Long],
    tsMin: Option[Long], tsMax: Option[Long],
    rails: Guardrails, maxSegmentsPerTrigger: Option[Int],
    required: StructType, conf: SerializableHadoopConf)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  /** Runtime (DPP) partition restriction — arrives after the build side of
    * a join has executed, see [[filter]]. Intersected with the plan-time
    * pushdown, never widened. */
  @volatile private var runtimePartitions: Option[Set[Int]] = None
  @volatile private var cachedRefs: Seq[KfsLayout.SegmentRef] = null
  /** Post-filter segment count of the last planInputPartitions, for tests
    * asserting that runtime pruning actually reached the listing. */
  @volatile private[graft] var lastPlannedSegments: Int = -1

  private def effectivePartitions: Option[Set[Int]] =
    (partitions, runtimePartitions) match {
      case (Some(a), Some(b)) => Some(a.intersect(b))
      case (a, b) => b.orElse(a)
    }

  /** Fresh pruned listing — called once per batch plan, and once per
    * micro-batch trigger by the streaming side (segments are immutable and
    * append-only, so re-listing is the only way new data appears). */
  private[kfs] def listPruned(): Seq[KfsLayout.SegmentRef] =
    KfsLayout.prune(
      KfsLayout.listCompleted(root, topics, effectivePartitions),
      offMin, offMax, tsMin, tsMax)

  private def refs: Seq[KfsLayout.SegmentRef] = {
    var r = cachedRefs
    if (r == null) {
      r = listPruned()
      ScanAdmission.admit(r.size, r.map(_.sizeBytes).sum, rails)
      cachedRefs = r
    }
    r
  }

  /** Dynamic partition pruning, the reference's `filterSegments` applied at
    * RUN time: when the fact side joins a small dim on `_partition` and the
    * dim is filtered, Spark executes the dim first (reusing its broadcast),
    * collects the surviving join keys, and hands them here as an IN list —
    * then re-plans input partitions, so excluded segments are never opened.
    * At 100 TB this is the difference between scanning every partition's
    * segments and only the handful the dim selects. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only advertised when _partition survives column pruning: Spark
    // resolves these against the scan OUTPUT and fails the whole query on
    // a miss, so a projection without _partition must advertise nothing
    if (required.fieldNames.contains("_partition"))
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column("_partition"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = {
    val restrictions = filters.collect {
      case sources.In("_partition", vs) =>
        vs.collect { case i: Int => i }.toSet
      case sources.EqualTo("_partition", v: Int) => Set(v)
    }
    if (restrictions.nonEmpty) {
      runtimePartitions = Some(restrictions.reduce(_ intersect _))
      cachedRefs = null // re-list under the tightened restriction
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"KfsScan[segments=${refs.size}, bytes=${refs.map(_.sizeBytes).sum}]"

  /** Post-prune size estimate from segment stats — without this, Catalyst
    * assumes the source is huge and a small pruned KFS side of a join can
    * never auto-broadcast. Raw segment bytes ≈ decoded bytes (the v2 batch
    * framing is a few percent of the payload), which is the right order of
    * magnitude for the broadcast decision. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, refs.map(_.sizeBytes).sum))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  /** Listing-free description for the streaming side: description() forces
    * the lazy refs (full listing + batch scan admission), which must never
    * run from a stream's progress-reporting path. */
  private[kfs] def rootDescription: String = s"root=$root"

  override def planInputPartitions(): Array[InputPartition] = {
    val r = refs
    lastPlannedSegments = r.size
    r.map(x => KfsInputPartition(x.topic, x.partition, x.path,
      x.sizeBytes): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KfsReaderFactory(required.fieldNames, conf)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KfsMicroBatchStream(this, maxSegmentsPerTrigger, rails,
      required.fieldNames, conf)
}

/** `sizeBytes` rides along from discovery so the reader needs zero metadata
  * RPCs — one open, one sequential read per task. */
case class KfsInputPartition(topic: String, partition: Int, path: String,
    sizeBytes: Long)
  extends InputPartition

class KfsReaderFactory(fieldNames: Array[String], conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KfsInputPartition]
    new KfsPartitionReader(kp, fieldNames, conf)
  }
}

/** Decodes one segment file; emits only the required columns. The segment
  * STREAMS through the decoder via Hadoop `FileSystem` (file://, hdfs://,
  * s3a:// all work) — peak task memory is one record batch, never the whole
  * segment, so the reference's multi-hundred-MB flush sizes don't double-
  * buffer per task. */
class KfsPartitionReader(p: KfsInputPartition, fieldNames: Array[String],
    conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val in: java.io.DataInputStream = {
    val hp = new HPath(p.path)
    hp.getFileSystem(conf.value).open(hp)
  }
  private val iter: Iterator[KfsCodec.Record] =
    KfsCodec.decodeSegmentStream(in, p.sizeBytes)
  private var current: KfsCodec.Record = _
  private val topicUtf = UTF8String.fromString(p.topic)
  private val segmentUtf = UTF8String.fromString(p.path)

  override def next(): Boolean = {
    if (!iter.hasNext) return false
    current = iter.next()
    true
  }

  override def get(): InternalRow = {
    val values = fieldNames.map {
      case "_topic" => topicUtf
      case "_partition" => p.partition
      case "_offset" => current.offset
      case "_ts" => current.timestampMs * 1000L // µs for TimestampNTZ
      case "_ts_ms" => current.timestampMs
      case "_key" => current.key
      case "_value" => current.value
      case "_headers" =>
        val hs = current.headers
        ArrayBasedMapData(
          hs.map(h => UTF8String.fromString(h.k)).toArray,
          hs.map(h => if (h.v == null) null
            else UTF8String.fromString(new String(h.v, "UTF-8"))).toArray)
      case "_segment" => segmentUtf
      case other => throw new IllegalStateException(s"unknown column $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = in.close()
}
