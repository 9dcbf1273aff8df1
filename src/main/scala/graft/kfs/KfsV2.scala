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

  /** True so `df.write.format("kfs").save()` hands the QUERY's schema to
    * [[getTable]] — the write path accepts the writable-column subset
    * (see [[KfsWriteV2.fieldIndexes]]); reads keep the canonical schema. */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new KfsTable(properties.asScala.toMap, schema)
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

class KfsTable(options: Map[String, String],
    providedSchema: StructType = KfsV2.Schema)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val root = options.getOrElse("path",
    throw new IllegalArgumentException("kfs source requires option 'path'"))

  override def name(): String = s"kfs:$root"
  override def schema(): StructType =
    if (providedSchema == null) KfsV2.Schema else providedSchema
  /** Surfaces ONLY the admin-config keys (retention.ms & co) to
    * `SHOW TBLPROPERTIES` — never the raw creation options: the catalog
    * forwards every catalog-level option (which may carry filesystem
    * credentials) into each table's option map, and echoing those back to
    * any user allowed to SHOW TBLPROPERTIES would be an information leak. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    options.foreach { case (k, v) =>
      if (TopicConfigs.Alterable.contains(k)) m.put(k, v)
    }
    m
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    require(schema() == KfsV2.Schema,
      "kfs read does not support user-specified schemas; " +
        "select/cast on the loaded frame instead")
    new KfsScanBuilder(root, options)
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new KfsWriteBuilder(root, info.schema(), options)
}

class KfsScanBuilder(root: String, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var requiredSchema: StructType = KfsV2.Schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[KfsTopN] = None

  // pruning bounds accumulated from pushed predicates. `ts_max_ms` /
  // `offset_max_inclusive` options seed the upper bounds BEFORE any
  // predicate arrives — that is how catalog time travel ("the topic as of
  // T" / "as of offset N", see [[KfsCatalog]]) rides the same pruning
  // path. Option-seeded bounds have no residual Spark filter above the
  // scan, so readers enforce bounds per record (see
  // [[KfsPartitionReader]]) and limit/top-N pushdown is vetoed below
  // (their segment-selection arithmetic assumes every decoded record
  // qualifies).
  private val optionBounded: Boolean =
    options.contains("ts_max_ms") || options.contains("offset_max_inclusive")
  private var partitions: Option[Set[Int]] = None
  private var offMin: Option[Long] = None
  private var offMax: Option[Long] =
    options.get("offset_max_inclusive").map(_.toLong)
  private var tsMin: Option[Long] = None
  private var tsMax: Option[Long] = options.get("ts_max_ms").map(_.toLong)
  // `_key` equality/IN predicates, a conjunction of disjunctions — probed
  // against per-segment Bloom sidecars at plan time (see KfsBloom)
  private var keyGroups: Seq[Seq[Array[Byte]]] = Nil

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
    case sources.EqualTo("_key", v: Array[Byte]) =>
      keyGroups :+= Seq(v)
    case sources.In("_key", vs) =>
      val bs = vs.toSeq.collect { case b: Array[Byte] => b }
      // only a fully-binary IN list prunes; a group must stay non-empty
      // (an empty group would wrongly exclude every segment)
      if (bs.nonEmpty && bs.length == vs.length) keyGroups :+= bs
    case sources.And(l, r) => absorb(l); absorb(r)
    case _ =>
  }

  private def isPrunable(f: Filter): Boolean = f match {
    case sources.EqualTo("_key", _: Array[Byte]) => true
    case e: sources.EqualTo => e.attribute == "_partition"
    case sources.In("_key", vs) if vs.forall(_.isInstanceOf[Array[Byte]]) => true
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

  /** METADATA-ONLY aggregation — the Parquet metadata-count analogue for
    * KFS: `count(*) / min / max(_offset, _ts_ms)` grouped by `_topic` /
    * `_partition` (or globally) is answered purely from segment stats
    * (manifest rows / `.kfst` sidecars / footer probes), opening ZERO
    * segment files. At 100 TB a per-partition count is a listing, not a
    * scan. Exactness contract:
    *   - min/max bounds in stats are the actual first/last record offset
    *     and the true min/max record timestamp, written at flush time;
    *   - `count(*)` is offset arithmetic (`last - base + 1`), exact
    *     because KFS segments sit BELOW any compaction — the flusher
    *     assigns dense offsets (reference: the log writer's contiguous
    *     offset ranges per segment, `pkg/storage/log.go`). A gapped
    *     foreign log can opt out with `assume_dense_offsets=false`.
    * Spark only attempts aggregate pushdown when every filter was fully
    * consumed by the source; our record-level predicates always stay
    * residual, so pushdown happens exactly when the only restrictions are
    * the segment-aligned topic/partition options — stats are exact there.
    * Offset/ts range options are NOT segment-aligned, so they veto it. */
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    canPush(agg) && { pushedAgg = Some(agg); true }

  private def canPush(agg: Aggregation): Boolean = {
    val noRangeRestriction =
      offMin.isEmpty && offMax.isEmpty && tsMin.isEmpty && tsMax.isEmpty
    val assumeDense =
      options.getOrElse("assume_dense_offsets", "true").toBoolean
    def refName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        Some(f.fieldNames.head)
      case _ => None
    }
    val groupsOk = agg.groupByExpressions.forall(g =>
      refName(g).exists(n => n == "_topic" || n == "_partition"))
    val aggsOk = agg.aggregateExpressions.forall {
      case _: CountStar => assumeDense
      case m: Min => refName(m.column).exists(n => n == "_offset" || n == "_ts_ms")
      case m: Max => refName(m.column).exists(n => n == "_offset" || n == "_ts_ms")
      case _ => false
    }
    // DeleteRecords horizon veto: a trimmed straddling segment's min-ts is
    // unknowable from flush-time stats and its count is no longer
    // last-base+1 — a topic carrying a horizon answers aggregates by
    // scanning (readers trim exactly). The probe is read FRESH (one glob,
    // once per plan): a horizon landed by another writer inside the TTL
    // window must veto the pushdown — answering COUNT/MIN from untrimmed
    // flush-time stats is a wrong answer, not a stale one. The
    // option-restricted topic set narrows the veto to topics actually read.
    val horizonFree = {
      val withHorizon = KfsLayout.topicsWithLogStarts(root, fresh = true)
      withHorizon.isEmpty ||
        options.get("topics").exists(
          _.split(',').toSet.intersect(withHorizon).isEmpty)
    }
    noRangeRestriction && groupsOk && aggsOk && horizonFree &&
      agg.aggregateExpressions.nonEmpty
  }

  /** LIMIT n over 100 TB should be a preview, not a scan: Spark only
    * pushes a limit when no record-level filter sits between scan and
    * limit, so every record in every segment qualifies — dense-offset
    * stats then give exact per-segment counts and the scan plans only the
    * minimal segment prefix covering n rows; readers additionally stop
    * decoding after n rows. PARTIALLY pushed: Spark keeps its own limit
    * above (we emit up to n rows per task, not globally). */
  override def pushLimit(limit: Int): Boolean = {
    // option-seeded bounds drop records inside kept segments, so segment
    // counts no longer equal emitted rows — the prefix arithmetic would
    // under-plan; Spark's own limit above stays exact
    if (optionBounded) return false
    pushedLimit = Some(limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** ORDER BY `_partition`/`_offset`/`_ts` (lexicographic, any directions)
    * LIMIT k — "the latest k events over 100 TB" / kafsql's `TAIL n` shape
    * (`_partition` desc, `_offset` desc) — plans only the segments that can
    * contain the global top k. Each supported key has exact per-segment
    * bounds (`_partition` is constant per segment, `_offset` is the stat
    * range, `_ts` the flush-time range), giving every segment a best/worst
    * rank TUPLE that bounds all its rows; rank segments best-first,
    * accumulate dense-offset counts to k, take θ = the worst tuple of that
    * covering set, and keep every segment whose best tuple is ≤ θ
    * (overlapping ranges across partitions stay correct — any record
    * beating the k-th must sit in a kept segment). PARTIAL pushdown:
    * Spark's global sort + limit run above, so the kept set only needs to
    * be a superset. `_ts` orders identically to `_ts_ms` (µs = ms × 1000,
    * monotone). An unsupported trailing key truncates to the supported
    * PREFIX, which still bounds the k-th row (lexicographic order refines
    * its prefixes); an unsupported leading key rejects the push. Dense
    * offsets are required for the counts; sparse logs opt out. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder], limit: Int)
      : Boolean = {
    // same veto as pushLimit: covering-set counts assume all records in a
    // kept segment qualify, which option-seeded bounds break
    if (optionBounded) return false
    val assumeDense =
      options.getOrElse("assume_dense_offsets", "true").toBoolean
    if (orders.isEmpty || !assumeDense) return false
    val keys = orders.iterator.map { o =>
      val name = o.expression match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          nr.fieldNames.head match {
            case "_partition" => "_partition"
            case "_offset" => "_offset"
            case "_ts" | "_ts_ms" => "_ts_ms"
            case _ => null
          }
        case _ => null
      }
      val desc = o.direction ==
        org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING
      (name, desc)
    }.takeWhile(_._1 != null).toSeq
    keys.nonEmpty && {
      pushedTopN = Some(KfsTopN(keys, limit))
      true
    }
  }

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
    val assumeDense =
      options.getOrElse("assume_dense_offsets", "true").toBoolean
    new KfsScan(root, topics, partitions, offMin, offMax, tsMin, tsMax,
      rails, options.get("max_segments_per_trigger").map(_.toInt),
      requiredSchema, conf, pushedAgg.map(KfsAggSpec.from),
      pushedLimit, assumeDense, pushedTopN, keyGroups,
      options.getOrElse("copartitioned", "false").toBoolean,
      // superset opt-in: decode gzip/snappy/lz4/zstd batches (attribute
      // bits 0-2); default FALSE mirrors the reference decoder's reject
      // (`decoder.go:198-201`)
      options.getOrElse("allow_compressed", "false").toBoolean)
  }
}

/** A pushed top-N: lexicographic sort keys (column, isDescending) over
  * `_partition`/`_offset`/`_ts_ms`, and row count — segment selection only,
  * readers decode kept segments fully (unlike a plain limit, WHICH rows
  * matter here). */
case class KfsTopN(keys: Seq[(String, Boolean)], n: Int)

/** Serializable digest of a pushed [[Aggregation]]: group-by column names
  * (each `_topic` or `_partition`) followed by aggregate descriptors. */
case class KfsAggSpec(groupCols: Seq[String], aggs: Seq[(String, String)])

object KfsAggSpec {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  private def ref(e: org.apache.spark.sql.connector.expressions.Expression)
      : String = e.asInstanceOf[NamedReference].fieldNames.head

  def from(agg: Aggregation): KfsAggSpec = KfsAggSpec(
    agg.groupByExpressions.toSeq.map(ref),
    agg.aggregateExpressions.toSeq.map {
      case _: CountStar => ("count", "*")
      case m: Min => ("min", ref(m.column))
      case m: Max => ("max", ref(m.column))
      case other => throw new IllegalStateException(s"unpushable agg $other")
    })
}

class KfsScan(
    root: String, topics: Option[Set[String]], partitions: Option[Set[Int]],
    offMin: Option[Long], offMax: Option[Long],
    tsMin: Option[Long], tsMax: Option[Long],
    rails: Guardrails, maxSegmentsPerTrigger: Option[Int],
    required: StructType, conf: SerializableHadoopConf,
    aggSpec: Option[KfsAggSpec] = None,
    limit: Option[Int] = None, assumeDense: Boolean = true,
    topN: Option[KfsTopN] = None,
    keyGroups: Seq[Seq[Array[Byte]]] = Nil,
    copartitioned: Boolean = false,
    allowCompressed: Boolean = false)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

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

  /** DeleteRecords horizons for the topics this scan touches — read only
    * for topics the one-glob-per-root probe says carry one (zero cost for
    * untouched topics). Refreshed with each listing; [[minOffsetFor]]
    * serves the per-task record trim from the same snapshot. */
  @volatile private var logStarts: Map[(String, Int), Long] = Map.empty

  private[kfs] def minOffsetFor(r: KfsLayout.SegmentRef): Long =
    logStarts.getOrElse((r.topic, r.partition), 0L)

  /** Rows a segment contributes AFTER the horizon trim — the dense-offset
    * count every limit/top-N covering computation must use, or a trimmed
    * straddler would over-claim and the prefix under-plan. */
  private def rowsOf(s: KfsLayout.SegmentRef): Long =
    s.lastOffset - math.max(s.baseOffset, minOffsetFor(s)) + 1

  /** Fresh pruned listing — called once per batch plan, and once per
    * micro-batch trigger by the streaming side (segments are immutable and
    * append-only, so re-listing is the only way new data appears).
    * Segments wholly below a DeleteRecords horizon never plan. */
  private[kfs] def listPruned(): Seq[KfsLayout.SegmentRef] = {
    val listed = KfsLayout.prune(
      KfsLayout.listCompleted(root, topics, effectivePartitions),
      offMin, offMax, tsMin, tsMax)
    val horizonTopics = KfsLayout.topicsWithLogStarts(root)
    val ls =
      if (horizonTopics.isEmpty) Map.empty[(String, Int), Long]
      else listed.iterator.map(_.topic).toSet.intersect(horizonTopics)
        .flatMap { t =>
          KfsLayout.readLogStarts(root, t).map { case (p, o) => ((t, p), o) }
        }.toMap
    logStarts = ls
    if (ls.isEmpty) listed
    else listed.filter(r => r.lastOffset >= minOffsetFor(r))
  }

  private def refs: Seq[KfsLayout.SegmentRef] = {
    var r = cachedRefs
    if (r == null) {
      // Bloom pruning runs before limit/top-N selection: a key-excluded
      // segment must not consume limit budget it can't contribute rows to
      r = topNSelect(limitPrefix(
        KfsLayout.filterByKeyBloom(listPruned(), keyGroups)))
      ScanAdmission.admit(r.size, r.map(_.sizeBytes).sum, rails)
      cachedRefs = r
    }
    r
  }

  /** Pushed top-N covering set (see [[KfsScanBuilder.pushTopN]]): every
    * segment gets a best/worst rank tuple bounding all its rows in the
    * query's lexicographic order; θ is the worst tuple of a minimal
    * count-covering set and every segment whose best tuple is ≤ θ is kept,
    * in original scan order. Exactness lives ABOVE the scan (Spark
    * re-sorts and re-limits); this only needs to never drop a potential
    * top-k row. Rank values are direction-normalized (descending keys
    * negate) so "better" is always tuple-less-than. */
  private def topNSelect(
      r: Seq[KfsLayout.SegmentRef]): Seq[KfsLayout.SegmentRef] =
    topN match {
      case Some(KfsTopN(keys, n)) if assumeDense =>
        def bounds(s: KfsLayout.SegmentRef, key: String): (Long, Long) =
          key match {
            case "_partition" => (s.partition.toLong, s.partition.toLong)
            // lo respects the DeleteRecords horizon (trimmed records can't
            // rank); a straddler's ts lo stays the flush-time min — looser
            // bound → superset kept → still exact above
            case "_offset" =>
              (math.max(s.baseOffset, minOffsetFor(s)), s.lastOffset)
            case _ => (s.minTsMs, s.maxTsMs)
          }
        // per-key best/worst, direction-normalized: for a descending key
        // the best row value is the range's hi, negated so that smaller
        // rank = better uniformly (values are offsets/ts/partitions — all
        // far from Long.MinValue, so negation is safe)
        def best(s: KfsLayout.SegmentRef): Seq[Long] = keys.map {
          case (k, desc) =>
            val (lo, hi) = bounds(s, k); if (desc) -hi else lo
        }
        def worst(s: KfsLayout.SegmentRef): Seq[Long] = keys.map {
          case (k, desc) =>
            val (lo, hi) = bounds(s, k); if (desc) -lo else hi
        }
        def cmp(a: Seq[Long], b: Seq[Long]): Int = {
          val it = a.iterator.zip(b.iterator)
          while (it.hasNext) {
            val (x, y) = it.next()
            if (x != y) return java.lang.Long.compare(x, y)
          }
          0
        }
        def leq(a: Seq[Long], b: Seq[Long]): Boolean = cmp(a, b) <= 0
        val ranked = r.sortWith((x, y) => cmp(best(x), best(y)) < 0)
        var cum = 0L
        var theta: Seq[Long] = null
        val it = ranked.iterator
        while (cum < n && it.hasNext) {
          val s = it.next()
          cum += rowsOf(s)
          val w = worst(s)
          if (theta == null || !leq(w, theta)) theta = w
        }
        if (cum < n) r // fewer rows than n: nothing to prune
        else r.filter(s => leq(best(s), theta))
      case _ => r
    }

  /** Pushed-limit segment prefix: Spark only pushes a limit when no
    * record-level filter survives below it, so every record qualifies and
    * dense-offset stats give exact per-segment counts — the minimal prefix
    * (in scan order) covering `limit` rows is all that is planned. */
  private def limitPrefix(
      r: Seq[KfsLayout.SegmentRef]): Seq[KfsLayout.SegmentRef] =
    limit match {
      case Some(n) if assumeDense =>
        var remaining = n.toLong
        val b = Seq.newBuilder[KfsLayout.SegmentRef]
        val it = r.iterator
        while (remaining > 0 && it.hasNext) {
          val s = it.next()
          b += s
          remaining -= rowsOf(s)
        }
        b.result()
      case _ => r
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
    if (readSchema().fieldNames.contains("_partition"))
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

  private[graft] def aggPushed: Boolean = aggSpec.isDefined

  /** Aggregated output schema: group columns (in pushdown order) then one
    * field per aggregate — Spark zips these POSITIONALLY with the logical
    * Aggregate's output, so order matters, names don't (kept meaningful
    * for EXPLAIN). */
  private def aggSchema(spec: KfsAggSpec): StructType = StructType(
    spec.groupCols.map {
      case "_topic" => StructField("_topic", StringType)
      case "_partition" => StructField("_partition", IntegerType)
      case other => throw new IllegalStateException(s"unpushable group $other")
    } ++ spec.aggs.map { case (fn, c) => StructField(s"$fn($c)", LongType) })

  override def readSchema(): StructType =
    aggSpec.map(aggSchema).getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String = aggSpec match {
    case Some(spec) =>
      s"KfsScan[aggPushed=${spec.aggs.map { case (f, c) => s"$f($c)" }
        .mkString(",")}, groupBy=${spec.groupCols.mkString(",")}, metadata-only]"
    case None =>
      val lim = limit.map(n => s", limit=$n").getOrElse("")
      val top = topN.map(t => s", topN=${t.n} by " + t.keys.map {
        case (k, desc) => k + (if (desc) " desc" else "")
      }.mkString(",")).getOrElse("")
      val kb = if (keyGroups.isEmpty) ""
        else s", keyBloom=${keyGroups.map(_.size).mkString("x")}"
      s"KfsScan[segments=${refs.size}, bytes=${refs.map(_.sizeBytes).sum}$lim$top$kb]"
  }

  /** Post-prune size estimate from segment stats — without this, Catalyst
    * assumes the source is huge and a small pruned KFS side of a join can
    * never auto-broadcast. Raw segment bytes ≈ decoded bytes (the v2 batch
    * framing is a few percent of the payload), which is the right order of
    * magnitude for the broadcast decision. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(
          if (aggSpec.isDefined) 1024L // metadata-only: a handful of rows
          else math.max(1L, refs.map(_.sizeBytes).sum))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  /** Listing-free description for the streaming side: description() forces
    * the lazy refs (full listing + batch scan admission), which must never
    * run from a stream's progress-reporting path. */
  private[kfs] def rootDescription: String = s"root=$root"

  /** STORAGE-PARTITIONED JOINS, opt-in via `copartitioned=true`: report
    * `KeyGroupedPartitioning` over `_partition` so a join of two
    * co-partitioned topics whose keys include `_partition` plans with ZERO
    * exchange on either side (Spark aligns the key groups; enable
    * `spark.sql.sources.v2.bucketing.enabled`). This is the Kafka-Streams
    * co-partitioning contract as a Spark plan property: same-numbered
    * partitions hold the same keys, so partition-local joins are exact.
    * Opt-in because key-grouped execution coalesces every segment of a
    * partition into one task — parallelism becomes #topic-partitions
    * (thousands at 100 TB, great; 4 in a small fixture, a poor trade for a
    * plain scan). Not reported for metadata-only agg scans, or when
    * `_partition` was pruned from the output (nothing to group on). */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    import org.apache.spark.sql.connector.read.partitioning._
    if (copartitioned && aggSpec.isEmpty &&
        required.fieldNames.contains("_partition"))
      new KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("_partition")),
        refs.map(_.partition).distinct.size)
    else new UnknownPartitioning(0)
  }

  override def planInputPartitions(): Array[InputPartition] = aggSpec match {
    case Some(spec) =>
      // metadata-only: one tiny partition of driver-computed rows — scan
      // admission is bypassed because no segment is opened (a count over a
      // million segments is a listing, not a scan)
      val r = listPruned()
      lastPlannedSegments = r.size
      Array(KfsAggResultPartition(aggRows(spec, r)))
    case None =>
      val r = refs
      lastPlannedSegments = r.size
      r.map(x => KfsInputPartition(x.topic, x.partition, x.path,
        x.sizeBytes, minOffsetFor(x)): InputPartition).toArray
  }

  /** Exact aggregates from segment stats: min/max come from the flush-time
    * record bounds; count(*) is dense-offset arithmetic (see the pushdown
    * contract in [[KfsScanBuilder]]). */
  private def aggRows(spec: KfsAggSpec,
      r: Seq[KfsLayout.SegmentRef]): Seq[Seq[Any]] = {
    def row(group: Seq[Any], segs: Seq[KfsLayout.SegmentRef]): Seq[Any] =
      group ++ spec.aggs.map {
        case ("count", _) => segs.map(s => s.lastOffset - s.baseOffset + 1).sum
        case ("min", "_offset") =>
          if (segs.isEmpty) null else segs.map(_.baseOffset).min
        case ("max", "_offset") =>
          if (segs.isEmpty) null else segs.map(_.lastOffset).max
        case ("min", "_ts_ms") =>
          if (segs.isEmpty) null else segs.map(_.minTsMs).min
        case ("max", "_ts_ms") =>
          if (segs.isEmpty) null else segs.map(_.maxTsMs).max
        case other => throw new IllegalStateException(s"unpushable agg $other")
      }
    if (spec.groupCols.isEmpty) Seq(row(Nil, r)) // global: one row, even empty
    else r.groupBy(s => spec.groupCols.map {
      case "_topic" => s.topic
      case "_partition" => s.partition
    }).toSeq.map { case (g, segs) => row(g, segs) }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (aggSpec.isDefined) new KfsAggReaderFactory
    else new KfsReaderFactory(required.fieldNames, conf, limit,
      Some(KfsCodec.BatchBounds(offMin, offMax, tsMin, tsMax))
        .filter(_.isBounded), allowCompressed)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(aggSpec.isEmpty, "aggregate pushdown is a batch-only path")
    new KfsMicroBatchStream(this, maxSegmentsPerTrigger, rails,
      required.fieldNames, conf, allowCompressed)
  }
}

/** `sizeBytes` rides along from discovery so the reader needs zero metadata
  * RPCs — one open, one sequential read per task. `minOffset` is the
  * DeleteRecords horizon for the segment's partition (0 = none): the
  * reader folds it into its batch-granular bounds, so sub-horizon record
  * batches seek past un-decoded and sub-horizon records never emit. */
case class KfsInputPartition(topic: String, partition: Int, path: String,
    sizeBytes: Long, minOffset: Long = 0L)
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  /** Key for storage-partitioned grouping — matches the
    * `identity(_partition)` expression reported by [[KfsScan]]. */
  override def partitionKey(): InternalRow = InternalRow(partition)
}

/** Driver-computed aggregate rows (metadata-only pushdown) — values are
  * plain String/Int/Long/null; converted to Catalyst form in the reader. */
case class KfsAggResultPartition(rows: Seq[Seq[Any]]) extends InputPartition

class KfsAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[KfsAggResultPartition].rows.iterator
      private var current: Seq[Any] = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(current.map {
        case s: String => UTF8String.fromString(s)
        case other => other
      })
      override def close(): Unit = ()
    }
}

class KfsReaderFactory(fieldNames: Array[String], conf: SerializableHadoopConf,
    limit: Option[Int] = None,
    bounds: Option[KfsCodec.BatchBounds] = None,
    allowCompressed: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KfsInputPartition]
    // fold the partition's DeleteRecords horizon into the batch bounds:
    // sub-horizon batches seek past, sub-horizon records never qualify
    val effBounds =
      if (kp.minOffset <= 0L) bounds
      else Some(bounds.getOrElse(KfsCodec.BatchBounds(None, None, None, None)))
        .map(b => b.copy(offMin =
          Some(b.offMin.fold(kp.minOffset)(math.max(_, kp.minOffset)))))
    new KfsPartitionReader(kp, fieldNames, conf, limit, effBounds,
      allowCompressed)
  }
}

/** Decodes one segment file; emits only the required columns. The segment
  * STREAMS through the decoder via Hadoop `FileSystem` (file://, hdfs://,
  * s3a:// all work) — peak task memory is one record batch, never the whole
  * segment, so the reference's multi-hundred-MB flush sizes don't double-
  * buffer per task. Pushed offset/time bounds additionally prune at BATCH
  * granularity inside the segment ([[KfsCodec.BatchBounds]]): non-
  * qualifying batches are `seek`ed past un-decoded — the reference's
  * index-guided ranged GETs (`pkg/storage/log.go:653-683`) — while the
  * record-level residual above the scan keeps results exact. */
class KfsPartitionReader(p: KfsInputPartition, fieldNames: Array[String],
    conf: SerializableHadoopConf, limit: Option[Int] = None,
    bounds: Option[KfsCodec.BatchBounds] = None,
    allowCompressed: Boolean = false)
    extends PartitionReader[InternalRow] {

  /** Rows still allowed under a pushed limit — decode stops mid-segment
    * once the task has produced enough (Spark re-applies the limit above,
    * so per-task capping at n is always safe). */
  private var remaining: Long = limit.map(_.toLong).getOrElse(Long.MaxValue)

  private val in: java.io.DataInputStream = {
    val hp = new HPath(p.path)
    hp.getFileSystem(conf.value).open(hp)
  }
  private val iter: Iterator[KfsCodec.Record] =
    KfsCodec.decodeSegmentStream(in, p.sizeBytes, bounds, allowCompressed)
  private var current: KfsCodec.Record = _
  private val topicUtf = UTF8String.fromString(p.topic)
  private val segmentUtf = UTF8String.fromString(p.path)

  override def next(): Boolean = {
    // record-level bound enforcement: pushed-filter bounds are re-checked
    // above the scan by Spark's residuals (this skip just saves row
    // materialization), but OPTION-seeded bounds (catalog time travel)
    // have no residual — this check is what makes them exact
    while (remaining > 0 && iter.hasNext) {
      val r = iter.next()
      if (qualifies(r)) { current = r; remaining -= 1; return true }
    }
    false
  }

  private def qualifies(r: KfsCodec.Record): Boolean = bounds.forall(b =>
    b.offMin.forall(r.offset >= _) && b.offMax.forall(r.offset <= _) &&
      b.tsMin.forall(r.timestampMs >= _) && b.tsMax.forall(r.timestampMs <= _))

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
