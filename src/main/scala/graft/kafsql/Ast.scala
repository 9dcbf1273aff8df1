package graft.kafsql

/** KAFSQL AST — mirrors the reference's clause grammar (`sql/parser.go:
  * 26-146`): SELECT with Kafka-native LAST/TAIL/SCAN FULL/WITHIN extensions,
  * SHOW/DESCRIBE/EXPLAIN. The reference's parser is a single-pass
  * keyword/regex scanner with the AST as its only IR; ours is a hand-rolled
  * tokenizer + recursive descent producing this typed AST, which the
  * [[Planner]] lowers onto DataFrames (Catalyst is the optimizer — the
  * reference has none, SURVEY §4).
  */
sealed trait Statement

case object ShowTopics extends Statement
final case class ShowPartitions(topic: String) extends Statement

/** `SHOW SEGMENTS FROM t` — segment-estate introspection (SUPERSET: the
  * reference exposes per-topic segment/partition status through the ops
  * console's `/ui/api/status` JSON, `internal/console/server.go:109,199`,
  * not through SQL; surfacing it as a statement keeps one front door). */
final case class ShowSegments(topic: String) extends Statement

/** `SHOW OFFSETS FROM t` — the ListOffsets data half (key 2,
  * `kafscale-spec.md:185-208`): per partition, EARLIEST (the log start —
  * the DeleteRecords horizon when one exists, else the first retained
  * segment's base) and LATEST (the high watermark, last offset + 1).
  * Metadata-only: manifests + the horizon file, zero segment reads. */
final case class ShowOffsets(topic: String) extends Statement

/** `SHOW OFFSETS FROM t AT <ts>` — ListOffsets' TIMESTAMP resolution
  * (key 2 with a real timestamp, `kafscale-spec.md:185-208`; the
  * `offsetsForTimes` client call): per partition, the earliest offset
  * whose record timestamp is >= the literal — epoch-ms integer,
  * `yyyy-MM-dd[ HH:mm:ss[.SSS]]`, or RFC3339, like every `_ts` bound.
  * Partitions with no record at/after the target are omitted (the client
  * convention for a null seek result). Horizon-aware: never resolves
  * below the DeleteRecords log start. Kafka's own index-then-scan shape:
  * the `.kfst` sidecars pick each partition's boundary segment
  * (metadata), and ONLY that segment decodes. */
final case class ShowOffsetsAt(topic: String, tsMs: Long) extends Statement
final case class DescribeTopic(topic: String) extends Statement

/** `DESCRIBE CONFIGS t` — admin-config introspection as a statement (the
  * data half of the reference's DescribeConfigs admin API, key 32,
  * `kafscale-spec.md:185-208` / `cmd/broker/main.go:1354-1422`; the broker
  * wire protocol is out of scope, the config surface is not). */
final case class DescribeConfigs(topic: String) extends Statement

/** `SHOW GROUPS` — the ListGroups data half (key 16,
  * `pkg/broker/coordinator.go:449-486`): one row per consumer group known
  * to the committed-offset estate, with the reference's state/protocol
  * normalization (an offsets-only group is `Empty`, protocol type
  * defaults to `consumer`, group type `classic`). The join/sync/heartbeat
  * state machine stays out of scope (SURVEY St6). */
case object ShowGroups extends Statement

/** `DESCRIBE GROUP g` — the DescribeGroups (key 15,
  * `coordinator.go:425-447,614-652`) + OffsetFetch (key 9) data halves,
  * shaped like `kafka-consumer-groups.sh --describe`: per-partition
  * committed position, commit metadata, commit time, log-end offset, and
  * lag. Unknown group raises (the GROUP_ID_NOT_FOUND analog,
  * `coordinator.go:438-443`). */
final case class DescribeGroup(group: String) extends Statement
final case class Explain(select: Select, analyze: Boolean = false) extends Statement

final case class Select(
    star: Boolean,
    projections: Seq[Projection],
    from: TableRef,
    join: Option[JoinClause],
    where: Seq[Predicate],
    groupBy: Seq[ColRef],
    orderBy: Option[OrderBy],
    limit: Option[Int],
    window: Option[WindowClause]) extends Statement

final case class TableRef(topic: String, alias: Option[String])

/** `[LEFT] JOIN t2 [ON expr = expr] WITHIN dur` — bounded two-topic join;
  * ON omitted → `_key = _key` (server.go:2326-2333). */
final case class JoinClause(
    left: Boolean,
    table: TableRef,
    on: Option[(Expr, Expr)],
    withinMs: Long)

sealed trait Expr
final case class ColRef(qualifier: Option[String], name: String) extends Expr
/** kind: value | query | exists (server.go:1686-1729). */
final case class JsonFunc(kind: String, target: ColRef, path: String) extends Expr
/** kind: count | sum | avg | min | max; arg None = `COUNT(*)`. */
final case class AggFunc(kind: String, arg: Option[Expr]) extends Expr

final case class Projection(expr: Expr, alias: Option[String])

sealed trait Predicate
final case class PartitionEq(value: Int) extends Predicate           // parser.go:231-240
final case class OffsetCmp(gte: Boolean, value: Long) extends Predicate // parser.go:241-258
final case class TsCmp(gte: Boolean, epochMs: Long) extends Predicate   // parser.go:370-424
final case class TsBetween(loMs: Long, hiMs: Long) extends Predicate

sealed trait WindowClause
final case class Last(durMs: Long) extends WindowClause // parser.go:142-143
final case class Tail(n: Int) extends WindowClause      // parser.go:144
case object ScanFull extends WindowClause               // parser.go:145

final case class OrderBy(column: String, asc: Boolean)

final class KafsqlException(msg: String) extends RuntimeException(msg)
