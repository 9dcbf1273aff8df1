package graft.kafsql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Topic metadata + schema-on-read config (reference
  * `internal/config/config.go:141-155`, user-guide.md:199-217): per-topic
  * declared columns mapped onto JSON dot-paths inside `_value`, with scalar
  * types string|int|long|double|boolean|timestamp; extraction failures yield
  * SQL NULL (`server.go:2784-2787`).
  */
final case class SchemaCol(name: String, typ: String, path: String) {
  require(Set("string", "int", "long", "double", "boolean", "timestamp")(typ),
    s"unsupported schema type: $typ") // config.go:346-353
}

/** Per-segment metadata for `SHOW SEGMENTS` — the console-status view of
  * a topic's estate (`internal/console/server.go:199` surfaces the same
  * per-partition segment stats as JSON). Engine-neutral so the registry
  * does not depend on the KFS layout; the KFS-backed topics adapt
  * [[graft.kfs.KfsLayout.SegmentRef]] into this. */
final case class SegmentInfo(
    partition: Int,
    baseOffset: Long,
    lastOffset: Long,
    records: Long,
    minTsMs: Long,
    maxTsMs: Long,
    sizeBytes: Long)

/** One DescribeConfigs-style entry for `DESCRIBE CONFIGS` — the data half
  * of the reference's admin config API (`kafscale-spec.md:185-208`, key 32;
  * entry shape mirrors `DescribeConfigsResponseResourceConfig`,
  * `cmd/broker/main.go:1634-1650`). Engine-neutral like [[SegmentInfo]];
  * KFS-backed topics adapt [[graft.kfs.TopicConfigs.ConfigEntry]]. */
final case class ConfigInfo(
    name: String,
    value: String,
    isDefault: Boolean,
    readOnly: Boolean,
    source: String)

/** One group × partition committed position for `SHOW GROUPS` /
  * `DESCRIBE GROUP` — the ListGroups/DescribeGroups/OffsetFetch data
  * halves (`pkg/broker/coordinator.go:425-486,614-652`). Engine-neutral
  * like [[SegmentInfo]]; KFS-backed estates adapt
  * [[graft.kfs.ConsumerGroups]]' metadata-only positions. */
final case class GroupPositionInfo(
    group: String,
    topic: String,
    partition: Int,
    committedOffset: Long,
    metadata: String,
    committedAtMs: Long,
    logEndOffset: Long) {
  def lag: Long = logEndOffset - committedOffset
}

/** One queryable topic: a frame supplier exposing the 8 implicit columns
  * (+ `_ts_ms`), declared schema columns, known partitions, and optional
  * estate introspection hooks (`SHOW SEGMENTS`, `DESCRIBE CONFIGS`). */
final case class TopicDef(
    name: String,
    frame: SparkSession => DataFrame,
    schemaCols: Seq[SchemaCol] = Nil,
    partitions: Seq[Int] = Nil,
    segments: Option[SparkSession => Seq[SegmentInfo]] = None,
    configs: Option[SparkSession => Seq[ConfigInfo]] = None,
    /** Per-partition log-start offsets (the DeleteRecords horizon) —
      * powers `SHOW OFFSETS`' EARLIEST column; absent entries read 0. */
    logStarts: Option[SparkSession => Map[Int, Long]] = None)

final class TopicRegistry(defs: Seq[TopicDef],
    /** Optional estate-level hook serving every group's per-partition
      * committed positions (metadata-only) — powers `SHOW GROUPS` and
      * `DESCRIBE GROUP`. Root-scoped, not per topic: a group's
      * subscriptions span topics. */
    val groupPositions: Option[SparkSession => Seq[GroupPositionInfo]] = None) {
  private val byName = defs.map(d => d.name -> d).toMap

  def topicNames: Seq[String] = defs.map(_.name).sorted

  def get(name: String): TopicDef =
    byName.getOrElse(name,
      throw new KafsqlException(s"unknown topic: $name"))

  /** Topic frame with schema-on-read columns materialized. Extraction =
    * JSON dot-path walk + per-type coercion, NULL on miss/parse failure
    * (`server.go:2721-2792`). */
  def frame(spark: SparkSession, name: String): DataFrame = {
    val d = get(name)
    val base = d.frame(spark)
    d.schemaCols.foldLeft(base) { (df, sc) =>
      df.withColumn(sc.name, TopicRegistry.extract(col("_value"), sc))
    }
  }
}

object TopicRegistry {
  /** Typed JSON-path extraction over the value column. try_cast, not cast:
    * coercion failure must yield SQL NULL (server.go:2784-2787), and Spark 4
    * runs ANSI mode where plain cast throws on malformed input. */
  def extract(value: Column, sc: SchemaCol): Column = {
    val js = get_json_object(value.cast("string"), sc.path)
    sc.typ match {
      case "string" => js
      case "int" => js.try_cast("int")
      case "long" => js.try_cast("long")
      case "double" => js.try_cast("double")
      case "boolean" => js.try_cast("boolean")
      case "timestamp" =>
        // epoch-ms integers or formatted strings (server.go:2111-2130)
        when(js.rlike("^-?\\d+$"), timestamp_millis(js.try_cast("long")).cast("timestamp_ntz"))
          .otherwise(js.try_cast("timestamp").cast("timestamp_ntz"))
    }
  }

  /** pg type names the reference's DESCRIBE reports (server.go:2704-2719). */
  def pgType(typ: String): String = typ match {
    case "string" => "text"
    case "int" => "integer"
    case "long" => "bigint"
    case "double" => "double precision"
    case "boolean" => "boolean"
    case "timestamp" => "timestamp"
  }

  /** The 8 implicit columns in DESCRIBE order with pg types
    * (server.go:829-841, 1624-1669). */
  val implicitColumns: Seq[(String, String)] = Seq(
    "_topic" -> "text", "_partition" -> "integer", "_offset" -> "bigint",
    "_ts" -> "timestamp", "_key" -> "bytea", "_value" -> "bytea",
    "_headers" -> "jsonb", "_segment" -> "text")
}
