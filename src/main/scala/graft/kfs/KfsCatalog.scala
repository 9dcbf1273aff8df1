package graft.kfs

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `TableCatalog` over a KFS root: every topic directory is a
  * SQL table, so the whole engine surface is reachable from PLAIN SPARK SQL
  * with zero graft-specific API:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.kfs", classOf[KfsCatalog].getName)
  * spark.conf.set("spark.sql.catalog.kfs.root", "s3a://bucket/logs")
  * spark.sql("SHOW TABLES IN kfs")                 // topic discovery
  * spark.sql("SELECT * FROM kfs.events WHERE _partition = 2")  // pruned scan
  * spark.sql("SELECT * FROM kfs.events TIMESTAMP AS OF '2024-01-15'")
  * spark.sql("SELECT * FROM kfs.events VERSION AS OF 5000")
  * spark.sql("INSERT INTO kfs.clicks SELECT ...")  // DSv2 batch write
  * }}}
  *
  * This is the Spark-native equivalent of the reference's catalog plumbing —
  * `SHOW TOPICS` (`server.go:1387-1420`) becomes `SHOW TABLES`, pg_catalog
  * topic relations become catalog identifiers — except the integration point
  * is Spark's `CatalogManager`, so joins across catalogs, views, and every
  * SQL construct compose for free.
  *
  * Time travel maps onto Kafka-native consumption semantics:
  *   - `TIMESTAMP AS OF t` = the topic as of wall-clock `t`: records with
  *     `_ts_ms <= t`, enforced per record and pruned per segment/batch via
  *     the same `.kfst`/manifest stats as a pushed `_ts_ms` predicate
  *     (a consumer that stopped at `t` sees exactly this).
  *   - `VERSION AS OF n` = records with `_offset <= n` in every partition
  *     (a consumer group whose committed offsets are all `n`). Offsets are
  *     per-partition in Kafka, so a single global version is a cap, not a
  *     cross-partition cut — documented, deterministic, and what a
  *     "replay to offset" tool does.
  *
  * Namespaces are flat (topics only), mirroring Kafka's flat topic space.
  * `CREATE TABLE` provisions an empty topic directory (the layout's only
  * metadata); `DROP TABLE` removes the topic tree — both driver-side
  * metadata ops, never data scans.
  */
class KfsCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  /** Catalog-level options forwarded to every table (guardrails etc.). */
  private var passthrough: Map[String, String] = Map.empty
  /** Topic ACL (same allow/deny glob semantics as kafsql and pg-wire —
    * deny wins, empty allow = allow-all): `spark.sql.catalog.<n>.acl.allow`
    * / `.acl.deny`, comma-separated globs. Every resolution path (load,
    * exists, DDL) enforces it, and listTables enumerates only allowed
    * topics — a SQL user cannot discover past the ACL. */
  private var acl: graft.gov.TopicAcl = graft.gov.TopicAcl()

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires option 'root' " +
          s"(spark.sql.catalog.$name.root = <kfs root path>)"))
    def globs(k: String): Seq[String] =
      Option(options.get(k)).toSeq.flatMap(_.split(',')).map(_.trim)
        .filter(_.nonEmpty)
    acl = graft.gov.TopicAcl(globs("acl.allow"), globs("acl.deny"))
    passthrough = options.asScala.toMap -- Seq("root", "acl.allow", "acl.deny")
  }

  private def requireAllowed(topic: String): Unit =
    if (!acl.allows(topic))
      throw new graft.gov.AclDeniedException(
        s"access to topic '$topic' denied by ACL")

  override def name(): String = catalogName

  private def fs = {
    val p = new HPath(root)
    (p.getFileSystem(KfsLayout.hadoopConf), p)
  }

  private def topicPath(ident: Identifier): HPath = {
    if (ident.namespace().nonEmpty)
      throw new NoSuchTableException(ident)
    new HPath(root, ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    val (f, p) = fs
    if (!f.exists(p)) Array.empty
    else f.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(acl.allows) // enumeration never leaks past the ACL
      .map(Identifier.of(Array.empty, _))
      .sortBy(_.name())
  }

  override def loadTable(ident: Identifier): Table = {
    requireAllowed(ident.name())
    val (f, _) = fs
    val tp = topicPath(ident)
    if (!f.exists(tp)) throw new NoSuchTableException(ident)
    kfsTable(ident, Map.empty)
  }

  /** `VERSION AS OF n` — inclusive per-partition offset cap. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val cap =
      try version.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"kfs VERSION AS OF expects a max offset (long), got '$version'")
      }
    require(cap >= 0, s"kfs VERSION AS OF offset must be >= 0, got $cap")
    requireAllowed(ident.name())
    val (f, _) = fs
    if (!f.exists(topicPath(ident))) throw new NoSuchTableException(ident)
    kfsTable(ident, Map("offset_max_inclusive" -> cap.toString))
  }

  /** `TIMESTAMP AS OF t` — Spark hands micros since epoch; records keep
    * ms precision, so the inclusive ms cap is the floor (a record stamped
    * inside the cut-off millisecond is visible, matching `<=` on `_ts_ms`). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    requireAllowed(ident.name())
    val (f, _) = fs
    if (!f.exists(topicPath(ident))) throw new NoSuchTableException(ident)
    kfsTable(ident,
      Map("ts_max_ms" -> Math.floorDiv(timestampMicros, 1000L).toString))
  }

  private def kfsTable(ident: Identifier, extra: Map[String, String]): Table =
    new KfsTable(passthrough ++ Map(
      "path" -> root, "topics" -> ident.name()) ++
      // stored admin-config overrides surface as table properties, so
      // `SHOW TBLPROPERTIES kfs.topic` is the DescribeConfigs read path
      TopicConfigs.fetch(root, ident.name())
        .map { case (k, v) => k -> v.toString } ++ extra)

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && acl.allows(ident.name()) && {
      val (f, _) = fs; f.exists(topicPath(ident))
    }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (schema.nonEmpty && schema != KfsV2.Schema)
      throw new IllegalArgumentException(
        "kfs tables have the fixed topic schema " +
          s"(${KfsV2.Schema.fieldNames.mkString(", ")}); " +
          "omit the column list in CREATE TABLE")
    if (partitions.nonEmpty)
      throw new IllegalArgumentException(
        "kfs tables are partitioned by _partition intrinsically; " +
          "PARTITIONED BY is not supported")
    requireAllowed(ident.name())
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val (f, _) = fs
    f.mkdirs(topicPath(ident))
    kfsTable(ident, Map.empty)
  }

  /** ALTER TABLE SET/UNSET TBLPROPERTIES over the admin-config whitelist
    * — the AlterConfigs analog (key 33, `cmd/broker/main.go:1424-1500`):
    * only {retention.ms, retention.bytes, segment.bytes} mutate, with the
    * reference's validation; schema changes stay rejected (fixed topic
    * schema). SQL property semantics are incremental (SET merges, UNSET
    * removes), layered over the stored config. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    requireAllowed(ident.name())
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // fresh read: folding SET/UNSET over a memoized snapshot would
    // silently drop a config change another process committed within the
    // memo TTL (a lost update)
    val stored = TopicConfigs.fetch(root, ident.name(), fresh = true)
      .map { case (k, v) => k -> v.toString }
    val updated = changes.foldLeft(stored) {
      case (acc, set: TableChange.SetProperty) =>
        if (!TopicConfigs.Alterable.contains(set.property))
          throw new TopicConfigs.InvalidConfigException(
            s"invalid config: unknown key '${set.property}' " +
              s"(alterable: ${TopicConfigs.Alterable.toSeq.sorted.mkString(", ")})")
        acc + (set.property -> set.value)
      case (acc, rm: TableChange.RemoveProperty) =>
        // same whitelist as SET: the reference's AlterConfigs validation
        // rejects unknown keys regardless of operation (main.go:1470-1489)
        if (!TopicConfigs.Alterable.contains(rm.property))
          throw new TopicConfigs.InvalidConfigException(
            s"invalid config: unknown key '${rm.property}' " +
              s"(alterable: ${TopicConfigs.Alterable.toSeq.sorted.mkString(", ")})")
        acc - rm.property
      case _ => throw new UnsupportedOperationException(
        "kfs topics have a fixed schema; only SET/UNSET TBLPROPERTIES of " +
          s"{${TopicConfigs.Alterable.toSeq.sorted.mkString(", ")}} is supported")
    }
    TopicConfigs.alter(root, ident.name(), updated)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    requireAllowed(ident.name())
    tableExists(ident) && {
      val (f, _) = fs
      KfsLayout.invalidateDiscoveryCache(root)
      TopicConfigs.memoEvict(root, ident.name()) // dead table's overrides
      f.delete(topicPath(ident), true)
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    requireAllowed(oldIdent.name()); requireAllowed(newIdent.name())
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val (f, _) = fs
    KfsLayout.invalidateDiscoveryCache(root)
    TopicConfigs.memoEvict(root, oldIdent.name())
    TopicConfigs.memoEvict(root, newIdent.name())
    if (!f.rename(topicPath(oldIdent), topicPath(newIdent)))
      throw new IllegalStateException(
        s"rename ${oldIdent.name()} -> ${newIdent.name()} failed")
  }

  // ---- SupportsNamespaces: flat topic space, only the root namespace ----

  override def defaultNamespace(): Array[String] = Array.empty

  override def listNamespaces(): Array[Array[String]] = Array.empty

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] =
    if (namespace.isEmpty) Map("location" -> root).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException(
      "kfs topics live in a flat namespace; CREATE NAMESPACE is not supported")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "kfs namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "the kfs root namespace cannot be dropped")
}
