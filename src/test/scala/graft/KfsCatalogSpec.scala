package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.kfs._

/** The DSv2 TableCatalog surface: plain Spark SQL over KFS topics —
  * discovery (SHOW TABLES), pruned scans, time travel (TIMESTAMP/VERSION AS
  * OF with Kafka consumption semantics), and DDL (CREATE/INSERT/DROP). */
class KfsCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val root: String = {
    spark.conf.set("spark.sql.catalog.kfscat", classOf[KfsCatalog].getName)
    val r = KfsSeed.seededRoot(spark, sf)
    spark.conf.set("spark.sql.catalog.kfscat.root", r)
    r
  }

  private def eventsTopic = { root; Tables.eventsTopic(spark, sf) }

  test("SHOW TABLES lists topics; table resolves by multi-part name") {
    val tables = { root; spark.sql("SHOW TABLES IN kfscat") }
      .select("tableName").collect().map(_.getString(0))
    assert(tables.contains("events"))
    assert(spark.sql("SELECT count(*) AS n FROM kfscat.events")
      .head().getLong(0) == eventsTopic.count())
  }

  test("catalog scans keep segment pruning: partition filter plans fewer segments") {
    root
    def plannedSegments(sql: String): Int = {
      val df = spark.sql(sql)
      df.count()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[KfsScan] =
        p.collect {
          case b: BatchScanExec if b.scan.isInstanceOf[KfsScan] =>
            Seq(b.scan.asInstanceOf[KfsScan])
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
        }.flatten
      val ks = walk(df.queryExecution.executedPlan)
      assert(ks.nonEmpty, "no KfsScan in plan")
      ks.head.lastPlannedSegments
    }
    val all = plannedSegments("SELECT * FROM kfscat.events")
    val one = plannedSegments(
      "SELECT * FROM kfscat.events WHERE _partition = 2")
    assert(all > one && one > 0, s"expected pruning: all=$all one=$one")
  }

  test("TIMESTAMP AS OF sees exactly the records a consumer stopped at t would") {
    root
    val cutMs = eventsTopic.select(expr("percentile_approx(_ts_ms, 0.5)"))
      .head().getLong(0)
    val cutLit = java.time.Instant.ofEpochMilli(cutMs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val traveled = spark.sql(
      s"SELECT count(*) AS n, max(_ts_ms) AS m FROM kfscat.events " +
        s"TIMESTAMP AS OF '$cutLit'").head()
    val expected = eventsTopic.where(col("_ts_ms") <= cutMs)
      .agg(count(lit(1)), max(col("_ts_ms"))).head()
    assert(traveled.getLong(0) == expected.getLong(0))
    assert(traveled.getLong(1) == expected.getLong(1))
    assert(traveled.getLong(1) <= cutMs)
  }

  test("VERSION AS OF caps every partition's offsets inclusively") {
    root
    val n = spark.sql(
      "SELECT count(*) AS n, max(_offset) AS m FROM kfscat.events VERSION AS OF 99")
      .head()
    val expected = eventsTopic.where(col("_offset") <= 99)
      .agg(count(lit(1)), max(col("_offset"))).head()
    assert(n.getLong(0) == expected.getLong(0))
    assert(n.getLong(1) == 99L)
    // a LIMIT over a time-traveled table must stay exact (limit pushdown is
    // vetoed because option bounds drop records inside kept segments)
    assert(spark.sql(
      "SELECT * FROM kfscat.events VERSION AS OF 0 LIMIT 10").count() == 4)
  }

  test("CREATE / INSERT INTO / SELECT / DROP round-trips through pure SQL") {
    root
    spark.sql("DROP TABLE IF EXISTS kfscat.scratch")
    spark.sql("CREATE TABLE kfscat.scratch")
    assert(spark.sql("SELECT count(*) FROM kfscat.scratch").head().getLong(0) == 0)
    spark.range(0, 40)
      .select(lit("scratch").as("_topic"),
        (col("id") % 2).cast("int").as("_partition"),
        (col("id") / 2).cast("long").as("_offset"),
        cast_ts(col("id")).as("_ts"),
        (lit(1706000000000L) + col("id")).as("_ts_ms"),
        col("id").cast("string").cast("binary").as("_key"),
        col("id").cast("string").cast("binary").as("_value"),
        map(lit("h"), lit("v")).as("_headers"),
        lit(null).cast("string").as("_segment"))
      .write.insertInto("kfscat.scratch")
    val back = spark.sql(
      "SELECT count(*) AS n, max(_offset) AS m FROM kfscat.scratch").head()
    assert(back.getLong(0) == 40 && back.getLong(1) == 19)
    assert(spark.sql("SHOW TABLES IN kfscat").collect()
      .exists(_.getString(1) == "scratch"))
    spark.sql("DROP TABLE kfscat.scratch")
    assert(!spark.catalog.tableExists("kfscat.scratch"))
  }

  private def cast_ts(id: org.apache.spark.sql.Column) =
    timestamp_micros((lit(1706000000000L) + id) * 1000).cast("timestamp_ntz")

  test("ALTER TABLE TBLPROPERTIES round-trips admin configs (AlterConfigs analog)") {
    root
    spark.sql("DROP TABLE IF EXISTS kfscat.cfgtopic")
    spark.sql("CREATE TABLE kfscat.cfgtopic")
    try {
      // SET: whitelist keys persist to the estate's config.json
      spark.sql("ALTER TABLE kfscat.cfgtopic SET TBLPROPERTIES(" +
        "'retention.ms'='604800000','segment.bytes'='1048576')")
      val props = spark.sql("SHOW TBLPROPERTIES kfscat.cfgtopic").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("retention.ms").contains("604800000"))
      assert(props.get("segment.bytes").contains("1048576"))
      // DescribeConfigs view reads the same store with normalization
      val d = TopicConfigs.describe(root, "cfgtopic").map(e => e.name -> e).toMap
      assert(d("retention.ms").value == "604800000" && !d("retention.ms").isDefault)
      assert(d("retention.bytes").value == "-1" && d("retention.bytes").isDefault)
      assert(d("segment.bytes").value == "1048576" && !d("segment.bytes").isDefault)
      // UNSET returns a key to its default (normalizeSegmentBytes fallback)
      spark.sql("ALTER TABLE kfscat.cfgtopic UNSET TBLPROPERTIES('segment.bytes')")
      val d2 = TopicConfigs.describe(root, "cfgtopic").map(e => e.name -> e).toMap
      assert(d2("segment.bytes").value == TopicConfigs.DefaultSegmentBytes.toString
        && d2("segment.bytes").isDefault)
      // AlterConfigs whitelist + validation (main.go:1470-1489): unknown
      // key, -2 retention, non-positive segment, non-integer all rejected
      intercept[Exception](
        spark.sql("ALTER TABLE kfscat.cfgtopic SET TBLPROPERTIES('nope'='1')"))
      // UNSET of an unknown key is validated by the same whitelist — the
      // reference rejects unknown keys regardless of operation
      intercept[Exception](
        spark.sql(
          "ALTER TABLE kfscat.cfgtopic UNSET TBLPROPERTIES('no.such.key')"))
      intercept[TopicConfigs.InvalidConfigException](
        TopicConfigs.alter(root, "cfgtopic", Map("retention.ms" -> "-2")))
      intercept[TopicConfigs.InvalidConfigException](
        TopicConfigs.alter(root, "cfgtopic", Map("segment.bytes" -> "0")))
      intercept[TopicConfigs.InvalidConfigException](
        TopicConfigs.alter(root, "cfgtopic", Map("retention.bytes" -> "abc")))
      // validateOnly checks everything but writes nothing
      TopicConfigs.alter(root, "cfgtopic", Map("retention.ms" -> "5"),
        validateOnly = true)
      assert(!TopicConfigs.fetch(root, "cfgtopic").get("retention.ms")
        .contains(5L))
      // the broker-resource analog is read-only engine entries
      val b = TopicConfigs.describeBroker(root).map(e => e.name -> e).toMap
      assert(b("kafscale.segment.bytes").readOnly && b("kfs.root").readOnly)
    } finally spark.sql("DROP TABLE IF EXISTS kfscat.cfgtopic")
  }

  test("config commits overwrite atomically and drop evicts the memo") {
    root
    spark.sql("DROP TABLE IF EXISTS kfscat.cfgatom")
    spark.sql("CREATE TABLE kfscat.cfgatom")
    try {
      TopicConfigs.alter(root, "cfgatom", Map("retention.ms" -> "111"))
      // overwriting an EXISTING config is one atomic rename — no
      // delete-then-rename window with no file present, no tmp leftovers
      TopicConfigs.alter(root, "cfgatom", Map("retention.ms" -> "222"))
      assert(TopicConfigs.fetch(root, "cfgatom", fresh = true)
        .get("retention.ms").contains(222L))
      val dir = new org.apache.hadoop.fs.Path(root, "cfgatom")
      val f = dir.getFileSystem(KfsLayout.hadoopConf)
      val strays = f.listStatus(dir)
        .map(_.getPath.getName).filter(_.startsWith(".config-"))
      assert(strays.isEmpty, s"tmp files left behind: ${strays.mkString(",")}")
      // memo eviction through the public path: the memo holds 222, the
      // table is dropped + recreated (drop evicts), and a fetch within the
      // TTL must see the RECREATED topic's empty config — never the dead
      // topic's overrides
      assert(TopicConfigs.fetch(root, "cfgatom")
        .get("retention.ms").contains(222L)) // memoized
      spark.sql("DROP TABLE kfscat.cfgatom")
      spark.sql("CREATE TABLE kfscat.cfgatom")
      assert(TopicConfigs.fetch(root, "cfgatom").isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS kfscat.cfgatom")
  }

  test("streaming read through the catalog drains the topic incrementally") {
    root
    val out = java.nio.file.Files.createTempDirectory("cat_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cat_stream_ck").toString
    val q = spark.readStream.table("kfscat.events")
      .select(col("_partition"), col("_offset"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == eventsTopic.count())
  }

  test("catalog enforces topic ACLs: discovery, reads, and DDL all gated") {
    val r = root
    spark.conf.set("spark.sql.catalog.kfsacl", classOf[KfsCatalog].getName)
    spark.conf.set("spark.sql.catalog.kfsacl.root", r)
    spark.conf.set("spark.sql.catalog.kfsacl.acl.deny", "events,secret-*")
    // enumeration hides denied topics entirely
    assert(!spark.sql("SHOW TABLES IN kfsacl").collect()
      .exists(_.getString(1) == "events"))
    // reads and DDL on denied topics surface the ACL denial
    val e = intercept[Exception](
      spark.sql("SELECT count(*) FROM kfsacl.events").collect())
    def aclMsg(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[graft.gov.AclDeniedException] ||
        Option(t.getMessage).exists(_.contains("denied by ACL")) ||
        aclMsg(t.getCause))
    assert(aclMsg(e) || e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
    intercept[Exception](spark.sql("CREATE TABLE kfsacl.`secret-x`"))
    // non-denied topics keep working through the same catalog
    spark.sql("DROP TABLE IF EXISTS kfsacl.open_topic")
    spark.sql("CREATE TABLE kfsacl.open_topic")
    assert(spark.sql("SHOW TABLES IN kfsacl").collect()
      .exists(_.getString(1) == "open_topic"))
    spark.sql("DROP TABLE kfsacl.open_topic")
  }

  test("unknown topic and nested namespaces fail cleanly") {
    root
    val e = intercept[Exception](spark.sql("SELECT * FROM kfscat.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.contains("nope"))
    intercept[Exception](
      spark.sql("SELECT * FROM kfscat.a.b").collect())
  }
}
