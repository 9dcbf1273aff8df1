package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.kafsql._
import graft.queries.KafsqlPack

/** Parser forms + the reference's validation-rule parity
  * (mirrors `server_test.go` cases: unbounded rejection, TAIL restrictions,
  * join-window requirements, aggregate validation). */
class KafsqlSpec extends AnyFunSuite {
  import TestSpark._

  private def reg = KafsqlPack.registry(sf)
  private def q(s: String) =
    Kafsql.sql(spark, reg, s, nowMs = Tables.FixedNowMs)
  private def err(s: String): String =
    intercept[KafsqlException](q(s).collect()).getMessage

  // ---- parser -----------------------------------------------------------

  test("durations: Go units plus Nd days") {
    assert(Parser.parseDurationMs("300ms") == 300)
    assert(Parser.parseDurationMs("5s") == 5000)
    assert(Parser.parseDurationMs("10m") == 600000)
    assert(Parser.parseDurationMs("2h") == 7200000)
    assert(Parser.parseDurationMs("7d") == 604800000)
    assert(Parser.parseDurationMs("1h30m") == 5400000)
    intercept[KafsqlException](Parser.parseDurationMs("5x"))
  }

  test("timestamp literals: epoch ms, datetime layouts, RFC3339") {
    assert(Parser.parseTsLiteralMs("1704067200000") == 1704067200000L)
    assert(Parser.parseTsLiteralMs("2024-01-01 00:00:00") == 1704067200000L)
    assert(Parser.parseTsLiteralMs("2024-01-01 00:00:00.500") == 1704067200500L)
    assert(Parser.parseTsLiteralMs("2024-01-01") == 1704067200000L)
    assert(Parser.parseTsLiteralMs("2024-01-01T00:00:00Z") == 1704067200000L)
    intercept[KafsqlException](Parser.parseTsLiteralMs("bogus"))
  }

  test("statement dispatch parses show/describe/explain/select") {
    assert(Parser.parse("SHOW TOPICS") == ShowTopics)
    assert(Parser.parse("SHOW PARTITIONS FROM events") == ShowPartitions("events"))
    assert(Parser.parse("SHOW SEGMENTS FROM events") == ShowSegments("events"))
    assert(Parser.parse("DESCRIBE events") == DescribeTopic("events"))
    assert(Parser.parse("EXPLAIN SELECT * FROM events LAST 5m").isInstanceOf[Explain])
    val sel = Parser.parse(
      "SELECT _partition, COUNT(*) AS cnt FROM events GROUP BY _partition LAST 5m")
      .asInstanceOf[Select]
    assert(sel.groupBy == Seq(ColRef(None, "_partition")))
    assert(sel.window.contains(Last(300000)))
  }

  test("join clause parses sides, window, left flag") {
    val sel = Parser.parse(
      "SELECT o._key FROM orders o LEFT JOIN payments p " +
        "ON json_value(o._value, '$.id') = p._key WITHIN 10m LAST 1h")
      .asInstanceOf[Select]
    val j = sel.join.get
    assert(j.left && j.withinMs == 600000)
    assert(j.on.get._1 == JsonFunc("value", ColRef(Some("o"), "_value"), "$.id"))
  }

  // ---- validation parity -------------------------------------------------

  test("unbounded query rejection (server.go:1316-1319)") {
    assert(err("SELECT _offset FROM events")
      .contains("unbounded query: add LAST, TAIL, or SCAN FULL"))
  }

  test("order by supports _ts only (server.go:1347-1352)") {
    assert(err("SELECT _offset FROM events ORDER BY _offset LAST 5m")
      .contains("order by supports _ts only"))
  }

  test("TAIL cannot combine with ORDER BY or aggregates") {
    assert(err("SELECT _offset FROM events ORDER BY _ts TAIL 5")
      .contains("TAIL"))
    assert(err("SELECT COUNT(*) AS c FROM events TAIL 5")
      .contains("TAIL"))
  }

  test("join requires WITHIN (parse) and LAST (plan) — server.go:2291-2293") {
    intercept[KafsqlException](
      Parser.parse("SELECT _key FROM a JOIN b ON a._key = b._key LAST 1h"))
    assert(err("SELECT o._key FROM purchases o JOIN errors p WITHIN 5m")
      .contains("join requires LAST"))
  }

  test("aggregate validation: star, non-grouped column, joins") {
    assert(err("SELECT * FROM events GROUP BY _partition LAST 5m") // needs agg
      .contains("GROUP BY requires aggregate"))
    assert(err("SELECT _offset, COUNT(*) AS c FROM events GROUP BY _partition LAST 5m")
      .contains("must appear in GROUP BY"))
    assert(err("SELECT COUNT(*) AS c FROM purchases o JOIN errors p WITHIN 5m LAST 1h")
      .contains("aggregates are not supported in joins"))
  }

  test("partition/offset filters rejected in joins (server.go:2311-2324)") {
    assert(err("SELECT o._key FROM purchases o JOIN errors p WITHIN 5m " +
      "WHERE _partition = 1 LAST 1h")
      .contains("partition/offset filters are not supported in joins"))
  }

  test("limit cap (config max_rows)") {
    assert(err("SELECT _offset FROM events LIMIT 999999 LAST 5m")
      .contains("exceeds max_rows"))
  }

  test("unsupported WHERE columns are rejected (only _partition/_offset/_ts)") {
    intercept[KafsqlException](
      Parser.parse("SELECT _offset FROM events WHERE value = 3 LAST 5m"))
  }

  // ---- planner behavior ---------------------------------------------------

  test("LAST merges with explicit _ts lower bound via max (server.go:1368-1384)") {
    val sel = Parser.parse(
      s"SELECT _offset FROM events WHERE _ts >= '2024-01-25 00:00:00' LAST 30d")
      .asInstanceOf[Select]
    val (lo, hi) = Planner.tsBounds(sel, Tables.FixedNowMs)
    assert(lo.contains(Parser.parseTsLiteralMs("2024-01-25 00:00:00")))
    assert(hi.contains(Tables.FixedNowMs))
  }

  test("default limit 1000 applies to plain selects (config default_limit)") {
    val n = q("SELECT _offset FROM events SCAN FULL").count()
    assert(n == 1000) // sf0.001 has 1000 rows; SCAN FULL caps at 1000 too
    val n2 = q("SELECT _offset FROM events WHERE _partition = 1 LAST 30d").count()
    assert(n2 == 250)
  }

  test("SELECT * expands to 8 implicit + declared schema columns") {
    val df = q("SELECT * FROM events LAST 1d")
    assert(df.columns.toSeq ==
      TopicRegistry.implicitColumns.map(_._1) ++ Seq("k"))
  }

  test("star join projection emits 8 left + 8 _right_-prefixed columns") {
    val df = q("SELECT * FROM purchases o JOIN errors p WITHIN 6h LAST 14d")
    assert(df.columns.length == 16)
    assert(df.columns.count(_.startsWith("_right_")) == 8)
  }

  test("single-table alias-qualified references resolve") {
    val rows = q("SELECT e._offset, e._key FROM events e WHERE _partition = 0 " +
      "LIMIT 5 LAST 30d").collect()
    assert(rows.length == 5)
  }

  test("EXPLAIN returns a plan description") {
    val rows = q("EXPLAIN SELECT _offset FROM events LAST 5m")
      .collect().map(_.getString(0))
    assert(rows.head.contains("scan topic events"))
  }

  test("EXPLAIN ANALYZE executes and reports observed rows + elapsed time") {
    val rows = q("EXPLAIN ANALYZE SELECT _offset FROM events " +
      "WHERE _partition = 1 AND _offset <= 4 SCAN FULL")
      .collect().map(_.getString(0))
    assert(rows.head.contains("scan topic events"))
    val analyzed = rows.last
    assert(analyzed.startsWith("analyze: rows=5 elapsed_ms="),
      s"expected observed-rows line, got: $analyzed")
    // plain EXPLAIN must NOT execute (no analyze line)
    val plain = q("EXPLAIN SELECT _offset FROM events LAST 5m")
      .collect().map(_.getString(0))
    assert(!plain.exists(_.startsWith("analyze:")))
  }

  test("SHOW TOPICS lists registry topics") {
    val topics = q("SHOW TOPICS").collect().map(_.getString(0)).toSeq
    assert(topics ==
      Seq("docsestate", "errors", "events", "kevents", "purchases"))
  }

  test("SHOW SEGMENTS: manifest stats per segment; topics without an estate refuse") {
    // sf0.001: 1000 events over 4 partitions, 1000-record segment cap →
    // exactly one segment per partition with dense offsets 0..249
    val rows = q("SHOW SEGMENTS FROM kevents")
      .select("partition", "base_offset", "last_offset", "records")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == (0 until 4).map(p => (p, 0L, 249L, 250L)))
    assert(err("SHOW SEGMENTS FROM events").contains("no segment estate"))
  }

  test("SHOW OFFSETS: horizon-aware earliest, emptied partition reports horizon==latest") {
    import graft.kafsql.{SegmentInfo, TopicDef, TopicRegistry}
    val reg2 = new TopicRegistry(Seq(TopicDef("t",
      _ => Tables.eventsTopic(spark, sf),
      partitions = Seq(0, 1, 2),
      segments = Some(_ => Seq(
        SegmentInfo(0, 100, 199, 100, 0, 0, 10), // straddled by horizon 150
        SegmentInfo(1, 0, 49, 50, 0, 0, 10))),   // no horizon
      logStarts = Some(_ => Map(0 -> 150L, 2 -> 40L)))))
    val rows = graft.kafsql.Kafsql
      .sql(spark, reg2, "SHOW OFFSETS FROM t", nowMs = Tables.FixedNowMs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(rows == Seq(
      (0, 150L, 200L), // earliest = the horizon, not the segment base
      (1, 0L, 50L),    // no horizon: first segment base
      (2, 40L, 40L)))  // DeleteRecords emptied it: earliest == latest
    assert(err("SHOW OFFSETS FROM events").contains("no segment estate"))
  }

  test("SHOW OFFSETS AT: earliest offset at/after the target, one segment per scan") {
    import org.apache.spark.sql.functions.{col, min}
    // mid-estate target: the dialect answer must equal the relational
    // earliest-at-or-after per partition
    val t = 1705276800000L // 2024-01-15 00:00:00 UTC
    val got = q(s"SHOW OFFSETS FROM kevents AT $t")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val exp = Tables.eventsTopic(spark, sf).where(col("_ts_ms") >= t)
      .groupBy(col("_partition")).agg(min(col("_offset")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == exp, s"got $got, expected $exp")
    // the date-only literal layout resolves identically
    assert(q("SHOW OFFSETS FROM kevents AT '2024-01-15'")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap == exp)
    // a target past the estate's last record omits every partition (the
    // client's null-seek convention)
    assert(q("SHOW OFFSETS FROM kevents AT '2030-01-01'").count() == 0)
    // index-then-scan: on the multi-segment docs estate (250-record
    // segments), the resolution decodes exactly ONE segment — the .kfst
    // boundary pick, not an estate-wide read
    val df = q("SHOW OFFSETS FROM docsestate AT 1700000000300")
    assert(df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((0, 300L)))
    val plan = df.queryExecution.executedPlan.toString
    val segCounts = "KfsScan\\[segments=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    assert(segCounts.nonEmpty && segCounts.forall(_ == 1),
      s"AT resolution must decode one boundary segment per partition:\n$plan")
    // topics without an estate refuse, like the other estate statements
    assert(err("SHOW OFFSETS FROM events AT 0").contains("no segment estate"))
  }

  test("KAFSQL over the DSv2 KFS topic pushes LAST/partition into the scan") {
    val df = q("SELECT _offset, k FROM kevents WHERE _partition = 1 " +
      "LIMIT 100000 LAST 30d")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("KfsScan"), s"expected KfsScan in plan:\n$plan")
    // partition pushdown: only partition-1 segments survive planning
    assert(plan.contains("segments=1"), s"expected pruned scan in:\n$plan")
    assert(df.count() == 250) // sf0.001: 250 records in partition 1
  }

  test("join: null/missing keys never match; LEFT JOIN still emits the left row " +
    "with NULL right side (server.go:2606-2642)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    def topic(withNullKey: Boolean) = Tables.eventsTopic(spark, sf)
      .filter(col("_partition") === 0 && col("_offset") < 4)
      .withColumn("_key",
        if (withNullKey) when(col("_offset") === 0, lit(null)).otherwise(lit("shared"))
        else lit("shared"))
    val reg2 = new TopicRegistry(Seq(
      TopicDef("l", _ => topic(withNullKey = true)),
      TopicDef("r", _ => topic(withNullKey = false))))
    val inner = Kafsql.sql(spark, reg2,
      "SELECT a._offset AS lo, b._offset AS ro FROM l a JOIN r b WITHIN 30d LAST 60d",
      nowMs = Tables.FixedNowMs).collect()
    assert(inner.forall(_.getLong(0) != 0L)) // null-key left rows match nothing
    val left = Kafsql.sql(spark, reg2,
      "SELECT a._offset AS lo, b._offset AS ro FROM l a LEFT JOIN r b WITHIN 30d LAST 60d",
      nowMs = Tables.FixedNowMs).collect()
    val nullKeyRows = left.filter(_.getLong(0) == 0L)
    assert(nullKeyRows.length == 1 && nullKeyRows.head.isNullAt(1))
  }

  test("aggregate output ordering: NULL group key sorts via <nil> sentinel " +
    "(server.go:1968-1981)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val reg2 = new TopicRegistry(Seq(TopicDef("t",
      _ => Tables.eventsTopic(spark, sf)
        .withColumn("_key",
          when(col("_offset") % 2 === 0, lit(null)).otherwise(lit("a"))))))
    val rows = Kafsql.sql(spark, reg2,
      "SELECT _key, COUNT(*) AS c FROM t GROUP BY _key LAST 60d",
      nowMs = Tables.FixedNowMs).collect()
    // "<nil>" < "a" lexicographically -> NULL group first
    assert(rows.length == 2)
    assert(rows.head.isNullAt(0) && rows(1).getString(0) == "a")
  }

  test("schema-on-read extraction failures yield NULL (server.go:2784-2787)") {
    val reg2 = new TopicRegistry(Seq(TopicDef("events",
      s => Tables.eventsTopic(s, sf),
      schemaCols = Seq(SchemaCol("nope", "int", "$.missing"),
        SchemaCol("k", "int", "$.k")))))
    val df = Kafsql.sql(spark, reg2,
      "SELECT _offset, nope, k FROM events WHERE _partition = 0 LAST 30d",
      nowMs = Tables.FixedNowMs)
    val rows = df.collect()
    assert(rows.forall(_.isNullAt(1)))
    assert(rows.forall(!_.isNullAt(2)))
  }

  test("SHOW GROUPS / DESCRIBE GROUP serve the committed-offset estate") {
    val root = graft.kfs.KfsSeed.seededRoot(spark, sf)
    graft.kfs.ConsumerGroups.commit(root, "spec_group", "events", 0, 7L,
      metadata = "m", nowMs = Tables.FixedNowMs)
    try {
      // ListGroups data half: reference normalization — offsets-only
      // groups are Empty, protocol type defaults to consumer, classic
      val groups = q("SHOW GROUPS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3)))
      assert(groups.contains(("spec_group", "Empty", "consumer", "classic")))
      assert(groups.map(_._1).sorted.toSeq == groups.map(_._1).toSeq)
      // DescribeGroups + OffsetFetch: every partition reported;
      // uncommitted ones read 0/'' with full-log lag (etcd_store defaults)
      val d = q("DESCRIBE GROUP spec_group").collect()
        .map(r => r.getInt(1) -> r).toMap
      assert(d.size == Tables.TopicPartitions)
      assert(d(0).getLong(2) == 7L && d(0).getString(3) == "m")
      assert(d(1).getLong(2) == 0L && d(1).getString(3) == "")
      d.values.foreach { r =>
        assert(r.getLong(6) == r.getLong(5) - r.getLong(2)) // lag law
      }
      // GROUP_ID_NOT_FOUND analog
      assert(err("DESCRIBE GROUP no_such_group").contains("group not found"))
      // a registry without a group estate says so
      val bare = new TopicRegistry(Seq(TopicDef("events",
        s => Tables.eventsTopic(s, sf))))
      assert(intercept[KafsqlException](Kafsql.sql(spark, bare,
        "SHOW GROUPS", nowMs = Tables.FixedNowMs)).getMessage
        .contains("no consumer-group estate"))
    } finally {
      // drop the spec group so other estate consumers never see it
      val p = new org.apache.hadoop.fs.Path(root, "_groups/spec_group")
      p.getFileSystem(graft.kfs.KfsLayout.hadoopConf).delete(p, true)
    }
  }

  test("continuous join: batch-only clauses rejected, JOIN clause required") {
    val reg = KafsqlPack.registry(sf)
    val root = graft.kfs.KfsSeed.seededRoot(spark, sf)
    def stream() = graft.streaming.KafsqlStream.topicStream(spark, root)
    def plan(q: String) = graft.streaming.KafsqlStream.join(
      reg, stream(), stream(), q, nowMs = Tables.FixedNowMs)
    val base = "FROM purchases o JOIN errors p ON o._key = p._key WITHIN 10m"
    // the valid form plans (a streaming frame, not an executed query)
    assert(plan(s"SELECT o._offset AS l_off $base LAST 1d").isStreaming)
    // star keeps the batch join's 8 + 8 `_right_` shape
    assert(plan(s"SELECT * $base LAST 1d").columns.count(_.startsWith("_right")) == 8)
    for ((q, msg) <- Seq(
      (s"SELECT o._offset $base ORDER BY _ts LAST 1d", "ORDER BY"),
      (s"SELECT o._offset $base LIMIT 5 LAST 1d", "LIMIT"),
      ("SELECT _offset FROM purchases LAST 1d", "JOIN")))
      assert(intercept[KafsqlException](plan(q)).getMessage.contains(msg),
        s"$q must reject mentioning $msg")
  }
}
