package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, count, element_at, lit, max, sum, when}

import graft.core.Tables
import graft.kafsql._

/** The KAFSQL dialect exercised end-to-end — text → lexer → parser →
  * planner → DataFrame — against the same DuckDB oracles. This is the §7.1
  * front-end on top of the topic layer: every query here goes through
  * `Kafsql.sql(...)`, not hand-built DataFrames, so grammar parity
  * (LAST/TAIL/SCAN FULL/WITHIN/json_value/aggregate ordering) is what's
  * actually checked. `now` is pinned (LAST is wall-clock-relative,
  * server.go:1368-1384).
  */
object KafsqlPack extends QueryPack {

  /** events + two derived topics (purchases/errors) for the two-topic join —
    * all expose the 8 implicit columns; `events` declares a schema-on-read
    * column `k` ($.k int). */
  def registry(dir: String): TopicRegistry = new TopicRegistry(Seq(
    TopicDef("events", s => Tables.eventsTopic(s, dir),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = 0 until Tables.TopicPartitions),
    TopicDef("purchases",
      s => Tables.eventsTopic(s, dir).filter(col("event_type") === "purchase"),
      partitions = 0 until Tables.TopicPartitions),
    TopicDef("errors",
      s => Tables.eventsTopic(s, dir).filter(col("event_type") === "error"),
      partitions = 0 until Tables.TopicPartitions),
    // the same events log served storage-natively: KAFSQL over the DSv2 KFS
    // source, so LAST/WHERE bounds push into segment pruning at plan time
    TopicDef("kevents",
      s => s.read.format("kfs")
        .option("path", graft.kfs.KfsSeed.seededRoot(s, dir)).load(),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = 0 until Tables.TopicPartitions,
      // SHOW SEGMENTS surface: manifest refs adapted to the registry's
      // neutral SegmentInfo — metadata-only, no segment bytes touched
      segments = Some { s =>
        val root = graft.kfs.KfsSeed.seededRoot(s, dir)
        graft.kfs.KfsLayout.listCompletedCached(root, Some(Set("events")))
          .map(r => SegmentInfo(r.partition, r.baseOffset, r.lastOffset,
            r.lastOffset - r.baseOffset + 1, r.minTsMs, r.maxTsMs,
            r.sizeBytes))
      },
      // DESCRIBE CONFIGS surface: the estate's stored config.json overrides
      // plus reference-normalized defaults, adapted to the neutral shape
      configs = Some { s =>
        val root = graft.kfs.KfsSeed.seededRoot(s, dir)
        graft.kfs.TopicConfigs.describe(root, "events")
          .map(e => ConfigInfo(e.name, e.value, e.isDefault, e.readOnly,
            e.source))
      }),
    // the DeleteRecords estate (k16): a topic whose partition 0 carries a
    // log-start horizon — SHOW OFFSETS must report EARLIEST from it
    TopicDef("docsestate",
      s => s.read.format("kfs")
        .option("path", KfsPack.seedDeleteRecordsEstate(s, dir)).load(),
      partitions = Seq(0),
      segments = Some { s =>
        val root = KfsPack.seedDeleteRecordsEstate(s, dir)
        graft.kfs.KfsLayout.listCompletedCached(root, Some(Set("docs")))
          .map(r => SegmentInfo(r.partition, r.baseOffset, r.lastOffset,
            r.lastOffset - r.baseOffset + 1, r.minTsMs, r.maxTsMs,
            r.sizeBytes))
      },
      logStarts = Some { s =>
        val root = KfsPack.seedDeleteRecordsEstate(s, dir)
        graft.kfs.KfsLayout.readLogStarts(root, "docs")
      })),
    // SHOW GROUPS / DESCRIBE GROUP surface: the committed-offset estate's
    // per-partition positions, adapted to the registry's neutral shape —
    // metadata-only (manifest log-ends + one tiny JSON per commit)
    groupPositions = Some { s =>
      val root = graft.kfs.KfsSeed.seededRoot(s, dir)
      graft.kfs.ConsumerGroups.describeGroups(root, "events")
        .map(p => GroupPositionInfo(p.group, p.topic, p.partition,
          p.committedOffset, p.metadata, p.committedAtMs, p.logEndOffset))
    })

  private def run(q: String)(s: SparkSession, dir: String): DataFrame =
    Kafsql.sql(s, registry(dir), q, nowMs = Tables.FixedNowMs)

  private def oracle(body: String): Option[String] =
    Some(Tables.withEventsTopic(body))

  override def entries: Seq[QueryDef] = Seq(

    // flagship (user-guide.md:236-238) through the dialect; output ordering
    // = stringified group key (reference A1 semantics)
    QueryDef(
      "k1_kafsql_flagship",
      run("SELECT _partition, COUNT(*) AS cnt, MAX(_ts) AS latest " +
        "FROM events GROUP BY _partition LAST 30d"),
      oracle(
        s"""SELECT _partition, count(*) AS cnt, max(_ts) AS latest
           |FROM events_topic
           |WHERE _ts_ms >= ${Tables.FixedNowMs} - ${30L * 86400000L}
           |GROUP BY _partition ORDER BY CAST(_partition AS VARCHAR)""".stripMargin)),

    QueryDef(
      "k2_kafsql_filtered_select",
      run("SELECT _offset, _key, json_value(_value, '$.k') AS k_txt " +
        "FROM events WHERE _partition = 2 AND _offset >= 10 AND _offset <= 60 " +
        "SCAN FULL"),
      oracle(
        """SELECT _offset, _key, json_extract_string(_value, '$.k') AS k_txt
          |FROM events_topic
          |WHERE _partition = 2 AND _offset >= 10 AND _offset <= 60
          |ORDER BY _offset""".stripMargin)),

    QueryDef(
      "k3_kafsql_orderby",
      run("SELECT _partition, _offset, _ts FROM events " +
        "WHERE _ts BETWEEN '2024-01-10 00:00:00' AND '2024-01-20 00:00:00' " +
        "ORDER BY _ts DESC LIMIT 15"),
      oracle(
        """SELECT _partition, _offset, _ts FROM events_topic
          |WHERE _ts_ms >= 1704844800000 AND _ts_ms <= 1705708800000
          |ORDER BY _ts DESC LIMIT 15""".stripMargin)),

    QueryDef(
      "k4_kafsql_tail",
      run("SELECT _partition, _offset, _key FROM events TAIL 12"),
      oracle(
        """SELECT _partition, _offset, _key FROM (
          |  SELECT _partition, _offset, _key FROM events_topic
          |  ORDER BY _partition DESC, _offset DESC LIMIT 12
          |) ORDER BY _partition, _offset""".stripMargin)),

    QueryDef(
      "k5_kafsql_join_within",
      run("SELECT o._key AS u_key, o._offset AS l_off, p._offset AS r_off " +
        "FROM purchases o JOIN errors p ON o._key = p._key " +
        "WITHIN 6h LIMIT 100000 LAST 14d"),
      oracle(
        s"""SELECT l._key AS u_key, l._offset AS l_off, r._offset AS r_off
           |FROM (SELECT * FROM events_topic
           |      WHERE event_type = 'purchase'
           |        AND _ts_ms >= ${Tables.FixedNowMs} - ${14L * 86400000L}) l
           |JOIN (SELECT * FROM events_topic WHERE event_type = 'error') r
           |  ON l._key = r._key AND abs(l._ts_ms - r._ts_ms) <= ${6L * 3600000L}
           |ORDER BY u_key, l_off, r_off""".stripMargin)),

    QueryDef(
      "k6_kafsql_left_join",
      run("SELECT o._key AS u_key, o._offset AS l_off, p._offset AS r_off " +
        "FROM errors o LEFT JOIN purchases p ON o._key = p._key " +
        "WITHIN 1h LIMIT 100000 LAST 7d"),
      oracle(
        s"""SELECT l._key AS u_key, l._offset AS l_off, r._offset AS r_off
           |FROM (SELECT * FROM events_topic
           |      WHERE event_type = 'error'
           |        AND _ts_ms >= ${Tables.FixedNowMs} - ${7L * 86400000L}) l
           |LEFT JOIN (SELECT * FROM events_topic WHERE event_type = 'purchase') r
           |  ON l._key = r._key AND abs(l._ts_ms - r._ts_ms) <= ${3600000L}
           |ORDER BY u_key, l_off, r_off NULLS FIRST""".stripMargin)),

    QueryDef(
      "k7_kafsql_describe",
      (s, dir) => Kafsql.sql(s, registry(dir), "DESCRIBE events",
        nowMs = Tables.FixedNowMs),
      Some(
        """SELECT * FROM (VALUES
          |  ('_topic','text',''), ('_partition','integer',''),
          |  ('_offset','bigint',''), ('_ts','timestamp',''),
          |  ('_key','bytea',''), ('_value','bytea',''),
          |  ('_headers','jsonb',''), ('_segment','text',''),
          |  ('k','integer','$.k')) AS t("column", "type", "path")""".stripMargin)),

    QueryDef(
      "k8_kafsql_schema_read",
      run("SELECT _offset, k FROM events WHERE _partition = 0 LIMIT 100000 LAST 30d"),
      oracle(
        s"""SELECT _offset, CAST(json_extract_string(_value, '$$.k') AS INTEGER) AS k
           |FROM events_topic
           |WHERE _partition = 0
           |  AND _ts_ms >= ${Tables.FixedNowMs} - ${30L * 86400000L}
           |ORDER BY _offset""".stripMargin)),

    // full stack storage-natively: KAFSQL text -> parse -> plan -> DSv2 KFS
    // scan with LAST/partition bounds pushed into segment pruning
    QueryDef(
      "k10_kafsql_over_kfs",
      run("SELECT _partition, COUNT(*) AS cnt, MAX(_offset) AS max_off, " +
        "SUM(k) AS sum_k FROM kevents GROUP BY _partition LAST 30d"),
      oracle(
        s"""SELECT _partition, count(*) AS cnt, max(_offset) AS max_off,
           |       SUM(CAST(json_extract_string(_value, '$$.k') AS DOUBLE)) AS sum_k
           |FROM events_topic
           |WHERE _ts_ms >= ${Tables.FixedNowMs} - ${30L * 86400000L}
           |GROUP BY _partition ORDER BY CAST(_partition AS VARCHAR)""".stripMargin)),

    // fully governed execution path: admission token -> result cache ->
    // job-group timeout around the planned query (X10-X12 live in Verify)
    QueryDef(
      "k11_kafsql_governed",
      (s, dir) => {
        val gov = new graft.gov.Governor()
        Kafsql.governed(s, registry(dir), gov,
          "SELECT COUNT(*) AS n, MIN(_offset) AS min_off, MAX(_offset) AS max_off " +
            "FROM events WHERE _partition = 3 LAST 30d",
          nowMs = Tables.FixedNowMs)
      },
      oracle(
        s"""SELECT count(*) AS n, min(_offset) AS min_off, max(_offset) AS max_off
           |FROM events_topic
           |WHERE _partition = 3
           |  AND _ts_ms >= ${Tables.FixedNowMs} - ${30L * 86400000L}""".stripMargin)),

    // aggregates over json_value; MIN/MAX here are lexicographic string
    // compares, matching the reference's string-kind minmax (server.go:2132-2182)
    QueryDef(
      "k9_kafsql_agg_json",
      run("SELECT COUNT(*) AS n, COUNT(json_value(_value, '$.zz')) AS n_zz, " +
        "SUM(json_value(_value, '$.k')) AS sum_k, " +
        "AVG(json_value(_value, '$.k')) AS avg_k, " +
        "MIN(json_value(_value, '$.k')) AS min_k_txt, " +
        "MAX(json_value(_value, '$.k')) AS max_k_txt " +
        "FROM events LAST 30d"),
      oracle(
        s"""SELECT count(*) AS n,
           |       count(json_extract_string(_value, '$$.zz')) AS n_zz,
           |       SUM(CAST(json_extract_string(_value, '$$.k') AS DOUBLE)) AS sum_k,
           |       AVG(CAST(json_extract_string(_value, '$$.k') AS DOUBLE)) AS avg_k,
           |       MIN(json_extract_string(_value, '$$.k')) AS min_k_txt,
           |       MAX(json_extract_string(_value, '$$.k')) AS max_k_txt
           |FROM events_topic
           |WHERE _ts_ms >= ${Tables.FixedNowMs} - ${30L * 86400000L}""".stripMargin)),

    // Continuous KAFSQL oracle-checked end to end: the SAME dialect text
    // runs as a Structured Streaming query over the segment file stream
    // (checkpointed AvailableNow drain into a parquet table — replays ship
    // nothing), then the sink table is aggregated and hash-matched. This
    // pins stream-mode projection + schema-on-read + SCAN FULL semantics to
    // the batch oracle, not just to a batch-mode Spark plan.
    QueryDef(
      "k12_kafsql_continuous",
      (s, dir) => {
        val root = graft.kfs.KfsSeed.seededRoot(s, dir)
        val table = Fixtures.tmp(dir, "k12_table")
        val ckpt = Fixtures.tmp(dir, "k12_ckpt")
        graft.streaming.StreamDrive.narrow(s) {
          graft.streaming.KafsqlStream.runToTable(s, registry(dir), root,
            "SELECT _partition, _offset, k FROM events SCAN FULL",
            table, ckpt, nowMs = Tables.FixedNowMs)
        }
        s.read.parquet(table)
          .groupBy(col("_partition"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("k").cast("long")).as("sum_k"),
            max(col("_offset")).as("max_off"))
          .orderBy(col("_partition"))
      },
      oracle(
        """SELECT _partition, count(*) AS cnt,
          |       CAST(SUM(CAST(json_extract_string(_value, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
          |       max(_offset) AS max_off
          |FROM events_topic GROUP BY _partition ORDER BY _partition""".stripMargin),
      seed = Some((s, dir) => { graft.kfs.KfsSeed.seededRoot(s, dir); () })),

    // SHOW SEGMENTS through the dialect (console-status introspection as a
    // statement — the reference serves the same per-partition segment
    // stats as ops-console JSON, `internal/console/server.go:109,199`).
    // Metadata-only: every column comes from manifests + .kfst sidecars;
    // the oracle recomputes segment boundaries from the seeded layout's
    // 1000-record grouping — so the manifest stats are hash-proven against
    // the data they claim to describe, without the engine reading any
    // segment bytes. size_bytes is excluded (physical encoding detail, not
    // SQL-derivable).
    QueryDef(
      "k13_show_segments",
      (s, dir) => run("SHOW SEGMENTS FROM kevents")(s, dir)
        .select(col("partition"), col("base_offset"), col("last_offset"),
          col("records"), col("min_ts"), col("max_ts"))
        .orderBy(col("partition"), col("base_offset")),
      oracle(
        """SELECT _partition AS "partition", min(_offset) AS base_offset,
          |       max(_offset) AS last_offset, count(*) AS records,
          |       min(_ts_ms) AS min_ts, max(_ts_ms) AS max_ts
          |FROM events_topic
          |GROUP BY _partition, _offset // 1000
          |ORDER BY "partition", base_offset""".stripMargin)),

    // DESCRIBE CONFIGS through the dialect — the data half of the
    // reference's Kafka admin config APIs (DescribeConfigs key 32 /
    // AlterConfigs key 33, kafscale-spec.md:185-208): the seed ALTERs
    // retention.ms on the estate (whitelist + validation mirroring
    // handleAlterConfigs, cmd/broker/main.go:1424-1500), then the
    // statement reads it back with the reference's normalization — unset
    // retention.bytes reads as the -1/default sentinel, unset
    // segment.bytes falls back to the broker default (4 MiB,
    // main.go:2052). The oracle is the expected entry table verbatim, so
    // the normalization rules are hash-pinned.
    QueryDef(
      "k14_describe_configs",
      (s, dir) => run("DESCRIBE CONFIGS kevents")(s, dir)
        .orderBy(col("name")),
      Some(
        """SELECT * FROM (VALUES
          |  ('retention.bytes', '-1', true, false, 'DEFAULT_CONFIG'),
          |  ('retention.ms', '604800000', false, false, 'DYNAMIC_TOPIC_CONFIG'),
          |  ('segment.bytes', '4194304', true, false, 'DEFAULT_CONFIG'))
          |  AS t(name, value, is_default, read_only, source)
          |ORDER BY name""".stripMargin),
      seed = Some((s, dir) => {
        val root = graft.kfs.KfsSeed.seededRoot(s, dir)
        // idempotent: same value every rep; validateOnly path exercised too
        graft.kfs.TopicConfigs.alter(root, "events",
          Map("retention.ms" -> "604800000"), validateOnly = true)
        graft.kfs.TopicConfigs.alter(root, "events",
          Map("retention.ms" -> "604800000"))
      })),

    // DESCRIBE GROUP through the dialect — the DescribeGroups (key 15) +
    // OffsetFetch (key 9) data halves (coordinator.go:425-447,614-652),
    // shaped like `kafka-consumer-groups.sh --describe`: the seed commits
    // positions for two partitions of a fixture group (fixed clock), the
    // statement reports EVERY partition — uncommitted ones read offset 0
    // with empty metadata (etcd_store.go:206-208) and full-log lag. The
    // oracle recomputes log-end per partition from the same events the
    // estate was seeded from, so committed/lag arithmetic is hash-pinned.
    QueryDef(
      "k15_describe_group",
      (s, dir) => run("DESCRIBE GROUP k15_group")(s, dir)
        .orderBy(col("partition")),
      oracle(
        s"""SELECT 'events' AS topic, _partition AS "partition",
           |  CAST(CASE WHEN _partition < 2 THEN 100 ELSE 0 END AS BIGINT)
           |    AS committed_offset,
           |  CASE WHEN _partition < 2 THEN 'seeded' ELSE '' END AS metadata,
           |  CAST(CASE WHEN _partition < 2 THEN ${Tables.FixedNowMs}
           |    ELSE 0 END AS BIGINT) AS committed_at,
           |  CAST(max(_offset) + 1 AS BIGINT) AS log_end_offset,
           |  CAST(max(_offset) + 1
           |    - CASE WHEN _partition < 2 THEN 100 ELSE 0 END AS BIGINT) AS lag
           |FROM events_topic
           |GROUP BY _partition ORDER BY "partition"""".stripMargin),
      seed = Some((s, dir) => {
        val root = graft.kfs.KfsSeed.seededRoot(s, dir)
        // idempotent: fixed offsets, fixed clock, same rows every rep
        Seq(0, 1).foreach(p => graft.kfs.ConsumerGroups.commit(
          root, "k15_group", "events", p, 100L, metadata = "seeded",
          nowMs = Tables.FixedNowMs))
      })),

    // SHOW OFFSETS — the ListOffsets data half (key 2), horizon-aware:
    // after DeleteRecords advanced partition 0's log start to 300 (one
    // whole segment deleted, one straddled), EARLIEST must be the horizon
    // and LATEST the high watermark — metadata-only (manifest + one tiny
    // JSON), zero segment reads, the `kafka-run-class GetOffsetShell`
    // answer. Idempotent: the horizon is monotonic.
    QueryDef(
      "k16_show_offsets",
      (s, dir) => {
        graft.kfs.KfsRetention.deleteRecords(
          KfsPack.seedDeleteRecordsEstate(s, dir), "docs", Map(0 -> 300L))
        run("SHOW OFFSETS FROM docsestate")(s, dir)
          .orderBy(col("partition"))
      },
      Some(
        """SELECT CAST(0 AS INT) AS partition, CAST(300 AS BIGINT) AS earliest,
          |       CAST(max(doc_id) + 1 AS BIGINT) AS latest
          |FROM documents""".stripMargin),
      seed = Some((s, dir) => {
        graft.kfs.KfsRetention.deleteRecords(
          KfsPack.seedDeleteRecordsEstate(s, dir), "docs", Map(0 -> 300L))
        ()
      })),

    // CONTINUOUS WITHIN JOIN — the reference's flagship two-topic join
    // run FOREVER (k5's continuous twin; the reference names continuous
    // queries an explicit non-goal): the same dialect text plans as a
    // watermarked stream-stream join whose ±band becomes the time-range
    // condition, so each side's state is rate × (delay + band), never
    // stream age. Both sides drain from the SAME seeded segment log
    // (header `src` routes purchases/errors, the e17 discipline) under
    // AvailableNow; the result equals the batch join of the full topics —
    // stream ≡ batch, St5 for joins. LAST is ignored (the watermark
    // replaces retention), so the oracle joins unpruned history.
    QueryDef(
      "k17_kafsql_stream_join",
      (s, dir) => {
        val root = graft.kfs.KfsSeed.seededRoot(s, dir)
        val sink = Fixtures.tmp(dir, "k17_sink")
        val ckpt = Fixtures.tmp(dir, "k17_ckpt")
        graft.streaming.StreamDrive.narrow(s) {
          val src = element_at(col("_headers"), "src")
          val joined = graft.streaming.KafsqlStream.join(registry(dir),
            graft.streaming.KafsqlStream.topicStream(s, root)
              .where(src === "purchase"),
            graft.streaming.KafsqlStream.topicStream(s, root)
              .where(src === "error"),
            "SELECT o._partition, o._offset AS l_off, p._offset AS r_off " +
              "FROM purchases o JOIN errors p ON o._key = p._key " +
              "WITHIN 10m LAST 14d",
            watermarkDelay = "1 hour", nowMs = Tables.FixedNowMs)
          val q = joined.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.parquet(sink)
          .groupBy(col("_partition"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("l_off")).as("l_off_sum"),
            sum(col("r_off")).as("r_off_sum"))
          .orderBy(col("_partition"))
      },
      oracle(
        """SELECT l._partition, count(*) AS n_pairs,
          |       CAST(SUM(l._offset) AS BIGINT) AS l_off_sum,
          |       CAST(SUM(r._offset) AS BIGINT) AS r_off_sum
          |FROM (SELECT * FROM events_topic WHERE event_type = 'purchase') l
          |JOIN (SELECT * FROM events_topic WHERE event_type = 'error') r
          |  ON l._key = r._key AND abs(l._ts_ms - r._ts_ms) <= 600000
          |GROUP BY 1 ORDER BY l._partition""".stripMargin),
      seed = Some((s, dir) => { graft.kfs.KfsSeed.seededRoot(s, dir); () })),

    // SHOW OFFSETS ... AT <ts> — ListOffsets' timestamp resolution (the
    // `offsetsForTimes` client call as a dialect statement): per
    // partition, the earliest offset whose record timestamp reaches the
    // literal. Kafka's index-then-scan shape: the `.kfst` sidecars pick
    // each partition's boundary segment (metadata), ONLY that segment
    // decodes (PlanSpec pins segments=1 per scan). Two estates in one
    // check: the events log resolves a mid-estate civil-time literal;
    // the DeleteRecords estate resolves an epoch-ms literal that lands
    // BELOW the horizon and must clamp to it — never below log start.
    QueryDef(
      "k18_show_offsets_at",
      (s, dir) => {
        graft.kfs.KfsRetention.deleteRecords(
          KfsPack.seedDeleteRecordsEstate(s, dir), "docs", Map(0 -> 300L))
        val ev = run("SHOW OFFSETS FROM kevents AT '2024-01-15 00:00:00'")(s, dir)
          .withColumn("src", lit("events"))
        val dc = run("SHOW OFFSETS FROM docsestate AT 1700000000100")(s, dir)
          .withColumn("src", lit("docs"))
        ev.unionByName(dc).orderBy(col("src"), col("partition"))
      },
      oracle(
        """SELECT 'events' AS src, _partition AS partition,
          |       min(CASE WHEN _ts_ms >= 1705276800000 THEN _offset END)
          |         AS offset
          |FROM events_topic GROUP BY 2
          |UNION ALL
          |SELECT 'docs', CAST(0 AS INTEGER),
          |       min(CASE WHEN doc_id >= 300
          |                 AND 1700000000000 + doc_id >= 1700000000100
          |                THEN CAST(doc_id AS BIGINT) END)
          |FROM documents
          |ORDER BY src, partition""".stripMargin),
      seed = Some((s, dir) => {
        graft.kfs.KfsSeed.seededRoot(s, dir)
        graft.kfs.KfsRetention.deleteRecords(
          KfsPack.seedDeleteRecordsEstate(s, dir), "docs", Map(0 -> 300L))
        ()
      })),

    // CONTINUOUS LEFT WITHIN JOIN — k17's outer form, the eviction-timing
    // path where stream ≠ batch bugs hide: a purchase with no error in
    // its ±band emits WITH NULLS only when the watermark passes the band
    // and its state evicts — never eagerly. The drive is the e37 sentinel
    // discipline applied to the dialect: drain everything, then two
    // sentinel rounds on BOTH sides push the watermark beyond every live
    // band so expiring state flushes its unmatched rows. Final answer ≡
    // the batch LEFT JOIN, per partition — matched counts, unmatched
    // counts, and both offset sums.
    QueryDef(
      "k19_kafsql_stream_left_join",
      (s, dir) => {
        import java.nio.file.Paths
        val stageL = Fixtures.tmp(dir, "k19_left")
        val stageR = Fixtures.tmp(dir, "k19_right")
        val sink = Fixtures.tmp(dir, "k19_sink")
        val ckpt = Fixtures.tmp(dir, "k19_ckpt")
        Seq(stageL, stageR, sink, ckpt).foreach(p =>
          graft.etl.TableSink.deleteRecursive(Paths.get(p)))
        val base = Tables.eventsTopic(s, dir)
        val cols = Seq("_topic", "_partition", "_offset", "_ts_ms",
          "_key", "_value").map(col)
        base.where(element_at(col("_headers"), "src") === "purchase")
          .select(cols: _*).coalesce(2).write.parquet(stageL)
        base.where(element_at(col("_headers"), "src") === "error")
          .select(cols: _*).coalesce(2).write.parquet(stageR)
        val schema = s.read.parquet(stageL).schema
        val joined = graft.streaming.KafsqlStream.join(registry(dir),
          s.readStream.schema(schema).parquet(stageL),
          s.readStream.schema(schema).parquet(stageR),
          "SELECT o._partition, o._key, o._offset AS l_off, " +
            "p._offset AS r_off FROM purchases o LEFT JOIN errors p " +
            "ON o._key = p._key WITHIN 10m LAST 14d",
          watermarkDelay = "1 hour", nowMs = Tables.FixedNowMs)
        graft.streaming.StreamDrive.narrow(s) {
          val q = joined.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").start()
          try {
            q.processAllAvailable() // all real rows; matches emit
            val hiMs = base.agg(max(col("_ts_ms"))).collect().head.getLong(0) +
              3L * 3600000L // past every band + delay, with margin
            for (bump <- Seq(0L, 1L)) {
              val sentinel = s.range(1).select(lit("events").as("_topic"),
                lit(0).as("_partition"), (lit(100000000L) + lit(bump)).as("_offset"),
                lit(hiMs + bump * 3600000L).as("_ts_ms"),
                lit("zz-sentinel").as("_key"), lit("{}").as("_value"))
              sentinel.write.mode("append").parquet(stageL)
              sentinel.write.mode("append").parquet(stageR)
              q.processAllAvailable() // eviction lands the batch AFTER
            }
          } finally q.stop()
        }
        s.read.parquet(sink).where(col("_key") =!= "zz-sentinel")
          .groupBy(col("_partition"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("r_off")).as("n_matched"),
            sum(when(col("r_off").isNull, 1L).otherwise(0L)).as("n_unmatched"),
            sum(col("l_off")).as("l_off_sum"),
            coalesce(sum(col("r_off")), lit(0L)).as("r_off_sum"))
          .orderBy(col("_partition"))
      },
      oracle(
        """, p2 AS (SELECT _partition, _offset, _key, _ts_ms
          |        FROM events_topic WHERE event_type = 'purchase'),
          |e2 AS (SELECT _offset, _key, _ts_ms
          |       FROM events_topic WHERE event_type = 'error'),
          |j AS (SELECT p2._partition, p2._offset AS l_off, e2._offset AS r_off
          |      FROM p2 LEFT JOIN e2 ON p2._key = e2._key
          |        AND abs(p2._ts_ms - e2._ts_ms) <= 600000)
          |SELECT _partition, count(*) AS n_rows,
          |       CAST(count(r_off) AS BIGINT) AS n_matched,
          |       CAST(SUM(CASE WHEN r_off IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_unmatched,
          |       CAST(SUM(l_off) AS BIGINT) AS l_off_sum,
          |       CAST(COALESCE(SUM(r_off), 0) AS BIGINT) AS r_off_sum
          |FROM j GROUP BY 1 ORDER BY _partition""".stripMargin))
  )
}
