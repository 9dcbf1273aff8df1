package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** SURVEY §2.2–§2.6 operator inventory as oracle-checked queries.
  *
  * Projections / partition-offset-time filters / LAST / TAIL / SCAN FULL
  * (reference `sql-processor/internal/sql/parser.go:142-258`,
  * `server.go:1316-1487`), json_value/json_query/json_exists
  * (`server.go:1686-1729`), COUNT/SUM/AVG/MIN/MAX + GROUP BY
  * (`server.go:1762-2011`), the bounded two-topic WITHIN join
  * (`server.go:2281-2464`), and ORDER BY _ts / LIMIT (`server.go:1461-1476`).
  *
  * Scale notes: all event-topic plans are narrow scans + hash aggregates on
  * low-cardinality keys (map-side partial agg, no skew); the WITHIN join is
  * an equi-join on `_key` with a residual |Δts| band — Spark shuffles both
  * sides by key once and evaluates the band as a post-join filter, which is
  * the right plan at 100 TB when neither side is broadcastable. TPC-H shapes
  * broadcast the dimension sides explicitly.
  */
object RelationalPack extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.eventsTopic(s, dir)

  private def oracle(body: String): Option[String] =
    Some(Tables.withEventsTopic(body))

  override def entries: Seq[QueryDef] = Seq(

    // ---- P1 projection + aliasing ------------------------------------
    QueryDef(
      "p1_projection",
      (s, dir) => ev(s, dir)
        .filter(col("_partition") === 2)
        .select(
          col("_topic"), col("_partition"), col("_offset"),
          col("_key").as("k"), col("_segment"))
        .orderBy(col("_offset"))
        .limit(50),
      oracle(
        """SELECT _topic, _partition, _offset, _key AS k, _segment
          |FROM events_topic WHERE _partition = 2
          |ORDER BY _offset LIMIT 50""".stripMargin)),

    // ---- P2 partition filter (equality only in reference) ------------
    QueryDef(
      "p2_partition_filter",
      (s, dir) => ev(s, dir)
        .groupBy(col("_partition"))
        .agg(count(lit(1)).as("cnt"), min(col("_offset")).as("min_off"),
          max(col("_offset")).as("max_off"))
        .orderBy(col("_partition")),
      oracle(
        """SELECT _partition, count(*) AS cnt, min(_offset) AS min_off,
          |       max(_offset) AS max_off
          |FROM events_topic GROUP BY _partition ORDER BY _partition""".stripMargin)),

    // ---- P3 offset range (>= / <= only in reference) ------------------
    QueryDef(
      "p3_offset_range",
      (s, dir) => ev(s, dir)
        .filter(col("_offset") >= 100 && col("_offset") <= 199)
        .select(col("_partition"), col("_offset"), col("_key"))
        .orderBy(col("_partition"), col("_offset")),
      oracle(
        """SELECT _partition, _offset, _key
          |FROM events_topic WHERE _offset >= 100 AND _offset <= 199
          |ORDER BY _partition, _offset""".stripMargin)),

    // ---- P4 timestamp BETWEEN -----------------------------------------
    QueryDef(
      "p4_ts_filter",
      (s, dir) => ev(s, dir)
        .filter(col("_ts_ms").between(1704844800000L, 1705708800000L)) // 2024-01-10..2024-01-20
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), min(col("_ts_ms")).as("min_ts_ms"),
          max(col("_ts_ms")).as("max_ts_ms"))
        .orderBy(col("event_type")),
      oracle(
        """SELECT event_type, count(*) AS cnt, min(_ts_ms) AS min_ts_ms,
          |       max(_ts_ms) AS max_ts_ms
          |FROM events_topic
          |WHERE _ts_ms >= 1704844800000 AND _ts_ms <= 1705708800000
          |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- P5 LAST <dur> (sliding lower bound; fixed now for determinism)
    QueryDef(
      "p5_last_window",
      (s, dir) => ev(s, dir)
        .filter(col("_ts_ms") >= Tables.FixedNowMs - 7L * 86400000L)
        .groupBy(col("_partition"))
        .agg(count(lit(1)).as("cnt"), max(col("_offset")).as("max_off"))
        .orderBy(col("_partition")),
      oracle(
        s"""SELECT _partition, count(*) AS cnt, max(_offset) AS max_off
           |FROM events_topic
           |WHERE _ts_ms >= ${Tables.FixedNowMs} - 7 * 86400000
           |GROUP BY _partition ORDER BY _partition""".stripMargin)),

    // ---- P6 TAIL n (last n in partition-major scan order) --------------
    QueryDef(
      "p6_tail",
      (s, dir) => ev(s, dir)
        .orderBy(col("_partition").desc, col("_offset").desc)
        .limit(10)
        .select(col("_partition"), col("_offset"), col("_key"))
        .orderBy(col("_partition"), col("_offset")),
      oracle(
        """SELECT _partition, _offset, _key FROM (
          |  SELECT _partition, _offset, _key FROM events_topic
          |  ORDER BY _partition DESC, _offset DESC LIMIT 10
          |) ORDER BY _partition, _offset""".stripMargin)),

    // ---- P7 SCAN FULL (explicit unbounded scan) ------------------------
    QueryDef(
      "p7_scan_full",
      (s, dir) => ev(s, dir)
        .agg(count(lit(1)).as("n"), countDistinct(col("_key")).as("n_keys")),
      oracle(
        """SELECT count(*) AS n, count(DISTINCT _key) AS n_keys
          |FROM events_topic""".stripMargin)),

    // ---- F1 json_value -------------------------------------------------
    QueryDef(
      "f1_json_value",
      (s, dir) => ev(s, dir)
        .select(col("event_id"),
          get_json_object(col("_value"), "$.k").cast("int").as("k_val"))
        .filter(col("k_val").isNotNull)
        .orderBy(col("event_id"))
        .limit(200),
      oracle(
        """SELECT event_id, CAST(json_extract_string(_value, '$.k') AS INTEGER) AS k_val
          |FROM events_topic
          |WHERE json_extract_string(_value, '$.k') IS NOT NULL
          |ORDER BY event_id LIMIT 200""".stripMargin)),

    // ---- F2 json_query (node extraction re-marshalled as JSON) ----------
    QueryDef(
      "f2_json_query",
      (s, dir) => ev(s, dir)
        .withColumn("nested",
          concat(lit("{\"inner\":{\"k\":"),
            get_json_object(col("_value"), "$.k"), lit("}}")))
        .filter(col("_partition") === 3 && col("_offset") < 50)
        .select(col("_offset"),
          get_json_object(col("nested"), "$.inner").as("inner_json"),
          get_json_object(col("nested"), "$.inner.k").cast("int").as("inner_k"))
        .orderBy(col("_offset")),
      oracle(
        """SELECT _offset,
          |       json_extract_string(
          |         '{"inner":{"k":' || json_extract_string(_value, '$.k') || '}}',
          |         '$.inner') AS inner_json,
          |       CAST(json_extract_string(
          |         '{"inner":{"k":' || json_extract_string(_value, '$.k') || '}}',
          |         '$.inner.k') AS INTEGER) AS inner_k
          |FROM events_topic WHERE _partition = 3 AND _offset < 50
          |ORDER BY _offset""".stripMargin)),

    // ---- F3 json_exists ------------------------------------------------
    // json_tuple: ONE JSON parse yields both paths (two get_json_object
    // calls parse the value twice — 2x the scan CPU at 100 TB)
    QueryDef(
      "f3_json_exists",
      (s, dir) => ev(s, dir)
        .select(json_tuple(col("_value"), "k", "zz").as(Seq("k_v", "zz_v")))
        .select(col("k_v").isNotNull.as("has_k"),
          col("zz_v").isNotNull.as("has_zz"))
        .groupBy(col("has_k"), col("has_zz"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("has_k"), col("has_zz")),
      oracle(
        """SELECT json_extract_string(_value, '$.k') IS NOT NULL AS has_k,
          |       json_extract_string(_value, '$.zz') IS NOT NULL AS has_zz,
          |       count(*) AS cnt
          |FROM events_topic GROUP BY 1, 2 ORDER BY has_k, has_zz""".stripMargin)),

    // ---- F5 timestamp format (reference renders ms precision, UTC) -----
    QueryDef(
      "f5_ts_format",
      (s, dir) => ev(s, dir)
        .filter(col("_partition") === 0 && col("_offset") < 25)
        .select(col("_offset"),
          date_format(col("_ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("ts_txt"))
        .orderBy(col("_offset")),
      oracle(
        """SELECT _offset, strftime(_ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_txt
          |FROM events_topic WHERE _partition = 0 AND _offset < 25
          |ORDER BY _offset""".stripMargin)),

    // ---- F6 bytea hex rendering (reference: \x prefix, server.go:2799) -
    QueryDef(
      "f6_hex_key",
      (s, dir) => ev(s, dir)
        .filter(col("_partition") === 1 && col("_offset") < 25)
        .select(col("_offset"),
          concat(lit("\\x"), lower(hex(col("_key").cast("binary")))).as("key_hex"))
        .orderBy(col("_offset")),
      oracle(
        """SELECT _offset, '\x' || lower(hex(CAST(_key AS BLOB))) AS key_hex
          |FROM events_topic WHERE _partition = 1 AND _offset < 25
          |ORDER BY _offset""".stripMargin)),

    // ---- F7 headers rendered as JSON object ----------------------------
    QueryDef(
      "f7_headers_json",
      (s, dir) => ev(s, dir)
        .select(to_json(col("_headers")).as("headers_json"))
        .groupBy(col("headers_json"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("headers_json")),
      oracle(
        """SELECT '{"src":"' || event_type || '"}' AS headers_json, count(*) AS cnt
          |FROM events_topic GROUP BY 1 ORDER BY headers_json""".stripMargin)),

    // ---- A1 flagship aggregate (user-guide.md:236-238) ------------------
    QueryDef(
      "a1_group_agg",
      (s, dir) => ev(s, dir)
        .groupBy(col("_partition"))
        .agg(count(lit(1)).as("cnt"), max(col("_ts_ms")).as("latest_ms"))
        .orderBy(col("_partition")),
      oracle(
        """SELECT _partition, count(*) AS cnt, max(_ts_ms) AS latest_ms
          |FROM events_topic GROUP BY _partition ORDER BY _partition""".stripMargin)),

    // ---- A2 COUNT(*) vs COUNT(col) null-skipping ------------------------
    QueryDef(
      "a2_count_null_skip",
      (s, dir) => ev(s, dir)
        .select(col("event_type"),
          json_tuple(col("_value"), "k", "zz").as(Seq("k_v", "zz_v")))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("k_v")).as("n_k"),
          count(col("zz_v")).as("n_zz"))
        .orderBy(col("event_type")),
      oracle(
        """SELECT event_type, count(*) AS n_rows,
          |       count(json_extract_string(_value, '$.k')) AS n_k,
          |       count(json_extract_string(_value, '$.zz')) AS n_zz
          |FROM events_topic GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- A3 SUM over json-extracted numerics (reference sums as float64)
    QueryDef(
      "a3_sum_json",
      (s, dir) => ev(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("_value"), "$.k").cast("double")).as("sum_k"))
        .orderBy(col("event_type")),
      oracle(
        """SELECT event_type,
          |       SUM(CAST(json_extract_string(_value, '$.k') AS DOUBLE)) AS sum_k
          |FROM events_topic GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- A4 AVG --------------------------------------------------------
    QueryDef(
      "a4_avg",
      (s, dir) => ev(s, dir)
        .groupBy(col("_partition"))
        .agg(round(avg(get_json_object(col("_value"), "$.k").cast("double")), 4).as("avg_k"))
        .orderBy(col("_partition")),
      oracle(
        """SELECT _partition,
          |       round(AVG(CAST(json_extract_string(_value, '$.k') AS DOUBLE)), 4) AS avg_k
          |FROM events_topic GROUP BY _partition ORDER BY _partition""".stripMargin)),

    // ---- A5 MIN/MAX over string / timestamp kinds -----------------------
    QueryDef(
      "a5_minmax",
      (s, dir) => ev(s, dir)
        .groupBy(col("event_type"))
        .agg(
          min(col("_key")).as("min_key"), max(col("_key")).as("max_key"),
          min(col("_ts_ms")).as("min_ts"), max(col("_ts_ms")).as("max_ts"))
        .orderBy(col("event_type")),
      oracle(
        """SELECT event_type, min(_key) AS min_key, max(_key) AS max_key,
          |       min(_ts_ms) AS min_ts, max(_ts_ms) AS max_ts
          |FROM events_topic GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- A6 aggregate over json_value group key -------------------------
    QueryDef(
      "a6_agg_json_group",
      (s, dir) => ev(s, dir)
        .withColumn("k_bucket",
          (get_json_object(col("_value"), "$.k").cast("int") % 10).as("k_bucket"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("_offset")).as("sum_off"))
        .orderBy(col("k_bucket")),
      oracle(
        """SELECT CAST(json_extract_string(_value, '$.k') AS INTEGER) % 10 AS k_bucket,
          |       count(*) AS cnt, CAST(SUM(_offset) AS BIGINT) AS sum_off
          |FROM events_topic GROUP BY 1 ORDER BY k_bucket""".stripMargin)),

    // ---- J1 inner JOIN ... WITHIN <dur> LAST <dur> ----------------------
    // purchase-events joined to error-events of the same user within 6h,
    // left scan bounded to the last 14 days (fixed now).
    QueryDef(
      "j1_join_within",
      (s, dir) => {
        val base = ev(s, dir)
        val lo = Tables.FixedNowMs - 14L * 86400000L
        val l = base.filter(col("event_type") === "purchase" && col("_ts_ms") >= lo)
          .select(col("_key").as("l_k"), col("_offset").as("l_off"),
            col("_ts_ms").as("l_ts"))
        val r = base.filter(col("event_type") === "error")
          .select(col("_key").as("r_k"), col("_offset").as("r_off"),
            col("_ts_ms").as("r_ts"))
        l.join(r, col("l_k") === col("r_k") &&
            abs(col("l_ts") - col("r_ts")) <= 6L * 3600000L, "inner")
          .select(col("l_k").as("u_key"), col("l_off"), col("r_off"),
            (col("l_ts") - col("r_ts")).as("dt_ms"))
          .orderBy(col("u_key"), col("l_off"), col("r_off"))
      },
      oracle(
        s"""SELECT l._key AS u_key, l._offset AS l_off, r._offset AS r_off,
           |       l._ts_ms - r._ts_ms AS dt_ms
           |FROM (SELECT * FROM events_topic
           |      WHERE event_type = 'purchase'
           |        AND _ts_ms >= ${Tables.FixedNowMs} - 14 * 86400000) l
           |JOIN (SELECT * FROM events_topic WHERE event_type = 'error') r
           |  ON l._key = r._key AND abs(l._ts_ms - r._ts_ms) <= 6 * 3600000
           |ORDER BY u_key, l_off, r_off""".stripMargin)),

    // ---- J2 LEFT JOIN ... WITHIN, unmatched rows keep NULL right side ---
    // (J5: unaliased right-side columns carry the _right_ prefix)
    QueryDef(
      "j2_left_join_within",
      (s, dir) => {
        val base = ev(s, dir)
        val lo = Tables.FixedNowMs - 3L * 86400000L
        val l = base.filter(col("event_type") === "signup" && col("_ts_ms") >= lo)
          .select(col("_key").as("u_key"), col("_offset").as("l_off"),
            col("_ts_ms").as("l_ts"))
        val r = base.filter(col("event_type") === "purchase")
          .select(col("_key").as("r_k"), col("_offset").as("_right_offset"),
            col("_ts_ms").as("_right_ts_ms"))
        l.join(r, col("u_key") === col("r_k") &&
            abs(col("l_ts") - col("_right_ts_ms")) <= 12L * 3600000L, "left_outer")
          .select(col("u_key"), col("l_off"), col("_right_offset"),
            col("_right_ts_ms"))
          .orderBy(col("u_key"), col("l_off"),
            col("_right_offset").asc_nulls_first)
      },
      oracle(
        s"""SELECT l._key AS u_key, l._offset AS l_off,
           |       r._offset AS _right_offset, r._ts_ms AS _right_ts_ms
           |FROM (SELECT * FROM events_topic
           |      WHERE event_type = 'signup'
           |        AND _ts_ms >= ${Tables.FixedNowMs} - 3 * 86400000) l
           |LEFT JOIN (SELECT * FROM events_topic WHERE event_type = 'purchase') r
           |  ON l._key = r._key AND abs(l._ts_ms - r._ts_ms) <= 12 * 3600000
           |ORDER BY u_key, l_off, _right_offset NULLS FIRST""".stripMargin)),

    // ---- J7 (superset): as-of join — latest error at-or-before each
    // purchase, per user. Union + running-last: one shuffle on the key,
    // cost independent of history length (checked against DuckDB's native
    // ASOF JOIN).
    QueryDef(
      "j3_asof_join",
      (s, dir) => {
        val base = ev(s, dir)
        val l = base.filter(col("event_type") === "purchase")
          .select(col("_key"), col("_ts_ms"), col("_offset").as("l_off"))
        val r = base.filter(col("event_type") === "error")
          .select(col("_key"), col("_ts_ms"), col("_offset"))
        graft.ops.AsOf.join(l, r, "_key", "_ts_ms", Seq("_offset"))
          .select(col("_key").as("u_key"), col("l_off"),
            col("asof__offset").as("last_err_off"))
          .orderBy(col("u_key"), col("l_off"))
      },
      oracle(
        """, l AS (SELECT _key, _ts_ms, _offset AS l_off FROM events_topic
          |        WHERE event_type = 'purchase'),
          |r AS (SELECT _key, _ts_ms, max(_offset) AS last_err_off
          |      FROM events_topic WHERE event_type = 'error' GROUP BY 1, 2)
          |SELECT l._key AS u_key, l.l_off, r.last_err_off
          |FROM l ASOF LEFT JOIN r
          |  ON l._key = r._key AND l._ts_ms >= r._ts_ms
          |ORDER BY u_key, l_off""".stripMargin)),

    // ---- J7b (superset): FORWARD as-of — next error at-or-after each
    // purchase per user; same one-shuffle union trick scanned descending.
    QueryDef(
      "j5_asof_forward",
      (s, dir) => {
        val base = ev(s, dir)
        val l = base.filter(col("event_type") === "purchase")
          .select(col("_key"), col("_ts_ms"), col("_offset").as("l_off"))
        val r = base.filter(col("event_type") === "error")
          .select(col("_key"), col("_ts_ms"), col("_offset"))
        graft.ops.AsOf.joinForward(l, r, "_key", "_ts_ms", Seq("_offset"))
          .select(col("_key").as("u_key"), col("l_off"),
            col("asof__offset").as("next_err_off"))
          .orderBy(col("u_key"), col("l_off"))
      },
      oracle(
        """, l AS (SELECT _key, _ts_ms, _offset AS l_off FROM events_topic
          |        WHERE event_type = 'purchase'),
          |r AS (SELECT _key, _ts_ms, max(_offset) AS next_err_off
          |      FROM events_topic WHERE event_type = 'error' GROUP BY 1, 2)
          |SELECT l._key AS u_key, l.l_off, r.next_err_off
          |FROM l ASOF LEFT JOIN r
          |  ON l._key = r._key AND l._ts_ms <= r._ts_ms
          |ORDER BY u_key, l_off""".stripMargin)),

    // ---- J8 (superset): range join — purchases inside ±1h-padded error-
    // burst windows per user. Bucketized interval join: intervals replicate
    // into fixed cells, points equi-join on (key, cell) with BETWEEN as a
    // residual — never a nested-loop cross product.
    QueryDef(
      "j4_range_join",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = ev(s, dir)
        val w = Window.partitionBy("_key").orderBy("_ts_ms")
        val run = Window.partitionBy("_key").orderBy("_ts_ms")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = base.filter(col("event_type") === "error")
          .select(col("_key"), col("_ts_ms"))
          .withColumn("brk", when(lag("_ts_ms", 1).over(w).isNull ||
            col("_ts_ms") - lag("_ts_ms", 1).over(w) >= 1800000L, 1).otherwise(0))
          .withColumn("sid", sum("brk").over(run))
          .groupBy(col("_key"), col("sid"))
          .agg((min("_ts_ms") - 3600000L).as("s_start"),
            (max("_ts_ms") + 3600000L).as("s_end"))
          .drop("sid")
        val purchases = base.filter(col("event_type") === "purchase")
          .select(col("_key"), col("_ts_ms"), col("_offset").as("p_off"))
        graft.ops.RangeJoin.join(purchases, sess,
          "_key", "_ts_ms", "s_start", "s_end", bucketMs = 3600000L)
          .select(col("_key").as("u_key"), col("p_off"),
            col("s_start"), col("s_end"))
          .orderBy(col("u_key"), col("p_off"), col("s_start"))
      },
      oracle(
        """, err AS (SELECT _key, _ts_ms FROM events_topic WHERE event_type = 'error'),
          |x AS (SELECT _key, _ts_ms,
          |             CASE WHEN lag(_ts_ms) OVER w IS NULL
          |                    OR _ts_ms - lag(_ts_ms) OVER w >= 1800000
          |                  THEN 1 ELSE 0 END AS brk
          |      FROM err WINDOW w AS (PARTITION BY _key ORDER BY _ts_ms)),
          |s AS (SELECT _key, _ts_ms,
          |             SUM(brk) OVER (PARTITION BY _key ORDER BY _ts_ms
          |                            ROWS UNBOUNDED PRECEDING) AS sid
          |      FROM x),
          |iv AS (SELECT _key, min(_ts_ms) - 3600000 AS s_start,
          |              max(_ts_ms) + 3600000 AS s_end
          |       FROM s GROUP BY _key, sid),
          |p AS (SELECT _key, _ts_ms, _offset AS p_off FROM events_topic
          |      WHERE event_type = 'purchase')
          |SELECT p._key AS u_key, p.p_off, iv.s_start, iv.s_end
          |FROM p JOIN iv
          |  ON p._key = iv._key AND p._ts_ms BETWEEN iv.s_start AND iv.s_end
          |ORDER BY u_key, p_off, s_start""".stripMargin)),

    // ---- O1 ORDER BY _ts DESC LIMIT (top-k) -----------------------------
    QueryDef(
      "o1_orderby_ts_limit",
      (s, dir) => ev(s, dir)
        .orderBy(col("_ts_ms").desc, col("event_id").desc)
        .limit(20)
        .select(col("event_id"), col("_ts_ms"), col("_partition"), col("_offset")),
      oracle(
        """SELECT event_id, _ts_ms, _partition, _offset FROM events_topic
          |ORDER BY _ts_ms DESC, event_id DESC LIMIT 20""".stripMargin)),

    // ---- C1 SHOW TOPICS --------------------------------------------------
    QueryDef(
      "c1_show_topics",
      (s, _) => {
        import s.implicits._
        Seq("events").toDF("topic")
      },
      Some("SELECT 'events' AS topic")),

    // ---- C2 SHOW PARTITIONS FROM events ---------------------------------
    QueryDef(
      "c2_show_partitions",
      (s, dir) => ev(s, dir)
        .select(col("_partition")).distinct().orderBy(col("_partition")),
      oracle(
        "SELECT DISTINCT _partition FROM events_topic ORDER BY _partition")),

    // ---- TPC-H-shaped corpus (exact decimal arithmetic) -----------------
    // q1: pricing summary — partial-agg-friendly, 6 groups, no skew.
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          // exact decimal arithmetic inside; final cast to double so the
          // output value has one canonical rendering (a decimal with a
          // trailing zero in its scale, e.g. …6690, stringifies differently
          // from the float the oracle side may surface — hash mismatch)
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       SUM(l_quantity) AS sum_qty,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
          |       round(AVG(l_quantity), 4) AS avg_qty,
          |       round(AVG(l_discount), 6) AS avg_disc,
          |       count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // q3: shipping-priority top-10 — dim side (customer) broadcast.
    QueryDef(
      "q3_top_orders",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(
        """SELECT l_orderkey, o_orderdate,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY l_orderkey, o_orderdate
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // q6: pure scan + filter + global aggregate — the shape that proves
    // pushdown (PushedFilters on shipdate/discount/quantity, 4-col read)
    QueryDef(
      "q6_forecast_revenue",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz") &&
          col("l_discount").cast("decimal(18,2)").between(
            lit(0.05).cast("decimal(18,2)"), lit(0.07).cast("decimal(18,2)")) &&
          col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")).cast("decimal(18,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      Some(
        """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)),

    // q5-shaped: revenue per nation via customer→orders→lineitem,
    // dims (region/nation/customer) broadcast; one shuffle on orderkey.
    QueryDef(
      "q5_nation_revenue",
      (s, dir) => {
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region")
        val cust = Tables.load(s, dir, "customer")
        val ord = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum((col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(
        """SELECT r_name, n_name,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name, n_name
          |ORDER BY r_name, n_name""".stripMargin)),

    // q7-shaped: revenue between customer/supplier nation pairs — the only
    // query exercising the supplier dimension; two broadcast dim joins on
    // the fact side (suppkey + custkey via orders), one shuffle on orderkey.
    QueryDef(
      "q7_nation_pairs",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        val cust = Tables.load(s, dir, "customer")
        val supp = Tables.load(s, dir, "supplier")
        val nation = Tables.load(s, dir, "nation")
        val custNation = nation.select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
        val suppNation = nation.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .where(col("cust_nation") < col("supp_nation"))
          .groupBy(col("cust_nation"), col("supp_nation"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("cust_nation"), col("supp_nation"))
          .limit(25)
      },
      Some(
        """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation cn ON c_nationkey = cn.n_nationkey
          |JOIN nation sn ON s_nationkey = sn.n_nationkey
          |WHERE cn.n_name < sn.n_name
          |GROUP BY cust_nation, supp_nation
          |ORDER BY revenue DESC, cust_nation, supp_nation LIMIT 25""".stripMargin)),

    // q4-shaped: priority counts over orders with at least one late-shipped
    // item — LEFT SEMI join (EXISTS), the probe-side short-circuit shape;
    // at 100 TB the semi-join shuffles only (orderkey, shipdate) and stops
    // at first match per order.
    QueryDef(
      "q4_priority_semi",
      (s, dir) => {
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some(
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 80 DAY)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // q10-shaped: top returned-revenue customers — fact-to-fact shuffle on
    // orderkey, dims broadcast, TakeOrdered(20) instead of a global sort.
    QueryDef(
      "q10_returned_top",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        val cust = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(
        """SELECT c_custkey, c_name, n_name,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |WHERE l_returnflag = 'R'
          |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          |GROUP BY c_custkey, c_name, n_name
          |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // q14-shaped: promo revenue share — conditional aggregation over a
    // broadcast part join; exact decimal sums inside, one double division
    // at the end (bit-identical across engines on identical inputs).
    QueryDef(
      "q14_promo_share",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01 00:00:00").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
        val part = Tables.load(s, dir, "part")
        val disc = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)")
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .agg(
            round(lit(100.0) *
              sum(when(col("p_type").startsWith("PROMO"), disc)
                .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
              sum(disc).cast("double"), 6).as("promo_share"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """SELECT round(100.0 *
          |         CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
          |                  THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                       AS DECIMAL(18,4))
          |                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
          |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |              AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_share,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin)),

    // q18-shaped: large-volume orders — the aggregate-then-join (HAVING)
    // shape; the big-orders set is tiny after the quantity gate, so the
    // join back to orders/customer broadcasts it. l_quantity is integral-
    // valued, so the double sum is exact and order-independent.
    QueryDef(
      "q18_big_orders",
      (s, dir) => {
        val big = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("tot_qty"))
          .filter(col("tot_qty") > 280)
        val ord = Tables.load(s, dir, "orders")
        val cust = Tables.load(s, dir, "customer")
        ord.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("tot_qty"))
          .orderBy(col("tot_qty").desc, col("o_orderkey"))
          .limit(20)
      },
      Some(
        """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, tot_qty
          |FROM (SELECT l_orderkey, SUM(l_quantity) AS tot_qty
          |      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 280) big
          |JOIN orders ON o_orderkey = big.l_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |ORDER BY tot_qty DESC, o_orderkey LIMIT 20""".stripMargin)),

    // q22-shaped: well-funded customers with no recent orders — LEFT ANTI
    // join (NOT EXISTS); the anti side projects one column and the nation
    // tally is a 25-key hash aggregate.
    QueryDef(
      "q22_idle_customers",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") > 5000.0)
        val recent = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"),
            sum(col("c_acctbal").cast("decimal(18,2)"))
              .cast("double").as("total_bal"))
          .orderBy(col("c_nationkey"))
      },
      Some(
        """SELECT c_nationkey, count(*) AS n_cust,
          |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM customer
          |WHERE c_acctbal > 5000
          |  AND NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey
          |                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // Set operations (superset — the reference has none, SURVEY §2.7):
    // INTERSECT / EXCEPT / UNION-distinct over user key sets, tallied into
    // one frame. Each set op is a shuffle on the key with distinct
    // semantics — at scale these are plain hash aggregations.
    QueryDef(
      "u1_set_ops",
      (s, dir) => {
        val base = ev(s, dir)
        val p = base.filter(col("event_type") === "purchase").select(col("_key"))
        val e = base.filter(col("event_type") === "error").select(col("_key"))
        val rows = Seq(
          ("except", p.except(e)),
          ("intersect", p.intersect(e)),
          ("union", p.union(e).distinct()))
        rows.map { case (op, df) =>
          df.agg(count(lit(1)).as("n_keys")).select(lit(op).as("op"), col("n_keys"))
        }.reduce(_ union _).orderBy(col("op"))
      },
      oracle(
        """SELECT 'except' AS op, count(*) AS n_keys FROM (
          |  SELECT _key FROM events_topic WHERE event_type = 'purchase'
          |  EXCEPT SELECT _key FROM events_topic WHERE event_type = 'error')
          |UNION ALL
          |SELECT 'intersect', count(*) FROM (
          |  SELECT _key FROM events_topic WHERE event_type = 'purchase'
          |  INTERSECT SELECT _key FROM events_topic WHERE event_type = 'error')
          |UNION ALL
          |SELECT 'union', count(*) FROM (
          |  SELECT _key FROM events_topic WHERE event_type = 'purchase'
          |  UNION SELECT _key FROM events_topic WHERE event_type = 'error')
          |ORDER BY op""".stripMargin)),

    // Statistical aggregates (superset — no percentile/stddev in the
    // reference, SURVEY §2.4): exact interpolated median + sample stddev
    // per return flag. l_quantity is integral-valued so the moments are
    // exact and engine-order-independent; rounding guards the sqrt.
    QueryDef(
      "u3_stats",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"))
        .orderBy(col("l_returnflag")),
      Some(
        """SELECT l_returnflag, count(*) AS n,
          |       round(AVG(l_quantity), 6) AS avg_qty,
          |       round(stddev_samp(l_quantity), 6) AS sd_qty,
          |       quantile_cont(l_quantity, 0.5) AS median_qty
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ROLLUP (superset — no grouping sets/cube/rollup in the reference,
    // SURVEY §2.4): revenue subtotals per region, per (region, nation), and
    // grand total in one pass — Spark expands the grouping sets before the
    // hash aggregate, so it stays a single shuffle.
    QueryDef(
      "u2_rollup_revenue",
      (s, dir) => {
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region")
        val cust = Tables.load(s, dir, "customer")
        val ord = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some(
        """SELECT r_name, n_name,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)),

    // CUBE (superset, SURVEY §2.7): every grouping-set combination of
    // (returnflag, linestatus) — 2^2 grouping sets in ONE pass (Spark
    // expands the sets map-side; no union of four aggregations). The
    // GROUPING() bitmask disambiguates a real NULL key from a subtotal
    // row, which is what makes cube output joinable downstream.
    QueryDef(
      "u10_cube_quantity",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n_items"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"))
        .orderBy(col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
          |       count(*) AS n_items,
          |       CAST(GROUPING(l_returnflag) AS TINYINT) AS g_flag,
          |       CAST(GROUPING(l_linestatus) AS TINYINT) AS g_status
          |FROM lineitem
          |GROUP BY CUBE (l_returnflag, l_linestatus)
          |ORDER BY g_flag, g_status,
          |         l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Explicit GROUPING SETS (superset — SURVEY §2.7, completing the
    // cube/rollup family): exactly the two business groupings — per
    // (flag, status) and per ship-year — in ONE pass, not the 4-set cube;
    // spark.sql GROUPING SETS compiles to a single Expand + hash agg.
    QueryDef(
      "u12_grouping_sets",
      (s, dir) => {
        Tables.load(s, dir, "lineitem").createOrReplaceTempView("li_gs")
        s.sql(
          """SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_yr,
            |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
            |       count(*) AS n_items,
            |       CAST(grouping_id() AS BIGINT) AS gid
            |FROM li_gs
            |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
            |                        (year(l_shipdate)))
            |ORDER BY gid, l_returnflag NULLS FIRST,
            |         l_linestatus NULLS FIRST, ship_yr NULLS FIRST""".stripMargin)
      },
      Some(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(year(l_shipdate) AS INTEGER) AS ship_yr,
          |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
          |       count(*) AS n_items,
          |       CAST(GROUPING(l_returnflag, l_linestatus, year(l_shipdate)) AS BIGINT) AS gid
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (year(l_shipdate)))
          |ORDER BY gid, l_returnflag NULLS FIRST,
          |         l_linestatus NULLS FIRST, ship_yr NULLS FIRST""".stripMargin)),

    // RECURSIVE hierarchy rollup (superset — SURVEY §2.7): Catalyst has no
    // WITH RECURSIVE, so `ops/Hierarchy.reachability` runs the iterative
    // frontier BFS (one hash join per LEVEL, localCheckpointed lineage) and
    // the oracle replays it with DuckDB's real recursive CTE — the
    // strongest cross-engine check a recursion can get. The forest is
    // derived deterministically from the part table (parent = partkey DIV 8,
    // partkeys 0-7 are roots), and the rollup is integer-exact: retail
    // prices carry 2 decimals, so cents are BIGINTs on both engines.
    QueryDef(
      "u13_recursive_rollup",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val forest = part.select(
          col("p_partkey").as("node"),
          when(col("p_partkey") >= 8, expr("p_partkey DIV 8")).as("parent"),
          expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("cents"))
        // depth = ceil(log8(max partkey)) grows with SF: ~4 at sf0.01 but
        // 9+ past sf~84; 24 covers any conceivable partkey in int64
        graft.ops.Hierarchy.reachability(forest, "node", "parent", maxDepth = 24)
          .join(forest.select(col("node"), col("cents")), "node")
          .groupBy(col("root"))
          .agg(
            count(lit(1)).as("subtree_nodes"),
            max(col("depth")).cast("long").as("max_depth"),
            sum(col("cents")).as("retail_cents"))
          .orderBy(col("root"))
      },
      Some(
        """WITH RECURSIVE walk(node, root, depth) AS (
          |  SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 8
          |  UNION ALL
          |  SELECT c.p_partkey, w.root, w.depth + 1
          |  FROM part c JOIN walk w ON c.p_partkey // 8 = w.node
          |  WHERE c.p_partkey >= 8)
          |SELECT root, count(*) AS subtree_nodes,
          |       CAST(max(depth) AS BIGINT) AS max_depth,
          |       CAST(SUM(CAST(round(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
          |         AS retail_cents
          |FROM walk JOIN part p ON p.p_partkey = walk.node
          |GROUP BY root ORDER BY root""".stripMargin)),

    // ORDERED-SET AGGREGATES (superset — SURVEY §2.4): exact discrete
    // median / p90 / deterministic mode of per-doc token counts per
    // language — the WITHIN GROUP family, built from rank arithmetic
    // instead of engine quantile functions (whose interpolation rules
    // differ engine to engine): k-th-smallest picks via row_number with
    // integer rank formulas, mode ties break to the SMALLEST value via a
    // min-struct (no nondeterministic any-value). One shuffle on lang +
    // an in-group sort; for bounded integer scores the t47 histogram
    // path computes the same ranks without the sort.
    QueryDef(
      "u14_ordered_set_aggs",
      (s, dir) => {
        val v = Tables.load(s, dir, "documents")
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("v"))
        val c = v.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("v"))
        val ranked = v.withColumn("rn", row_number().over(w))
          .join(broadcast(c), Seq("lang"))
          .groupBy(col("lang"))
          .agg(
            max(when(col("rn") === expr("(n + 1) DIV 2"), col("v")))
              .as("median_tokens"),
            max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("v")))
              .as("p90_tokens"))
        val mode = v.groupBy(col("lang"), col("v"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("lang"))
          .agg(min(struct((-col("cnt")).as("nc"), col("v"))).as("_m"))
          .select(col("lang"), col("_m.v").as("mode_tokens"))
        c.join(ranked, Seq("lang")).join(mode, Seq("lang"))
          .select(col("lang"), col("n").as("n_docs"), col("median_tokens"),
            col("p90_tokens"), col("mode_tokens"))
          .orderBy(col("lang"))
      },
      Some(
        """WITH v AS (
          |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS v
          |  FROM documents),
          |c AS (SELECT lang, count(*) AS n FROM v GROUP BY 1),
          |r AS (SELECT lang, v,
          |        row_number() OVER (PARTITION BY lang ORDER BY v) AS rn
          |      FROM v),
          |m AS (SELECT r.lang,
          |        max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median_tokens,
          |        max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90_tokens
          |      FROM r JOIN c USING (lang) GROUP BY 1),
          |md AS (SELECT lang, v AS mode_tokens FROM (
          |        SELECT lang, v,
          |          row_number() OVER (PARTITION BY lang
          |            ORDER BY count(*) DESC, v) AS rn
          |        FROM v GROUP BY lang, v) WHERE rn = 1)
          |SELECT c.lang, CAST(n AS BIGINT) AS n_docs, median_tokens,
          |       p90_tokens, mode_tokens
          |FROM c JOIN m USING (lang) JOIN md USING (lang)
          |ORDER BY lang""".stripMargin)),

    // INTEGER-EXACT MOMENT STATISTICS (superset — SURVEY §2.7; u14's
    // ordered-set sibling): per-group variance and covariance reported as
    // the exact BIGINT NUMERATORS of the closed forms — var_num =
    // n·Σx² − (Σx)² (population variance × n²) and cov_num = n·Σxy −
    // Σx·Σy — instead of floats, because a float variance sums doubles in
    // partition order and can never hash-match across engines, while the
    // numerators are plain integer sums that any engine reproduces
    // bit-for-bit (the consumer divides by n² at the edge). x = token
    // count, y = distinct-token count per doc: cov_num > 0 per lang is
    // the vocabulary-growth signal a quality dashboard plots. One hash
    // aggregate, map-side partials, no window.
    QueryDef(
      "u15_exact_moments",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val v = Tables.load(s, dir, "documents")
          .select(col("lang"),
            size(toks).cast("long").as("x"),
            size(array_distinct(toks)).cast("long").as("y"))
        v.groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sum_x"),
            sum(col("x") * col("x")).as("sum_x2"),
            sum(col("y")).as("sum_y"),
            sum(col("x") * col("y")).as("sum_xy"))
          .select(col("lang"), col("n"),
            (col("n") * col("sum_x2") - col("sum_x") * col("sum_x"))
              .as("var_x_num"),
            (col("n") * col("sum_xy") - col("sum_x") * col("sum_y"))
              .as("cov_xy_num"),
            col("sum_x"), col("sum_y"))
          .orderBy(col("lang"))
      },
      Some(
        """WITH v AS (
          |  SELECT lang,
          |         CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
          |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
          |  FROM documents),
          |a AS (
          |  SELECT lang, count(*) AS n,
          |         CAST(SUM(x) AS BIGINT) AS sum_x,
          |         CAST(SUM(x * x) AS BIGINT) AS sum_x2,
          |         CAST(SUM(y) AS BIGINT) AS sum_y,
          |         CAST(SUM(x * y) AS BIGINT) AS sum_xy
          |  FROM v GROUP BY 1)
          |SELECT lang, n,
          |       n * sum_x2 - sum_x * sum_x AS var_x_num,
          |       n * sum_xy - sum_x * sum_y AS cov_xy_num,
          |       sum_x, sum_y
          |FROM a ORDER BY lang""".stripMargin)),

    // PIVOT (superset — SURVEY §2.7): event counts cross-tabbed by type.
    // With explicit pivot values Spark compiles this to conditional
    // aggregation — one shuffle, no per-value passes; the oracle IS that
    // conditional aggregation. coalesce(0) pins absent cells to zero.
    QueryDef(
      "u4_pivot_events",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = ev(s, dir)
          .groupBy(col("_partition"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("_partition") +:
            types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy(col("_partition"))
      },
      oracle(
        """SELECT _partition,
          |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
          |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
          |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
          |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
          |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
          |FROM events_topic GROUP BY _partition ORDER BY _partition""".stripMargin)),

    // UNPIVOT/melt (superset — SURVEY §2.7): the pivot result folded back
    // to (partition, event_type, cnt) long form via Dataset.unpivot — a
    // zero-shuffle projection (each input row expands to 5 output rows in
    // place), proving pivot∘unpivot round-trips to the plain group-by.
    QueryDef(
      "u5_unpivot_events",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = ev(s, dir)
          .groupBy(col("_partition"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        wide.unpivot(
            Array(col("_partition")),
            types.map(col).toArray,
            "event_type", "cnt")
          .filter(col("cnt").isNotNull)
          .orderBy(col("_partition"), col("event_type"))
      },
      oracle(
        """SELECT _partition, event_type, count(*) AS cnt
          |FROM events_topic
          |GROUP BY _partition, event_type
          |ORDER BY _partition, event_type""".stripMargin)),

    // NTILE quartiles (superset — SURVEY §2.8, the distribution-bucketing
    // window family): orders split into price quartiles per priority class,
    // then per-bucket stats. One shuffle on the partition key; the second
    // aggregate is tiny.
    QueryDef(
      "u6_ntile_quartiles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .withColumn("quartile", ntile(4).over(w))
          .groupBy(col("o_orderpriority"), col("quartile"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("bucket_rev"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy(col("o_orderpriority"), col("quartile"))
      },
      Some(
        """SELECT o_orderpriority, quartile, count(*) AS n,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_rev,
          |       max(o_totalprice) AS max_price
          |FROM (SELECT o_orderpriority, o_totalprice,
          |             ntile(4) OVER (PARTITION BY o_orderpriority
          |                            ORDER BY o_totalprice, o_orderkey) AS quartile
          |      FROM orders)
          |GROUP BY o_orderpriority, quartile
          |ORDER BY o_orderpriority, quartile""".stripMargin)),

    // Exact percentiles (superset): Spark's `percentile` and DuckDB's
    // `quantile_cont` both use type-7 linear interpolation over the sorted
    // values, so the doubles agree to rounding. Exact percentile is a
    // per-group sort-aggregate — fine here because groups are few and huge
    // (the shuffle is on a 3-value key); for high-cardinality keys the
    // scale path is approx_percentile (t-digest, not oracle-matchable).
    QueryDef(
      "u7_percentiles",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .withColumn("p", col("l_extendedprice").cast("double"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(p, 0.25)"), 2).as("p25"),
          round(expr("percentile(p, 0.5)"), 2).as("p50"),
          round(expr("percentile(p, 0.75)"), 2).as("p75"),
          round(expr("percentile(p, 0.99)"), 2).as("p99"))
        .orderBy(col("l_returnflag")),
      Some(
        """SELECT l_returnflag, count(*) AS n,
          |       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 2) AS p25,
          |       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 2) AS p50,
          |       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 2) AS p75,
          |       round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 2) AS p99
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Window-function analytics (superset — the reference has no window
    // functions, SURVEY §2.8): top-3 orders per customer by total price.
    // One shuffle on custkey; rank inside the sorted partition.
    QueryDef(
      "w1_top_orders_per_cust",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"),
            col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some(
        """SELECT o_custkey, rk, o_orderkey, o_totalprice
          |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
          |             row_number() OVER (PARTITION BY o_custkey
          |                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
          |      FROM orders WHERE o_custkey < 100)
          |WHERE rk <= 3
          |ORDER BY o_custkey, rk""".stripMargin)),

    // q8-shaped: nation market share within a region by order year — the
    // conditional-share-of-total shape. Fact-fact shuffle on orderkey; all
    // four dims broadcast. Exact decimal sums feed one double division.
    QueryDef(
      "q8_market_share",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        val part = Tables.load(s, dir, "part")
          .filter(col("p_type") === "ECONOMY")
        val supp = Tables.load(s, dir, "supplier")
        val cust = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region")
          .filter(col("r_name") === "AMERICA")
        val custNation = nation.select(col("n_nationkey").as("cn_key"),
          col("n_regionkey").as("cn_region"))
        val suppNation = nation.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
        val disc = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
          .join(broadcast(region), col("cn_region") === col("r_regionkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            round(sum(when(col("supp_nation") === "BRAZIL", disc)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
              sum(disc).cast("double"), 6).as("mkt_share"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_year"))
      },
      Some(
        """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
          |       round(CAST(SUM(CASE WHEN sn.n_name = 'BRAZIL'
          |                  THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                       AS DECIMAL(18,4))
          |                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
          |             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                  AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation cn ON c_nationkey = cn.n_nationkey
          |JOIN region ON cn.n_regionkey = r_regionkey
          |JOIN nation sn ON s_nationkey = sn.n_nationkey
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |  AND p_type = 'ECONOMY' AND r_name = 'AMERICA'
          |GROUP BY 1 ORDER BY o_year""".stripMargin)),

    // q9-shaped (adapted: the testdata has no partsupp/supplycost, so
    // profit = discounted revenue): revenue by supplier nation and order
    // year over one part family. Shuffle on orderkey; dims broadcast.
    QueryDef(
      "q9_profit_nation_year",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val ord = Tables.load(s, dir, "orders")
        val part = Tables.load(s, dir, "part")
          .filter(col("p_name").contains("gear"))
        val supp = Tables.load(s, dir, "supplier")
        val nation = Tables.load(s, dir, "nation")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("profit"),
            count(lit(1)).as("n_items"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(
        """SELECT n_name AS nation,
          |       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
          |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS profit,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%gear%'
          |GROUP BY 1, 2
          |ORDER BY nation, o_year DESC""".stripMargin)),

    // q13-shaped: customer order-count distribution — LEFT OUTER join so
    // zero-order customers survive, then a second aggregate over the
    // counts. Two shuffles (custkey, then tiny count-key agg).
    QueryDef(
      "q13_cust_order_dist",
      (s, dir) => {
        val cust = Tables.load(s, dir, "customer").select(col("c_custkey"))
        val ord = Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(
        """SELECT c_count, count(*) AS custdist
          |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          |      FROM customer
          |      LEFT OUTER JOIN orders ON c_custkey = o_custkey
          |                            AND o_orderpriority <> '1-URGENT'
          |      GROUP BY c_custkey)
          |GROUP BY c_count
          |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // q15-shaped: top supplier(s) by quarterly revenue — aggregate, then
    // join against the broadcast 1-row maximum. The revenue equality is
    // evaluated on exact decimals; doubles appear only in the output.
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        val rev = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
          .groupBy(col("l_suppkey"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).as("total_rev"))
        val top = rev.agg(max(col("total_rev")).as("max_rev"))
        val supp = Tables.load(s, dir, "supplier")
        rev.join(broadcast(top), col("total_rev") === col("max_rev"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      Some(
        """WITH rev AS (
          |  SELECT l_suppkey,
          |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |             AS DECIMAL(18,4))) AS total_rev
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
          |FROM rev JOIN supplier ON l_suppkey = s_suppkey
          |WHERE total_rev = (SELECT max(total_rev) FROM rev)
          |ORDER BY s_suppkey""".stripMargin)),

    // q16-shaped (adapted: supplier-per-part variety comes from lineitem,
    // not partsupp): distinct suppliers per (brand, type, size) for
    // non-excluded brands. countDistinct shuffles (brand,type,size,supp)
    // once, then aggregates — the two-level distinct shape.
    QueryDef(
      "q16_part_supp_variety",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_size").isin(1, 9, 19, 29, 39, 49))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
          .limit(20)
      },
      Some(
        """SELECT p_brand, p_type, p_size,
          |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 19, 29, 39, 49)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20""".stripMargin)),

    // q17-shaped: revenue from small-quantity lineitems relative to the
    // per-part average — aggregate-then-rejoin on partkey; the per-part
    // averages are tiny and broadcast back to the fact side. IEEE division
    // makes 0.5*avg bit-identical across engines on identical inputs.
    QueryDef(
      "q17_small_qty_revenue",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
          .filter(col("p_brand") === "Brand#3")
        val li = Tables.load(s, dir, "lineitem")
        val avgQty = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey").as("ap_key"))
          .agg(avg(col("l_quantity")).as("avg_qty"))
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .join(broadcast(avgQty), col("l_partkey") === col("ap_key"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg(
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("small_rev"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """WITH pq AS (
          |  SELECT l_partkey AS ap_key, AVG(l_quantity) AS avg_qty
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_brand = 'Brand#3' GROUP BY 1)
          |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_rev,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN pq ON l_partkey = ap_key
          |WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty""".stripMargin)),

    // q19-shaped: OR-ed brand/size/quantity brackets — the disjunctive
    // residual-predicate shape: one broadcast join, predicate stays in the
    // scan/filter (no union of three plans).
    QueryDef(
      "q19_bracket_revenue",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        val li = Tables.load(s, dir, "lineitem")
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 25) &&
              col("l_quantity").between(20, 30)))
          .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(
        """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |                AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity BETWEEN 1 AND 11)
          |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
          |       AND l_quantity BETWEEN 10 AND 20)
          |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
          |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // q20-shaped (adapted: shipped volume from lineitem instead of
    // partsupp availability): suppliers who moved above-threshold volume
    // of one part family in 1997 — HAVING gate, then broadcast semi-join
    // back to supplier/nation.
    QueryDef(
      "q20_heavy_suppliers",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
          .filter(col("p_name").contains("bolt"))
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        val heavy = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("tot_qty"))
          .filter(col("tot_qty") > 50)
        val supp = Tables.load(s, dir, "supplier")
        val nation = Tables.load(s, dir, "nation")
        supp.join(broadcast(heavy), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"), col("tot_qty"))
          .orderBy(col("s_suppkey"))
      },
      Some(
        """SELECT s_suppkey, s_name, n_name, tot_qty
          |FROM (SELECT l_suppkey, SUM(l_quantity) AS tot_qty
          |      FROM lineitem JOIN part ON l_partkey = p_partkey
          |      WHERE p_name LIKE '%bolt%'
          |        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |      GROUP BY l_suppkey HAVING SUM(l_quantity) > 50) heavy
          |JOIN supplier ON s_suppkey = heavy.l_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |ORDER BY s_suppkey""".stripMargin)),

    // q2-shaped (adapted: observed unit cost from lineitem instead of
    // partsupp supplycost): per part in one size/type family, the
    // supplier(s) in a region offering the minimum unit price — the
    // correlated-scalar-subquery shape (MIN per part, then equality back
    // onto the per-(part,supplier) costs). Two hash aggregates on
    // (partkey[,suppkey]) — the per-part min re-joins the per-pair costs
    // by partkey, never a window sort — and every dim broadcasts. MIN of
    // doubles is order-independent, so the cost = min_cost equality is
    // engine-portable (AVG here would not be).
    QueryDef(
      "q2_min_cost_supplier",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") / col("l_quantity")).as("unit"))
        val cost = li.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("unit")).as("unit_cost"))
        val minCost = cost.groupBy(col("l_partkey").as("mp_key"))
          .agg(min(col("unit_cost")).as("min_cost"))
        val part = Tables.load(s, dir, "part")
          .filter(col("p_size").between(1, 15) && col("p_type") === "SMALL")
        val supp = Tables.load(s, dir, "supplier")
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")
        cost
          .join(minCost, col("l_partkey") === col("mp_key") &&
            col("unit_cost") === col("min_cost"))
          .join(broadcast(part), col("p_partkey") === col("l_partkey"))
          .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_type"),
            round(col("unit_cost"), 4).as("unit_cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some(
        """WITH cost AS (
          |  SELECT l_partkey, l_suppkey,
          |         MIN(l_extendedprice / l_quantity) AS unit_cost
          |  FROM lineitem GROUP BY 1, 2),
          |mincost AS (
          |  SELECT l_partkey AS mp_key, MIN(unit_cost) AS min_cost
          |  FROM cost GROUP BY 1)
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
          |       round(unit_cost, 4) AS unit_cost
          |FROM cost
          |JOIN mincost ON l_partkey = mp_key AND unit_cost = min_cost
          |JOIN part ON p_partkey = l_partkey
          |JOIN supplier ON s_suppkey = l_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE p_size BETWEEN 1 AND 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          |LIMIT 100""".stripMargin)),

    // q11-shaped: per-part shipped value for one nation's suppliers,
    // keeping parts above the nation's mean part value — the
    // global-scalar-subquery HAVING shape. The total/count pair is a
    // 1-row scalar (crossJoin broadcast); the threshold is
    // SCALE-INVARIANT (v > 1.5 x mean, a fixed fraction of the total
    // would go empty as part cardinality grows with SF) and the compare
    // stays in all-integer DECIMAL arithmetic (v*n*2 > total*3) on both
    // engines, so no float-rounding boundary case can flip a row.
    QueryDef(
      "q11_important_parts",
      (s, dir) => {
        val supp = Tables.load(s, dir, "supplier")
        val nation = Tables.load(s, dir, "nation")
          .filter(col("n_name") === "NATION_3")
        val li = Tables.load(s, dir, "lineitem")
        val v = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(18,4)")
        val vals = li
          .join(broadcast(supp.join(broadcast(nation),
            col("s_nationkey") === col("n_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(v).as("v"))
        vals.crossJoin(broadcast(vals.agg(
            sum(col("v")).as("total"), count(lit(1)).as("n"))))
          .filter(col("v") * col("n") * 2 > col("total") * 3)
          .select(col("l_partkey").as("p_key"),
            col("v").cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("p_key"))
      },
      Some(
        """WITH val AS (
          |  SELECT l_partkey,
          |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          |             AS DECIMAL(18,4))) AS v
          |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |  JOIN nation ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_3' GROUP BY 1),
          |tot AS (SELECT SUM(v) AS total, count(*) AS n FROM val)
          |SELECT l_partkey AS p_key, CAST(v AS DOUBLE) AS part_value
          |FROM val, tot WHERE v * n * 2 > total * 3
          |ORDER BY part_value DESC, p_key""".stripMargin)),

    // q12-shaped (adapted: linestatus stands in for shipmode, ship-delay
    // vs order date for receipt-vs-commit): high- vs low-priority line
    // counts among late shipments — join + conditional aggregation; the
    // priority test is a pre-aggregated 0/1 projection, so the agg is two
    // SUMs over one narrow shuffle.
    QueryDef(
      "q12_late_priority",
      (s, dir) => {
        val ord = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        li.join(ord, col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some(
        """SELECT l_linestatus,
          |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // q21-shaped: suppliers who were the SOLE late shipper in a
    // multi-supplier finished order — EXISTS (another supplier in the
    // order) as a LEFT SEMI join plus NOT EXISTS (another LATE supplier)
    // as a LEFT ANTI join, both keyed on orderkey with a suppkey
    // inequality residual. All three legs are projections of the same
    // lineitem scan; the semi/anti joins shuffle (orderkey, suppkey)
    // pairs only, and the supplier dim broadcasts for the final tally.
    QueryDef(
      "q21_waiting_suppliers",
      (s, dir) => {
        val ordF = Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val li = Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val l1 = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 80 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        val lateOthers = l1.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        val waiting = l1
          .join(others, col("l_orderkey") === col("ok2") &&
            col("l_suppkey") =!= col("sk2"), "left_semi")
          .join(lateOthers, col("l_orderkey") === col("ok3") &&
            col("l_suppkey") =!= col("sk3"), "left_anti")
        waiting
          .join(broadcast(Tables.load(s, dir, "supplier")),
            col("s_suppkey") === col("l_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some(
        """SELECT s_name, count(*) AS numwait
          |FROM lineitem l1
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |JOIN supplier ON s_suppkey = l1.l_suppkey
          |WHERE o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 80 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 80 DAY)
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    // Salted skew join (superset): event_type has only 5 values, so a
    // plain shuffle join lands EVERY row of a hot class on one reducer —
    // the celebrity-key failure AQE cannot always split. Skew.saltedJoin
    // spreads each fact key over 8 salted partitions and replicates the
    // 5-row build side per salt; the result set is provably identical to
    // the plain equi-join, which is exactly what the (salt-free) DuckDB
    // oracle computes.
    QueryDef(
      "s22_salted_join",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir).select(
          col("event_type"),
          get_json_object(col("_value"), "$.k").cast("int").as("k"))
        val dim = ev.select(col("event_type")).distinct()
          .withColumn("weight", length(col("event_type")))
        graft.ops.Skew.saltedJoin(ev, dim, Seq("event_type"), salt = 8)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            sum((col("k") * col("weight")).cast("long")).as("wsum"))
          .orderBy(col("event_type"))
      },
      oracle(
        """SELECT e.event_type, count(*) AS cnt,
          |  CAST(SUM(CAST(json_extract_string(e._value, '$.k') AS INTEGER)
          |           * weight) AS BIGINT) AS wsum
          |FROM events_topic e
          |JOIN (SELECT DISTINCT event_type, length(event_type) AS weight
          |      FROM events_topic) dim USING (event_type)
          |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Window analytics (superset, SURVEY §2.8): running total + lag per
    // customer — cumulative frames over a keyed sort, one shuffle on
    // custkey. Exact decimal running sums; doubles only in the output.
    QueryDef(
      "w2_running_total",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .filter(col("o_custkey") < 50)
          .withColumn("run_total",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double"))
          .withColumn("prev_price",
            lag(col("o_totalprice").cast("decimal(18,2)"), 1).over(w)
              .cast("double"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"), col("run_total"), col("prev_price"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some(
        """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
          |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
          |              OVER (PARTITION BY o_custkey
          |                    ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS run_total,
          |       CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1)
          |              OVER (PARTITION BY o_custkey
          |                    ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price
          |FROM orders WHERE o_custkey < 50
          |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Moving average over a pre-aggregated daily series (superset): daily
    // revenue then a 7-row trailing mean — the aggregate-then-window
    // pattern that keeps the window input small at any scale.
    QueryDef(
      "w3_moving_avg",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
          .groupBy(col("o_orderdate").as("d"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("day_rev"))
        val w = Window.orderBy(col("d")).rowsBetween(-6, 0)
        daily
          .withColumn("ma7", round(avg(col("day_rev").cast("double")).over(w), 4))
          .select(col("d"), col("day_rev").cast("double").as("day_rev"), col("ma7"))
          .orderBy(col("d"))
      },
      Some(
        """WITH daily AS (
          |  SELECT o_orderdate AS d,
          |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev
          |  FROM orders
          |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          |    AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          |  GROUP BY 1)
          |SELECT d, CAST(day_rev AS DOUBLE) AS day_rev,
          |       round(AVG(CAST(day_rev AS DOUBLE))
          |               OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
          |FROM daily ORDER BY d""".stripMargin)),

    // Exact ORDERED funnel (view → click-after-view → purchase-after-
    // click): three chained stage aggregates, each keyed on user_id —
    // Catalyst hashes all three on the same key so the exchanges line up
    // (and on a bucketed/copartitioned layout they vanish). A strict
    // funnel cannot be one conditional aggregate (stage 2's filter
    // depends on stage 1's result per user), so the chained shape IS the
    // minimal-shuffle form; each stage's frame shrinks (users that
    // dropped out disappear), so later joins get cheaper, not pricier.
    QueryDef(
      "w4_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts_ms"))
        val s1 = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("v_ts"))
        val s2 = ev.where(col("event_type") === "click")
          .join(s1, "user_id").where(col("ts_ms") >= col("v_ts"))
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("c_ts"))
        val s3 = ev.where(col("event_type") === "purchase")
          .join(s2, "user_id").where(col("ts_ms") >= col("c_ts"))
          .groupBy(col("user_id")).agg(min(col("ts_ms")).as("p_ts"))
        s1.agg(count(lit(1)).as("n_view"))
          .crossJoin(s2.agg(count(lit(1)).as("n_click_after_view")))
          .crossJoin(s3.agg(count(lit(1)).as("n_full_funnel")))
          .select(col("n_view"), col("n_click_after_view"),
            col("n_full_funnel"),
            round(col("n_full_funnel").cast("double")
              / col("n_view").cast("double"), 4).as("conversion"))
      },
      Some(Tables.withEventsTopic(
        """, ev AS (
          |  SELECT user_id, event_type, _ts_ms AS ts_ms FROM events_topic),
          |s1 AS (
          |  SELECT user_id, min(ts_ms) AS v_ts FROM ev
          |  WHERE event_type = 'view' GROUP BY 1),
          |s2 AS (
          |  SELECT e.user_id, min(ts_ms) AS c_ts
          |  FROM ev e JOIN s1 USING (user_id)
          |  WHERE event_type = 'click' AND ts_ms >= v_ts GROUP BY 1),
          |s3 AS (
          |  SELECT e.user_id, min(ts_ms) AS p_ts
          |  FROM ev e JOIN s2 USING (user_id)
          |  WHERE event_type = 'purchase' AND ts_ms >= c_ts GROUP BY 1)
          |SELECT (SELECT count(*) FROM s1) AS n_view,
          |       (SELECT count(*) FROM s2) AS n_click_after_view,
          |       (SELECT count(*) FROM s3) AS n_full_funnel,
          |       round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
          |             / CAST((SELECT count(*) FROM s1) AS DOUBLE), 4) AS conversion""".stripMargin))),

    // Cohort retention matrix: users grouped by first-seen day, activity
    // counted per day offset — the standard growth-analytics rollup. Day
    // arithmetic is pure integer math on epoch-ms (engine-neutral, no
    // timezone/date functions). Two aggregates keyed on user_id (exchange
    // aligned) + one small rollup; the per-user first-seen frame is the
    // only state carried, so the shape holds at any event volume.
    QueryDef(
      "u9_cohort_retention",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          // `div` = exact integer division (double `/` then cast could
          // round across a day boundary differently than DuckDB's `//`)
          .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
        val first = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        ev.join(first, "user_id")
          .withColumn("day_offset", col("day") - col("cohort_day"))
          .where(col("day_offset") <= 7)
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some(Tables.withEventsTopic(
        """, ev AS (
          |  SELECT user_id, _ts_ms // 86400000 AS day FROM events_topic),
          |first AS (
          |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
          |SELECT cohort_day, day - cohort_day AS day_offset,
          |       count(DISTINCT user_id) AS n_users
          |FROM ev JOIN first USING (user_id)
          |WHERE day - cohort_day <= 7
          |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin))),

    // Inter-arrival distribution: per-user event gaps (lag over the
    // actor-keyed window, the same bounded per-user sort as sessionizing)
    // bucketed into capped minute bins — the arrival-rate histogram
    // capacity planning and anomaly detection read. One actor-keyed
    // shuffle + one small aggregate; pure integer epoch-ms math.
    QueryDef(
      "w5_interarrival",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts_ms"), col("event_id"))
          .withColumn("prev", lag(col("ts_ms"), 1).over(w))
          .where(col("prev").isNotNull)
          .withColumn("gap_ms", col("ts_ms") - col("prev"))
          .withColumn("bucket_min",
            least(expr("gap_ms div 60000"), lit(60L)))
          .groupBy(col("bucket_min"))
          .agg(count(lit(1)).as("n_gaps"),
            min(col("gap_ms")).as("min_gap_ms"),
            max(col("gap_ms")).as("max_gap_ms"))
          .orderBy(col("bucket_min"))
      },
      Some(
        """WITH e AS (
          |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
          |g AS (
          |  SELECT ts_ms - lag(ts_ms) OVER (PARTITION BY user_id
          |             ORDER BY ts_ms, event_id) AS gap_ms
          |  FROM e)
          |SELECT least(gap_ms // 60000, 60) AS bucket_min,
          |       count(*) AS n_gaps,
          |       min(gap_ms) AS min_gap_ms, max(gap_ms) AS max_gap_ms
          |FROM g WHERE gap_ms IS NOT NULL
          |GROUP BY 1 ORDER BY bucket_min""".stripMargin))
  )
}
