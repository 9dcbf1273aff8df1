package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Event-time window operators (SURVEY §2.9 superset, St5): the reference
  * has no event-time windows at all — `LAST` is wall-clock at query time —
  * so Spark's `window`/`session_window` aggregates are the rebuild's upgrade
  * path for continuous queries. The same expressions run in Structured
  * Streaming with a watermark (see `streaming/StreamAggs` + StreamAggSpec);
  * here they run in batch mode against the driver testdata so the DuckDB
  * oracle can hash-check them (time_bucket / gaps-and-islands equivalents).
  *
  * Scale notes: both are single-shuffle hash aggregates keyed on
  * (key, window); session_window's merge phase is per-key ordered within the
  * shuffle partition, so skew follows key skew (salt the groupBy key if one
  * user dominates). State in the streaming variant is bounded by the
  * watermark horizon, not stream age.
  */
object StreamPack extends QueryPack {

  private def oracle(body: String): Option[String] =
    Some(Tables.withEventsTopic(body))

  override def entries: Seq[QueryDef] = Seq(

    // session_window: events of one user within a 30-min gap merge into one
    // session (half-open [ts, ts+gap) windows — a gap of exactly 30 min
    // starts a new session on both sides)
    QueryDef(
      "e5_session_window",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir)
        ev.groupBy(col("_key"), session_window(col("_ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy(col("_key"))
          .agg(
            count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("max_session_events"),
            sum(col("n_events")).as("n_events"))
          .orderBy(col("_key"))
      },
      oracle(
        """, x AS (
          |  SELECT _key, _ts_ms,
          |         CASE WHEN lag(_ts_ms) OVER w IS NULL
          |                OR _ts_ms - lag(_ts_ms) OVER w >= 1800000
          |              THEN 1 ELSE 0 END AS brk
          |  FROM events_topic
          |  WINDOW w AS (PARTITION BY _key ORDER BY _ts_ms)),
          |s AS (
          |  SELECT _key, _ts_ms,
          |         SUM(brk) OVER (PARTITION BY _key ORDER BY _ts_ms
          |                        ROWS UNBOUNDED PRECEDING) AS sess
          |  FROM x),
          |g AS (SELECT _key, sess, count(*) AS n_events FROM s GROUP BY 1, 2)
          |SELECT _key, count(*) AS n_sessions,
          |       CAST(max(n_events) AS BIGINT) AS max_session_events,
          |       CAST(SUM(n_events) AS BIGINT) AS n_events
          |FROM g GROUP BY _key ORDER BY _key""".stripMargin)),

    // tumbling 1-day event-time windows per event type (epoch-aligned UTC
    // midnights on both sides)
    QueryDef(
      "e6_tumbling_window",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir)
        ev.groupBy(col("event_type"), window(col("_ts"), "1 day"))
          .agg(count(lit(1)).as("cnt"),
            countDistinct(col("_key")).as("n_users"))
          .select(col("event_type"),
            date_format(col("window.start"), "yyyy-MM-dd").as("day"),
            col("cnt"), col("n_users"))
          .orderBy(col("event_type"), col("day"))
      },
      oracle(
        """SELECT event_type, strftime(date_trunc('day', _ts), '%Y-%m-%d') AS day,
          |       count(*) AS cnt, count(DISTINCT _key) AS n_users
          |FROM events_topic
          |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin)),

    // custom-state sessionization (flatMapGroupsWithState core, batch twin):
    // per-session rows — start, end, event count — vs the same
    // gaps-and-islands closure that checks e5. Unlike e5 this exercises the
    // user-code state machine (graft.streaming.StreamSessions), whose
    // streaming form emits via event-time timeouts; StreamAggSpec proves
    // stream ≡ batch on the same input.
    QueryDef(
      "e7_custom_state_sessions",
      (s, dir) => {
        val ev = Tables.eventsTopic(s, dir)
          .withColumn("_ts_utc", timestamp_millis(col("_ts_ms")))
        graft.streaming.StreamSessions
          .sessionizeBatch(ev, "_key", "_ts_utc", 1800000L)
          .toDF()
          .orderBy(col("key"), col("session_start_ms"))
      },
      oracle(
        """, x AS (
          |  SELECT _key, _ts_ms,
          |         CASE WHEN lag(_ts_ms) OVER w IS NULL
          |                OR _ts_ms - lag(_ts_ms) OVER w >= 1800000
          |              THEN 1 ELSE 0 END AS brk
          |  FROM events_topic
          |  WINDOW w AS (PARTITION BY _key ORDER BY _ts_ms)),
          |s AS (
          |  SELECT _key, _ts_ms,
          |         SUM(brk) OVER (PARTITION BY _key ORDER BY _ts_ms
          |                        ROWS UNBOUNDED PRECEDING) AS sess
          |  FROM x)
          |SELECT _key AS key, min(_ts_ms) AS session_start_ms,
          |       max(_ts_ms) AS session_end_ms, count(*) AS n_events
          |FROM s GROUP BY _key, sess
          |ORDER BY key, session_start_ms""".stripMargin)),

    // LEFT-OUTER watermarked stream-stream interval join: views that see a
    // same-user purchase within ±2 h join it; views that never will EMIT
    // WITH NULLS once the watermark passes their band — the attribution
    // answer a continuous pipeline must produce ("this impression did not
    // convert") that an inner join simply drops. The stream is driven to
    // completion the way a real bounded backfill ends: all data in batch
    // one, then sentinel rows on BOTH sides push the watermark beyond
    // every live band so expiring state flushes its unmatched rows —
    // Spark emits outer-join nulls only on state EVICTION, never eagerly,
    // so without the final advance the tail of the stream would be
    // silently incomplete. Final answer ≡ the batch LEFT JOIN, per user.
    // State at scale: each side keeps rate × (delay + band) rows, never
    // total history.
    QueryDef(
      "e37_stream_left_outer_join",
      (s, dir) => {
        import java.nio.file.Paths
        val stageL = Fixtures.tmp(dir, "lo_join_left")
        val stageR = Fixtures.tmp(dir, "lo_join_right")
        val sink = Fixtures.tmp(dir, "lo_join_sink")
        val ckpt = Fixtures.tmp(dir, "lo_join_ckpt")
        Seq(stageL, stageR, sink, ckpt).foreach(p =>
          graft.etl.TableSink.deleteRecursive(Paths.get(p)))
        // watermarks demand TIMESTAMP (not NTZ); the session is pinned UTC,
        // so the cast keeps the exact microseconds the oracle sees
        val ev = Tables.load(s, dir, "events")
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id").as("key"), col("ts").cast("timestamp").as("ts"),
            col("event_id").as("value"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id").as("key"), col("ts").cast("timestamp").as("ts"),
            col("event_id").as("value"))
        views.coalesce(2).write.parquet(stageL)
        purchases.coalesce(2).write.parquet(stageR)
        val joined = graft.streaming.StreamJoins.within(
          s.readStream.schema(views.schema).parquet(stageL),
          s.readStream.schema(views.schema).parquet(stageR),
          withinMs = 7200000L, joinType = "leftOuter")
        // a stream-stream join keeps TWO state stores per shuffle
        // partition per micro-batch; at this volume 32 partitions are
        // pure store-commit overhead (~5 batches × 64 stores), so pin the
        // stateful query narrow for the whole drive (StreamDrive: the
        // checkpoint freezes the value at start)
        graft.streaming.StreamDrive.narrow(s) {
          val q = joined.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").start()
          try {
            q.processAllAvailable() // batch 1: all real rows, matches emit
            // sentinel rows past every live band (max ts + band + watermark
            // delay + margin) advance the watermark; two rounds because
            // eviction flushes on the batch AFTER the advance lands
            val hi = views.select(
              (max(col("ts")) + expr("INTERVAL 3 HOURS")).as("hi"))
            for (bump <- Seq(0, 1)) {
              val sentinel = hi.select(
                lit(Long.MinValue).as("key"),
                (col("hi") + expr(s"INTERVAL $bump HOURS")).as("ts"),
                lit(-1L).as("value"))
              sentinel.write.mode("append").parquet(stageL)
              sentinel.write.mode("append").parquet(stageR)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        s.read.parquet(sink)
          .where(col("l_key") =!= Long.MinValue) // sentinels never matter
          .groupBy(col("l_key").as("u"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("r_value")).as("n_matched"),
            sum(when(col("r_value").isNull, 1L).otherwise(0L)).as("n_unmatched"),
            coalesce(sum(col("r_value")), lit(0L)).as("matched_id_sum"))
          .orderBy(col("u"))
      },
      Some(
        """WITH v AS (SELECT user_id AS u, event_id AS vid, ts
          |           FROM events WHERE event_type = 'view'),
          |p AS (SELECT user_id AS u, event_id AS pid, ts
          |      FROM events WHERE event_type = 'purchase'),
          |j AS (SELECT v.u, v.vid, p.pid
          |      FROM v LEFT JOIN p ON p.u = v.u
          |        AND p.ts >= v.ts - INTERVAL 2 HOUR
          |        AND p.ts <= v.ts + INTERVAL 2 HOUR)
          |SELECT u, count(*) AS n_rows,
          |       CAST(count(pid) AS BIGINT) AS n_matched,
          |       CAST(SUM(CASE WHEN pid IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_unmatched,
          |       CAST(COALESCE(SUM(pid), 0) AS BIGINT) AS matched_id_sum
          |FROM j GROUP BY u ORDER BY u""".stripMargin))
  )
}
