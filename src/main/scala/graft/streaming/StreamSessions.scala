package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-stateful-processing extension point (SURVEY §2.10) that the
  * declarative `session_window` aggregate (StreamPack `e5`) cannot reach:
  * explicit per-key state machines, event-time timeouts, and emission
  * control live in user code here.
  *
  * Semantics match Spark's `session_window` exactly (half-open
  * `[ts, ts+gap)` windows: an event exactly `gap` after the previous
  * session's last event starts a new session — the reference oracle's
  * `diff >= gap` break condition), so the batch variant is hash-checkable
  * against the same gaps-and-islands closure.
  *
  * Scale/state discipline at 100 TB-rates: state per key is the list of
  * OPEN sessions inside the watermark horizon — a session closes (emits,
  * and leaves state) as soon as the watermark passes `end + gap`, and a
  * key with no open sessions is removed from the store entirely. Memory is
  * therefore rate × (gap + watermark delay), not stream age. The list (not
  * a single session) is required for correctness: a late-but-in-horizon
  * event may open an earlier disjoint session, or bridge two open ones.
  */
object StreamSessions {

  case class Ev(key: String, ts: Timestamp)
  case class Sess(startMs: Long, endMs: Long, n: Long)
  case class SessionOut(
      key: String, session_start_ms: Long, session_end_ms: Long,
      n_events: Long)

  /** Merge open sessions with new event timestamps under `session_window`
    * gap semantics. Input sessions may overlap/abut after adding events;
    * output is the coalesced, ordered session list. */
  private[graft] def merge(
      open: List[Sess], ts: Seq[Long], gapMs: Long): List[Sess] = {
    val all = (open ++ ts.map(t => Sess(t, t, 1L)))
      .sortBy(s => (s.startMs, s.endMs))
    all.foldLeft(List.empty[Sess]) {
      case (cur :: rest, s) if s.startMs < cur.endMs + gapMs =>
        Sess(cur.startMs, math.max(cur.endMs, s.endMs), cur.n + s.n) :: rest
      case (acc, s) => s :: acc
    }.reverse
  }

  private def step(gapMs: Long)(
      key: String, rows: Iterator[Ev],
      state: GroupState[List[Sess]]): Iterator[SessionOut] = {
    val sessions = merge(
      state.getOption.getOrElse(Nil), rows.map(_.ts.getTime).toSeq, gapMs)
    val wm = state.getCurrentWatermarkMs()
    val (closed, open) = sessions.partition(_.endMs + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      // earliest possible close; open sessions satisfy end+gap > wm, so
      // the timestamp is always strictly in the future as required
      state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
    }
    closed.iterator.map(s => SessionOut(key, s.startMs, s.endMs, s.n))
  }

  /** Streaming sessionization. `tsCol` must be TimestampType (watermarks
    * reject NTZ). Append-mode: each session emits exactly once, when the
    * watermark passes its end + gap — via the event-time TIMEOUT path when
    * the key sees no further data. */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String, gapMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(gapMs))
  }

  /** Batch twin running the same merge core through `flatMapGroups` (one
    * invocation per key, everything closes) — this is what the DuckDB
    * oracle hash-checks (`e7_custom_state_sessions`). */
  def sessionizeBatch(
      events: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroups { (k, it) =>
        merge(Nil, it.map(_.ts.getTime).toSeq, gapMs)
          .iterator.map(s => SessionOut(k, s.startMs, s.endMs, s.n))
      }
  }
}
