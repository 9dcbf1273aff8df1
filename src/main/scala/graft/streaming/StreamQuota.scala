package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key ingest quota enforcement on `transformWithState` — Spark 4's
  * arbitrary-stateful-processing API (typed ValueState/ListState/MapState
  * with per-state TTL, RocksDB-backed). The training-data use case: cap
  * how many documents any single source/domain contributes to a continuous
  * ingest (anti-spam / source-balance guardrail), with the cap resetting
  * after a TTL of inactivity.
  *
  * Why this API and not `flatMapGroupsWithState` (StreamSessions): the
  * quota counter wants per-STATE TTL handled by the store itself, not
  * timer bookkeeping in user code — and the RocksDB provider keeps the
  * working set off-heap, which is what makes million-key quota maps
  * viable on an executor. State per key is ONE long (plus TTL metadata):
  * memory is #keys-in-TTL-horizon × O(1), independent of stream age.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider` (jar ships with Spark 4).
  */
object StreamQuota {

  case class In(key: String, tsMs: Long)
  case class Admit(key: String, tsMs: Long, n_in_key: Long, admitted: Boolean)

  class QuotaProcessor(quota: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, In, Admit] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[In],
        timers: TimerValues): Iterator[Admit] = {
      // sort within the micro-batch so admission is deterministic under
      // shuffle-order nondeterminism
      val ordered = rows.toArray.sortBy(_.tsMs)
      var c = if (count.exists()) count.get() else 0L
      val out = ordered.map { r =>
        c += 1
        Admit(key, r.tsMs, c, c <= quota)
      }
      count.update(c)
      out.iterator
    }
  }

  /** Tag each event with its running per-key count and an `admitted` flag
    * (count <= quota). `ttlMs` (processing-time) expires an idle key's
    * counter, re-opening its quota. Downstream filters on `admitted`.
    *
    * TimeMode is None unless a TTL is requested: ProcessingTime mode
    * re-triggers empty micro-batches to evaluate expiry, which with the
    * default (as-fast-as-possible) trigger is a busy loop — TTL users
    * should pair this with `Trigger.ProcessingTime(...)` on the query. */
  def enforce(
      events: DataFrame, keyCol: String, tsMsCol: String, quota: Long,
      ttlMs: Option[Long] = None): Dataset[Admit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = ttlMs.map(ms => TTLConfig(Duration.ofMillis(ms)))
      .getOrElse(TTLConfig.NONE)
    val timeMode =
      if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .select(col(keyCol).cast("string").as("key"),
        col(tsMsCol).cast("long").as("tsMs"))
      .as[In]
      .groupByKey(_.key)
      .transformWithState(
        new QuotaProcessor(quota, ttl), timeMode, OutputMode.Append())
  }
}
