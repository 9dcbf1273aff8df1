package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation threading: turn an event/message log into per-session
  * ordered "conversation" rows — the step that builds SFT / dialogue
  * training corpora out of raw interaction logs (thread by actor, split on
  * inactivity, keep turns in time order, digest for audit).
  *
  * Scale shape: ONE hash shuffle on the actor key. Session assignment is
  * the gaps-and-islands window (lag + running count of gap-breaks) — the
  * per-actor sort is bounded by that actor's history, all actors in
  * parallel, never a global sort. The per-session transcript is assembled
  * IN-ROW (collect → array_sort → join on an already-grouped row), the
  * same bounded-width pattern as span-dedup and packed rows: no second
  * shuffle, no ordered aggregate over a whole partition.
  */
object Conversations {

  /** Thread `events` into sessions per `actorCol`, splitting when the gap
    * from the previous event exceeds `gapMs`. Emits one row per session:
    * actor, session_idx (0-based, in time order), n_turns, first/last
    * timestamps, and `convo` — the space-joined turn tokens in
    * (timestamp, id) order, with `convo_md5` as the auditable digest.
    * `tokenCol` is the per-event turn rendering (e.g. the event type or a
    * role:content composite); ordering ties break on `idCol`, so the
    * transcript is total and engine-portable. */
  def threads(events: DataFrame, actorCol: String, tsMsCol: String,
      idCol: String, tokenCol: Column, gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive: $gapMs")
    val byActor = Window.partitionBy(col(actorCol))
      .orderBy(col("_ts"), col("_id"))
    val sessioned = events
      .select(col(actorCol), col(tsMsCol).cast("long").as("_ts"),
        col(idCol).as("_id"), tokenCol.as("_tok"))
      .withColumn("_prev", lag(col("_ts"), 1).over(byActor))
      .withColumn("_break",
        when(col("_prev").isNull || col("_ts") - col("_prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("_break")).over(byActor.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    sessioned
      .groupBy(col(actorCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("_ts")).as("first_ms"),
        max(col("_ts")).as("last_ms"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("_ts"), col("_id"), col("_tok")))),
            _.getField("_tok"))).as("convo"))
      .withColumn("convo_md5", md5(col("convo")))
  }
}
