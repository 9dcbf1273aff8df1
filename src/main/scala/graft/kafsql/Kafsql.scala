package graft.kafsql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gov.{Governor, Guardrails}

/** KAFSQL entry point: parse → validate → plan → (optionally) govern.
  *
  * {{{
  * val reg = new TopicRegistry(Seq(TopicDef("events", s => eventsFrame(s))))
  * Kafsql.sql(spark, reg, "SELECT _partition, COUNT(*) AS cnt FROM events LAST 5m GROUP BY _partition")
  * }}}
  */
object Kafsql {

  def parse(sql: String): Statement = Parser.parse(sql)

  /** Plan without governance (tests / embedding). `nowMs` is injectable
    * because LAST is wall-clock-relative (SURVEY §7.5). */
  def sql(spark: SparkSession, reg: TopicRegistry, query: String,
      nowMs: Long = System.currentTimeMillis(),
      rails: Guardrails = Guardrails()): DataFrame =
    Planner.plan(spark, reg, parse(query), Planner.Env(nowMs, rails))

  /** Fully governed execution: admission → result cache → timeout. */
  def governed(spark: SparkSession, reg: TopicRegistry, gov: Governor,
      query: String, nowMs: Long = System.currentTimeMillis(),
      rails: Guardrails = Guardrails()): DataFrame = {
    val stmt = parse(query)
    val cacheable = stmt match {
      case s: Select => s.window match {
        case Some(_: Tail) | Some(ScanFull) => false
        case Some(_: Last) => true
        case None => s.where.exists {
          case _: TsCmp | _: TsBetween => true
          case _ => false
        }
      }
      case _ => false
    }
    val bounds = stmt match {
      case s: Select => Planner.tsBounds(s, nowMs)
      case _ => (None, None)
    }
    gov.withAdmission() {
      gov.cachedOrRun(spark, gov.cacheKey(query, bounds), cacheable) {
        gov.withTimeout(spark) {
          Planner.plan(spark, reg, stmt, Planner.Env(nowMs, rails))
        }
      }
    }
  }
}
