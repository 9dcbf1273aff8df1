package graft.kafsql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gov.{AclAuthorizer, Governor, Guardrails}

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
    * because LAST is wall-clock-relative (SURVEY §7.5). `authorizer`
    * enforces the topic ACL before planning (open by default). */
  def sql(spark: SparkSession, reg: TopicRegistry, query: String,
      nowMs: Long = System.currentTimeMillis(),
      rails: Guardrails = Guardrails(),
      authorizer: AclAuthorizer = AclAuthorizer.open): DataFrame = {
    authorizer.check(query)
    Planner.plan(spark, reg, parse(query), Planner.Env(nowMs, rails))
  }

  /** Fully governed execution: admission → result cache → timeout, with the
    * MATERIALIZATION (collect) inside all three — a lazily returned
    * DataFrame would escape the job-group timeout and the admission token
    * (the reference scopes its query context around row streaming,
    * `server.go:468-478,2847-2852`). Every KAFSQL plan is LIMIT-bounded
    * (≤ max_rows guardrail), so collecting in the driver is the reference's
    * own row-streaming envelope. */
  def governed(spark: SparkSession, reg: TopicRegistry, gov: Governor,
      query: String, nowMs: Long = System.currentTimeMillis(),
      rails: Guardrails = Guardrails()): DataFrame = {
    val (schema, rows) = governedRows(spark, reg, gov, query, nowMs, rails)
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rows: _*)), schema)
  }

  /** Collected form of [[governed]] — what pg-wire streams to the client.
    * The ACL check runs FIRST: a denied query must not consume an
    * admission token, warm the result cache, or even parse-error its way
    * into different diagnostics (the reference proxy authorizes before
    * forwarding, `proxy.go:150-176`). */
  def governedRows(spark: SparkSession, reg: TopicRegistry, gov: Governor,
      query: String, nowMs: Long = System.currentTimeMillis(),
      rails: Guardrails = Guardrails(),
      authorizer: AclAuthorizer = AclAuthorizer.open,
      onGroup: String => Unit = _ => ())
      : (org.apache.spark.sql.types.StructType, Array[org.apache.spark.sql.Row]) = {
    authorizer.check(query)
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
      gov.cachedOrRunRows(gov.cacheKey(query, bounds), cacheable) {
        gov.withTimeout(spark, onGroup = onGroup) {
          val df = Planner.plan(spark, reg, stmt, Planner.Env(nowMs, rails))
          (df.schema, df.collect())
        }
      }
    }
  }
}
