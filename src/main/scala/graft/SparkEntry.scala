package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries._

/** Driver contract — see SURVEY.md §7 and the query packs under
  * [[graft.queries]]. Every operator in SURVEY §2 (plus the LLM-data-pipeline
  * superset) registers one entry in [[queries]] and, when ANSI-SQL
  * expressible, a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalPack,
    KfsPack,
    KafsqlPack,
    DedupPack,
    OpsPack,
    EtlPack,
    StreamPack
  )

  private lazy val defs: Seq[QueryDef] = packs.flatMap(_.entries)

  /** Flagship query on sf=0.001 (user-guide.md:236-238 shape); driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tables.eventsTopic(spark, "/root/testdata/sf0.001")
      .groupBy(col("_partition"))
      .agg(count(lit(1)).as("cnt"), max(col("_ts_ms")).as("latest_ms"))
      .orderBy(col("_partition"))

  /** One entry per implemented operator from SURVEY.md §2. Entries with a
    * declared seed phase compose seed-then-query so the driver contract is
    * unchanged; the bench times the phases separately via [[queryDefs]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { d =>
      d.name -> { (s: SparkSession, dir: String) =>
        d.seed.foreach(_(s, dir)); d.fn(s, dir)
      }
    }.toMap

  /** Full definitions incl. the optional seed phase (bench timing split). */
  def queryDefs: Seq[QueryDef] = defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
