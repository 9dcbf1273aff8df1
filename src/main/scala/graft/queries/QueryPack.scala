package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Omitted oracle → the driver records a weaker rows-only check.
  *
  * Contract details that matter (driver compares by sorted column name, then
  * hashed values):
  *   - alias every computed column identically on both sides;
  *   - every query ends in a deterministic ORDER BY (stable tiebreakers);
  *   - integer SUMs are cast to BIGINT in DuckDB (its SUM(int) is HUGEINT);
  *   - money sums go through DECIMAL(18,2)/(18,4) on both sides so results
  *     are exact, not float-summation-order-dependent.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def entries: Seq[QueryDef]
}
