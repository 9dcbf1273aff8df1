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
    oracle: Option[String],
    /** Optional fixture-seeding phase for composed queries (estate writes,
      * checkpoint drains that only stage inputs). Runs before `fn` and is
      * timed SEPARATELY by the bench (`seed_s` vs `exec_s` in
      * BENCH_FULL.json) so harness setup cost never masquerades as operator
      * cost. Must be idempotent: `fn` may also invoke it defensively, and
      * the driver's composed entry point runs seed-then-fn every time. */
    seed: Option[(SparkSession, String) => Unit] = None,
    /** Scale-factor pin for oracles frozen against one fixture (e.g. t22's
      * BPE merge table trained at sf0.01): the sf-dir basename the oracle
      * is valid for. Verify OMITS a pinned oracle when dumping at any other
      * SF — with a loud diagnostic — so a run at the wrong scale records a
      * rows-only check instead of a spurious hash mismatch. */
    oracleSfPin: Option[String] = None)

trait QueryPack {
  def entries: Seq[QueryDef]
}
