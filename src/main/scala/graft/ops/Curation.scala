package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition curation: per-source caps.
  *
  * Web-scale training corpora bound how much any single origin (domain,
  * crawl host, source feed) may contribute — the C4/RefinedWeb "don't let
  * one forum dominate the corpus" rule. The selection must be DETERMINISTIC
  * (reruns and audits pick the same documents, independent of partitioning
  * and cluster size), so the per-source priority is a hash of the document
  * identity, not `rand()`.
  *
  * Scale shape: ONE hash shuffle on the source key. The rank filter
  * compiles to `WindowGroupLimit` (Spark 3.5+): every map task pre-limits
  * its rows to the cap per key BEFORE the exchange, so the shuffle carries
  * at most `cap × sources × tasks` rows, not the corpus — on a 100 TB
  * crawl where one domain holds 10⁹ pages and the cap is 10⁵, the hot
  * key's data never converges on one reducer at full size. No global sort
  * anywhere; per-key ordering cost is bounded by the cap after the partial
  * limit.
  */
object Curation {

  /** Deterministic per-document priority within its key: md5 of
    * "key|id" — uniform, engine-portable (DuckDB computes the identical
    * hex), and independent of physical row order. */
  def priority(key: Column, id: Column): Column =
    md5(concat_ws("|", key.cast("string"), id.cast("string")))

  /** Keep at most `cap` documents per `keyCol`, chosen by hash priority
    * (ties broken by id — md5 collisions are negligible but the layout
    * must still be total). Adds `src_rank` (1-based) to the survivors. */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(priority(col(keyCol), col(idCol)), col(idCol))
    df.withColumn("src_rank", row_number().over(w))
      .where(col("src_rank") <= cap)
  }

  /** Per-key audit of a capping pass: how much each source contributed
    * before/after. `capPerKey` survivors re-aggregated in the same shuffle
    * key, so the audit adds no new exchange beyond its own aggregate. */
  def capAudit(df: DataFrame, idCol: String, keyCol: String,
      cap: Int): DataFrame = {
    val kept = capPerKey(df, idCol, keyCol, cap)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_kept"),
        sum(col(idCol)).as("kept_id_sum"),
        min(col(idCol)).as("min_kept"),
        max(col(idCol)).as("max_kept"))
    val totals = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_total"))
    totals.join(kept, keyCol)
      .select(col(keyCol), col("n_total"), col("n_kept"),
        col("kept_id_sum"), col("min_kept"), col("max_kept"))
  }
}
