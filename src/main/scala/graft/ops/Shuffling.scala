package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Epoch-deterministic global corpus shuffle (beyond-reference superset):
  * the permutation a training dataloader reads — every document gets a
  * (shard, pos) for each epoch, and the whole layout is a pure function of
  * (epoch, doc id). No RNG state anywhere:
  *
  *   - **Reproducible anywhere**: the rank is `md5(epoch + ":" + id)` — any
  *     engine (Spark, DuckDB, Python) recomputes the identical permutation,
  *     so a resumed run, an audit, or a different cluster reads the corpus
  *     in exactly the same order (same property as [[Sampling]]).
  *   - **Fresh permutation per epoch**: the epoch is folded into the hash,
  *     so each epoch is an independent full reshuffle — no cross-epoch
  *     correlation, the property multi-epoch training wants.
  *   - **Stable under retry/repartition**: no seed-per-task; a recomputed
  *     partition lands every row in the same (shard, pos).
  *
  * Scale shape: shard = 16 bits of the rank mod `shards` — uniform in
  * expectation with no global sort; `pos` is a per-shard window sort over
  * the rank, which is exactly the sort you pay anyway to WRITE each shard
  * file in read order (bounded by shard size, all shards in parallel —
  * pick `shards` so one shard fits an executor). The audit digest is a
  * position-sensitive but COMMUTATIVE sum of per-row hashes, so verifying
  * a 100 TB layout is a plain hash aggregate — never an ordered string
  * aggregation over a whole shard.
  */
object Shuffling {

  /** Hex rank of a document for one epoch — the shuffle key. */
  def epochRank(id: Column, epoch: Column): Column =
    md5(concat_ws(":", epoch.cast("string"), id.cast("string")))

  /** Assign every row its (epoch, shard, pos) for one epoch's read order.
    * Keeps all input columns; adds `epoch`, `rank`, `shard`, `pos`. */
  def assign(df: DataFrame, idCol: String, epoch: Int, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("rank"), col(idCol))
    df
      .withColumn("epoch", lit(epoch))
      .withColumn("rank", epochRank(col(idCol), lit(epoch)))
      .withColumn("shard",
        (conv(substring(col("rank"), 1, 4), 16, 10).cast("long") % shards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }

  /** Per-(epoch, shard) audit manifest: row count plus a position-sensitive
    * digest — the sum of `hash60(pos + ":" + id)` over the shard, in
    * DECIMAL(38,0) so it is exact at any corpus size. Any engine that lays
    * the epoch out identically reproduces the digest; a single moved,
    * dropped, or re-ordered document changes it. */
  def shardManifest(assigned: DataFrame, idCol: String): DataFrame =
    assigned
      .groupBy(col("epoch"), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(conv(substring(
          md5(concat_ws(":", col("pos"), col(idCol).cast("string"))), 1, 15),
          16, 10).cast("decimal(38,0)")).as("digest"))
}
