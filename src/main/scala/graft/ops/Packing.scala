package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining pipelines: assign every document a
  * position in a stream of fixed-length training sequences
  * ("concatenate-then-chunk" packing — the standard way corpora become
  * seqLen-token training rows).
  *
  * The layout is DETERMINISTIC and engine-portable: documents are
  * sharded by `doc_id mod shards`, ordered by id within their shard, and
  * token offsets are a running sum — so an oracle (or a re-run after
  * failure) reproduces the exact same packing, which is what makes packed
  * corpora auditable. Token counts use the whitespace tokenizer by
  * default ([[TextAnalysis.tokenCount]] semantics) — swap `tokens` for a
  * BPE estimate when packing for a real tokenizer.
  *
  * Scale shape: ONE hash shuffle on the shard key, then a per-shard
  * window cumsum (sort bounded by shard size, all shards in parallel) —
  * never a global sort. `shards` bounds both the sort width and the
  * packing parallelism; at 100 TB raise it so each shard holds a few GB.
  * A document whose tokens cross a sequence boundary straddles into the
  * next sequence (`straddles` flag) — callers either split those at
  * training time or re-pack them, both standard.
  */
object Packing {

  /** Per-document packing assignment:
    * shard, n_tokens, tok_start (offset in the shard's token stream),
    * seq_idx (sequence the doc STARTS in), pos_in_seq, straddles. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int = 1024,
      tokens: Column => Column = c => size(split(c, " "))): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs
      .select(col(idCol), (col(idCol) % shards).cast("int").as("shard"),
        tokens(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_idx", (col("tok_start") / seqLen).cast("long"))
      .withColumn("pos_in_seq", (col("tok_start") % seqLen).cast("long"))
      .withColumn("straddles",
        col("pos_in_seq") + col("n_tokens") > seqLen)
  }

  /** Per-sequence summary — what a packing audit reads: how many docs
    * start in each sequence, their token mass, and how many straddle out. */
  def sequenceStats(packed: DataFrame, idCol: String): DataFrame =
    packed.groupBy(col("shard"), col("seq_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))
}
