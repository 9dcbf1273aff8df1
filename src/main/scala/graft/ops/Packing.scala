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

  /** MATERIALIZED packing: the actual fixed-length training rows, not
    * just the per-document assignment. Every token is placed at a global
    * position in its shard's stream (document cumsum + within-document
    * offset) and sequences are the `seqLen`-sized chunks of that stream —
    * a straddling document's tokens really do split across two rows, the
    * concatenate-then-chunk contract.
    *
    * Returns one row per (shard, seq_idx): `n_tokens` (== seqLen for all
    * but each shard's final partial sequence), `n_docs` contributing,
    * and `seq_md5` — the digest of the space-joined token stream in
    * order, which is what makes the materialization auditable: any
    * engine that packs the same corpus the same way reproduces the same
    * digests ([[graft.queries.OpsPack]] `t24_packed_rows` checks them
    * against DuckDB).
    *
    * Scale shape: the document cumsum is the same bounded per-shard
    * window as [[packSequences]]; the token explode is narrow (no
    * shuffle); then ONE hash shuffle on (shard, seq_idx) builds the
    * rows. Peak row width is one sequence (seqLen tokens), never a whole
    * shard or document stream. At 100 TB raise `shards` so the cumsum
    * sort stays in-memory per shard; the final aggregate is skew-free by
    * construction (every group is <= seqLen tokens).
    */
  def packedRows(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int = 1024): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc"))
    val base = docs
      .select(col(idCol).as("doc"),
        (col(idCol) % shards).cast("int").as("shard"),
        split(col(textCol), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    base
      .select(col("doc"), col("shard"), col("tok_start"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("gpos", col("tok_start") + col("pos"))
      .withColumn("seq_idx", expr(s"gpos div $seqLen"))
      .groupBy(col("shard"), col("seq_idx"))
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("doc")).as("n_docs"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("gpos"), col("tok")))),
            _.getField("tok")))).as("seq_md5"))
  }

  /** SFT packing with LOSS MASKS: conversations serialize turn by turn
    * into the concatenate-then-chunk token stream (same layout law as
    * [[packedRows]]), and every token carries its turn's trainable bit —
    * 1 where the loss applies (assistant turns), 0 where it is masked
    * (prompt/user turns). Emits one row per training sequence: token
    * mass, trainable mass, conversations touched, and order-sensitive
    * digests of BOTH the token stream and the mask bits, so a training
    * row and its loss mask are auditable cross-engine byte for byte.
    *
    * Same scale shape as packedRows: one shard-keyed shuffle, per-shard
    * window sort (the order you pay to write shards anyway), in-row
    * digest assembly — never an ordered aggregate over a whole partition.
    * `orderCols` must totally order turns within a conversation. */
  def packWithMasks(turns: DataFrame, convCol: String,
      orderCols: Seq[String], textCol: String, trainableCol: Column,
      seqLen: Int, shards: Int = 1024): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(shards > 0, s"shards must be positive: $shards")
    require(orderCols.nonEmpty, "orderCols must totally order turns")
    val w = Window.partitionBy(col("shard"))
      .orderBy((col("conv") +: orderCols.map(col)): _*)
    val base = turns
      .select((Seq(col(convCol).as("conv"),
        (col(convCol) % shards).cast("int").as("shard"),
        split(col(textCol), " ").as("toks"),
        trainableCol.cast("int").as("trainable")) ++ orderCols.map(col)): _*)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("tok_start",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    base
      .select(col("conv"), col("shard"), col("trainable"), col("tok_start"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("gpos", col("tok_start") + col("pos"))
      .withColumn("seq_idx", expr(s"gpos div $seqLen"))
      .groupBy(col("shard"), col("seq_idx"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("trainable")).cast("long").as("n_train_tokens"),
        countDistinct(col("conv")).as("n_convos"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("gpos"), col("tok")))),
            _.getField("tok")))).as("seq_md5"),
        md5(concat_ws("",
          transform(
            array_sort(collect_list(struct(col("gpos"), col("trainable")))),
            _.getField("trainable").cast("string")))).as("mask_md5"))
  }

  /** T5-style SPAN CORRUPTION (the denoising objective's data prep,
    * Raffel et al. 2020 §3.1.4): mask contiguous token runs, replace each
    * run with a sentinel in the INPUT stream, and emit
    * `sentinel + masked tokens` per run as the TARGET stream.
    *
    * Deterministic block scheme instead of T5's RNG: positions split into
    * fixed blocks of `blockLen`; every FULL block corrupts exactly one
    * `spanLen`-token run whose in-block start is
    * `hash60("doc:block") mod (blockLen − spanLen + 1)` — corruption rate
    * spanLen/blockLen (T5's 15% at 3/20), runs can NEVER overlap (block-
    * local by construction), and every choice is a pure function of
    * (doc, block), so both streams hash-replay on any engine. The
    * trailing partial block stays uncorrupted. Sentinel K is the block
    * index (`<extra_id_K>`), T5's layout.
    *
    * Returns (doc, n_tokens, n_blocks, n_masked, input_md5, target_md5).
    * Scale shape: one token explode (the corpus token stream — the same
    * wide stage every packing op pays) + one per-doc hash aggregate with
    * in-row sort assembly; the mask decision is a per-row map, no join,
    * no window. */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 20, spanLen: Int = 3): DataFrame = {
    require(blockLen > spanLen && spanLen > 0,
      s"need blockLen > spanLen > 0: $blockLen/$spanLen")
    val starts = blockLen - spanLen + 1
    val f = docs
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("toks"))
      .select(col("doc"), size(col("toks")).as("n"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("blk", expr(s"pos div $blockLen"))
      .withColumn("bs", col("blk") * blockLen)
      .withColumn("full", col("bs") + blockLen <= col("n"))
      .withColumn("off", pmod(
        Sketches.hash60(concat(col("doc").cast("string"), lit(":"),
          col("blk").cast("string"))),
        lit(starts.toLong)).cast("int"))
      .withColumn("inrun", col("full") &&
        col("pos") - col("bs") >= col("off") &&
        col("pos") - col("bs") < col("off") + spanLen)
      .withColumn("runstart", col("full") && col("pos") - col("bs") === col("off"))
      .withColumn("sentinel",
        concat(lit("<extra_id_"), col("blk").cast("string"), lit(">")))
    // piece streams as (key, text): input keeps non-run tokens and
    // collapses each run to its sentinel at the run head; target is
    // sentinel-then-masked-tokens per run. key = pos·2 + flag keeps the
    // sentinel (flag 0) ahead of its tokens (flag 1) at the same pos.
    val inputItem = when(!col("inrun"),
        struct((col("pos") * 2).as("k"), col("tok").as("piece")))
      .when(col("runstart"),
        struct((col("pos") * 2).as("k"), col("sentinel").as("piece")))
    val targetSentinel = when(col("runstart"),
      struct((col("pos") * 2).as("k"), col("sentinel").as("piece")))
    val targetTok = when(col("inrun"),
      struct((col("pos") * 2 + 1).as("k"), col("tok").as("piece")))
    // collect_list drops the nulls the otherwise-less `when`s produce
    def digest(items: Column*): Column =
      md5(concat_ws(" ", transform(
        array_sort(flatten(array(items.map(collect_list): _*))),
        _.getField("piece"))))
    f.groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("runstart"), 1L).otherwise(0L)).as("n_blocks"),
        sum(when(col("inrun"), 1L).otherwise(0L)).as("n_masked"),
        digest(inputItem).as("input_md5"),
        digest(targetSentinel, targetTok).as("target_md5"))
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
