package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution / record linkage): find
  * document pairs whose TEXT is within an edit-distance budget, without
  * ever forming the all-pairs cross product.
  *
  * Classic two-stage shape:
  *   1. BLOCKING — each record maps to a deterministic block key; only
  *      same-block pairs become candidates (the recall/cost dial, exactly
  *      like LSH banding in [[Dedup]]).
  *   2. VERIFY — exact Levenshtein on the candidates only (codegen'd
  *      built-in in both Spark and DuckDB, so the oracle reproduces the
  *      distances bit-for-bit).
  *
  * Scale shape: one hash shuffle on the block key; within-block pair
  * generation is quadratic PER BLOCK, so blocks are capped
  * (`maxBlockSize`, the same job-killer guard as `Dedup`'s posting-list
  * DF cap) — an over-full block is boilerplate by definition and is
  * dropped rather than exploded. Verification cost is bounded by
  * `verifyPrefixLen²` per pair regardless of document length.
  */
object EntityResolution {

  /** Normalized match text: lowered, trimmed, whitespace-collapsed. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), " +", " ")

  /** Block key: the first `prefixLen` chars of the normalized text. Edits
    * past the prefix never change the block, so copies with tail edits
    * always collide; head-edited copies are the documented recall miss
    * (add a second pass on a different key — e.g. a suffix or sorted-token
    * key — exactly as multi-band LSH does). */
  def blockKey(text: Column, prefixLen: Int = 8): Column =
    substring(normalize(text), 1, prefixLen)

  /** Candidate pairs (a < b) sharing a block, verified by Levenshtein on
    * the first `verifyPrefixLen` normalized chars: kept when
    * `lev <= maxRelDist · max(len_a, len_b)` (lengths also prefix-capped).
    * Emits `a, b, lev, rel` with `rel` rounded 4dp. */
  def matchPairs(docs: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 8, verifyPrefixLen: Int = 200,
      maxRelDist: Double = 0.2,
      maxBlockSize: Int = 1000): DataFrame = {
    require(maxBlockSize > 1, s"maxBlockSize must exceed 1: $maxBlockSize")
    val norm = docs.select(col(idCol).as("doc"),
      substring(normalize(col(textCol)), 1, verifyPrefixLen).as("t"))
      .withColumn("blk", substring(col("t"), 1, prefixLen))
    // cap: per-block size via an unordered window count — rides the SAME
    // hash shuffle on blk the self-join needs (no second scan, and no
    // broadcast of a block table that scales with the corpus)
    val bounded = norm
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("blk"))))
      .where(col("bn") <= maxBlockSize)
    val l = bounded.select(col("blk"), col("doc").as("a"), col("t").as("ta"))
    val r = bounded.select(col("blk"), col("doc").as("b"), col("t").as("tb"))
    // The edit distance dominates this operator's cost, so it is doubly
    // bounded WITHOUT changing the result set:
    //   1. length prefilter — lev(a,b) >= |len(a)-len(b)|, so pairs whose
    //      length gap alone exceeds the budget never run the DP;
    //   2. banded DP — the worst admissible distance is
    //      maxRelDist * verifyPrefixLen, so the threshold form computes an
    //      O(len * band) stripe and returns -1 (filtered) beyond it,
    //      instead of the full O(len^2) matrix per pair.
    val band = math.ceil(maxRelDist * verifyPrefixLen).toInt + 1
    val shufflePartitions =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Candidate pairs are tiny in BYTES but heavy in CPU (a DP stripe
    // each), and a popular block's pairs all land in ONE join partition —
    // so the pair set is round-robin repartitioned before the DP and
    // PINNED there with an eager localCheckpoint (the nearDuplicates
    // pattern). The checkpoint is load-bearing twice over: without it the
    // optimizer pushes the lev filter back below the repartition (running
    // the whole DP serially inside the skewed block partition — measured
    // 5.2s vs 1s at sf0.1) and inlines the lev expression into each of
    // its two predicate references, doubling the DP.
    val pairs = l.join(r, "blk").where(col("a") < col("b"))
      .withColumn("mx", greatest(length(col("ta")), length(col("tb"))))
      .where(abs(length(col("ta")) - length(col("tb"))) <= lit(maxRelDist) * col("mx"))
      .repartition(shufflePartitions)
      .localCheckpoint()
    pairs
      .withColumn("lev", levenshtein(col("ta"), col("tb"), band))
      .where(col("lev") >= 0 && col("lev") <= lit(maxRelDist) * col("mx"))
      .select(col("a"), col("b"), col("lev").cast("long").as("lev"),
        round(col("lev") / col("mx"), 4).as("rel"))
  }
}
