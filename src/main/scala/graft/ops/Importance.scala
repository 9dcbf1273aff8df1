package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed n-gram importance weighting for data selection — the DSIR
  * family (Data Selection via Importance Resampling, Xie et al. 2023):
  * score every document by how much its hashed-bigram distribution looks
  * like a TARGET domain's, relative to the raw corpus. High scorers are
  * the general-corpus documents "closest" to the domain you want more of;
  * feed the scores into [[Sampling.weightedSample]] to resample.
  *
  * Deterministic integer variant: DSIR proper sums per-gram
  * log-likelihood ratios; logs are libm-dependent in their last ulp, so
  * this implementation uses integer ratio weights instead —
  * `w(b) = ((cnt_target(b)+1) · scale) / (cnt_raw(b)+1)` with truncating
  * division and add-one smoothing, and a document's importance is the
  * truncated mean of its grams' weights. Monotone in the same per-bucket
  * evidence, but exact: every count, product, division, and sum is
  * integer arithmetic, so scores are bit-identical on any engine (the
  * t41 oracle replays the whole scoring relationally in DuckDB).
  *
  * Scale shape: ONE gram explode, projected down to (doc, target?,
  * bucket) — ~16 bytes per gram, no text carried — then eagerly
  * materialized so its two consumers (the bucket-count aggregate and the
  * per-doc scorer) never re-run the explode. The bucket table is
  * `buckets` rows regardless of corpus size (that is the point of
  * HASHED n-grams: 10^4 buckets stand in for 10^9 distinct grams) and
  * broadcasts onto the gram stream; per-doc scoring is one map-side-
  * combined aggregate. Total: two passes over the gram stream, zero
  * corpus-sized shuffles beyond the per-doc combine.
  */
object Importance {

  /** Per-document importance scores against a target subset.
    *
    * @param isTarget predicate over `docs` columns marking the target
    *                 domain (e.g. `col("source") === "wiki"`)
    * @return (doc, n_grams, importance) — importance in `scale` units
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024,
      scale: Long = 1000000L): DataFrame = {
    val words = col("_w")
    val cnt = size(words) - 1
    // NON-distinct bigrams: DSIR counts token instances, a multiset —
    // array_distinct here (the dedup shingle convention) would be wrong
    val grams = when(cnt >= 1,
      transform(sequence(lit(1), greatest(cnt, lit(1))),
        i => concat(element_at(words, i), lit(" "), element_at(words, i + 1))))
      .otherwise(array().cast("array<string>"))
    val g = docs
      .select(col(idCol).as("doc"), isTarget.as("tgt"),
        split(col(textCol), " ").as("_w"))
      .select(col("doc"), col("tgt"), explode(grams).as("g"))
      .select(col("doc"), col("tgt"),
        pmod(Sketches.hash60(col("g")), lit(buckets.toLong)).as("bucket"))
      .localCheckpoint()
    val stats = g.groupBy(col("bucket"))
      .agg(count(lit(1)).as("raw"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("t"))
    g.join(broadcast(stats), "bucket")
      .select(col("doc"),
        expr(s"((t + 1) * $scale) div (raw + 1)").as("wgt"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_grams"), sum(col("wgt")).as("sw"))
      .select(col("doc"), col("n_grams"),
        expr("sw div n_grams").as("importance"))
  }
}
