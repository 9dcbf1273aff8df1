package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score outlier detection for ingest monitoring (the "did a
  * producer start emitting garbage" check a pipeline runs next to its
  * sink): each value is tested against the mean/variance of the previous
  * `n` values of ITS OWN key. Flags, not filters — quarantine decisions
  * belong to the caller (same posture as the dead-letter queue).
  *
  * Cross-engine exactness: a float z-score computed via stddev differs
  * between engines (Welford vs naive accumulation), which can flip flags
  * at the boundary. For integer-valued metrics the test
  * `|v − mean| > z·stddev` cross-multiplies into pure integer arithmetic:
  * with s = Σ prior, q = Σ prior², the flag is
  * `(n·v − s)² · (n−1)  >  z² · n · (n·q − s²)`
  * — every term exact, so the SAME rows flag in any engine, no rounding
  * guard, no epsilon. The terms are carried as DECIMAL(38,0), not BIGINT:
  * both sides are O(z²n³·v²), so 64-bit longs would wrap SILENTLY at
  * |v| ≈ √(2⁶³/z²n³) ≈ 5·10⁷ for the defaults — byte counters and
  * epoch-millis timestamps (the realistic garbage-detector inputs) blow
  * that instantly, and a wrapped comparison flags pseudo-random rows. 38
  * exact decimal digits push the bound to |v| ≈ 7·10¹⁶, and inputs beyond
  * it degrade to SQL NULL (→ not flagged) instead of wrapping.
  *
  * 100 TB shape: one window over (key, order) — the per-key shuffle +
  * per-shard sort the layout pays anyway; frames are `n` rows, state never
  * grows with history. No global sort, no second pass.
  */
object Anomaly {

  /** Append `n_prior`, `lhs`, `rhs`, `is_anomaly` to `df`. A row is tested
    * only when a FULL window of `n` prior values exists (`n_prior = n`);
    * earlier rows carry `is_anomaly = false` (cold start is not evidence).
    * `valCol` must be integral — the exactness contract above. */
  def rollingZ(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: String, n: Int, z: Int): DataFrame = {
    require(n >= 2, s"window must have at least 2 prior values, got $n")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol)).rowsBetween(-n, -1)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val v = col(valCol).cast(dec)
    val nn = lit(n.toLong).cast(dec)
    df.withColumn("_s", sum(v).over(w).cast(dec))
      .withColumn("_q", sum(v * v).over(w).cast(dec))
      .withColumn("n_prior", count(v).over(w))
      .withColumn("lhs",
        ((nn * v - col("_s")) * (nn * v - col("_s")) *
          lit((n - 1).toLong).cast(dec)).cast(dec))
      .withColumn("rhs",
        (lit(z.toLong * z).cast(dec) * nn *
          (nn * col("_q") - col("_s") * col("_s"))).cast(dec))
      .withColumn("is_anomaly",
        col("n_prior") === n && col("lhs") > col("rhs"))
      .drop("_s", "_q")
  }
}
