package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points joined to the intervals containing them:
  * `p.key = i.key AND p.ts BETWEEN i.start AND i.end` (inclusive bounds).
  *
  * Naive Spark lowers a BETWEEN predicate beside an equi-key to an equi-join
  * whose residual explodes when keys repeat — and with NO equi-key to a
  * BroadcastNestedLoopJoin, which is quadratic and O(corpus) memory. The
  * scale path here is the classic bucketization: slice time into fixed
  * `bucketMs` cells, replicate each interval into the cells it overlaps,
  * give each point its single cell, then equi-join on (key, cell) with the
  * BETWEEN as a residual filter. Each (point, interval) pair can meet in at
  * most one cell — the point's — so no post-join dedup is needed. Work is
  * O(points + intervals · span/bucketMs + matches): pick `bucketMs` near the
  * median interval length so replication stays ~2-3×.
  */
object RangeJoin {

  /** Join `points` to the `intervals` containing them.
    *
    * @param keyCol   equality key on both sides
    * @param tsCol    point timestamp (epoch ms)
    * @param startCol inclusive interval start (epoch ms) on `intervals`
    * @param endCol   inclusive interval end (epoch ms) on `intervals`
    * @param bucketMs bucketization cell width
    */
  def join(points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      bucketMs: Long): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    val iBuckets = intervals.withColumn("_cell",
      explode(sequence((col(startCol) / bucketMs).cast("long"),
        (col(endCol) / bucketMs).cast("long"))))
    val pBuckets = points.withColumn("_cell",
      (col(tsCol) / bucketMs).cast("long"))
    pBuckets.join(iBuckets, Seq(keyCol, "_cell"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_cell")
  }
}
