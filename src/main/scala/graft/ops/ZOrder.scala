package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for min/max
  * pruning (the Delta/Iceberg `OPTIMIZE ZORDER BY` technique).
  *
  * A single-column sort gives perfect file-level min/max pruning on that
  * column and none on any other. Interleaving the bits of several columns'
  * normalized ranks orders rows along a space-filling curve, so each
  * written file covers a small HYPER-RECTANGLE of the key space: a point
  * or range predicate on ANY of the dimensions prunes all files whose
  * min/max envelope misses it — on n files a point predicate keeps
  * ~sqrt(n) files for 2 dims instead of all n. At 100 TB this decides
  * whether a selective two-dimension query opens terabytes or gigabytes:
  * the one-time layout sort (a range-partitioned shuffle, Spark's normal
  * sort machinery) is amortized over every subsequent scan.
  *
  * Everything is integer arithmetic on built-in expressions (bit shifts,
  * masks, integer division) — codegen'd, and bit-for-bit reproducible in
  * any engine, so the curve itself is oracle-checkable.
  */
object ZOrder {

  /** Normalize `x` (with inclusive bounds minC..maxC) to a `bits`-wide
    * bucket: floor((x−min)·(2^bits−1) / (max−min)). Pure long math —
    * identical in any engine with integer division. Degenerate range
    * (min==max) maps to bucket 0. */
  def bucket(x: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val span = maxC - minC
    val top = (1L << bits) - 1
    when(span === 0, lit(0L)).otherwise(
      floor(((x - minC) * lit(top)).cast("double") / span.cast("double")).cast("long"))
  }

  /** Morton-interleave pre-bucketed coordinates: bit i of dimension c
    * lands at position i·n + c. All shifts/masks on longs. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, c) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + c)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Append a `z` column interleaving `dims` (each normalized against its
    * observed min/max, computed in one tiny broadcast aggregate — no
    * driver collect). */
  def withZ(df: DataFrame, dims: Seq[String], bits: Int = 16): DataFrame = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"__min_$d"), max(col(d)).as(s"__max_$d")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(bounds))
    val buckets = dims.map(d =>
      bucket(col(d).cast("long"), col(s"__min_$d").cast("long"),
        col(s"__max_$d").cast("long"), bits))
    joined.withColumn("z", interleave(buckets, bits))
      .drop(dims.flatMap(d => Seq(s"__min_$d", s"__max_$d")): _*)
  }

  /** Cluster into `numFiles` range partitions of the curve and sort within
    * each — the production write path (`repartitionByRange` is Spark's
    * sampled range shuffle: distributed, no global single-task sort).
    * Follow with `.write.parquet(...)`: one output file per partition,
    * each covering a compact z-range ⇒ tight per-file min/max on every
    * interleaved dimension. */
  def cluster(df: DataFrame, dims: Seq[String], numFiles: Int,
      bits: Int = 16): DataFrame =
    withZ(df, dims, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))

  /** DuckDB twin of [[bucket]]+[[interleave]] for oracle SQL, generated
    * from the same parameters so the two engines share one definition. */
  def duckZ(dims: Seq[(String, String, String)], bits: Int): String = {
    val n = dims.size
    val terms = for {
      i <- 0 until bits
      ((x, mn, mx), c) <- dims.zipWithIndex
    } yield {
      val top = (1L << bits) - 1
      val b = s"(CASE WHEN $mx = $mn THEN 0 ELSE " +
        s"CAST(floor(CAST(($x - $mn) * $top AS DOUBLE) / ($mx - $mn)) AS BIGINT) END)"
      s"((($b >> $i) & 1) << ${i * n + c})"
    }
    terms.mkString("(", " | ", ")")
  }
}
