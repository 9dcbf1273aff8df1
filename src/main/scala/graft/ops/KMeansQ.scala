package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic QUANTIZED k-means over embedding columns — corpus
  * clustering for topic balancing / semantic-dedup grouping, built so the
  * result is bit-identical on ANY engine (the t36 oracle replays the whole
  * fit relationally in DuckDB):
  *
  *   - vectors quantize once to integers (`round(v · scale)` as long) —
  *     the SQ8 trick one level up: every subsequent computation is exact
  *     integer arithmetic, so nothing depends on float summation order
  *     (a plain float k-means is NOT reproducible across engines: per-
  *     cluster means sum doubles in partition order);
  *   - initial centers are data-independent md5-nibble integers (same
  *     determinism family as the LSH planes / synthetic vectors);
  *   - assignment = argmin of exact integer squared distance, ties to the
  *     smallest cluster id; means divide truncating toward zero (the SQL
  *     integer-division convention, so `s // n` matches verbatim); empty
  *     clusters keep their previous center.
  *
  * Scale shape: per iteration one narrow assignment map (distances are
  * codegen'd expressions over plan-literal centers — no join, no
  * broadcast-of-data) plus one k·dims-row aggregate collected to the
  * driver for the center update. At 100 TB the per-iteration cost is a
  * map + one tiny hash aggregate; centers are always plan literals, never
  * a shuffled side. */
object KMeansQ {

  /** Initial center for (cluster p, dim d): `(2·nibble(md5("c|p|d")) − 15)
    * · scale/32` — integer, data-independent, engine-recomputable; the
    * /32 puts the spread at ±0.47·scale, inside the unit-ish range of
    * normalized embeddings so every center starts with a catchment (a
    * spread far outside the data collapses the fit to one cluster). */
  def initialCenters(k: Int, dims: Int, scale: Long): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k, dims) { (p, d) =>
      val hex = md.digest(s"c|$p|${d + 1}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (2L * Integer.parseInt(hex.substring(0, 1), 16) - 15L) * (scale / 32)
    }
  }

  /** Fixed-point quantization as a native loop kernel
    * ([[org.apache.spark.sql.graft.QuantizeVec]]): the composable
    * `array(dims × round·cast)` constructor generated ~60 lines per
    * element, and pipelines that evaluate it in more than one stage
    * blew janino's 64 KB method cap (see the kernel's scaladoc). */
  private[ops] def quantize(vecCol: Column, dims: Int, scale: Long): Column =
    org.apache.spark.sql.graft.QuantOps.quantize(vecCol, dims, scale)

  /** k-element score array over a pre-quantized vector column:
    * `|c_p|² − 2·q·c_p` per center — squared distance minus the shared
    * `|q|²` term, so argmin/comparisons over it are exactly squared-
    * distance comparisons in integer arithmetic. A native loop expression
    * ([[org.apache.spark.sql.graft.QuantScores]]): the unrolled
    * `array(k literal dot products)` form inlined k·dims multiply-adds
    * into whichever generated method consumed it, blowing janino's 64 KB
    * cap on the PQ fit's hash aggregate and dropping the hottest loop to
    * interpreted eval. */
  private[ops] def scoresExpr(qCol: Column,
      centers: Array[Array[Long]]): Column =
    org.apache.spark.sql.graft.QuantOps.scores(qCol, centers)

  /** Argmin over a k-element score array column, smallest-index ties —
    * an O(k) native scan ([[org.apache.spark.sql.graft.ArgMinLong]])
    * replacing the O(k²) `when`-chain for the same first-min-wins result. */
  private[ops] def argminExpr(scCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.QuantOps.argmin(scCol)

  /** Attach the argmin-distance `cluster` column (smallest-id ties).
    * Exactness trick that also keeps codegen small: comparing squared
    * distances `|q−c_p|² ≤ |q−c_o|²` is identical (in exact integer
    * arithmetic) to comparing scores `|c_p|² − 2·q·c_p ≤ |c_o|² − 2·q·c_o`
    * — the shared `|q|²` term cancels. So one k-element score array is
    * computed ONCE per row (k·dims multiply-adds) and the argmin chain
    * references its items — an O(k·dims) expression tree instead of the
    * O(k²·dims) tree a naive distance-per-comparison form generates
    * (measured: the 4096-term tree spent more time in janino than in
    * data at k=4, dims=64). */
  private def withAssignment(df: DataFrame,
      centers: Array[Array[Long]], dims: Int): DataFrame =
    df.withColumn("_sc", scoresExpr(col("q"), centers))
      .withColumn("cluster", argminExpr(col("_sc"), centers.length))
      .drop("_sc")

  /** Assign every row to its nearest center (smallest-id ties) under a
    * FIXED center table — the narrow post-fit map (centers are plan
    * literals; no join, no shuffle). Lets a sampled fit label the full
    * corpus. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centers: Array[Array[Long]], dims: Int,
      scale: Long = 1000000L): DataFrame =
    withAssignment(
      df.select(col(idCol), quantize(col(vecCol), dims, scale).as("q")),
      centers, dims)
      .select(col(idCol), col("cluster"))

  /** Fit `iters` rounds and return (assignments, final centers): the
    * assignment frame is (idCol, cluster) under the final centers. */
  def fitPredict(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dims: Int, scale: Long = 1000000L)
      : (DataFrame, Array[Array[Long]]) = {
    val qdf = df.select(col(idCol),
      quantize(col(vecCol), dims, scale).as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centers = initialCenters(k, dims, scale)
      (1 to iters).foreach { _ =>
        val assigned = withAssignment(qdf, centers, dims)
        // One k-row hash aggregate with dims sum buffers (map-side partial,
        // no row explosion): a posexplode would multiply the corpus by
        // `dims` before the shuffle for the same exact long sums.
        val aggs = (0 until dims).map(d =>
          sum(col("q").getItem(d)).as(s"s$d")) :+ count(lit(1)).as("n")
        val stats = assigned.groupBy(col("cluster"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val sums = (0 until dims).map(d => r.getLong(d + 1)).toArray
            r.getInt(0) -> ((sums, r.getLong(dims + 1)))
          }
          .toMap
        centers = Array.tabulate(k, dims) { (p, d) =>
          stats.get(p) match {
            case Some((s, n)) => s(d) / n // truncating (== SQL integer div)
            case None => centers(p)(d) // empty cluster keeps its center
          }
        }
      }
      (withAssignment(qdf, centers, dims)
        .select(col(idCol), col("cluster")), centers)
    } finally qdf.unpersist()
  }

  /** Fit `m` independent k-means — one per contiguous `subDims` slice of
    * `vecCol` — in ONE corpus pass per iteration (the PQ-codebook fit,
    * fused): where the sequential form runs m separate
    * assignment+aggregate jobs per iteration, this computes every
    * subspace's assignment in the same projection, stacks the m narrow
    * (subspace, cluster, sub-vector) tuples per row, and folds them
    * through one m·k-group hash aggregate with subDims+1 buffers —
    * map-side partials collapse the stack immediately, so the shuffle is
    * m·k rows and the codegen stays small (a flat m·k·subDims-buffer
    * global aggregate was measured 2× SLOWER here: janino compile of the
    * 500+-buffer update dominated). The stack multiplies only the narrow
    * subDims-wide payload — the same bytes as the original row, never a
    * dims× explosion. Centers are bit-identical to m sequential
    * [[fitPredict]] calls (same data-independent init, same integer
    * assignment, same truncating-division update; OpsSpec pins the
    * equivalence), so oracles replaying the sequential fit still
    * hash-match. */
  def fitMulti(df: DataFrame, vecCol: String, m: Int, k: Int, iters: Int,
      dims: Int, scale: Long = 1000000L): Seq[Array[Array[Long]]] = {
    val subDims = dims / m
    require(subDims * m == dims, s"dims $dims not divisible by m $m")
    fitMultiSlices(df, i =>
      quantize(slice(col(vecCol), i * subDims + 1, subDims), subDims, scale),
      m, k, iters, subDims, scale)
  }

  /** [[fitMulti]] over an ALREADY-QUANTIZED long-array column — the
    * residual-PQ fit (IVFPQ): residuals are integer differences of
    * quantized vectors, so re-quantizing through the float path would
    * both lose exactness and double-scale. Same init, assignment, and
    * truncating update as [[fitMulti]], so oracles replay it with the
    * identical CTE chain over the residual source. */
  def fitMultiQuantized(df: DataFrame, qVecCol: String, m: Int, k: Int,
      iters: Int, dims: Int, scale: Long = 1000000L): Seq[Array[Array[Long]]] = {
    val subDims = dims / m
    require(subDims * m == dims, s"dims $dims not divisible by m $m")
    fitMultiSlices(df, i => slice(col(qVecCol), i * subDims + 1, subDims),
      m, k, iters, subDims, scale)
  }

  private def fitMultiSlices(df: DataFrame, sliceFor: Int => Column,
      m: Int, k: Int, iters: Int, subDims: Int, scale: Long)
      : Seq[Array[Array[Long]]] = {
    val qdf = df.select((0 until m).map(i => sliceFor(i).as(s"q$i")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val centers = Array.fill(m)(initialCenters(k, subDims, scale))
      (1 to iters).foreach { _ =>
        // score arrays materialize as columns BEFORE the argmin references
        // them (the withAssignment trick): inlining scoresExpr into the
        // argmin's O(k²) comparison sites re-expands the k·subDims
        // multiply-adds at every site — a janino-compile blowup, measured
        // 2-4× slower than the whole aggregate
        val assigned = (0 until m).foldLeft(qdf) { (acc, i) =>
          acc.withColumn(s"_sc$i", scoresExpr(col(s"q$i"), centers(i)))
            .withColumn(s"c$i", argminExpr(col(s"_sc$i"), k))
        }
        val stacked = assigned.select(explode(array((0 until m).map { i =>
          struct(lit(i).as("sub"), col(s"c$i").as("cluster"),
            col(s"q$i").as("qs"))
        }: _*)).as("t"))
          .select(col("t.sub"), col("t.cluster"), col("t.qs"))
        val aggs = (0 until subDims).map(d =>
          sum(col("qs").getItem(d)).as(s"s$d")) :+ count(lit(1)).as("n")
        val stats = stacked.groupBy(col("sub"), col("cluster"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val sums = (0 until subDims).map(d => r.getLong(d + 2)).toArray
            (r.getInt(0), r.getInt(1)) -> ((sums, r.getLong(subDims + 2)))
          }
          .toMap
        for (i <- 0 until m; p <- 0 until k) stats.get((i, p)).foreach {
          case (s, n) => // empty clusters keep their center (no stats row)
            for (d <- 0 until subDims)
              centers(i)(p)(d) = s(d) / n // truncating (== SQL integer div)
        }
      }
      centers.toSeq
    } finally qdf.unpersist()
  }
}
