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

  private def quantize(vecCol: Column, dims: Int, scale: Long): Column =
    array((0 until dims).map(d =>
      round(vecCol.getItem(d) * scale).cast("long")): _*)

  /** Squared integer distance to each center + argmin with smallest-id
    * tie-break (`<=` chains). */
  private def assignExpr(centers: Array[Array[Long]], dims: Int): Column = {
    val dists = centers.map { c =>
      (0 until dims).map { d =>
        val diff = col("q").getItem(d) - lit(c(d))
        diff * diff
      }.reduce(_ + _)
    }
    val k = centers.length
    (0 until k - 1).foldRight(lit(k - 1): Column) { (p, rest) =>
      when((p + 1 until k).map(o => dists(p) <= dists(o)).reduce(_ && _),
        lit(p)).otherwise(rest)
    }
  }

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
        val assigned = qdf.withColumn("cluster", assignExpr(centers, dims))
        val stats = assigned
          .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "v")))
          .groupBy(col("cluster"), col("dim"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
        centers = Array.tabulate(k, dims) { (p, d) =>
          stats.get((p, d)) match {
            case Some((s, n)) => s / n // truncating (== SQL integer div)
            case None => centers(p)(d) // empty cluster keeps its center
          }
        }
      }
      (qdf.withColumn("cluster", assignExpr(centers, dims))
        .select(col(idCol), col("cluster")), centers)
    } finally qdf.unpersist()
  }
}
