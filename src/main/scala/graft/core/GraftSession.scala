package graft.core

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for the graft engine.
  *
  * Local harness: `local("local[32]")`. On a real cluster, apply
  * [[clusterConf]] to spark-submit / SparkConf — the knobs that matter at
  * 100 TB and why:
  *
  *   - `spark.sql.adaptive.enabled` + skew-join: runtime re-planning for
  *     the shapes static stats get wrong (default-on in Spark 4; pinned
  *     here for documentation).
  *   - `spark.sql.shuffle.partitions`: start at ~2–3× total cores; AQE
  *     coalesces down, so over-provisioning is the safe direction.
  *   - `coalescePartitions.parallelismFirst=false` (docs-recommended):
  *     coalesce by the advisory partition size, not the default
  *     parallelism — otherwise tiny shuffles still schedule one task per
  *     core and iterative/multi-stage jobs pay pure scheduling overhead.
  *   - `spark.sql.files.maxPartitionBytes` 256m: fewer, larger scan tasks —
  *     parquet footers and S3 requests amortize better; KFS segments are
  *     already task-sized by the flush policy.
  *   - `spark.sql.session.timeZone=UTC`: the engine's timestamp contract.
  *   - `spark.sql.legacy.parquet.nanosAsLong`: the driver testdata carries
  *     ns timestamps (harness-only concern).
  *   - `spark.sql.extensions=graft.plans.GraftExtensions`: SQL access to
  *     the custom expressions.
  */
object GraftSession {

  val clusterConf: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
    "spark.sql.files.maxPartitionBytes" -> "268435456",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")

  def local(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
    clusterConf.foreach { case (k, v) => b.config(k, v) }
    // harness-only (not in clusterConf): no-fork local FS — see BareLocalFs
    BareLocalFs.sparkConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
