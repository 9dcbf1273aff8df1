package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kfs._

/** Storage-partitioned joins over co-partitioned KFS topics: with
  * `copartitioned=true` the scan reports KeyGroupedPartitioning over
  * `_partition`, so a join whose keys include `_partition` runs with zero
  * shuffle on either side — the Kafka-Streams co-partitioning model as a
  * Spark plan property. */
class KfsSpjSpec extends AnyFunSuite {
  import TestSpark._

  private def mkTopic(root: String, topic: String, valueTag: String): Unit =
    (0 until 3).foreach { p =>
      // co-partitioning contract: key k lives in partition hash(k) mod 3 —
      // here keys are chosen per partition directly
      val recs = (0 until 40).map { i =>
        KfsCodec.Record(i.toLong, 1706000000000L + i * 1000L,
          s"user-$p-${i % 5}".getBytes("UTF-8"),
          s"""{"tag":"$valueTag","n":$i}""".getBytes("UTF-8"), Nil)
      }
      KfsLayout.writeSegment(root, topic, p, recs.take(20))
      KfsLayout.writeSegment(root, topic, p, recs.drop(20).map(r => r.copy()))
    }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case _: ShuffleExchangeExec => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
      }.sum
    walk(df.queryExecution.executedPlan)
  }

  test("co-partitioned topic join plans with zero shuffles and exact results") {
    val left = Files.createTempDirectory("kfs_spj_l").toString
    val right = Files.createTempDirectory("kfs_spj_r").toString
    mkTopic(left, "clicks", "l")
    mkTopic(right, "views", "r")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      def rd(root: String) = spark.read.format("kfs")
        .option("path", root).option("copartitioned", "true").load()
      val l = rd(left).select(col("_partition").as("lp"),
        col("_key").cast("string").as("lk"), col("_offset").as("lo"))
      val r = rd(right).select(col("_partition").as("rp"),
        col("_key").cast("string").as("rk"), col("_offset").as("ro"))
      val joined = l.join(r,
        col("lp") === col("rp") && col("lk") === col("rk") &&
          col("lo") === col("ro"))
        .groupBy(col("lp")).agg(count(lit(1)).as("n"))
      assert(shuffles(joined) == 0,
        s"expected shuffle-free SPJ plan:\n${joined.queryExecution.executedPlan}")
      // 40 offsets/partition, keys repeat every 5 → same key+offset matches 1:1
      val rows = joined.collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
      assert(rows == Map(0 -> 40L, 1 -> 40L, 2 -> 40L))
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("key-grouped aggregation on _partition also skips the exchange") {
    val root = Files.createTempDirectory("kfs_spj_agg").toString
    mkTopic(root, "t", "x")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val df = spark.read.format("kfs").option("path", root)
        .option("copartitioned", "true").load()
        .where(length(col("_value")) > 0) // record-level residual: no agg pushdown
        .groupBy(col("_partition")).agg(count(lit(1)).as("n"))
      assert(shuffles(df) == 0,
        s"expected exchange-free agg:\n${df.queryExecution.executedPlan}")
      assert(df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
        Map(0 -> 40L, 1 -> 40L, 2 -> 40L))
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
  }

  test("without the option the scan reports unknown partitioning (per-segment parallelism)") {
    val root = Files.createTempDirectory("kfs_spj_off").toString
    mkTopic(root, "t", "x")
    val df = spark.read.format("kfs").option("path", root).load()
      .groupBy(col("_partition")).agg(sum(col("_offset")).as("s"))
    // plain scans shuffle for the aggregate (and keep 6 segment tasks)
    assert(shuffles(df) > 0)
  }
}
