package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Bucketing

/** Bucketed co-located join: shuffle paid once at write, joins run
  * Exchange-free afterwards. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-to-fact join plans without a shuffle on either side") {
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    Seq("li_b", "ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.delete)
      }
    }
    Bucketing.writeBucketed(li, "li_b", 8, Seq("l_orderkey"), Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "ord_b", 8, Seq("o_orderkey"), Seq("o_orderkey"))
    // force the fact-to-fact (non-broadcast) shape the utility exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    val joined = Bucketing.table(spark, "li_b")
      .join(Bucketing.table(spark, "ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last // below the agg
    assert(joinSection.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")

    // identical results to the plain (shuffling) join
    val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val got = joined.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expect)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
