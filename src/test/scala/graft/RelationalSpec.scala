package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.Tables

/** Shared local session for all graft specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  test("events topic exposes the 8 implicit columns with dense offsets") {
    val df = Tables.eventsTopic(spark, sf)
    val cols = df.columns.toSet
    for (c <- Seq("_topic", "_partition", "_offset", "_ts", "_key", "_value",
        "_headers", "_segment"))
      assert(cols.contains(c), s"missing $c")
    // offsets dense per partition: max = count - 1
    val stats = df.groupBy("_partition")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.max("_offset").as("m"))
      .collect()
    assert(stats.length == Tables.TopicPartitions)
    stats.foreach(r => assert(r.getAs[Long]("m") == r.getAs[Long]("n") - 1))
  }

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name returned negative count")
      withClue(s"$name should return rows: ") { assert(n > 0 || name.startsWith("x_")) }
    }
  }

  test("entry flagship returns one row per partition") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == Tables.TopicPartitions)
    assert(rows.map(_.getAs[Long]("cnt")).sum == 1000L)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("join WITHIN band is inclusive |dt| <= w (reference server.go:2358-2384)") {
    val j = SparkEntry.queries("j1_join_within")(spark, sf)
    val dts = j.select("dt_ms").collect().map(_.getLong(0))
    assert(dts.forall(d => math.abs(d) <= 6L * 3600000L))
  }

  test("tail returns last 10 in partition-major scan order") {
    val t = SparkEntry.queries("p6_tail")(spark, sf).collect()
    assert(t.length == 10)
    // all rows from the tail of the scan: partition 3 has 250 records at sf0.001
    assert(t.forall(_.getAs[Int]("_partition") == 3))
    assert(t.map(_.getAs[Long]("_offset")).max == 249)
  }
}
