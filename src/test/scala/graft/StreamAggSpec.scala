package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamAggs, StreamDedup}

class StreamAggSpec extends AnyFunSuite {
  import TestSpark._

  test("tumbling watermarked counts emit closed windows once, drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val t0 = 1706000000000L // window-aligned epoch base
    def ts(ms: Long) = new Timestamp(ms)

    val agg = StreamAggs.tumblingCounts(
      in.toDF().toDF("key", "ts", "value"),
      windowDur = "10 seconds", watermarkDelay = "5 seconds")
    val q = agg.writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      in.addData(("a", ts(t0 + 1000), 1.0), ("a", ts(t0 + 2000), 2.0),
        ("b", ts(t0 + 3000), 3.0))
      q.processAllAvailable()
      // advance watermark beyond the first window's end + delay
      in.addData(("a", ts(t0 + 30000), 9.0))
      q.processAllAvailable()
      // late arrival for the already-closed first window: must be dropped
      in.addData(("a", ts(t0 + 1500), 100.0))
      q.processAllAvailable()
      in.addData(("a", ts(t0 + 60000), 9.0)) // close everything else
      q.processAllAvailable()

      val rows = spark.table("tumble").collect()
        .map(r => (r.getAs[String]("key"),
          r.getAs[Timestamp]("win_start").getTime,
          r.getAs[Long]("cnt"), r.getAs[Double]("sum_v")))
      val firstWindow = rows.filter(_._2 == t0)
      assert(firstWindow.toSet ==
        Set(("a", t0, 2L, 3.0), ("b", t0, 1L, 3.0))) // late row NOT counted
    } finally q.stop()
  }

  test("streaming exact dedup keeps first record per content hash in horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val t0 = 1706000000000L
    def ts(ms: Long) = new Timestamp(ms)

    val out = StreamDedup.exactByContent(
      in.toDF().toDF("id", "ts", "text"),
      "text", "ts", watermarkDelay = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // same content (modulo case/trim normalization) arrives three times
      // inside the horizon; a distinct doc arrives once
      in.addData(
        (1L, ts(t0), "the quick brown fox"),
        (2L, ts(t0 + 1000), "THE QUICK BROWN FOX  "),
        (3L, ts(t0 + 2000), "something else entirely"))
      q.processAllAvailable()
      in.addData((4L, ts(t0 + 3000), "the quick brown fox"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L), s"got $ids")

      // beyond the watermark horizon the state is evicted: the same content
      // is admitted again (bounded state, not forever-dedup)
      in.addData((5L, ts(t0 + 60000), "advance watermark"))
      q.processAllAvailable()
      in.addData((6L, ts(t0 + 61000), "the quick brown fox"))
      q.processAllAvailable()
      val ids2 = spark.table("sdedup").collect().map(_.getLong(0)).toSet
      assert(ids2.contains(6L), s"got $ids2")
    } finally q.stop()
  }
}
