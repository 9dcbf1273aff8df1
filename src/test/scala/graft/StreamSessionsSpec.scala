package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSessions
import graft.streaming.StreamSessions.Sess

class StreamSessionsSpec extends AnyFunSuite {
  import TestSpark._

  test("merge coalesces under session_window gap semantics") {
    // strict half-open: an event exactly gap after the end starts anew
    assert(StreamSessions.merge(Nil, Seq(0L, 10L, 40L), gapMs = 30) ==
      List(Sess(0, 10, 2), Sess(40, 40, 1)))
    // a late event bridges two open sessions into one
    assert(StreamSessions.merge(
      List(Sess(0, 10, 2), Sess(100, 100, 1)), Seq(75L), gapMs = 30) ==
      List(Sess(0, 10, 2), Sess(75, 100, 2)))
    // a late event may open a NEW earlier session without touching others
    assert(StreamSessions.merge(
      List(Sess(100, 100, 1)), Seq(0L), gapMs = 30) ==
      List(Sess(0, 0, 1), Sess(100, 100, 1)))
  }

  test("streaming sessions equal the batch twin; idle keys close via timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val t0 = 1706000000000L
    def ts(ms: Long) = new Timestamp(t0 + ms)

    val out = StreamSessions.sessionize(
      in.toDF().toDF("key", "ts"), "key", "ts",
      gapMs = 30000, watermarkDelay = "5 seconds")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      val real = Seq(
        ("u1", ts(0)), ("u1", ts(10000)),  // session 1 of u1
        ("u1", ts(100000)),                // session 2 of u1
        ("u2", ts(5000)))                  // session 1 of u2
      in.addData(real: _*)
      q.processAllAvailable()
      // no further data for u1/u2: their sessions must close via the
      // EVENT-TIME TIMEOUT path once the sentinel advances the watermark
      in.addData(("zz", ts(10000000)))
      q.processAllAvailable()

      val streamed = spark.table("sess").as[StreamSessions.SessionOut]
        .collect().toSet
      val batch = StreamSessions.sessionizeBatch(
        real.toDF("key", "ts"), "key", "ts", gapMs = 30000)
        .collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(
        StreamSessions.SessionOut("u1", t0, t0 + 10000, 2),
        StreamSessions.SessionOut("u1", t0 + 100000, t0 + 100000, 1),
        StreamSessions.SessionOut("u2", t0 + 5000, t0 + 5000, 1)))
    } finally q.stop()
  }
}
