package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQuota

class StreamQuotaSpec extends AnyFunSuite {
  import TestSpark._

  test("transformWithState quota: running counts persist across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, Long)]
    val out = StreamQuota.enforce(
      in.toDF().toDF("key", "ts_ms"), "key", "ts_ms", quota = 2)
    val q = out.toDF().writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      in.addData(("a", 1L), ("a", 2L), ("b", 1L))
      q.processAllAvailable()
      // second batch: the counter for "a" must resume at 2, not restart
      in.addData(("a", 3L), ("b", 2L), ("b", 3L))
      q.processAllAvailable()

      val rows = spark.table("quota").as[StreamQuota.Admit].collect().toSet
      assert(rows == Set(
        StreamQuota.Admit("a", 1L, 1, admitted = true),
        StreamQuota.Admit("a", 2L, 2, admitted = true),
        StreamQuota.Admit("a", 3L, 3, admitted = false), // over quota
        StreamQuota.Admit("b", 1L, 1, admitted = true),
        StreamQuota.Admit("b", 2L, 2, admitted = true),
        StreamQuota.Admit("b", 3L, 3, admitted = false)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
