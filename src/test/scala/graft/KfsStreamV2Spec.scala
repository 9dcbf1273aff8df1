package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.kfs.{KfsCodec, KfsLayout, KfsStreamOffset}

class KfsStreamV2Spec extends AnyFunSuite {
  import TestSpark._

  private def mkRecords(n: Int, baseOffset: Long = 0L,
      baseTs: Long = 1706000000000L): Seq[KfsCodec.Record] =
    (0 until n).map { i =>
      KfsCodec.Record(baseOffset + i, baseTs + (baseOffset + i) * 1000L,
        s"k-${baseOffset + i}".getBytes("UTF-8"),
        s"""{"id":${baseOffset + i}}""".getBytes("UTF-8"), Seq.empty)
    }

  test("stream offset JSON round-trips through the checkpoint format") {
    val o = KfsStreamOffset(Map("orders/0" -> 200L, "orders/1" -> 57L))
    assert(KfsStreamOffset.parse(o.json()) == o)
    assert(KfsStreamOffset.parse(KfsStreamOffset(Map.empty).json()).next.isEmpty)
    // topic names with commas survive the WAL round-trip (quotes and
    // backslashes are rejected at writeSegment time instead)
    val weird = KfsStreamOffset(Map("a,b/0" -> 5L, "c d/1" -> 7L))
    assert(KfsStreamOffset.parse(weird.json()) == weird)
    intercept[IllegalArgumentException] {
      KfsLayout.writeSegment("/tmp/x", "bad\"topic", 0, mkRecords(1))
    }
  }

  test("kfs micro-batch stream: initial backlog, incremental append, no dupes") {
    val root = Files.createTempDirectory("kfs_stream").toString
    KfsLayout.writeSegment(root, "t", 0, mkRecords(100))
    KfsLayout.writeSegment(root, "t", 1, mkRecords(50))

    val q = spark.readStream.format("kfs").option("path", root)
      // rate limit: the 3-segment backlog must drain in 1-segment batches
      .option("max_segments_per_trigger", "1").load()
      .select(col("_topic"), col("_partition"), col("_offset"))
      .writeStream.format("memory").queryName("kfs_mb")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val t1 = spark.table("kfs_mb")
      assert(t1.count() == 150)

      // a new completed segment appears -> only its rows arrive
      KfsLayout.writeSegment(root, "t", 0, mkRecords(30, baseOffset = 100))
      q.processAllAvailable()
      val rows = spark.table("kfs_mb")
      assert(rows.count() == 180)
      assert(rows.select(col("_partition"), col("_offset")).distinct().count() == 180,
        "replanning a trigger must not duplicate rows")
      assert(rows.where(col("_partition") === 0).count() == 130)
    } finally q.stop()
  }

  test("rate-limited triggers round-robin across partitions (no starvation)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = Files.createTempDirectory("kfs_stream_fair").toString
    // partition 0 has a deep backlog, partition 1 a single segment
    (0 until 4).foreach(i =>
      KfsLayout.writeSegment(root, "t", 0, mkRecords(10, baseOffset = i * 10L)))
    KfsLayout.writeSegment(root, "t", 1, mkRecords(10))

    val scan = new graft.kfs.KfsScan(root, None, None, None, None, None, None,
      graft.gov.Guardrails(), Some(2), graft.kfs.KfsV2.Schema,
      new graft.kfs.SerializableHadoopConf(graft.kfs.KfsLayout.hadoopConf))
    val stream = scan.toMicroBatchStream("unused")

    // trigger 1 (cap=2): one segment from EACH partition, not two from the
    // deep partition-0 backlog
    val end1 = stream.asInstanceOf[
        org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .latestOffset(stream.initialOffset(), ReadLimit.maxFiles(2))
      .asInstanceOf[KfsStreamOffset]
    assert(end1.next == Map("t/0" -> 10L, "t/1" -> 10L))

    // trigger 2 continues partition 0's backlog
    val end2 = stream.asInstanceOf[
        org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .latestOffset(end1, ReadLimit.maxFiles(2))
      .asInstanceOf[KfsStreamOffset]
    assert(end2.next("t/0") == 30L && end2.next("t/1") == 10L)

    // without a cap, the rails' maxScanSegments is the default read limit
    // (metered progress, not the batch path's up-front rejection)
    val defaultLimit = stream.asInstanceOf[
        org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .getDefaultReadLimit
    assert(defaultLimit.isInstanceOf[
      org.apache.spark.sql.connector.read.streaming.ReadMaxFiles])
  }

  test("Trigger.AvailableNow drains under admission control (multi-batch, capped)") {
    // Without SupportsTriggerAvailableNow, Spark falls back to a single
    // unbounded batch that silently ignores max_segments_per_trigger — at
    // estate scale, exactly the failure admission control exists to
    // prevent. This drives a real AvailableNow drain and asserts the cap
    // held per micro-batch.
    val root = Files.createTempDirectory("kfs_avail_now").toString
    (0 until 5).foreach(i =>
      KfsLayout.writeSegment(root, "t", 0, mkRecords(10, baseOffset = i * 10L)))

    val q = spark.readStream.format("kfs").option("path", root)
      .option("max_segments_per_trigger", "2").load()
      .select(col("_offset"))
      .writeStream.format("memory").queryName("kfs_avail_now")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow drain did not terminate")
      val rows = spark.table("kfs_avail_now")
      assert(rows.count() == 50)
      assert(rows.distinct().count() == 50)
      val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batches.length >= 3,
        s"expected >=3 metered micro-batches (5 segments / cap 2), got ${batches.mkString(",")}")
      assert(batches.forall(_ <= 20),
        s"a batch exceeded the 2-segment admission cap: ${batches.mkString(",")}")
    } finally q.stop()
  }

  test("AvailableNow fence: segments landing after prepare belong to the next run") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val root = Files.createTempDirectory("kfs_avail_fence").toString
    KfsLayout.writeSegment(root, "t", 0, mkRecords(10))
    KfsLayout.writeSegment(root, "t", 0, mkRecords(10, baseOffset = 10))

    val scan = new graft.kfs.KfsScan(root, None, None, None, None, None, None,
      graft.gov.Guardrails(), Some(1), graft.kfs.KfsV2.Schema,
      new graft.kfs.SerializableHadoopConf(graft.kfs.KfsLayout.hadoopConf))
    val stream = scan.toMicroBatchStream("unused")
      .asInstanceOf[graft.kfs.KfsMicroBatchStream]
    stream.prepareForTriggerAvailableNow()

    // a segment lands mid-drain: it must NOT be admitted into this run
    KfsLayout.writeSegment(root, "t", 0, mkRecords(10, baseOffset = 20))
    graft.kfs.KfsLayout.invalidateDiscoveryCache(root)

    var cur = stream.initialOffset()
    var steps = 0
    var advanced = true
    while (advanced && steps < 10) {
      val next = stream.latestOffset(cur, ReadLimit.maxFiles(1))
      advanced = next != cur
      if (advanced) {
        // each metered step admits exactly one segment
        assert(stream.planInputPartitions(cur, next).length == 1)
        cur = next
      }
      steps += 1
    }
    // the drain stops AT the fence (offset 20), not at the new tail (30)
    assert(cur.asInstanceOf[KfsStreamOffset].next == Map("t/0" -> 20L))
    // and the fence is what progress reporting sees as "latest"
    assert(stream.reportLatestOffset()
      .asInstanceOf[KfsStreamOffset].next == Map("t/0" -> 20L))
  }

  test("restart from checkpoint resumes after consumed segments") {
    val root = Files.createTempDirectory("kfs_stream_ckpt").toString
    val ckpt = Files.createTempDirectory("kfs_stream_ckpt_wal").toString
    val out = Files.createTempDirectory("kfs_stream_ckpt_out").toString
    KfsLayout.writeSegment(root, "t", 0, mkRecords(40))

    def runOnce(): Unit = {
      val q = spark.readStream.format("kfs")
        .option("path", root).load()
        .select(col("_partition"), col("_offset"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce()
    assert(spark.read.parquet(out).count() == 40)

    KfsLayout.writeSegment(root, "t", 0, mkRecords(15, baseOffset = 40))
    runOnce()
    val rows = spark.read.parquet(out)
    // only the NEW segment replays after restart — 55 total, no dupes
    assert(rows.count() == 55)
    assert(rows.select(col("_offset")).distinct().count() == 55)
  }

  test("retention racing a checkpointed drain: never duplicates, skips like a consumer past the horizon") {
    // The documented semantics (KfsRetention): manifest readers re-plan
    // from the flipped manifest; a stream's checkpoint survives deletion
    // of segments it ALREADY consumed (no replay), and a segment deleted
    // BEFORE the stream reached it is simply skipped — exactly a Kafka
    // consumer whose lag crossed retention.ms. Never a duplicate.
    val root = Files.createTempDirectory("kfs_ret_race").toString
    val ckpt = Files.createTempDirectory("kfs_ret_race_wal").toString
    val out = Files.createTempDirectory("kfs_ret_race_out").toString
    def seg(base: Long): Unit = {
      val refs = KfsLayout.listFromManifest(root, "r", 0) :+
        KfsLayout.writeSegment(root, "r", 0, mkRecords(10, baseOffset = base))
      KfsLayout.writeManifest(root, "r", 0, refs.sortBy(_.baseOffset))
      KfsLayout.invalidateDiscoveryCache(root)
    }
    def drain(): Unit = {
      val q = spark.readStream.format("kfs")
        .option("path", root).option("max_segments_per_trigger", "2").load()
        .select(col("_partition"), col("_offset"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    (0L until 40L by 10L).foreach(seg)
    drain()
    assert(spark.read.parquet(out).count() == 40)

    // retention deletes the two OLDEST (already-consumed) segments: the
    // checkpoint is untouched, later drains add nothing twice. Record ts
    // = base + offset*1000, so cutoff ts of offset 20 keeps segs >= 20.
    val r1 = graft.kfs.KfsRetention.enforce(root, "r", 1706000000000L + 20 * 1000L)
    assert(r1.deleted == 2 && r1.kept == 2)
    seg(40L) // new data arrives after retention
    drain()
    val afterConsumedDrop = spark.read.parquet(out)
    assert(afterConsumedDrop.count() == 50)
    assert(afterConsumedDrop.select(col("_offset")).distinct().count() == 50)

    // retention now outruns the consumer: a segment lands (offsets 50-59)
    // and expires BEFORE the stream ever drains it (cutoff 60s sweeps the
    // whole remaining estate: 20, 30, 40, 50); a fresh segment (60-69)
    // then survives. The drain must skip the horizon gap silently and
    // deliver only the surviving segment — no failure, no duplicates, no
    // resurrection of 50-59.
    seg(50L)
    val r2 = graft.kfs.KfsRetention.enforce(root, "r", 1706000000000L + 60 * 1000L)
    assert(r2.deleted == 4 && r2.kept == 0, s"got $r2")
    seg(60L)
    drain()
    val end = spark.read.parquet(out)
    assert(end.count() == 60)
    assert(end.select(col("_offset")).distinct().count() == 60)
    val offs = end.select(col("_offset")).collect().map(_.getLong(0)).toSet
    assert(!offs.exists(o => o >= 50 && o < 60), "expired segment resurrected")
    assert((60L until 70L).forall(offs), "surviving segment not delivered")

    // and a fresh BATCH scan (manifest re-plan) sees exactly the retained
    // estate — only the post-retention segment
    val batch = spark.read.format("kfs").option("path", root).load()
    assert(batch.select(col("_offset")).collect().map(_.getLong(0)).sorted
      .toSeq == (60L until 70L))
  }
}
