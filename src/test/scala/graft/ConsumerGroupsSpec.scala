package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.kfs.{ConsumerGroups, KfsCodec, KfsLayout}

/** Consumer-group offset store + lag (`etcd_store.go:175-211` semantics:
  * last-write-wins commit, fetch-missing → default, metadata preserved). */
class ConsumerGroupsSpec extends AnyFunSuite {
  import TestSpark._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_groups").toString

  private def seedPartition(root: String, topic: String, partition: Int,
      n: Int): Unit = {
    val recs = (0 until n).map { i =>
      KfsCodec.Record(i.toLong, 1706000000000L + i * 1000L,
        s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"), Seq.empty)
    }
    val ref = KfsLayout.writeSegment(root, topic, partition, recs)
    KfsLayout.writeManifest(root, topic, partition, Seq(ref))
  }

  test("commit/fetch round-trip preserves offset, metadata, and timestamps") {
    val root = freshRoot()
    ConsumerGroups.commit(root, "g1", "orders", 0, 42L,
      metadata = "host=\"a\\b\"\n", nowMs = 123456789L)
    val c = ConsumerGroups.fetch(root, "g1", "orders", 0).get
    assert(c.offset == 42L)
    assert(c.metadata == "host=\"a\\b\"\n")
    assert(c.committedAtMs == 123456789L)
  }

  test("last-write-wins: a re-commit replaces the record (etcd Put)") {
    val root = freshRoot()
    ConsumerGroups.commit(root, "g1", "orders", 0, 10L, nowMs = 1L)
    ConsumerGroups.commit(root, "g1", "orders", 0, 7L, nowMs = 2L)
    assert(ConsumerGroups.fetch(root, "g1", "orders", 0).get.offset == 7L)
  }

  test("fetch of an uncommitted partition is None; lag defaults it to 0") {
    val root = freshRoot()
    assert(ConsumerGroups.fetch(root, "nope", "orders", 3).isEmpty)
    seedPartition(root, "orders", 0, 100)
    KfsLayout.invalidateDiscoveryCache(root)
    val r = ConsumerGroups.lag(spark, root, "nope", "orders").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("committed_offset") == 0L)
    assert(r(0).getAs[Long]("log_end_offset") == 100L)
    assert(r(0).getAs[Long]("lag") == 100L)
  }

  test("lag = manifest log-end minus committed, per partition, no data read") {
    val root = freshRoot()
    seedPartition(root, "orders", 0, 100)
    seedPartition(root, "orders", 1, 60)
    KfsLayout.invalidateDiscoveryCache(root)
    ConsumerGroups.commit(root, "g1", "orders", 0, 100L) // caught up
    ConsumerGroups.commit(root, "g1", "orders", 1, 25L)  // behind
    val rows = ConsumerGroups.lag(spark, root, "g1", "orders")
      .collect().map(r => (r.getAs[Int]("partition"),
        r.getAs[Long]("committed_offset"), r.getAs[Long]("log_end_offset"),
        r.getAs[Long]("lag"))).toSeq.sortBy(_._1)
    assert(rows == Seq((0, 100L, 100L, 0L), (1, 25L, 60L, 35L)))
  }

  test("consume/commitConsumed walks the log in capped chunks to exhaustion") {
    val root = freshRoot()
    seedPartition(root, "orders", 0, 25)
    seedPartition(root, "orders", 1, 8)
    KfsLayout.invalidateDiscoveryCache(root)
    def poll() = ConsumerGroups.consume(spark, root, "g1", "orders", 10)
    // first poll: from 0, capped at 10 per partition (p1 has only 8)
    val b1 = poll().collect()
    assert(b1.count(_.getAs[Int]("_partition") == 0) == 10)
    assert(b1.count(_.getAs[Int]("_partition") == 1) == 8)
    assert(b1.filter(_.getAs[Int]("_partition") == 0)
      .map(_.getAs[Long]("_offset")).sorted.toSeq == (0L until 10L))
    ConsumerGroups.commitConsumed(root, "g1", "orders", poll())
    // second poll resumes where the commit left off
    val b2 = poll().collect()
    assert(b2.filter(_.getAs[Int]("_partition") == 0)
      .map(_.getAs[Long]("_offset")).sorted.toSeq == (10L until 20L))
    assert(b2.count(_.getAs[Int]("_partition") == 1) == 0) // exhausted
    ConsumerGroups.commitConsumed(root, "g1", "orders", poll())
    // third poll drains the tail; a fourth returns nothing
    val b3 = poll().collect()
    assert(b3.map(_.getAs[Long]("_offset")).sorted.toSeq == (20L until 25L))
    ConsumerGroups.commitConsumed(root, "g1", "orders", poll())
    assert(poll().count() == 0)
    // and the group now reports zero lag everywhere
    val lags = ConsumerGroups.lag(spark, root, "g1", "orders")
      .collect().map(_.getAs[Long]("lag")).toSeq
    assert(lags == Seq(0L, 0L))
  }

  test("seekToTime commits the earliest offset at/after T; no-match partitions untouched") {
    val root = freshRoot()
    // partition 0: ts 1706000000000 + i*1000 for offsets 0..19
    seedPartition(root, "orders", 0, 20)
    KfsLayout.invalidateDiscoveryCache(root)
    // target lands mid-log: first qualifying offset is 5
    ConsumerGroups.seekToTime(root, "g1", "orders",
      1706000000000L + 4500L, spark)
    assert(ConsumerGroups.fetch(root, "g1", "orders", 0).get.offset == 5L)
    // a target past the newest record matches nothing: commit unchanged
    ConsumerGroups.seekToTime(root, "g1", "orders",
      1706000000000L + 999999L, spark)
    assert(ConsumerGroups.fetch(root, "g1", "orders", 0).get.offset == 5L)
  }

  test("listGroups enumerates committing groups; _groups stays invisible to discovery") {
    val root = freshRoot()
    seedPartition(root, "orders", 0, 10)
    ConsumerGroups.commit(root, "g-b", "orders", 0, 1L)
    ConsumerGroups.commit(root, "g-a", "orders", 0, 2L)
    assert(ConsumerGroups.listGroups(root) == Seq("g-a", "g-b"))
    // the offset store lives inside the estate root but must never be
    // picked up as segments by discovery
    KfsLayout.invalidateDiscoveryCache(root)
    val refs = KfsLayout.listCompleted(root)
    assert(refs.forall(_.topic == "orders") && refs.length == 1)
  }
}
