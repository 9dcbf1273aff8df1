package graft.kfs

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic KFS fixture: materializes the driver's `events` table as a
  * real segment log (same implicit-column mapping as
  * [[graft.core.Tables.eventsTopic]]), so the KFS scan path is exercised
  * end-to-end against the same DuckDB oracle. Seeding is a test-harness
  * concern — the engine under test is the decode/scan path, which runs
  * distributed. 1000 records/segment → multiple segments per partition.
  */
object KfsSeed {

  /** A crash mid-seed (before the marker write) leaves orphan segment
    * files the next run would silently overlay — invisible only because
    * discovery is manifest-driven. Clear the root (and any staging dir)
    * whenever the marker is absent, mirroring
    * `KfsPack.seedDeleteRecordsEstate`. */
  private def clearRoot(root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(KfsLayout.hadoopConf)
    fs.delete(p, true)
    fs.delete(new org.apache.hadoop.fs.Path(root + "_staging"), true)
  }

  def seededRoot(spark: SparkSession, sfDir: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    // v3: segments gained key-Bloom `.kfsb` sidecars (v2: footer CRC
    // switch) — versioned path so stale fixtures can never be picked up
    val root = s"/tmp/graft_kfs/v3/$sfName"
    this.synchronized {
      val marker = Paths.get(root, "_SEEDED")
      if (!Files.exists(marker)) {
        clearRoot(root)
        seed(spark, sfDir, root)
        Files.createDirectories(marker.getParent)
        Files.write(marker, Array.emptyByteArray)
      }
    }
    root
  }

  /** The `documents` table as a single-partition KFS topic `docs`:
    * offset = doc_id (both dense from 0 — driver testdata invariant),
    * key = doc_id, value = text bytes. Arrival order therefore equals id
    * order, which is what makes streaming first-occurrence dedup
    * (`Pipeline.runDedup`) oracle-checkable: "earlier in the stream" and
    * "smaller doc_id" coincide. 250 records/segment so every SF yields
    * multiple segments (micro-batch boundaries to exercise). */
  def seededDocsRoot(spark: SparkSession, sfDir: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = s"/tmp/graft_kfs_docs/v1/$sfName"
    this.synchronized {
      val marker = Paths.get(root, "_SEEDED")
      if (!Files.exists(marker)) {
        clearRoot(root)
        val rows = Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), col("text"))
          .collect()
          .sortBy(_.getAs[Long]("doc_id"))
        val records = rows.map { r =>
          val id = r.getAs[Long]("doc_id")
          KfsCodec.Record(
            offset = id,
            timestampMs = 1700000000000L + id,
            key = id.toString.getBytes("UTF-8"),
            value = r.getAs[String]("text").getBytes("UTF-8"),
            headers = Seq.empty)
        }
        val refs = records.grouped(250).map { group =>
          KfsLayout.writeSegment(root, "docs", 0, group.toSeq)
        }.toSeq
        KfsLayout.writeManifest(root, "docs", 0, refs)
        Files.createDirectories(marker.getParent)
        Files.write(marker, Array.emptyByteArray)
      }
    }
    root
  }

  /** [[seededDocsRoot]] plus RE-CRAWLS: after the full corpus, every doc
    * with doc_id % 5 == 0 is re-sent VERBATIM at a later offset and later
    * timestamp — the duplicate shape of a crawler retry / mirror post /
    * at-least-once producer. Streaming exact dedup must collapse each
    * re-send onto its original; the distinct-content set is unchanged,
    * which is what makes the stream oracle-checkable against the plain
    * documents table. */
  def seededRecrawlDocsRoot(spark: SparkSession, sfDir: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = s"/tmp/graft_kfs_docs_recrawl/v1/$sfName"
    this.synchronized {
      val marker = Paths.get(root, "_SEEDED")
      if (!Files.exists(marker)) {
        clearRoot(root)
        val rows = Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), col("text"))
          .collect()
          .sortBy(_.getAs[Long]("doc_id"))
        def rec(offset: Long, id: Long, text: String) = KfsCodec.Record(
          offset = offset,
          timestampMs = 1700000000000L + offset,
          key = id.toString.getBytes("UTF-8"),
          value = text.getBytes("UTF-8"),
          headers = Seq.empty)
        val maxId = rows.map(_.getAs[Long]("doc_id")).max
        val originals = rows.map(r =>
          rec(r.getAs[Long]("doc_id"), r.getAs[Long]("doc_id"),
            r.getAs[String]("text")))
        val resends = rows.filter(_.getAs[Long]("doc_id") % 5 == 0)
          .zipWithIndex.map { case (r, i) =>
            rec(maxId + 1 + i, r.getAs[Long]("doc_id"),
              r.getAs[String]("text"))
          }
        val refs = (originals ++ resends).grouped(250).map { group =>
          KfsLayout.writeSegment(root, "docs", 0, group.toSeq)
        }.toSeq
        KfsLayout.writeManifest(root, "docs", 0, refs)
        Files.createDirectories(marker.getParent)
        Files.write(marker, Array.emptyByteArray)
      }
    }
    root
  }

  private def seed(spark: SparkSession, sfDir: String, root: String): Unit = {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts_ms"), col("user_id"),
        col("event_type"), col("props"))
      .collect()
      .sortBy(_.getAs[Long]("event_id"))

    val byPartition = rows.groupBy(r => (r.getAs[Long]("event_id") % Tables.TopicPartitions).toInt)
    byPartition.foreach { case (partition, rs) =>
      val records = rs.sortBy(_.getAs[Long]("event_id")).zipWithIndex.map {
        case (r, idx) =>
          KfsCodec.Record(
            offset = idx.toLong,
            timestampMs = r.getAs[Long]("ts_ms"),
            key = s"user-${r.getAs[Long]("user_id")}".getBytes("UTF-8"),
            value = r.getAs[String]("props").getBytes("UTF-8"),
            headers = Seq(KfsCodec.Header("src",
              r.getAs[String]("event_type").getBytes("UTF-8"))))
      }
      val refs = records.grouped(1000).map { group =>
        KfsLayout.writeSegment(root, "events", partition, group.toSeq)
      }.toSeq
      KfsLayout.writeManifest(root, "events", partition, refs)
    }
  }
}
