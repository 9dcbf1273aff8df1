package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.{IcebergSink, Pipeline}
import graft.kfs.KfsSeed

/** Dev utility: reproduce the e50 delete-file-count law and print the
  * per-snapshot commit history + physical delete-file census, to see where
  * the bound leaks. Not part of the driver contract. */
object ProbeE50 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Fixtures.runSuffix = s"probe${System.currentTimeMillis()}"
    val root = KfsSeed.seededRoot(spark, sfDir)
    val table = graft.queries.Fixtures.tmp(sfDir, "upsert_mx_table")
    val ckpt = graft.queries.Fixtures.tmp(sfDir, "upsert_mx_ckpt")
    val nSegs = (Tables.events(spark, sfDir).count() / 1000 + 4).toInt
    println(s"nSegs=$nSegs cap=${math.max(1, nSegs / 12)}")
    graft.streaming.StreamDrive.narrow(spark) {
      Pipeline.runUpsert(spark, root, table, ckpt,
        maxSegmentsPerTrigger = Some(math.max(1, nSegs / 12)),
        compactEvery = Some(4))
    }
    val m = IcebergSink.load(spark, table).get
    println(s"snapshots=${m.snapshots.size}")
    m.snapshots.foreach(s => println(
      s"  snap=${s.snapshotId} op=${s.operation} seq=${s.sequenceNumber}"))
    val files = IcebergSink.metadataTable(spark, table, "files")
    files.groupBy(col("content")).count().show()
    files.where(col("content") =!= 0)
      .select(col("file_path"), col("record_count")).show(50, false)
    spark.stop()
  }
}
