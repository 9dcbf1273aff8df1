package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.{IcebergSink, TableSink}

/** Dev utility: phase timing of the bucketed-Iceberg fixture (e23 shape).
  * Not part of the driver contract. */
object ProbeIceberg {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val table = "/tmp/graft_probe_iceberg/t"
    TableSink.deleteRecursive(java.nio.file.Paths.get(table))
    val ev = t("build frame") {
      val d = Tables.eventsTopic(spark, sfDir).select(
        col("_partition").as("partition"),
        col("_offset").as("offset"),
        expr("CAST(substring(_key, 6) AS LONG)").as("user_id"),
        get_json_object(col("_value"), "$.k").cast("long").as("k"),
        col("event_type"))
      d.count(); d
    }
    t("plain partitionBy write") {
      ev.withColumn("b", pmod(col("user_id"), lit(8)))
        .withColumn("tr", col("offset") - pmod(col("offset"), lit(500)))
        .repartition(col("b"), col("tr"))
        .write.mode("overwrite").partitionBy("b", "tr")
        .parquet("/tmp/graft_probe_iceberg/plain")
    }
    val table2 = "/tmp/graft_probe_iceberg/t2"
    TableSink.deleteRecursive(java.nio.file.Paths.get(table2))
    t("append unpartitioned")(IcebergSink.append(spark, table2, ev))
    t("append bucketed")(IcebergSink.append(spark, table, ev,
      partitionBy = Seq("bucket(8,user_id)", "truncate(500,offset)")))
    t("readPruned point") {
      IcebergSink.readPruned(spark, table,
        Seq(IcebergSink.ColumnRange("user_id", Some(7L), Some(7L)),
          IcebergSink.ColumnRange("offset", Some(100L), Some(1100L))))
        .groupBy(col("user_id")).agg(count(lit(1))).collect()
    }
    t("read full")(IcebergSink.read(spark, table).count())
    spark.stop()
  }
}
