package graft.core

import org.apache.spark.sql.SparkSession

/** Dev-only schema probe (kept out of SparkEntry). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "embeddings", "documents")) {
      println(s"== $t")
      val df = spark.read.parquet(s"$dir/$t.parquet")
      df.printSchema()
      df.show(3, 60)
    }
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_ntz", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    ev.select(col("ts"), col("ts_ntz")).show(3, false)
    ev.printSchema()
    spark.stop()
  }
}
