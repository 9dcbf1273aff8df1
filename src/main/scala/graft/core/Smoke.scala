package graft.core

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a plain session (no graft configs),
  * then SparkEntry.entry(spark) must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(10, false)
    println(s"SMOKE rows=${df.count()}")
    spark.stop()
  }
}
