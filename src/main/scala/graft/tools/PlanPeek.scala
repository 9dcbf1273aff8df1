package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed plan of named SparkEntry queries at a
  * given SF dir. Run: `runMain graft.tools.PlanPeek t15_bm25_search ...`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      println(s"===== $n")
      println(graft.SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
