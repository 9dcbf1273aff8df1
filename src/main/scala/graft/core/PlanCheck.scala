package graft.core

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for the headline queries so
  * shuffle/broadcast/pushdown can be reviewed (the "is this the plan I'd
  * want at 100 TB" loop). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q5_nation_revenue", "q3_top_orders", "j1_join_within",
        "d2_minhash_lsh", "s5_ann_bruteforce", "p1_projection")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
