package graft.tools
import org.apache.spark.sql.SparkSession
/** Micro-probe for tiny-shuffle fixed cost (the r18 scratch-dir evidence):
  * times a 32-map x 32-reduce SQL groupBy and a round-robin repartition
  * under the harness session conf. `PROBE_BYPASS` overrides
  * spark.shuffle.sort.bypassMergeThreshold for writer experiments. */
object ProbeTiny {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("PROBE_BYPASS").foreach(v =>
      builder.config("spark.shuffle.sort.bypassMergeThreshold", v))
    graft.core.BareLocalFs.sparkConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    def time(tag: String)(body: => Unit): Unit = {
      body; body
      val ts = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"$tag%-36s ${ts.min}%8.1f ms min ${ts.sorted.apply(5)}%8.1f p50")
    }
    val dfn = spark.range(0, 1 << 18, 1, 32).cache(); dfn.count()
    time("groupBy(count) 32m->32r") { dfn.groupBy(col("id") % 1024).count().collect() }
    time("repartition 32m->32r") { dfn.repartition(32).count() }
    spark.stop()
  }
}
