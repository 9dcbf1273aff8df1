package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job profiler for any registered query (`runMain graft.tools
  * .ProbeDrive <sfDir> <queryName>`): one untimed warm-up rep (fresh
  * fixture root, like the bench), then a measured rep under a job
  * listener — prints total wall, per-Spark-job wall times, and the
  * job-time sum, so "where does a drive's time go" splits into job work
  * vs driver-side (commit/planning/checkpoint) overhead without guessing. */
object ProbeDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "e11_stream_iceberg"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.put(s.jobId, (System.nanoTime(),
          Option(s.properties.getProperty("spark.job.description")).getOrElse("") +
            " | " + Option(s.properties.getProperty("callSite.short")).getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(e.jobId)
        if (st != null) done.synchronized {
          done += ((e.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
        }
      }
    })
    val d = graft.SparkEntry.queryDefs.find(_.name == name).get
    // warm-up rep on its own fixture root (the bench does the same), so
    // the measured rep carries no codegen/JIT startup
    graft.queries.Fixtures.runSuffix = s"probe${System.currentTimeMillis()}_w"
    d.seed.foreach(_(spark, sfDir))
    d.fn(spark, sfDir).count()
    spark.catalog.clearCache()
    done.synchronized(done.clear())
    graft.queries.Fixtures.runSuffix = s"probe${System.currentTimeMillis()}_m"
    d.seed.foreach(_(spark, sfDir))
    val t0 = System.nanoTime()
    val n = d.fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"TOTAL $name: $dt%.2f s, rows=$n, jobs=${done.size}")
    done.sortBy(-_._2).take(30).foreach { case (id, sec, desc) =>
      println(f"  job $id%4d  $sec%6.3f s  ${desc.take(140)}")
    }
    println(f"  sum of job times: ${done.map(_._2).sum}%.2f s")
    spark.stop()
  }
}
