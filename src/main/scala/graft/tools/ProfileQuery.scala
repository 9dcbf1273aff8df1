package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev utility: wall-vs-jobs breakdown of named SparkEntry queries.
  *
  * For each query it runs seed+fn+count once (after one untimed warmup) with
  * a listener recording every Spark job's wall time, call site and stage
  * shape. The report separates
  *   - executor-visible time (sum of job wall times, with the top jobs), from
  *   - the driver-side gap (total wall − job time): metadata IO, Avro
  *     manifest writes, parquet footer harvests, planning, checkpoint
  *     bookkeeping — everything a stage timeline can't see.
  * That split is the first branch in the optimization playbook (guide §1):
  * many-small-jobs and driver-gap problems are fixed in the harness code,
  * big-job problems in the query plan. Not part of the driver contract.
  *
  * Run: `runMain graft.tools.ProfileQuery e36_scd2_point_in_time ...`
  * (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench).
  */
object ProfileQuery {

  private final case class JobRec(id: Int, var desc: String,
    var started: Long, var ended: Long, var stages: Int, var tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
    graft.core.BareLocalFs.sparkConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
            .getOrElse("?")
          jobs(e.jobId) = JobRec(e.jobId, d, e.time, e.time,
            e.stageInfos.size, e.stageInfos.map(_.numTasks).sum)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting) jobs.synchronized {
          jobs.get(e.jobId).foreach(_.ended = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    val defs = graft.SparkEntry.queryDefs.map(d => d.name -> d).toMap
    args.foreach { name =>
      val d = defs.getOrElse(name, sys.error(s"unknown query $name"))
      // untimed warmup rep on its own fixture root (mirrors Bench)
      graft.queries.Fixtures.runSuffix = s"prof${System.currentTimeMillis()}_w"
      try { d.seed.foreach(_(spark, sfDir)); d.fn(spark, sfDir).count() }
      catch { case e: Throwable => println(s"[warmup fail] $e") }
      spark.catalog.clearCache()

      graft.queries.Fixtures.runSuffix = s"prof${System.currentTimeMillis()}_1"
      jobs.synchronized(jobs.clear())
      collecting = true
      val t0 = System.nanoTime()
      d.seed.foreach(_(spark, sfDir))
      val tSeed = System.nanoTime()
      d.fn(spark, sfDir).count()
      val tEnd = System.nanoTime()
      collecting = false
      spark.catalog.clearCache()
      graft.queries.Fixtures.runSuffix = ""

      val wall = (tEnd - t0) / 1e9
      val seedS = (tSeed - t0) / 1e9
      val snap = jobs.synchronized(jobs.values.toVector)
      val jobS = snap.map(j => (j.ended - j.started) / 1e3).sum
      println(f"===== $name  wall=$wall%.2fs (seed=$seedS%.2fs)  " +
        f"jobs=${snap.size}  jobTime=$jobS%.2fs  driverGap=${wall - jobS}%.2fs")
      val byDesc = snap.groupBy(_.desc).map { case (k, v) =>
        (k, v.size, v.map(j => (j.ended - j.started) / 1e3).sum,
          v.map(_.tasks).sum)
      }.toSeq.sortBy(-_._3)
      byDesc.take(18).foreach { case (desc, n, s, tasks) =>
        println(f"  $s%7.2fs  n=$n%-4d tasks=$tasks%-5d ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}
