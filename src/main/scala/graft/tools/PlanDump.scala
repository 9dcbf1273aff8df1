package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: write `.explain("formatted")` of named SparkEntry queries
  * to files — the round's plan-evidence artifacts (`plans/rNN/<q>_*.txt`).
  * Run: `runMain graft.tools.PlanDump <outDir> <suffix> <query> [query...]`
  * (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench). Not part of the
  * driver contract.
  *
  * The dump runs the query's seed+fn ONCE to a count (so AQE finalizes and
  * fixture estates exist), then writes the FORMATTED plan of the returned
  * frame. For composed drives (streaming lanes, multi-commit Iceberg
  * choreographies) this is the plan of the final read — the write-side
  * evidence lives in the code and the bench job counts.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
    // BareLocalFs may not exist in older worktrees this tool is compiled
    // into — resolve reflectively so one source serves both sides of a diff
    try {
      val cls = Class.forName("graft.core.BareLocalFs$")
      val conf = cls.getField("MODULE$").get(null).asInstanceOf[AnyRef]
      val m = conf.getClass.getMethod("sparkConf")
      m.invoke(conf).asInstanceOf[Map[String, String]]
        .foreach { case (k, v) => builder.config(k, v) }
    } catch { case _: Throwable => () }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val defs = graft.SparkEntry.queryDefs.map(d => d.name -> d).toMap
    names.foreach { name =>
      val d = defs.getOrElse(name, sys.error(s"unknown query $name"))
      graft.queries.Fixtures.runSuffix = s"plan${System.currentTimeMillis()}"
      try {
        d.seed.foreach(_(spark, sfDir))
        val df = d.fn(spark, sfDir)
        df.count() // finalize AQE + build fixture estates
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: $e")
      } finally {
        spark.catalog.clearCache()
        graft.queries.Fixtures.runSuffix = ""
      }
    }
    spark.stop()
  }
}
