package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.core.BareLocalFs.sparkConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=name1,name2 restricts the dump (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries persist intermediates (shingle explodes etc); dropping them
      // between queries keeps storage memory from starving execution
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // sf-pinned oracles (frozen fixtures like t22's sf0.01-trained BPE
    // table) are only valid at their pinned scale: at any other SF the
    // live query computes from different data and a hash mismatch would
    // mean "oracle frozen at the wrong SF", not an engine defect. Omit
    // them — loudly — so the driver records a rows-only check instead.
    val sfBase = Paths.get(sfDir).getFileName.toString
    val pinnedOut = SparkEntry.queryDefs.flatMap { d =>
      d.oracleSfPin.filter(_ != sfBase).map(d.name -> _)
    }.toMap
    pinnedOut.foreach { case (name, pin) =>
      System.err.println(s"[verify] $name: oracle is sf-pinned to $pin but " +
        s"this run is $sfBase -- omitting the oracle (rows-only check). " +
        "Regenerate the frozen fixture (see the QueryDef's doc) to re-pin.")
    }
    val json = SparkEntry.oracleSql
      .filterNot { case (k, _) => pinnedOut.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
