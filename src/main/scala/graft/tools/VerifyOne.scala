package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev utility: run a subset of SparkEntry queries against an SF dir and
  * dump each result to `/tmp/verify_one/<name>` plus the oracle SQL to
  * `oracle_sql.json` — a per-query slice of [[graft.Verify]] for local
  * DuckDB spot-checks while iterating. Run:
  * `runMain graft.tools.VerifyOne e12_iceberg_deletes` (SF dir via
  * `SPARK_GRAFT_SF_DIR`, default sf0.01). Not part of the driver contract. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = "/tmp/verify_one"
    new java.io.File(out).mkdirs()
    args.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sf)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      spark.catalog.clearCache()
    }
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = args.flatMap(n => graft.SparkEntry.oracleSql.get(n).map(n -> _))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
