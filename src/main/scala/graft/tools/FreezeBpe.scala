package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Tables
import graft.ops.Bpe

/** Dev utility: train t22's BPE merge table on the sf0.01 documents corpus
  * and print it as Scala source, so the trained table can be frozen as a
  * constant (`Bpe.CorpusMergesSf001`) and the t22 oracle generated from it
  * (the t34 pattern). Run twice to confirm determinism before freezing.
  * Not part of the driver contract. */
object FreezeBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = Bpe.learnMerges(
      Bpe.wordHistogram(docs, "text", maxVocab = 2000), numMerges = 200)
    println(s"// ${merges.size} merges trained at $sfDir")
    def lit(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    merges.grouped(4).foreach { g =>
      println(g.map(m => s"(${lit(m.a)}, ${lit(m.b)})").mkString("    ", ", ", ","))
    }
    spark.stop()
  }
}
