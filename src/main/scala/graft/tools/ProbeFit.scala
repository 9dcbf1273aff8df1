package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{KMeansQ, Similarity}

/** Dev utility: stage timing of the PQ/IVF fit paths (fused vs sequential,
  * sampled vs full) at a given SF dir. Not part of the driver contract. */
object ProbeFit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val emb = Tables.load(spark, sfDir, "embeddings")
    t("emb.count")(emb.count())
    (1 to 2).foreach { round =>
      t(s"fitMulti m=4 (r$round)")(
        KMeansQ.fitMulti(emb, "embedding", 4, 8, 1, 64))
      t(s"sequential pqFit-style (r$round)")(
        (0 until 4).map { i =>
          val sub = emb.select(col("vec_id"),
            slice(col("embedding"), i * 16 + 1, 16).as("_sub"))
          KMeansQ.fitPredict(sub, "vec_id", "_sub", 8, 1, 16)._2
        })
      t(s"fitMulti m=1 k=4 i=2 (r$round)")(
        KMeansQ.fitMulti(emb, "embedding", 1, 4, 2, 64))
      t(s"fitPredict k=4 i=2 (r$round)")(
        KMeansQ.fitPredict(emb, "vec_id", "embedding", 4, 2, 64))
    }
    val q = emb.where(col("vec_id") < 5)
    t("pqTopK sampled")(
      Similarity.pqTopK(emb, q, 10, fitSampleRate = 0.5).count())
    t("pqTopK full")(Similarity.pqTopK(emb, q, 10).count())
    spark.stop()
  }
}
