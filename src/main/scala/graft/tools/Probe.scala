package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Dev utility: stage-by-stage wall timing of the MinHash-LSH pipeline at a
  * given SF dir — finds where bench seconds actually go. Not part of the
  * driver contract. Run: `runMain graft.tools.Probe /root/testdata/sf0.1`. */
object Probe {
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
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    t("docs.count")(docs.count())
    t("docs.count(warm)")(docs.count())

    val sh = Dedup.shingles(docs, "doc_id", "text")
    t("shingles.count")(sh.count())
    t("shingles.count(2nd)")(sh.count())
    t("shinglesFlat.count")(
      Dedup.shinglesFlat(docs, "doc_id", "text").count())
    t("shinglesFlat.count(2nd)")(
      Dedup.shinglesFlat(docs, "doc_id", "text").count())

    val withH = sh.withColumn("h", Dedup.shingleHash28(col("sh")))
    def perm(i: Int) =
      min((lit(Dedup.minhashA(i)) * col("h") + lit(Dedup.minhashB(i))) % Dedup.MinhashPrime).as(s"m$i")
    val docAgg = withH.groupBy(col("doc"))
      .agg(perm(0), ((1 until 16).map(perm) :+ collect_list(col("sh")).as("shs")): _*)
      .persist()
    t("docAgg.count")(docAgg.count())

    val bands = Dedup.lshBands(docAgg.drop("shs"), 4, 4)
    t("bands.count")(bands.count())
    val cands = Dedup.lshCandidates(bands)
    t("cands.count")(cands.count())

    val docSets = docAgg.select(col("doc"), col("shs"))
    val verified = cands
      .join(docSets.select(col("doc").as("a"), col("shs").as("sha")), "a")
      .join(docSets.select(col("doc").as("b"), col("shs").as("shb")), "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jac", col("inter") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .where(col("jac") >= 0.5)
    t("verified.count")(verified.count())

    t("nearDuplicates e2e")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.5, 16, 4).count())
    t("nearDuplicates e2e(2nd)")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.5, 16, 4).count())

    spark.catalog.clearCache()
    t("simhash(1st: incl codegen)")(
      Dedup.simhash(docs, "doc_id", "text").where(col("doc") < 25).count())
    t("simhash(2nd: warm codegen)")(
      Dedup.simhash(docs, "doc_id", "text").where(col("doc") < 25).count())

    spark.catalog.clearCache()
    t("ngramJaccard(1st)")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.catalog.clearCache()
    t("ngramJaccard(2nd)")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())

    spark.stop()
  }
}
