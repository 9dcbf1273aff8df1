package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketing — the "pre-partition once, join many
  * times shuffle-free" tool for 100 TB fact-to-fact joins where neither
  * side broadcasts and the same key is joined repeatedly (the classic
  * lineitem⋈orders shape).
  *
  * Both sides bucketed by the join key into the same bucket count ⇒ Spark
  * plans a SortMergeJoin with NO Exchange on either side: the shuffle was
  * paid once at write time and amortizes over every subsequent join.
  * (Verified by plan assertion in BucketingSpec.)
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (bucket pruning + shuffle-free
    * joins on `keys`). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
