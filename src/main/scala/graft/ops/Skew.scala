package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is hot (the 100 TB
  * failure mode AQE can't always fix — e.g. a null-heavy or celebrity key
  * joining a non-broadcastable side).
  *
  * `saltedJoin` spreads each hot fact key over `salt` shuffle partitions by
  * appending a deterministic salt derived from the fact row, and replicates
  * the build side once per salt value. Result set is identical to the plain
  * equi-join; the shuffle is `salt`× wider on the build side but no single
  * reducer owns a whole hot key. Use when: build side too big to broadcast,
  * key histogram has heavy hitters, AQE skew-split insufficient (single
  * mega-key). Deterministic salt (hash of the whole fact row) keeps reruns
  * stable for testing; entropy quality is irrelevant — only spread matters.
  */
object Skew {

  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val factSalted = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val buildReplicated = build.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    factSalted.join(buildReplicated, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Key histogram helper: top-n heaviest keys with their share — the
    * decision input for broadcast vs salt vs AQE. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
