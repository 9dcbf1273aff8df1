package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.ZOrder

/** Morton-curve correctness plus the property the layout exists for:
  * z-clustered files have tight min/max envelopes on EVERY interleaved
  * dimension, so point predicates on either column prune most files. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  private def events = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("ts_ms"))

  test("interleave matches a bit-by-bit driver-side mirror") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L),
      (12345L, 54321L))
    val df = pairs.toDF("bx", "by")
      .withColumn("z", ZOrder.interleave(Seq(col("bx"), col("by")), 16))
    val got = df.orderBy("bx", "by").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def mirror(bx: Long, by: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((bx >> i) & 1L) << (2 * i)) | (((by >> i) & 1L) << (2 * i + 1))
      }
    got.foreach { case (bx, by, z) =>
      assert(z == mirror(bx, by), s"interleave($bx, $by)")
    }
  }

  test("z-order prunes on both dimensions; single-column sort only on one") {
    val nFiles = 16
    // simulated file = range partition; per-file min/max = the footer stats
    def envelopes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("user_id").as("umin"), max("user_id").as("umax"),
        min("ts_ms").as("tmin"), max("ts_ms").as("tmax"))
      .collect()
      .map(r => (r.getAs[Long]("umin"), r.getAs[Long]("umax"),
        r.getAs[Long]("tmin"), r.getAs[Long]("tmax")))
    val zEnv = envelopes(ZOrder.cluster(events, Seq("user_id", "ts_ms"), nFiles))
    val tsEnv = envelopes(
      events.repartitionByRange(nFiles, col("ts_ms")).sortWithinPartitions("ts_ms"))
    assert(zEnv.length >= nFiles - 2 && tsEnv.length >= nFiles - 2)

    val users = events.select("user_id").distinct().orderBy("user_id")
      .limit(40).collect().map(_.getLong(0))
    def candFiles(env: Array[(Long, Long, Long, Long)], u: Long): Int =
      env.count { case (umin, umax, _, _) => umin <= u && u <= umax }
    val zAvg = users.map(candFiles(zEnv, _)).sum.toDouble / users.length
    val tsAvg = users.map(candFiles(tsEnv, _)).sum.toDouble / users.length
    // ts-sorted files each span ~the whole user range: a user point
    // predicate keeps ~every file. Z-order must do strictly better on the
    // non-sort dimension — that asymmetry is the entire point.
    assert(tsAvg > zEnv.length * 0.8,
      s"ts layout unexpectedly prunes users (tsAvg=$tsAvg)")
    assert(zAvg < tsAvg / 2,
      s"z-order should at least halve candidate files: z=$zAvg vs ts=$tsAvg")

    // and z keeps real pruning power on ts too: a 1-day window must not
    // touch every file
    val (tmin, tmax) = {
      val r = events.agg(min("ts_ms"), max("ts_ms")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val dayStart = tmin + (tmax - tmin) / 2
    val dayEnd = dayStart + 86400000L
    val zTsCand = zEnv.count { case (_, _, fmin, fmax) =>
      fmin <= dayEnd && dayStart <= fmax }
    assert(zTsCand < zEnv.length,
      s"z layout lost all ts pruning: $zTsCand of ${zEnv.length}")
  }
}
