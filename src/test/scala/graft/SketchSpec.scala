package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Sketches

/** KMV / count-min sketch laws: mergeability, one-sided error, exactness
  * below k, and the partial-top-k plan shape the 100 TB story rests on. */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  private def events = Tables.load(spark, sf, "events")

  test("KMV is exact below k and within 2x above k") {
    val k = 32
    val sk = Sketches.kmvSketch(events, col("event_type"), col("user_id"), k)
      .select(col("grp"),
        Sketches.kmvEstimate(col("kmv"), col("n_kept"), k).as("est"),
        col("n_kept"))
    val exact = events.groupBy(col("event_type").as("grp"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val rows = sk.join(exact, "grp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, nKept, ex) = (r.getAs[Long]("est"), r.getAs[Int]("n_kept"),
        r.getAs[Long]("exact"))
      if (nKept < 32) assert(est === ex, s"below-k group must be exact: $r")
      // k=32 KMV has relative stddev ~ 1/sqrt(k-2) ≈ 18%; 2x is a loose
      // deterministic bound (the hash set is fixed, so this can't flake)
      else assert(est > ex / 2 && est < ex * 2, s"estimate off >2x: $r")
    }
  }

  test("KMV sketches merge: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    val k = 16
    val a = events.where(col("event_id") % 2 === 0)
    val b = events.where(col("event_id") % 2 === 1)
    def sketchOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.kmvSketch(df, lit(1), col("user_id"), k)
        .select(col("kmv")).collect().head.getSeq[Long](0)
    val skA = sketchOf(a)
    val skB = sketchOf(b)
    val skAll = sketchOf(events)
    // driver-side mirror of kmvMerge's array math
    val merged = (skA ++ skB).distinct.sorted.take(k)
    assert(merged === skAll)
    // and the Column version agrees with the driver-side mirror
    val viaCol = spark.range(1)
      .select(Sketches.kmvMerge(typedlit(skA), typedlit(skB), k).as("m"))
      .collect().head.getSeq[Long](0)
    assert(viaCol === merged)
  }

  test("CMS never under-counts; exact for tokens with collision-free rows") {
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val (d, w) = (4, 512)
    val grid = Sketches.cmsBuild(toks, col("tok"), d, w)
    val est = Sketches.cmsProbe(grid, toks.distinct(), d, w)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, "tok")
      .select(col("tok"), col("est_count"), col("exact")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("exact"),
        s"CMS under-counted: $r")
    }
  }

  test("cmsBuildWeighted over (tok, cnt) equals cmsBuild over instances") {
    import spark.implicits._
    val toks = Seq("a", "a", "a", "b", "b", "c", "dd", "dd", "dd", "dd")
      .toDF("tok")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val (d, w) = (4, 16)
    def cells(g: org.apache.spark.sql.DataFrame) =
      g.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells(Sketches.cmsBuildWeighted(counts, d, w)) ==
      cells(Sketches.cmsBuild(toks, col("tok"), d, w)))
  }

  test("kmvSketch plans a WindowGroupLimit (partial per-task top-k)") {
    val plan = Sketches.kmvSketch(events, col("event_type"), col("user_id"), 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("HLL sketches merge by register max: shards == whole corpus") {
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllSketch(df, col("event_type"), col("user_id"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val whole = regs(events)
    val a = regs(events.where(col("event_id") % 2 === 0))
    val b = regs(events.where(col("event_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0), b.getOrElse(k, 0))).toMap
    assert(merged == whole)
  }

  test("HLL estimate lands within 30% of exact in the raw regime") {
    // the raw (correction-free) estimator is only unbiased for
    // n > 2.5·m — use all event_ids in one group (~1k distinct), not
    // user_id (150 distinct, the linear-counting regime we deliberately
    // skip for cross-engine exactness; u11's err_pct column exposes it)
    val est = Sketches.hllEstimate(
      Sketches.hllSketch(events, lit("all"), col("event_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(lit("all").as("grp"))
      .agg(countDistinct(col("event_id")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      val e = est(k)
      assert(math.abs(e - x).toDouble / x < 0.30,
        s"$k: est=$e exact=$x off by ${math.abs(e - x).toDouble / x}")
    }
  }

  test("HLL state is register-bounded: <= 2^p rows per group") {
    val sk = Sketches.hllSketch(events, col("event_type"), col("user_id"), p = 6)
    val perGroup = sk.groupBy(col("grp")).count().collect()
    assert(perGroup.nonEmpty)
    perGroup.foreach(r => assert(r.getLong(1) <= 64))
  }
}
