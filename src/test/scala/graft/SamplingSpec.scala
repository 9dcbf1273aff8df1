package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = graft.core.Tables.load(spark, sf, "documents")

  test("threshold hex math: boundaries and keep-all/keep-none") {
    assert(Sampling.thresholdHex(0.25) == "4000")
    assert(Sampling.thresholdHex(0.5) == "8000")
    assert(Sampling.thresholdHex(1.0) == "g")   // sorts above any hex digit
    assert(Sampling.thresholdHex(1.5) == "g")
    assert(Sampling.thresholdHex(0.0) == "")
  }

  test("deterministic: same membership across runs and repartitionings") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("nested rates: the 10% sample is a strict subset of the 30% sample") {
    val s10 = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s30 = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s30))
    assert(s10.size < s30.size)
  }

  test("stratified: per-class rates hit their targets; default keeps all") {
    val n = docs.count().toDouble
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en classes survive untouched
    byLang.keys.filter(_ != "en").foreach(l => assert(kept(l) == byLang(l)))
    // en is actually downsampled, toward ~25% (sf0.001 has only ~20 en
    // docs, so the binomial spread is wide — bound loosely)
    val enFrac = kept.getOrElse("en", 0L).toDouble / byLang("en")
    assert(enFrac < 0.6, s"en kept fraction $enFrac")
    assert(kept.getOrElse("en", 0L) < byLang("en"))
  }

  test("mixture: binding class keeps all, rates track target proportions") {
    val sizes = Map("a" -> 1000L, "b" -> 500L, "c" -> 100L)
    // target 50/30/20: c is binding (0.2/100 = 2e-3 max ratio)
    val rates = Sampling.mixtureRates(sizes,
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(rates("c") == 1.0)
    // kept_k = size_k * rate_k must be proportional to the weights
    val kept = rates.map { case (k, r) => k -> sizes(k) * r }
    assert(math.abs(kept("a") / kept("c") - 2.5) < 1e-9) // 0.5 / 0.2
    assert(math.abs(kept("b") / kept("c") - 1.5) < 1e-9) // 0.3 / 0.2
    // weighted classes absent from the corpus are skipped, not divide-by-zero
    val partial = Sampling.mixtureRates(Map("a" -> 10L),
      Map("a" -> 0.7, "ghost" -> 0.3))
    assert(partial.keySet == Set("a") && partial("a") == 1.0)
    // end-to-end: unweighted classes are dropped entirely
    val mixed = Sampling.mixture(docs, "doc_id", "lang",
      Map("en" -> 0.5, "zh" -> 0.5))
    val langs = mixed.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "zh")))
  }

  test("temperature mixing: T=1 is natural (keep all), higher T flattens") {
    val sizes = Map("big" -> 10000L, "small" -> 100L)
    // T=1: weights proportional to sizes -> every rate is 1.0
    val natural = Sampling.mixtureRates(sizes,
      Sampling.temperatureWeights(sizes, temperature = 1.0))
    assert(natural.values.forall(r => math.abs(r - 1.0) < 1e-12))
    // T=2: w = sqrt(share); the small class binds at 1.0 and the big
    // class thins by sqrt(small/big) = 0.1
    val flat = Sampling.mixtureRates(sizes,
      Sampling.temperatureWeights(sizes, temperature = 2.0))
    assert(flat("small") == 1.0)
    assert(math.abs(flat("big") - 0.1) < 1e-9, s"got ${flat("big")}")
    // end-to-end: dominant language keeps a smaller fraction than a rare one
    val mixed = Sampling.temperatureMixture(docs, "doc_id", "lang", 2.0)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = byLang.minBy(_._2)._1
    assert(kept(rarest) == byLang(rarest), "rarest class must keep everything")
    val enFrac = kept.getOrElse("en", 0L).toDouble / byLang("en")
    assert(enFrac < 1.0, s"dominant class must thin, kept $enFrac")
  }

  test("weighted sample: fixed size, deterministic, length-biased") {
    val n = 60
    val s1 = Sampling.weightedSample(docs, "doc_id", "n_chars", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(docs.repartition(13), "doc_id",
      "n_chars", n).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "membership must be a pure function of (id, weight)")
    assert(s1.size == n)
    // inclusion prob ∝ weight: the sample's mean doc length must exceed
    // the corpus mean by a clear margin on this fixture
    val all = docs.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpusMean = all.values.sum.toDouble / all.size
    val sampleMean = s1.toSeq.map(all).sum.toDouble / n
    assert(sampleMean > corpusMean * 1.1,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("weighted sample grouped: n per class via WindowGroupLimit") {
    val g = Sampling.weightedSampleGrouped(docs, "doc_id", "n_chars",
      "source", n = 3)
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side per-group truncation:\n$plan")
    val counts = g.groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= 3))
  }

  test("token budget: hash-prefix admission, straddler kept, minimal over-budget") {
    import graft.ops.TextAnalysis
    val budget = 700L
    val kept = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), Map("src3" -> budget))
    // unfunded classes are dropped entirely
    assert(kept.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("src3"))
    val rows = kept
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the kept set is EXACTLY a prefix of the class in hash order
    val ordered = docs.where(col("source") === "src3")
      .select(col("doc_id"), Sampling.hash48(col("doc_id")).as("h"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
      .orderBy(col("h"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val prefix = ordered.take(rows.size)
    assert(prefix.map(_._1).toSet == rows.keySet,
      s"kept set must be the hash-order prefix")
    // budget met, and dropping the straddler would fall under
    val total = prefix.map(_._2).sum
    assert(total >= budget && total - prefix.last._2 < budget,
      s"budget law violated: total=$total last=${prefix.last._2}")
    // a budget >= the class total keeps the class whole
    val whole = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")), Map("src3" -> 10000000L))
    assert(whole.count() == docs.where(col("source") === "src3").count())
    // a ZERO budget admits NOTHING: the admission law is "exclusive
    // running prefix < budget" uniformly and no prefix sits below zero —
    // a zero-funded class is explicitly excluded while listed (the
    // straddler rule never fires: no doc crosses an already-met budget)
    val zero = Sampling.tokenBudgetSample(docs, "doc_id", "source",
      TextAnalysis.tokenCount(col("text")),
      Map("src3" -> 0L, "src4" -> budget))
    assert(zero.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("src4"),
      "budget 0 must admit nothing from the zero-funded class")
  }

  test("weighted priority: uniform weights degenerate to hash order") {
    // with w == 1 everywhere the priority IS the 48-bit hash, so the
    // weighted sample equals the n smallest hashes — ties to plain
    // deterministic sampling
    val n = 20
    val got = Sampling.weightedSample(
      docs.withColumn("one", lit(1L)), "doc_id", "one", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = docs.select(col("doc_id"),
      Sampling.hash48(col("doc_id")).as("h"))
      .orderBy(col("h"), col("doc_id")).limit(n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }
}
