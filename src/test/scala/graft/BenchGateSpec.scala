package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench probe-noise gate: synthetic probe series in, noisy verdict
  * out — no Spark session needed. The gate is what stops a loaded-machine
  * run from being read as a cross-round regression. */
class BenchGateSpec extends AnyFunSuite {

  test("median: odd, even, sentinel-filtered, empty") {
    assert(Bench.probeMedian(Seq(0.3, 0.1, 0.5)) == 0.3)
    assert(math.abs(Bench.probeMedian(Seq(0.2, 0.4)) - 0.3) < 1e-12)
    // -1.0 failure sentinels must not drag the median down
    assert(Bench.probeMedian(Seq(-1.0, 0.4, 0.4, -1.0)) == 0.4)
    assert(Bench.probeMedian(Nil) == -1.0)
  }

  test("a quiet run is not noisy") {
    val quiet = Seq.fill(30)(0.29) ++ Seq.fill(3)(0.35)
    assert(!Bench.isNoisy(quiet, normSec = 0.3))
  }

  test("a loaded-machine run trips the gate") {
    // uniform ~2x drift on every probe — the r13 snapshot shape
    val loaded = Seq.fill(30)(0.62)
    assert(Bench.isNoisy(loaded, normSec = 0.3))
  }

  test("one noisy neighbor cannot tip the median") {
    val oneSpike = Seq.fill(29)(0.30) :+ 9.0
    assert(!Bench.isNoisy(oneSpike, normSec = 0.3))
  }

  test("no probes -> not noisy (gate stays silent, never blocks)") {
    assert(!Bench.isNoisy(Nil))
  }

  test("a single bursty query stamps that query, not the run") {
    // one query's probes ran inside a burst; 20 others are quiet — the
    // run-level gates must stay green while the stamp names the query
    val perQuery = (1 to 20).map(i => s"q$i" -> Seq(0.30, 0.29, 0.31)) :+
      ("qburst" -> Seq(1.3, 2.4, 1.8))
    assert(Bench.noisyQueries(perQuery, normSec = 0.3) == Seq("qburst"))
    assert(!Bench.isNoisy(perQuery.flatMap(_._2), normSec = 0.3),
      "3 bursty probes of 63 must trip neither the median nor the tail")
    // the stamp keys on the query's own MEDIAN: one slow probe out of
    // three (a cache-cold rep) does not flag it
    assert(Bench.noisyQueries(Seq("q" -> Seq(0.30, 2.0, 0.31))).isEmpty)
    // failure sentinels don't suppress a genuine stamp (inside a quiet
    // run — the baseline is the run's own probe median)
    assert(Bench.noisyQueries(
      (1 to 10).map(i => s"p$i" -> Seq(0.30, 0.31, 0.29)) :+
        ("q" -> Seq(-1.0, 0.9, 0.8))) == Seq("q"))
    // no probes -> no stamp
    assert(Bench.noisyQueries(Seq("q" -> Nil)).isEmpty)
    // UNIFORM drift is the run-level gate's business, not a per-query
    // signal: a whole run at 0.44 (norm 0.30) must stamp NOTHING — the
    // baseline is the run's own quiet floor (p25), so only queries
    // noisier than their own run flag
    val drifted = (1 to 20).map(i => s"q$i" -> Seq(0.44, 0.43, 0.45))
    assert(Bench.noisyQueries(drifted, normSec = 0.3).isEmpty,
      "uniform drift must not mass-stamp the suite")
    // ...while a genuine burst inside that drifted run still stamps
    assert(Bench.noisyQueries(drifted :+ ("qburst" -> Seq(1.5, 1.8, 1.2)),
      normSec = 0.3) == Seq("qburst"))
    // the p25 floor closes the bimodal blind spot a run-median baseline
    // would open: a sustained burst over HALF the suite (0.60 vs a 0.28
    // quiet half, run median 0.44 — under the run gate) must stamp the
    // loaded half, not hide inside its own lifted median
    val bimodal = (1 to 10).map(i => s"quiet$i" -> Seq(0.28, 0.28, 0.28)) ++
      (1 to 10).map(i => s"loaded$i" -> Seq(0.60, 0.61, 0.59))
    val stamped = Bench.noisyQueries(bimodal, normSec = 0.3)
    assert(stamped.size == 10 && stamped.forall(_.startsWith("loaded")),
      s"a half-run burst must stamp exactly the loaded half: $stamped")
  }

  test("a localized load burst trips the tail gate even with a quiet median") {
    // an external spike covering a third of the run: the affected
    // queries' numbers are garbage while the run-wide median stays quiet
    val burst = Seq.fill(20)(0.30) ++ Seq.fill(10)(1.0)
    assert(Bench.isNoisy(burst, normSec = 0.3))
    // but a handful of mildly-elevated probes (cache-cold first reps)
    // stays quiet — the tail gate needs a real 2.5x excursion
    val mild = Seq.fill(24)(0.30) ++ Seq.fill(6)(0.5)
    assert(!Bench.isNoisy(mild, normSec = 0.3))
  }

  test("famDigest: detects drops, renames and failures name-level (r18)") {
    val base = Seq("q1_a" -> 1.0, "q2_b" -> 2.0, "d3_c" -> 0.5, "d7_x" -> 0.1)
    val same = Bench.famDigest(base)
    // order-independent: the digest is over sorted names
    assert(Bench.famDigest(base.reverse) == same)
    assert(same.contains("\"q\":[2,") && same.contains("\"d\":[2,"))
    // a query getting FASTER (the r17 false-positive shape) changes nothing
    assert(Bench.famDigest(base.map { case (k, v) => k -> (v / 10) }) == same)
    // a dropped query changes its family's count
    assert(Bench.famDigest(base.take(3)) != same)
    // a renamed query keeps the count but changes the hash
    assert(Bench.famDigest(base.updated(3, "d7_y" -> 0.1)) != same)
    // a FAILED query (sentinel -1.0) leaves the passed set, like a drop
    assert(Bench.famDigest(base.updated(1, "q2_b" -> -1.0)) != same)
  }
}
