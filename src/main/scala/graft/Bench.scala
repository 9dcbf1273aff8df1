package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query at SPARK_GRAFT_SF_DIR,
  * prints a verbose per-query JSON line, a final compact JSON line sized to
  * survive the harvester's bounded log tail, and writes full detail to
  * BENCH_FULL.json. A short untimed warmup amortizes JVM/codegen startup out
  * of the first measured query; queries run in sorted name order so runs are
  * comparable across rounds.
  */
object Bench {

  /** Median of the non-negative probe samples; -1 if there are none. */
  def probeMedian(probes: Seq[Double]): Double = {
    val good = probes.filter(_ >= 0).sorted
    if (good.isEmpty) -1.0
    else if (good.size % 2 == 1) good(good.size / 2)
    else (good(good.size / 2 - 1) + good(good.size / 2)) / 2.0
  }

  /** Probe-noise gate: a bench run whose MACHINE-LOAD probe median exceeds
    * `factor` x the quiet-machine norm was recorded under external load —
    * its query times are not comparable across rounds and must not be read
    * as regressions (r9 e4 / r10 e14 both burned a round on exactly this).
    * The run is still written, but stamped `"noisy": true` so the reader
    * refuses it instead of adjudicating it. */
  def isNoisy(probes: Seq[Double], normSec: Double = 0.3,
      factor: Double = 1.5): Boolean = {
    val m = probeMedian(probes)
    // the median alone lets a LOCALIZED spike through: an external load
    // burst covering a 10-minute stretch of a 25-minute run inflates
    // every query in that window 3-6x while the run-wide median stays
    // quiet (observed: k17 2.7s -> 13.6s with its three probes at
    // 0.6/1.1/1.9 against a 0.42 run median). The tail gate catches it:
    // if a tenth of the probes ran >= 2.5x the norm, some queries'
    // numbers reflect machine load, not code.
    val tailNoisy = probes.nonEmpty && {
      val sorted = probes.sorted
      val p90 = sorted(math.min(sorted.size - 1, (sorted.size * 9) / 10))
      p90 > normSec * 2.5
    }
    (m >= 0 && m > normSec * factor) || tailNoisy
  }

  /** Per-QUERY noise stamps: a query whose OWN probe median exceeds
    * `factor` x the RUN's probe level ran inside a localized load burst
    * even when the run-level gates pass (a committed quiet-median run
    * carried s15 at 5.67s vs 2.58s on a quiet re-run, its probes at
    * 0.48/0.55/1.45 against a 0.41 run median). Such numbers are load
    * artifacts: the flagged queries stay in the artifact — the run is
    * still valid — but cross-round comparisons must skip them instead of
    * reading them as regressions.
    *
    * The baseline is `max(normSec, the run's LOWER-QUARTILE probe)`: a
    * stamp marks a query noisier than its own run's quiet floor.
    * Measuring against the absolute norm alone mass-stamps half the
    * suite whenever the whole run drifts a few hundredths above it
    * (uniform drift is the run-level gate's job, not a per-query
    * signal); measuring against the run MEDIAN instead would open a
    * bimodal blind spot — a sustained burst covering up to half the
    * suite lifts the median enough to hide itself from both gates. The
    * p25 floor keeps uniform drift unstamped while a burst over any
    * minority-to-half slice of the run still flags its queries. The
    * per-query median (not max) stamps, so one slow probe out of `reps`
    * — a cache-cold first rep, say — does not flag a query. */
  def noisyQueries(perQuery: Seq[(String, Seq[Double])],
      normSec: Double = 0.3, factor: Double = 1.5): Seq[String] = {
    val good = perQuery.flatMap(_._2).filter(_ >= 0).sorted
    val p25 = if (good.isEmpty) normSec else good((good.size - 1) / 4)
    val base = math.max(normSec, p25)
    perQuery.collect {
      case (name, probes)
          if probeMedian(probes) >= 0 &&
            probeMedian(probes) > base * factor =>
        name
    }
  }

  /** Name-level coverage that SURVIVES the bounded log tail: the compact
    * line lists only the slowest queries, and r17's PERF diff read the 12
    * healthy queries that got faster and fell below the cutoff as
    * "dropped_from_bench". Per family (name prefix before the first
    * digit): `[count of passed queries, 4-hex MD5 over their sorted
    * names]` — a dropped, renamed or newly-failing query changes its
    * family's count or digest, so two consecutive compact lines alone
    * prove 0 drops without consulting BENCH_FULL (~260 chars for 15
    * families, well inside the tail budget). */
  def famDigest(results: Seq[(String, Double)]): String =
    results.filter(_._2 >= 0)
      .groupBy(_._1.takeWhile(!_.isDigit)).toSeq.sortBy(_._1)
      .map { case (f, qs) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(qs.map(_._1).sorted.mkString(",").getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        "\"" + f + "\":[" + qs.size + ",\"" + h + "\"]"
      }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // local-FS fork removal (BareLocalFs doc): without the native hadoop
    // lib every file create/checkpoint rename forks a chmod/readlink shell
    graft.core.BareLocalFs.sparkConf.foreach { case (k, v) =>
      builder.config(k, v)
    }
    val spark = builder
      // size-first AQE coalescing (docs-recommended): default
      // parallelismFirst=true pins tiny shuffles at `cpus` tasks; size-first
      // collapses them to the advisory size — same behavior at real scale,
      // far less scheduling overhead on small inputs
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: flagship query + a first touch of each fact table so parquet
    // footer reads and codegen init are amortized out of the first
    // measured query (startup cost, not operator cost). KFS fixture seeding
    // is likewise harness setup, not query cost — a wiped /tmp would
    // otherwise bill segment writing to the first k/s/e query.
    try {
      SparkEntry.entry(spark).count()
      Seq("documents", "embeddings", "lineitem").foreach(t =>
        graft.core.Tables.load(spark, sfDir, t).count())
      graft.kfs.KfsSeed.seededRoot(spark, sfDir)
    } catch { case _: Throwable => }

    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Repetitions (SPARK_GRAFT_REPS, default 3): single-shot timings on
    // local[32] swing up to 9x between identical binaries (GC, page cache,
    // compilation — measured r5 vs r6), so each query runs `reps` times and
    // the MIN is reported — the noise floor is the comparable number; all
    // rep times go to BENCH_FULL.json for outlier forensics. Stateful
    // queries get a fresh fixture root per rep (Fixtures.runSuffix) so
    // every rep does full work instead of replaying a checkpoint no-op.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
    // unique per invocation: a re-run must not resume a previous bench's
    // checkpoints (that measures the skip path, not the operator)
    val benchId = s"bench${System.currentTimeMillis()}"
    // first failure message per query — without this, a round of -1.0
    // sentinels is undiagnosable from the artifacts alone (round 7: 60
    // queries failed and the root cause needed a manual re-run to surface)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Machine-load probe: fixed, query-independent work (one tiny shuffle
    // job) timed adjacent to every rep. Two consecutive rounds ended a
    // regression hunt at "external machine load" (r9 e4, r10 e14) — the
    // probe series lets the verdict-writer separate noise (probe slow too)
    // from a real regression (probe steady, query slow) WITHOUT re-runs.
    def loadProbe(): Double = {
      val p0 = System.nanoTime()
      spark.range(1 << 18).selectExpr("count(distinct (id % 1024))").collect()
      (System.nanoTime() - p0) / 1e9
    }
    loadProbe() // untimed first call absorbs the probe's own codegen cost
    // ambient-load stamps: the Spark probe catches Spark-VISIBLE
    // contention, but this machine demonstrably carries EXTERNAL load
    // bursts the probe under-reads (r16's uptick cluster adjudicated to
    // exactly that); /proc/loadavg at run start and end gives cross-round
    // readers the OS-level picture without shell archaeology
    def loadAvg(): Seq[Double] =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split("\\s+").take(3).map(_.toDouble).toSeq
      catch { case _: Throwable => Nil }
    def loadJson(l: Seq[Double]) =
      l.map(v => "%.2f".formatLocal(java.util.Locale.ROOT, v))
        .mkString("[", ",", "]")
    val loadStart = loadAvg()
    // SPARK_GRAFT_WARMUP=0 disables the untimed warm-up rep (on by default:
    // rep-1 times previously carried each query's janino/JIT warm-up, which
    // read as 1.5-2.5x rep spread in BENCH_FULL)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val detail = SparkEntry.queryDefs.sortBy(_.name)
      .filter(d => only.forall(_.contains(d.name)))
      .map { d =>
        val name = d.name
        // (seedSec, execSec, probeSec) per rep; declared seed phases
        // (fixture estate writes) are timed apart from the operator so
        // setup cost never inflates the query number — both still sum into
        // the headline total for cross-round comparability
        if (warmup) {
          graft.queries.Fixtures.runSuffix = s"${benchId}_rep0"
          try { d.seed.foreach(_(spark, sfDir)); d.fn(spark, sfDir).count() }
          catch { case _: Throwable => () } // real reps will report it
          spark.catalog.clearCache()
        }
        val times = (1 to reps).map { r =>
          graft.queries.Fixtures.runSuffix = s"${benchId}_rep$r"
          def guarded(body: => Unit): Boolean =
            try { body; true }
            catch { case e: Throwable =>
              if (!errors.contains(name)) {
                val msg = Option(e.toString).getOrElse(e.getClass.getName)
                  .replaceAll("[\\r\\n\\t\"\\\\]", " ").take(300)
                errors += name -> msg
                println(s"BENCH FAIL $name: $msg")
              }
              false
            }
          val probeSec = loadProbe()
          val s0 = System.nanoTime()
          val seedOk = guarded(d.seed.foreach(_(spark, sfDir)))
          val seedSec = (System.nanoTime() - s0) / 1e9
          val t0 = System.nanoTime()
          val ok = seedOk && guarded(d.fn(spark, sfDir).count())
          val dt = (System.nanoTime() - t0) / 1e9
          // drop persisted intermediates so queries don't contend for
          // storage memory with later ones (r1: d7 was 65s in-suite vs 24s
          // standalone purely from leaked shingle-explode caches)
          spark.catalog.clearCache()
          (if (d.seed.isDefined) seedSec else 0.0, if (ok) dt else -1.0,
            probeSec)
        }
        graft.queries.Fixtures.runSuffix = ""
        (name, times, d.seed.isDefined)
      }
    // best-effort scratch cleanup: the per-rep fixture roots are only
    // meaningful within this invocation
    try {
      val sfName = new java.io.File(sfDir).getName
      (0 to reps).foreach { r =>
        // derive from Fixtures so the path tracks its version bumps (this
        // briefly pointed at a stale v2 root and cleaned nothing)
        graft.queries.Fixtures.runSuffix = s"${benchId}_rep$r"
        val repRoot = java.nio.file.Paths
          .get(graft.queries.Fixtures.tmp(sfDir, "x")).getParent
        graft.queries.Fixtures.runSuffix = ""
        val root = repRoot
        if (java.nio.file.Files.exists(root)) {
          java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
    } catch { case _: Throwable => }
    // headline per-query value = min over reps of seed+exec wall (the same
    // quantity earlier rounds measured); seed/exec splits go to BENCH_FULL
    val combined = detail.map { case (name, times, _) =>
      name -> times.map { case (s, e, _) => if (e >= 0) s + e else -1.0 }
    }
    val results = combined.map { case (name, times) =>
      val good = times.filter(_ >= 0)
      name -> (if (good.nonEmpty) good.min else -1.0)
    }
    // The harvester keeps only the LAST 2000 chars of the sbt log (measured
    // from BENCH_r04.json: tail len == 2000, with ~75 chars of trailing sbt
    // "[success]" output). A single full 83-query JSON line is ~2100 chars,
    // so it gets front-truncated and has failed to parse in every round so
    // far (parsed:null). Emit three artifacts instead:
    //   1. BENCH_FULL.json in the repo — complete per-query detail, pretty
    //      enough for the judge to diff across rounds;
    //   2. a verbose log line (full map, 3dp) — may be truncated, fine;
    //   3. a FINAL compact line guaranteed <= ~1500 chars: total + the
    //      slowest queries that fit — this is the line the harvester parses.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // total sums PASSED queries only — summing -1.0 sentinels makes failure
    // look like speed (round 7's headline was a meaningless -0.809)
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // probe-noise gate over ALL reps' probe samples (each query contributes
    // `reps` probes, so one noisy neighbor can't tip the median)
    val allProbes = detail.flatMap(_._2.map(_._3))
    // quiet-machine norm RECALIBRATED for the tmpfs scratch substrate
    // (r18): the probe is itself one tiny shuffle, so moving shuffle
    // files off ext4 moved its quiet floor from ~0.41 s to ~0.19-0.21 s
    // (measured on back-to-back runs). Keeping the old 0.3 would have
    // silently laxened both gates to ~2.2x quiet.
    val probeNorm = sys.env.get("SPARK_GRAFT_PROBE_NORM")
      .map(_.toDouble).getOrElse(0.2)
    val probeMed = probeMedian(allProbes)
    val noisy = isNoisy(allProbes, probeNorm)
    if (noisy)
      println(s"BENCH NOISY: median probe ${f3(probeMed)}s exceeds 1.5x the " +
        s"${f3(probeNorm)}s quiet norm — query times reflect machine load, " +
        "re-run on a quiet machine before comparing across rounds")
    // per-query stamps: even in a run-level-quiet run, a localized burst
    // can sit under single queries — their numbers carry the flag so the
    // cross-round reader excludes (or re-runs) exactly those
    val qNoisy = noisyQueries(
      detail.map { case (k, ts, _) => k -> ts.map(_._3) }, probeNorm)
    val qNoisyJson = qNoisy.map("\"" + _ + "\"").mkString("[", ",", "]")
    if (qNoisy.nonEmpty)
      println(s"BENCH NOISY QUERIES (own probe median > 1.5x norm — exclude " +
        s"from cross-round comparison): ${qNoisy.mkString(",")}")
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":$reps,"agg":"min","failed":${failed.size},"failed_queries":$failedJson,"noisy":$noisy,"noisy_queries":$qNoisyJson,"probe_median":${f3(probeMed)},"loadavg_start":${loadJson(loadStart)},"queries":$fullQs,"sf":"$sfDir"}"""
    // BENCH_FULL.json additionally carries every repetition's time so a
    // suspicious min can be checked against its spread without a re-run
    val repQs = combined.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(f3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // percentiles across reps (nearest-rank) — with small rep counts p95 is
    // effectively the max, which is exactly the outlier bound wanted
    def pct(ts: Seq[Double], p: Double): Double = {
      val good = ts.filter(_ >= 0).sorted
      if (good.isEmpty) -1.0
      else good(math.min(good.size - 1, math.ceil(p * good.size).toInt - 1).max(0))
    }
    val p50Qs = combined.map { case (k, ts) => "\"" + k + "\":" + f3(pct(ts, 0.50)) }
      .mkString("{", ",", "}")
    val p95Qs = combined.map { case (k, ts) => "\"" + k + "\":" + f3(pct(ts, 0.95)) }
      .mkString("{", ",", "}")
    // seed/exec split for composed queries with a declared seed phase: both
    // are the min over reps (paired with the headline's agg)
    val seeded = detail.filter(_._3)
    val seedQs = seeded.map { case (k, ts, _) =>
      "\"" + k + "\":" + f3(ts.map(_._1).min)
    }.mkString("{", ",", "}")
    val execQs = seeded.map { case (k, ts, _) =>
      val good = ts.map(_._2).filter(_ >= 0)
      "\"" + k + "\":" + f3(if (good.nonEmpty) good.min else -1.0)
    }.mkString("{", ",", "}")
    // per-rep machine-load probe series: a slow rep with a slow adjacent
    // probe is environment drift, not a regression
    val probeQs = detail.map { case (k, ts, _) =>
      "\"" + k + "\":[" + ts.map(t => f3(t._3)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val loadEnd = loadAvg()
    val fullFile =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","reps":$reps,"agg":"min","warmup":$warmup,"failed":${failed.size},"failed_queries":$failedJson,"noisy":$noisy,"noisy_queries":$qNoisyJson,"probe_median":${f3(probeMed)},"loadavg_start":${loadJson(loadStart)},"loadavg_end":${loadJson(loadEnd)},"errors":$errJson,"queries":$fullQs,"p50":$p50Qs,"p95":$p95Qs,"seed_s":$seedQs,"exec_s":$execQs,"rep_times":$repQs,"probe_s":$probeQs,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullFile + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => }
    println(fullLine)
    val fam = famDigest(results)
    // compact: slowest-first entries until the 1500-char budget is spent
    val sfShort = new java.io.File(sfDir).getName
    val slowFirst = results.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
    val budget = 1500 - 120 - (fam.length + 8) // prefix/suffix allowance
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    slowFirst.foreach { e =>
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    val compactQs = kept.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":${results.size},"reps":$reps,"failed":${failed.size},"noisy":$noisy,"noisy_q":${qNoisy.size},"fam":$fam,"queries":$compactQs,"listed":${kept.size},"sf":"$sfShort"}""")
    spark.stop()
  }
}
