package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, mergeable cardinality / frequency sketches for
  * 100 TB-scale profiling (SURVEY §7.3 "novel sketch" clause).
  *
  * Two classic sketches, built so every bit is reproducible in ANY engine
  * with md5 — no JVM hashCode, no RNG, no sampling nondeterminism — which
  * makes them oracle-checkable (DuckDB recomputes the identical estimate)
  * and audit-stable (a rerun on different cluster topology produces the
  * same sketch bytes):
  *
  *   - KMV (k-minimum-values) distinct-count: keep the k smallest 60-bit
  *     hashes of the value set per group; the k-th smallest, scaled to
  *     [0,1), estimates density, so distinct ≈ (k−1)/R_k  (Bar-Yossef et
  *     al. 2002, the theta-sketch ancestor). The sketch is an array of k
  *     longs — mergeable by "union then re-take k smallest", so
  *     per-partition / per-day sketches roll up without touching raw data.
  *
  *   - Count-min frequency sketch: a d×w grid of counters, counter(j, b) =
  *     Σ count of tokens hashing to bucket b under salt j; a token's
  *     estimate is min_j grid(j, bucket_j(token)) — always ≥ the true
  *     count (Cormode & Muthukrishnan 2005). The grid is d·w cells no
  *     matter the corpus size: heavy-hitter detection on 100 TB of text
  *     shuffles d·w counters per partition (map-side partial aggregation),
  *     never the vocabulary.
  *
  * Scale notes: the KMV per-group k-smallest uses a rank-filter window,
  * which Catalyst executes as WindowGroupLimit — each map task keeps only
  * its local top-k per group before the shuffle, so the exchange carries
  * ≤ k·groups rows, not the value set. The CMS grid (d·w ≈ 2k cells) is
  * broadcast back for probing; exact verification joins the corpus only
  * against the (tiny) candidate set, never the full vocabulary.
  */
object Sketches {

  /** 2^60 — exact in a double; hash space size for the 60-bit hashes. */
  val HashSpace: Double = 1152921504606846976.0

  /** 60-bit hash: first 15 hex chars of md5(salt ++ value-as-string),
    * parsed base-16. Fits a signed long with headroom; identical in DuckDB
    * via a fold over the hex digits. */
  def hash60(value: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), value.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Per-group KMV sketch: the k smallest distinct hashes, ascending.
    * Output: (grpCols..., kmv array<long>, n_kept int). */
  def kmvSketch(df: DataFrame, grp: Column, value: Column, k: Int): DataFrame = {
    val hashed = df.select(grp.as("grp"), hash60(value).as("h")).distinct()
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    // rank filter → WindowGroupLimit: partial per-task top-k before the
    // exchange, so the shuffle carries ≤ k rows per (task, group)
    hashed.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("h"))).as("kmv"),
        count(lit(1)).cast("int").as("n_kept"))
  }

  /** Distinct-count estimate from a KMV sketch row: exact when the group
    * had < k distinct values (the sketch IS the value set), else
    * floor((k−1) · 2^60 / h_k). Double math is IEEE-identical across
    * engines; floor avoids decimal-rounding-mode drift. */
  def kmvEstimate(kmv: Column, nKept: Column, k: Int): Column =
    when(nKept < k, nKept.cast("long")).otherwise(
      floor(lit((k - 1).toDouble) * lit(HashSpace) /
        element_at(kmv, k).cast("double")).cast("long"))

  /** Merge sketches (e.g. per-partition → global): union hash arrays,
    * dedup, keep the k smallest. Pure array ops — usable in an agg via
    * collect_list + flatten upstream. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Bloom filter as a relational bitmap (Bloom 1970): rows
    * (word, bits) where `word = pos / 32` and `bits` ORs `1 << (pos % 32)`
    * over every inserted value's k positions, position_j =
    * hash60(value, salt="j|") mod mBits. 32 bits per BIGINT word keeps
    * every mask positive, so the build and probe replay bit-identically in
    * any engine with 64-bit integers and md5 — no sign-extension or
    * shift-overflow divergence.
    *
    * The table is ≤ mBits/32 rows REGARDLESS of the inserted set's size —
    * that is the whole point: a contaminated-n-gram set too big to
    * broadcast raw (d8's shape) compresses ~50–100× into bits and still
    * broadcasts. Mergeable by construction: bit_or of two builds over the
    * same (mBits, k) is the filter of the union. False-positive rate
    * ≈ (1 − e^(−k·n/mBits))^k; never a false negative. */
  def bloomBuild(values: DataFrame, value: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32: $mBits")
    val pos = (0 until k).map(j =>
      pmod(hash60(value, salt = s"$j|"), lit(mBits.toLong)).cast("int"))
    values.select(explode(array(pos: _*)).as("p"))
      .select(shiftright(col("p"), 5).cast("long").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), p & 31)").as("m"))
      .groupBy(col("word"))
      .agg(bit_or(col("m")).as("bits"))
  }

  /** Count-min grid over `token`: rows (j, bucket, cnt) for j in 0..d-1.
    * d·w cells total; map-side partial agg means the shuffle is O(d·w)
    * per task regardless of corpus size. */
  def cmsBuild(tokens: DataFrame, token: Column, d: Int, w: Int): DataFrame = {
    tokens.select(token.as("tok"))
      .select(col("tok"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .groupBy(col("j"), cmsBucket(col("tok"), col("j"), w).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[cmsBuild]] from PRE-AGGREGATED (tok, cnt) rows — the map-side-
    * combine form: grid cell = sum of weights instead of a count of
    * instances, identical result. Use when token counts already exist
    * (they are the natural shuffle output of a corpus token pass); the
    * explode then multiplies the compact vocabulary, not the corpus. */
  def cmsBuildWeighted(tokenCounts: DataFrame, d: Int, w: Int): DataFrame = {
    tokenCounts.select(col("tok"), col("cnt"))
      .select(col("tok"), col("cnt"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .groupBy(col("j"), cmsBucket(col("tok"), col("j"), w).as("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Bucket of `token` in sketch row j: hash60("j|token") mod w. */
  def cmsBucket(token: Column, j: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit("|"),
      token.cast("string"))), 1, 15), 16, 10).cast("long"), lit(w.toLong))

  /** HyperLogLog registers (Flajolet et al. 2007), exact-arithmetic
    * variant: per group, bucket = low `p` bits of the 60-bit hash, and the
    * register is the max over values of `rho` = 1 + leading zeros of the
    * remaining 54-bit window. Output rows are (grp, bucket, reg) — only
    * POPULATED registers, ≤ 2^p per group no matter the data size, and
    * `max` makes them mergeable across shards/days by a plain
    * `groupBy(grp, bucket).max(reg)` (property-tested in SketchSpec).
    * `rho` uses `bin()` string length, not log2 — integer on both engines,
    * so sketches are bit-identical cross-engine. */
  def hllSketch(df: DataFrame, grp: Column, value: Column,
      p: Int = 6): DataFrame = {
    val m = 1L << p
    df.select(grp.as("grp"), hash60(value).as("h"))
      .select(col("grp"), pmod(col("h"), lit(m)).as("bucket"),
        expr(s"h div $m").as("r"))
      .withColumn("rho", when(col("r") === 0, lit(55))
        .otherwise(lit(55) - length(expr("bin(r)"))))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
  }

  /** HLL α_m constant (m = 2^p registers). */
  def hllAlpha(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Raw HLL estimate from sketch rows: α_m·m² / Σ_j 2^(−M_j). The
    * harmonic-mean denominator is computed as the INTEGER
    * Σ_j 2^(55−M_j) (empty registers contribute 2^55) — dyadic terms sum
    * exactly in any order, and the single double division at the end is
    * IEEE-identical on every engine, so the estimate hash-checks against
    * DuckDB. (The small-range linear-counting correction is deliberately
    * omitted — it needs ln(), whose last ulp is libm-dependent; the raw
    * estimator is the cross-engine-reproducible one.)
    * Output: (grp, hll_distinct bigint). */
  def hllEstimate(sk: DataFrame, p: Int = 6): DataFrame = {
    val m = 1L << p
    sk.groupBy(col("grp"))
      .agg((sum(expr("shiftleft(cast(1 as bigint), 55 - reg)"))
        + (lit(m) - count(lit(1))) * lit(1L << 55)).as("t"))
      .select(col("grp"),
        floor(lit(hllAlpha(p) * m * m) * lit((1L << 55).toDouble)
          / col("t").cast("double")).cast("long").as("hll_distinct"))
  }

  /** Point-query the grid for each row of `candidates(tok)`:
    * est = min over j of grid(j, bucket_j(tok)). The grid side is tiny —
    * broadcast it so probing any number of candidates is shuffle-free on
    * the grid. Output: (tok, est_count). */
  def cmsProbe(grid: DataFrame, candidates: DataFrame, d: Int, w: Int): DataFrame = {
    val probes = candidates.select(col("tok"))
      .select(col("tok"), explode(sequence(lit(0), lit(d - 1))).as("j"))
      .withColumn("bucket", cmsBucket(col("tok"), col("j"), w))
    probes.join(broadcast(grid), Seq("j", "bucket"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("est_count"))
  }
}
