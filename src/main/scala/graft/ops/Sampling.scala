package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (beyond-reference
  * superset): class rebalancing (downsample the over-represented language),
  * corpus mixing, and reproducible holdouts.
  *
  * Mechanism: a row is kept iff the first `hexDigits` of `md5(id)` sort
  * below the rate's hex threshold. Three properties a 100 TB pipeline
  * needs that `df.sample()` (RNG per task) does not give:
  *
  *   - **Reproducible anywhere**: md5 of the id string is identical in
  *     Spark, DuckDB, Python, … — the sample is a pure function of the id,
  *     so an audit or a re-run on another engine selects the same rows
  *     (the t10 oracle proves it cross-engine).
  *   - **Stable under repartition/retry**: no RNG state, no seed-per-task;
  *     task retries and different partitionings cannot change membership.
  *   - **Nested rates**: threshold sampling makes the 10% sample a strict
  *     subset of the 20% sample — growing a training mix never discards
  *     previously selected documents.
  *
  * All column work is built-in expressions (md5/substring/comparison), so
  * it stays inside whole-stage codegen on the scan.
  */
object Sampling {

  /** First `hexDigits` chars of md5(id) — the row's sampling bucket. */
  def hashBucket(id: Column, hexDigits: Int = 4): Column =
    substring(md5(id.cast("string")), 1, hexDigits)

  /** Hex threshold for a keep-rate in [0,1]. Rates >= 1 return "g", which
    * sorts above every hex digit, keeping all rows. */
  def thresholdHex(rate: Double, hexDigits: Int = 4): String = {
    val buckets = 1L << (4 * hexDigits)
    val n = math.round(rate * buckets)
    if (n >= buckets) "g"
    else if (n <= 0) "" // below every non-empty bucket: keeps nothing
    else ("%0" + hexDigits + "x").format(n)
  }

  /** Keep ~rate of rows, deterministically by id. */
  def deterministicSample(
      df: DataFrame, idCol: String, rate: Double,
      hexDigits: Int = 4): DataFrame =
    df.filter(hashBucket(col(idCol), hexDigits) < lit(thresholdHex(rate, hexDigits)))

  /** Per-class keep-rates (class rebalancing): rows of a class in `rates`
    * keep that rate; others keep `defaultRate`. */
  def stratified(
      df: DataFrame, idCol: String, classCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      hexDigits: Int = 4): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdHex(defaultRate, hexDigits)): Column) {
      case (acc, (cls, rate)) =>
        when(col(classCol) === cls, lit(thresholdHex(rate, hexDigits))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), hexDigits) < thr)
  }

  /** Keep-rates that make the OUTPUT class proportions match `weights`
    * while keeping as much data as possible: the binding class (largest
    * weight-to-size ratio) keeps everything, the rest downsample —
    * `rate_c = (w_c / size_c) / max_k(w_k / size_k)`, so
    * `kept_c ∝ w_c` exactly. The standard way a pretraining mix turns
    * "40% web, 40% code, 20% books" into per-corpus sampling rates. */
  def mixtureRates(sizes: Map[String, Long],
      weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty, "mixture weights must be non-empty")
    val ratios = weights.collect {
      case (cls, w) if sizes.getOrElse(cls, 0L) > 0 => cls -> w / sizes(cls)
    }
    require(ratios.nonEmpty, s"no weighted class present in the corpus")
    val binding = ratios.values.max
    ratios.map { case (cls, r) => cls -> r / binding }
  }

  /** Temperature-sampling weights: w_c = (n_c / N)^(1/T) — the standard
    * multilingual/pretraining rebalance (T=1 keeps natural proportions;
    * higher T flattens toward uniform, upweighting low-resource classes).
    * Feed into [[mixtureRates]]; normalization cancels there, so only the
    * exponent matters. */
  def temperatureWeights(sizes: Map[String, Long],
      temperature: Double): Map[String, Double] = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    val total = sizes.values.sum.toDouble
    sizes.collect { case (c, n) if n > 0 =>
      c -> math.pow(n / total, 1.0 / temperature)
    }
  }

  /** [[mixture]] with [[temperatureWeights]] derived from the observed
    * class sizes — one metadata-scale count, then the same deterministic
    * threshold filter (the binding class keeps everything). */
  def temperatureMixture(df: DataFrame, idCol: String, classCol: String,
      temperature: Double, hexDigits: Int = 4): DataFrame = {
    val sizes = df.groupBy(col(classCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stratified(df, idCol, classCol,
      mixtureRates(sizes, temperatureWeights(sizes, temperature)),
      defaultRate = 0.0, hexDigits = hexDigits)
  }

  /** Deterministic weighted corpus mixing: one metadata-scale count per
    * class, then a [[stratified]] threshold filter with the
    * [[mixtureRates]] — classes without a weight are dropped. Same three
    * guarantees as every op here: cross-engine reproducible, retry-stable,
    * and a heavier re-mix is a superset of a lighter one per class. */
  def mixture(df: DataFrame, idCol: String, classCol: String,
      weights: Map[String, Double], hexDigits: Int = 4): DataFrame = {
    val sizes = df.groupBy(col(classCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stratified(df, idCol, classCol, mixtureRates(sizes, weights),
      defaultRate = 0.0, hexDigits = hexDigits)
  }

  /** 48-bit uniform hash for weighted priorities: first 12 hex chars of
    * md5(id). 48 bits (not 60) so the integer is EXACTLY representable in
    * a double — the priority `u / w` is then one IEEE division of two
    * exact values, bit-identical on every engine (a 60-bit hash would
    * round differently depending on the engine's int→double path). */
  def hash48(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long")

  /** Sequential Poisson priority (Ohlsson 1998): `u / w` with `u` the
    * row's 48-bit hash and `w` its positive integer weight. Sorting
    * ascending and keeping the first n gives a fixed-size sample whose
    * inclusion probabilities are ≈ proportional to the weights — the
    * survey-statistics way to weight a corpus sample by document length,
    * dwell time, or quality score while staying deterministic: no RNG, so
    * membership is a pure function of (id, weight) and replays anywhere. */
  def weightedPriority(id: Column, weight: Column): Column =
    hash48(id).cast("double") / weight.cast("double")

  /** Global fixed-size weighted sample: the n smallest priorities.
    * `orderBy().limit()` plans as TakeOrderedAndProject — per-partition
    * heaps of size n and a driver merge, never a global sort, so the
    * selection cost is one scan at any corpus size. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame =
    df.withColumn("_pri", weightedPriority(col(idCol), col(weightCol)))
      .orderBy(col("_pri"), col(idCol))
      .limit(n)
      .drop("_pri")

  /** TOKEN-BUDGET MIXTURE SAMPLING — the training-mix primitive "take
    * ~B_c tokens from each source": per class, documents are admitted in
    * deterministic 48-bit-hash order until the class's token budget
    * fills; the STRADDLER (the doc that crosses the budget) is kept, so
    * every funded class meets its budget exactly-or-just-over and
    * dropping its last admitted doc would fall under. Classes absent
    * from `budgets` are dropped; a budget at or above the class's total
    * keeps the class whole. Membership is a pure function of
    * (id, class, budgets) — no RNG — so the mix replays anywhere.
    *
    * The admission law, uniformly: keep a row iff its EXCLUSIVE running
    * token prefix (hash order within the class) is strictly below the
    * budget. A budget of ZERO therefore admits NOTHING — no prefix sits
    * below zero; a zero-funded class is explicitly excluded while
    * listed, distinct from an unfunded class only in intent. (The other
    * reading — "the straddler law admits the first doc" — is wrong: a
    * zero budget is already met by zero documents, so no document ever
    * CROSSES it.) SamplingSpec and the t49 oracle pin this.
    *
    * 100 TB shape: NO per-class global sort. The hash's HIGH 12 BITS
    * stratify each class into ≤4096 ordered buckets; one aggregate
    * computes per-bucket token sums, a window over the TINY
    * (class × bucket) frame finds each class's single cutoff bucket, and
    * only that bucket's rows — a ~1/4096 slice of the class — pay a
    * row-level window. Every other row is admitted or dropped by a
    * broadcast-joined filter on the scan (the t47 histogram discipline
    * applied to sampling). */
  def tokenBudgetSample(df: DataFrame, idCol: String, classCol: String,
      tokens: Column, budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "need non-negative budgets for at least one class")
    val spark = df.sparkSession
    import spark.implicits._
    val outCols = df.columns.toSeq
    val base = df
      .withColumn("_h", hash48(col(idCol)))
      .withColumn("_b", (col("_h") / lit(1L << 36)).cast("long"))
      .withColumn("_t", tokens.cast("long"))
    val budgetDf = budgets.toSeq.toDF(classCol, "_budget")
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol)).orderBy(col("_b"))
    // per-(class, bucket) token mass → cumulative → the one cutoff bucket
    val cuts = base.groupBy(col(classCol), col("_b"))
      .agg(sum(col("_t")).as("_bt"))
      .withColumn("_cum", sum(col("_bt")).over(wcum))
      .withColumn("_prev", coalesce(lag(col("_cum"), 1).over(wcum), lit(0L)))
      .join(budgetDf, Seq(classCol))
    // cum < budget: every row's exclusive prefix is under budget — whole
    // bucket admitted with no row-level work. STRICT on purpose: a bucket
    // landing EXACTLY on the budget routes through the row path below so
    // a trailing zero-token row (exclusive prefix == budget) drops there,
    // keeping the one uniform law — and a zero budget admits nothing
    val whole = base.join(
      broadcast(cuts.where(col("_cum") < col("_budget"))
        .select(col(classCol), col("_b"))),
      Seq(classCol, "_b"), "left_semi")
    // prev < budget <= cum: THE cutoff bucket (one per class) — resolve
    // its rows exactly by hash order; exclusive prefix = prev + running − t
    val cutoff = cuts
      .where(col("_prev") < col("_budget") && col("_cum") >= col("_budget"))
      .select(col(classCol), col("_b"), col("_prev"), col("_budget"))
    val wrun = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol)).orderBy(col("_h"), col(idCol))
    val straddle = base.join(broadcast(cutoff), Seq(classCol, "_b"))
      .withColumn("_run", sum(col("_t")).over(wrun))
      .where(col("_prev") + col("_run") - col("_t") < col("_budget"))
    whole.select(outCols.map(col): _*)
      .unionByName(straddle.select(outCols.map(col): _*))
  }

  /** Per-class fixed-size weighted sample: n smallest priorities within
    * each `classCol` group. The rank filter compiles to WindowGroupLimit
    * (map-side per-task truncation to n rows per group before the
    * exchange), the same celebrity-safe shape as the source caps. */
  def weightedSampleGrouped(df: DataFrame, idCol: String, weightCol: String,
      classCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol))
      .orderBy(col("_pri"), col(idCol))
    df.withColumn("_pri", weightedPriority(col(idCol), col(weightCol)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_pri", "_rn")
  }
}
