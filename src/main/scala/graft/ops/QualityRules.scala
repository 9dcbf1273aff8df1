package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-training quality-rule bank — the named document filters from the
  * public corpus-curation literature (C4's boilerplate heuristics, Raffel
  * et al. 2020 §2.2; Gopher/MassiveText's length, mean-word-length,
  * stop-word and lexical-diversity rules, Rae et al. 2021 Table A1) as ONE
  * narrow Spark pass with per-rule attrition accounting.
  *
  * The point of the shape: a rule bank is only operable at corpus scale if
  * you can see WHICH rule is doing the rejecting (a mis-tuned threshold
  * silently deleting 40% of a crawl is the classic curation incident).
  * `flags` exposes the per-document booleans for composition with
  * curation pipelines; `attrition` folds them into one (rule, docs) audit
  * table via a single conditional-sum hash aggregate — one scan, map-side
  * partials, no shuffle beyond the 1-row combine, at any corpus size.
  *
  * Every rule is integer-exact (cross-multiplied thresholds, token
  * arithmetic on the proven `split(text, ' ')` tokenization from
  * `featureFrame`), so a relational replay on another engine lands on
  * identical counts — no float ratios to drift.
  */
object QualityRules {

  /** (name, reject-condition) pairs over a text column. Names sort in
    * report order. Thresholds follow the papers, scaled to short-document
    * corpora (Gopher's 50-word minimum, 3–10 mean word length, ≥2 distinct
    * stop words, C4's brace/lorem boilerplate; the diversity floor is
    * MassiveText's unique-word fraction). */
  def rules(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    val n = size(toks)
    // total token characters: doc length minus the separators
    val totLen = length(regexp_replace(text, " ", ""))
    val distinct = size(array_distinct(toks))
    val stop = Seq("the", "a", "of", "and", "in", "to")
      .map(w => array_contains(toks, w).cast("int"))
      .reduce(_ + _)
    Seq(
      "r1_too_short" -> (n < 40),
      "r2_too_long" -> (n > 5000),
      // mean word length outside [3, 10]: 3n <= totLen <= 10n, cross-
      // multiplied so no division happens
      "r3_word_len" -> (totLen < n * 3 || totLen > n * 10),
      "r4_stopword_poor" -> (stop < 2),
      // unique-word fraction below 0.3: 10*distinct < 3*n
      "r5_low_diversity" -> (distinct * 10 < n * 3),
      "r6_boilerplate" -> (text.contains("{") ||
        lower(text).contains("lorem ipsum")))
  }

  /** WITHIN-DOCUMENT REPETITION SIGNALS — Gopher's repetition filter
    * family (Rae et al. 2021 Table A1: "fraction of characters in the
    * most frequent n-gram" / "fraction of characters in duplicated
    * n-grams"), the curation stage that catches boilerplate loops and
    * degenerate generations that the [[rules]] bank's corpus-agnostic
    * thresholds miss. Per document (word tokens, the proven
    * `split(text, ' ')` tokenization):
    *
    *   - `top2_chars` — occurrences × character length (inner space
    *     included) of the MOST frequent 2-gram, ties to the
    *     lexicographically smallest;
    *   - `dup3_chars` — total characters across ALL occurrences of
    *     3-grams appearing more than once;
    *
    * plus `n_tokens` and `text_chars` (the denominators), all BIGINT —
    * callers flag with cross-multiplied thresholds (Gopher's 0.20 for
    * the top 2-gram is `top2_chars * 5 > text_chars`), so nothing
    * divides and the whole stage hash-replays.
    *
    * 100 TB shape: one explode per n, each aggregated on (doc, gram) —
    * shuffle mass ∝ corpus token count with no corpus-wide hot key (the
    * argmax is a struct-min aggregate per doc, never a window over a
    * global sort). Documents shorter than n tokens contribute zeros. */
  def repetitionSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val base = docs.select(col(idCol),
      TextAnalysis.words(col(textCol)).as("_toks"),
      length(col(textCol)).as("text_chars"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
    def grams(n: Int) = base
      .where(col("n_tokens") >= n)
      .select(col(idCol), explode(transform(
        sequence(lit(0), (col("n_tokens") - n).cast("int")),
        i => concat_ws(" ", slice(col("_toks"), i + 1, lit(n))))).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val top2 = grams(2).groupBy(col(idCol))
      .agg(min(struct((-col("cnt")).as("nc"), col("gram").as("g"),
        (col("cnt") * length(col("gram"))).as("chars"))).as("_m"))
      .select(col(idCol), col("_m.chars").as("top2_chars"))
    val dup3 = grams(3).where(col("cnt") >= 2).groupBy(col(idCol))
      .agg(sum(col("cnt") * length(col("gram"))).as("dup3_chars"))
    base.select(col(idCol), col("n_tokens"), col("text_chars").cast("long"))
      .join(top2, Seq(idCol), "left")
      .join(dup3, Seq(idCol), "left")
      .withColumn("top2_chars", coalesce(col("top2_chars"), lit(0L)))
      .withColumn("dup3_chars", coalesce(col("dup3_chars"), lit(0L)))
  }

  /** Per-document rule flags: `idCol`, one boolean per rule, and `pass`
    * (no rule fired). One narrow projection — composes with curation
    * pipelines without re-tokenizing per rule. */
  def flags(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val rs = rules(col(textCol))
    docs.select(
      (col(idCol) +: rs.map { case (name, c) => c.as(name) }) :+
        rs.map { case (_, c) => !c }.reduce(_ && _).as("pass"): _*)
  }

  /** The audit table: one row per rule with how many documents it rejects
    * (rules fire independently — a document can count under several), plus
    * a `z_survivors` row for documents passing the whole bank. */
  def attrition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = flags(docs, idCol, textCol)
    val names = rules(col(textCol)).map(_._1)
    val aggCols = names.map(r => sum(col(r).cast("long")).as(r)) :+
      sum(col("pass").cast("long")).as("z_survivors")
    val sums = f.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = (names :+ "z_survivors")
      .map(r => s"'$r', $r").mkString(", ")
    sums.selectExpr(s"stack(${names.size + 1}, $stackArgs) AS (rule, docs)")
      .orderBy(col("rule"))
  }

  /** CALIBRATED quality gate: instead of a fixed threshold, find the score
    * cutoff that retains (at least) a target fraction of the corpus — the
    * way production pipelines tune a filter to a token budget ("keep the
    * best 70%"), re-run per crawl as the score distribution drifts.
    *
    * Exact WITHOUT a global row sort — the 100 TB shape: scores are
    * bounded integers (here 0..10000), so the calibration runs on the
    * score HISTOGRAM (one map-side-combined aggregate, ≤ 10001 rows), a
    * single-partition cumulative window over that tiny frame, and one
    * broadcast of the 1-row cutoff back onto the corpus pass. Ranking
    * rows (row_number over everything) would be a full sort of the
    * corpus; the histogram is invariant to corpus size.
    *
    * Cutoff rule: the LARGEST score c with |{score >= c}| >= k,
    * k = CEIL(n·targetNum/targetDen) (integer-exact; floor would
    * under-keep whenever n·num is not a multiple of den) — keep-all-ties,
    * so the achieved rate is >= target with minimal over-keep and no
    * nondeterministic boundary row. Score: lexical diversity
    * `distinct_tokens · 10000 div tokens` — integer division, replayable
    * bit-exactly in any engine.
    *
    * Returns per-language audit rows (lang, n_docs, n_kept, threshold). */
  def calibratedGate(docs: DataFrame, idCol: String, langCol: String,
      textCol: String, targetNum: Int = 7, targetDen: Int = 10): DataFrame = {
    // same discipline as mmrTopK's lambda: a zero denominator is a
    // DIV-by-zero expression at runtime, a negative fraction silently
    // inverts the cutoff rule
    require(targetDen > 0 && targetNum >= 0 && targetNum <= targetDen,
      s"keep budget must be a fraction in [0,1]: $targetNum/$targetDen")
    val toks = split(col(textCol), " ")
    val scored = docs
      .select(col(idCol).as("doc"), col(langCol).as("lang"),
        (size(array_distinct(toks)).cast("long") * 10000L).as("_num"),
        greatest(size(toks), lit(1)).cast("long").as("_den"))
      .select(col("doc"), col("lang"), expr("_num DIV _den").as("score"))
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
    // single-partition window: the histogram is <= 10001 rows by
    // construction, never corpus-sized. n comes from the histogram too —
    // never a second corpus pass just for the count.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc)
      .rowsBetween(Long.MinValue, 0)
    // k = CEIL(n·target): floor would under-keep whenever n·num % den != 0
    // and the boundary score has no ties, breaking the ">= target" promise
    val cutoff = hist.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(hist.agg(sum(col("cnt")).as("n")))
      .where(col("cum") >=
        expr(s"(n * $targetNum + ${targetDen - 1}) DIV $targetDen"))
      .agg(max(col("score")).as("threshold"))
    scored.crossJoin(broadcast(cutoff))
      .groupBy(col("lang"), col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= col("threshold"), 1L).otherwise(0L))
          .as("n_kept"))
      .select(col("lang"), col("n_docs"), col("n_kept"), col("threshold"))
  }
}
