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
}
