package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the fastText-class linear
  * model that production curation pipelines train on a labeled slice and
  * sweep over the whole corpus (language ID refinement, quality-tier
  * labeling, topic routing).
  *
  * Determinism contract: every log-probability is ROUNDED TO 6 DECIMALS
  * AND SCALED TO AN INTEGER (`round(ln(p)·10⁶)` as BIGINT) at model-build
  * time, so document scores are exact integer sums — associative,
  * partitioning-independent, and bit-identical across engines (the same
  * discipline as [[LanguageModel.bigramNll]]; an unrounded double fold
  * would make the argmax depend on reduction order). A DuckDB oracle
  * recomputing the identical arithmetic reproduces every prediction
  * (`t28_nb_classifier`).
  *
  * Scale shape: training is one token-count aggregate (map-side partials;
  * state is |vocab|·|labels|, corpus-size-independent) plus tiny
  * label-total aggregates. The fitted model is a bounded table that
  * BROADCASTS back onto the corpus scan; classification is then one
  * narrow pass + a per-doc aggregate — no corpus-sized shuffle carries
  * text, only (doc, label, partial-score) rows with map-side combine.
  */
object NaiveBayes {

  val Scale = 1e6

  private def tokens(df: DataFrame, idCol: String, textCol: String,
      labelCol: Option[String]): DataFrame = {
    val base = df.select(
      (col(idCol).as("doc") +: labelCol.map(c => col(c).as("label")).toSeq) :+
        explode(split(col(textCol), " ")).as("tok"): _*)
      .where(col("tok") =!= "")
    // collapse to per-(doc[,label],token) multiplicities early: the join
    // against the model then touches distinct tokens per doc, not instances
    base.groupBy(base.columns.map(col): _*).agg(count(lit(1)).as("cnt"))
  }

  /** Fit on labeled docs. Returns a DENSE (token × label) model frame:
    * `tok, label, lp` with `lp = round(ln((c+1)/(N_l+V))·10⁶)` (add-one
    * smoothing; BIGINT), plus per-label priors folded in via
    * [[classify]]. Dense means a vocabulary token unseen under some label
    * still has its smoothed floor row — required for correct scoring. */
  def fit(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String): NbModel = {
    val toks = tokens(labeled, idCol, textCol, Some(labelCol))
    val counts = toks.groupBy(col("label"), col("tok"))
      .agg(sum(col("cnt")).as("c"))
    val vocab = counts.select(col("tok")).distinct()
    val labelTotals = toks.groupBy(col("label"))
      .agg(sum(col("cnt")).as("n_l"))
    val docTotals = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val v = vocab.agg(count(lit(1)).as("v"))
    // dense grid: vocab × labels (bounded — model size, not corpus size)
    val grid = vocab.crossJoin(labelTotals).crossJoin(v)
      .join(counts, Seq("label", "tok"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("lp",
        round(log((col("c") + 1) / (col("n_l") + col("v"))) * Scale)
          .cast("long"))
      .select(col("tok"), col("label"), col("lp"))
    val total = docTotals.agg(sum(col("n_docs")).as("n_total"))
    val priors = docTotals.crossJoin(total)
      .withColumn("prior",
        round(log(col("n_docs") / col("n_total")) * Scale).cast("long"))
      .select(col("label"), col("prior"))
    NbModel(grid, priors)
  }

  /** Score + argmax for every doc. Out-of-vocabulary tokens are skipped
    * (the standard multinomial-NB treatment: they carry no class signal).
    * Ties (exact equal integer scores) break toward the smaller label so
    * the prediction is total and engine-portable. */
  def classify(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(docs, idCol, textCol, None)
    val scores = toks
      .join(broadcast(model.tokenLogProbs), "tok")
      .groupBy(col("doc"), col("label"))
      .agg(sum(col("cnt") * col("lp")).as("tok_score"))
      .join(broadcast(model.priors), "label")
      .withColumn("score", col("tok_score") + col("prior"))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("label"))
    scores.withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1)
      .select(col("doc"), col("label").as("predicted"), col("score"))
  }
}

/** Fitted NB model: dense (token, label) scaled log-probs + label priors.
  * Both frames are bounded by vocabulary/label cardinality and broadcast
  * at classification time. */
final case class NbModel(tokenLogProbs: DataFrame, priors: DataFrame)
