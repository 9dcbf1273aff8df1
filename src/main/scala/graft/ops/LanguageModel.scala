package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained character-bigram language model and per-document
  * negative-log-likelihood scoring (beyond-reference superset): the
  * CCNet/KenLM-style "perplexity filter" stage of a pretraining pipeline,
  * reduced to a bigram LM so the whole thing is exact, engine-portable
  * SQL — no trained artifact to ship, the corpus IS the model. Documents
  * whose character statistics diverge from the corpus (mojibake, binary
  * spill, wrong language) score a high NLL and can be gated on it.
  *
  * 100 TB shape: the LM is a bounded-cardinality aggregate (at most
  * |alphabet|² bigrams, map-side partial combine) that is broadcast back
  * to the instance stream; scoring is one hash shuffle per document with
  * all per-term arithmetic in-row. No global sort, no pairwise work.
  *
  * Cross-engine determinism (the oracle hash-matches): each bigram's
  * log-probability is rounded to 6 dp BEFORE summation — `ln` is not
  * correctly-rounded and may differ by an ulp between libm and the JVM —
  * and the per-document sum is a SEQUENTIAL in-row fold over the terms in
  * position order (Spark `aggregate` over an `array_sort`ed collect;
  * DuckDB `list_reduce` over `list(... ORDER BY pos)`), never a
  * partial-aggregate float sum whose order the planner owns. Perplexity
  * is derived from the already-rounded NLL on both sides.
  */
object LanguageModel {

  /** One row per character-bigram instance: (doc, pos, g). Documents
    * shorter than 2 chars emit nothing. */
  private def bigramInstances(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc"),
        expr(
          s"""case when length($textCol) < 2
             |  then cast(array() as array<string>)
             |  else transform(sequence(1, length($textCol) - 1),
             |                 i -> substring($textCol, i, 2)) end
             |""".stripMargin).as("_grams"))
      .select(col("doc"), posexplode(col("_grams")).as(Seq("pos", "g")))

  /** Per-document NLL under the corpus's own bigram LM: (doc, n_bigrams,
    * nll, ppl). Every document bigram is in the LM by construction (the
    * model is trained on the scored corpus), so no smoothing is needed;
    * scoring a foreign corpus against this LM would require it. */
  def bigramNll(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = bigramInstances(docs, idCol, textCol)
    val lm = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
    // normalizing constant via an unpartitioned window OVER THE LM, not a
    // second aggregate of the corpus: the window moves only the <=
    // |alphabet|² LM rows to one partition, and the corpus is scanned
    // twice total (grams + LM) instead of three times
    val t = sum(col("c")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    val logp = lm
      .select(col("g"),
        round(log(col("c").cast("double") / t.cast("double")), 6)
          .as("logp"))
    grams.join(broadcast(logp), Seq("g"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("_n"),
        array_sort(collect_list(struct(col("pos"), col("logp"))))
          .as("_terms"))
      .select(col("doc"), col("_n").cast("int").as("n_bigrams"),
        round(-expr(
          "aggregate(transform(_terms, x -> x.logp), 0D, (a, x) -> a + x)")
          / col("_n"), 4).as("nll"))
      .withColumn("ppl", round(exp(col("nll")), 2))
  }
}
