package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked corpus retrieval for training-data curation (SURVEY §7.3
  * beyond-reference ops): BM25 search and TF-IDF keyword extraction.
  * The "find every document about X" / "what is this document about"
  * primitives that drive targeted corpus audits, topic-conditioned
  * sampling, and relevance-filtered mixtures.
  *
  * 100 TB shape: the query set is tiny and broadcast, so BM25 is ONE
  * corpus pass through the postings explode (plus a column-pruned
  * doc-length pass for the two corpus scalars) — document frequencies
  * come from the already-filtered postings via a window, so no
  * full-vocabulary aggregate ever runs. TF-IDF does need corpus document
  * frequencies: that is one term-keyed shuffle with map-side partial
  * aggregation, the inverted-index build every search engine pays once
  * (and would persist as a materialized postings table in production).
  * All expressions are codegen'd built-ins, zero UDFs.
  *
  * Cross-engine determinism (the DuckDB oracle): logs are rounded to 6 dp
  * the moment they are produced (libm `ln` may differ by 1 ulp between
  * engines — same guard as the LM-perplexity op), and per-(query, doc)
  * score sums fold the contributions in term order via
  * `aggregate(array_sort(collect_list(...)))`, never a float `sum()`
  * whose accumulation order is partition-dependent.
  */
object TextSearch {

  /** Lowercased whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Inverted-index postings: one row per (doc, term) with the term
    * frequency and the document token length carried through —
    * (doc, dl, term, tf). One explode + one hash aggregate. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("_w"))
      .select(col("doc"), size(col("_w")).as("dl"), explode(col("_w")).as("term"))
      .groupBy(col("doc"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k documents per query (Robertson/Sparck Jones, the Lucene
    * `k1`/`b` variant with the non-negative smoothed idf
    * `ln(1 + (N − df + ½)/(df + ½))`). `queries` is (qid, qtext) and
    * assumed small — it is broadcast, which makes the corpus side a
    * single narrow pass. Ranking is stable under float noise: the score
    * is rounded to 6 dp for ordering with the doc id as tiebreak. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val p = postings(docs, idCol, textCol)
    // corpus stats: one cheap aggregate over the doc-length projection;
    // a single row, broadcast into the scoring join
    val stats = docs
      .select(size(tokens(col(textCol))).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qt = queries
      .select(col("qid"), explode(tokens(col("qtext"))).as("term"))
      .distinct()
    // postings filtered to query terms FIRST (broadcast), THEN document
    // frequencies from the filtered slice as a window count over
    // (qid, term) — postings are unique per (doc, term), so the partition
    // row count IS df. This keeps the whole search at ONE corpus pass:
    // a groupBy-df would re-derive the postings subtree (a second scan
    // plus a full postings shuffle — the actual 100 TB cost). The window
    // shuffles only query-term postings, with the classic inverted-index
    // posting-list locality (one term's postings co-resident — what
    // Lucene stores contiguously); query terms are user-chosen, so the
    // stop-word skew bomb of a full-vocabulary window never applies.
    val m = p.join(broadcast(qt), Seq("term"))
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("qid"), col("term"))))
    // idf rounded at birth (libm guard); the rest is pure arithmetic,
    // bit-identical across engines given the same association order
    val idf = round(log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6)
    val contrib = idf * (col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = m.crossJoin(broadcast(stats))
      .select(col("qid"), col("doc"), col("term"), contrib.as("c"))
      .groupBy(col("qid"), col("doc"))
      // fold in term order: terms are distinct within a group, so the
      // struct sort is total and the double sum reproducible anywhere
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (acc, s) => acc + s("c")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("score"), 6).desc, col("doc"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("q"), col("rank"), col("doc"),
        round(col("score"), 4).as("score"))
  }

  /** Top-`m` characteristic terms per document by TF-IDF
    * (`tf/dl · ln(N/df)`). The document-frequency aggregate runs over the
    * full corpus (one term-keyed shuffle, partial aggs map-side); the
    * per-doc ranking window partitions on the doc id, so no global sort.
    * The tiny (df, idf) table is broadcast back onto the postings. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      m: Int): DataFrame = {
    val p = postings(docs, idCol, textCol)
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = p.groupBy(col("term"))
      .agg(countDistinct(col("doc")).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
    val scored = p.join(broadcast(dfreq), Seq("term"))
      .select(col("doc"), col("term"),
        (col("tf").cast("double") / col("dl") * col("idf")).as("tfidf"))
    val w = Window.partitionBy(col("doc"))
      .orderBy(round(col("tfidf"), 6).desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= m)
      .select(col("doc"), col("rank"), col("term"),
        round(col("tfidf"), 5).as("tfidf"))
  }
}
