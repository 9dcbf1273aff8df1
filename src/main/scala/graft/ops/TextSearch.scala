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

  /** Feature-hashed bag-of-words embedding (the hashing trick): each token
    * adds ±1 to one of `dims` buckets, with both the bucket index and the
    * sign derived from md5(token) so any engine replays the exact map.
    * Components are therefore small INTEGERS stored in doubles — the fold
    * order can't change the result, and downstream dot products / norms
    * stay bit-identical across engines with no rounding guard. One in-row
    * higher-order-function pass, no shuffle, no UDF. `dims` ≤ 256 (the
    * index is the first md5 byte mod dims). */
  def hashedEmbedding(text: Column, dims: Int): Column = {
    require(dims > 0 && dims <= 256, s"dims must be in [1,256], got $dims")
    aggregate(tokens(text), array_repeat(lit(0.0d), dims), (acc, t) => {
      val h = md5(t)
      val idx = pmod(conv(substring(h, 1, 2), 16, 10).cast("int"), lit(dims))
      val sgn = when(conv(substring(h, 3, 1), 16, 10).cast("int") < 8,
        lit(1.0d)).otherwise(lit(-1.0d))
      transform(acc, (v, i) => v + when(i === idx, sgn).otherwise(lit(0.0d)))
    })
  }

  /** [[hashedEmbedding]] as CODEGEN-FRIENDLY wide columns: explode the
    * tokens and hash-aggregate `dims` conditional sums (`_d0.._d{dims-1}`)
    * per id. Same integers as the array form, but every expression is a
    * codegen'd built-in — the higher-order `aggregate` lambda has no
    * `doGenCode`, runs interpreted, and gets DUPLICATED when projection
    * collapse inlines the array into each consumer (norm, dot). One
    * map-side-combined shuffle of (id, dims partials); the per-token md5
    * is evaluated exactly once. The KMeansQ wide-center-update pattern. */
  private[graft] def hashedEmbeddingCols(df: DataFrame, idCol: String,
      textCol: String, dims: Int): DataFrame = {
    val h = md5(col("_t"))
    val idx = pmod(conv(substring(h, 1, 2), 16, 10).cast("int"), lit(dims))
    val sgn = when(conv(substring(h, 3, 1), 16, 10).cast("int") < 8,
      lit(1L)).otherwise(lit(-1L))
    val sums = (0 until dims).map(i =>
      sum(when(col("_dim") === i, col("_sgn")).otherwise(lit(0L))).as(s"_d$i"))
    df.select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .select(col(idCol), idx.as("_dim"), sgn.as("_sgn"))
      .groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack/Clarke/Buettcher
    * 2009): a lexical BM25 leg and a semantic cosine leg over the
    * [[hashedEmbedding]], each contributing `1/(kRrf + rank)` for its
    * top-`legK`, fused and re-ranked to the final top-`k`. The modern
    * RAG-retrieval default — sparse recall catches exact terms, dense
    * recall catches paraphrase, RRF needs no score calibration between
    * legs.
    *
    * 100 TB shape: the query set is tiny and BROADCAST onto both legs, so
    * the corpus pays one postings pass (BM25) plus one embed pass (the
    * wide hash aggregate above, fully codegen'd); the fusion aggregate
    * touches only `queries × legK` candidate rows. Ranks are computed on
    * values that are either rounded at birth (BM25) or integer-exact
    * (cosine of integer vectors), with the doc id as tiebreak, so the
    * fused order is reproducible anywhere. */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, legK: Int = 10, kRrf: Int = 60,
      dims: Int = 16): DataFrame = {
    val lex = bm25TopK(docs, idCol, textCol, queries, legK)
      .select(col("q"), col("doc"), col("rank").as("lex_rank"))
    val n2 = (0 until dims).map(i => col(s"_d$i") * col(s"_d$i")).reduce(_ + _)
    val dv = hashedEmbeddingCols(
        docs.select(col(idCol).as("doc"), col(textCol)), "doc", textCol, dims)
      .withColumn("_n2", n2)
      .where(col("_n2") > 0)
    val qv = hashedEmbeddingCols(queries, "qid", "qtext", dims)
      .withColumn("_qn2", n2)
      .where(col("_qn2") > 0)
      .select(col("qid").as("q"),
        array((0 until dims).map(i => col(s"_d$i").cast("double")): _*).as("qa"),
        sqrt(col("_qn2").cast("double")).as("qn"))
    // dot = 16 codegen'd multiply-adds against the broadcast query array;
    // every term is an integer-valued double, so cs is engine-exact
    val dot = (0 until dims)
      .map(i => col(s"_d$i").cast("double") * element_at(col("qa"), i + 1))
      .reduce(_ + _)
    val ws = Window.partitionBy(col("q"))
      .orderBy(round(col("cs"), 6).desc, col("doc"))
    val sem = dv.crossJoin(broadcast(qv))
      .select(col("q"), col("doc"),
        (dot / (sqrt(col("_n2").cast("double")) * col("qn"))).as("cs"))
      .withColumn("sem_rank", row_number().over(ws))
      .where(col("sem_rank") <= legK)
      .select(col("q"), col("doc"), col("sem_rank"))
    // fuse by union + hash aggregate, not an outer join: each leg emits
    // (q, doc, 1/(kRrf+rank)) and the sum per (q, doc) IS the RRF score —
    // a two-row-max group, commutative double add, no join operator at all
    val fused = lex
      .select(col("q"), col("doc"),
        (lit(1.0) / (lit(kRrf) + col("lex_rank"))).as("c"),
        col("lex_rank"), lit(null).cast("int").as("sem_rank"))
      .unionByName(sem.select(col("q"), col("doc"),
        (lit(1.0) / (lit(kRrf) + col("sem_rank"))).as("c"),
        lit(null).cast("int").as("lex_rank"), col("sem_rank")))
      .groupBy(col("q"), col("doc"))
      .agg(sum(col("c")).as("rrf"), max(col("lex_rank")).as("lex_rank"),
        max(col("sem_rank")).as("sem_rank"))
    val wf = Window.partitionBy(col("q"))
      .orderBy(round(col("rrf"), 6).desc, col("doc"))
    fused.withColumn("rank", row_number().over(wf))
      .where(col("rank") <= k)
      .select(col("q"), col("rank"), col("doc"), col("lex_rank"),
        col("sem_rank"), round(col("rrf"), 5).as("rrf"))
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
