package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping-window document chunking — the RAG / context-window prep
  * step: split every document into fixed-size token windows with a
  * configurable overlap, each chunk carrying its provenance (doc id, chunk
  * index, token span) so retrieval hits can be traced back to exact source
  * spans.
  *
  * Layout law (deterministic, engine-portable — the DuckDB oracle
  * recomputes it exactly): chunks start at `0, stride, 2·stride, …` with
  * `stride = chunkTokens − overlapTokens`, and the number of chunks is
  * `max(1, ceil((n − overlap) / stride))` — the final window is the first
  * one that reaches the end of the document, so every token is covered and
  * no fully-redundant tail window is emitted.
  *
  * Scale shape: a PURE PROJECTION — split once, explode the chunk index,
  * slice the token array; zero shuffles, fully codegen'd built-ins
  * (split/sequence/slice/array_join), so chunking 100 TB is a single
  * narrow pass that pipelines into whatever follows (embedding, indexing,
  * dedup). Compare: a window/self-join formulation would shuffle the
  * corpus on doc id for no reason.
  */
object Chunking {

  /** One row per chunk: doc_id, chunk_idx, start_tok, end_tok (exclusive),
    * n_chunk_tokens, chunk (re-joined text). `tokens` defaults to the
    * whitespace tokenizer (TextAnalysis.tokenCount semantics). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0,
      tokens: Column => Column = c => split(c, " ")): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val n = size(col("_toks"))
    val nChunks = greatest(lit(1),
      ceil((n - lit(overlapTokens)).cast("double") / stride).cast("int"))
    val start = col("chunk_idx") * stride
    val end = least(start + chunkTokens, n)
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx"),
        start.cast("long").as("start_tok"),
        end.cast("long").as("end_tok"),
        (end - start).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("_toks"), start + 1, end - start), " ")
          .as("chunk"))
  }

  /** Audit summary per document: chunk count, token coverage, overlap mass
    * — what a chunking job reports to prove no token was dropped. */
  def chunkStats(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("end_tok")).as("covered_tokens"),
        sum(col("n_chunk_tokens")).as("emitted_tokens"))
      .withColumn("overlap_tokens",
        col("emitted_tokens") - col("covered_tokens"))
}
