package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-document span deduplication (beyond-reference superset): the
  * Falcon/RefinedWeb "line dedup" stage adapted to single-line documents.
  * The corpus documents carry no newlines, so the dedup unit is a SPAN —
  * a consecutive window of `chunkWords` whitespace tokens (the trailing
  * partial window included) — and a span INSTANCE is dropped when the same
  * span text already occurred earlier in the corpus (smaller doc id, or
  * same doc at an earlier position). The first occurrence is always kept,
  * so every distinct span survives exactly once and boilerplate repeated
  * across many documents collapses to its first sighting.
  *
  * 100 TB shape: spans are grouped by `md5(span)` (fixed-width shuffle key
  * regardless of span length) with a map-side partial `min`, so finding
  * each span's owner is ONE hash shuffle; instance filtering is a join on
  * that hash (the duplicate-owner side is a tiny fraction of the corpus —
  * Spark/AQE broadcasts it when it fits); rebuilding cleaned text is one
  * hash aggregate per doc with an in-row `array_sort`, never a global
  * sort. No stage compares spans pairwise.
  *
  * Ownership is decided by `min(doc_id * PosEncode + position)` — a single
  * BIGINT min both Spark and DuckDB aggregate identically (no struct-min
  * portability concerns). `PosEncode` caps documents at 1e6 spans
  * (8 MB+ of text) — callers above that raise it; doc ids stay safe below
  * Long.Max / PosEncode ≈ 9.2e12 documents.
  */
object SpanDedup {

  /** Max spans per document encodable in the ownership key. */
  val PosEncode = 1000000L

  /** One row per span instance: (doc, pos, span, h, inst) where `inst` is
    * the instance's ownership rank and `h` the span's shuffle key. */
  private def instances(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int): DataFrame = {
    // spans via a codegen'd higher-order transform: slice the word array
    // at stride chunkWords and re-join — the text is split exactly once
    val spans = expr(
      s"""transform(
         |  sequence(0, cast(ceil(size(_words) / ${chunkWords}.0) as int) - 1),
         |  i -> array_join(slice(_words, i * $chunkWords + 1, $chunkWords), ' '))
         |""".stripMargin)
    docs
      .select(col(idCol).cast("long").as("doc"),
        split(col(textCol), " ").as("_words"))
      .select(col("doc"), posexplode(spans).as(Seq("pos", "span")))
      .select(col("doc"), col("pos"), col("span"), md5(col("span")).as("h"),
        (col("doc") * PosEncode + col("pos")).as("inst"))
  }

  /** Per-document span-dedup stats and the cleaned text: total spans, how
    * many were dropped as repeats of an earlier occurrence, the duplicate
    * ratio, and the document rebuilt from its surviving spans in order. */
  def dedupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 8): DataFrame = {
    val inst = instances(docs, idCol, textCol, chunkWords)
    // one shuffle: each distinct span's first occurrence (map-side min)
    val owners = inst.groupBy(col("h")).agg(min(col("inst")).as("owner"))
    val kept = col("inst") === col("owner")
    inst.join(owners, Seq("h"))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).cast("int").as("n_spans"),
        sum(when(kept, 0).otherwise(1)).cast("int").as("n_dropped"),
        // kept spans back in position order: in-row sort of (pos, span)
        // pairs — no global sort; ties impossible (pos unique per doc)
        array_sort(collect_list(when(kept, struct(col("pos"), col("span")))))
          .as("_kept"))
      .select(col("doc"), col("n_spans"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_spans"), 4)
          .as("dup_ratio"),
        array_join(expr("transform(_kept, x -> x.span)"), " ")
          .as("cleaned_text"))
  }

  /** EXACT-SUBSTRING dedup — the stride-1 upgrade of [[dedupSpans]] with
    * the semantics of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"): windows of `windowTokens` tokens slide at
    * stride 1, a window instance whose text occurred STRICTLY EARLIER
    * (same ownership order as dedupSpans) marks ALL its tokens for
    * removal, and documents are rebuilt from the surviving tokens — so a
    * duplicated run is caught at ANY alignment, not only on chunk
    * boundaries, which is exactly what the paper's suffix array buys.
    *
    * Relational shape instead of a suffix array: window HASHING replaces
    * suffix sorting — windows md5 at birth (the window text never leaves
    * its projection), ownership is one fixed-width hash shuffle with a
    * map-side min, and the token-removal explode is proportional to
    * DUPLICATED volume × windowTokens, not to the corpus. The rebuild is
    * one per-doc hash aggregate with an in-row sort. First occurrences
    * always survive; a doc shorter than the window is untouched.
    *
    * Returns (doc, n_tokens, n_removed, cleaned_md5) per document. */
  def substringDedup(
      docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 10): DataFrame = {
    val L = windowTokens
    val base = docs.select(col(idCol).cast("long").as("doc"),
      split(col(textCol), " ").as("_words"))
    val cnt = size(col("_words")) - (L - 1)
    val winHashes = when(cnt >= 1, expr(
        s"""transform(sequence(1, greatest(size(_words) - ${L - 1}, 1)),
           |  i -> md5(array_join(slice(_words, i, $L), ' ')))""".stripMargin))
      .otherwise(array().cast("array<string>"))
    val inst = base
      .select(col("doc"), posexplode(winHashes).as(Seq("pos", "h")))
      .select(col("doc"), col("pos"), col("h"),
        (col("doc") * PosEncode + col("pos")).as("inst"))
    val owners = inst.groupBy(col("h")).agg(min(col("inst")).as("owner"))
    val removed = inst.join(owners, Seq("h"))
      .where(col("inst") =!= col("owner"))
      .select(col("doc"),
        explode(sequence(col("pos"), col("pos") + (L - 1))).as("pos"))
      .distinct()
      .withColumn("rm", lit(1))
    base
      .select(col("doc"), posexplode(col("_words")).as(Seq("pos", "tok")))
      .join(removed, Seq("doc", "pos"), "left")
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("rm"), lit(0))).cast("long").as("n_removed"),
        md5(concat_ws(" ", expr(
          """transform(
            |  array_sort(collect_list(
            |    CASE WHEN rm IS NULL THEN struct(pos, tok) END)),
            |  x -> x.tok)""".stripMargin))).as("cleaned_md5"))
  }
}
