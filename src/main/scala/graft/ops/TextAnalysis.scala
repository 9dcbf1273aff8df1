package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (SURVEY §7.3):
  * token counting, quality metrics, n-gram/stopword language heuristic, and
  * bag-of-words document fingerprinting. Pure column expressions — codegen
  * end to end, no UDFs, trivially distributed (narrow per-row work).
  */
object TextAnalysis {

  def words(text: Column): Column = split(text, " ")

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: ~4 chars/token heuristic, integer math. */
  def estBpeTokens(text: Column): Column =
    ((length(text) + 3) / 4).cast("int")

  /** BPE-ish regex tokenization (GPT-2-style pre-tokenizer shape, kept to
    * the regex subset Java and RE2-family engines treat identically:
    * letter runs, digit runs, single non-alphanumeric glyphs). Closer to a
    * real tokenizer's segment count than whitespace splitting — "don't
    * stop!" is 5 regex tokens vs 2 whitespace tokens. */
  val BpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0)) // whole-match

  def regexTokenCount(text: Column): Column = size(regexTokens(text))

  /** PII scrub (training-data redaction): mask email addresses and
    * NNN-NNN-NNNN phone numbers with typed placeholder tokens. Pure
    * codegen'd `regexp_replace` — no UDF, stays inside whole-stage codegen
    * on a 100 TB scan — and the patterns are kept to the regex subset Java
    * and RE2-family engines treat identically, so the scrub is
    * reproducible in other engines at audit time. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Stopword hits over an already-split word array. Callers that compute
    * several metrics should project `words(text)` ONCE and use the
    * array-based variants: subexpression elimination does not reach inside
    * higher-order-function lambdas, so inlining `split` into each metric
    * re-splits the text per metric (§ the d2 shingle lesson). */
  def stopwordCountOf(w: Column): Column =
    size(filter(w, x => Stopwords.map(s => x === s).reduce(_ || _)))

  def stopwordCount(text: Column): Column = stopwordCountOf(words(text))

  /** Quality metrics frame: token/char/distinct counts, average token
    * length, stopword ratio. The word array is projected once (a separate
    * Project that CollapseProject keeps — split is non-cheap and referenced
    * by three metrics) so the text is split exactly once per row. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("_q_text")
    val w = col("_q_words")
    val nTok = size(w)
    docs.select(col(idCol).as("doc"), col(textCol).as("_q_text"),
        words(col(textCol)).as("_q_words"))
      .select(
        col("doc"),
        length(t).as("n_chars"),
        nTok.as("n_tokens"),
        size(array_distinct(w)).as("n_distinct"),
        round(length(regexp_replace(t, " ", "")).cast("double") / nTok, 4)
          .as("avg_token_len"),
        round(stopwordCountOf(w).cast("double") / nTok, 4).as("stopword_ratio"),
        estBpeTokens(t).as("est_bpe_tokens"))
  }

  /** Character-class composition metrics — the other half of the Gopher/C4
    * quality rules ([[repetition]] covers the repetition half): fraction of
    * alphabetic / numeric / symbol (non-alphanumeric, non-space) characters
    * and the mean word length. Degenerate documents (code dumps, tables,
    * markup, encoding garbage) show extreme symbol ratios or word lengths
    * that length/stopword gates miss. Pure codegen'd built-ins (length of
    * regexp-stripped text), zero UDFs, one narrow projection — same scan
    * discipline as [[quality]]. */
  def charClassStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("_c_text")
    val nChars = length(t).cast("double")
    def classCount(pattern: String): Column =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("double")
    docs.select(col(idCol).as("doc"), col(textCol).as("_c_text"),
        words(col(textCol)).as("_c_words"))
      .select(
        col("doc"),
        length(t).as("n_chars"),
        round(classCount("[A-Za-z]") / nChars, 4).as("alpha_ratio"),
        round(classCount("[0-9]") / nChars, 4).as("digit_ratio"),
        round(classCount("[^A-Za-z0-9 ]") / nChars, 4).as("symbol_ratio"),
        round(length(regexp_replace(t, " ", "")).cast("double") /
          size(col("_c_words")), 4).as("mean_word_len"))
  }

  /** Stopword-ratio language heuristic over a word array. */
  def languageGuessOf(w: Column, threshold: Double = 0.04): Column =
    when(stopwordCountOf(w).cast("double") / size(w) >= threshold,
      lit("en")).otherwise(lit("und"))

  /** Stopword-hit language heuristic: en-like when the stopword ratio
    * clears the threshold. (Heuristic shape mirrors n-gram language-ID:
    * score fixed marker features, argmax/threshold.) */
  def languageGuess(text: Column, threshold: Double = 0.04): Column =
    languageGuessOf(words(text), threshold)

  /** Repetition metrics per document — the Gopher-style quality filters
    * for generated/boilerplate text: the top-word frequency ratio and the
    * duplicate-2-gram ratio (1 − distinct 2-grams / total 2-grams). High
    * values flag degenerate repetition that length/stopword gates miss.
    * One explode + two hash aggregates on `doc` — narrow at any corpus
    * size; the 2-gram side reuses the dedup shingle builder. */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wordStats = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("doc"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc"))
      .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_distinct"))
    val g2 = Dedup.shinglesAuto(docs, idCol, textCol, n = 2)
      .groupBy(col("doc")).agg(count(lit(1)).as("n2"))
    wordStats.join(g2, Seq("doc"))
      .where(col("n_tok") > 1)
      .select(col("doc"), col("n_tok"),
        round(col("top_cnt").cast("double") / col("n_tok"), 4)
          .as("top_word_ratio"),
        round(lit(1.0) - col("n2").cast("double") / (col("n_tok") - 1), 4)
          .as("dup_2gram_ratio"))
  }

  /** Canonical bag-of-words fingerprint: md5 over the sorted distinct word
    * set — robust to word order, the classic "fingerprint" dedup key. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  /** ONE-PASS quality-feature assembly — what a production curation job
    * actually runs: every per-document feature the standalone ops compute
    * (size/diversity counts, stopword/char-class ratios, language guess,
    * BPE estimate, dedup fingerprint) projected in a SINGLE scan with a
    * SINGLE split of the text. At 100 TB the scan is the cost — computing
    * features one op at a time re-reads the corpus once per feature; this
    * frame feeds every downstream gate from one read. Pure narrow
    * projection: no shuffle, no UDFs, all codegen'd (OpsSpec asserts one
    * scan + zero exchanges). */
  def featureFrame(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col("_f_text")
    val w = col("_f_words")
    val nTok = size(w)
    val nChars = length(t).cast("double")
    def classCount(pattern: String): Column =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("double")
    docs.select(col(idCol).as("doc"), col(textCol).as("_f_text"),
        words(col(textCol)).as("_f_words"))
      .select(
        col("doc"),
        length(t).as("n_chars"),
        nTok.as("n_tokens"),
        size(array_distinct(w)).as("n_distinct"),
        round(stopwordCountOf(w).cast("double") / nTok, 4)
          .as("stopword_ratio"),
        round(classCount("[A-Za-z]") / nChars, 4).as("alpha_ratio"),
        round(classCount("[^A-Za-z0-9 ]") / nChars, 4).as("symbol_ratio"),
        languageGuessOf(w).as("lang_guess"),
        estBpeTokens(t).as("est_bpe_tokens"),
        // fingerprint over the SHARED word array (fingerprint(t) would
        // split the text a second time)
        md5(concat_ws(" ", array_sort(array_distinct(w)))).as("fp"))
  }

  /** Rabin-Karp-style rolling hash over the character stream:
    * h = Σ c_i · B^(n−i) mod P, computed as a strict left fold
    * h ← (h·B + c) mod P — order-sensitive (unlike [[fingerprint]]), cheap
    * to maintain incrementally, and exactly reproducible in any engine with
    * the same fold (the DuckDB oracle mirrors it). B=257, P=2^31−1 keeps
    * every intermediate below 2^40 — overflow-free int64 math. */
  val RollB = 257L
  val RollP = 2147483647L // 2^31 - 1

  def rollingFingerprint(text: Column): Column =
    when(length(text) > 0,
      aggregate(
        transform(sequence(lit(1), length(text)),
          i => ascii(text.substr(i, lit(1))).cast("long")),
        lit(0L),
        (acc, c) => (acc * RollB + c) % RollP))
      .otherwise(lit(0L))
}
