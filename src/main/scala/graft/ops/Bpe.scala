package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real merge-table algorithm, not the
  * chars/4 estimate (`TextAnalysis.estBpeTokens`).
  *
  * Division of labor mirrors production BPE trainers (which train on a
  * word-frequency dictionary, never the raw corpus): Spark does the
  * distributed part — corpus → (word, freq) histogram, one shuffle, then
  * a TakeOrdered cap to the top-V words (deterministic freq-desc/word-asc
  * order) — and the driver runs the classic merge loop on that tiny
  * capped dictionary. At 100 TB the histogram is the only corpus-sized
  * job; the loop touches ≤ V entries per round regardless of corpus
  * size. Encoding broadcasts the learned merge ranks and maps partitions
  * — per-word iterative merging is inherently imperative, so this is the
  * documented mapPartitions seam (same rationale as `Multimodal`), kept
  * OFF oracle-checked SQL paths.
  *
  * Determinism: ties in pair counts break lexicographically, words cap
  * by (freq desc, word asc), and encoding depends only on the merge
  * list — identical corpora produce identical tokenizations anywhere.
  */
object Bpe {

  /** End-of-word sentinel (classic BPE: lets the model distinguish "est"
    * inside a word from "est" ending one). Chosen outside the corpus
    * alphabet for the driver testdata. */
  val Eow = "</w>"

  /** Fixed seed dictionary (common-English function words) from which
    * [[FixedMerges]] trains — a CONSTANT merge table usable by static
    * oracle SQL: the same table at every scale factor, independent of the
    * corpus being encoded. The encode stage over a fixed table is
    * SQL-expressible (rank-ordered iterated replaces, see OpsPack's
    * `t34_bpe_encode` oracle), which is what makes the tokenizer
    * hash-checkable even though training is not. */
  val FixedSeedHistogram: Seq[(String, Long)] = Seq(
    "the" -> 90L, "of" -> 70L, "and" -> 65L, "to" -> 60L, "in" -> 55L,
    "is" -> 50L, "that" -> 45L, "for" -> 40L, "it" -> 38L, "with" -> 35L,
    "as" -> 33L, "was" -> 30L, "on" -> 28L, "are" -> 26L, "this" -> 24L,
    "be" -> 22L, "at" -> 20L, "by" -> 18L, "not" -> 16L, "or" -> 14L,
    "an" -> 12L, "we" -> 10L)

  /** 24 merges trained from [[FixedSeedHistogram]] — deterministic, so
    * Spark encode and the SQL oracle share one table by construction. */
  lazy val FixedMerges: Seq[Merge] = learnMerges(FixedSeedHistogram, 24)

  final case class Merge(a: String, b: String, rank: Int)

  /** The t22 merge table FROZEN: `learnMerges(wordHistogram(sf0.01
    * documents, maxVocab = 2000), 200)` — training exhausts all adjacent
    * pairs of the 31-word synthetic vocabulary after 106 merges. The
    * constant exists so t22's DuckDB oracle can be GENERATED from it (the
    * t34 pattern): the live query still trains from the corpus, and the
    * sf0.01 hash-match therefore proves the training loop reproduces this
    * exact table bit-for-bit (BpeSpec asserts the same reproduction
    * directly). Only valid against the sf0.01 fixture corpus — a different
    * corpus trains a different table, which is the point of t22. */
  val CorpusMergesSf001: Seq[Merge] = Seq(
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
    ("r", "ow</w>"), ("at", "c"), ("atc", "h</w>"), ("b", "atch</w>"),
    ("a", "n</w>"), ("c", "an</w>"), ("s", "can</w>"), ("c", "o"),
    ("c", "u"), ("co", "lu"), ("colu", "m"), ("colum", "n</w>"),
    ("cu", "st"), ("cust", "o"), ("custo", "m"), ("custom", "er</w>"),
    ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er</w>"),
    ("a", "l"), ("al", "l"), ("all", "</w>"), ("m", "all</w>"),
    ("s", "mall</w>"), ("er", "g"), ("erg", "e</w>"), ("l", "ow</w>"),
    ("m", "erge</w>"), ("s", "low</w>"), ("c", "t"), ("ct", "or"),
    ("ctor", "</w>"), ("d", "er</w>"), ("e", "ctor</w>"), ("or", "der</w>"),
    ("v", "ector</w>"), ("in", "e</w>"), ("l", "ine</w>"), ("a", "b"),
    ("ab", "l"), ("abl", "e</w>"), ("at", "a</w>"), ("d", "ata</w>"),
    ("t", "able</w>"), ("p", "</w>"), ("u", "p</w>"), ("a", "g"),
    ("ag", "g</w>"), ("a", "lu"), ("alu", "e</w>"), ("v", "alue</w>"),
    ("e", "y</w>"), ("k", "ey</w>"), ("a", "m"), ("am", "</w>"),
    ("e", "am</w>"), ("r", "eam</w>"), ("st", "ream</w>"), ("d", "ow</w>"),
    ("in", "dow</w>"), ("w", "indow</w>"), ("k", "</w>"), ("par", "k</w>"),
    ("s", "park</w>"), ("g", "r"), ("gr", "o"), ("gro", "up</w>"),
    ("par", "t</w>"), ("b", "i"), ("bi", "g</w>"), ("or", "t</w>"),
    ("s", "ort</w>"), ("er", "y</w>"), ("q", "u"), ("qu", "ery</w>"),
    ("a", "st"), ("ast", "</w>"), ("f", "ast</w>"), ("h", "e</w>"),
    ("t", "he</w>"), ("d", "up</w>")
  ).zipWithIndex.map { case ((a, b), r) => Merge(a, b, r) }

  /** Distributed word histogram, capped to the `maxVocab` most frequent
    * words (deterministic tie-break) — the trainer's working set. */
  def wordHistogram(docs: DataFrame, textCol: String,
      maxVocab: Int): Seq[(String, Long)] = {
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Classic BPE training loop over a word-frequency dictionary: each
    * round counts adjacent symbol pairs weighted by word frequency,
    * merges the most frequent pair (ties lexicographic), repeats. Pure
    * driver-side function of the histogram — deterministic and cheap
    * (the dictionary is capped; the corpus is long gone). */
  def learnMerges(histogram: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] = histogram.map { case (w, f) =>
      (w.map(_.toString).toVector :+ Eow, f)
    }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq
          .maxBy { case ((a, b), c) => (c, a, b) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))
        merges += Merge(a, b, rank)
        val ab = a + b
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += ab; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Encode one word with the merge table: repeatedly apply the
    * lowest-rank merge present. The standard BPE encode; O(len·merges)
    * worst case on short words. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = syms.length > 1
    while (continue) {
      var best = Int.MaxValue
      var at = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < best) { best = r; at = i }
        }
        i += 1
      }
      if (at < 0) continue = false
      else {
        val merged = syms(at) + syms(at + 1)
        syms = (syms.take(at) :+ merged) ++ syms.drop(at + 2)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Tokenize `textCol` of every row with a learned merge table: output
    * (idCol, n_tokens, tokens). Broadcast ranks + mapPartitions — the
    * per-word merge loop is imperative by nature (documented seam; the
    * distributed shape is a narrow per-row map, no shuffle). */
  def encode(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.a, m.b) -> m.rank).toMap)
    val pruned = docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
    pruned.as[(Long, String)].mapPartitions { it =>
      val r = ranks.value
      it.map { case (id, text) =>
        val toks = text.split(" ").iterator.filter(_.nonEmpty)
          .flatMap(w => encodeWord(w, r)).toSeq
        (id, toks.length, toks)
      }
    }.toDF(idCol, "n_tokens", "tokens")
  }
}
