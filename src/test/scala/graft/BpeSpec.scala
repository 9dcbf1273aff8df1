package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Bpe

/** BPE trainer/encoder laws: the classic merge order on the textbook
  * corpus, lossless round-trip, determinism, and monotone compression. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  test("learns the textbook merge order on the Sennrich corpus") {
    // 'newest' x6, 'widest' x3: pair (e,s) dominates (9), then (es,t),
    // then (est,</w>) — the worked example from the original BPE paper.
    val hist = Seq(("newest", 6L), ("widest", 3L), ("low", 7L), ("lower", 2L))
    val merges = Bpe.learnMerges(hist, 3)
    assert(merges.map(m => (m.a, m.b)) ==
      Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)))
  }

  test("ties break deterministically (lexicographically smallest pair)") {
    // 'ab' and 'cd' both occur once; (a,b) must win over (c,d) and
    // (b,</w>), (d,</w>)
    val merges = Bpe.learnMerges(Seq(("ab", 1L), ("cd", 1L)), 1)
    assert(merges.head.a == "a" && merges.head.b == "b")
  }

  test("encode round-trips losslessly and compresses monotonically") {
    val docs = Tables.load(spark, sf, "documents").limit(80)
    val hist = Bpe.wordHistogram(docs, "text", 500)
    val m200 = Bpe.learnMerges(hist, 200)
    val m50 = m200.take(50)

    val ranks200 = m200.map(m => (m.a, m.b) -> m.rank).toMap
    val ranks50 = m50.map(m => (m.a, m.b) -> m.rank).toMap
    hist.take(100).foreach { case (w, _) =>
      val t200 = Bpe.encodeWord(w, ranks200)
      val t50 = Bpe.encodeWord(w, ranks50)
      // lossless: tokens concatenate back to word + sentinel
      assert(t200.mkString == w + Bpe.Eow, s"round trip broke for '$w'")
      // monotone: more merges never lengthen the encoding
      assert(t200.length <= t50.length, s"more merges lengthened '$w'")
      assert(t200.length <= w.length + 1)
    }

    // distributed encode agrees with the driver-side encoder
    val enc = Bpe.encode(spark, docs.select(col("doc_id"), col("text")),
      "doc_id", "text", m200)
    val row = enc.orderBy("doc_id").limit(1).collect().head
    val docText = docs.orderBy("doc_id").limit(1).collect().head.getAs[String]("text")
    val expected = docText.split(" ").filter(_.nonEmpty)
      .flatMap(w => Bpe.encodeWord(w, ranks200)).toSeq
    assert(row.getSeq[String](2) == expected)
    assert(row.getInt(1) == expected.length)
  }

  test("training is a pure function of the corpus (rerun-identical)") {
    val docs = Tables.load(spark, sf, "documents").limit(40)
    val a = Bpe.learnMerges(Bpe.wordHistogram(docs, "text", 300), 80)
    val b = Bpe.learnMerges(Bpe.wordHistogram(docs, "text", 300), 80)
    assert(a == b && a.length == 80)
  }

  test("rank-ordered global replaces equal the lowest-rank-first merge loop (oracle law)") {
    // The t34 DuckDB oracle encodes by applying FixedMerges in rank order,
    // one global replace over a separator-wrapped symbol string per merge.
    // That equals Bpe.encodeWord's lowest-rank-first loop because a pair
    // involving a composite symbol always out-ranks the merge that formed
    // it. Pin the law with the mirror implementation + a fuzz sweep.
    val sep = "\u001f"
    val ranks = Bpe.FixedMerges.map(m => (m.a, m.b) -> m.rank).toMap
    def replaceEncode(word: String): Seq[String] = {
      val wrapped = word.map(c => sep + c + sep).mkString + sep + Bpe.Eow + sep
      val out = Bpe.FixedMerges.foldLeft(wrapped) { (acc, m) =>
        acc.replace(sep + m.a + sep + sep + m.b + sep, sep + m.a + m.b + sep)
      }
      out.stripPrefix(sep).stripSuffix(sep).split(sep + sep).toSeq
    }
    val fixedWords = Seq("the", "theirs", "then", "thisandthat", "aaa",
      "forfor", "withwith", "x", "oror", "ananas", "notation", "waste")
    fixedWords.foreach { w =>
      assert(replaceEncode(w) == Bpe.encodeWord(w, ranks), s"word $w")
    }
    val rnd = new scala.util.Random(1234)
    val alphabet = "theofandtoinisarwbyx"
    (0 until 500).foreach { _ =>
      val w = (0 until (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(replaceEncode(w) == Bpe.encodeWord(w, ranks), s"word $w")
    }
    // and the constant really is what the trainer produces from the seed
    assert(Bpe.FixedMerges ==
      Bpe.learnMerges(Bpe.FixedSeedHistogram, 24))
    assert(Bpe.FixedMerges.length == 24)
  }

  test("training reproduces the frozen sf0.01 merge table bit-for-bit") {
    // t22's oracle is GENERATED from Bpe.CorpusMergesSf001; this law is
    // what licenses that: the live training path (distributed histogram,
    // capped vocabulary, merge loop) run against the same corpus must
    // yield the identical table. If the fixture corpus or the trainer
    // ever changes, this fails before the driver's hash gate does —
    // regenerate the constant with graft.tools.FreezeBpe.
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val trained = Bpe.learnMerges(
      Bpe.wordHistogram(docs, "text", maxVocab = 2000), numMerges = 200)
    assert(trained.size == Bpe.CorpusMergesSf001.size)
    assert(trained == Bpe.CorpusMergesSf001)
  }
}
