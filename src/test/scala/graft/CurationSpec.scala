package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops._

/** Round-8 curation operators: per-source caps, NB classifier, incremental
  * dedup admission, blocked entity resolution. */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Tables.load(spark, sf, "documents")

  // ---- Curation.capPerKey ----------------------------------------------

  test("capPerKey keeps at most cap docs per key, a subset of the input") {
    val kept = Curation.capPerKey(docs, "doc_id", "source", cap = 10)
    val perKey = kept.groupBy("source").count().collect()
    assert(perKey.nonEmpty)
    perKey.foreach(r => assert(r.getLong(1) <= 10))
    // subset: every kept id exists in the source frame
    assert(kept.join(docs.select("doc_id"), Seq("doc_id"), "left_anti").count() == 0)
  }

  test("capPerKey selection is deterministic and partitioning-independent") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Curation.capPerKey(df, "doc_id", "source", cap = 7)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(17, col("doc_id")))
    assert(a == b && a.nonEmpty)
  }

  test("capPerKey with cap >= group size keeps everything") {
    val n = docs.count()
    assert(Curation.capPerKey(docs, "doc_id", "source", cap = 100000).count() == n)
  }

  // ---- NaiveBayes -------------------------------------------------------

  test("NB classifier separates classes with distinct vocabularies") {
    // the driver corpus's lang labels are synthetic (same token soup for
    // every label — no learnable signal), so learning behavior is tested
    // on a constructed corpus: three classes with mostly-disjoint
    // vocabulary plus shared stopwords
    import spark.implicits._
    val vocab = Map(
      "sport" -> Seq("goal", "match", "team", "score", "league"),
      "food" -> Seq("recipe", "oven", "salt", "butter", "simmer"),
      "code" -> Seq("compile", "branch", "merge", "commit", "deploy"))
    val rows = for {
      (label, words) <- vocab.toSeq
      i <- 0 until 30
    } yield {
      val picks = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
      val stop = Seq("the", "a", "of")((i + picks.length) % 3)
      ((label.hashCode.toLong & 0xffff) * 1000 + i, s"$stop ${picks.mkString(" ")}", label)
    }
    val df = rows.toDF("doc_id", "text", "label")
    val train = df.where(col("doc_id") % 3 =!= 0)
    val test0 = df.where(col("doc_id") % 3 === 0)
    val model = NaiveBayes.fit(train, "doc_id", "text", "label")
    val pred = NaiveBayes.classify(model, test0, "doc_id", "text")
      .join(test0.select(col("doc_id").as("doc"), col("label")), "doc")
    val n = pred.count()
    val correct = pred.where(col("predicted") === col("label")).count()
    assert(n > 0)
    assert(correct == n, s"expected perfect separation, got $correct/$n")
  }

  test("NB scores are exact integers: reruns and repartitions agree bit-for-bit") {
    val train = docs.where(col("doc_id") % 3 =!= 0)
    val test0 = docs.where(col("doc_id") % 3 === 0)
    def run(t: org.apache.spark.sql.DataFrame) = {
      val model = NaiveBayes.fit(t, "doc_id", "text", "lang")
      NaiveBayes.classify(model, test0, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(run(train) == run(train.repartition(13)))
  }

  // ---- Dedup.admitAgainstIndex -----------------------------------------

  test("incremental admission over any id split equals the one-shot result") {
    def oneShot: Map[Long, Boolean] = {
      // reference semantics: b rejected iff exists earlier near-dup a<b
      val pairs = Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      val rejected = pairs.select(col("b")).distinct()
        .collect().map(_.getLong(0)).toSet
      docs.select("doc_id").collect()
        .map(r => r.getLong(0) -> !rejected(r.getLong(0))).toMap
    }
    def incremental(splitAt: Long): Map[Long, Boolean] = {
      val b1 = docs.where(col("doc_id") < splitAt)
      val b2 = docs.where(col("doc_id") >= splitAt)
      val a1 = Dedup.admitAgainstIndex(None, b1, "doc_id", "text", threshold = 0.5)
      val ix = Dedup.nearDupIndex(b1, "doc_id", "text")
      val a2 = Dedup.admitAgainstIndex(Some(ix), b2, "doc_id", "text", threshold = 0.5)
      (a1.collect() ++ a2.collect())
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    val expected = oneShot
    assert(expected.values.exists(v => !v), "fixture should contain near-dups")
    assert(incremental(100L) == expected)
    assert(incremental(333L) == expected)
  }

  test("admission accepts docs too short to shingle (no silent drop)") {
    import spark.implicits._
    val tiny = Seq((1L, "hello"), (2L, "hello")).toDF("doc_id", "text")
    val out = Dedup.admitAgainstIndex(None, tiny, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("admission releases its per-batch aggregate (only the result checkpoint stays)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val b = docs.where(col("doc_id") < 100)
    Dedup.admitAgainstIndex(None, b, "doc_id", "text").count()
    // admitAgainstIndex persists one internal aggregate and must release
    // it; the only new storage allowed is the localCheckpoint result
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"leaked ${leaked.size} persisted RDDs: $leaked")
  }

  // ---- Image perceptual-hash dedup --------------------------------------

  test("aHash banding recalls every brute-force pair at hamming <= 3; corrupt skips") {
    import spark.implicits._
    val media = (0L until 24L).map { id =>
      val bytes =
        if (id == 23L) Array[Byte](1, 2, 3) // corrupt: not an image
        else Multimodal.pngFixtureVariant(id / 4, id % 4, 16, 16)
      (id, bytes, "image/png")
    }.toDF("id", "media", "content_type")
    val hashes = Multimodal.imageHashes(spark, media,
      Multimodal.ImageIoDecoder, 16, 16)
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!hs.contains(23L), "corrupt media must be skipped, not fail")
    assert(hs.size == 23 && hs.values.forall(_.length == 64))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if ham(hs(a), hs(b)) <= 3
    } yield (a, b)).toSet
    val banded = Multimodal.aHashNearDups(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty && banded == brute)
  }

  test("audio fingerprints separate same-signal variants from different signals") {
    import spark.implicits._
    val media = (0L until 24L).map { id =>
      val bytes =
        if (id == 23L) "not a wav".getBytes("UTF-8")
        else Multimodal.wavFixtureVariant(id / 4, id % 4, 1024)
      (id, bytes, "audio/wav")
    }.toDF("id", "media", "content_type")
    val prints = Multimodal.audioFingerprint(spark, media)
    val hs = prints.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!hs.contains(23L), "non-WAV media must be skipped")
    assert(hs.size == 23 && hs.values.forall(_.length == 64))
    val pairs = Multimodal.aHashNearDups(prints, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every same-seed pair found, no cross-seed pair admitted
    val expected = (for {
      a <- 0L until 23L; b <- (a + 1) until 23L if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs == expected)
  }

  test("video near-dups require EVERY sampled frame to match; corrupt skips") {
    import spark.implicits._
    val media = (0L until 16L).map { id =>
      val bytes =
        if (id == 15L) Array[Byte](9, 9, 9)
        else Multimodal.gifFixtureVariant(id / 4, id % 4, 16, 16, frames = 6)
      (id, bytes, "image/gif")
    }.toDF("id", "media", "content_type")
    val prints = Multimodal.videoFingerprints(spark, media, n = 3, 16, 16)
    assert(prints.where(col("id") === 15L).count() == 0)
    assert(prints.where(col("id") === 0L).count() == 3) // frames 0,2,4
    val pairs = Multimodal.videoNearDups(prints, nFrames = 3, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 15L; b <- (a + 1) until 15L if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs == expected)
  }

  test("video near-dups: identical short videos (fewer frames than the sampling target) still match") {
    import spark.implicits._
    val media = Seq(
      (0L, Multimodal.gifFixtureVariant(0, 0, 16, 16, frames = 2), "image/gif"),
      (1L, Multimodal.gifFixtureVariant(0, 0, 16, 16, frames = 2), "image/gif"),
      (2L, Multimodal.gifFixtureVariant(1, 0, 16, 16, frames = 6), "image/gif"))
      .toDF("id", "media", "content_type")
    val prints = Multimodal.videoFingerprints(spark, media, n = 3, 16, 16)
    // only 2 frames exist; the match bar is min(frames_a, frames_b), not n
    val nShort = prints.where(col("id") === 0L).count()
    assert(nShort == 2, s"sampled $nShort")
    val pairs = Multimodal.videoNearDups(prints, nFrames = 3, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  // ---- Conversations ----------------------------------------------------

  test("conversation threading splits on the gap and orders turns in time") {
    import spark.implicits._
    val events = Seq(
      // user 1: two sessions (gap of 2h between ts 1000 and 7201000)
      (1L, 1000L, 1L, "ask"), (1L, 2000L, 2L, "answer"), (1L, 3000L, 3L, "follow"),
      (1L, 7201000L, 4L, "ask"), (1L, 7202000L, 5L, "answer"),
      // user 2: one session, out-of-order input rows, tie on ts broken by id
      (2L, 5000L, 7L, "b"), (2L, 4000L, 6L, "a"), (2L, 5000L, 8L, "c")
    ).toDF("user_id", "ts_ms", "event_id", "tok")
    val out = Conversations.threads(events, "user_id", "ts_ms", "event_id",
      col("tok"), gapMs = 3600000L)
      .orderBy(col("user_id"), col("session_idx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[String]("convo")))
    assert(out.toSeq == Seq(
      (1L, 0L, 3L, "ask answer follow"),
      (1L, 1L, 2L, "ask answer"),
      (2L, 0L, 3L, "a b c")))
  }

  test("conversation transcripts are partitioning-independent") {
    val ev = Tables.events(spark, sf)
    def digests(df: org.apache.spark.sql.DataFrame) =
      Conversations.threads(df, "user_id", "ts_ms", "event_id",
        col("event_type"), gapMs = 3600000L)
        .select("user_id", "session_idx", "convo_md5")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(digests(ev) == digests(ev.repartition(11)))
  }

  test("bestPerCluster keeps the highest-scoring member, singletons keep themselves") {
    import spark.implicits._
    val common = (1 to 30).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, common),                       // cluster {1,2,3}: 3 is longest
      (2L, common + " extra"),
      (3L, common + " extra extra more"),
      (9L, (50 to 90).map(i => s"u$i").mkString(" "))) // singleton
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(df, "doc_id", "text", threshold = 0.5)
    val best = Dedup.bestPerCluster(df, "doc_id", pairs,
      size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(best == Set((1L, 3L, 3L), (9L, 9L, 1L)),
      s"got $best") // cluster 1 keeps doc 3 (longest), singleton 9 keeps itself
  }

  // ---- Containment dedup ------------------------------------------------

  test("containment catches a document embedded in a larger one that Jaccard misses") {
    import spark.implicits._
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val big = ((1 to 12) ++ (100 to 200)).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, small), (2L, big),
      (3L, (300 to 340).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(df, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cont.toSeq == Seq((1L, 2L)), s"got ${cont.toSeq}")
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "jaccard must NOT flag the subset pair")
  }

  // ---- EntityResolution -------------------------------------------------

  test("entity resolution finds exact copies at distance 0 and respects the cap") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),   // exact copy
      (3L, "the quick brown fox jumps over the lazy cat yesterday"), // near copy
      (4L, "completely different text that shares no block prefix")
    ).toDF("doc_id", "text")
    val pairs = EntityResolution.matchPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(pairs.contains((1L, 2L, 0L)))
    assert(pairs.exists { case (a, b, _) => (a, b) == (1L, 3L) })
    assert(!pairs.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("entity resolution drops over-full blocks instead of exploding them") {
    import spark.implicits._
    val boiler = (0L until 50L).map(i => (i, s"same prefix here $i"))
    val df = boiler.toDF("doc_id", "text")
    val capped = EntityResolution.matchPairs(df, "doc_id", "text", maxBlockSize = 10)
    assert(capped.count() == 0)
    val open = EntityResolution.matchPairs(df, "doc_id", "text", maxBlockSize = 100)
    assert(open.count() > 0)
  }

  test("entity resolution matches the relative-distance contract") {
    val rows = EntityResolution.matchPairs(docs, "doc_id", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rel") <= 0.2 + 1e-9)
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
    }
  }
}
