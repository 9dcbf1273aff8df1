package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{Conversations, Curation}

/** Property laws for the curation operators over random inputs: the
  * per-key cap law (bound, subset, determinism under repartitioning) and
  * conversation threading against an in-memory reference implementation
  * (including timestamp ties and single-event sessions). Raw ScalaCheck
  * generators with fixed seeds, same pattern as PackingPropertySpec. */
class CurationPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- Curation.capPerKey ----------------------------------------------

  private def genKeyed: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(10, 120)
    ids <- Gen.listOfN(n, Gen.choose(0L, 10000L)).map(_.distinct)
    keys <- Gen.listOfN(ids.length, Gen.oneOf("k0", "k1", "k2", "hot"))
  } yield ids.zip(keys)

  test("capPerKey law: bounded per key, subset, repartition-invariant") {
    import spark.implicits._
    (1L to 6L).foreach { seed =>
      val rows = sample(genKeyed, seed)
      val cap = 1 + (seed % 5).toInt
      val df = rows.toDF("doc_id", "source")
      def keptIds(d: org.apache.spark.sql.DataFrame) =
        Curation.capPerKey(d, "doc_id", "source", cap)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      val kept = keptIds(df)
      // bound per key
      val byKey = rows.filter(r => kept(r._1)).groupBy(_._2).view.mapValues(_.size)
      byKey.foreach { case (k, n) => assert(n <= cap, s"seed $seed key $k: $n > $cap") }
      // keys with <= cap members keep everything
      rows.groupBy(_._2).foreach { case (k, members) =>
        if (members.size <= cap)
          members.foreach(m => assert(kept(m._1), s"seed $seed lost $m under cap"))
      }
      // physical layout must not change the selection
      assert(keptIds(df.repartition(7)) == kept, s"seed $seed: layout-dependent")
    }
  }

  // ---- Conversations.threads -------------------------------------------

  private def genEvents: Gen[Seq[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(5, 80)
    rows <- Gen.listOfN(n, for {
      actor <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 50L).map(_ * 1000L) // coarse: forces ts ties
      tok <- Gen.oneOf("a", "b", "c")
    } yield (actor, ts, tok))
  } yield rows.zipWithIndex.map { case ((actor, ts, tok), i) =>
    (actor, ts, i.toLong, tok) // unique event id = index
  }

  /** Reference implementation: per actor, sort by (ts, id), split when the
    * gap exceeds gapMs, emit (actor, sessionIdx, transcript). */
  private def referenceThreads(events: Seq[(Long, Long, Long, String)],
      gapMs: Long): Set[(Long, Long, String)] = {
    events.groupBy(_._1).flatMap { case (actor, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[
        scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]]
      sorted.foreach { e =>
        if (sessions.isEmpty || e._2 - sessions.last.last._2 > gapMs)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (actor, i.toLong, s.map(_._4).mkString(" "))
      }
    }.toSet
  }

  test("conversation threading equals the reference implementation on random logs") {
    import spark.implicits._
    (1L to 6L).foreach { seed =>
      val events = sample(genEvents, seed)
      val gap = 5000L
      val df = events.toDF("user_id", "ts_ms", "event_id", "tok")
      val got = Conversations.threads(df, "user_id", "ts_ms", "event_id",
        col("tok"), gapMs = gap)
        .select("user_id", "session_idx", "convo")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = referenceThreads(events, gap)
      assert(got == want, s"seed $seed:\n got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
    }
  }
}
