package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{Packing, Shuffling}

/** Property-based packing/shuffle laws over random corpora: token mass is
  * conserved, every chunk but the last is full, positions are dense, and
  * both layouts are pure functions of their inputs (same seed → identical,
  * different epoch → reshuffled). Raw ScalaCheck generators with fixed
  * seeds (the scalatest bridge isn't on the offline classpath). */
class PackingPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Random corpus: sparse non-contiguous ids, 1..40-token texts drawn
    * from a tiny vocabulary (collisions and repeats on purpose). */
  private def genCorpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(5, 60)
    ids <- Gen.listOfN(n, Gen.choose(0L, 5000L)).map(_.distinct)
    texts <- Gen.listOfN(ids.length, for {
      len <- Gen.choose(1, 40)
      ws <- Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta", "x9"))
    } yield ws.mkString(" "))
  } yield ids.zip(texts)

  test("resample ffill laws: dense per-key grids, value conservation, no null after first") {
    import spark.implicits._
    val genSeries: Gen[Seq[(String, Long, Double)]] = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        ts <- Gen.choose(0L, 2000L)
        v <- Gen.choose(-50, 50)
      } yield (k, ts, v.toDouble))
    } yield rows
    (1L to 8L).foreach { seed =>
      val rows = sample(genSeries, seed)
      val out = graft.ops.Resample.ffill(
        rows.toDF("k", "ts", "v"), "k", "ts", "v", intervalMs = 100L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[Any]))
      val byKey = rows.groupBy(_._1)
      out.groupBy(_._1).foreach { case (k, os) =>
        val buckets = byKey(k).map(_._2 / 100L)
        // grid is dense over exactly the key's own [min, max] span
        assert(os.map(_._2).sorted.toSeq == (buckets.min to buckets.max),
          s"seed=$seed key=$k grid must be dense over the key's span")
        // observed buckets are unfilled; synthesized ones are flagged
        val observed = buckets.toSet
        os.foreach { case (_, b, filled, v) =>
          assert(filled == !observed.contains(b), s"seed=$seed filled flag")
          assert(v != null, s"seed=$seed no null after first observation")
        }
        // every observed bucket's value is that bucket's exact sum
        val sums = byKey(k).groupBy(_._2 / 100L)
          .view.mapValues(_.map(_._3).sum).toMap
        os.filter(!_._3).foreach { case (_, b, _, v) =>
          assert(v.asInstanceOf[Double] == sums(b), s"seed=$seed bucket sum")
        }
      }
    }
  }

  test("packedRows: token mass conserved, all-but-last chunks full, digests stable") {
    import spark.implicits._
    (1L to 6L).foreach { seed =>
      val corpus = sample(genCorpus, seed)
      val df = corpus.toDF("doc_id", "text")
      val seqLen = 1 + (seed % 4).toInt * 7 // 1, 8, 15, 22 — incl. degenerate 1
      val rows = Packing.packedRows(df, "doc_id", "text", seqLen, shards = 3)
        .collect()
      val totalTokens = corpus.map(_._2.split(" ").length.toLong).sum
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens,
        s"seed=$seed token mass must be conserved")
      rows.groupBy(_.getAs[Int]("shard")).foreach { case (sh, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("seq_idx"))
        assert(sorted.map(_.getAs[Long]("seq_idx")).toSeq ==
          (0L until sorted.length).toSeq, s"seed=$seed shard=$sh dense seqs")
        sorted.init.foreach(r =>
          assert(r.getAs[Long]("n_tokens") == seqLen.toLong,
            s"seed=$seed shard=$sh only the last chunk may be partial"))
      }
      // purity: a re-run reproduces every digest
      val again = Packing.packedRows(df, "doc_id", "text", seqLen, shards = 3)
        .collect()
      assert(rows.map(r => (r.getAs[Int]("shard"), r.getAs[Long]("seq_idx"),
          r.getAs[String]("seq_md5"))).sortBy(t => (t._1, t._2)).toSeq ==
        again.map(r => (r.getAs[Int]("shard"), r.getAs[Long]("seq_idx"),
          r.getAs[String]("seq_md5"))).sortBy(t => (t._1, t._2)).toSeq)
    }
  }

  test("epoch shuffle: positions dense, assignment pure, shards cover all docs") {
    import spark.implicits._
    (10L to 13L).foreach { seed =>
      val corpus = sample(genCorpus, seed)
      val df = corpus.toDF("doc_id", "text")
      val shards = 1 + (seed % 5).toInt
      val a = Shuffling.assign(df, "doc_id", epoch = 3, shards = shards).collect()
      assert(a.length == corpus.length, s"seed=$seed no row lost or duplicated")
      assert(a.map(_.getAs[Long]("doc_id")).toSet == corpus.map(_._1).toSet)
      a.groupBy(_.getAs[Int]("shard")).foreach { case (sh, rs) =>
        assert(sh >= 0 && sh < shards)
        assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq ==
          (0L until rs.length).toSeq, s"seed=$seed shard=$sh dense positions")
      }
      // manifest digest is reproducible and shard-complete
      val m1 = Shuffling.shardManifest(
        Shuffling.assign(df, "doc_id", epoch = 3, shards = shards), "doc_id")
        .collect().map(r => (r.getAs[Int]("shard"),
          r.getAs[java.math.BigDecimal]("digest"))).sortBy(_._1).toSeq
      val m2 = Shuffling.shardManifest(
        Shuffling.assign(df, "doc_id", epoch = 3, shards = shards), "doc_id")
        .collect().map(r => (r.getAs[Int]("shard"),
          r.getAs[java.math.BigDecimal]("digest"))).sortBy(_._1).toSeq
      assert(m1 == m2, s"seed=$seed manifest must be a pure function")
    }
  }
}
