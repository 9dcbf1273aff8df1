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
