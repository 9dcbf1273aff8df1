package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Property law for the shared 4×16-bit banding verifier (image aHash,
  * audio fingerprint, video keyframes all ride it): over random 64-bit
  * fingerprints, banded candidate generation + exact hamming verify is
  * EXACTLY brute force at maxDist ≤ 3 — the pigeonhole guarantee (≤3
  * differing bits cannot dirty all four bands) — including adversarial
  * near-miss populations that differ in exactly 3 or 4 bits. */
class BandingPropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def genBits: Gen[String] =
    Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)

  /** Population: a few random "base" fingerprints plus mutated copies at
    * controlled distances 1..6 — dense in exactly the region where the
    * ≤3 threshold separates. */
  private def genPopulation: Gen[Seq[String]] = for {
    nBase <- Gen.choose(2, 5)
    bases <- Gen.listOfN(nBase, genBits)
    mutants <- Gen.sequence[Seq[String], String](bases.flatMap { b =>
      (1 to 6).map { d =>
        Gen.pick(d, 0 until 64).map { idxs =>
          val a = b.toCharArray
          idxs.foreach(i => a(i) = if (a(i) == '0') '1' else '0')
          new String(a)
        }
      }
    })
  } yield (bases ++ mutants).distinct

  test("banded near-dup detection equals brute force at hamming <= 3") {
    import spark.implicits._
    (1L to 8L).foreach { seed =>
      val pop = sample(genPopulation, seed).zipWithIndex
        .map { case (bits, i) => (i.toLong, bits) }
      val df = pop.toDF("id", "ahash")
      val banded = Multimodal.aHashNearDups(df, maxDist = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
      val brute = (for {
        (a, ba) <- pop; (b, bb) <- pop if a < b
        d = ham(ba, bb) if d <= 3
      } yield (a, b, d.toLong)).toSet
      assert(banded == brute, s"seed $seed: banded ${banded.size} vs brute ${brute.size}")
    }
  }
}
