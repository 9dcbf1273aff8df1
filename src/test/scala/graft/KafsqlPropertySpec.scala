package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.kafsql._
import graft.queries.KafsqlPack

/** Property-based grammar fuzzing — sampled statements across the dialect's
  * space must parse AND plan (the reference has no property testing at all,
  * SURVEY §5). Catches clause-ordering and reserved-word-collision crashes a
  * fixed corpus misses. Raw ScalaCheck generators with a fixed seed (the
  * scalatest bridge isn't on the offline classpath).
  */
class KafsqlPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val reg = KafsqlPack.registry(sf)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genProj: Gen[String] = Gen.oneOf(
    "*", "_offset", "_partition, _offset", "_key AS k",
    "json_value(_value, '$.k') AS jv",
    "json_exists(_value, '$.k') AS je",
    "_topic, _ts, _segment")
  private val genAggProj: Gen[String] = Gen.oneOf(
    "COUNT(*) AS c", "COUNT(_key) AS c, SUM(json_value(_value, '$.k')) AS s",
    "_partition, COUNT(*) AS c", "_partition, MIN(_ts) AS mn, MAX(_ts) AS mx",
    "AVG(json_value(_value, '$.k')) AS a")
  private val genWhere: Gen[String] = Gen.oneOf(
    "", "WHERE _partition = 1", "WHERE _offset >= 3 AND _offset <= 200",
    "WHERE _ts >= '2024-01-05' AND _ts <= '2024-01-28 12:00:00'",
    "WHERE _ts BETWEEN 1704844800000 AND '2024-01-25T00:00:00Z'")
  private val genWindow: Gen[String] = Gen.oneOf(
    "LAST 5m", "LAST 2h", "LAST 10d", "LAST 1h30m", "TAIL 7", "SCAN FULL")
  private val genOrder: Gen[String] = Gen.oneOf("", "ORDER BY _ts", "ORDER BY _ts DESC")
  private val genLimit: Gen[String] = Gen.oneOf("", "LIMIT 10", "LIMIT 5000")

  test("sampled plain SELECTs all parse and plan") {
    val cases = for {
      p <- samples(genProj, 7); w <- samples(genWhere, 5)
      o <- samples(genOrder, 3); win <- samples(genWindow, 6)
      if o.isEmpty || !win.startsWith("TAIL")
    } yield s"SELECT $p FROM events $w $o LIMIT 50 $win"
    assert(cases.size > 300)
    cases.foreach { sql =>
      val df = Kafsql.sql(spark, reg, sql, nowMs = Tables.FixedNowMs)
      assert(df.columns.nonEmpty, sql)
    }
  }

  test("sampled aggregate SELECTs all parse and plan") {
    val cases = for {
      p <- samples(genAggProj, 5); w <- samples(genWhere, 5)
      win <- Seq("LAST 5d", "SCAN FULL")
    } yield {
      val groupBy = if (p.startsWith("_partition")) "GROUP BY _partition" else ""
      s"SELECT $p FROM events $w $groupBy $win"
    }
    cases.foreach { sql =>
      val df = Kafsql.sql(spark, reg, sql, nowMs = Tables.FixedNowMs)
      assert(df.columns.nonEmpty, sql)
    }
  }

  test("sampled joins all parse and plan") {
    val cases = for {
      jt <- Seq("JOIN", "LEFT JOIN")
      on <- Seq("", "ON o._key = p._key",
        "ON json_value(o._value, '$.k') = json_value(p._value, '$.k')")
      win <- Seq("WITHIN 5m", "WITHIN 2h", "WITHIN 1d")
    } yield s"SELECT o._offset AS lo FROM purchases o $jt errors p $on $win LIMIT 50 LAST 10d"
    cases.foreach { sql =>
      val df = Kafsql.sql(spark, reg, sql, nowMs = Tables.FixedNowMs)
      assert(df.columns.toSeq == Seq("lo"), sql)
    }
  }

  test("random garbage never escapes as anything but KafsqlException") {
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      try { Parser.parse(s); () }
      catch {
        case _: KafsqlException => ()
        case other: Throwable =>
          fail(s"unexpected ${other.getClass.getName} for input: $s", other)
      }
    }
  }
}
