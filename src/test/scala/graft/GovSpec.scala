package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.gov._
import graft.kafsql.Kafsql
import graft.queries.KafsqlPack

/** Governance layer: result cache (X12), admission (X8/X10), timeout (X11). */
class GovSpec extends AnyFunSuite {
  import TestSpark._

  test("result cache: identical bounded query hits cache inside TTL") {
    val gov = new Governor(Guardrails(resultCacheTtlMs = 60000))
    val reg = KafsqlPack.registry(sf)
    val sql = "SELECT _partition, COUNT(*) AS cnt FROM events GROUP BY _partition LAST 30d"
    val r1 = Kafsql.governed(spark, reg, gov, sql, nowMs = Tables.FixedNowMs).collect()
    assert(gov.cacheSize == 1 && gov.hits == 0)
    val r2 = Kafsql.governed(spark, reg, gov, sql, nowMs = Tables.FixedNowMs).collect()
    assert(gov.hits == 1)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("result cache skips TAIL and SCAN FULL (server.go:557-598)") {
    val gov = new Governor(Guardrails())
    val reg = KafsqlPack.registry(sf)
    Kafsql.governed(spark, reg, gov,
      "SELECT _offset FROM events TAIL 3", nowMs = Tables.FixedNowMs).collect()
    Kafsql.governed(spark, reg, gov,
      "SELECT _offset FROM events SCAN FULL", nowMs = Tables.FixedNowMs).collect()
    assert(gov.cacheSize == 0)
  }

  test("result cache entries expire after the TTL") {
    val gov = new Governor(Guardrails(resultCacheTtlMs = 1))
    val reg = KafsqlPack.registry(sf)
    val sql = "SELECT COUNT(*) AS c FROM events LAST 30d"
    Kafsql.governed(spark, reg, gov, sql, nowMs = Tables.FixedNowMs).collect()
    Thread.sleep(10)
    Kafsql.governed(spark, reg, gov, sql, nowMs = Tables.FixedNowMs).collect()
    assert(gov.hits == 0) // expired, never served from cache
  }

  test("cache key normalizes whitespace/case but separates time bounds") {
    val gov = new Governor(Guardrails())
    val a = gov.cacheKey("SELECT  *  FROM t LAST 5m", (Some(1L), Some(2L)))
    val b = gov.cacheKey("select * from t last 5m", (Some(1L), Some(2L)))
    val c = gov.cacheKey("select * from t last 5m", (Some(9L), Some(2L)))
    assert(a == b && a != c)
  }

  test("scan admission rejects over-budget segment sets (server.go:2854-2862)") {
    val rails = Guardrails(maxScanSegments = 10, maxScanBytes = 1000)
    ScanAdmission.admit(5, 500, rails)
    intercept[ScanAdmission.ScanLimitException](ScanAdmission.admit(11, 1, rails))
    intercept[ScanAdmission.ScanLimitException](ScanAdmission.admit(1, 1001, rails))
  }

  test("concurrency limiter: queue overflow rejected (query_limiter.go:28-87)") {
    val gov = new Governor(Guardrails(maxConcurrent = 1, queueSize = 0))
    val latch = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => gov.withAdmission() { started.countDown(); latch.await() })
    t.start()
    started.await()
    // maxConcurrent+queueSize = 1 -> a second concurrent query overflows
    intercept[gov.QueryQueueFullException](gov.withAdmission()(()))
    latch.countDown()
    t.join()
  }

  test("timeout cancels long queries (server.go:2847-2852)") {
    val gov = new Governor(Guardrails(queryTimeoutMs = 300))
    intercept[Exception] {
      gov.withTimeout(spark, 300) {
        import spark.implicits._
        // ~32s of sleep across tasks — must be cancelled at 300ms
        spark.range(32).as[Long].map { i => Thread.sleep(1000); i }.count()
      }
    }
  }
}
