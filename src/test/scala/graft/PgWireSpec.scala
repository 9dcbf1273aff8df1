package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.core.Tables
import graft.pgwire.PgWireServer
import graft.queries.KafsqlPack

/** End-to-end over the wire with the real psql client: startup handshake,
  * simple Query, error responses — mirroring the reference's primary entry
  * point (`minio_e2e_test.go` runs SQL over pg wire the same way). */
class PgWireSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  private var server: PgWireServer = _

  override def beforeAll(): Unit = {
    server = new PgWireServer(spark, KafsqlPack.registry(sf),
      nowMs = () => Tables.FixedNowMs).start()
  }
  override def afterAll(): Unit = if (server != null) server.stop()

  private def psql(sql: String): (Int, String, String) = {
    val outB = new StringBuilder
    val errB = new StringBuilder
    val cmd = Seq("psql",
      s"host=127.0.0.1 port=${server.boundPort} dbname=graft user=graft",
      "-X", "-At", "-c", sql)
    val code = cmd ! ProcessLogger(l => outB.append(l).append('\n'),
      l => errB.append(l).append('\n'))
    (code, outB.toString, errB.toString)
  }

  test("psql runs the flagship aggregate over the wire") {
    val (code, out, err) = psql(
      "SELECT _partition, COUNT(*) AS cnt FROM events GROUP BY _partition LAST 30d")
    assert(code == 0, s"psql failed: $err")
    val rows = out.trim.linesIterator.map(_.split('|')).toSeq
    assert(rows.map(r => (r(0).toInt, r(1).toLong)) ==
      Seq((0, 250L), (1, 250L), (2, 250L), (3, 250L)))
  }

  test("psql sees typed values: json extraction, timestamps, hex keys") {
    val (code, out, err) = psql(
      "SELECT _offset, _key, json_value(_value, '$.k') AS k FROM events " +
        "WHERE _partition = 1 AND _offset <= 2 SCAN FULL")
    assert(code == 0, s"psql failed: $err")
    val rows = out.trim.linesIterator.map(_.split('|')).toSeq
    assert(rows.length == 3)
    assert(rows.forall(_.length == 3))
    assert(rows.map(_(0)) == Seq("0", "1", "2"))
    assert(rows.forall(_(1).startsWith("user-")))
  }

  test("SHOW TOPICS and DESCRIBE work over the wire") {
    val (c1, topics, _) = psql("SHOW TOPICS")
    assert(c1 == 0 && topics.trim.linesIterator.toSeq ==
      Seq("errors", "events", "kevents", "purchases"))
    val (c2, desc, _) = psql("DESCRIBE events")
    assert(c2 == 0)
    assert(desc.contains("_offset|bigint|"))
    assert(desc.contains("k|integer|$.k"))
  }

  test("guardrail violations surface as SQL errors, connection survives") {
    val (code, _, err) = psql("SELECT _offset FROM events")
    assert(code != 0)
    assert(err.contains("unbounded query: add LAST, TAIL, or SCAN FULL"))
    // connection pool is stateless; a new query still works
    val (code2, out2, _) = psql("SELECT COUNT(*) AS n FROM events LAST 30d")
    assert(code2 == 0 && out2.trim == "1000")
  }

  test("information_schema/pg_catalog emulation serves BI introspection") {
    val (c1, tables, _) = psql("SELECT table_name FROM information_schema.tables")
    assert(c1 == 0)
    assert(tables.trim.linesIterator.toSet ==
      Set("errors", "events", "kevents", "purchases"))
    val (c2, cols, _) = psql(
      "SELECT column_name, data_type FROM information_schema.columns")
    assert(c2 == 0)
    assert(cols.contains("_offset|bigint"))
    assert(cols.contains("k|integer"))
    val (c3, ns, _) = psql("SELECT nspname FROM pg_catalog.pg_namespace")
    assert(c3 == 0 && ns.contains("public"))
  }

  test("EXPLAIN over the wire returns plan text") {
    val (code, out, err) = psql("EXPLAIN SELECT _offset FROM events LAST 5m")
    assert(code == 0, err)
    assert(out.contains("scan topic events"))
  }

  test("SET is accepted as a no-op for BI compatibility (server.go:637-657)") {
    val (code, _, err) = psql("SET search_path TO public")
    assert(code == 0, err)
  }

  test("SHOW METRICS exposes ops counters over the wire") {
    psql("SELECT COUNT(*) AS n FROM events LAST 30d") // ensure >= 1 served
    val (code, out, err) = psql("SHOW METRICS")
    assert(code == 0, err)
    val m = out.trim.linesIterator.map(_.split('|')).map(r => r(0) -> r(1).toLong).toMap
    assert(m("queries_served") >= 1)
    assert(m.contains("result_cache_hits") && m.contains("query_errors"))
  }
}
