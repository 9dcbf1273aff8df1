package graft.pgwire

import graft.core.{GraftSession, Tables}
import graft.kafsql.{SchemaCol, TopicDef, TopicRegistry}

/** Launchable KAFSQL-over-pg-wire endpoint:
  * {{{
  * sbt "runMain graft.pgwire.PgWireMain 5433 /root/testdata/sf0.001"
  * psql "host=127.0.0.1 port=5433" -c "SELECT COUNT(*) AS n FROM events LAST 30d"
  * }}}
  * Serves the driver testdata's events topic (plus a KFS-backed twin when
  * segments are seeded) until interrupted.
  */
object PgWireMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(5433)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local("local[8]")
    val registry = new TopicRegistry(Seq(
      TopicDef("events", s => Tables.eventsTopic(s, sfDir),
        schemaCols = Seq(SchemaCol("k", "int", "$.k")),
        partitions = 0 until Tables.TopicPartitions)))
    val server = new PgWireServer(spark, registry, port = port).start()
    println(s"pgwire: serving KAFSQL on port ${server.boundPort} (sf=$sfDir)")
    Thread.currentThread().join()
  }
}
