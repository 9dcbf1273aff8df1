package graft.queries

import java.nio.file.Paths

/** Versioned scratch roots for query fixtures (sinks, checkpoints).
  *
  * The version segment MUST roll together with [[graft.kfs.KfsSeed]]'s
  * fixture version: streaming checkpoints embed absolute source paths, so
  * a checkpoint written against one fixture generation must never be
  * resumed against another (this already rolled v1→v2 once). Every pack
  * that materializes a sink/checkpoint derives its path HERE so the
  * invariant lives in one place.
  */
object Fixtures {
  def tmp(sfDir: String, name: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    s"/tmp/graft_etl/v2/$sfName/$name"
  }
}
