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
  /** Extra path segment isolating repeated runs: stateful queries (stream
    * checkpoints, sinks with offset-dedup) are no-ops when re-run against
    * their existing state, so a timing harness that repeats queries must
    * give each repetition a fresh fixture root or later reps measure the
    * skip path, not the operator. Empty (default, used by Verify) keeps the
    * stable paths so idempotent-replay semantics stay testable. */
  @volatile var runSuffix: String = ""

  def tmp(sfDir: String, name: String): String = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val sub = if (runSuffix.isEmpty) "" else s"/$runSuffix"
    // v3 rolled with KfsSeed v3 (key-Bloom sidecars): checkpoints embed
    // the seeded root's absolute path, so the generations move together
    s"/tmp/graft_etl/v3/$sfName$sub/$name"
  }
}
