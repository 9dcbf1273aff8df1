package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-hierarchy traversal — the Spark answer to `WITH RECURSIVE`,
  * which Catalyst does not have (SPARK-24497). BOM explosions, org-chart
  * rollups, and category trees all need "every descendant with its root and
  * depth"; engines with recursive CTEs express it declaratively, Spark
  * expresses it as an iterative frontier BFS whose per-level work is one
  * hash join.
  *
  * 100 TB shape: each level joins the (small, shrinking) frontier against
  * the edge table on the parent key — a key-hash shuffle of the frontier
  * plus one pass over edges; AQE broadcasts the frontier once it fits. The
  * number of actions equals the tree DEPTH (logarithmic for any sanely
  * bushy hierarchy), not the node count, and every level is
  * `localCheckpoint`ed so lineage stays flat no matter how deep the
  * recursion goes.
  *
  * Termination discipline: in a (node, parent) model a cycle's members all
  * carry parents, so a cycle can never be REACHED from a root — like
  * orphans (parents outside the node set), its members are simply absent
  * from the result, never mis-rooted. The runaway the `maxDepth` guard
  * exists for is a root-reachable chain deeper than declared (data bug or
  * undersized bound): that raises loudly instead of grinding through
  * thousands of levels, and only when rows actually exist PAST `maxDepth`
  * — a forest whose deepest node sits exactly at `maxDepth` resolves.
  */
object Hierarchy {

  /** Expand a forest into (node, root, depth) — one row per node, rooted at
    * its tree's root, with its distance from that root.
    *
    * @param nodes    one row per node: `nodeCol` (any orderable key type)
    *                 and `parentCol`, where a NULL parent marks a root
    * @param maxDepth cycle guard: if a frontier is still non-empty after
    *                 this many levels, the "forest" has a cycle (or is
    *                 deeper than declared) and the traversal throws
    */
  def reachability(nodes: DataFrame, nodeCol: String, parentCol: String,
      maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be at least 1")
    val edges = nodes
      .filter(col(parentCol).isNotNull)
      .select(col(nodeCol).as("child"), col(parentCol).as("parent"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var frontier = nodes.filter(col(parentCol).isNull)
        .select(col(nodeCol).as("node"), col(nodeCol).as("root"),
          lit(0).as("depth"))
        .localCheckpoint()
      val levels = scala.collection.mutable.ArrayBuffer(frontier)
      var depth = 0
      while (!frontier.isEmpty) {
        depth += 1
        frontier = edges.join(frontier, edges("parent") === frontier("node"))
          .select(edges("child").as("node"), frontier("root"),
            (frontier("depth") + 1).as("depth"))
          .localCheckpoint() // flat lineage per level, reused twice below
        // guard AFTER discovering the level: only rows that actually sit
        // past maxDepth are an error — depth == maxDepth with an empty
        // next frontier is a legal forest, not a runaway
        if (depth > maxDepth && !frontier.isEmpty) throw
          new IllegalArgumentException(
            s"hierarchy deeper than maxDepth=$maxDepth — runaway parent " +
              "chain, or raise maxDepth")
        levels += frontier
      }
      // the last frontier is empty — harmless in the union, keeps the code
      // straight-line
      levels.reduce(_ unionByName _)
    } finally edges.unpersist()
  }
}
