package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph ranking for corpus curation — the web-graph half of
  * training-data quality weighting (crawl frontiers and quality weights
  * are classically PageRank-derived; the reference's analytics surface has
  * no graph operator, so this is superset, same family as the transitive
  * duplicate clustering in [[Dedup]]).
  *
  * Deterministic INTEGER PageRank: ranks are maintained as integer
  * micro-units (`scale` = 1.0), every division is truncating integer
  * division, and every per-node combine is an integer SUM — so the result
  * is bit-identical on any engine and the t39 oracle replays the full
  * iteration unrolled in DuckDB. A float PageRank is NOT cross-engine
  * reproducible (per-node contribution sums depend on partition order);
  * the integer formulation loses < 1 micro-unit per in-edge to truncation,
  * which is noise at rank scale and buys exactness.
  *
  * Per iteration:
  * {{{
  *   pr'(v) = baseline + (dampNum * Σ_{u→v} (pr(u) / outdeg(u))) / dampDen
  * }}}
  * with `baseline = ((dampDen−dampNum) · scale / dampDen) / n` (all `/`
  * truncating). Dangling mass (nodes with no out-edges) is dropped, the
  * standard simplification when ranks are only compared, not summed to 1.
  *
  * Scale shape (the Pregel-on-DataFrames loop, same discipline as
  * [[Dedup]] label propagation): the edge list is hash-partitioned on
  * `src` ONCE and persisted; each round shuffles only the rank frame
  * (O(nodes), never O(edges)) into the join, aggregates contributions
  * map-side-partial by `dst`, and eagerly `localCheckpoint`s the new rank
  * frame so lineage (and recomputation cost) never compounds across
  * rounds. Iteration count is a fixed small constant — rank queries use
  * 3–20 rounds, not convergence-to-epsilon.
  */
object Graph {

  /** Run `iters` rounds of integer PageRank over a directed edge list.
    *
    * @param edges distinct directed edges; self-loops allowed (a page
    *              linking itself contributes to its own rank)
    * @return (node, pr) — `pr` in integer micro-units of `scale`
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst")))
        .distinct()
        .localCheckpoint() // nodes reused every round — never re-derived
      val n = nodes.count()
      val baseline = ((dampDen - dampNum) * scale / dampDen) / n
      val outdeg = e.groupBy(col("src"))
        .agg(count(lit(1)).as("outdeg"))
        .localCheckpoint()
      var pr = nodes.withColumn("pr", lit(scale / n))
      (1 to iters).foreach { _ =>
        // `div` (not `/`): Spark's `/` on longs is a DOUBLE divide; `div`
        // is the exact truncating integer division the oracle replays
        val contrib = pr.join(e, pr("node") === e("src"))
          .join(outdeg, "src")
          .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
        pr = nodes.join(contrib, Seq("node"), "left")
          .withColumn("inflow", coalesce(col("inflow"), lit(0L)))
          .select(col("node"),
            (lit(baseline) + expr(s"($dampNum * inflow) div $dampDen"))
              .as("pr"))
          .localCheckpoint()
      }
      pr
    } finally e.unpersist()
  }

  /** Per-node TRIANGLE participation via the degree-ordered node-iterator
    * (Schank/Wagner; the MapReduce form is Suri/Vassilvitskii's): edges
    * canonicalize undirected, then orient from the (degree, id)-SMALLER
    * endpoint, so every wedge is built at its lowest-rank apex — the
    * O(m^{3/2}) wedge bound. A celebrity node of degree d builds wedges
    * only toward HIGHER-rank neighbors, so the skew bomb of a hub's d²
    * wedge set never detonates; each triangle materializes exactly once
    * and explodes to its three corners for the per-node tally.
    *
    * 100 TB shape: two self-joins on node keys (wedge build + closure
    * probe) and one small degree join — all hash shuffles, no windows,
    * no global sort, intermediate volume bounded by the wedge count. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
    // orient each edge from the (degree, id)-smaller endpoint; carry both
    // ranks so the wedge join can order neighbors without re-joining deg
    val o = und
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("c", "ca"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("c", "cb"), "b")
      .select(
        when(struct(col("ca"), col("a")) < struct(col("cb"), col("b")),
          struct(col("a").as("id"), col("ca").as("c")))
          .otherwise(struct(col("b").as("id"), col("cb").as("c"))).as("u"),
        when(struct(col("ca"), col("a")) < struct(col("cb"), col("b")),
          struct(col("b").as("id"), col("cb").as("c")))
          .otherwise(struct(col("a").as("id"), col("ca").as("c"))).as("v"))
    // the oriented edge list feeds three join sides; persist it so the
    // canonicalize/degree lineage runs once, not per consumer (same rule
    // as pagerank's edge persist above)
    val oc = o.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val e1 = oc.select(col("u.id").as("apex"), col("v.id").as("x"),
        struct(col("v.c"), col("v.id")).as("rx"))
      val e2 = oc.select(col("u.id").as("apex"), col("v.id").as("y"),
        struct(col("v.c"), col("v.id")).as("ry"))
      val wedges = e1.join(e2, Seq("apex")).where(col("rx") < col("ry"))
      val closing = oc.select(col("u.id").as("x"), col("v.id").as("y"))
      // materialize the |V|-bounded result into the block cache while the
      // edge cache is alive, so the caller's action reads cached counts
      // instead of re-deriving o after the unpersist below. A CACHE, not
      // a localCheckpoint: lineage stays intact, so a lost executor
      // recomputes (slower, from the unpersisted plan) rather than
      // failing permanently, and the caller can unpersist when done.
      val tri = wedges.join(closing, Seq("x", "y"))
        .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      tri.count()
      tri
    } finally oc.unpersist(blocking = false)
  }
}
