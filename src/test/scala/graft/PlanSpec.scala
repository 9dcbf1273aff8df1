package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the headline query shapes — the "is this
  * the plan you'd want at 100 TB" contract (SURVEY §4): filters and column
  * pruning reach the parquet scan, dimension sides broadcast, aggregates
  * run map-side partials, and the top-k sort never global-sorts.
  *
  * These lock the plan shape so a future refactor that silently drops a
  * broadcast hint or blocks pushdown fails fast, not at the next bench.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q6: filters and projection are pushed into the parquet scan") {
    val plan = planOf("q6_forecast_revenue")
    assert(plan.contains("PushedFilters:") &&
      plan.contains("l_shipdate") && plan.contains("l_quantity"),
      s"expected shipdate/quantity in PushedFilters:\n$plan")
    // projection pruning: the scan must not read the join keys it doesn't use
    assert(!plan.contains("l_orderkey"),
      s"q6 reads only 4 columns; l_orderkey must be pruned:\n$plan")
  }

  test("q3/q5: dimension sides broadcast — no shuffle on customer/nation/region") {
    val q3 = planOf("q3_top_orders")
    assert(q3.contains("BroadcastHashJoin"), s"q3 should broadcast customer:\n$q3")
    val q5 = planOf("q5_nation_revenue")
    assert(q5.contains("BroadcastHashJoin"), s"q5 should broadcast dims:\n$q5")
    // the only Exchange below the aggregate should be the fact-side shuffle
    assert(!q5.contains("SortMergeJoin"),
      s"q5 dims must broadcast, not sort-merge:\n$q5")
  }

  test("q1: aggregate runs map-side partials (two-phase HashAggregate)") {
    val plan = planOf("q1_pricing_summary")
    val n = "HashAggregate".r.findAllIn(plan).length
    assert(n >= 2, s"expected partial+final HashAggregate:\n$plan")
  }

  test("o1: ORDER BY + LIMIT plans as TakeOrderedAndProject (top-k, no global sort)") {
    val plan = planOf("o1_orderby_ts_limit")
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k:\n$plan")
  }

  test("p1: projection pruning reaches the events scan") {
    val plan = planOf("p1_projection")
    // p1 selects topic/partition/offset/key/segment — value must not be read
    assert(!plan.toLowerCase.contains("props"),
      s"p1 must not read the props/_value column:\n$plan")
  }

  test("q4: EXISTS plans as a broadcast semi join, never a cartesian") {
    val plan = planOf("q4_priority_semi")
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"semi join must stay hash-based:\n$plan")
  }

  test("q10/q18: dims and the HAVING-derived set broadcast") {
    val q10 = planOf("q10_returned_top")
    assert(q10.contains("BroadcastHashJoin"), s"q10 dims broadcast:\n$q10")
    assert(q10.contains("TakeOrderedAndProject"), s"q10 top-20 is top-k:\n$q10")
    val q18 = planOf("q18_big_orders")
    assert(q18.contains("BroadcastHashJoin"),
      s"q18 big-order set must broadcast back to orders:\n$q18")
  }

  test("q22: NOT EXISTS plans as an anti join with a pruned probe side") {
    val plan = planOf("q22_idle_customers")
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      s"recency filter must reach the orders scan:\n$plan")
  }

  test("q2/q11/q12/q21: subquery shapes stay hash-based, dims broadcast") {
    // q2: the correlated-scalar MIN re-joins per-part minima by hash —
    // never a window sort — and the top-100 is top-k, not a global sort
    val q2 = planOf("q2_min_cost_supplier")
    assert(!q2.contains("Window"), s"q2 must not window-sort:\n$q2")
    assert(q2.contains("TakeOrderedAndProject(limit=100"),
      s"q2 top-100 must be top-k:\n$q2")
    assert(q2.contains("BroadcastHashJoin") && !q2.contains("CartesianProduct"),
      s"q2 dims and the min-cost side must broadcast:\n$q2")
    // q11: the global total is ONE row — a broadcast nested-loop against
    // it is the right plan (that's the scalar subquery), and the
    // threshold compare stays in decimal
    val q11 = planOf("q11_important_parts")
    assert(q11.contains("IdentityBroadcastMode"),
      s"q11 scalar total must broadcast as a single row:\n$q11")
    assert(q11.contains("partial_sum"),
      s"q11 value aggregate must run map-side partials:\n$q11")
    // q12: the ship-date year range reaches the lineitem scan; the
    // priority split is conditional aggregation, not a union of plans
    val q12 = planOf("q12_late_priority")
    assert(q12.contains("PushedFilters") &&
      q12.contains("GreaterThanOrEqual(l_shipdate"),
      s"q12 date range must reach the scan:\n$q12")
    assert(q12.contains("partial_sum"), s"q12 agg must be two-phase:\n$q12")
    assert(!q12.contains("Union"), s"q12 is one pass, not a union:\n$q12")
    // q21: EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, never a cartesian;
    // the inequality residual rides the join, not a filter over a cross
    val q21 = planOf("q21_waiting_suppliers")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"),
      s"q21 needs semi + anti joins:\n$q21")
    assert(!q21.contains("CartesianProduct") &&
      !q21.contains("BroadcastNestedLoopJoin"),
      s"q21 joins must stay keyed on orderkey:\n$q21")
  }

  test("t24: packed rows shuffle once per stage — shard cumsum, then (shard,seq)") {
    val plan = planOf("t24_packed_rows")
    // exactly one window (the per-shard cumsum); the chunk aggregate is
    // hash-partitioned on (shard, seq_idx), never a global sort below it
    assert(plan.contains("Window"), s"t24 needs the shard cumsum window:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"t24 chunk agg must hash-partition on the shard key:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 3, s"t24 should need at most 3 hash shuffles, saw $shuffles:\n$plan")
  }

  test("t25/t26/s22/u10: shuffle/broadcast/expand shapes hold") {
    // t25: one bounded per-shard window per epoch (2 total), digest agg
    // runs map-side partials, never a cartesian
    val t25 = planOf("t25_epoch_shuffle")
    assert("Window \\[row_number".r.findAllIn(t25).length == 2,
      s"t25 needs exactly the two per-epoch shard windows:\n$t25")
    assert(t25.contains("partial_count") && !t25.contains("CartesianProduct"),
      s"t25 digest agg must be two-phase and keyed:\n$t25")
    // t26: the holdout/probe side of the contamination join broadcasts;
    // nothing degenerates to a cartesian
    val t26 = planOf("t26_leakfree_split")
    assert(t26.contains("BroadcastHashJoin"),
      s"t26 holdout side must broadcast:\n$t26")
    assert(!t26.contains("CartesianProduct") &&
      !t26.contains("BroadcastNestedLoopJoin"),
      s"t26 joins must stay keyed:\n$t26")
    // s22: the salt is in the plan (pmod over the row hash) and the join
    // stays hash-based on (key, salt)
    val s22 = planOf("s22_salted_join")
    assert(s22.contains("pmod"), s"s22 must salt the fact side:\n$s22")
    assert(!s22.contains("CartesianProduct") &&
      !s22.contains("SortMergeJoin"),
      s"s22 salted join must stay hash-based:\n$s22")
    // u10: CUBE expands grouping sets map-side (Expand), agg is two-phase
    val u10 = planOf("u10_cube_quantity")
    assert(u10.contains("Expand"), s"u10 needs the grouping-set Expand:\n$u10")
    assert(u10.contains("partial_sum"), s"u10 agg must be two-phase:\n$u10")
  }

  test("w1: window ranking shuffles once on the partition key") {
    val plan = planOf("w1_top_orders_per_cust")
    assert(plan.contains("Window"), s"expected window exec:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"one shuffle on o_custkey expected:\n$plan")
  }

  test("q8/q9: all seven/five dims broadcast — fact side never sort-merges") {
    val q8 = planOf("q8_market_share")
    assert(q8.contains("BroadcastHashJoin"), s"q8 dims broadcast:\n$q8")
    assert(!q8.contains("SortMergeJoin") && !q8.contains("CartesianProduct"),
      s"q8 must not sort-merge or cross-join dims:\n$q8")
    val q9 = planOf("q9_profit_nation_year")
    assert(q9.contains("BroadcastHashJoin") && !q9.contains("SortMergeJoin"),
      s"q9 dims broadcast:\n$q9")
  }

  test("q13: LEFT OUTER survives and both aggregates run two-phase") {
    val plan = planOf("q13_cust_order_dist")
    assert(plan.contains("LeftOuter") || plan.contains("RightOuter"),
      s"zero-order customers need an outer join:\n$plan")
    val n = "HashAggregate".r.findAllIn(plan).length
    assert(n >= 3, s"per-customer + distribution aggregates, partial+final:\n$plan")
  }

  test("q15: the 1-row max joins as broadcast, on exact decimals") {
    val plan = planOf("q15_top_supplier")
    assert(plan.contains("BroadcastHashJoin"),
      s"the aggregated max must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"decimal equality keeps the join hash-based:\n$plan")
  }

  test("q17/q19/q20: part-side filters reach the scans; joins broadcast") {
    val q17 = planOf("q17_small_qty_revenue")
    assert(q17.contains("BroadcastHashJoin"), s"q17 part+avg broadcast:\n$q17")
    val q19 = planOf("q19_bracket_revenue")
    assert(q19.contains("BroadcastHashJoin") && !q19.contains("SortMergeJoin"),
      s"q19 stays one broadcast join with a residual OR predicate:\n$q19")
    val q20 = planOf("q20_heavy_suppliers")
    assert(q20.contains("PushedFilters") && q20.contains("l_shipdate"),
      s"q20 ship-date filter must reach the lineitem scan:\n$q20")
  }

  test("w2: running total + lag run over ONE keyed shuffle") {
    val plan = planOf("w2_running_total")
    // sum (unbounded-preceding..current) and lag (-1..-1) have different
    // frames, so Spark may emit two Window execs — but they share the same
    // (partition, order), so there must be no second hash shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"one shuffle on o_custkey expected:\n$plan")
  }

  test("t6: curation dedup is hash-only — no Sort anywhere in the plan") {
    // the dedup stage must be groupBy(md5) + semi-join, never a window
    // min over partitionBy(md5): that shape shuffles AND SORTS the whole
    // corpus on a near-unique key, which is the scale-killer at 100 TB.
    // The final orderBy(lang_guess) sorts the 2-row aggregate OUTPUT —
    // that Sort sits above the aggregate and is free. The plan prints
    // top-down, so any "Sort" AFTER the first HashAggregate line is a
    // sort below the aggregate (the window shape creeping back in).
    val plan = planOf("t6_curation_pipeline")
    assert(!plan.contains("Window"), s"t6 must not use a window:\n$plan")
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0, s"expected hash aggregate:\n$plan")
    assert(!plan.substring(firstAgg).contains("Sort "),
      s"t6 must stay hash-only below the aggregate:\n$plan")
    assert(plan.contains("LeftSemi"), s"t6 dedup joins back as semi:\n$plan")
  }

  test("t11: sequence packing shuffles ONCE on the shard key, no global sort") {
    val plan = planOf("t11_sequence_pack")
    // one hash exchange: the window partitions by shard, and the
    // downstream groupBy(shard, seq_idx) is satisfied by the same
    // partitioning (subset-key clustering), so no second shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"one shuffle on shard expected:\n$plan")
    // sorts are per-shard (local), never a global range sort below the agg
    assert(!plan.contains("Exchange rangepartitioning") ||
      plan.indexOf("Exchange rangepartitioning") < plan.indexOf("Window"),
      s"no global sort below the window:\n$plan")
  }

  test("d9: span-dedup owners broadcast; no window, no pairwise join") {
    val plan = planOf("d9_span_dedup")
    // ownership is a two-phase hash aggregate on the span hash, joined
    // back as a broadcast — never a window over md5(span) (shuffle+sort on
    // a near-unique key) and never a span-to-span pairwise compare
    assert(!plan.contains("Window"), s"d9 must not use a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no pairwise compare:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"duplicate-owner side should broadcast:\n$plan")
    // the only range exchange is the final output orderBy, which the
    // top-down plan prints ABOVE the aggregates
    val firstAgg = plan.indexOf("HashAggregate")
    assert(firstAgg >= 0 &&
      !plan.substring(firstAgg).contains("rangepartitioning"),
      s"no global sort below the aggregates:\n$plan")
  }

  test("t14: LM broadcasts back to the scan; doc filter reaches parquet") {
    val plan = planOf("t14_lm_perplexity")
    // the bounded-cardinality LM joins as a broadcast (never shuffles the
    // instance stream twice) and the doc_id restriction is pushed down
    assert(plan.contains("BroadcastHashJoin"),
      s"LM side should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"instance stream must not sort-merge:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,60)]"),
      s"doc filter must reach the scan:\n$plan")
    // corpus scans: grams + LM — the normalizing constant must come from
    // a window over the LM aggregate, not a third scan
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"expected at most 2 corpus scans, got $scans:\n$plan")
  }

  test("t9: PII scrub stays native — codegen'd regexp_replace, no UDF") {
    val plan = planOf("t9_pii_redact")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"regexp_replace must stay native:\n$plan")
    assert(plan.toLowerCase.contains("regexp_replace"),
      s"expected native regexp_replace in the plan:\n$plan")
  }

  test("t15: BM25 is one postings pass — query terms broadcast, df via window") {
    val plan = planOf("t15_bm25_search")
    // the tiny query-term table must broadcast onto the postings, and df
    // must come from a window over the filtered postings — a groupBy df
    // re-derives the postings subtree as a SECOND corpus scan + shuffle
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms should broadcast:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"postings + stats = at most 2 corpus scans, got $scans:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no SMJ/cartesian anywhere in a broadcast search:\n$plan")
    // top-k per query must run as a rank-limit (partial per partition),
    // never a global sort of all scored documents
    assert(plan.contains("WindowGroupLimit"),
      s"top-k should use WindowGroupLimit:\n$plan")
  }

  test("s30: hybrid legs pre-truncate map-side; no cartesian beyond the query broadcast") {
    val plan = planOf("s30_hybrid_rrf")
    // both per-query rank <= legK filters must compile to WindowGroupLimit
    // (map-side partial top-k) — with 3 query partitions a plain window
    // would funnel the WHOLE scored corpus through 3 tasks
    val wgl = "WindowGroupLimit".r.findAllIn(plan).length
    assert(wgl >= 2, s"both legs should rank via WindowGroupLimit, saw $wgl:\n$plan")
    // the only nested-loop allowed is the tiny query-vector broadcast
    assert(!plan.contains("CartesianProduct"),
      s"dense leg must broadcast the queries, not cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"candidate fusion join is queries x legK rows — must not SMJ:\n$plan")
  }

  test("s31: the metadata filter reaches the corpus parquet scan") {
    val plan = planOf("s31_filtered_ann")
    // filtered vector search must cut the corpus AT THE SCAN — a filter
    // above the bucket join would score the whole corpus first
    assert(plan.contains("PushedFilters") && plan.contains("In(label"),
      s"label predicate should push into the scan:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-probe top-k should pre-truncate map-side:\n$plan")
  }

  test("d17: bloom probes broadcast — the corpus gram stream never shuffle-joins") {
    val plan = planOf("d17_bloom_decontamination")
    // k=4 probe joins against the bitmap must ALL be broadcast-hash —
    // a single shuffle join would exchange the corpus gram stream on the
    // bitmap word, the exact cost the bloom exists to avoid
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 4, s"expected 4 broadcast probe joins, got $bhj:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no probe join may shuffle the gram stream:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"the per-doc combine must be two-phase (map-side partials):\n$plan")
  }

  test("s33: the metadata filter reaches the IVF corpus parquet scan") {
    val plan = planOf("s33_filtered_ivf_ann")
    // filtered IVF search must cut the corpus AT THE SCAN, below the cell
    // probe join — never assign-and-score, then filter
    assert(plan.contains("PushedFilters") && plan.contains("In(label"),
      s"label predicate should push into the IVF corpus scan:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-probe top-k should pre-truncate map-side:\n$plan")
  }

  test("s17: compacted view is hash-only — no SortAggregate, no sort-merge") {
    val plan = planOf("s17_kfs_compacted_view")
    // max_by over binary payloads would force SortAggregate (a full sort
    // of the log by key); the offsets-only aggregate + semi-join keeps
    // every operator hash-based
    assert(plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"latest-offset aggregate must hash, not sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"semi-join back must stay shuffle-hash:\n$plan")
    assert(!plan.contains("Window"), s"no window in the compacted view:\n$plan")
  }

  test("t16: TF-IDF broadcasts the idf table; top-m is a rank-limit window") {
    val plan = planOf("t16_tfidf_keywords")
    assert(plan.contains("BroadcastHashJoin"),
      s"(term, idf) table should broadcast back onto postings:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no SMJ/cartesian:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc top-m should use WindowGroupLimit:\n$plan")
  }

  test("t27: per-source cap pre-limits map-side via WindowGroupLimit") {
    val plan = planOf("t27_source_caps")
    // the rank <= cap filter must become a WindowGroupLimit so a celebrity
    // source's rows are truncated to the cap in each map task BEFORE the
    // exchange — without it the hot key converges on one reducer in full
    assert(plan.contains("WindowGroupLimit"),
      s"cap filter should compile to WindowGroupLimit:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("t28: NB model broadcasts onto the corpus pass; argmax is a rank-limit") {
    val plan = planOf("t28_nb_classifier")
    // the fitted (token x label) model is bounded by vocabulary size and
    // must broadcast — a shuffle join would move the corpus token stream
    assert(plan.contains("BroadcastHashJoin"),
      s"model join should broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-doc argmax should compile to WindowGroupLimit:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"model-grid cross joins must broadcast (BNLJ), never CartesianProduct:\n$plan")
  }

  test("t30: corpus build composes without a sort below the dedup aggregate") {
    val plan = planOf("t30_corpus_build")
    // the dedup stage is hash-aggregate keepers + semi-join: no Sort may
    // appear below the packing window (the t6 scale-killer shape), and the
    // per-source cap must stay a WindowGroupLimit
    assert(plan.contains("WindowGroupLimit"),
      s"source cap should pre-limit map-side:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"dedup semi-join must stay hash-based:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"no sort aggregates anywhere in the build:\n$plan")
  }

  test("t29: conversation threading shuffles once on the actor key") {
    val plan = planOf("t29_sft_threads")
    // session window + per-session aggregate must share the user_id
    // exchange; the transcript is built in-row, so there is no second
    // keyed shuffle and no ordered/Sort aggregate
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"one actor-key shuffle expected, got $exchanges:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"transcript must assemble in-row, not via SortAggregate:\n$plan")
  }

  test("s26: consume poll caps map-side and broadcasts the offsets frame") {
    val plan = planOf("s26_kfs_consume")
    // per-partition fetch cap pre-truncates before the window shuffle
    assert(plan.contains("WindowGroupLimit"),
      s"per-partition max_records cap should use WindowGroupLimit:\n$plan")
    // the committed-offsets frame is tiny and must broadcast, never SMJ
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"committed positions should broadcast:\n$plan")
  }

  test("t37: cluster rebalance ranks with WindowGroupLimit, assigns without joins") {
    val plan = planOf("t37_cluster_balanced_sample")
    // the rank<=target filter must pre-truncate per partition, never
    // globally sort the assignment frame
    assert(plan.contains("WindowGroupLimit"),
      s"per-cluster cap should use WindowGroupLimit:\n$plan")
    // assignment distances are plan-literal center expressions — there is
    // no join against a centers table anywhere
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"no join machinery in a literal-centers assignment:\n$plan")
  }

  test("Iceberg readForJoin: ANALYZE stats alone add the broadcast hint") {
    import spark.implicits._
    import graft.etl.IcebergSink
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files
      .createTempDirectory("iceberg_stats_join").toString + "/t"
    IcebergSink.append(spark, table,
      Seq((0L, "us"), (1L, "eu"), (2L, "ap")).toDF("rid", "rname"))
    // un-analyzed: no stats, no hint — never guess a table small
    val before = IcebergSink.readForJoin(spark, table)
    assert(!before.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no hint may appear without statistics")
    // analyzed: the stats file alone (rowCount × width, no file-size
    // estimation involved) proves it a dim and injects the hint
    IcebergSink.analyze(spark, table)
    val after = IcebergSink.readForJoin(spark, table)
    assert(after.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "post-ANALYZE readForJoin must carry a broadcast hint")
    // and the hinted dim physically broadcasts against a fact side
    val fact = graft.core.Tables.load(spark, sf, "orders")
    val plan = fact.join(after, col("o_custkey") % 3 === col("rid"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats-hinted dim should broadcast:\n$plan")
    // auto-broadcast disabled = user opted out: hint must not appear
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(!IcebergSink.readForJoin(spark, table)
      .queryExecution.analyzed.toString.contains("ResolvedHint"))
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("KAFSQL WITHIN join broadcasts when estate stats prove the right small") {
    import graft.kafsql._
    import graft.core.Tables
    // a 1 KB threshold turns OFF Spark's own size-based auto-broadcast
    // (the parquet-backed frames are bigger) — any BroadcastHashJoin below
    // can only come from the estate-stats hint
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
    try {
      def reg(withStats: Boolean) = new TopicRegistry(Seq(
        TopicDef("big", s => Tables.eventsTopic(s, sf)),
        TopicDef("dim",
          s => Tables.eventsTopic(s, sf)
            .filter(org.apache.spark.sql.functions.col("event_type") === "error"),
          segments =
            if (!withStats) None
            else Some(_ => Seq(SegmentInfo(0, 0L, 9L, 10L, 0L, 0L, 512L))))))
      val q = "SELECT * FROM big o JOIN dim p ON o._key = p._key " +
        "WITHIN 6h LIMIT 1000 LAST 14d"
      val withHint = Kafsql.sql(spark, reg(withStats = true), q,
        nowMs = Tables.FixedNowMs).queryExecution.executedPlan.toString
      assert(withHint.contains("BroadcastHashJoin"),
        s"segment stats under threshold must broadcast the right side:\n$withHint")
      val noStats = Kafsql.sql(spark, reg(withStats = false), q,
        nowMs = Tables.FixedNowMs).queryExecution.executedPlan.toString
      assert(!noStats.contains("BroadcastHashJoin"),
        s"without estate stats nothing may claim the side small:\n$noStats")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ivfpq: cell-pruned ADC — broadcast equi-join on cell, no cartesian") {
    // the probe-limited scan must reach the codes through an EQUI-join on
    // (cell = cl) with the tiny probe side broadcast: codes outside every
    // probed cell never match, which is the cell pruning — a cartesian or
    // nested-loop here would score the whole corpus for every query
    val plan = planOf("s38_ivfpq_ann")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"ivfpq must never pair queries with unprobed cells:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe tables and shortlist must broadcast onto the corpus scans:\n$plan")
    assert(plan.contains("cell"),
      s"the ADC join must key on the coarse cell:\n$plan")
  }

  test("ivfpq persisted layout: the probe is PARTITION pruning on the codes scan") {
    // s42's claim made structural: the codes table is parquet partitioned
    // by cell, and a query's probed-cell set lands as a PartitionFilters
    // IN-list on the scan — with one query and nProbe=2, exactly 2 of the
    // 4 cell partitions are read; the other cells cost zero bytes
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val ix = java.nio.file.Files.createTempDirectory("ivfpq_ix").toString
    graft.ops.Similarity.ivfpqBuild(e, ix)
    val df = graft.ops.Similarity.ivfpqTopKIndexed(spark, ix, e,
      e.where(col("vec_id") < 1), k = 3, kCand = 10)
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan)
    assert(pf.isDefined,
      s"probed cells must reach the codes scan as a partition filter:\n$plan")
    val cells = pf.get.group(1).split(",").map(_.trim).filter(_.nonEmpty)
    assert(cells.length == 2,
      s"one query with nProbe=2 must read exactly 2 cell partitions, " +
        s"got ${cells.toSeq}:\n$plan")
    // and the answer is still the exact refine's
    assert(df.count() == 3)
  }

  test("ivfpq incremental append keeps partition pruning and the frozen encode") {
    // s43's claims made structural: appends land NEW files under the
    // existing cell= partition directories (never refitting), the probe
    // still prunes the scan at the file level, and the appended layout's
    // codes are IDENTICAL to a one-shot encode of the full corpus under
    // the same frozen model
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val ix = java.nio.file.Files.createTempDirectory("ivfpq_incr").toString
    graft.ops.Similarity.ivfpqBuild(e.where(col("vec_id") % 2 === 0), ix)
    val modelBefore = graft.ops.Similarity.ivfpqLoad(spark, ix)
    graft.ops.Similarity.ivfpqAppend(e.where(col("vec_id") % 2 === 1), ix)
    // the model artifacts are untouched — append never refits
    assert(graft.ops.Similarity.ivfpqLoad(spark, ix) == modelBefore,
      "append must leave the frozen model artifacts byte-identical")
    // appended codes table == one-shot frozen encode of the full corpus
    val persisted = spark.read.parquet(s"$ix/codes")
      .orderBy("v").collect().map(_.toString).toSeq
    val oneShot = graft.ops.Similarity.ivfpqEncode(e, modelBefore)
      .withColumn("cell", col("cell").cast("int"))
      .select(persisted.headOption.map(_ => spark.read.parquet(s"$ix/codes")
        .columns).getOrElse(Array("v")).map(col).toIndexedSeq: _*)
      .orderBy("v").collect().map(_.toString).toSeq
    assert(persisted == oneShot,
      "build+append must equal the one-shot frozen encode")
    // probe-time partition pruning survives the append
    val df = graft.ops.Similarity.ivfpqTopKIndexed(spark, ix, e,
      e.where(col("vec_id") < 1), k = 3, kCand = 10)
    val plan = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*cell[^\\]]*IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan)
    assert(pf.isDefined && pf.get.group(1).split(",")
        .map(_.trim).count(_.nonEmpty) == 2,
      s"appended layout must still prune to the probed cells:\n$plan")
    assert(df.count() == 3)
  }

  test("ivfpq compaction: one file per cell, codes identical, pruning survives") {
    // s44's claims made structural: after appends accrue multiple files
    // per cell, compaction rewrites each cell partition to ONE file,
    // the codes CONTENT is unchanged row-for-row, and the probe still
    // prunes the compacted layout at the partition level
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val ix = java.nio.file.Files.createTempDirectory("ivfpq_cmp").toString
    graft.ops.Similarity.ivfpqBuild(e.where(col("vec_id") % 2 === 0), ix)
    graft.ops.Similarity.ivfpqAppend(e.where(col("vec_id") % 2 === 1), ix)
    val before = spark.read.parquet(s"$ix/codes")
      .orderBy("v").collect().map(_.toString).toSeq
    graft.ops.Similarity.ivfpqCompact(spark, ix)
    val perCell = graft.ops.Similarity.codesFilesPerCell(ix)
    assert(perCell.nonEmpty)
    perCell.foreach { case (c, n) =>
      assert(n == 1, s"cell $c must compact to one file: $n")
    }
    val after = spark.read.parquet(s"$ix/codes")
      .orderBy("v").collect().map(_.toString).toSeq
    assert(after == before, "compaction must not change a single code row")
    val df = graft.ops.Similarity.ivfpqTopKIndexed(spark, ix, e,
      e.where(col("vec_id") < 1), k = 3, kCand = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan).exists(_.group(1).split(",")
        .map(_.trim).count(_.nonEmpty) == 2),
      s"compacted layout must still prune to the probed cells:\n$plan")
    assert(df.count() == 3)
  }

  test("ivfpq compaction crash recovery republishes a complete copy, never deletes it") {
    // a compaction that died between its two renames leaves the ONLY
    // complete copies aside (staging with _SUCCESS, or the moved-aside
    // original); the next run must re-home one BEFORE its cleanup —
    // deleting first would destroy the index
    import org.apache.spark.sql.functions.col
    import java.nio.file.{Files => NF, Paths => NP}
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val ix = java.nio.file.Files.createTempDirectory("ivfpq_crash").toString
    graft.ops.Similarity.ivfpqBuild(e.where(col("vec_id") < 30), ix)
    val want = spark.read.parquet(s"$ix/codes")
      .orderBy("v").collect().map(_.toString).toSeq
    def rows = spark.read.parquet(s"$ix/codes")
      .orderBy("v").collect().map(_.toString).toSeq

    // crash after rename(codes -> trash), staging complete (_SUCCESS
    // present — the build's own marker stands in for the rewrite's)
    NF.move(NP.get(ix, "codes"), NP.get(ix, "codes-compacting"))
    graft.ops.Similarity.ivfpqCompact(spark, ix)
    assert(rows == want, "recovery must publish the complete staging copy")

    // crash after rename(codes -> trash) with NO staging: restore trash
    NF.move(NP.get(ix, "codes"), NP.get(ix, "codes-old"))
    graft.ops.Similarity.ivfpqCompact(spark, ix)
    assert(rows == want, "recovery must restore the moved-aside original")
  }

  test("ivfpq streaming lane's replay guard prunes the codes scan by the batch's id range") {
    // e46's guard made structural: the existing-ids scan the per-batch
    // anti-join probes filters to the batch's [min, max] vec_id range,
    // PUSHED to the parquet scan — so row-group min/max stats skip every
    // file outside the range and steady-state guard IO is O(batch), not
    // O(index)
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val ix = java.nio.file.Files.createTempDirectory("ivfpq_guard").toString
    graft.ops.Similarity.ivfpqBuild(e.where(col("vec_id") < 20), ix)
    val guard = graft.etl.VectorIndex.replayGuardExisting(spark, ix, 100L, 120L)
    val plan = guard.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(v,100)") &&
      plan.contains("LessThanOrEqual(v,120)"),
      s"the id-range bound must push to the codes scan:\n$plan")
    // the seed's ids all sit below the range: the guard reads nothing
    assert(guard.count() == 0)
    // and a replayed range overlapping the seed still finds its ids
    assert(graft.etl.VectorIndex.replayGuardExisting(spark, ix, 0L, 5L)
      .count() == 6)
  }

  test("hard negatives over a shortlist: broadcast joins, never a cartesian") {
    // s41's contract: with a pre-ranked pool the corpus is scanned once
    // with the shortlist broadcast onto it — the per-anchor exact pass
    // (a cartesian) must be gone
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val sl = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("q", "v")
    val plan = graft.ops.Similarity.hardNegatives(
      e, e.where(col("vec_id") < 5), k = 3,
      dupMaxD2 = 1L, posMaxD2 = 2L, shortlist = Some(sl))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"shortlist path must never build anchors x corpus pairs:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"shortlist and anchors must broadcast onto the corpus scan:\n$plan")
  }

  test("mmr over a supplied shortlist: broadcast joins, never a cartesian") {
    // the FAISS-then-MMR composition (s39): with a pre-ranked candidate
    // frame the corpus must be scanned once with the shortlist BROADCAST
    // onto it — at estate scale a cartesian here is the difference
    // between a code-scan pipeline and an impossible query
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val qv = org.apache.spark.sql.graft.QuantOps
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val cc = e.select(col("vec_id").as("v"),
      qv.quantize(col("embedding"), 64, 1000000L).as("_cv"))
    val qq = e.where(col("vec_id") < 5).select(col("vec_id").as("q"),
      qv.quantize(col("embedding"), 64, 1000000L).as("_qq"))
    val sl = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("q", "v")
    val plan = graft.ops.Similarity.mmrCandidates(cc, qq, 10, Some(sl))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"shortlist path must never build queries x corpus pairs:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 2,
      s"shortlist and query set must both broadcast onto the corpus scan:\n$plan")
  }

  test("accumulated equality deletes apply as ONE anti-join, however many commits") {
    // the streaming upsert lane commits one equality-delete file per
    // micro-batch: after N batches a read must NOT stack N anti-joins —
    // the delete history unions into one broadcast frame (per-file seq as
    // a column) and subtracts in a single pass
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val table = java.nio.file.Files.createTempDirectory("plan_updel").toString + "/t"
    (1 to 5).foreach { i =>
      graft.etl.IcebergSink.upsertAtomic(spark, table,
        Seq((1L, i * 10L), (i.toLong + 10, 0L)).toDF("id", "v"), Seq("id"))
    }
    val df = graft.etl.IcebergSink.read(spark, table)
    val plan = df.queryExecution.executedPlan.toString
    val antiJoins = "LeftAnti".r.findAllIn(plan).length
    assert(antiJoins == 1,
      s"4 delete commits must fold into ONE anti-join, found $antiJoins:\n$plan")
    // and the subtraction is still exact: key 1 holds its LAST value
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows(1L) == 50L && rows.size == 6,
      s"LWW must hold through the fused anti-join: $rows")
  }

  test("scd2: guard + fold run on ONE Exchange and ONE Sort") {
    // the dup/conflict guard orders by (ord, type, hash) and the validity
    // fold reuses that EXACT order (the hash tiebreaker is inert once the
    // guard has collapsed each slot to one row), so the second Window's
    // required ordering is satisfied by the first's output — re-sorting
    // the keyed shuffle for the fold would double the sort cost of every
    // SCD2 fold at any scale
    import spark.implicits._
    val ch = Seq(
      (1L, "a", "insert", 1L), (1L, null.asInstanceOf[String], "delete", 3L),
      (1L, "b", "insert", 3L), (2L, "c", "insert", 2L))
      .toDF("k", "payload", "_change_type", "_change_ordinal")
    val plan = graft.ops.Scd.scd2(ch, Seq("k"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(exchanges == 1, s"scd2 must shuffle once on the key:\n$plan")
    assert(sorts == 1, s"guard and fold must share one window sort:\n$plan")
  }
}
