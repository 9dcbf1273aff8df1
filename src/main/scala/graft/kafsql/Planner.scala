package graft.kafsql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gov.Guardrails

/** Lowers the KAFSQL AST onto DataFrame operations, enforcing the
  * reference's validation rules and guardrails:
  *
  *   - unbounded-query rejection without LAST/TAIL/SCAN FULL/_ts bounds
  *     (`server.go:1316-1319`)
  *   - default/max LIMIT, SCAN FULL cap (`server.go:1321-1346`)
  *   - ORDER BY `_ts` only; not with TAIL or aggregates
  *     (`server.go:1347-1352,1391-1397`)
  *   - aggregate validation: group cols required, no `*`, no json group
  *     outputs, none of it in joins (`server.go:1852-1918,2297-2299`)
  *   - joins: exactly two topics, mandatory WITHIN + LAST, inner/left only,
  *     no partition/offset filters, `_right_` output prefix
  *     (`server.go:2281-2464,2581-2589`)
  *   - aggregate output ordered by stringified group key, NULL → `<nil>`,
  *     groups joined with 0x1f (`server.go:1968-1981`)
  *
  * Everything below is declarative DataFrame code — Catalyst handles
  * pushdown, join strategy (broadcast/SMJ by size + AQE), partial
  * aggregation, and top-k (`TakeOrderedAndProject`), which is the
  * scale story the single-node reference lacks.
  */
object Planner {

  final case class Env(nowMs: Long, rails: Guardrails = Guardrails())

  def plan(spark: SparkSession, reg: TopicRegistry, stmt: Statement,
      env: Env): DataFrame = stmt match {
    case ShowTopics =>
      import spark.implicits._
      reg.topicNames.toDF("topic")

    case ShowPartitions(t) =>
      import spark.implicits._
      reg.get(t).partitions.sorted.toDF("partition")

    case ShowSegments(t) =>
      import spark.implicits._
      val d = reg.get(t)
      val list = d.segments.getOrElse(throw new KafsqlException(
        s"topic $t has no segment estate")).apply(spark)
      list.sortBy(s => (s.partition, s.baseOffset))
        .map(s => (s.partition, s.baseOffset, s.lastOffset, s.records,
          s.minTsMs, s.maxTsMs, s.sizeBytes))
        .toDF("partition", "base_offset", "last_offset", "records",
          "min_ts", "max_ts", "size_bytes")

    case ShowOffsets(t) =>
      import spark.implicits._
      val d = reg.get(t)
      val segs = d.segments.getOrElse(throw new KafsqlException(
        s"topic $t has no segment estate")).apply(spark)
      val ls = d.logStarts.map(_.apply(spark)).getOrElse(Map.empty[Int, Long])
      val parts =
        (segs.map(_.partition) ++ d.partitions ++ ls.keys).distinct.sorted
      parts.map { p =>
        val ps = segs.filter(_.partition == p)
        val start = ls.getOrElse(p, 0L)
        // EARLIEST = the log start: the DeleteRecords horizon when it is
        // ahead, else the first retained segment's base (time-based
        // retention advances the physical start without a horizon file).
        // LATEST = high watermark; an emptied partition reports
        // earliest == latest == the horizon, exactly Kafka's shape.
        val earliest =
          if (ps.isEmpty) start
          else math.max(ps.map(_.baseOffset).min, start)
        val latest =
          if (ps.isEmpty) start
          else math.max(ps.map(_.lastOffset).max + 1, start)
        (p, earliest, latest)
      }.toDF("partition", "earliest", "latest")

    case ShowOffsetsAt(t, ts) =>
      import spark.implicits._
      val d = reg.get(t)
      val segs = d.segments.getOrElse(throw new KafsqlException(
        s"topic $t has no segment estate")).apply(spark)
      val ls = d.logStarts.map(_.apply(spark)).getOrElse(Map.empty[Int, Long])
      // Kafka's index-then-scan resolution: per partition, the FIRST
      // segment (by base offset) whose .kfst max timestamp reaches the
      // target holds the earliest qualifying offset — every earlier
      // segment's records are strictly older — so the estate-wide answer
      // costs ONE segment decode per partition, whatever the estate size.
      // Horizon-aware: segments wholly below the DeleteRecords log start
      // are dead, and a straddled boundary scans from the horizon up.
      val bounds = segs.groupBy(_.partition).toSeq.sortBy(_._1).flatMap {
        case (p, ps) =>
          val start = ls.getOrElse(p, 0L)
          ps.filter(_.lastOffset >= start).sortBy(_.baseOffset)
            .find(_.maxTsMs >= ts)
            .map(seg => (p, math.max(seg.baseOffset, start), seg.lastOffset))
      }
      if (bounds.isEmpty)
        Seq.empty[(Int, Long)].toDF("partition", "offset")
      else {
        val fr = d.frame(spark)
        bounds.map { case (p, lo, hi) =>
          fr.where(col("_partition") === p &&
            col("_offset") >= lo && col("_offset") <= hi &&
            col("_ts_ms") >= ts)
        }.reduce(_ unionAll _)
          .groupBy(col("_partition").cast("int").as("partition"))
          .agg(min(col("_offset")).as("offset"))
          .orderBy(col("partition"))
      }

    case DescribeTopic(t) =>
      import spark.implicits._
      val d = reg.get(t)
      val rows = TopicRegistry.implicitColumns.map { case (n, ty) => (n, ty, "") } ++
        d.schemaCols.map(sc => (sc.name, TopicRegistry.pgType(sc.typ), sc.path))
      rows.toDF("column", "type", "path")

    case DescribeConfigs(t) =>
      import spark.implicits._
      val d = reg.get(t)
      val list = d.configs.getOrElse(throw new KafsqlException(
        s"topic $t has no config estate")).apply(spark)
      list.sortBy(_.name)
        .map(c => (c.name, c.value, c.isDefault, c.readOnly, c.source))
        .toDF("name", "value", "is_default", "read_only", "source")

    case ShowGroups =>
      import spark.implicits._
      // ListGroups data half (coordinator.go:449-486): the estate knows
      // committed offsets, not live members, so every listed group is in
      // the Kafka `Empty` state (members gone, offsets retained) with the
      // reference's defaults — protocolType "" -> "consumer", group type
      // "classic"
      val list = reg.groupPositions.getOrElse(throw new KafsqlException(
        "this registry has no consumer-group estate")).apply(spark)
      list.map(_.group).distinct.sorted
        .map(g => (g, "Empty", "consumer", "classic"))
        .toDF("group", "state", "protocol_type", "group_type")

    case DescribeGroup(g) =>
      import spark.implicits._
      val list = reg.groupPositions.getOrElse(throw new KafsqlException(
        "this registry has no consumer-group estate")).apply(spark)
      val rows = list.filter(_.group == g)
      // GROUP_ID_NOT_FOUND analog (coordinator.go:438-443)
      if (rows.isEmpty) throw new KafsqlException(s"group not found: $g")
      rows.sortBy(p => (p.topic, p.partition))
        .map(p => (p.topic, p.partition, p.committedOffset, p.metadata,
          p.committedAtMs, p.logEndOffset, p.lag))
        .toDF("topic", "partition", "committed_offset", "metadata",
          "committed_at", "log_end_offset", "lag")

    case Explain(sel, analyze) =>
      import spark.implicits._
      val df = planSelect(spark, reg, sel, env)
      val head =
        Seq(s"scan topic ${sel.from.topic}" +
          sel.join.map(j => s" join ${j.table.topic} within ${j.withinMs}ms").getOrElse(""))
      val planLines =
        df.queryExecution.executedPlan.toString.linesIterator.take(30).toSeq
      // ANALYZE: actually execute and report observed rows + wall time
      // (the modern-engine superset of the reference's estimate-only
      // EXPLAIN; estimates stay in the plan text above for comparison)
      val tail = if (analyze) {
        val t0 = System.nanoTime()
        val n = df.count()
        val ms = (System.nanoTime() - t0) / 1e6
        Seq(f"analyze: rows=$n elapsed_ms=$ms%.1f")
      } else Seq.empty
      (head ++ planLines ++ tail).toDF("plan")

    case sel: Select => planSelect(spark, reg, sel, env)
  }

  // ---- SELECT -----------------------------------------------------------

  def planSelect(spark: SparkSession, reg: TopicRegistry, sel: Select,
      env: Env): DataFrame = {
    validate(sel, env)
    val limit = effectiveLimit(sel, env)
    sel.join match {
      case Some(j) => planJoin(spark, reg, sel, j, limit, env)
      case None => planSingle(spark, reg, sel, limit, env)
    }
  }

  private def validate(sel: Select, env: Env): Unit = {
    val hasAgg = sel.projections.exists(_.expr.isInstanceOf[AggFunc])
    val isTail = sel.window.exists(_.isInstanceOf[Tail])
    val hasTsBound = sel.where.exists {
      case _: TsCmp | _: TsBetween => true
      case _ => false
    }
    // join-specific requirements first: their errors are more specific than
    // the generic unbounded rejection
    sel.join.foreach { _ =>
      if (sel.window.isEmpty)
        throw new KafsqlException("join requires LAST to bound the left scan") // server.go:2291-2293
    }
    if (env.rails.requireTimeBound && sel.window.isEmpty && !hasTsBound)
      throw new KafsqlException(
        "unbounded query: add LAST, TAIL, or SCAN FULL") // server.go:1316-1319
    sel.limit.foreach { l =>
      if (l > env.rails.maxRows)
        throw new KafsqlException(s"limit $l exceeds max_rows ${env.rails.maxRows}")
    }
    sel.orderBy.foreach { o =>
      if (o.column != "_ts")
        throw new KafsqlException("order by supports _ts only") // server.go:1347-1352
      if (hasAgg)
        throw new KafsqlException("ORDER BY is not supported with aggregates")
      if (isTail)
        throw new KafsqlException("TAIL cannot be combined with ORDER BY")
    }
    if (isTail && hasAgg)
      throw new KafsqlException("TAIL cannot be combined with aggregates")
    if (hasAgg) {
      if (sel.star)
        throw new KafsqlException("SELECT * cannot be combined with aggregates")
      // every non-aggregate projection must be in GROUP BY; json helpers are
      // not valid group outputs (server.go:1852-1918)
      val groupNames = sel.groupBy.map(_.name).toSet
      sel.projections.foreach {
        case Projection(c: ColRef, _) if !groupNames(c.name) =>
          throw new KafsqlException(s"column ${c.name} must appear in GROUP BY")
        case Projection(_: JsonFunc, _) =>
          throw new KafsqlException("json functions are not valid group outputs")
        case _ =>
      }
    } else if (sel.groupBy.nonEmpty)
      throw new KafsqlException("GROUP BY requires aggregate projections")
    sel.join.foreach { _ =>
      if (hasAgg) throw new KafsqlException("aggregates are not supported in joins") // server.go:2297-2299
      if (isTail || sel.window.contains(ScanFull))
        throw new KafsqlException("TAIL/SCAN FULL are not supported in joins")
      if (sel.window.isEmpty)
        throw new KafsqlException("join requires LAST to bound the left scan") // server.go:2291-2293
      if (sel.where.exists { case _: PartitionEq | _: OffsetCmp => true; case _ => false })
        throw new KafsqlException("partition/offset filters are not supported in joins")
      if (sel.groupBy.nonEmpty)
        throw new KafsqlException("GROUP BY is not supported in joins")
    }
  }

  private def effectiveLimit(sel: Select, env: Env): Int = {
    val base = sel.limit.getOrElse(env.rails.defaultLimit)
    val capped =
      if (sel.window.contains(ScanFull)) math.min(base, env.rails.maxUnboundedScan)
      else base
    // structural max_rows cap: EVERY planned Select ends in `.limit(n)` with
    // n ≤ max_rows, so no downstream collect (Governor result cache, pg-wire
    // row stream, COPY TO) can materialize more than the guardrail — even if
    // default_limit is misconfigured above max_rows. Explicit over-limit
    // requests are still rejected loudly in validate() (row_collector.go:24-67).
    math.min(capped, env.rails.maxRows)
  }

  /** Resolved _ts_ms bounds: explicit predicates merged with LAST
    * ([now-dur, now], lower via max, upper defaulting to now —
    * server.go:1368-1384). Returns (lo, hi) epoch-ms options. */
  def tsBounds(sel: Select, nowMs: Long): (Option[Long], Option[Long]) = {
    val los = sel.where.collect {
      case TsCmp(true, v) => v
      case TsBetween(lo, _) => lo
    }
    val his = sel.where.collect {
      case TsCmp(false, v) => v
      case TsBetween(_, hi) => hi
    }
    sel.window match {
      case Some(Last(d)) =>
        (Some((los :+ (nowMs - d)).max), Some(his.foldLeft(nowMs)(math.min)))
      case _ =>
        (los.reduceOption(_ max _), his.reduceOption(_ min _))
    }
  }

  /** Continuous (Structured Streaming, append-mode) subset of SELECT: the
    * reference rejects continuous queries outright (non-goal,
    * `README.md:99-104`); this is the Spark-first upgrade — the same dialect
    * and desugaring applied to a streaming topic frame. Supported:
    * projections (incl. json_*), schema-on-read columns, partition/offset/
    * `_ts` predicates. Rejected (no append-mode equivalent): joins,
    * aggregates (use event-time windows — `streaming/StreamAggs`),
    * ORDER BY, TAIL, LIMIT. `LAST d` anchors a lower time bound at stream
    * start and — unlike batch — sets NO upper bound: events keep arriving. */
  def planContinuous(reg: TopicRegistry, stream: DataFrame, sel: Select,
      env: Env): DataFrame = {
    validateContinuous(sel)
    if (sel.projections.exists(_.expr.isInstanceOf[AggFunc]) || sel.groupBy.nonEmpty)
      throw new KafsqlException(
        "continuous queries do not support bare aggregates; use planContinuousAggregate")
    projectSingle(reg, continuousFiltered(reg, stream, sel, env), sel)
  }

  /** Continuous AGGREGATE: the dialect's `GROUP BY` + COUNT/SUM/AVG/MIN/MAX
    * re-interpreted over event-time tumbling windows — what the reference's
    * `LAST`-window aggregates become when they run forever. Output gains a
    * leading `win_start` column (window start, event time); the stream must
    * be written in update/complete mode, or append with the watermark
    * closing windows. Aggregate validation rules are the batch ones. */
  def planContinuousAggregate(reg: TopicRegistry, stream: DataFrame,
      sel: Select, windowDur: String, watermarkDelay: String,
      env: Env): DataFrame = {
    validateContinuous(sel)
    val hasAgg = sel.projections.exists(_.expr.isInstanceOf[AggFunc])
    if (!hasAgg)
      throw new KafsqlException("continuous aggregate requires aggregate projections")
    // batch aggregate validation rules apply unchanged (server.go:1852-1918)
    val groupNames = sel.groupBy.map(_.name).toSet
    sel.projections.foreach {
      case Projection(c: ColRef, _) if !groupNames(c.name) =>
        throw new KafsqlException(s"column ${c.name} must appear in GROUP BY")
      case Projection(_: JsonFunc, _) =>
        throw new KafsqlException("json functions are not valid group outputs")
      case _ =>
    }
    // watermarks require TimestampType (not NTZ): derive the event-time
    // column from the epoch-ms twin; session tz is UTC so wall times agree
    val df = continuousFiltered(reg, stream, sel, env)
      .withColumn("_event_ts", timestamp_millis(col("_ts_ms")))
      .withWatermark("_event_ts", watermarkDelay)
    val aggPairs = sel.projections.collect {
      case Projection(AggFunc(kind, arg), alias) =>
        val name = alias.getOrElse(defaultAggName(kind, arg))
        name -> aggCol(df, kind, arg).as(name)
    }
    // the groupBy output column keeps the source name; alias in the final
    // select (mirrors batch planAggregate — SELECT level AS lvl ... GROUP BY
    // level must resolve `level`, then surface it as `lvl`)
    val plainCols = sel.projections.collect {
      case Projection(cr: ColRef, alias) =>
        col(cr.name).as(alias.getOrElse(cr.name))
    }
    val grouped = df
      .groupBy(window(col("_event_ts"), windowDur) +: sel.groupBy.map(g => df(g.name)): _*)
      .agg(aggPairs.map(_._2).head, aggPairs.map(_._2).tail: _*)
    grouped.select(
      (col("window.start").cast("timestamp_ntz").as("win_start") +:
        (plainCols ++ aggPairs.map(p => col(p._1)))): _*)
  }

  private def validateContinuous(sel: Select): Unit = {
    if (sel.join.nonEmpty)
      throw new KafsqlException("continuous queries do not support joins")
    if (sel.orderBy.nonEmpty)
      throw new KafsqlException("continuous queries do not support ORDER BY")
    if (sel.window.exists(_.isInstanceOf[Tail]))
      throw new KafsqlException("continuous queries do not support TAIL")
    if (sel.limit.nonEmpty)
      throw new KafsqlException("continuous queries do not support LIMIT")
  }

  /** Shared continuous-side desugar: schema-on-read columns + partition/
    * offset/_ts predicates. `LAST d` anchors a lower bound at stream start
    * and sets NO upper bound (events keep arriving). */
  private def continuousFiltered(reg: TopicRegistry, stream: DataFrame,
      sel: Select, env: Env): DataFrame = {
    val d = reg.get(sel.from.topic)
    var df = d.schemaCols.foldLeft(stream) { (acc, sc) =>
      acc.withColumn(sc.name, TopicRegistry.extract(col("_value"), sc))
    }
    sel.where.foreach {
      case PartitionEq(p) => df = df.filter(col("_partition") === p)
      case OffsetCmp(true, v) => df = df.filter(col("_offset") >= v)
      case OffsetCmp(false, v) => df = df.filter(col("_offset") <= v)
      case _ =>
    }
    val explicitLos = sel.where.collect {
      case TsCmp(true, v) => v
      case TsBetween(lo, _) => lo
    }
    val explicitHis = sel.where.collect {
      case TsCmp(false, v) => v
      case TsBetween(_, hi) => hi
    }
    val lo = sel.window match {
      case Some(Last(dur)) => Some((explicitLos :+ (env.nowMs - dur)).max)
      case _ => explicitLos.reduceOption(_ max _)
    }
    lo.foreach(v => df = df.filter(col("_ts_ms") >= v))
    explicitHis.reduceOption(_ min _)
      .foreach(v => df = df.filter(col("_ts_ms") <= v))
    df
  }

  private def planSingle(spark: SparkSession, reg: TopicRegistry, sel: Select,
      limit: Int, env: Env): DataFrame = {
    var df = reg.frame(spark, sel.from.topic)

    sel.where.foreach {
      case PartitionEq(p) => df = df.filter(col("_partition") === p)
      case OffsetCmp(true, v) => df = df.filter(col("_offset") >= v)
      case OffsetCmp(false, v) => df = df.filter(col("_offset") <= v)
      case _ => // ts handled via bounds below
    }
    val (lo, hi) = tsBounds(sel, env.nowMs)
    lo.foreach(v => df = df.filter(col("_ts_ms") >= v))
    hi.foreach(v => df = df.filter(col("_ts_ms") <= v))

    val hasAgg = sel.projections.exists(_.expr.isInstanceOf[AggFunc])
    if (hasAgg) return planAggregate(df, sel, limit)

    // sort/limit before projection so ORDER BY _ts / TAIL work even when
    // _ts is not projected; ORDER BY+LIMIT lowers to TakeOrderedAndProject
    df = (sel.window, sel.orderBy) match {
      case (Some(Tail(n)), _) =>
        // last n in scan order: partition-major, offset asc (ring buffer,
        // server.go:1600-1610); output restored to scan order
        df.orderBy(col("_partition").desc, col("_offset").desc)
          .limit(math.min(n, limit))
          .orderBy(col("_partition"), col("_offset"))
      case (_, Some(OrderBy(_, asc))) =>
        df.orderBy(if (asc) col("_ts").asc else col("_ts").desc).limit(limit)
      case _ => df.limit(limit)
    }
    projectSingle(reg, df, sel)
  }

  private def projectSingle(reg: TopicRegistry, df: DataFrame, sel: Select): DataFrame =
    if (sel.star) {
      // star = 8 implicit + declared schema cols (server.go:1503-1512);
      // natural parquet columns and _ts_ms stay internal
      val implicitCols = TopicRegistry.implicitColumns.map(_._1)
      val declared = reg.get(sel.from.topic).schemaCols.map(_.name)
      df.select((implicitCols ++ declared).map(col): _*)
    } else {
      val cols = sel.projections.map(p => resolveExpr(df, p.expr, p.alias))
      df.select(cols: _*)
    }

  private def resolveExpr(df: DataFrame, e: Expr, alias: Option[String]): Column = {
    val c = e match {
      case ColRef(_, name) => df(name)
      case JsonFunc(kind, target, path) => jsonCol(df(target.name), kind, path)
      case AggFunc(_, _) => throw new KafsqlException("unexpected aggregate")
    }
    alias.fold(c)(c.as(_))
  }

  private def jsonCol(target: Column, kind: String, path: String): Column = kind match {
    case "value" | "query" => get_json_object(target.cast("string"), path)
    case "exists" => get_json_object(target.cast("string"), path).isNotNull
  }

  // ---- aggregates -------------------------------------------------------

  private def planAggregate(df: DataFrame, sel: Select, limit: Int): DataFrame = {
    val groupCols = sel.groupBy.map(g => df(g.name))
    val aggPairs = sel.projections.collect {
      case Projection(AggFunc(kind, arg), alias) =>
        val name = alias.getOrElse(defaultAggName(kind, arg))
        name -> aggCol(df, kind, arg).as(name)
    }
    val aggCols = aggPairs.map(_._2)
    val plainCols = sel.projections.collect {
      case Projection(cr: ColRef, alias) => df(cr.name).as(alias.getOrElse(cr.name))
    }
    val grouped =
      if (groupCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(groupCols: _*)
        .agg(aggCols.head, aggCols.tail: _*)
        .select(plainCols ++ aggPairs.map(p => col(p._1)): _*)
    if (groupCols.isEmpty) grouped.limit(limit)
    else {
      // output ordered by stringified group key, groups joined with 0x1f,
      // NULL → "<nil>" (server.go:1968-1981); LIMIT after sort
      val keyCols = sel.groupBy.map(g =>
        coalesce(col(groupAlias(sel, g)).cast("string"), lit("<nil>")))
      grouped.orderBy(concat_ws("\u001f", keyCols: _*)).limit(limit)
    }
  }

  private def groupAlias(sel: Select, g: ColRef): String =
    sel.projections.collectFirst {
      case Projection(cr: ColRef, Some(a)) if cr.name == g.name => a
    }.getOrElse(g.name)

  private def aggCol(df: DataFrame, kind: String, arg: Option[Expr]): Column = {
    def target: Column = arg.get match {
      case ColRef(_, n) => df(n)
      case JsonFunc(k, t, p) => jsonCol(df(t.name), k, p)
      case _ => throw new KafsqlException("invalid aggregate argument")
    }
    kind match {
      case "count" => arg.fold(count(lit(1)))(_ => count(target))
      // reference sums/averages as float64 over numeric-coercible values,
      // numeric strings included (server.go:1993-2002,2237-2246)
      case "sum" => sum(target.cast("double"))
      case "avg" => avg(target.cast("double"))
      case "min" => min(target)
      case "max" => max(target)
    }
  }

  private def defaultAggName(kind: String, arg: Option[Expr]): String =
    arg match {
      case None => kind
      case Some(ColRef(_, n)) => s"${kind}_$n"
      case Some(JsonFunc(_, _, p)) => s"${kind}_${p.stripPrefix("$.").replace('.', '_')}"
      case _ => kind
    }

  // ---- joins ------------------------------------------------------------

  private def planJoin(spark: SparkSession, reg: TopicRegistry, sel: Select,
      j: JoinClause, limit: Int, env: Env): DataFrame = {
    val leftName = sel.from.alias.getOrElse(sel.from.topic)
    val rightName = j.table.alias.getOrElse(j.table.topic)

    var left = reg.frame(spark, sel.from.topic)
    val (lo, hi) = tsBounds(sel, env.nowMs)
    lo.foreach(v => left = left.filter(col("_ts_ms") >= v))
    hi.foreach(v => left = left.filter(col("_ts_ms") <= v))
    // right side deliberately NOT time-pruned (server.go:2644-2650):
    // stream-history join — history must stay fully visible
    val right = reg.frame(spark, j.table.topic)

    val l = left.alias("l")
    // COST-BASED BROADCAST from estate stats (the reference's X7 analog):
    // the right side of a WITHIN join is the FULL topic history by design
    // (never time-pruned), so its size is exactly the estate's segment
    // byte sum — metadata the `segments` introspection hook already
    // serves without touching a segment. When that sum fits under the
    // session's broadcast threshold, hint broadcast explicitly: the DSv2
    // KFS scan reports no size statistics, so Spark's own estimator would
    // conservatively shuffle BOTH sides of what is usually a
    // small-history × big-stream join.
    val r = {
      val aliased = right.alias("r")
      val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
      // threshold gate FIRST: when auto-broadcast is disabled the estate
      // listing (a manifest scan) would be pure plan-time IO with its
      // result ignored
      val estateBytes =
        if (threshold <= 0) None
        else reg.get(j.table.topic).segments
          .map(hook => hook(spark).map(_.sizeBytes).sum)
      estateBytes match {
        case Some(b) if b <= threshold =>
          org.apache.spark.sql.functions.broadcast(aliased)
        case _ => aliased
      }
    }

    val (lkExpr, rkExpr) = joinKeys(j, rightName)
    val cond = joinSideCol("l", lkExpr) === joinSideCol("r", rkExpr) &&
      abs(col("l._ts_ms") - col("r._ts_ms")) <= j.withinMs // inclusive band, server.go:2358-2384
    val joined = l.join(r, cond, if (j.left) "left_outer" else "inner")
    joinProject(joined, sel, rightName).limit(limit)
  }

  private def joinSideCol(side: String, e: Expr): Column = e match {
    case ColRef(_, n) => col(s"$side.$n")
    case JsonFunc(kind, t, p) => jsonCol(col(s"$side.${t.name}").cast("string"), kind, p)
    case _ => throw new KafsqlException("invalid join key expression")
  }

  /** Normalize join-key sides: an expr qualified by the right topic/alias
    * binds right; no ON defaults to the `_key = _key` join. */
  private def joinKeys(j: JoinClause, rightName: String): (Expr, Expr) =
    j.on match {
      case None => (ColRef(None, "_key"), ColRef(None, "_key"))
      case Some((a, b)) =>
        def qualifierOf(e: Expr): Option[String] = e match {
          case ColRef(q, _) => q
          case JsonFunc(_, t, _) => t.qualifier
          case _ => None
        }
        val aq = qualifierOf(a)
        if (aq.contains(rightName)) (b, a) else (a, b)
    }

  /** Join output: star = 8 left + 8 `_right_`-prefixed right columns
    * (server.go:2581-2589,2652-2671); explicit projections bind by
    * qualifier, unqualified binds left. */
  private def joinProject(joined: DataFrame, sel: Select,
      rightName: String): DataFrame =
    if (sel.star) {
      val names = TopicRegistry.implicitColumns.map(_._1)
      val cols = names.map(n => col(s"l.$n").as(n)) ++
        names.map(n => col(s"r.$n").as(s"_right${n}"))
      joined.select(cols: _*)
    } else {
      val cols = sel.projections.map { p =>
        val c = p.expr match {
          case ColRef(Some(q), n) =>
            val side = if (q == rightName) "r" else "l"
            col(s"$side.$n")
          case ColRef(None, n) => col(s"l.$n")
          case JsonFunc(kind, t, path) =>
            val side = if (t.qualifier.contains(rightName)) "r" else "l"
            jsonCol(col(s"$side.${t.name}"), kind, path)
          case _: AggFunc => throw new KafsqlException("aggregates in join")
        }
        p.alias.fold(c)(c.as(_))
      }
      joined.select(cols: _*)
    }

  /** Continuous WITHIN join — the reference's flagship two-topic JOIN run
    * FOREVER (its explicit non-goal, delivered as the St5 superset): both
    * sides are streaming topic frames, watermarked on event time; the
    * dialect's inclusive ±WITHIN band becomes the stream-stream join's
    * time-range condition, so each side's state is bounded by
    * rate × (watermark delay + band) — never stream age. Key semantics
    * are the batch join's exactly: default `_key = _key`, side
    * normalization by qualifier, json_value keys, `_right_`-prefixed
    * star. LAST is ignored (the watermark replaces retention); ORDER
    * BY/TAIL/LIMIT are rejected as in every continuous plan. LEFT joins
    * emit their unmatched rows on state eviction (watermark passage),
    * exactly Spark's outer stream-stream contract. */
  def planContinuousJoin(reg: TopicRegistry, leftStream: DataFrame,
      rightStream: DataFrame, sel: Select,
      watermarkDelay: String, env: Env): DataFrame = {
    val j = sel.join.getOrElse(throw new KafsqlException(
      "continuous join requires a JOIN ... WITHIN clause"))
    if (sel.orderBy.nonEmpty)
      throw new KafsqlException("continuous queries do not support ORDER BY")
    if (sel.window.exists(_.isInstanceOf[Tail]))
      throw new KafsqlException("continuous queries do not support TAIL")
    if (sel.limit.nonEmpty)
      throw new KafsqlException("continuous queries do not support LIMIT")
    if (sel.projections.exists(_.expr.isInstanceOf[AggFunc]))
      throw new KafsqlException("aggregates are not supported in joins")
    if (sel.groupBy.nonEmpty)
      throw new KafsqlException("GROUP BY is not supported in joins")
    if (sel.where.exists {
        case _: PartitionEq | _: OffsetCmp => true; case _ => false })
      throw new KafsqlException(
        "partition/offset filters are not supported in joins")
    val rightName = j.table.alias.getOrElse(j.table.topic)
    // schema-on-read columns per side's registered topic, like the batch
    // frames carry
    def withSchema(stream: DataFrame, topic: String): DataFrame =
      reg.get(topic).schemaCols.foldLeft(stream) { (acc, sc) =>
        acc.withColumn(sc.name, TopicRegistry.extract(col("_value"), sc))
      }
    // explicit ts predicates bind the LEFT side, as in the batch join;
    // LAST is ignored (the watermark replaces retention)
    var lDf = withSchema(leftStream, sel.from.topic)
    sel.where.foreach {
      case TsCmp(true, v) => lDf = lDf.filter(col("_ts_ms") >= v)
      case TsCmp(false, v) => lDf = lDf.filter(col("_ts_ms") <= v)
      case TsBetween(lo, hi) =>
        lDf = lDf.filter(col("_ts_ms") >= lo && col("_ts_ms") <= hi)
      case _ =>
    }
    val (lk, rk) = joinKeys(j, rightName)
    // STATE-COLUMN PRUNING: a stream-stream join buffers BOTH sides in the
    // state store until the watermark passes, so every unreferenced topic
    // column carried into the join is state bytes and store-commit IO paid
    // per row per micro-batch forever. Keep only what the SELECT, the join
    // key, and the watermark need — at 100 TB the difference between
    // state ∝ (rate × window × needed-columns) and ∝ full topic width.
    def sideNames(side: String, frame: DataFrame): Seq[String] = {
      val fromProj =
        if (sel.star) TopicRegistry.implicitColumns.map(_._1)
        else sel.projections.flatMap(_.expr match {
          case ColRef(Some(q), n) =>
            if ((q == rightName) == (side == "r")) Seq(n) else Nil
          case ColRef(None, n) => if (side == "l") Seq(n) else Nil
          case JsonFunc(_, t, _) =>
            if (t.qualifier.contains(rightName) == (side == "r")) Seq(t.name)
            else Nil
          case _ => Nil
        })
      val fromKey = (if (side == "l") lk else rk) match {
        case ColRef(_, n) => Seq(n)
        case JsonFunc(_, t, _) => Seq(t.name)
        case _ => Nil
      }
      val have = frame.columns.toSet
      (fromProj ++ fromKey ++ Seq("_ts_ms")).distinct.filter(have)
    }
    // watermarks require TimestampType (not NTZ): derive event time from
    // the epoch-ms twin; session tz is UTC so wall times agree
    val l = lDf
      .select(sideNames("l", lDf).map(col): _*)
      .withColumn("_evt", timestamp_millis(col("_ts_ms")))
      .withWatermark("_evt", watermarkDelay)
      .alias("l")
    val rDf = withSchema(rightStream, j.table.topic)
    val r = rDf
      .select(sideNames("r", rDf).map(col): _*)
      .withColumn("_evt", timestamp_millis(col("_ts_ms")))
      .withWatermark("_evt", watermarkDelay)
      .alias("r")
    val band = expr(s"INTERVAL ${j.withinMs} MILLISECONDS")
    // the ±band as explicit event-time range bounds: this is what lets
    // Spark derive state watermarks and EVICT — an abs() over epoch-ms
    // would be correct but unanalyzable, keeping both states forever
    val cond = joinSideCol("l", lk) === joinSideCol("r", rk) &&
      col("r._evt") >= col("l._evt") - band &&
      col("r._evt") <= col("l._evt") + band
    val joined = l.join(r, cond, if (j.left) "left_outer" else "inner")
    joinProject(joined, sel, rightName)
  }
}
