package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CompatMinMax
import graft.streaming.StreamJoins

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("continuous KAFSQL SELECT drains to exactly the batch result") {
    import graft.kafsql.{Kafsql, KafsqlException, SchemaCol, TopicDef, TopicRegistry}
    import graft.kfs.{KfsSeed, KfsSource}
    import graft.streaming.KafsqlStream

    val root = KfsSeed.seededRoot(spark, sf)
    val reg = new TopicRegistry(Seq(TopicDef(
      "events", s => KfsSource.read(s, root, Some(Set("events"))),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = 0 to 3)))
    val query =
      "SELECT _partition, _offset, k FROM events WHERE _partition = 2 AND _ts >= 0"

    val out = java.nio.file.Files.createTempDirectory("kafsql_stream").toString
    KafsqlStream.runToTable(spark, reg, root, query,
      s"$out/table", s"$out/ckpt", nowMs = graft.core.Tables.FixedNowMs)
    val streamed = spark.read.parquet(s"$out/table")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.get(2))).toSet

    val batch = Kafsql.sql(spark, reg, query, nowMs = graft.core.Tables.FixedNowMs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.get(2))).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"streamed ${streamed.size} rows, batch ${batch.size}")

    // re-run with the same checkpoint: no new segments -> nothing appended
    KafsqlStream.runToTable(spark, reg, root, query,
      s"$out/table", s"$out/ckpt", nowMs = graft.core.Tables.FixedNowMs)
    assert(spark.read.parquet(s"$out/table").count() == streamed.size)

    // append-mode restrictions surface as KafsqlException
    val stream = KafsqlStream.topicStream(spark, root)
    intercept[KafsqlException](KafsqlStream.select(reg, stream,
      "SELECT _offset FROM events ORDER BY _ts LAST 1h"))
    intercept[KafsqlException](KafsqlStream.select(reg, stream,
      "SELECT COUNT(*) AS n FROM events LAST 1h"))
    intercept[KafsqlException](KafsqlStream.select(reg, stream,
      "SELECT _offset FROM events TAIL 5"))
  }

  test("continuous KAFSQL aggregate windows match the batch computation") {
    import graft.kafsql.{SchemaCol, TopicDef, TopicRegistry}
    import graft.kfs.{KfsSeed, KfsSource}
    import graft.streaming.KafsqlStream

    val root = KfsSeed.seededRoot(spark, sf)
    val reg = new TopicRegistry(Seq(TopicDef(
      "events", s => KfsSource.read(s, root, Some(Set("events"))),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = 0 to 3)))
    val query =
      "SELECT _partition, COUNT(*) AS cnt, SUM(k) AS sum_k FROM events GROUP BY _partition SCAN FULL"

    val out = KafsqlStream.aggregate(
      reg, KafsqlStream.topicStream(spark, root), query, "7 days",
      nowMs = graft.core.Tables.FixedNowMs)
    val q = out.writeStream.format("memory").queryName("ckagg")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("ckagg").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("win_start"),
        r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    // batch equivalent on the same decoded topic frame
    val batch = KfsSource.read(spark, root, Some(Set("events")))
      .withColumn("k", get_json_object(col("_value").cast("string"), "$.k").cast("int"))
      .groupBy(window(col("_ts"), "7 days"), col("_partition"))
      .agg(count(lit(1)).as("cnt"), sum(col("k").cast("double")).as("sum_k"))
      .select(col("window.start"), col("_partition"), col("cnt"), col("sum_k"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch && streamed.nonEmpty,
      s"streamed ${streamed.size} windows, batch ${batch.size}")
  }

  test("continuous aggregate resolves aliased group columns (ADVICE r2)") {
    import graft.kafsql.{SchemaCol, TopicDef, TopicRegistry}
    import graft.kfs.{KfsSeed, KfsSource}
    import graft.streaming.KafsqlStream

    val root = KfsSeed.seededRoot(spark, sf)
    val reg = new TopicRegistry(Seq(TopicDef(
      "events", s => KfsSource.read(s, root, Some(Set("events"))),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = 0 to 3)))
    // SELECT _partition AS part ... GROUP BY _partition used to throw
    // AnalysisException in the continuous path (batch handled it)
    val out = KafsqlStream.aggregate(
      reg, KafsqlStream.topicStream(spark, root),
      "SELECT _partition AS part, COUNT(*) AS cnt FROM events " +
        "GROUP BY _partition SCAN FULL",
      "7 days", nowMs = graft.core.Tables.FixedNowMs)
    assert(out.columns.toSeq == Seq("win_start", "part", "cnt"))
    val q = out.writeStream.format("memory").queryName("ckagg_alias")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val rows = spark.table("ckagg_alias").collect()
      .map(r => r.getAs[Int]("part") -> r.getAs[Long]("cnt")).toMap
    assert(rows.keySet == Set(0, 1, 2, 3) && rows.values.forall(_ > 0))
  }

  test("file stream skips an incomplete segment instead of failing (ADVICE r2)") {
    import graft.kafsql.{SchemaCol, TopicDef, TopicRegistry}
    import graft.kfs.{KfsCodec, KfsLayout, KfsSeed, KfsSource}
    import graft.streaming.KafsqlStream

    // private root: seed one good segment + one truncated (no END! footer)
    val root = java.nio.file.Files.createTempDirectory("kfs_incomplete").toString
    val recs = (0L until 10L).map(i => KfsCodec.Record(
      i, 1706000000000L + i, s"k$i".getBytes, s"""{"k":$i}""".getBytes, Nil))
    KfsLayout.writeSegment(root, "events", 0, recs)
    val good = KfsCodec.buildSegment(recs.map(r => r.copy(offset = r.offset + 10)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "events", "0", KfsLayout.segmentFileName(10L)),
      good.dropRight(7)) // truncated mid-footer: no END!
    val reg = new TopicRegistry(Seq(TopicDef(
      "events", s => KfsSource.read(s, root, Some(Set("events"))),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = Seq(0))))
    val out = java.nio.file.Files.createTempDirectory("kfs_incomplete_out").toString
    // would previously throw KfsFormatException and poison the stream
    KafsqlStream.runToTable(spark, reg, root,
      "SELECT _partition, _offset, k FROM events WHERE _ts >= 0",
      s"$out/table", s"$out/ckpt", nowMs = graft.core.Tables.FixedNowMs)
    val offsets = spark.read.parquet(s"$out/table")
      .collect().map(_.getLong(1)).toSet
    assert(offsets == (0L until 10L).toSet,
      s"good segment only, got ${offsets.size} rows")
  }

  test("file stream skips corrupt-but-complete segments (ADVICE r3)") {
    import graft.kafsql.{SchemaCol, TopicDef, TopicRegistry}
    import graft.kfs.{KfsCodec, KfsLayout, KfsSource}
    import graft.streaming.KafsqlStream

    val root = java.nio.file.Files.createTempDirectory("kfs_corrupt").toString
    val recs = (0L until 10L).map(i => KfsCodec.Record(
      i, 1706000000000L + i, s"k$i".getBytes, s"""{"k":$i}""".getBytes, Nil))
    KfsLayout.writeSegment(root, "events", 0, recs)

    // corrupt #1: valid END! footer, body byte flipped, CRC NOT fixed —
    // segmentInfo throws "segment CRC mismatch"
    val bad1 = KfsCodec.buildSegment(recs.map(r => r.copy(offset = r.offset + 10)))
    bad1(100) = (bad1(100) ^ 0x5a).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(
      root, "events", "0", KfsLayout.segmentFileName(10L)), bad1)

    // corrupt #2: the "foreign writer CRCs its own garbage" case — body
    // byte flipped AND the footer CRC recomputed over the garbage, so
    // segmentInfo passes and the failure only surfaces lazily mid-decode
    val bad2 = KfsCodec.buildSegment(recs.map(r => r.copy(offset = r.offset + 20)))
    bad2(100) = (bad2(100) ^ 0x5a).toByte
    val crc = new java.util.zip.CRC32C
    crc.update(bad2, KfsCodec.SegmentHeaderLen,
      bad2.length - KfsCodec.FooterLen - KfsCodec.SegmentHeaderLen)
    val bb = java.nio.ByteBuffer.wrap(bad2, bad2.length - KfsCodec.FooterLen, 4)
    bb.putInt(crc.getValue.toInt)
    java.nio.file.Files.write(java.nio.file.Paths.get(
      root, "events", "0", KfsLayout.segmentFileName(20L)), bad2)

    val reg = new TopicRegistry(Seq(TopicDef(
      "events", s => KfsSource.read(s, root, Some(Set("events"))),
      schemaCols = Seq(SchemaCol("k", "int", "$.k")),
      partitions = Seq(0))))
    val out = java.nio.file.Files.createTempDirectory("kfs_corrupt_out").toString
    val skipped = spark.sparkContext.longAccumulator("test.corruptSkips")
    KafsqlStream.runToTable(spark, reg, root,
      "SELECT _partition, _offset, k FROM events WHERE _ts >= 0",
      s"$out/table", s"$out/ckpt", nowMs = graft.core.Tables.FixedNowMs,
      corruptCounter = skipped)
    val offsets = spark.read.parquet(s"$out/table")
      .collect().map(_.getLong(1)).toSet
    assert(offsets == (0L until 10L).toSet,
      s"expected only the good segment's 10 rows, got ${offsets.size}")
    // ADVICE r4: skips must be observable, not stderr-only — both corrupt
    // segments count in the caller's accumulator
    assert(skipped.value == 2L, s"expected 2 skips counted, got ${skipped.value}")
  }

  test("continuous WITHIN join matches only pairs inside the band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Timestamp, String)]
    val rIn = MemoryStream[(String, Timestamp, String)]
    val t0 = 1706000000000L
    def ts(ms: Long) = new Timestamp(ms)

    val joined = StreamJoins.within(
      lIn.toDF().toDF("key", "ts", "value"),
      rIn.toDF().toDF("key", "ts", "value"),
      withinMs = 5000)

    val q = joined.writeStream.format("memory").queryName("wj")
      .outputMode("append").start()
    try {
      lIn.addData(("u1", ts(t0), "l1"), ("u2", ts(t0), "l2"))
      rIn.addData(
        ("u1", ts(t0 + 3000), "r-in-band"),
        ("u1", ts(t0 + 60000), "r-out-of-band"),
        ("u3", ts(t0 + 1000), "r-wrong-key"))
      q.processAllAvailable()
      // push watermarks forward so state can evict (behavioral smoke)
      lIn.addData(("w", ts(t0 + 120000), "wm"))
      rIn.addData(("w2", ts(t0 + 120000), "wm"))
      q.processAllAvailable()
      val rows = spark.table("wj").collect()
      assert(rows.map(r => (r.getAs[String]("l_key"), r.getAs[String]("r_value"))).toSet ==
        Set(("u1", "r-in-band")))
    } finally q.stop()
  }

  test("left-outer WITHIN join: unmatched rows emit nulls only on watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(String, Timestamp, String)]
    val rIn = MemoryStream[(String, Timestamp, String)]
    val t0 = 1706000000000L
    def ts(ms: Long) = new Timestamp(ms)
    val joined = StreamJoins.within(
      lIn.toDF().toDF("key", "ts", "value"),
      rIn.toDF().toDF("key", "ts", "value"),
      withinMs = 5000, joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("loj")
      .outputMode("append").start()
    try {
      lIn.addData(("u1", ts(t0), "l-matched"), ("u2", ts(t0), "l-lonely"))
      rIn.addData(("u1", ts(t0 + 2000), "r1"))
      q.processAllAvailable()
      def rows() = spark.table("loj").collect()
        .map(r => (r.getAs[String]("l_value"), r.getAs[String]("r_value"))).toSet
      // before the watermark passes u2's band, only the match is out —
      // the null row CANNOT be emitted yet (u2 might still match)
      assert(rows() == Set(("l-matched", "r1")))
      // advance watermarks far past t0 + band on BOTH sides; eviction
      // flushes on the following batch
      for (bump <- Seq(0, 1)) {
        lIn.addData(("w", ts(t0 + 300000 + bump), "wm"))
        rIn.addData(("w2", ts(t0 + 300000 + bump), "wm"))
        q.processAllAvailable()
      }
      assert(rows().contains(("l-lonely", null)),
        s"expected the lonely left row to flush with nulls, got ${rows()}")
    } finally q.stop()
  }

  test("compat MIN/MAX: first-kind-wins over mixed untyped values") {
    import spark.implicits._
    // number first -> strings ignored; numeric strings compare numerically
    val numsFirst = Seq("10", "9", "banana", "100", "2").toDS()
    val minCol = CompatMinMax.compatMin.toColumn
    val maxCol = CompatMinMax.compatMax.toColumn
    val r1 = numsFirst.select(minCol.name("mn"), maxCol.name("mx")).collect().head
    assert(r1 == ("2", "100")) // numeric compare, not lexicographic

    // string first -> later numbers ignored, lexicographic compare
    val strFirst = Seq("pear", "apple", "42", "zebra").toDS()
    val r2 = strFirst.select(minCol.name("mn"), maxCol.name("mx")).collect().head
    assert(r2 == ("apple", "zebra"))

    // timestamps recognized as their own kind
    val tsFirst = Seq("2024-01-02 00:00:00", "2024-01-01 00:00:00", "zzz").toDS()
    val r3 = tsFirst.select(minCol.name("mn"), maxCol.name("mx")).collect().head
    assert(r3 == ("2024-01-01 00:00:00", "2024-01-02 00:00:00"))

    // timestamps compare by INSTANT (parsed epoch ms), not lexicographically:
    // 'T'-separated RFC3339 vs space layout, and fewer fractional digits,
    // must still order by time (reference updateAggMin/Max on state.TS)
    val mixed = Seq(
      "2024-01-02T00:00:00", // later instant, lexicographically SMALLER than
      "2024-01-01 23:59:59.9", // this one ('T' < ' ' is false: ' ' < 'T')
      "2024-01-01 00:00:00.100").toDS()
    val r4 = mixed.select(minCol.name("mn"), maxCol.name("mx")).collect().head
    assert(r4 == ("2024-01-01 00:00:00.100", "2024-01-02T00:00:00"),
      s"instant ordering expected, got $r4")
  }
}
