package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.IcebergSink

/** READER-side conformance: tables shaped by a FOREIGN writer — spec-legal
  * variations our own writer never emits — must read correctly. The
  * writer-side golden fixtures (IcebergConformanceSpec) prove our output
  * matches the spec; these prove our READER accepts the spec, not just our
  * own dialect: unknown future keys are ignored, null entry sequence
  * numbers inherit from the manifest list (spec: Sequence Number
  * Inheritance), and EXISTING/DELETED entry statuses plan as live/skipped
  * (spec: Manifests, `status`). Every mutation writes NEW metadata files —
  * manifests are immutable and cached by path, exactly as a foreign
  * committer would. */
class IcebergReaderConformanceSpec extends AnyFunSuite {
  import TestSpark._

  private val mapper = new ObjectMapper()

  private def tmpTable(): String =
    Files.createTempDirectory("iceberg_foreign").toString + "/t"

  private def latestVersion(table: String): Int =
    new String(Files.readAllBytes(
      Paths.get(table, "metadata", "version-hint.text")), "UTF-8").trim.toInt

  private def metaJson(table: String, v: Int): ObjectNode =
    mapper.readTree(new String(Files.readAllBytes(
      Paths.get(table, "metadata", s"v$v.metadata.json")), "UTF-8"))
      .asInstanceOf[ObjectNode]

  private def writeVersion(table: String, v: Int, n: ObjectNode): Unit = {
    Files.write(Paths.get(table, "metadata", s"v$v.metadata.json"),
      n.toString.getBytes("UTF-8"))
    Files.write(Paths.get(table, "metadata", "version-hint.text"),
      v.toString.getBytes("UTF-8"))
  }

  /** Read an avro file's (meta, schema, records) straight off disk — the
    * foreign writer's view, no engine caches. */
  private def readAvroRaw(path: String)
      : (Map[String, String], Schema, Seq[GenericRecord]) = {
    val in = Files.newInputStream(Paths.get(
      path.stripPrefix("file:")))
    val s = new DataFileStream[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val meta = s.getMetaKeys.asScala.filterNot(_.startsWith("avro."))
        .map(k => k -> new String(s.getMeta(k), "UTF-8")).toMap
      (meta, s.getSchema, s.iterator().asScala.toVector)
    } finally s.close()
  }

  private def writeAvroRaw(path: String, schema: Schema,
      meta: Map[String, String], records: Seq[GenericRecord]): Long = {
    val p = Paths.get(path.stripPrefix("file:"))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, Files.newOutputStream(p))
    records.foreach(w.append)
    w.close()
    Files.size(p)
  }

  private def copyRecord(schema: Schema, r: GenericRecord): GenericData.Record = {
    val c = new GenericData.Record(schema)
    schema.getFields.asScala.foreach(f => c.put(f.name(), r.get(f.name())))
    c
  }

  test("foreign metadata: unknown future keys and summary properties are ignored") {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v = latestVersion(table)
    val n = metaJson(table, v)
    // a future-spec writer adds top-level keys, table properties, and
    // snapshot summary entries we have never seen
    n.putObject("unknown-future-section").put("x", 1)
    n.put("row-lineage", true)
    val props = n.withObject("/properties")
    props.put("write.metadata.compression-codec", "none")
    props.put("foreign.engine", "other-writer/9.9")
    n.withArray("snapshots").forEach { sn =>
      sn.asInstanceOf[ObjectNode].withObject("/summary")
        .put("spark.app.id", "foreign-app")
        .put("engine-version", "9.9.9")
    }
    writeVersion(table, v + 1, n)

    val m = IcebergSink.load(spark, table).get
    assert(m.version == v + 1)
    assert(m.snapshots.head.summary.get("spark.app.id").contains("foreign-app"),
      "foreign summary properties must round-trip into Snapshot.summary")
    assert(IcebergSink.read(spark, table).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  /** Re-shape the table's CURRENT snapshot the way a foreign
    * inherited-metadata writer would: every manifest entry's
    * `sequence_number`/`file_sequence_number` nulled (spec: Sequence
    * Number Inheritance — they inherit the manifest list's at read
    * time), each rewritten as a NEW manifest + list + metadata version. */
  private def nullifyEntrySeqs(table: String, tag: String): Unit = {
    val v = latestVersion(table)
    val n = metaJson(table, v)
    val listPath = n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .path("manifest-list").asText()
    val (listMeta, listSchema, listRecs) = readAvroRaw(listPath)
    val newListRecs = listRecs.zipWithIndex.map { case (lr, i) =>
      val mPath = lr.get("manifest_path").toString
      val (mMeta, mSchema, mRecs) = readAvroRaw(mPath)
      val nulled = mRecs.map { e =>
        val c = copyRecord(mSchema, e)
        c.put("sequence_number", null)
        c.put("file_sequence_number", null)
        c
      }
      val np = mPath.stripSuffix(".avro") + s"-$tag$i.avro"
      val len = writeAvroRaw(np, mSchema, mMeta, nulled)
      val cl = copyRecord(listSchema, lr)
      cl.put("manifest_path", np)
      cl.put("manifest_length", len)
      cl
    }
    val newList = listPath.stripSuffix(".avro") + s"-$tag.avro"
    writeAvroRaw(newList, listSchema, listMeta, newListRecs)
    n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .asInstanceOf[ObjectNode].put("manifest-list", newList)
    writeVersion(table, v + 1, n)
  }

  test("foreign manifest: null entry sequence numbers inherit from the list") {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    IcebergSink.deleteWhere(spark, table, col("id") === 1L, Seq("id"))
    IcebergSink.append(spark, table, Seq((1L, "c")).toDF("id", "s")) // survives: seq 3 > delete seq 2

    // a foreign writer leaves ADDED entries' sequence numbers null (spec:
    // they inherit the manifest list's sequence_number at read time) —
    // rewrite EVERY manifest that way and point a new version at it
    nullifyEntrySeqs(table, "foreign")

    // inheritance must reconstruct the SAME scoping: id=1 deleted from the
    // first append (list seq 1 < delete seq 2), re-append survives (3 > 2)
    val rows = IcebergSink.read(spark, table).orderBy("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "c"), (2L, "b")),
      s"sequence-number inheritance broke delete scoping: $rows")
  }

  test("foreign manifest: EXISTING entries read, DELETED entries are skipped") {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table, Seq((1L, "a")).toDF("id", "s"))
    IcebergSink.append(spark, table, Seq((2L, "b")).toDF("id", "s"))

    // a foreign compaction/overwrite snapshot: ONE new manifest carrying
    // the first file as EXISTING (status=0, original numbers) and the
    // second as DELETED (status=2) — our writer emits this shape only via
    // overwritePartitions; a foreign writer can emit it for any reason
    val v = latestVersion(table)
    val n = metaJson(table, v)
    val curId = n.path("current-snapshot-id").asLong()
    val listPath = n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() == curId).get
      .path("manifest-list").asText()
    val (listMeta, listSchema, listRecs) = readAvroRaw(listPath)
    assert(listRecs.size == 2)
    val entries = listRecs.map { lr =>
      val (mMeta, mSchema, mRecs) = readAvroRaw(lr.get("manifest_path").toString)
      (mMeta, mSchema, mRecs)
    }
    val schema = entries.head._2
    val combined =
      entries.head._3.map { e =>
        val c = copyRecord(schema, e); c.put("status", 0); c
      } ++ entries.last._3.map { e =>
        val c = copyRecord(schema, e); c.put("status", 2); c
      }
    val mPath = Paths.get(table, "metadata", "foreign-compact-m0.avro").toString
    val mLen = writeAvroRaw(mPath, schema, entries.head._1, combined)
    val cl = copyRecord(listSchema, listRecs.head)
    cl.put("manifest_path", mPath)
    cl.put("manifest_length", mLen)
    val newList = Paths.get(table, "metadata", "snap-999-foreign.avro").toString
    writeAvroRaw(newList, listSchema, listMeta, Seq(cl))
    val lastSeq = n.path("last-sequence-number").asLong()
    val sn = n.withArray("snapshots").addObject()
    sn.put("snapshot-id", 999L).put("parent-snapshot-id", curId)
      .put("sequence-number", lastSeq + 1).put("timestamp-ms", 1L)
      .put("manifest-list", newList).put("schema-id", 0)
    sn.putObject("summary").put("operation", "overwrite")
    n.put("current-snapshot-id", 999L)
    n.put("last-sequence-number", lastSeq + 1)
    writeVersion(table, v + 1, n)

    val rows = IcebergSink.read(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a")),
      s"EXISTING must read, DELETED must be skipped: $rows")
  }

  test("rewrite_manifests on a foreign inherited-seq table materializes entry seqs") {
    import spark.implicits._
    val table = tmpTable()
    // two DATA manifests (same header group -> they merge) plus an
    // equality delete between them, then the foreign inherited-seq shape
    IcebergSink.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "s")) // seq 1
    IcebergSink.deleteWhere(spark, table, col("id") === 1L, Seq("id")) // seq 2
    IcebergSink.append(spark, table, Seq((1L, "c")).toDF("id", "s")) // seq 3
    nullifyEntrySeqs(table, "inh")
    val expect = Seq((1L, "c"), (2L, "b"))
    assert(IcebergSink.read(spark, table).orderBy("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == expect)

    // the rewrite must MATERIALIZE each entry's inherited seq from its
    // OWN source manifest before the copy leaves that inheritance scope —
    // left null, the merged data manifest's NEW list seq (4) would
    // re-inherit onto both data files, lift them above the delete (seq
    // 2), and resurrect (1, "a")
    IcebergSink.rewriteManifests(spark, table)
    val rows = IcebergSink.read(spark, table).orderBy("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == expect,
      s"inherited seqs must materialize through the rewrite: $rows")
    // and the merged manifest's entries all carry explicit numbers
    val m = IcebergSink.load(spark, table).get
    val lms = IcebergSink.readAvro(spark, m.snapshots.last.manifestList)._2
    val mergedEntries = lms
      .filter(_.get("added_snapshot_id").asInstanceOf[Long] ==
        m.currentSnapshotId.get)
      .flatMap(lr => readAvroRaw(lr.get("manifest_path").toString)._3)
    assert(mergedEntries.nonEmpty, "the two data manifests must have merged")
    assert(mergedEntries.forall(_.get("sequence_number") != null),
      "rewritten entries must carry explicit sequence numbers")
    assert(mergedEntries.forall(_.get("snapshot_id") != null),
      "rewritten entries must carry explicit snapshot ids")
    assert(mergedEntries.map(_.get("sequence_number").asInstanceOf[Long])
      .toSet == Set(1L, 3L),
      "materialized seqs must be each entry's OWN source list seq")
  }

  test("foreign manifest: scheme-divergent data file paths still count every row") {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    // an equality delete forces the read through the (file -> seq) lookup
    // join — the path where a shape mismatch would silently drop rows
    IcebergSink.deleteWhere(spark, table, col("id") === 1L, Seq("id"))
    IcebergSink.append(spark, table, Seq((1L, "c")).toDF("id", "s"))
    val expect = Seq((1L, "c"), (2L, "b"))

    // rewrite every manifest entry's file_path to a DIFFERENT spec-legal
    // shape of the same file: bare paths gain a scheme, URIs lose it —
    // exactly the divergence a foreign writer produces against Spark's
    // `_metadata.file_path` URI form
    val v = latestVersion(table)
    val n = metaJson(table, v)
    val listPath = n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .path("manifest-list").asText()
    val (listMeta, listSchema, listRecs) = readAvroRaw(listPath)
    val newListRecs = listRecs.zipWithIndex.map { case (lr, i) =>
      val mPath = lr.get("manifest_path").toString
      val (mMeta, mSchema, mRecs) = readAvroRaw(mPath)
      val reshaped = mRecs.map { e =>
        val c = copyRecord(mSchema, e)
        val d = c.get("data_file").asInstanceOf[GenericRecord]
        val p = d.get("file_path").toString
        d.put("file_path",
          if (p.startsWith("file:"))
            p.replaceFirst("^file:/*", "/") // URI -> bare
          else "file://" + p) // bare -> URI
        c
      }
      val np = mPath.stripSuffix(".avro") + s"-shape$i.avro"
      val len = writeAvroRaw(np, mSchema, mMeta, reshaped)
      val cl = copyRecord(listSchema, lr)
      cl.put("manifest_path", np)
      cl.put("manifest_length", len)
      cl
    }
    val newList = listPath.stripSuffix(".avro") + "-shape.avro"
    writeAvroRaw(newList, listSchema, listMeta, newListRecs)
    n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .asInstanceOf[ObjectNode].put("manifest-list", newList)
    writeVersion(table, v + 1, n)

    // every row must still be found and counted — the seq lookup
    // normalizes both sides and would RAISE (not drop) on a real miss
    val rows = IcebergSink.read(spark, table).orderBy("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == expect,
      s"path-shape divergence must not lose rows: $rows")

    // EXPIRY survivorship also normalizes: the current snapshot names
    // these files in URI/bare-divergent shape while expired snapshots
    // name them in the writer's original shape — expire must NOT delete
    // data files the head still references just because the strings
    // differ
    IcebergSink.expireSnapshots(spark, table,
      olderThanMs = System.currentTimeMillis() + 1000L, retainLast = 1)
    val after = IcebergSink.read(spark, table).orderBy("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == expect,
      s"expiry must normalize path shapes before survivorship: $after")
  }

  test("changelog pos-delete pre-images survive scheme-divergent manifests") {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    // a POSITION delete: its parquet records the data file path in the
    // shape _metadata reported at delete time
    IcebergSink.deleteWherePositions(spark, table, col("id") === 2L)
    val delSnap = IcebergSink.load(spark, table).get.currentSnapshotId.get

    // reshape the delete snapshot's MANIFEST paths (URI <-> bare) so the
    // changelog's target-file resolution compares divergent shapes of
    // the same files — pre-normalization it would silently emit ZERO
    // delete pre-images for the snapshot
    val v = latestVersion(table)
    val n = metaJson(table, v)
    val snapNode = n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() == delSnap).get
      .asInstanceOf[ObjectNode]
    val listPath = snapNode.path("manifest-list").asText()
    val (listMeta, listSchema, listRecs) = readAvroRaw(listPath)
    val newListRecs = listRecs.zipWithIndex.map { case (lr, i) =>
      val mPath = lr.get("manifest_path").toString
      val (mMeta, mSchema, mRecs) = readAvroRaw(mPath)
      val reshaped = mRecs.map { e =>
        val c = copyRecord(mSchema, e)
        val d = c.get("data_file").asInstanceOf[GenericRecord]
        val p = d.get("file_path").toString
        d.put("file_path",
          if (p.startsWith("file:")) p.replaceFirst("^file:/*", "/")
          else "file://" + p)
        c
      }
      val np = mPath.stripSuffix(".avro") + s"-chg$i.avro"
      val len = writeAvroRaw(np, mSchema, mMeta, reshaped)
      val cl = copyRecord(listSchema, lr)
      cl.put("manifest_path", np)
      cl.put("manifest_length", len)
      cl
    }
    val newList = listPath.stripSuffix(".avro") + "-chg.avro"
    writeAvroRaw(newList, listSchema, listMeta, newListRecs)
    snapNode.put("manifest-list", newList)
    writeVersion(table, v + 1, n)

    // the changelog must still surface the FULL pre-image of the
    // positionally deleted row
    val ch = IcebergSink.readChangelogFrom(spark, table, None)
      .where(col("_change_type") === "delete")
      .select(col("id"), col("s")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(ch == Seq((2L, "b")),
      s"pos-delete pre-images must survive path-shape divergence: $ch")
  }

  /** Rewrite the CURRENT snapshot's manifests, mapping every data_file
    * path through `xform(path, isDeleteFile)` — the shared reshaper the
    * conformance matrix parameterizes over. */
  private def reshapePaths(table: String, tag: String)(
      xform: (String, Boolean) => String): Unit = {
    val v = latestVersion(table)
    val n = metaJson(table, v)
    val snapNode = n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .asInstanceOf[ObjectNode]
    val listPath = snapNode.path("manifest-list").asText()
    val (listMeta, listSchema, listRecs) = readAvroRaw(listPath)
    val newListRecs = listRecs.zipWithIndex.map { case (lr, i) =>
      val mPath = lr.get("manifest_path").toString
      val (mMeta, mSchema, mRecs) = readAvroRaw(mPath)
      val reshaped = mRecs.map { e =>
        val c = copyRecord(mSchema, e)
        val d = c.get("data_file").asInstanceOf[GenericRecord]
        val isDelete = (d.getSchema.getField("content") != null) &&
          (d.get("content") match {
            case x: Integer => x.intValue() != 0; case _ => false
          })
        d.put("file_path", xform(d.get("file_path").toString, isDelete))
        c
      }
      val np = mPath.stripSuffix(".avro") + s"-$tag$i.avro"
      val len = writeAvroRaw(np, mSchema, mMeta, reshaped)
      val cl = copyRecord(listSchema, lr)
      cl.put("manifest_path", np)
      cl.put("manifest_length", len)
      cl
    }
    val newList = listPath.stripSuffix(".avro") + s"-$tag.avro"
    writeAvroRaw(newList, listSchema, listMeta, newListRecs)
    snapNode.put("manifest-list", newList)
    writeVersion(table, v + 1, n)
  }

  // ---- THE FOREIGN-SHAPE × OPERATION CONFORMANCE MATRIX -------------------
  //
  // Every metadata operation must behave identically on a table whose
  // CURRENT snapshot was re-shaped by a foreign writer. Shapes:
  //   inherited-seq    — entry seqs nulled (spec: Sequence Number
  //                      Inheritance); legal here because the fixture's
  //                      manifests are ADDED-only
  //   scheme-divergent — every data/delete file path flips URI <-> bare
  //   pct-literal      — data files physically COPIED to names containing
  //                      a literal `%2D` (spec-legal file name); proves NO
  //                      canonicalizer percent-DECODES paths — Hadoop Path
  //                      keeps `%2D` literal, so decoding would conflate
  //                      distinct files and delete the wrong one
  // Operations: read, rewrite_manifests, remove-dangling-deletes (a no-op
  // law: the fixture's delete is NOT dangling — min live data seq 1 < its
  // seq 2 — so a mis-read of inherited seqs that dropped it would
  // resurrect rows), compact, expireSnapshots (survivorship normalized:
  // live files survive), removeOrphanFiles (junk reclaims, referenced
  // files survive). The changelog half lives in its own pos-delete test
  // below; the collision refusal in its own test; both share the same
  // reshaper contract.
  private val foreignShapes: Seq[(String, String => Unit)] = Seq(
    "inherited-seq" -> ((t: String) => nullifyEntrySeqs(t, "mx")),
    "scheme-divergent" -> ((t: String) => reshapePaths(t, "mx") {
      (p, _) =>
        if (p.startsWith("file:")) p.replaceFirst("^file:/*", "/")
        else "file://" + p
    }),
    "pct-literal" -> ((t: String) => reshapePaths(t, "mx") {
      (p, isDelete) =>
        if (isDelete) p
        else {
          val bare = p.replaceFirst("^file:/*", "/")
          val np = bare.stripSuffix(".parquet") + "-x%2Dy.parquet"
          Files.copy(Paths.get(bare), Paths.get(np))
          np
        }
    }))

  private def matrixFixture(): (String, Seq[(Long, String)]) = {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table, Seq((1L, "a"), (2L, "b")).toDF("id", "s")) // seq 1
    IcebergSink.deleteWhere(spark, table, col("id") === 1L, Seq("id")) // seq 2
    IcebergSink.append(spark, table, Seq((1L, "c")).toDF("id", "s")) // seq 3
    (table, Seq((1L, "c"), (2L, "b")))
  }

  private def matrixRows(table: String): Seq[(Long, String)] =
    IcebergSink.read(spark, table).orderBy("id", "s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  for ((shapeName, shape) <- foreignShapes) {
    test(s"matrix/$shapeName: read + every metadata op preserves results") {
      // read
      val (t1, expect) = matrixFixture()
      shape(t1)
      assert(matrixRows(t1) == expect, s"[$shapeName × read]")

      // rewrite_manifests (metadata-only; inherited seqs materialize)
      IcebergSink.rewriteManifests(spark, t1)
      assert(matrixRows(t1) == expect, s"[$shapeName × rewriteManifests]")

      // remove-dangling-deletes: MUST no-op (the delete still scopes over
      // the seq-1 data file) — firing here would resurrect (1, "a")
      val (t2, _) = matrixFixture()
      shape(t2)
      val v0 = IcebergSink.load(spark, t2).get.version
      IcebergSink.removeDanglingDeletes(spark, t2)
      assert(IcebergSink.load(spark, t2).get.version == v0,
        s"[$shapeName × removeDanglingDeletes] must not commit")
      assert(matrixRows(t2) == expect, s"[$shapeName × removeDanglingDeletes]")

      // compact (reads through the shape, materializes the delete)
      IcebergSink.compact(spark, t2)
      assert(matrixRows(t2) == expect, s"[$shapeName × compact]")

      // expire: survivorship must normalize shapes — live files survive,
      // and the head still reads afterwards
      val (t3, _) = matrixFixture()
      shape(t3)
      IcebergSink.expireSnapshots(spark, t3,
        olderThanMs = System.currentTimeMillis() + 1000L, retainLast = 1)
      assert(matrixRows(t3) == expect, s"[$shapeName × expireSnapshots]")

      // orphan reclaim: junk goes, every referenced file stays readable
      val (t4, _) = matrixFixture()
      shape(t4)
      val junk = Paths.get(t4, "data", "junk-orphan.parquet")
      Files.write(junk, Array[Byte](1, 2, 3))
      Files.setLastModifiedTime(junk,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
      IcebergSink.removeOrphanFiles(spark, t4,
        olderThanMs = System.currentTimeMillis() + 1000L)
      assert(!Files.exists(junk), s"[$shapeName × removeOrphanFiles] junk")
      assert(matrixRows(t4) == expect, s"[$shapeName × removeOrphanFiles]")
    }
  }

  test("foreign manifest: two DISTINCT files colliding after normalization refuse loudly") {
    import spark.implicits._
    val table = tmpTable()
    IcebergSink.append(spark, table, Seq((1L, "a")).toDF("id", "s"))
    IcebergSink.append(spark, table, Seq((2L, "b")).toDF("id", "s"))
    // a delete forces the seq-lookup path on read
    IcebergSink.deleteWhere(spark, table, col("id") === 1L, Seq("id"))

    // rewrite the second data file's manifest path to a DIFFERENT file's
    // normalized shape: scheme-stripping would conflate them — the read
    // must refuse instead of silently duplicating rows with mixed seqs
    val v = latestVersion(table)
    val n = metaJson(table, v)
    val listPath = n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .path("manifest-list").asText()
    val (listMeta, listSchema, listRecs) = readAvroRaw(listPath)
    var firstDataPath: String = null
    val newListRecs = listRecs.zipWithIndex.map { case (lr, i) =>
      val mPath = lr.get("manifest_path").toString
      val (mMeta, mSchema, mRecs) = readAvroRaw(mPath)
      val reshaped = mRecs.map { e =>
        val c = copyRecord(mSchema, e)
        val d = c.get("data_file").asInstanceOf[GenericRecord]
        val p = d.get("file_path").toString
        val isDelete = (d.getSchema.getField("content") != null) &&
          (d.get("content") match {
            case x: Integer => x.intValue() != 0; case _ => false
          })
        if (!isDelete) {
          if (firstDataPath == null) firstDataPath = p
          else d.put("file_path",
            "foreign://" + firstDataPath.stripPrefix("file:").stripPrefix("/"))
        }
        c
      }
      val np = mPath.stripSuffix(".avro") + s"-collide$i.avro"
      val len = writeAvroRaw(np, mSchema, mMeta, reshaped)
      val cl = copyRecord(listSchema, lr)
      cl.put("manifest_path", np)
      cl.put("manifest_length", len)
      cl
    }
    val newList = listPath.stripSuffix(".avro") + "-collide.avro"
    writeAvroRaw(newList, listSchema, listMeta, newListRecs)
    n.withArray("snapshots").asScala
      .find(_.path("snapshot-id").asLong() ==
        n.path("current-snapshot-id").asLong()).get
      .asInstanceOf[ObjectNode].put("manifest-list", newList)
    writeVersion(table, v + 1, n)

    val e = intercept[IllegalStateException] {
      IcebergSink.read(spark, table).collect()
    }
    assert(e.getMessage.contains("normalize to one path"),
      s"expected the collision refusal, got: ${e.getMessage}")
  }
}
