package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{IcebergSink, Puffin}

/** External-reader conformance: GOLDEN structural fixtures for every
  * metadata artifact the Iceberg writer emits — the v2 metadata JSON, the
  * manifest list, the manifest (entry struct ids 500-519 / 0-4 /
  * 100-136), and the Puffin statistics file. The golden layouts are
  * pinned as literals from the PUBLIC spec (iceberg.apache.org/spec/,
  * /puffin-spec/), so any drift in field ids, names, or framing fails
  * here instead of surfacing in an external engine.
  */
class IcebergConformanceSpec extends AnyFunSuite {
  import TestSpark._

  /** One fully-featured table: partitioned (identity + bucket), clustered
    * (declares a sort order), analyzed (statistics entry + Puffin file). */
  private lazy val table: String = {
    import spark.implicits._
    val t = Files.createTempDirectory("iceberg_conform").toString + "/t"
    IcebergSink.append(spark, t,
      (1L to 40L).map(i => (i, s"g${i % 3}", i.toInt * 10))
        .toDF("id", "grp", "qty"),
      partitionBy = Seq("grp", "bucket(4, id)"), clusterBy = Seq("id"))
    IcebergSink.analyze(spark, t)
    t
  }

  private def meta = IcebergSink.load(spark, table).get

  private def metaJsonNode = {
    val json = new String(Files.readAllBytes(Paths.get(table, "metadata",
      s"v${meta.version}.metadata.json")), "UTF-8")
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
  }

  test("golden: v2 metadata JSON carries every spec-required key") {
    val n = metaJsonNode
    // golden key set (spec: Table Metadata fields, v2 required)
    val requiredTopLevel = Seq(
      "format-version", "table-uuid", "location", "last-sequence-number",
      "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
      "partition-specs", "default-spec-id", "last-partition-id",
      "sort-orders", "default-sort-order-id", "properties",
      "current-snapshot-id", "snapshots", "snapshot-log", "metadata-log")
    val missing = requiredTopLevel.filterNot(n.has)
    assert(missing.isEmpty, s"metadata JSON lost spec keys: $missing")
    assert(n.path("format-version").asInt() == 2)

    // schemas: struct type, schema-id, fields with id/name/required/type
    val schema0 = n.path("schemas").get(0)
    assert(schema0.path("type").asText() == "struct")
    assert(schema0.has("schema-id"))
    val f0 = schema0.path("fields").get(0)
    assert(Seq("id", "name", "required", "type").forall(f0.has))

    // partition-specs: spec-id + fields(name, transform, source-id,
    // field-id >= 1000); the bucket transform spelled bucket[N]
    val spec = n.path("partition-specs").get(0)
    assert(spec.has("spec-id"))
    val pfs = spec.path("fields").elements().asScala.toSeq
    assert(pfs.map(_.path("name").asText()) == Seq("grp", "id_bucket"))
    assert(pfs.map(_.path("transform").asText()) ==
      Seq("identity", "bucket[4]"))
    assert(pfs.forall(_.path("field-id").asInt() >= 1000))
    assert(n.path("last-partition-id").asInt() ==
      pfs.map(_.path("field-id").asInt()).max)

    // sort-orders: order-id + fields(transform, source-id, direction,
    // null-order) — order 0 (unsorted) always present, order 1 = the
    // clusterBy declaration
    val orders = n.path("sort-orders").elements().asScala.toSeq
    assert(orders.map(_.path("order-id").asInt()) == Seq(0, 1))
    val sf = orders(1).path("fields").get(0)
    assert(Seq("transform", "source-id", "direction", "null-order")
      .forall(sf.has))
    assert(n.path("default-sort-order-id").asInt() == 1)

    // snapshots: snapshot-id, sequence-number, timestamp-ms,
    // manifest-list, summary.operation
    val snap = n.path("snapshots").get(0)
    assert(Seq("snapshot-id", "sequence-number", "timestamp-ms",
      "manifest-list", "summary").forall(snap.has))
    assert(snap.path("summary").path("operation").asText() == "append")
  }

  test("golden: statistics entry is spec-complete and points at Puffin") {
    val n = metaJsonNode
    val st = n.path("statistics").get(0)
    // spec: Table statistics — all five fields external readers key on
    val required = Seq("snapshot-id", "statistics-path",
      "file-size-in-bytes", "file-footer-size-in-bytes", "blob-metadata")
    val missing = required.filterNot(st.has)
    assert(missing.isEmpty, s"statistics entry lost spec keys: $missing")
    assert(st.path("snapshot-id").asLong() == meta.currentSnapshotId.get)
    assert(st.path("file-footer-size-in-bytes").asLong() > 0)
    // blob metadata: type, snapshot-id, sequence-number, fields,
    // properties — one blob per analyzed column, NDV mirrored into
    // properties (the theta-blob convention)
    val blobs = st.path("blob-metadata").elements().asScala.toSeq
    assert(blobs.size == 3) // id, grp, qty
    blobs.foreach { b =>
      assert(Seq("type", "snapshot-id", "sequence-number", "fields",
        "properties").forall(b.has), s"blob lost keys: $b")
      assert(b.path("type").asText() == Puffin.NdvBlobType)
      assert(b.path("properties").has("ndv"))
    }
    assert(blobs.flatMap(_.path("fields").elements().asScala)
      .map(_.asInt()).sorted == Seq(1, 2, 3))
  }

  test("golden: manifest list Avro schema matches spec ids 500-517") {
    val snap = meta.snapshots.find(
      _.snapshotId == meta.currentSnapshotId.get).get
    val (listMeta, entries) = IcebergSink.readAvro(spark, snap.manifestList)
    assert(listMeta("format-version") == "2")
    val got = entries.head.getSchema.getFields.asScala
      .map(f => (f.name(), Option(f.getObjectProp("field-id"))
        .fold(-1)(_.toString.toInt))).toSeq
    // GOLDEN (spec: Manifest Lists — manifest_file struct)
    val golden = Seq(
      "manifest_path" -> 500, "manifest_length" -> 501,
      "partition_spec_id" -> 502, "content" -> 517,
      "sequence_number" -> 515, "min_sequence_number" -> 516,
      "added_snapshot_id" -> 503, "added_files_count" -> 504,
      "existing_files_count" -> 505, "deleted_files_count" -> 506,
      "added_rows_count" -> 512, "existing_rows_count" -> 513,
      "deleted_rows_count" -> 514)
    assert(got == golden, s"manifest_file drifted from spec: $got")
  }

  test("golden: manifest entry Avro schema matches spec ids 0-4/100-136") {
    val snap = meta.snapshots.find(
      _.snapshotId == meta.currentSnapshotId.get).get
    val (_, listEntries) = IcebergSink.readAvro(spark, snap.manifestList)
    val (mMeta, mEntries) = IcebergSink.readAvro(spark,
      listEntries.head.get("manifest_path").toString)
    // manifest key/value metadata the spec requires
    assert(Seq("schema", "partition-spec", "partition-spec-id",
      "format-version", "content").forall(mMeta.contains))
    val entry = mEntries.head.getSchema
    def fid(s: org.apache.avro.Schema, name: String): Int =
      Option(s.getField(name).getObjectProp("field-id"))
        .fold(-1)(_.toString.toInt)
    // GOLDEN (spec: Manifests — manifest_entry struct)
    assert(Seq("status", "snapshot_id", "sequence_number",
      "file_sequence_number", "data_file").map(fid(entry, _)) ==
      Seq(0, 1, 3, 4, 2))
    val df = {
      val s = entry.getField("data_file").schema()
      if (s.getType == org.apache.avro.Schema.Type.UNION)
        s.getTypes.asScala.find(
          _.getType != org.apache.avro.Schema.Type.NULL).get
      else s
    }
    // GOLDEN (spec: data_file struct)
    assert(Seq("content", "file_path", "file_format", "partition",
      "record_count", "file_size_in_bytes", "lower_bounds", "upper_bounds",
      "equality_ids").map(fid(df, _)) ==
      Seq(134, 100, 101, 102, 103, 104, 125, 128, 135))
    // partition struct (r102): field names = partition names, ids 1000+
    val part = df.getField("partition").schema()
    val partGot = part.getFields.asScala
      .map(f => (f.name(), Option(f.getObjectProp("field-id"))
        .fold(-1)(_.toString.toInt))).toSeq
    assert(partGot.map(_._1) == Seq("grp", "id_bucket"))
    assert(partGot.forall(_._2 >= 1000))
    // bounds kv structs carry spec ids 126/127 and 129/130
    def itemSchema(name: String) = df.getField(name).schema()
      .getTypes.asScala.find(
        _.getType != org.apache.avro.Schema.Type.NULL).get.getElementType
    assert(fid(itemSchema("lower_bounds"), "key") == 126 &&
      fid(itemSchema("lower_bounds"), "value") == 127)
    assert(fid(itemSchema("upper_bounds"), "key") == 129 &&
      fid(itemSchema("upper_bounds"), "value") == 130)
  }

  test("golden: statistics file is framed as spec Puffin") {
    val st = meta.statistics.head
    val bytes = Files.readAllBytes(Paths.get(
      new java.net.URI(st.path).getPath match {
        case "" => st.path
        case p => p
      }))
    // magic at offsets 0, footerStart, len-4 (spec: Puffin file structure)
    val magic = "PFA1".getBytes("UTF-8").toSeq
    assert(bytes.take(4).toSeq == magic, "head magic")
    assert(bytes.takeRight(4).toSeq == magic, "tail magic")
    val footerStart = bytes.length - st.fileFooterSizeBytes.toInt
    assert(bytes.slice(footerStart, footerStart + 4).toSeq == magic,
      "footer magic")
    // recorded sizes match the file
    assert(st.fileSizeBytes == bytes.length.toLong)
    // FooterPayloadSize is little-endian at len-12; flags uncompressed
    val tail = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt()
    assert(tail.getInt() == 0, "flags must be 0 (no compression)")
    assert(footerStart + 4 + payloadSize + 12 == bytes.length,
      "footer layout: Magic payload size(4) flags(4) Magic")
    // the parser round-trips it and the blobs match the metadata entry
    val (blobs, props) = Puffin.read(bytes)
    assert(props.get("row-count").contains("40"))
    assert(blobs.map(b => (b.blobType, b.fields, b.snapshotId)) ==
      st.blobMeta.map(b => (b.blobType, b.fields, b.snapshotId)))
    // id is unique 1..40: its blob's ndv property must sit inside the
    // HLL++ default error band (rsd 0.05)
    val idBlob = blobs.find(_.fields == Seq(1)).get
    val idNdv = idBlob.properties("ndv").toLong
    assert(idNdv >= 36 && idNdv <= 44, s"id ndv $idNdv outside HLL band")
  }

  test("tableStats reads back through the Puffin chain") {
    val stats = IcebergSink.tableStats(spark, table).get
    assert(stats.rowCount == 40)
    assert(stats.columns.keySet == Set("id", "grp", "qty"))
    assert(stats.columns("id").ndv >= 36 && stats.columns("id").ndv <= 44)
    assert(stats.columns("grp").ndv == 3)
    assert(stats.columns.values.forall(_.nullCount == 0))
  }
}
