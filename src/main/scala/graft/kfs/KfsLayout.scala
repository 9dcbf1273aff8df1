package graft.kfs

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** On-disk layout, discovery, and sidecar builders for KFS segment logs —
  * clean-room equivalents of the reference's discovery subsystem:
  *
  *   - `{root}/{topic}/{partition}/segment-{base %020d}.kfs` layout
  *     (`kafscale-spec.md:74-83`)
  *   - completeness gating on the trailing `END!` footer magic, checked by
  *     reading only the last 4 bytes (`discovery/discovery.go:202-228`)
  *   - `.kfst` time-index sidecar: 40-byte footer (magic `KFTF`, version,
  *     minTs, maxTs, minOffset, maxOffset) for time pruning
  *     (`discovery/time_index.go:32-49`)
  *   - `manifest.json` per partition with per-segment stats, replacing LIST
  *     storms (`discovery/manifest.go:50-66`)
  *
  * Discovery is driver-side metadata work (like Spark's own FileIndex);
  * decode is executor-side. At 100 TB the manifest path is the one that
  * scales — a single small JSON read per partition instead of object-store
  * LIST calls.
  */
object KfsLayout {

  val TimeIndexMagic = 0x4B465446 // "KFTF"

  final case class SegmentRef(
      topic: String,
      partition: Int,
      path: String,
      baseOffset: Long,
      lastOffset: Long,
      minTsMs: Long,
      maxTsMs: Long,
      sizeBytes: Long)

  def segmentFileName(baseOffset: Long): String = f"segment-$baseOffset%020d.kfs"

  // ---- write ------------------------------------------------------------

  /** Write one segment + `.kfst` sidecar; returns its ref. Topic names may
    * not contain quotes or backslashes — the streaming-offset checkpoint
    * JSON ([[KfsStreamOffset]]) embeds them unescaped (the reference's
    * Kafka-topic charset `[a-zA-Z0-9._-]` is stricter still). */
  def writeSegment(
      root: String, topic: String, partition: Int,
      records: Seq[KfsCodec.Record]): SegmentRef = {
    require(!topic.exists(c => c == '"' || c == '\\'),
      s"topic name must not contain quotes or backslashes: $topic")
    val dir = Paths.get(root, topic, partition.toString)
    Files.createDirectories(dir)
    val base = records.head.offset
    val seg = KfsCodec.buildSegment(records)
    val p = dir.resolve(segmentFileName(base))
    val minTs = records.map(_.timestampMs).min
    val maxTs = records.map(_.timestampMs).max
    // Sidecar first, then temp-write + atomic rename of the .kfs itself: a
    // reader (batch discovery or the file stream, which globs *.kfs) can
    // never observe a truncated segment — the END! footer gate holds on
    // every read path because the file only appears once fully written.
    writeTimeIndex(p, minTs, maxTs, base, records.last.offset)
    val tmp = dir.resolve(segmentFileName(base) + ".tmp")
    Files.write(tmp, seg)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    SegmentRef(topic, partition, p.toString, base, records.last.offset,
      minTs, maxTs, seg.length.toLong)
  }

  /** 40-byte `.kfst` footer: magic, version i32, minTs, maxTs, minOffset,
    * maxOffset (time_index.go:32-49 shape). */
  def writeTimeIndex(segmentPath: Path, minTs: Long, maxTs: Long,
      minOff: Long, maxOff: Long): Unit = {
    val buf = ByteBuffer.allocate(40)
    buf.putInt(TimeIndexMagic).putInt(1)
      .putLong(minTs).putLong(maxTs).putLong(minOff).putLong(maxOff)
    Files.write(Paths.get(segmentPath.toString + ".kfst"), buf.array())
  }

  def readTimeIndex(segmentPath: String): Option[(Long, Long, Long, Long)] = {
    val p = Paths.get(segmentPath + ".kfst")
    if (!Files.exists(p)) None
    else {
      val buf = ByteBuffer.wrap(Files.readAllBytes(p))
      if (buf.remaining() != 40 || buf.getInt() != TimeIndexMagic) None
      else {
        buf.getInt() // version
        Some((buf.getLong(), buf.getLong(), buf.getLong(), buf.getLong()))
      }
    }
  }

  /** Write `manifest.json` for a topic/partition from its segment refs. */
  def writeManifest(root: String, topic: String, partition: Int,
      refs: Seq[SegmentRef]): Unit = {
    val entries = refs.sortBy(_.baseOffset).map { r =>
      s"""{"path":"${r.path}","base_offset":${r.baseOffset},"last_offset":${r.lastOffset},""" +
        s""""min_ts_ms":${r.minTsMs},"max_ts_ms":${r.maxTsMs},"size_bytes":${r.sizeBytes}}"""
    }
    val json = s"""{"topic":"$topic","partition":$partition,"segments":[${entries.mkString(",")}]}"""
    Files.write(Paths.get(root, topic, partition.toString, "manifest.json"),
      json.getBytes(StandardCharsets.UTF_8))
  }

  // ---- discovery --------------------------------------------------------

  /** TTL discovery cache (X13, `discovery.go:243-286`): listing an
    * object-store prefix per query is the reference's known hot spot; a
    * short TTL amortizes it across queries without hiding new segments for
    * long. Keyed by (root, topics, partitions). */
  @volatile var discoveryTtlMs: Long = 5000
  private val discoveryCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Seq[SegmentRef])]()

  def listCompletedCached(root: String, topics: Option[Set[String]] = None,
      partitions: Option[Set[Int]] = None): Seq[SegmentRef] = {
    val key = s"$root|${topics.map(_.toSeq.sorted)}|${partitions.map(_.toSeq.sorted)}"
    val now = System.currentTimeMillis()
    val hit = discoveryCache.get(key)
    if (hit != null && now - hit._1 <= discoveryTtlMs) hit._2
    else {
      val refs = listCompleted(root, topics, partitions)
      discoveryCache.put(key, (now, refs))
      refs
    }
  }

  /** List completed segments under root, newest metadata from `.kfst`
    * sidecars when present. Completeness = footer magic via 4-byte tail read.
    * Ordered (topic, partition, baseOffset) — the reference's scan order
    * (`discovery.go:178-186`). */
  def listCompleted(root: String, topics: Option[Set[String]] = None,
      partitions: Option[Set[Int]] = None): Seq[SegmentRef] = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Nil
    val out = Files.walk(rootPath).iterator().asScala
      .filter(p => p.toString.endsWith(".kfs"))
      .flatMap { p =>
        val rel = rootPath.relativize(p)
        if (rel.getNameCount != 3) None
        else {
          val topic = rel.getName(0).toString
          val partition = rel.getName(1).toString.toInt
          if (topics.exists(!_.contains(topic)) ||
            partitions.exists(!_.contains(partition))) None
          else if (!tailIsComplete(p)) None
          else {
            val size = Files.size(p)
            val (minTs, maxTs, minOff, maxOff) = readTimeIndex(p.toString)
              .getOrElse {
                // fall back to full header+footer read
                val buf = Files.readAllBytes(p)
                val info = KfsCodec.segmentInfo(buf)
                (Long.MinValue, Long.MaxValue, info.baseOffset, info.lastOffset)
              }
            Some(SegmentRef(topic, partition, p.toString, minOff, maxOff,
              minTs, maxTs, size))
          }
        }
      }.toSeq
    out.sortBy(r => (r.topic, r.partition, r.baseOffset))
  }

  /** Read the last 4 bytes only — mirrors the ranged-GET completeness check. */
  private def tailIsComplete(p: Path): Boolean = {
    val ch = Files.newByteChannel(p, StandardOpenOption.READ)
    try {
      val size = ch.size()
      if (size < 4) return false
      ch.position(size - 4)
      val buf = ByteBuffer.allocate(4)
      ch.read(buf)
      KfsCodec.isComplete(buf.array())
    } finally ch.close()
  }

  /** Manifest-based discovery with LIST fallback (`manifest.go:68-135`). */
  def listFromManifest(root: String, topic: String, partition: Int): Seq[SegmentRef] = {
    val p = Paths.get(root, topic, partition.toString, "manifest.json")
    if (!Files.exists(p)) listCompleted(root, Some(Set(topic)), Some(Set(partition)))
    else {
      val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      // minimal parser for our own manifest shape
      val entry = """\{"path":"([^"]+)","base_offset":(\d+),"last_offset":(\d+),"min_ts_ms":(-?\d+),"max_ts_ms":(-?\d+),"size_bytes":(\d+)\}""".r
      entry.findAllMatchIn(json).map { m =>
        SegmentRef(topic, partition, m.group(1), m.group(2).toLong,
          m.group(3).toLong, m.group(4).toLong, m.group(5).toLong,
          m.group(6).toLong)
      }.toSeq.sortBy(_.baseOffset)
    }
  }

  /** Prune segment refs by offset range / time range — the reference's
    * `filterSegments` (`server.go:2201-2231`): a segment survives when its
    * [min,max] window intersects the predicate range. */
  def prune(refs: Seq[SegmentRef],
      offsetMin: Option[Long] = None, offsetMax: Option[Long] = None,
      tsMinMs: Option[Long] = None, tsMaxMs: Option[Long] = None): Seq[SegmentRef] =
    refs.filter { r =>
      offsetMin.forall(m => r.lastOffset >= m) &&
        offsetMax.forall(m => r.baseOffset <= m) &&
        tsMinMs.forall(m => r.maxTsMs >= m) &&
        tsMaxMs.forall(m => r.minTsMs <= m)
    }
}
