package graft.kfs

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}

/** Admin-config introspection/mutation for topic estates — the data half
  * of the reference's Kafka admin config APIs (`kafscale-spec.md:185-208`:
  * DescribeConfigs key 32, AlterConfigs key 33), re-expressed over the
  * estate filesystem instead of etcd:
  *
  *   - per-topic overrides live in `<root>/<topic>/config.json` (the
  *     `TopicConfig` record the reference keeps in its metadata store);
  *   - [[describe]] mirrors `topicConfigEntries` (`cmd/broker/main.go:
  *     1593-1604`): the three mutable topic keys with the reference's
  *     normalization — unset retention reads as `-1`/default
  *     (`normalizeRetention`, `main.go:1660-1665`), unset segment.bytes
  *     falls back to the broker default and reads as default
  *     (`normalizeSegmentBytes`, `main.go:1667-1672`);
  *   - [[describeBroker]] mirrors `brokerConfigEntries` (`main.go:
  *     1606-1618`): read-only engine-level entries;
  *   - [[alter]] mirrors `handleAlterConfigs` (`main.go:1424-1500`):
  *     whitelist {retention.ms, retention.bytes, segment.bytes}, retention
  *     accepts `>= 0` or the `-1` sentinel, segment.bytes must be `> 0`,
  *     anything else is INVALID_CONFIG — with `validateOnly` skipping the
  *     write exactly like the protocol flag.
  *
  * Everything is driver-side metadata IO (one tiny JSON per topic); at
  * 100 TB this surface never touches segment bytes.
  */
object TopicConfigs {

  val RetentionMs = "retention.ms" // main.go:1276
  val RetentionBytes = "retention.bytes"
  val SegmentBytes = "segment.bytes"
  /** AlterConfigs whitelist (main.go:1470-1489). */
  val Alterable: Set[String] = Set(RetentionMs, RetentionBytes, SegmentBytes)
  /** Broker default for segment.bytes (KAFSCALE_SEGMENT_BYTES default,
    * main.go:2052). */
  val DefaultSegmentBytes: Long = 4L << 20

  final class InvalidConfigException(msg: String)
      extends IllegalArgumentException(msg)

  /** One DescribeConfigs entry (DescribeConfigsResponseResourceConfig). */
  final case class ConfigEntry(name: String, value: String,
      isDefault: Boolean, readOnly: Boolean, source: String,
      configType: String)

  private def configPath(root: String, topic: String): HPath =
    new HPath(new HPath(root, topic), "config.json")

  /** Stored per-topic overrides; absent file = all defaults. */
  // short-TTL memo: every catalog loadTable reads the config, which on an
  // object store is an exists() probe + a GET per query per table even
  // though configs almost never change — the same per-query metadata-IO
  // class KfsLayout's TTL-cached listings exist for. Bounded like
  // KfsLayout's statsCache (LRU, removeEldestEntry); mutators write
  // through or evict, and a loader may only publish over the entry it
  // observed at start, so a concurrent alter's fresher value is never
  // clobbered by a stale load. Cross-JVM writers are still only
  // TTL-visible — read-modify-write callers must use `fresh = true`.
  private val fetchTtlMs = 5000L
  private val fetchMemo =
    new java.util.LinkedHashMap[(String, String), (Long, Map[String, Long])](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), (Long, Map[String, Long])])
          : Boolean = size() > 10000
    }

  // global eviction stamp: memoEvict bumps it, and a loader may only
  // publish if NO evict (for any key) intervened since it observed the
  // memo. Plain removal is not enough — an in-flight loader that observed
  // seen=None would republish the dead/old topic's config right after the
  // evict (drop/rename would then serve stale overrides for up to the
  // TTL). A single global counter instead of a per-key map: a bounded
  // per-key map reintroduces the race when the key's generation entry is
  // LRU-evicted mid-load (gen reads None both times), and an unbounded one
  // leaks. Discarding a publish on ANY concurrent evict is conservative —
  // the load still returns correct data, it just skips the memo — and
  // config mutations (topic DDL) are rare enough that the false-discard
  // rate is noise.
  private val evictStamp = new java.util.concurrent.atomic.AtomicLong(0L)

  private[kfs] def memoEvict(root: String, topic: String): Unit =
    fetchMemo.synchronized {
      fetchMemo.remove((root, topic))
      evictStamp.incrementAndGet()
      ()
    }

  def fetch(root: String, topic: String, fresh: Boolean = false)
      : Map[String, Long] = {
    val key = (root, topic)
    val now = System.currentTimeMillis()
    val (seen, stampAtStart) = fetchMemo.synchronized(
      (Option(fetchMemo.get(key)), evictStamp.get()))
    seen match {
      case Some(hit) if !fresh && now - hit._1 < fetchTtlMs => return hit._2
      case _ =>
    }
    val p = configPath(root, topic)
    val f = p.getFileSystem(KfsLayout.hadoopConf)
    val loaded =
      if (!f.exists(p)) Map.empty[String, Long]
      else {
        val in = f.open(p)
        val json =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            StandardCharsets.UTF_8)
          finally in.close()
        val node =
          new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
        Alterable.flatMap { k =>
          Option(node.get(k)).map(v => k -> v.asLong())
        }.toMap
      }
    fetchMemo.synchronized {
      // publish only over the entry observed at load start AND only if no
      // memoEvict intervened: if a writer (alter/drop/rename) acted, its
      // view wins and this load's publish is discarded
      if (Option(fetchMemo.get(key)) == seen &&
          evictStamp.get() == stampAtStart)
        fetchMemo.put(key, (now, loaded))
    }
    loaded
  }

  /** DescribeConfigs for a topic resource: the three mutable entries with
    * reference normalization; `names` (ConfigNames) filters when non-empty. */
  def describe(root: String, topic: String, names: Seq[String] = Nil,
      brokerSegmentBytes: Long = DefaultSegmentBytes): Seq[ConfigEntry] = {
    val stored = fetch(root, topic)
    def retention(key: String): ConfigEntry = {
      // normalizeRetention: unset/0 -> the -1 infinite sentinel, default
      val v = stored.get(key).filter(_ != 0L).getOrElse(-1L)
      ConfigEntry(key, v.toString, isDefault = v == -1L, readOnly = false,
        source = if (v == -1L) "DEFAULT_CONFIG" else "DYNAMIC_TOPIC_CONFIG",
        configType = "LONG")
    }
    val seg = {
      // normalizeSegmentBytes: unset/<=0 -> broker default, default
      val v = stored.get(SegmentBytes).filter(_ > 0L)
      ConfigEntry(SegmentBytes,
        v.getOrElse(brokerSegmentBytes).toString,
        isDefault = v.isEmpty, readOnly = false,
        source = if (v.isEmpty) "DEFAULT_CONFIG" else "DYNAMIC_TOPIC_CONFIG",
        configType = "INT")
    }
    val all = Seq(retention(RetentionMs), retention(RetentionBytes), seg)
    if (names.isEmpty) all else all.filter(e => names.contains(e.name))
  }

  /** Broker-resource DescribeConfigs analog: read-only engine-level
    * entries (the subset with a data-plane meaning here). */
  def describeBroker(root: String, names: Seq[String] = Nil,
      brokerSegmentBytes: Long = DefaultSegmentBytes): Seq[ConfigEntry] = {
    val all = Seq(
      ConfigEntry("kfs.root", root, isDefault = true, readOnly = true,
        "STATIC_BROKER_CONFIG", "STRING"),
      ConfigEntry("kafscale.segment.bytes", brokerSegmentBytes.toString,
        isDefault = true, readOnly = true, "STATIC_BROKER_CONFIG", "INT"))
    if (names.isEmpty) all else all.filter(e => names.contains(e.name))
  }

  /** AlterConfigs for a topic resource. Reference semantics: the FULL
    * entry set replaces the stored config (AlterConfigs is a replace, not
    * an incremental patch), validation errors reject the whole resource,
    * `validateOnly` runs every check but writes nothing. */
  def alter(root: String, topic: String, entries: Map[String, String],
      validateOnly: Boolean = false): Unit = {
    val parsed = entries.map { case (name, value) =>
      if (!Alterable.contains(name))
        throw new InvalidConfigException(s"invalid config: unknown key '$name'")
      val v =
        try value.trim.toLong
        catch {
          case _: NumberFormatException =>
            throw new InvalidConfigException(
              s"invalid config: $name expects an integer, got '$value'")
        }
      name match {
        case RetentionMs | RetentionBytes =>
          if (v < 0 && v != -1L)
            throw new InvalidConfigException(
              s"invalid config: $name must be >= 0 or -1, got $v")
        case SegmentBytes =>
          if (v <= 0)
            throw new InvalidConfigException(
              s"invalid config: $name must be > 0, got $v")
      }
      name -> v
    }
    // the resource check runs in BOTH modes — a dry run that green-lights
    // an unknown topic defeats the point of validateOnly
    val p = configPath(root, topic)
    val f = p.getFileSystem(KfsLayout.hadoopConf)
    if (!f.exists(p.getParent))
      throw new IllegalArgumentException(s"unknown topic '$topic' under $root")
    if (validateOnly) return
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    parsed.foreach { case (k, v) => node.put(k, v) }
    // atomic replace: write-temp + OVERWRITING rename (FileContext honors
    // Options.Rename.OVERWRITE as a single atomic step on posix/HDFS).
    // The delete-then-rename alternative has a crash window with NO config
    // file present — a crash there would silently revert every override to
    // defaults.
    val tmp = new HPath(p.getParent,
      s".config-${java.util.UUID.randomUUID()}.tmp.json")
    val out = f.create(tmp, true)
    try out.write(mapper.writeValueAsString(node)
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try org.apache.hadoop.fs.FileContext
      .getFileContext(p.toUri, KfsLayout.hadoopConf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case e: java.io.IOException =>
      f.delete(tmp, false)
      throw new IllegalStateException(s"config commit failed for $topic", e)
    }
    // write-through (not just evict): an in-flight stale load can no
    // longer reinstate the old value, because loaders only publish over
    // the entry they observed before reading
    fetchMemo.synchronized {
      fetchMemo.put((root, topic),
        (System.currentTimeMillis(), parsed.toMap)); ()
    }
  }
}
