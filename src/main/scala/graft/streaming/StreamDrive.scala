package graft.streaming

import org.apache.spark.sql.SparkSession

/** Pins `spark.sql.shuffle.partitions` narrow for the duration of a
  * BOUNDED stateful streaming drive, restoring the session value after.
  *
  * Why this exists: a stateful micro-batch query keeps one state store
  * (two for a stream-stream join) per shuffle partition, and every
  * micro-batch pays a per-store open/commit round-trip — so a bounded
  * drive that drains a fixture estate over several metered batches at the
  * session default (32 partitions here, hundreds on a real cluster) spends
  * most of its wall-clock on store commits for partitions that hold a
  * handful of rows. Pinning the drive narrow cuts that overhead ~linearly
  * (the e37 left-outer-join drive measured ~3x at 4 partitions) without
  * changing any result: shuffle partitioning never affects WHICH rows a
  * deterministic stateful operator emits, only where they sit.
  *
  * The pin must wrap query START, not just the hot batches: Structured
  * Streaming freezes `spark.sql.shuffle.partitions` into the checkpoint at
  * the first batch and reuses it for the checkpoint's lifetime, so the
  * value at `start()` is the value forever (and conversely, re-driving an
  * existing checkpoint with a different session value is a no-op — the
  * checkpointed width wins).
  *
  * At 100 TB this is a sizing lever, not a constant: a production stream
  * sizes state-store partitions to STATE VOLUME (rate x watermark
  * horizon), not to the batch-analytics shuffle width — the two workloads
  * want different widths in the same session, which is exactly why the
  * pin is scoped to the drive instead of set globally. Callers pass the
  * width their state volume wants; the fixture drives here use the
  * default 4. */
object StreamDrive {

  val DefaultDrivePartitions = 4

  def narrow[T](spark: SparkSession,
      partitions: Int = DefaultDrivePartitions)(body: => T): T = {
    require(partitions > 0, s"drive width must be positive: $partitions")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, partitions.toString)
    try body finally spark.conf.set(key, prev)
  }
}
