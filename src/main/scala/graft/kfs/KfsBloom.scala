package graft.kfs

import java.nio.ByteBuffer
import java.security.MessageDigest

/** Per-segment key Bloom filter sidecar (`.kfsb`) — the point-lookup path
  * over an object-store log (beyond-reference superset; the reference
  * scans + record-filters key predicates, `server.go` record residuals).
  * A `_key = X` query over 100 TB should open only the segments that can
  * contain X: the writer inserts every non-null record key at flush time,
  * and plan-time discovery probes each candidate segment's sidecar
  * (a few-hundred-KB ranged read, cheap next to decoding the segment)
  * before any segment is opened. A missing/corrupt sidecar keeps the
  * segment — pruning is an optimization, never a correctness gate; the
  * record-level predicate always runs above the scan as a residual.
  *
  * Determinism: double hashing from the two md5 halves of the key bytes
  * (`h1 + i*h2 mod bits`) — no JVM hashCode, no seed, so any engine (or a
  * future non-JVM reader) computes identical membership. ~12 bits/key and
  * 7 probes put the false-positive rate ≈ 0.3%: a false positive costs one
  * wasted segment decode, a miss is impossible.
  */
object KfsBloom {

  val Magic = 0x4B464246 // "KFBF"
  val Version = 1
  val HashCount = 7
  val BitsPerKey = 12

  final case class Bloom(numBits: Int, words: Array[Long]) {
    def contains(key: Array[Byte]): Boolean = {
      val (h1, h2) = KfsBloom.hash(key)
      var i = 0
      while (i < HashCount) {
        val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
        if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  private def hash(key: Array[Byte]): (Long, Long) = {
    val d = MessageDigest.getInstance("MD5").digest(key)
    val buf = ByteBuffer.wrap(d)
    val h1 = buf.getLong
    val h2 = buf.getLong | 1L // odd, so probe strides cover the bit space
    (h1, h2)
  }

  /** Bits for `n` expected keys, rounded up to a whole word. */
  def bitsFor(n: Int): Int = {
    val raw = math.max(64L, n.toLong * BitsPerKey)
    math.min(((raw + 63) >>> 6) << 6, 1L << 30).toInt
  }

  def build(keys: Iterator[Array[Byte]], expected: Int): Bloom = {
    val numBits = bitsFor(expected)
    val words = new Array[Long](numBits >>> 6)
    keys.foreach { key =>
      if (key != null) {
        val (h1, h2) = hash(key)
        var i = 0
        while (i < HashCount) {
          val bit =
            java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
          words(bit >>> 6) |= 1L << (bit & 63)
          i += 1
        }
      }
    }
    Bloom(numBits, words)
  }

  /** Sidecar bytes: magic, version, numBits, hashCount, then the words. */
  def serialize(b: Bloom): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + b.words.length * 8)
    buf.putInt(Magic).putInt(Version).putInt(b.numBits).putInt(HashCount)
    b.words.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Option[Bloom] = {
    if (bytes.length < 16) return None
    val buf = ByteBuffer.wrap(bytes)
    if (buf.getInt() != Magic) return None
    if (buf.getInt() != Version) return None
    val numBits = buf.getInt()
    val k = buf.getInt()
    if (k != HashCount || numBits <= 0 ||
      bytes.length < 16 + (numBits >>> 6) * 8) return None
    val words = new Array[Long](numBits >>> 6)
    var i = 0
    while (i < words.length) { words(i) = buf.getLong(); i += 1 }
    Some(Bloom(numBits, words))
  }
}
