package graft.kfs

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}
import scala.util.Try

/** Kafka v2 record-batch compression codecs (attribute bits 0–2 of the
  * batch header — kafka.apache.org/documentation/#recordbatch). This is a
  * SUPERSET of the reference, which rejects every compressed batch
  * (`sql-processor/internal/decoder/decoder.go:198-201`); real Kafka
  * estates run gzip/snappy/lz4/zstd, so the scan path can opt in with
  * `allow_compressed=true` while reference-parity rejection stays the
  * default.
  *
  * Wire framings match what Apache Kafka clients produce, so segments
  * written by a real producer decode and segments we write are readable
  * by Kafka tooling:
  *   - gzip: RFC 1952 stream (JDK `GZIPInput/OutputStream`)
  *   - snappy: xerial framed format (`SnappyInput/OutputStream` — the
  *     snappy-java stream framing Kafka uses)
  *   - lz4: LZ4 Frame format (Kafka's `KafkaLZ4Block*Stream` implements
  *     the public frame spec; lz4-java's `LZ4Frame*Stream` interoperates)
  *   - zstd: zstd frame (zstd-jni streams)
  *
  * Only the records body compresses; the 61-byte batch header (and its
  * offset/timestamp pruning stats) stays plain, so batch-level pruning
  * and per-batch CRC verification work identically on compressed
  * segments. snappy/lz4/zstd live in separate jars (always present under
  * a Spark distribution, but capability-detected anyway so a minimal
  * deployment degrades to a clear error, not NoClassDefFoundError). */
object KfsCompression {

  val None = 0
  val Gzip = 1
  val Snappy = 2
  val Lz4 = 3
  val Zstd = 4

  def name(id: Int): String = id match {
    case None => "none"
    case Gzip => "gzip"
    case Snappy => "snappy"
    case Lz4 => "lz4"
    case Zstd => "zstd"
    case other => s"unknown($other)"
  }

  def forName(s: String): Int = s.toLowerCase match {
    case "none" | "" => None
    case "gzip" => Gzip
    case "snappy" => Snappy
    case "lz4" => Lz4
    case "zstd" => Zstd
    case other => throw new IllegalArgumentException(
      s"unknown compression codec '$other' (none|gzip|snappy|lz4|zstd)")
  }

  private lazy val snappyAvailable =
    Try(Class.forName("org.xerial.snappy.SnappyOutputStream")).isSuccess
  private lazy val lz4Available =
    Try(Class.forName("net.jpountz.lz4.LZ4FrameOutputStream")).isSuccess
  private lazy val zstdAvailable =
    Try(Class.forName("com.github.luben.zstd.ZstdOutputStream")).isSuccess

  def supported(id: Int): Boolean = id match {
    case None | Gzip => true // JDK-native
    case Snappy => snappyAvailable
    case Lz4 => lz4Available
    case Zstd => zstdAvailable
    case _ => false
  }

  private def wrapOut(id: Int, out: OutputStream): OutputStream = id match {
    case Gzip => new java.util.zip.GZIPOutputStream(out)
    case Snappy => new org.xerial.snappy.SnappyOutputStream(out)
    case Lz4 => new net.jpountz.lz4.LZ4FrameOutputStream(out)
    case Zstd => new com.github.luben.zstd.ZstdOutputStream(out)
    case other => throw new IllegalArgumentException(s"codec $other")
  }

  private def wrapIn(id: Int, in: InputStream): InputStream = id match {
    case Gzip => new java.util.zip.GZIPInputStream(in)
    case Snappy => new org.xerial.snappy.SnappyInputStream(in)
    case Lz4 => new net.jpountz.lz4.LZ4FrameInputStream(in)
    case Zstd => new com.github.luben.zstd.ZstdInputStream(in)
    case other => throw new IllegalArgumentException(s"codec $other")
  }

  private def require2(id: Int): Unit =
    if (!supported(id)) throw new KfsCodec.KfsFormatException(
      s"compression codec ${name(id)} not available on this classpath")

  def compress(id: Int, data: Array[Byte]): Array[Byte] =
    if (id == None) data
    else {
      require2(id)
      val bos = new ByteArrayOutputStream(math.max(64, data.length / 4))
      val out = wrapOut(id, bos)
      try out.write(data) finally out.close()
      bos.toByteArray
    }

  /** Decompress an entire compressed records body. `maxLen` bounds the
    * inflated size (a zip-bomb batch on untrusted bytes must fail the
    * format check, not OOM the executor): decode callers pass the batch's
    * plausible record bound. Truncated/corrupt streams surface as
    * [[KfsCodec.KfsFormatException]] so the lenient scan path classifies
    * them as corruption, same as plain-batch damage. */
  def decompress(id: Int, data: Array[Byte], maxLen: Int): Array[Byte] =
    if (id == None) data
    else {
      require2(id)
      try {
        val in = wrapIn(id, new ByteArrayInputStream(data))
        try {
          val bos = new ByteArrayOutputStream(math.min(maxLen, data.length * 4))
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          var total = 0
          while (n > 0) {
            total += n
            if (total > maxLen) throw new KfsCodec.KfsFormatException(
              s"decompressed batch exceeds $maxLen bytes")
            bos.write(buf, 0, n)
            n = in.read(buf)
          }
          bos.toByteArray
        } finally in.close()
      } catch {
        case e: KfsCodec.KfsFormatException => throw e
        case e: java.io.IOException => throw new KfsCodec.KfsFormatException(
          s"corrupt ${name(id)} batch body: ${e.getMessage}")
        // codec-library failure shapes that bypass IOException: zstd-jni
        // runtime exceptions and snappy-java's SnappyError (an Error!) —
        // all mean "these bytes are not a valid stream", i.e. corruption
        case e: RuntimeException if e.getClass.getName.startsWith("com.github.luben.zstd") =>
          throw new KfsCodec.KfsFormatException(
            s"corrupt zstd batch body: ${e.getMessage}")
        case e: Throwable if e.getClass.getName.startsWith("org.xerial.snappy") =>
          throw new KfsCodec.KfsFormatException(
            s"corrupt snappy batch body: ${e.getMessage}")
        case e: RuntimeException if e.getClass.getName.startsWith("net.jpountz.lz4") =>
          throw new KfsCodec.KfsFormatException(
            s"corrupt lz4 batch body: ${e.getMessage}")
      }
    }
}
