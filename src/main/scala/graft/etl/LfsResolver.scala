package graft.etl

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LFS claim-check resolution (reference `pkg/lfs/consumer.go:59-91`,
  * envelope `pkg/lfs/envelope.go:25-66`): values carrying a
  * `{"kfs_lfs":1,...}` envelope are replaced by the blob they point at,
  * after SHA-256 verification; non-envelope values pass through.
  *
  * Runs as `mapPartitions`: one blob-store client + one digest instance per
  * partition (connection-heavy work never goes in a per-row UDF). At 100 TB
  * the fetches are the bottleneck — they parallelize with the partition
  * count and hit the object store directly from executors, no driver hop.
  */
object LfsResolver {

  final case class Envelope(bucket: String, key: String, size: Long,
      sha256: String, contentType: String, checksumAlg: String)

  final class LfsChecksumException(msg: String) extends RuntimeException(msg)

  /** Pluggable blob store; the test/local impl reads `root/bucket/key`. */
  trait BlobStore extends Serializable {
    def fetch(bucket: String, key: String): Array[Byte]
    def put(bucket: String, key: String, bytes: Array[Byte]): Unit =
      throw new UnsupportedOperationException("read-only blob store")
  }
  final case class LocalFsBlobStore(root: String) extends BlobStore {
    override def fetch(bucket: String, key: String): Array[Byte] =
      Files.readAllBytes(Paths.get(root, bucket, key))
    override def put(bucket: String, key: String, bytes: Array[Byte]): Unit = {
      val p = Paths.get(root, bucket, key)
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
    }
  }

  /** Object-store blob store over Hadoop `FileSystem` — `root` of
    * `s3a://bucket-ns/prefix`, `hdfs://...` or `file:///...` all behave
    * identically (the reference's LFS blobs live in S3,
    * `pkg/lfs/consumer.go:59-91`). Built driver-side so the serialized
    * Hadoop conf carries the session's `spark.hadoop.*` credentials to
    * executors; each partition opens its own `FileSystem` (Hadoop caches
    * per-scheme instances per JVM, so this is one client per executor, not
    * per row — same economics as the reference's pooled S3 client). */
  final case class HadoopFsBlobStore(root: String,
      conf: graft.kfs.SerializableHadoopConf) extends BlobStore {
    private def pathOf(bucket: String, key: String) =
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, bucket), key)
    override def fetch(bucket: String, key: String): Array[Byte] = {
      val p = pathOf(bucket, key)
      val fs = p.getFileSystem(conf.value)
      val len = fs.getFileStatus(p).getLen
      require(len <= Int.MaxValue, s"LFS blob too large: $p ($len bytes)")
      val buf = new Array[Byte](len.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      buf
    }
    override def put(bucket: String, key: String, bytes: Array[Byte]): Unit = {
      val p = pathOf(bucket, key)
      val fs = p.getFileSystem(conf.value)
      val out = fs.create(p, true)
      try out.write(bytes) finally out.close()
    }
  }
  object HadoopFsBlobStore {
    /** Capture the active session's Hadoop conf (driver-side call). */
    def apply(root: String): HadoopFsBlobStore =
      HadoopFsBlobStore(root,
        new graft.kfs.SerializableHadoopConf(graft.kfs.KfsLayout.hadoopConf))
  }

  /** Produce side (reference `pkg/lfs/producer.go:126-291`): payloads over
    * the threshold are uploaded and replaced by a claim-check envelope;
    * small payloads pass through. The inverse of [[resolve]]. */
  def envelopeJson(bucket: String, key: String, bytes: Array[Byte],
      contentType: String): String =
    s"""{"kfs_lfs":1,"bucket":"$bucket","key":"$key","size":${bytes.length},""" +
      s""""sha256":"${sha256Hex(bytes)}","content_type":"$contentType"}"""

  def produce(store: BlobStore, bucket: String, key: String,
      payload: Array[Byte], thresholdBytes: Int,
      contentType: String = "application/octet-stream"): Array[Byte] = {
    if (payload == null || payload.length <= thresholdBytes) payload
    else {
      store.put(bucket, key, payload)
      envelopeJson(bucket, key, payload, contentType).getBytes("UTF-8")
    }
  }

  /** Detect + parse an envelope; None for ordinary payloads. */
  def parse(value: Array[Byte]): Option[Envelope] = {
    if (value == null || value.isEmpty || value(0) != '{') return None
    val s = new String(value, "UTF-8")
    if (!s.contains("\"kfs_lfs\"")) return None
    try {
      val node = new ObjectMapper().readTree(s)
      if (node.path("kfs_lfs").asInt() != 1) None
      else Some(Envelope(
        node.path("bucket").asText(), node.path("key").asText(),
        node.path("size").asLong(), node.path("sha256").asText(),
        node.path("content_type").asText(),
        // optional override (envelope.go:31-32); the envelope's required
        // digest field is sha256, so that is the default algorithm
        if (node.hasNonNull("checksum_alg")) node.path("checksum_alg").asText()
        else "sha256"))
    } catch { case _: Exception => None }
  }

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Resolve envelopes in `_value`; adds `_lfs_resolved` (bool) and the six
    * LFS metadata columns the sink appends when LFS is on, in the
    * reference's column order (`lfsMetadataColumns`, iceberg.go:682-691:
    * content_type, blob_size, checksum, checksum_alg, bucket, key).
    * Checksum mismatch fails the task (strict mode — matches the reference
    * consumer's error path). */
  def resolve(spark: SparkSession, df: DataFrame, store: BlobStore): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
    val valueIdx = schema.fieldIndex("_value")
    val encoder = org.apache.spark.sql.Encoders.row(
      StructType(schema.fields ++ Seq(
        StructField("_lfs_resolved", BooleanType),
        StructField("lfs_content_type", StringType),
        StructField("lfs_blob_size", LongType),
        StructField("lfs_checksum", StringType),
        StructField("lfs_checksum_alg", StringType),
        StructField("lfs_bucket", StringType),
        StructField("lfs_key", StringType))))
    df.mapPartitions { it =>
      it.map { row =>
        val raw = row.get(valueIdx) match {
          case b: Array[Byte] => b
          case s: String => if (s == null) null else s.getBytes("UTF-8")
          case null => null
        }
        parse(raw) match {
          case None =>
            org.apache.spark.sql.Row.fromSeq(row.toSeq ++
              Seq(false, null, null, null, null, null, null))
          case Some(env) =>
            val blob = store.fetch(env.bucket, env.key)
            val digest = sha256Hex(blob)
            if (digest != env.sha256)
              throw new LfsChecksumException(
                s"sha256 mismatch for ${env.bucket}/${env.key}: got $digest")
            val seq = row.toSeq.updated(valueIdx,
              row.get(valueIdx) match {
                case _: String => new String(blob, "UTF-8")
                case _ => blob
              })
            org.apache.spark.sql.Row.fromSeq(seq ++
              Seq(true, env.contentType, blob.length.toLong, digest,
                env.checksumAlg, env.bucket, env.key))
        }
      }
    }(encoder)
  }
}
