package graft.etl

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** The Puffin file format (iceberg.apache.org/puffin-spec/): the container
  * Iceberg statistics files point at. Layout:
  *
  * {{{
  *   Magic Blob₁ … Blobₙ Footer
  *   Footer = Magic FooterPayload FooterPayloadSize(4,LE) Flags(4) Magic
  * }}}
  *
  * where FooterPayload is the UTF-8 JSON FileMetadata
  * (`{"blobs":[BlobMetadata…],"properties":{…}}`) and each BlobMetadata
  * carries `type`, `fields` (source field ids), `snapshot-id`,
  * `sequence-number`, `offset`, `length`, `properties`. Flags are all zero
  * here (no footer compression), blobs are stored uncompressed.
  *
  * [[graft.etl.IcebergSink.analyze]] writes one blob per analyzed column
  * under the documented custom type [[NdvBlobType]] (`graft-ndv-json-v1`:
  * a JSON `{"ndv":N,"null-count":M}` payload, with the NDV mirrored in the
  * blob's `ndv` property the way `apache-datasketches-theta-v1` blobs
  * do) — external Puffin readers parse the framing and the per-blob
  * metadata even when they skip the custom payload.
  */
object Puffin {

  val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte) // PFA1
  val NdvBlobType = "graft-ndv-json-v1"

  /** One blob to write / read: metadata plus its raw payload. */
  final case class Blob(blobType: String, fields: Seq[Int], snapshotId: Long,
      sequenceNumber: Long, payload: Array[Byte],
      properties: Map[String, String] = Map.empty)

  /** The serialized file plus its footer length in bytes — the
    * `file-footer-size-in-bytes` a table-metadata `statistics` entry
    * records. */
  final case class Written(bytes: Array[Byte], footerSize: Int)

  private def mapper = new ObjectMapper()

  def write(blobs: Seq[Blob],
      fileProperties: Map[String, String] = Map.empty): Written = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    val located = blobs.map { b =>
      val offset = out.size().toLong
      out.write(b.payload)
      (b, offset)
    }
    val meta = mapper.createObjectNode()
    val arr = meta.putArray("blobs")
    located.foreach { case (b, offset) =>
      val n = arr.addObject()
      n.put("type", b.blobType)
      val f = n.putArray("fields")
      b.fields.foreach(f.add)
      n.put("snapshot-id", b.snapshotId)
      n.put("sequence-number", b.sequenceNumber)
      n.put("offset", offset)
      n.put("length", b.payload.length.toLong)
      if (b.properties.nonEmpty) {
        val p = n.putObject("properties")
        b.properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      }
    }
    if (fileProperties.nonEmpty) {
      val p = meta.putObject("properties")
      fileProperties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    }
    val payload = mapper.writeValueAsBytes(meta)
    val footerStart = out.size()
    out.write(Magic)
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.putInt(0) // flags: no footer compression
    out.write(tail.array())
    out.write(Magic)
    Written(out.toByteArray, out.size() - footerStart)
  }

  /** Parse a Puffin file: every blob (metadata + payload) and the file
    * properties. Validates all three magic markers and bounds. */
  def read(bytes: Array[Byte]): (Seq[Blob], Map[String, String]) = {
    require(bytes.length >= 20, s"not a Puffin file: ${bytes.length} bytes")
    def magicAt(off: Int): Boolean =
      Magic.indices.forall(i => bytes(off + i) == Magic(i))
    require(magicAt(0), "bad Puffin head magic")
    require(magicAt(bytes.length - 4), "bad Puffin tail magic")
    val tail = ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    val payloadSize = tail.getInt()
    val flags = tail.getInt()
    require((flags & 1) == 0, "compressed Puffin footer payload unsupported")
    // range-check BEFORE dereferencing: a corrupt/negative size must fail
    // with this diagnostic, not an ArrayIndexOutOfBoundsException inside
    // magicAt. 20 = head magic (4) + footer magic (4) + tail (12).
    require(payloadSize >= 0 && payloadSize <= bytes.length - 20,
      s"bad Puffin footer payload size $payloadSize (file ${bytes.length}B)")
    val payloadStart = bytes.length - 12 - payloadSize
    require(payloadStart >= 8 && magicAt(payloadStart - 4),
      "bad Puffin footer magic")
    val meta = mapper.readTree(
      new String(bytes, payloadStart, payloadSize, StandardCharsets.UTF_8))
    val blobs = meta.path("blobs").elements().asScala.map { n =>
      val off = n.path("offset").asLong()
      val len = n.path("length").asLong()
      // len >= 0 and off <= Int.MaxValue first, so off + len cannot
      // overflow before the region check; in-memory Puffin caps at 2GB
      // (Array[Byte]), so Int casts below are then exact
      require(off >= 4 && len >= 0 && off <= Int.MaxValue &&
          len <= Int.MaxValue && off + len <= payloadStart - 4,
        s"blob [$off,+$len] outside data region")
      Blob(
        n.path("type").asText(),
        n.path("fields").elements().asScala.map(_.asInt()).toSeq,
        n.path("snapshot-id").asLong(),
        n.path("sequence-number").asLong(),
        java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt),
        Option(n.get("properties")).map(_.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty))
    }.toSeq
    val props = Option(meta.get("properties")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
    (blobs, props)
  }
}
