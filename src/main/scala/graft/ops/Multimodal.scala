package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY §7.3): media as opaque `binary`
  * columns with typed metadata, features extracted via `mapPartitions`
  * (connection/codec-heavy work belongs in a partition-scoped loop — the
  * Scala analogue of `mapInPandas` batches; one decoder instance per
  * partition, rows streamed through it).
  *
  * All three modality kernels are REAL, pure-JVM: IMAGE decode
  * (`javax.imageio` PNG/JPEG to gray8 pixels, [[ImageIoDecoder]]), AUDIO
  * (RIFF/PCM16 WAV encode + chunk-list parse + RMS/zero-crossing/peak
  * features, [[wavFromBytes]]/[[audioFeatures]]), and VIDEO keyframes
  * (multi-frame animated-GIF decode with stride sampling,
  * [[videoKeyFrames]] — GIF is the only multi-frame container the bare
  * JDK decodes; an ffmpeg-style codec plugs into the identical row shape).
  * The generic `Decoder` seam (with `FakeDecoder`) remains for byte-level
  * plumbing demos ([[frameSample]]/[[resize]] over arbitrary payloads).
  */
object Multimodal {

  /** One media record: id + raw bytes + declared content type. */
  final case class MediaRow(id: Long, media: Array[Byte], content_type: String)

  /** Extracted features. `brightness` stands in for a decoded-image metric
    * (mean byte value) so determinism is testable end to end. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      digest: String,
      head_hex: String,
      brightness: Double,
      content_type: String)

  /** The decode seam: swap for a real codec (javacv / ffmpeg / PIL-equiv)
    * in production. Deterministic fake keeps tests honest. */
  trait Decoder extends Serializable {
    def decode(media: Array[Byte]): Array[Byte]
  }
  object FakeDecoder extends Decoder {
    override def decode(media: Array[Byte]): Array[Byte] = media // identity stub
  }

  /** REAL image decode through the same seam, via pure-JVM `javax.imageio`
    * (PNG/GIF/BMP/JPEG readers ship with the JDK — no native codec needed):
    * decodes to an 8-bit GRAY pixel buffer (row-major, width×height bytes),
    * so every downstream kernel — brightness, stride resize, frame slicing
    * — operates on actual pixels. Color inputs go through the standard
    * AWT gray conversion; non-image bytes decode to EMPTY (the lenient
    * convention: frameSample/resize drop empty rows, extractFeatures emits
    * zero-byte features) rather than failing a 100 TB scan on one bad blob.
    * ImageIO readers are not thread-safe to share, but a fresh read per
    * call is — this object is safely serializable into tasks. */
  object ImageIoDecoder extends Decoder {
    override def decode(media: Array[Byte]): Array[Byte] = {
      if (media == null || media.isEmpty) return Array.emptyByteArray
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
        catch { case _: Exception => null }
      if (img == null) return Array.emptyByteArray
      val gray =
        if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
        else {
          val g = new java.awt.image.BufferedImage(
            img.getWidth, img.getHeight,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gg = g.createGraphics()
          try gg.drawImage(img, 0, 0, null) finally gg.dispose()
          g
        }
      gray.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData.clone()
    }
  }

  /** Deterministic 8-bit gray PNG: pixel(x, y) at flat index i = y·w + x is
    * `((seed·31 + i·7) mod 127) + 1` — values 1..127, so an oracle can
    * reproduce the decoded buffer as ASCII text (single-byte UTF-8) and
    * hash it. PNG gray8 is lossless, so [[ImageIoDecoder]] returns exactly
    * these bytes. */
  def pngFixture(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        raster.setSample(x, y, 0, (((seed * 31 + i * 7) % 127) + 1).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** [[pngFixture]] with a small deterministic perturbation: variant `v`
    * lifts pixels at `i mod 37 == v` by 4 — images sharing a seed are
    * NEAR-duplicates (perceptual-hash hamming 0–1 on 16×16), different
    * seeds are far (≥4). The formula is oracle-reproducible. */
  def pngFixtureVariant(seed: Long, v: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val base = ((seed * 31 + i * 7) % 120) + 1
        raster.setSample(x, y, 0,
          (base + (if (i % 37 == v) 4 else 0)).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Average-hash (aHash) of a w×h gray8 buffer: downsample to 8×8 by
    * block sums, bit = block mean > global mean, row-major 64-char bit
    * string. Pure integer arithmetic (block_sum·(w·h) > total·block_px),
    * so any engine recomputing the pixels reproduces the hash exactly.
    * Returns null for buffers that are not exactly w×h (corrupt media
    * skips, never fails). */
  def aHashBits(decoded: Array[Byte], w: Int, h: Int): String = {
    if (decoded == null || decoded.length != w * h) return null
    val bw = w / 8; val bh = h / 8
    var total = 0L
    var i = 0
    while (i < decoded.length) { total += (decoded(i) & 0xff); i += 1 }
    val sb = new StringBuilder(64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var bs = 0L
        var dy = 0
        while (dy < bh) {
          var dx = 0
          while (dx < bw) {
            bs += (decoded((by * bh + dy) * w + bx * bw + dx) & 0xff)
            dx += 1
          }
          dy += 1
        }
        // block mean > global mean, cross-multiplied to stay integral
        sb.append(if (bs * w * h > total * bw * bh) '1' else '0')
        bx += 1
      }
      by += 1
    }
    sb.toString
  }

  /** Perceptual hashes for a media frame: decode on executors (the same
    * mapPartitions seam as [[extractFeatures]]), aHash in the same pass.
    * Undecodable/mis-sized media yields a null hash (dropped). */
  def imageHashes(spark: SparkSession, media: DataFrame,
      decoder: Decoder, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        Option(aHashBits(decoder.decode(row.media), w, h))
          .map(bits => (row.id, bits))
      }
    }.toDF("id", "ahash")
  }

  /** Near-duplicate images by perceptual hash: 4×16-bit pigeonhole bands
    * generate candidates (hamming ≤ 3 guarantees a clean band — the
    * simhash banding argument), exact hamming verifies via codegen'd
    * conv/xor/bit_count. One shuffle on the band bucket, never image
    * pairs × pixels — pixels never leave the hashing pass. */
  def aHashNearDups(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, s"4x16 banding guarantees recall only to 3: $maxDist")
    val bands = hashes.select(col("id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("ahash"), b * 16 + 1, 16).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("ahash"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val l = bands.select(col("id").as("a"), col("ahash").as("ha"),
      col("band"), col("bucket"))
    val r = bands.select(col("id").as("b"), col("ahash").as("hb"),
      col("band"), col("bucket"))
    def word(c: org.apache.spark.sql.Column, i: Int) =
      conv(substring(c, i * 16 + 1, 16), 2, 10).cast("long")
    val ham = (0 until 4).map(i =>
      bit_count(word(col("ha"), i).bitwiseXOR(word(col("hb"), i))))
      .reduce(_ + _)
    l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", ham.cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Build a media frame from any (id, bytes) source. */
  def asMedia(df: DataFrame, idCol: String, bytesCol: String,
      contentType: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(bytesCol).cast("binary").as("media"),
      lit(contentType).as("content_type"))

  final case class FrameRow(
      id: Long, frame_idx: Int, frame: Array[Byte], frame_digest: String)

  /** Frame sampling: one media row → n evenly-spaced "frames" (UDTF shape,
    * 1→N row explosion inside one narrow stage). The frame *extraction* is
    * the stubbed decode — here a deterministic byte slice standing in for a
    * video keyframe decoder — but the row-explosion plumbing, schema, and
    * per-partition batching are exactly what a real codec plugs into. */
  def frameSample(spark: SparkSession, media: DataFrame, n: Int,
      decoder: Decoder = FakeDecoder): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        val decoded = decoder.decode(row.media)
        if (decoded == null || decoded.isEmpty) Iterator.empty
        else {
          val span = math.max(1, decoded.length / n)
          (0 until math.min(n, decoded.length)).iterator.map { i =>
            val from = i * span
            val frame = java.util.Arrays.copyOfRange(decoded, from,
              math.min(from + span, decoded.length))
            md.reset()
            FrameRow(row.id, i, frame, md.digest(frame).map("%02x".format(_)).mkString)
          }
        }
      }
    }.toDF()
  }

  final case class ResizedRow(
      id: Long, media: Array[Byte], src_bytes: Int, out_bytes: Int)

  /** Resize/resample: decoded media resampled to at most `target` bytes by
    * stride sampling (out[i] = in[i*stride]) — the deterministic stand-in
    * for an image resize kernel; a real codec resize plugs into the same
    * Decoder seam and row shape. Runs in the same narrow mapPartitions
    * stage as decode (no shuffle; one decoder per partition), which is the
    * only shape that survives a 100 TB media scan. */
  def resize(spark: SparkSession, media: DataFrame, target: Int,
      decoder: Decoder = FakeDecoder): DataFrame = {
    require(target > 0, s"resize target must be positive, got $target")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        val decoded = decoder.decode(row.media)
        if (decoded == null || decoded.isEmpty) Iterator.empty
        else {
          val stride = math.max(1, decoded.length / target)
          val nOut = math.min(target, decoded.length)
          val out = Array.tabulate(nOut)(i =>
            decoded(math.min(i * stride, decoded.length - 1)))
          Iterator.single(ResizedRow(row.id, out, decoded.length, nOut))
        }
      }
    }.toDF()
  }

  // ---- video: real multi-frame decode (animated GIF via javax.imageio) --

  /** Deterministic animated 8-bit gray GIF: frame f's pixel at flat index
    * i is `((seed·31 + f·13 + i·7) mod 127) + 1` — values 1..127, so an
    * oracle reproduces each decoded frame as ASCII text and hashes it
    * (same trick as [[pngFixture]]). GIF gray palettes are lossless, so
    * the decode returns exactly these bytes (proved by OpsSpec). */
  def gifFixture(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0,
            (((seed * 31 + f * 13 + i * 7) % 127) + 1).toInt)
          i += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  final case class KeyFrameRow(
      id: Long, frame_idx: Int, n_frames: Int, n_bytes: Long,
      frame_digest: String, brightness: Double)

  /** Deterministic animated GIF with SCENES: a cut lands before every
    * frame f > 0 with `(f + seed) mod 3 == 0`; frames within one scene
    * are IDENTICAL, and a cut re-bases every pixel — frame f's pixel i is
    * `((seed·31 + scene(f)·57 + i·7) mod 127) + 1` with scene(f) = cuts
    * so far. Every pixel (and therefore every frame diff) replays from
    * the formula — the [[gifFixture]] discipline with discontinuities to
    * find. */
  def gifSceneFixture(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var scene = 0L
      var f = 0
      while (f < frames) {
        if (f > 0 && (f + seed) % 3 == 0) scene += 1
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          raster.setSample(i % w, i / w, 0,
            (((seed * 31 + scene * 57 + i * 7) % 127) + 1).toInt)
          i += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** SCENE-CUT SEGMENTATION of an animated container — the shot-boundary
    * step of video corpus prep (sample one frame per SHOT, not per
    * second, before captioning/dedup): consecutive decoded frames score
    * an integer sum-of-absolute-differences over gray pixels; a CUT lands
    * where `sad · thrDen > thrNum · nPixels` (mean |Δ| > thrNum/thrDen,
    * cross-multiplied — engine-exact, no floats), and frames between cuts
    * merge into scenes. Returns (id, scene, start_frame, end_frame,
    * n_frames) — one row per shot.
    *
    * Decode, diffing, thresholding, and the island merge all run IN ROW
    * in one mapPartitions pass (the m12 discipline): a clip's frames
    * never leave their task, so the operator is shuffle-free at any
    * corpus size. Non-GIF / undecodable media skip, never fail the scan. */
  def sceneCuts(spark: SparkSession, media: DataFrame,
      thrNum: Long = 1, thrDen: Long = 2): DataFrame = {
    require(thrNum >= 0 && thrDen > 0, s"bad threshold $thrNum/$thrDen")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        val frames: Seq[Array[Byte]] =
          try {
            if (row.media == null || row.media.isEmpty) Seq.empty
            else {
              val reader =
                javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
              try {
                reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(row.media)))
                val total = reader.getNumImages(true)
                (0 until total).map { idx =>
                  val img = reader.read(idx)
                  val gray =
                    if (img.getType ==
                      java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
                    else {
                      val g = new java.awt.image.BufferedImage(
                        img.getWidth, img.getHeight,
                        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
                      val gg = g.createGraphics()
                      try gg.drawImage(img, 0, 0, null) finally gg.dispose()
                      g
                    }
                  gray.getRaster.getDataBuffer
                    .asInstanceOf[java.awt.image.DataBufferByte].getData.clone()
                }
              } finally reader.dispose()
            }
          } catch { case _: Exception => Seq.empty }
        if (frames.isEmpty || frames.exists(_.length != frames.head.length))
          Iterator.empty
        else {
          val nPix = frames.head.length.toLong
          val out = Seq.newBuilder[(Long, Int, Int, Int, Int)]
          var scene = 0
          var start = 0
          var f = 1
          while (f <= frames.size) {
            val isCut = f < frames.size && {
              var sad = 0L
              var i = 0
              val a = frames(f - 1); val b = frames(f)
              while (i < a.length) {
                sad += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1
              }
              sad * thrDen > thrNum * nPix
            }
            if (isCut || f == frames.size) {
              out += ((row.id, scene, start, f - 1, f - start))
              scene += 1
              start = f
            }
            f += 1
          }
          out.result().iterator
        }
      }
    }.toDF("id", "scene", "start_frame", "end_frame", "n_frames")
  }

  /** REAL video keyframe extraction: parse a multi-frame container
    * (animated GIF — the only multi-frame format the bare JDK decodes),
    * sample `n` evenly-spaced frames (stride = total/n, the same rule as
    * [[frameSample]]'s byte slicing), and decode each sampled frame to an
    * 8-bit gray pixel buffer. One narrow mapPartitions stage, one reader
    * per medium; corrupt/non-animated bytes skip the row, never fail the
    * scan. `frame_idx` is the frame's index IN THE VIDEO (not the sample
    * ordinal), which is what downstream alignment needs. */
  def videoKeyFrames(spark: SparkSession, media: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"keyframe count must be positive, got $n")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { row =>
        val frames =
          try {
            if (row.media == null || row.media.isEmpty) Seq.empty
            else {
              val reader =
                javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
              try {
                reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(row.media)))
                val total = reader.getNumImages(true)
                if (total <= 0) Seq.empty
                else {
                  val span = math.max(1, total / n)
                  (0 until math.min(n, total)).map { s =>
                    val idx = s * span
                    val img = reader.read(idx)
                    val gray =
                      if (img.getType ==
                        java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
                      else {
                        val g = new java.awt.image.BufferedImage(
                          img.getWidth, img.getHeight,
                          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
                        val gg = g.createGraphics()
                        try gg.drawImage(img, 0, 0, null) finally gg.dispose()
                        g
                      }
                    val px = gray.getRaster.getDataBuffer
                      .asInstanceOf[java.awt.image.DataBufferByte].getData
                    (idx, total, px.clone())
                  }
                }
              } finally reader.dispose()
            }
          } catch { case _: Exception => Seq.empty }
        frames.iterator.map { case (idx, total, px) =>
          md.reset()
          val digest = md.digest(px).map("%02x".format(_)).mkString
          val brightness =
            if (px.isEmpty) 0.0
            else px.map(b => (b & 0xff).toLong).sum.toDouble / px.length
          KeyFrameRow(row.id, idx, total, px.length.toLong, digest, brightness)
        }
      }
    }.toDF()
  }

  /** [[gifFixture]] with the image-fixture perturbation per frame: frame f
    * pixel i = ((seed·31 + f·13 + i·7) mod 120) + 1, +4 at i mod 37 == v.
    * Same-seed variants are near-duplicate VIDEOS (every sampled frame's
    * aHash within hamming ≤ 3); different seeds diverge on at least one
    * sampled frame. Formula is oracle-reproducible. */
  def gifFixtureVariant(seed: Long, v: Long, w: Int, h: Int,
      frames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < w * h) {
          val base = ((seed * 31 + f * 13 + i * 7) % 120) + 1
          raster.setSample(i % w, i / w, 0,
            (base + (if (i % 37 == v) 4 else 0)).toInt)
          i += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Per-keyframe perceptual hashes for a video: the [[videoKeyFrames]]
    * sampling rule (n evenly-spaced frames by stride) with [[aHashBits]]
    * computed in the same decode pass — (id, frame_idx, ahash) rows;
    * corrupt media or mis-sized frames skip. Pixels never leave the
    * hashing stage. */
  def videoFingerprints(spark: SparkSession, media: DataFrame, n: Int,
      w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        val frames =
          try {
            if (row.media == null || row.media.isEmpty) Seq.empty
            else {
              val reader =
                javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
              try {
                reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(row.media)))
                val total = reader.getNumImages(true)
                if (total <= 0) Seq.empty
                else {
                  val span = math.max(1, total / n)
                  (0 until math.min(n, total)).flatMap { s =>
                    val idx = s * span
                    val img = reader.read(idx)
                    val gray =
                      if (img.getType ==
                        java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
                      else {
                        val g = new java.awt.image.BufferedImage(
                          img.getWidth, img.getHeight,
                          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
                        val gg = g.createGraphics()
                        try gg.drawImage(img, 0, 0, null) finally gg.dispose()
                        g
                      }
                    val px = gray.getRaster.getDataBuffer
                      .asInstanceOf[java.awt.image.DataBufferByte].getData
                    Option(aHashBits(px, w, h)).map(bits => (idx, bits))
                  }
                }
              } finally reader.dispose()
            }
          } catch { case _: Exception => Seq.empty }
        frames.iterator.map { case (idx, bits) => (row.id, idx, bits) }
      }
    }.toDF("id", "frame_idx", "ahash")
  }

  /** Video near-duplicates: two videos match when EVERY sampled keyframe
    * pair (same frame index) is within `maxDist` hamming — frame-level
    * 4×16-bit banding generates candidates per (frame, band, bucket),
    * codegen'd hamming verifies, and a pair survives only when all
    * commonly-sampled frames matched: `n_matched = min(frames_a,
    * frames_b)`, where the per-video frame counts come from `frameHashes`
    * itself. The min (not the `nFrames` sampling target) keeps recall for
    * videos shorter than the target and for frames a corrupt decode
    * skipped — a fixed `=== nFrames` bar silently unmatches identical
    * short videos. A shorter video thus matches a longer one on their
    * common prefix (truncation is a near-dup). Emits (a, b, max_hamming).
    * Same shuffle economics as [[aHashNearDups]], keyed one level finer;
    * the frame-count side is an aggregate of |videos| rows joined back on
    * id (AQE broadcasts it when small). */
  def videoNearDups(frameHashes: DataFrame, nFrames: Int,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, s"4x16 banding guarantees recall only to 3: $maxDist")
    val bands = frameHashes.select(col("id"), col("frame_idx"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("ahash"), b * 16 + 1, 16).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("frame_idx"), col("ahash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = bands.select(col("frame_idx"), col("band"), col("bucket"),
      col("id").as("a"), col("ahash").as("ha"))
    val r = bands.select(col("frame_idx"), col("band"), col("bucket"),
      col("id").as("b"), col("ahash").as("hb"))
    def word(c: org.apache.spark.sql.Column, i: Int) =
      conv(substring(c, i * 16 + 1, 16), 2, 10).cast("long")
    val ham = (0 until 4).map(i =>
      bit_count(word(col("ha"), i).bitwiseXOR(word(col("hb"), i))))
      .reduce(_ + _)
    val frameCounts = frameHashes.groupBy(col("id"))
      .agg(countDistinct(col("frame_idx")).as("nf"))
    l.join(r, Seq("frame_idx", "band", "bucket")).where(col("a") < col("b"))
      .select(col("frame_idx"), col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", ham.cast("long"))
      .where(col("hamming") <= maxDist)
      .groupBy(col("a"), col("b"))
      .agg(countDistinct(col("frame_idx")).as("n_matched"),
        max(col("hamming")).as("max_hamming"))
      .join(frameCounts.select(col("id").as("a"), col("nf").as("nf_a")), Seq("a"))
      .join(frameCounts.select(col("id").as("b"), col("nf").as("nf_b")), Seq("b"))
      .where(col("n_matched") === least(col("nf_a"), col("nf_b")))
      .select(col("a"), col("b"), col("max_hamming"))
  }

  // ---- audio: real RIFF/PCM16 WAV codec ---------------------------------

  /** Deterministic 16-bit PCM mono WAV from a payload byte-string: sample
    * i = ((payload(i)*37 + i*11) mod 256 − 128) · 256 — varied sign and
    * magnitude, reproducible by any engine from the same bytes (the m5
    * oracle recomputes it from the text characters). The RIFF container
    * is REAL (RIFF/WAVE + fmt + data chunks, little-endian), so
    * [[audioFeatures]] exercises an actual parser, not a stub. */
  def wavFromBytes(payload: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val n = payload.length
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      bb.putShort(((((payload(i) & 0xff) * 37 + i * 11) % 256 - 128) * 256).toShort)
      i += 1
    }
    bb.array()
  }

  /** Deterministic PCM16 WAV with seed/variant structure for fingerprint
    * dedup fixtures: sample i = ((((i·11 + seed·97)·(seed mod 7 + 3))
    * mod 256) − 128)·250, +512 at i mod 97 == v. Same seed ⇒ near-identical
    * energy envelope (fingerprint hamming 0–2); different seeds get a
    * different period structure (≥4). All values fit PCM16; the formula is
    * oracle-reproducible. */
  def wavFixtureVariant(seed: Long, v: Long, n: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    val m = seed % 7 + 3
    var i = 0
    while (i < n) {
      val base = (((i * 11 + seed * 97) * m) % 256 - 128) * 250
      bb.putShort((base + (if (i % 97 == v) 512 else 0)).toShort)
      i += 1
    }
    bb.array()
  }

  /** Acoustic fingerprint of a WAV: 64 equal frames, bit = frame energy >
    * mean frame energy (integer cross-multiplication, engine-exact),
    * row-major 64-char bit string — the energy-envelope shape that
    * audio near-dup detection keys on. Returns null for non-WAV media or
    * streams shorter than 64 samples (corrupt skips). The output feeds
    * the same 4×16-bit banding verifier as the image hash
    * ([[aHashNearDups]]). */
  def audioFingerprint(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        parseWav(row.media).flatMap { case (_, samples) =>
          val fl = samples.length / 64
          if (fl == 0) None
          else {
            val n = fl * 64
            var tot = 0L
            var i = 0
            while (i < n) {
              val s = samples(i).toLong; tot += s * s; i += 1
            }
            val sb = new StringBuilder(64)
            var f = 0
            while (f < 64) {
              var fe = 0L
              var j = 0
              while (j < fl) {
                val s = samples(f * fl + j).toLong; fe += s * s; j += 1
              }
              sb.append(if (fe * 64 > tot) '1' else '0')
              f += 1
            }
            Some((row.id, sb.toString))
          }
        }
      }
    }.toDF("id", "ahash")
  }

  /** Deterministic speech-like WAV: every third 200-sample block is
    * SILENCE (zero samples), the rest carry a seeded integer tone —
    * `s(i) = ((i·13 + seed·31) mod 256 − 128) · 200` — so silence
    * segmentation has real islands to find and the oracle can recompute
    * every sample from the formula (the m8 fixture discipline). */
  def wavSpeechFixture(seed: Long, n: Int,
      sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      val silent = (i / 200 + seed) % 3 == 0
      val s = if (silent) 0L else ((i * 13 + seed * 31) % 256 - 128) * 200
      bb.putShort(s.toShort)
      i += 1
    }
    bb.array()
  }

  /** VAD-style SILENCE SEGMENTATION — the trim-silence step of audio
    * corpus prep: PCM frames of `frameLen` samples score an integer energy
    * Σs²; a frame is SPEECH iff its energy is strictly above the
    * clip-mean frame energy (cross-multiplied `fe·nFrames > total`, the
    * m8 threshold rule — engine-exact, no floats); consecutive speech
    * frames merge into segments. Returns one row per speech segment:
    * (id, seg, start_frame, end_frame, n_frames, energy).
    *
    * Scale shape: decode, framing, thresholding AND the gaps-and-islands
    * merge all happen IN ROW inside one mapPartitions pass — a clip's
    * frames never leave their task, so the operator is shuffle-free at
    * any corpus size (the 100 TB audio estate is embarrassingly parallel
    * here). Non-WAV / too-short media rows skip, like the fingerprint. */
  def speechSegments(spark: SparkSession, media: DataFrame,
      frameLen: Int = 50): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        parseWav(row.media).toSeq.flatMap { case (_, samples) =>
          val nf = samples.length / frameLen
          if (nf == 0) Seq.empty
          else {
            val fe = new Array[Long](nf)
            var tot = 0L
            var f = 0
            while (f < nf) {
              var e = 0L
              var j = 0
              while (j < frameLen) {
                val s = samples(f * frameLen + j).toLong; e += s * s; j += 1
              }
              fe(f) = e; tot += e; f += 1
            }
            val out = Seq.newBuilder[(Long, Int, Int, Int, Int, Long)]
            var seg = 0
            var start = -1
            var segEnergy = 0L
            var i = 0
            while (i <= nf) {
              val speech = i < nf && fe(i) * nf > tot
              if (speech) {
                if (start < 0) { seg += 1; start = i; segEnergy = 0L }
                segEnergy += fe(i)
              } else if (start >= 0) {
                out += ((row.id, seg, start, i - 1, i - start, segEnergy))
                start = -1
              }
              i += 1
            }
            out.result()
          }
        }
      }
    }.toDF("id", "seg", "start_frame", "end_frame", "n_frames", "energy")
  }

  /** Wrap each media row's bytes into a WAV (synthesis stage of the audio
    * path) — same narrow mapPartitions shape as decode. */
  def synthesizeWav(spark: SparkSession, media: DataFrame,
      sampleRate: Int = 8000): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(r => MediaRow(r.id, wavFromBytes(r.media, sampleRate), "audio/wav"))
    }.toDF()
  }

  final case class AudioFeatures(
      id: Long, n_samples: Long, sample_rate: Int, duration_ms: Long,
      rms: Double, zero_crossings: Long, peak: Int)

  /** Real WAV analysis: parse the RIFF chunk list (fmt → rate/bits/
    * channels, data → PCM16 LE samples) and compute the standard audio
    * curation features — RMS energy, zero-crossing rate, peak amplitude,
    * duration. Non-WAV or truncated bytes skip the row (same lenient
    * convention as the image decoder: corrupt media must never fail a
    * 100 TB scan). One narrow mapPartitions stage, no shuffle. */
  def audioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        parseWav(row.media).map { case (rate, samples) =>
          var sumSq = 0L
          var crossings = 0L
          var peak = 0
          var i = 0
          while (i < samples.length) {
            val s = samples(i).toInt
            sumSq += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            // sign(0) counts as positive; a crossing is a sign flip
            if (i > 0 && ((s >= 0) != (samples(i - 1) >= 0))) crossings += 1
            i += 1
          }
          val n = samples.length.toLong
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
          AudioFeatures(row.id, n, rate, n * 1000L / rate, rms, crossings, peak)
        }
      }
    }.toDF()
  }

  /** RIFF/WAVE parser: returns (sampleRate, PCM16 samples) or None for
    * anything that isn't a complete mono PCM16 WAV. */
  /** Deterministic PCM16 "track" with per-frame band texture for landmark
    * fixtures: `s(g) = (((g mod 64)·((g div 64) mod 7 + seed mod 5 + 3) + (g div 64)·(17 +
    * seed mod 11) + seed·29) mod 256 − 128) · 200` at g = i + from — the
    * `from` offset makes a SNIPPET of a track exactly the track's own
    * samples shifted, which is what query-by-snippet matching needs. The
    * in-frame term varies energy across bands, the per-frame DRIFT term
    * moves the argmax band frame to frame at a seed-dependent rate — the
    * (mod 5, mod 11) pair is unique per seed below 55, so no two fixture
    * tracks share a landmark sequence; every sample replays from the
    * formula (the m8 fixture discipline). */
  def wavTrackFixture(seed: Long, n: Int, from: Int = 0,
      sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    var i = 0
    while (i < n) {
      val g = i + from
      val s = ((g % 64) * ((g / 64) % 7 + seed % 5 + 3) +
        (g / 64) * (17 + seed % 11) + seed * 29) % 256
      bb.putShort(((s - 128) * 200).toShort)
      i += 1
    }
    bb.array()
  }

  /** LANDMARK CONSTELLATION of a PCM16 WAV (the Shazam/Chromaprint index
    * shape, Wang 2003): frames of `frameLen` samples split into `bands`
    * equal bands scoring integer energies Σs²; each frame's PEAK is its
    * argmax-energy band (smallest band on ties); a LANDMARK pairs a
    * frame's peak with each of the next `fanout` frames' peaks —
    * (t1, b1, b2, dt) rows, the time-offset-invariant keys that make
    * query-by-snippet possible where m5's whole-clip fingerprint cannot
    * (a fingerprint of a shifted snippet shares nothing; landmarks of a
    * frame-aligned snippet are exactly the track's own, shifted by a
    * constant). Decode → frames → peaks → pairing all run IN ROW in one
    * mapPartitions pass: at estate scale this is the shuffle-free
    * index-build map, and the landmark table is what you persist. */
  def audioLandmarks(spark: SparkSession, media: DataFrame,
      frameLen: Int = 64, bands: Int = 8, fanout: Int = 3): DataFrame = {
    require(frameLen % bands == 0, s"frameLen $frameLen not divisible by $bands")
    import spark.implicits._
    val bandLen = frameLen / bands
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { row =>
        parseWav(row.media).toSeq.flatMap { case (_, samples) =>
          val nf = samples.length / frameLen
          val peaks = new Array[Int](nf)
          var f = 0
          while (f < nf) {
            var best = 0
            var bestE = -1L
            var b = 0
            while (b < bands) {
              var e = 0L
              var j = 0
              while (j < bandLen) {
                val s = samples(f * frameLen + b * bandLen + j).toLong
                e += s * s; j += 1
              }
              if (e > bestE) { bestE = e; best = b }
              b += 1
            }
            peaks(f) = best; f += 1
          }
          for {
            t1 <- 0 until nf
            d <- 1 to fanout
            if t1 + d < nf
          } yield (row.id, t1, peaks(t1), peaks(t1 + d), d)
        }
      }
    }.toDF("id", "t1", "b1", "b2", "dt")
  }

  /** Query-by-snippet MATCHING over landmark tables: snippet landmarks
    * join the corpus index on the (b1, b2, dt) key, and every matched
    * pair VOTES for (track, corpus_t1 − query_t1) — a true match's votes
    * pile onto one aligned offset while chance collisions scatter. Top
    * `topPerQuery` (track, offset) rows per query by votes (ties to the
    * smallest track, then offset). At 100 TB the corpus landmark table is
    * the persisted inverted index; the snippet side broadcasts, so the
    * only shuffle is the vote aggregate over MATCHED rows. */
  def landmarkMatches(corpusLm: DataFrame, queryLm: DataFrame,
      topPerQuery: Int = 1): DataFrame = {
    val c = corpusLm.select(col("id").as("track"), col("t1").as("ct"),
      col("b1"), col("b2"), col("dt"))
    val q = queryLm.select(col("id").as("q"), col("t1").as("qt"),
      col("b1"), col("b2"), col("dt"))
    val votes = c.join(broadcast(q), Seq("b1", "b2", "dt"))
      .groupBy(col("q"), col("track"), (col("ct") - col("qt")).as("offset"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("votes").desc, col("track"), col("offset"))
    votes.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topPerQuery)
      .select(col("q"), col("track"), col("offset"), col("votes"))
  }

  private[graft] def parseWav(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    bb.getInt // riff size (trust the chunk walk, not this)
    if (tag() != "WAVE") return None
    var rate = 0; var bits = 0; var channels = 0
    var samples: Array[Short] = null
    while (bb.remaining() >= 8) {
      val id = tag(); val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          val audioFormat = bb.getShort
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort
          if (audioFormat != 1) return None
          bb.position(fmtEnd)
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort; i += 1 }
          if (size % 2 == 1) bb.get // pad byte
        case _ => bb.position(bb.position() + size + (size % 2))
      }
    }
    if (rate <= 0 || bits != 16 || channels != 1 || samples == null) None
    else Some((rate, samples))
  }

  /** Per-partition feature extraction: one MessageDigest per partition,
    * rows streamed — the mapPartitions batch shape. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: Decoder = FakeDecoder): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { row =>
        val decoded = decoder.decode(row.media)
        md.reset()
        val digest = md.digest(decoded).map("%02x".format(_)).mkString
        val head = decoded.take(8).map("%02x".format(_)).mkString
        val brightness =
          if (decoded.isEmpty) 0.0
          else decoded.map(b => (b & 0xff).toLong).sum.toDouble / decoded.length
        MediaFeatures(row.id, decoded.length.toLong, digest, head,
          brightness, row.content_type)
      }
    }.toDF()
  }

  /** Image-text PAIR dedup (the LAION-style curation step): the same image
    * crawls in under many alt-texts; near-dup image clusters (perceptual-
    * hash pairs → connected components) collapse to ONE pair each, keeping
    * the member with the LONGEST caption (ties to the smallest id, under
    * the id column's natural ordering — numeric or string ids both work) —
    * the alt-text most worth training on. Docs whose image matches nothing
    * form their own cluster and survive untouched.
    *
    * One struct-max hash aggregate picks every keeper — no window, no
    * per-cluster sort; the cluster frame is the small side and broadcasts.
    * Returns (cluster, n_members, keeper, keeper_cap_len). */
  def captionAwareKeepers(pairs: DataFrame, docs: DataFrame,
      idCol: String, capCol: String): DataFrame = {
    val cc = Dedup.duplicateClusters(pairs.select(col("a"), col("b")))
    docs.select(col(idCol).as("node"),
        length(col(capCol)).cast("long").as("cap_len"))
      .join(broadcast(cc), Seq("node"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("node")))
      .groupBy(col("cluster"))
      // min over (-cap_len, node): largest caption wins, ties to the
      // smallest node under its own ordering. cap_len is a length() —
      // always >= 0 — so the negation cannot overflow, and node is never
      // negated, so string ids are fine.
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("cap_len")).as("neg_cap"), col("node"))).as("_best"))
      .select(col("cluster"), col("n_members"),
        col("_best.node").as("keeper"),
        (-col("_best.neg_cap")).as("keeper_cap_len"))
  }

  /** CLIP-score-style pair-ALIGNMENT filter (the LAION curation gate,
    * Schuhmann et al. 2021: pairs whose image/text embedding cosine falls
    * below a threshold are dropped — mismatched alt-text is worse than no
    * pair). Pure scoring + gate over pre-joined pairs: one narrow pass,
    * the codegen'd dot kernel, no shuffle — assembling (img_emb, txt_emb)
    * onto one row is the caller's join (typically one equi-join on the
    * pair id, the only corpus-sized exchange of the whole step).
    *
    * Returns the kept pairs with their `alignment` score appended. */
  def alignmentFilter(pairs: DataFrame, imgEmbCol: String,
      txtEmbCol: String, threshold: Double): DataFrame =
    pairs
      .withColumn("alignment",
        Similarity.cosine(col(imgEmbCol), col(txtEmbCol)))
      .where(col("alignment") >= threshold)
}
