package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed partition-parallel.
  *
  * The Spark-side mechanics here are real and designed for 100 TB — binary
  * payloads never hit the driver, decode runs inside `mapPartitions` (the
  * Scala analogue of arrow-batched Python `mapInPandas`), metadata is a
  * typed struct so downstream filters prune on it, and the decode output
  * schema is fixed so Catalyst can column-prune around the blob.
  *
  * The codec dispatches on magic bytes: PNG and JPEG decode through the
  * JDK's own `javax.imageio` (headless, no external library), and `GRFT`
  * remains the deterministic synthetic format — a 16-byte header (magic,
  * width, height, channels) followed by the payload — used by the oracle-
  * gated queries so expected metadata stays analytically computable.
  * Audio/video codecs are still stubs (nothing in the JDK decodes them);
  * they would slot into the same [[MediaCodecStub.decode]] dispatch.
  */
object Multimodal {

  /** Decoded media metadata — the typed half of the (metadata, blob) pair. */
  case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_channels: Int,
      n_bytes: Long)

  case class MediaRow(doc_id: Long, media: Array[Byte])

  object MediaCodecStub {
    val Magic: Array[Byte] = "GRFT".getBytes("UTF-8")

    /** Encode a fake media blob: 16-byte header + payload. Deterministic in
      * (doc_id, payload).
      */
    def encode(docId: Long, payload: Array[Byte]): Array[Byte] = {
      val width = 16 + (docId % 64).toInt
      val height = 16 + (docId % 48).toInt
      val channels = 1 + (docId % 3).toInt
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.put(Magic)
      bb.putInt(width); bb.putInt(height); bb.putInt(channels)
      bb.put(payload)
      bb.array()
    }

    /** Format sniffing by magic bytes — the dispatch a real media pipeline
      * performs before handing to a codec.
      */
    def detectFormat(bytes: Array[Byte]): String =
      if (bytes.length >= 4 && java.util.Arrays.equals(bytes.take(4), Magic)) "GRFT"
      else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
      else "unknown"

    /** Decode: bytes → (metadata, raw sample payload). PNG/JPEG go through
      * `javax.imageio` (the payload is the row-major interleaved raster
      * samples, deterministic for a given image); GRFT parses the synthetic
      * header. ffmpeg-class formats stay stubbed — same dispatch slot.
      */
    def decode(docId: Long, bytes: Array[Byte]): (MediaMeta, Array[Byte]) =
      detectFormat(bytes) match {
        case "GRFT" =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          bb.position(4)
          val w = bb.getInt; val h = bb.getInt; val c = bb.getInt
          val payload = new Array[Byte](bytes.length - 16); bb.get(payload)
          (MediaMeta(docId, "GRFT", w, h, c, payload.length.toLong), payload)
        case fmt @ ("png" | "jpeg") =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"imageio could not decode a $fmt blob")
          val raster = img.getRaster
          val (w, h, c) = (img.getWidth, img.getHeight, raster.getNumBands)
          // >8-bit samples (16-bit PNG) downscale by shifting the high
          // bits — a defined 8-bit reduction, not a low-byte truncation
          val shift = Array.tabulate(c)(b =>
            math.max(0, raster.getSampleModel.getSampleSize(b) - 8))
          val payload = new Array[Byte](w * h * c)
          var i = 0; var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < c) {
                payload(i) = (raster.getSample(x, y, b) >> shift(b)).toByte
                i += 1; b += 1
              }
              x += 1
            }
            y += 1
          }
          (MediaMeta(docId, fmt, w, h, c, payload.length.toLong), payload)
        case other =>
          throw new IllegalArgumentException(s"unsupported media format: $other")
      }

    /** Encode raw interleaved samples back to PNG (lossless — JPEG input
      * also re-encodes as PNG so roundtrips stay bit-deterministic).
      */
    def encodePng(samples: Array[Byte], w: Int, h: Int, c: Int): Array[Byte] = {
      val img = c match {
        case 1 => new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        case 2 =>
          // gray + alpha has no predefined BufferedImage type; a 2-band
          // ComponentColorModel raster keeps both bands addressable (the
          // 4-band fallback would leave alpha unwritten → transparent)
          val cs = java.awt.color.ColorSpace.getInstance(
            java.awt.color.ColorSpace.CS_GRAY)
          val cm = new java.awt.image.ComponentColorModel(cs, true, false,
            java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
          new java.awt.image.BufferedImage(
            cm, cm.createCompatibleWritableRaster(w, h), false, null)
        case 3 => new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        case 4 => new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
        case other => throw new IllegalArgumentException(
          s"unsupported channel count for PNG encode: $other")
      }
      val raster = img.getRaster
      var i = 0; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < c) { raster.setSample(x, y, b, samples(i) & 0xff); i += 1; b += 1 }
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** documents → (doc_id, media binary). In production this column arrives
    * from upstream storage; here it is synthesized deterministically from
    * the text payload so the decode path is exercised end-to-end.
    */
  def withFakeMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, MediaCodecStub.encode(id, text.getBytes("UTF-8")))
      }
  }

  /** Partition-parallel decode: binary column → typed metadata rows.
    * Batch shape = one partition's iterator; nothing is collected.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      MediaCodecStub.decode(row.doc_id, row.media)._1
    })
  }

  /** Feature extraction stub: 8-bin byte histogram over the decoded
    * payload, L1-normalized. Real feature extractors (CLIP embeddings,
    * mel spectrograms) drop into the same mapPartitions slot.
    */
  def byteHistogram(media: Dataset[MediaRow], bins: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      val payload = MediaCodecStub.decode(row.doc_id, row.media)._2
      val hist = new Array[Long](bins)
      payload.foreach { b => hist(((b & 0xff) * bins) / 256) += 1 }
      val n = math.max(1L, payload.length.toLong)
      (row.doc_id, hist.map(_.toDouble / n).toSeq)
    }).toDF("doc_id", "features")
  }

  /** Resize stub: nearest-neighbor resample of the payload viewed as a
    * width×height grid (channels folded into the cell) to `newW`×`newH`,
    * re-encoded as a GRFT blob with the new dimensions. The real-codec
    * version swaps the sampling loop for an image library call; output
    * stays (doc_id, binary) so resize chains with decode/feature/frame
    * stages. One pass per row, partition-parallel, no shuffle.
    */
  def resize(media: Dataset[MediaRow], newW: Int, newH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      val (meta, payload) = MediaCodecStub.decode(row.doc_id, row.media)
      meta.format match {
        case "GRFT" =>
          val out = new Array[Byte](newW * newH)
          var y = 0
          while (y < newH) {
            var x = 0
            while (x < newW) {
              // nearest-neighbor source cell; payload is row-major w×h,
              // truncated/padded with 0 when the fake payload is short
              val sx = x.toLong * meta.width / newW
              val sy = y.toLong * meta.height / newH
              // long index: a header claiming w*h > 2^31 must zero-pad, not
              // wrap negative and crash the bounds check
              val idx = sy * meta.width + sx
              out(y * newW + x) =
                if (idx >= 0 && idx < payload.length) payload(idx.toInt) else 0
              x += 1
            }
            y += 1
          }
          // keep the doc-derived channel count; dimensions are the new ones
          val bb = java.nio.ByteBuffer.allocate(16 + out.length)
          bb.put(MediaCodecStub.Magic)
          bb.putInt(newW); bb.putInt(newH); bb.putInt(meta.n_channels)
          bb.put(out)
          MediaRow(row.doc_id, bb.array())
        case _ =>
          // real image: nearest-neighbor over interleaved raster samples,
          // re-encoded lossless PNG (deterministic, chains with decode)
          val c = meta.n_channels
          val out = new Array[Byte](newW * newH * c)
          var y = 0
          while (y < newH) {
            var x = 0
            while (x < newW) {
              val sx = (x.toLong * meta.width / newW).toInt
              val sy = (y.toLong * meta.height / newH).toInt
              var b = 0
              while (b < c) {
                out((y * newW + x) * c + b) = payload((sy * meta.width + sx) * c + b)
                b += 1
              }
              x += 1
            }
            y += 1
          }
          MediaRow(row.doc_id, MediaCodecStub.encodePng(out, newW, newH, c))
      }
    })
  }

  /** Frame sampling stub: every `stride`-th fixed-size chunk of the payload
    * (video keyframe extraction shape: one blob in, many smaller out,
    * `flatMap` so partitions stay balanced).
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 64, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      val payload = MediaCodecStub.decode(row.doc_id, row.media)._2
      payload.grouped(frameSize).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => (row.doc_id, i, chunk) }
    }.toDF("doc_id", "frame_no", "frame")
  }
}
