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
  * JDK's own `javax.imageio` (headless, no external library), WAV/RIFF
  * PCM audio through a hand-rolled chunk walker (the format is public
  * and simple enough that no library is needed — see [[MediaCodec
  * .decodeWav]]), and `GRFT` remains the deterministic synthetic
  * format — a 16-byte header (magic, width, height, channels) followed
  * by the payload — used by the oracle-gated queries so expected
  * metadata stays analytically computable. Compressed audio/video
  * codecs (mp3/aac/h264) stay out of scope — nothing in the JDK
  * decodes them; they would slot into the same
  * [[MediaCodec.decode]] dispatch.
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

  object MediaCodec {
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
      else if (bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E') "wav"
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
        case "wav" =>
          val (meta, samples) = decodeWav(bytes)
          // payload = the raw little-endian PCM data bytes, so the m4
          // payload-slice fingerprint discipline (hash CONTENT, not
          // container) applies to audio unchanged
          val payload = new Array[Byte](samples.length * (meta.bitsPerSample / 8))
          val pb = java.nio.ByteBuffer.wrap(payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          if (meta.bitsPerSample == 16) samples.foreach(pb.putShort)
          else samples.foreach(s => pb.put((s + 128).toByte)) // back to 8-bit unsigned
          (MediaMeta(docId, "wav", meta.nFrames, meta.sampleRate,
            meta.channels, payload.length.toLong), payload)
        case other =>
          throw new IllegalArgumentException(s"unsupported media format: $other")
      }

    // ---- WAV / RIFF PCM -------------------------------------------------
    // Public format, public knowledge: a RIFF container ("RIFF" <size>
    // "WAVE") holding chunks; PCM audio needs exactly the "fmt " chunk
    // (format tag 1 = integer PCM, channels, sample rate, bits/sample)
    // and the "data" chunk (interleaved little-endian frames). Chunks
    // are word-aligned: an odd-sized chunk is followed by one pad byte.

    /** Parsed WAV facts: `nFrames` = samples per channel. */
    case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
        nFrames: Int)

    /** Encode interleaved 16-bit PCM samples as a canonical 44-byte-header
      * WAV blob. Deterministic in (samples, sampleRate, channels).
      */
    def encodeWav(samples: Array[Short], sampleRate: Int,
        channels: Int = 1): Array[Byte] = {
      require(channels >= 1, s"channels must be >= 1, got $channels")
      require(samples.length % channels == 0,
        s"${samples.length} samples do not interleave into $channels channel(s)")
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(channels.toShort)
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2) // byte rate
      bb.putShort((channels * 2).toShort) // block align
      bb.putShort(16) // bits per sample
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Decode a WAV/RIFF PCM blob: walk the chunk list (skipping unknown
      * chunks — LIST/INFO metadata is common in the wild — with odd-size
      * pad bytes respected), parse "fmt ", and read "data" as interleaved
      * samples. 16-bit samples are little-endian signed; 8-bit WAV is
      * unsigned by spec and is centered to signed here (−128..127 scaled
      * into the same Short range position). Malformed input — missing
      * RIFF/WAVE magic, a truncated chunk, a compressed format tag, data
      * before fmt, or unsupported bit depths — throws
      * `IllegalArgumentException` naming the defect.
      */
    def decodeWav(bytes: Array[Byte]): (WavMeta, Array[Short]) = {
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"malformed WAV: $msg")
      if (bytes.length < 12) fail(s"only ${bytes.length} bytes, need >= 12")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val riff = new Array[Byte](4); bb.get(riff)
      if (!java.util.Arrays.equals(riff, "RIFF".getBytes("US-ASCII")))
        fail("no RIFF magic")
      val riffLen = bb.getInt // trusted only loosely; chunk walk re-checks
      if (riffLen < 4) fail(s"RIFF size $riffLen cannot hold a WAVE form")
      val wave = new Array[Byte](4); bb.get(wave)
      if (!java.util.Arrays.equals(wave, "WAVE".getBytes("US-ASCII")))
        fail("no WAVE form type")
      var fmt: Option[WavMeta] = None
      var data: Option[Array[Byte]] = None
      while (data.isEmpty && bb.remaining() >= 8) {
        val id = new Array[Byte](4); bb.get(id)
        val size = bb.getInt
        if (size < 0 || size > bb.remaining())
          fail(s"chunk '${new String(id, "US-ASCII")}' claims $size bytes, " +
            s"${bb.remaining()} remain")
        new String(id, "US-ASCII") match {
          case "fmt " =>
            if (size < 16) fail(s"fmt chunk is $size bytes, PCM needs 16")
            val p0 = bb.position()
            val tag = bb.getShort & 0xffff
            if (tag != 1) fail(s"format tag $tag is not integer PCM (1) — " +
              "compressed WAV is out of scope")
            val ch = bb.getShort & 0xffff
            val rate = bb.getInt
            bb.getInt // byte rate (derivable)
            bb.getShort // block align (derivable)
            val bits = bb.getShort & 0xffff
            if (ch < 1) fail("zero channels")
            if (rate <= 0) fail(s"sample rate $rate")
            if (bits != 8 && bits != 16)
              fail(s"$bits bits/sample (8 or 16 supported)")
            fmt = Some(WavMeta(ch, rate, bits, nFrames = 0))
            // skip extensions + pad; a trailing odd chunk may legally
            // omit the pad byte, so clamp to the buffer end
            bb.position(math.min(bb.limit(), p0 + size + (size & 1)))
          case "data" =>
            val d = new Array[Byte](size); bb.get(d)
            data = Some(d)
          case _ => // LIST, fact, cue … — skip, word-aligned, clamped
            bb.position(math.min(bb.limit(), bb.position() + size + (size & 1)))
        }
      }
      val m = fmt.getOrElse(fail("no fmt chunk before data"))
      val d = data.getOrElse(fail("no data chunk"))
      val bytesPer = m.bitsPerSample / 8
      if (d.length % (bytesPer * m.channels) != 0)
        fail(s"data length ${d.length} is not a whole number of " +
          s"${m.channels}-channel ${m.bitsPerSample}-bit frames")
      val n = d.length / bytesPer
      val out = new Array[Short](n)
      val db = java.nio.ByteBuffer.wrap(d)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      if (m.bitsPerSample == 16) {
        while (i < n) { out(i) = db.getShort; i += 1 }
      } else {
        while (i < n) { out(i) = ((db.get() & 0xff) - 128).toShort; i += 1 }
      }
      (m.copy(nFrames = n / m.channels), out)
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
        MediaRow(id, MediaCodec.encode(id, text.getBytes("UTF-8")))
      }
  }

  /** documents → (doc_id, REAL WAV blob): 16-bit mono PCM whose samples
    * are a deterministic md5 expansion — frame f of doc d takes the 32
    * hex nibbles of md5("d:f") and maps nibble → (nib − 8)·256 + 128,
    * so the sample is negative exactly when nib < 8 (the m6 ZCR
    * boundary) and the DuckDB oracle can replay every sample
    * analytically. The CONTAINER is genuine RIFF ([[MediaCodec
    * .encodeWav]]): header, fmt chunk, little-endian data chunk — what
    * the decode side must actually parse.
    */
  def withFakeWav(docs: DataFrame, frames: Int = 8,
      frameLen: Int = 32): Dataset[MediaRow] = {
    require(frameLen >= 1 && frameLen <= 32,
      s"frameLen draws from md5's 32 nibbles, got $frameLen")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val samples = new Array[Short](frames * frameLen)
        var f = 0
        while (f < frames) {
          val dg = md.digest(s"$id:$f".getBytes("UTF-8"))
          var i = 0
          while (i < frameLen) {
            val b = dg(i / 2) & 0xff
            val nib = if (i % 2 == 0) b >> 4 else b & 0xf
            samples(f * frameLen + i) = ((nib - 8) * 256 + 128).toShort
            i += 1
          }
          f += 1
        }
        MediaRow(id, MediaCodec.encodeWav(samples, sampleRate = 16000))
      }
    }
  }

  /** Per-frame audio features over REAL WAV blobs — the silence/noise/
    * VAD pre-screen every audio curation gate starts from, with the
    * decode step now an actual RIFF chunk walk instead of a synth stub:
    * each blob dispatches on magic bytes, parses fmt/data, and the
    * decoded samples are framed into `frameLen`-sample windows scoring
    * energy (Σ s², exact BIGINT) and zero-crossing rate (sign flips
    * between adjacent samples). Map-only `flatMap` — blobs never
    * shuffle, one (doc_id, frame, 2 longs) row per frame comes out; a
    * trailing partial frame is dropped (standard framing semantics).
    */
  def wavFrameFeatures(media: Dataset[MediaRow], frameLen: Int = 32): DataFrame = {
    require(frameLen >= 2, s"a frame needs >= 2 samples for ZCR, got $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { row =>
      require(MediaCodec.detectFormat(row.media) == "wav",
        s"doc ${row.doc_id}: not a WAV blob")
      val (meta, samples) = MediaCodec.decodeWav(row.media)
      require(meta.channels == 1,
        s"doc ${row.doc_id}: frame features expect mono, got ${meta.channels}")
      (0 until samples.length / frameLen).map { f =>
        var energy = 0L
        var zcr = 0L
        var i = f * frameLen
        val end = i + frameLen
        while (i < end) {
          energy += samples(i).toLong * samples(i)
          if (i > f * frameLen && (samples(i) < 0) != (samples(i - 1) < 0))
            zcr += 1
          i += 1
        }
        (row.doc_id, f.toLong, energy, zcr)
      }
    }.toDF("doc_id", "frame_no", "energy", "zcr")
  }

  /** Partition-parallel decode: binary column → typed metadata rows.
    * Batch shape = one partition's iterator; nothing is collected.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { row =>
      MediaCodec.decode(row.doc_id, row.media)._1
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
      val payload = MediaCodec.decode(row.doc_id, row.media)._2
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
      val (meta, payload) = MediaCodec.decode(row.doc_id, row.media)
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
          bb.put(MediaCodec.Magic)
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
          MediaRow(row.doc_id, MediaCodec.encodePng(out, newW, newH, c))
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
      val payload = MediaCodec.decode(row.doc_id, row.media)._2
      payload.grouped(frameSize).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => (row.doc_id, i, chunk) }
    }.toDF("doc_id", "frame_no", "frame")
  }
}
