package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed
  * partition-parallel.
  *
  * The Spark-side plumbing (schema, batch shape, partition parallelism,
  * deterministic outputs) is real and tested. The codec layer is split:
  * the UNCOMPRESSED formats are decoded for real — [[Wav]] is an actual
  * RIFF/WAVE PCM16 chunk-walking parser and [[Bmp]] an actual 24bpp BMP
  * parser (header validation, row padding, BGR/bottom-up layout), both
  * pure JVM and oracle-checked end-to-end (q145/q146 write real bytes and
  * match decoded aggregates against closed-form arithmetic). COMPRESSED
  * codecs (JPEG/MP3/H.264) remain stubbed — this container has no codec
  * libraries — via `decodeStub`'s deterministic pseudo-features; a
  * production deployment swaps that one function for a JNI/javacv codec
  * without touching the surrounding plumbing: decode runs inside
  * `mapPartitions` (the Scala analogue of PySpark's `mapInPandas` batch
  * loop), so per-partition codec initialization happens once, not per row.
  */
object Multimodal {

  /** One media row: payload + typed metadata (the schema a 100 TB media
    * table would carry; payload stays opaque binary end-to-end). */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float]) // fixed-dim embedding per media item

  /** STUB decode — deterministic pseudo-features from payload bytes
    * (replaces the real image/audio codec, absent in this container).
    * xxhash-style mixing per dimension so output is stable across runs. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // FNV-ish seed
    payload.foreach(b => h = h * 31 + (b & 0xff))
    Array.tabulate(dim) { i =>
      val x = h ^ (i.toLong * 0x9e3779b97f4a7c15L)
      val m = (x ^ (x >>> 33)) * 0xff51afd7ed558ccdL
      ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
    }
  }

  /** Batch feature extraction: one codec "session" per partition (the
    * mapInPandas batch shape), rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the codec ONCE here (expensive), reuse per row
      rows.map { r =>
        var crc = new java.util.zip.CRC32()
        crc.update(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          crc.getValue, decodeStub(r.payload, dim))
      }
    }
  }

  /** Video frame-sampling plan: every `stride`-th frame index up to
    * n_frames (the real pipeline would decode just those frames). Pure
    * expression — no data movement until the decode stage consumes it. */
  def sampleFrameIndexes(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))
        .as("frame_indexes"))

  /** Byte-level stats usable without any codec (size/checksum pushdown-able
    * pre-filter before expensive decode: drop empty/corrupt payloads early). */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      crc32(col("payload")).as("crc"),
      md5(col("payload")).as("digest"))

  /** REAL audio codec for the uncompressed case: RIFF/WAVE PCM16 needs no
    * external library, so for WAV payloads the decode step is an actual
    * byte-format parser, not a stub — chunk walk, fmt validation,
    * little-endian sample extraction. (Compressed codecs remain stubbed:
    * no codec libs in this container.) */
  object Wav {
    final case class Decoded(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, samples: Array[Short])

    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** Mono PCM16 writer. */
    def synth(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(out.putShort)
      out.array()
    }

    /** Chunk-walking parser (tolerates extra chunks between fmt and data,
      * as real RIFF files have). Throws on malformed input — a corrupt
      * payload must fail loud, not yield garbage features. */
    def decode(bytes: Array[Byte]): Decoded = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
      }
      require(fourcc() == "RIFF", "not a RIFF file")
      b.getInt // riff size
      require(fourcc() == "WAVE", "not a WAVE file")
      var rate = -1; var channels = -1; var bits = -1
      var samples: Array[Short] = null
      while (b.remaining() >= 8 && samples == null) {
        val id = fourcc(); val size = b.getInt
        id match {
          case "fmt " =>
            val fmt = b.getShort
            require(fmt == 1, s"not PCM (fmt=$fmt)")
            channels = b.getShort.toInt
            rate = b.getInt
            b.getInt; b.getShort // byte rate, block align
            bits = b.getShort.toInt
            require(bits == 16, s"only PCM16 supported (bits=$bits)")
            b.position(b.position() + (size - 16)) // fmt extensions
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            samples = Array.fill(size / 2)(b.getShort)
          case _ => b.position(b.position() + size + (size & 1)) // skip, pad
        }
      }
      require(samples != null, "no data chunk")
      Decoded(rate, channels, bits, samples)
    }
  }

  /** REAL image codec for the uncompressed case: 24-bit bottom-up BMP —
    * file/info header validation, BGR order, 4-byte row padding. The
    * padding arithmetic is the part a stub can't fake. */
  object Bmp {
    final case class Decoded(width: Int, height: Int,
                             /** row-major top-down (r,g,b) triples */
                             pixels: Array[(Int, Int, Int)])

    def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

    /** px(x, y) with y=0 the TOP row; writes the bottom-up BMP layout. */
    def synth(width: Int, height: Int,
              px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val rs = rowSize(width)
      val out = java.nio.ByteBuffer.allocate(54 + rs * height)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + rs * height)
        .putInt(0).putInt(54) // reserved, pixel offset
        .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
        .putShort(1).putShort(24).putInt(0).putInt(rs * height)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (row <- height - 1 to 0 by -1) { // bottom-up
        for (x <- 0 until width) {
          val (r, g, b) = px(x, row)
          out.put(b.toByte).put(g.toByte).put(r.toByte) // BGR
        }
        (width * 3 until rs).foreach(_ => out.put(0.toByte)) // padding
      }
      out.array()
    }

    def decode(bytes: Array[Byte]): Decoded = {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(b.get() == 'B' && b.get() == 'M', "not a BMP")
      b.getInt; b.getInt // file size, reserved
      val offset = b.getInt
      require(b.getInt == 40, "not a BITMAPINFOHEADER BMP")
      val width = b.getInt; val height = b.getInt
      require(height > 0, "top-down BMP unsupported")
      b.getShort
      require(b.getShort == 24, "only 24bpp supported")
      require(b.getInt == 0, "compressed BMP unsupported")
      val rs = rowSize(width)
      val pixels = new Array[(Int, Int, Int)](width * height)
      for (row <- 0 until height) { // stored bottom-up → emit top-down
        b.position(offset + (height - 1 - row) * rs)
        for (x <- 0 until width) {
          val blue = b.get() & 0xff; val green = b.get() & 0xff
          val red = b.get() & 0xff
          pixels(row * width + x) = (red, green, blue)
        }
      }
      Decoded(width, height, pixels)
    }
  }
}
