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
  * match decoded aggregates against closed-form arithmetic), and [[Png]]
  * is a real zlib-compressed codec (chunk CRCs, Inflater, all five
  * scanline filters — q153). TRANSFORM-CODED formats (JPEG/MP3/H.264)
  * remain stubbed — this container has no DCT/entropy codec
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

  /** REAL image codec for the zlib-compressed case: 8-bit truecolor PNG
    * (RFC 2083) — pure JVM via `java.util.zip.Deflater`/`Inflater`, no
    * codec library needed. The writer emits real chunked PNG bytes
    * (signature, IHDR, one deflated IDAT, IEND, each with its CRC32) and
    * VARIES the scanline filter per row (y % 5), so every decode path —
    * None/Sub/Up/Average/Paeth reconstruction — is exercised on every
    * image taller than four rows; the decoder walks chunks, verifies
    * every CRC, inflates, and unfilters. Unfiltering arithmetic and the
    * byte-exact inflate are the parts a stub can't fake. With this, the
    * decode stub's remit shrinks to transform-coded formats only
    * (JPEG/MP3-class — no DCT/entropy codec libs in this container). */
  object Png {
    final case class Decoded(width: Int, height: Int,
                             /** row-major top-down (r,g,b) triples */
                             pixels: Array[(Int, Int, Int)])

    private val Signature: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** a=left, b=up, c=upper-left — RFC 2083 §6.6. */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length) // PNG is big-endian
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
        .array()
    }

    /** px(x, y) with y=0 the TOP row; 8-bit RGB (color type 2). */
    def synth(width: Int, height: Int,
              px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      val stride = width * 3
      val img = Array.tabulate(height, stride) { (y, i) =>
        val (r, g, b) = px(i / 3, y)
        ((i % 3) match { case 0 => r; case 1 => g; case _ => b }).toByte
      }
      val raw = new Array[Byte](height * (1 + stride))
      for (y <- 0 until height) {
        val ft = y % 5
        raw(y * (1 + stride)) = ft.toByte
        for (i <- 0 until stride) {
          val cur = img(y)(i) & 0xff
          val left = if (i >= 3) img(y)(i - 3) & 0xff else 0
          val up = if (y > 0) img(y - 1)(i) & 0xff else 0
          val ul = if (y > 0 && i >= 3) img(y - 1)(i - 3) & 0xff else 0
          val f = ft match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case _ => cur - paeth(left, up, ul)
          }
          raw(y * (1 + stride) + 1 + i) = (f & 0xff).toByte
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val idat = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) idat.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height)
        .put(8.toByte).put(2.toByte) // bit depth 8, truecolor RGB
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, none
        .array()
      Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Chunk-walking parser: every chunk CRC is VERIFIED, IDAT segments
      * are concatenated before one inflate (real PNGs split them), and
      * scanlines are unfiltered per their per-row filter byte. Throws on
      * malformed input — corrupt payloads must fail loud, not yield
      * garbage features. */
    def decode(bytes: Array[Byte]): Decoded = {
      require(bytes.length > 8 && bytes.take(8).sameElements(Signature),
        "not a PNG")
      val b = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
      var width = -1; var height = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        require(b.remaining() >= 12, "truncated chunk stream")
        val len = b.getInt
        val tb = new Array[Byte](4); b.get(tb)
        val typ = new String(tb, "US-ASCII")
        require(b.remaining() >= len + 4, s"truncated $typ chunk")
        val data = new Array[Byte](len); b.get(data)
        val crc = b.getInt
        val c = new java.util.zip.CRC32(); c.update(tb); c.update(data)
        require(c.getValue.toInt == crc, s"$typ chunk CRC mismatch")
        typ match {
          case "IHDR" =>
            val hb = java.nio.ByteBuffer.wrap(data)
            width = hb.getInt; height = hb.getInt
            require(hb.get() == 8, "only 8-bit depth supported")
            require(hb.get() == 2, "only truecolor RGB supported")
            require(hb.get() == 0 && hb.get() == 0 && hb.get() == 0,
              "nonstandard compression/filter or interlace unsupported")
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _      => () // ancillary chunk: skipped, CRC still checked
        }
      }
      require(width > 0 && height > 0, "no IHDR before IDAT/IEND")
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val stride = width * 3
      val raw = new Array[Byte](height * (1 + stride))
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // All input was handed over up front, so zero progress while not
        // finished is ALWAYS corruption: either the stream is truncated
        // (needsInput) or it set the FDICT flag (needsDictionary — which
        // would otherwise pass the old needsInput-only check and spin
        // this loop forever). Fail loud on both.
        require(n > 0 || inf.finished(),
          if (inf.needsDictionary()) "FDICT zlib stream unsupported"
          else "truncated IDAT stream")
        off += n
      }
      require(off == raw.length,
        s"decompressed $off bytes, expected ${raw.length}")
      inf.end()
      val img = Array.ofDim[Byte](height, stride)
      for (y <- 0 until height) {
        val ft = raw(y * (1 + stride)) & 0xff
        require(ft <= 4, s"unknown scanline filter $ft")
        for (i <- 0 until stride) {
          val f = raw(y * (1 + stride) + 1 + i) & 0xff
          val left = if (i >= 3) img(y)(i - 3) & 0xff else 0
          val up = if (y > 0) img(y - 1)(i) & 0xff else 0
          val ul = if (y > 0 && i >= 3) img(y - 1)(i - 3) & 0xff else 0
          val v = ft match {
            case 0 => f
            case 1 => f + left
            case 2 => f + up
            case 3 => f + (left + up) / 2
            case _ => f + paeth(left, up, ul)
          }
          img(y)(i) = (v & 0xff).toByte
        }
      }
      val pixels = Array.tabulate(width * height) { k =>
        val y = k / width; val x = k % width
        (img(y)(x * 3) & 0xff, img(y)(x * 3 + 1) & 0xff,
         img(y)(x * 3 + 2) & 0xff)
      }
      Decoded(width, height, pixels)
    }
  }
}
