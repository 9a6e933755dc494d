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
  * match decoded aggregates against closed-form arithmetic), [[Png]]
  * is a real zlib-compressed codec (chunk CRCs, Inflater, all five
  * scanline filters — q153), and [[Jpeg]] is a real baseline
  * sequential-DCT codec (marker walk, canonical Huffman from DHT,
  * dequant, IDCT, 4:2:0 chroma upsampling, restart markers — q155; pure
  * math, no library). Only NON-DCT compressed audio/video (MP3/H.264-
  * class) remains stubbed via `decodeStub`'s deterministic
  * pseudo-features; a production deployment swaps that one function for
  * a JNI/javacv codec without touching the surrounding plumbing: decode
  * runs inside `mapPartitions` (the Scala analogue of PySpark's
  * `mapInPandas` batch loop), so per-partition codec initialization
  * happens once, not per row.
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

  /** REAL image codec for the transform-coded case: BASELINE SEQUENTIAL
    * JPEG (ITU-T T.81) — pure JVM math, no codec library. The DECODER is
    * general for 8-bit baseline streams: marker walk (SOI/APPn/COM/DQT/
    * DHT/DRI/SOF0/SOS/EOI), canonical Huffman decoding rebuilt from the
    * file's own DHT BITS/HUFFVAL, DC-predictor DIFF decoding, AC
    * run-length (EOB/ZRL) decoding, dequantization against the file's
    * DQT, separable double-precision IDCT, level shift + clamp, restart-
    * marker handling (byte-align, RSTn modulo check, predictor reset),
    * per-component sampling factors with nearest-neighbor upsampling,
    * and MCU-padding crop. The ENCODER writes real baseline streams
    * (JFIF APP0, its own DQT/DHT tables, 4:2:0 or 4:4:4 sampling,
    * optional DRI/RSTn, byte stuffing) — restricted to the table set it
    * declares, which is all a conforming decoder may assume anyway.
    *
    * Lossy-codec oracle strategy (q155): images that are CONSTANT per
    * 8×8 luma block (and per 16×16 original-pixel chroma cell) survive
    * the whole pipeline EXACTLY when the DC quantizer is 8 — the DCT of
    * a flat block is DC-only with DC = 8·(v−128), quantizing by 8 gives
    * v−128 exactly, every AC rounds to 0, and the IDCT of a DC-only
    * block is flat at DC/8. So decoded planes equal the closed-form
    * input planes integer-for-integer, which is what lets DuckDB
    * recompute the decoded aggregates — while the engine still runs the
    * full entropy-decode + IDCT machinery on real bytes (a scaling,
    * zigzag, predictor, stuffing or upsampling bug breaks the exact
    * match). Non-constant images run the same path with ordinary lossy
    * error, asserted bounded in the spec. */
  object Jpeg {
    /** Full-resolution planes, row-major top-down, values 0..255. For
      * grayscale streams cb/cr are constant 128. */
    final case class Decoded(width: Int, height: Int,
                             y: Array[Int], cb: Array[Int], cr: Array[Int])

    /** Zigzag index k → natural (row-major) coefficient position. */
    private val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** C(u)·cos((2x+1)uπ/16) — the shared forward/inverse DCT basis. */
    private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
      (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
        math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }

    /** Quant tables in ZIGZAG order (as DQT stores them): DC step 8 —
      * the exact-flat-block property above — and a flat 16 for AC. */
    private val QTable: Array[Int] = Array.tabulate(64)(k => if (k == 0) 8 else 16)

    /** Canonical Huffman table from (codeLength → symbols): the JPEG
      * BITS/HUFFVAL representation plus the canonical code assignment
      * (T.81 Annex C). Encoder and decoder both build from this ONE
      * construction, so the bitstreams they agree on are the spec's. */
    private final class Huff(spec: Seq[(Int, Seq[Int])]) {
      val bits: Array[Int] = {
        val b = new Array[Int](17)
        spec.foreach { case (len, syms) => b(len) += syms.length }
        b
      }
      val huffval: Array[Int] =
        spec.sortBy(_._1).flatMap(_._2).toArray
      /** symbol → (code, length) for the encoder. */
      val enc: Map[Int, (Int, Int)] = {
        var code = 0
        var i = 0
        val m = scala.collection.mutable.Map[Int, (Int, Int)]()
        for (len <- 1 to 16) {
          var j = 0
          while (j < bits(len)) {
            require(code < (1 << len), "huffman spec overflows code space")
            m(huffval(i)) = (code, len)
            code += 1; i += 1; j += 1
          }
          code <<= 1
        }
        m.toMap
      }
      /** mincode/maxcode/valptr per length for the decoder (T.81 F.2.2.3). */
      val (minCode, maxCode, valPtr) = {
        val mn = new Array[Int](17); val mx = new Array[Int](17)
        val vp = new Array[Int](17)
        var code = 0; var i = 0
        for (len <- 1 to 16) {
          if (bits(len) == 0) { mx(len) = -1 }
          else {
            vp(len) = i; mn(len) = code
            code += bits(len); i += bits(len)
            mx(len) = code - 1
          }
          code <<= 1
        }
        (mn, mx, vp)
      }
    }

    /** DC categories 0..11, all length 4 (12 ≤ 16 codes — valid). */
    private val DcHuff = new Huff(Seq(4 -> (0 to 11)))
    /** AC: EOB short (len 2) — the dominant symbol — plus ZRL and every
      * (run 0..15, size 1..8) at len 10. Size 8 suffices for ANY 8-bit
      * input: |quantized AC| ≤ 2048/16 = 128 < 256, so the encoder is
      * total over its domain, not just over the flat-block test shapes. */
    private val AcHuff = new Huff(Seq(
      2 -> Seq(0x00), // EOB
      10 -> (Seq(0xF0) ++ (for (r <- 0 to 15; s <- 1 to 8) yield (r << 4) | s))))

    private def dcCategory(v: Int): Int = {
      var t = math.abs(v); var c = 0
      while (t != 0) { t >>= 1; c += 1 }
      c
    }

    private final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var acc = 0; private var n = 0
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >> i) & 1); n += 1
          if (n == 8) {
            out.write(acc)
            if (acc == 0xFF) out.write(0x00) // byte stuffing
            acc = 0; n = 0
          }
          i -= 1
        }
      }
      /** Pad the final partial byte with 1s (T.81 F.1.2.3). */
      def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
      def raw(b: Int): Unit = { require(n == 0); out.write(b) }
      def bytes: Array[Byte] = out.toByteArray
    }

    /** Forward 2-D DCT-II + quantization of one level-shifted 8×8 block;
      * returns quantized coefficients in ZIGZAG order. */
    private def fdctQuant(block: Array[Int]): Array[Int] = {
      val tmp = new Array[Double](64)
      var v = 0
      while (v < 8) { // rows of the (u,v) grid: horizontal pass first
        var u = 0
        while (u < 8) {
          var s = 0.0; var x = 0
          while (x < 8) { s += Cos(u)(x) * block(v * 8 + x); x += 1 }
          tmp(v * 8 + u) = s
          u += 1
        }
        v += 1
      }
      val out = new Array[Int](64)
      var k = 0
      while (k < 64) {
        val nat = Zigzag(k); val u = nat % 8; val vv = nat / 8
        var s = 0.0; var yy = 0
        while (yy < 8) { s += Cos(vv)(yy) * tmp(yy * 8 + u); yy += 1 }
        out(k) = math.round(s / 4.0 / QTable(k)).toInt
        k += 1
      }
      out
    }

    /** Inverse: dequantized natural-order coefficients → 8×8 samples. */
    private def idct(coef: Array[Int]): Array[Int] = {
      val tmp = new Array[Double](64)
      var vv = 0
      while (vv < 8) { // horizontal pass: tmp(v, x) = Σ_u C(u)F(v,u)cos
        var x = 0
        while (x < 8) {
          var s = 0.0; var u = 0
          while (u < 8) { s += Cos(u)(x) * coef(vv * 8 + u); u += 1 }
          tmp(vv * 8 + x) = s
          x += 1
        }
        vv += 1
      }
      val out = new Array[Int](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0; var v2 = 0
          while (v2 < 8) { s += Cos(v2)(y) * tmp(v2 * 8 + x); v2 += 1 }
          val p = math.round(s / 4.0).toInt + 128
          out(y * 8 + x) = math.max(0, math.min(255, p))
          x += 1
        }
        y += 1
      }
      out
    }

    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def segment(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload

    /** Encode one component plane (already padded to block multiples):
      * emits the blocks of one MCU row-of-blocks region. */
    private def encodeBlock(w: BitWriter, block: Array[Int],
                            pred: Int): Int = {
      val q = fdctQuant(block)
      val diff = q(0) - pred
      val cat = dcCategory(diff)
      val (dc, dl) = DcHuff.enc(cat)
      w.put(dc, dl)
      if (cat > 0) {
        val mag = if (diff < 0) diff + (1 << cat) - 1 else diff
        w.put(mag, cat)
      }
      // AC runs
      var k = 1; var run = 0
      while (k < 64) {
        if (q(k) == 0) run += 1
        else {
          while (run > 15) { val (z, zl) = AcHuff.enc(0xF0); w.put(z, zl); run -= 16 }
          val s = dcCategory(q(k))
          require(s <= 8, s"AC size $s outside the declared table")
          val (c, cl) = AcHuff.enc((run << 4) | s)
          w.put(c, cl)
          val mag = if (q(k) < 0) q(k) + (1 << s) - 1 else q(k)
          w.put(mag, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (e, el) = AcHuff.enc(0x00); w.put(e, el) }
      q(0)
    }

    /** Baseline JPEG writer. `yPx`/`cbPx`/`crPx` give the YCbCr planes
      * over ORIGINAL pixel coordinates (top-left origin); chroma is
      * averaged 2×2 when `subsample` (4:2:0), taken verbatim for 4:4:4.
      * `restartInterval` > 0 emits DRI and RSTn every that-many MCUs. */
    def synth(width: Int, height: Int,
              yPx: (Int, Int) => Int, cbPx: (Int, Int) => Int,
              crPx: (Int, Int) => Int, subsample: Boolean = true,
              restartInterval: Int = 0): Array[Byte] = {
      require(width > 0 && height > 0)
      val hmax = if (subsample) 2 else 1
      val mcuPx = 8 * hmax
      val mcusX = (width + mcuPx - 1) / mcuPx
      val mcusY = (height + mcuPx - 1) / mcuPx
      def clampXY(f: (Int, Int) => Int)(x: Int, y: Int): Int =
        f(math.min(x, width - 1), math.min(y, height - 1))
      val yP = clampXY(yPx) _
      // chroma sample at chroma coords (cx, cy): 2×2 mean (4:2:0) or 1:1
      def chroma(f: (Int, Int) => Int)(cx: Int, cy: Int): Int =
        if (!subsample) clampXY(f)(cx, cy)
        else {
          val s = clampXY(f)(2 * cx, 2 * cy) + clampXY(f)(2 * cx + 1, 2 * cy) +
            clampXY(f)(2 * cx, 2 * cy + 1) + clampXY(f)(2 * cx + 1, 2 * cy + 1)
          (s + 2) / 4
        }
      val cbP = chroma(cbPx) _; val crP = chroma(crPx) _
      val cw = if (subsample) (width + 1) / 2 else width
      val chh = if (subsample) (height + 1) / 2 else height
      def chromaClamped(f: (Int, Int) => Int)(cx: Int, cy: Int): Int =
        f(math.min(cx, cw - 1), math.min(cy, chh - 1))

      val head = new java.io.ByteArrayOutputStream()
      head.write(Array(0xFF, 0xD8).map(_.toByte)) // SOI
      head.write(segment(0xE0, "JFIF ".getBytes("US-ASCII") ++
        Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)))
      head.write(segment(0xDB, Array(0.toByte) ++ QTable.map(_.toByte))) // DQT id 0
      val sof = Array[Byte](8) ++ be16(height) ++ be16(width) ++ Array[Byte](3) ++
        Array[Byte](1, ((hmax << 4) | hmax).toByte, 0) ++ // Y
        Array[Byte](2, 0x11, 0) ++ Array[Byte](3, 0x11, 0) // Cb, Cr
      head.write(segment(0xC0, sof))
      def dht(cls: Int, id: Int, h: Huff): Array[Byte] =
        Array(((cls << 4) | id).toByte) ++ (1 to 16).map(h.bits(_).toByte) ++
          h.huffval.map(_.toByte)
      head.write(segment(0xC4, dht(0, 0, DcHuff) ++ dht(1, 0, AcHuff)))
      if (restartInterval > 0)
        head.write(segment(0xDD, be16(restartInterval)))
      head.write(segment(0xDA, Array[Byte](3,
        1, 0x00, 2, 0x00, 3, 0x00, // all components use DC 0 / AC 0
        0, 63, 0)))

      val w = new BitWriter
      var predY = 0; var predCb = 0; var predCr = 0
      var mcu = 0
      val block = new Array[Int](64)
      def loadBlock(sample: (Int, Int) => Int, bx: Int, by: Int): Unit = {
        var i = 0
        while (i < 64) {
          block(i) = sample(bx * 8 + i % 8, by * 8 + i / 8) - 128
          i += 1
        }
      }
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          w.align()
          w.raw(0xFF); w.raw(0xD0 + ((mcu / restartInterval - 1) % 8))
          predY = 0; predCb = 0; predCr = 0
        }
        // luma: hmax×hmax blocks per MCU
        for (by <- 0 until hmax; bx <- 0 until hmax) {
          loadBlock(yP, mx * hmax + bx, my * hmax + by)
          predY = encodeBlock(w, block, predY)
        }
        loadBlock(chromaClamped(cbP), mx, my)
        predCb = encodeBlock(w, block, predCb)
        loadBlock(chromaClamped(crP), mx, my)
        predCr = encodeBlock(w, block, predCr)
        mcu += 1
      }
      w.align()
      head.write(w.bytes)
      head.write(Array(0xFF, 0xD9).map(_.toByte)) // EOI
      head.toByteArray
    }

    // ---------------- decoder ----------------

    private final class BitReader(data: Array[Byte], var pos: Int) {
      private var acc = 0; private var n = 0
      def align(): Unit = { acc = 0; n = 0 }
      def bit(): Int = {
        if (n == 0) {
          require(pos < data.length, "truncated entropy stream")
          val b = data(pos) & 0xff; pos += 1
          if (b == 0xFF) {
            require(pos < data.length, "truncated after 0xFF")
            val m = data(pos) & 0xff
            require(m == 0x00, f"unexpected marker FF$m%02X inside scan")
            pos += 1 // stuffed zero
          }
          acc = b; n = 8
        }
        n -= 1
        (acc >> n) & 1
      }
      def bits(k: Int): Int = {
        var v = 0; var i = 0
        while (i < k) { v = (v << 1) | bit(); i += 1 }
        v
      }
      /** Consume an expected RSTn marker at a byte-aligned position. */
      def restart(expectN: Int): Unit = {
        align()
        require(pos + 1 < data.length, "truncated at restart")
        require((data(pos) & 0xff) == 0xFF &&
          (data(pos + 1) & 0xff) == 0xD0 + expectN,
          f"expected RST$expectN%d, got " +
            f"${data(pos) & 0xff}%02X${data(pos + 1) & 0xff}%02X")
        pos += 2
      }
    }

    private def decodeHuff(r: BitReader, h: Huff): Int = {
      var code = r.bit(); var len = 1
      while (h.maxCode(len) < 0 || code > h.maxCode(len)) {
        require(len < 16, "invalid Huffman code")
        code = (code << 1) | r.bit(); len += 1
      }
      h.huffval(h.valPtr(len) + code - h.minCode(len))
    }

    private def extend(v: Int, t: Int): Int =
      if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

    private final case class Comp(id: Int, h: Int, v: Int, qId: Int,
                                  var dcTab: Int = 0, var acTab: Int = 0,
                                  var pred: Int = 0, var plane: Array[Int] = null,
                                  var planeW: Int = 0)

    /** General baseline decoder. Throws on anything outside 8-bit
      * baseline sequential (progressive, 12-bit, arithmetic coding) and
      * on malformed streams — corrupt payloads fail loud. */
    def decode(bytes: Array[Byte]): Decoded = {
      require(bytes.length > 4 && (bytes(0) & 0xff) == 0xFF &&
        (bytes(1) & 0xff) == 0xD8, "not a JPEG (no SOI)")
      var pos = 2
      val qtabs = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4); val acTabs = new Array[Huff](4)
      var comps: Array[Comp] = null
      var width = -1; var height = -1
      var restartInterval = 0
      def u16(): Int = {
        val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
        pos += 2; v
      }
      var scanStart = -1
      while (scanStart < 0) {
        require(pos + 1 < bytes.length, "truncated marker stream")
        require((bytes(pos) & 0xff) == 0xFF, "expected marker")
        val m = bytes(pos + 1) & 0xff; pos += 2
        m match {
          case 0xDB => // DQT: one or more tables
            val segLen = u16() // NOTE: must read BEFORE taking pos
            val end = pos + segLen - 2
            while (pos < end) {
              val pq = (bytes(pos) & 0xff) >> 4; val tq = bytes(pos) & 0x0f
              require(pq == 0, "only 8-bit quant tables supported")
              pos += 1
              qtabs(tq) = Array.tabulate(64)(k => bytes(pos + k) & 0xff)
              pos += 64
            }
          case 0xC4 => // DHT: one or more tables
            val segLen = u16()
            val end = pos + segLen - 2
            while (pos < end) {
              val tc = (bytes(pos) & 0xff) >> 4; val th = bytes(pos) & 0x0f
              pos += 1
              val counts = Array.tabulate(16)(i => bytes(pos + i) & 0xff)
              pos += 16
              val total = counts.sum
              val vals = Array.tabulate(total)(i => bytes(pos + i) & 0xff)
              pos += total
              var i = 0
              val spec = (1 to 16).map { len =>
                val syms = vals.slice(i, i + counts(len - 1)).toSeq
                i += counts(len - 1)
                len -> syms
              }.filter(_._2.nonEmpty)
              val h = new Huff(spec)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
            }
          case 0xC0 => // SOF0 baseline
            u16()
            require((bytes(pos) & 0xff) == 8, "only 8-bit precision"); pos += 1
            height = u16(); width = u16()
            val nc = bytes(pos) & 0xff; pos += 1
            require(nc == 1 || nc == 3, s"unsupported component count $nc")
            comps = Array.tabulate(nc) { _ =>
              val id = bytes(pos) & 0xff
              val hv = bytes(pos + 1) & 0xff
              val q = bytes(pos + 2) & 0xff
              pos += 3
              Comp(id, hv >> 4, hv & 0x0f, q)
            }
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            throw new IllegalArgumentException(
              f"unsupported SOF marker FF$m%02X (not baseline sequential)")
          case 0xDD => u16(); restartInterval = u16() // DRI
          case 0xDA => // SOS
            u16()
            val ns = bytes(pos) & 0xff; pos += 1
            require(comps != null && ns == comps.length,
              "SOS component count mismatch")
            for (_ <- 0 until ns) {
              val cs = bytes(pos) & 0xff
              val tt = bytes(pos + 1) & 0xff; pos += 2
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException(s"SOS references unknown component $cs"))
              c.dcTab = tt >> 4; c.acTab = tt & 0x0f
            }
            require((bytes(pos) & 0xff) == 0 && (bytes(pos + 1) & 0xff) == 63 &&
              (bytes(pos + 2) & 0xff) == 0, "not a sequential full scan")
            pos += 3
            scanStart = pos
          case 0xD8 => throw new IllegalArgumentException("nested SOI")
          case 0xD9 => throw new IllegalArgumentException("EOI before SOS")
          case _ => // APPn / COM / anything skippable
            // u16() advances pos past the length field itself; += would
            // clobber that advance (pos is read before the call)
            val segLen = u16()
            pos += segLen - 2
        }
      }
      require(width > 0 && height > 0, "no SOF before SOS")

      val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
      val mcuW = 8 * hmax; val mcuH = 8 * vmax
      val mcusX = (width + mcuW - 1) / mcuW
      val mcusY = (height + mcuH - 1) / mcuH
      comps.foreach { c =>
        c.planeW = mcusX * c.h * 8
        c.plane = new Array[Int](c.planeW * mcusY * c.v * 8)
      }
      val r = new BitReader(bytes, scanStart)
      val coef = new Array[Int](64)
      var mcu = 0
      var rstN = 0
      while (mcu < mcusX * mcusY) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          r.restart(rstN % 8)
          rstN += 1
          comps.foreach(_.pred = 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        comps.foreach { c =>
          val q = qtabs(c.qId)
          require(q != null, s"component ${c.id} references missing DQT ${c.qId}")
          val dh = dcTabs(c.dcTab); val ah = acTabs(c.acTab)
          require(dh != null && ah != null,
            s"component ${c.id} references missing DHT")
          for (by <- 0 until c.v; bx <- 0 until c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = decodeHuff(r, dh)
            c.pred += extend(r.bits(t), t)
            coef(0) = c.pred * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(r, ah)
              val run = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (run == 15) k += 16 else eob = true // ZRL vs EOB
              } else {
                k += run
                require(k < 64, "AC run past block end")
                coef(Zigzag(k)) = extend(r.bits(s), s) * q(k)
                k += 1
              }
            }
            val px = idct(coef)
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                c.plane((oy + yy) * c.planeW + ox + xx) = px(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
          }
        }
        mcu += 1
      }
      // upsample to full resolution (nearest neighbor) + crop
      def full(c: Comp): Array[Int] = {
        val sx = hmax / c.h; val sy = vmax / c.v
        Array.tabulate(width * height) { k =>
          val x = k % width; val y = k / width
          c.plane((y / sy) * c.planeW + (x / sx))
        }
      }
      val yP = full(comps(0))
      if (comps.length == 1)
        Decoded(width, height, yP, Array.fill(width * height)(128),
          Array.fill(width * height)(128))
      else Decoded(width, height, yP, full(comps(1)), full(comps(2)))
    }
  }
}
