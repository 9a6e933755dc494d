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
  * scanline filters — q153), [[Jpeg]] is a real baseline
  * sequential-DCT codec (marker walk, canonical Huffman from DHT,
  * dequant, IDCT, 4:2:0 chroma upsampling, restart markers — q155; pure
  * math, no library), [[Gif]] is a real dictionary-coded codec (GIF87a
  * with true variable-width LZW — q156), and [[G711]] expands the
  * companded telephony formats (μ-law/A-law WAV — q157). Only
  * PERCEPTUAL audio/video (MP3/H.264-class) remains stubbed via
  * `decodeStub`'s deterministic
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
    * little-endian sample extraction. Also expands the G.711-companded
    * telephony formats (fmt 6/7 — see [[G711]]) to linear PCM16;
    * transform-coded audio (MP3-class) remains stubbed: no codec libs in
    * this container. */
  object Wav {
    final case class Decoded(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, samples: Array[Short],
                             /** WAVE fmt tag: 1 PCM, 6 A-law, 7 μ-law */
                             formatTag: Int = 1)

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
      var rate = -1; var channels = -1; var bits = -1; var fmtTag = -1
      var samples: Array[Short] = null
      while (b.remaining() >= 8 && samples == null) {
        val id = fourcc(); val size = b.getInt
        // a corrupt NEGATIVE size would rewind the cursor (the skip arm
        // advances by size) and spin this loop forever — one bad blob
        // must fail loud, not hang an executor core
        require(size >= 0 && size <= b.remaining(),
          s"corrupt WAVE chunk '$id': size=$size with ${b.remaining()} bytes left")
        id match {
          case "fmt " =>
            fmtTag = b.getShort.toInt
            require(fmtTag == 1 || fmtTag == 6 || fmtTag == 7,
              s"unsupported WAVE format (fmt=$fmtTag)")
            channels = b.getShort.toInt
            rate = b.getInt
            b.getInt; b.getShort // byte rate, block align
            bits = b.getShort.toInt
            if (fmtTag == 1) require(bits == 16, s"only PCM16 supported (bits=$bits)")
            else require(bits == 8, s"G.711 is 8-bit (bits=$bits)")
            b.position(b.position() + (size - 16)) // fmt extensions (cbSize)
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            samples =
              if (fmtTag == 1) Array.fill(size / 2)(b.getShort)
              else {
                val raw = new Array[Byte](size); b.get(raw)
                val expand: Int => Int =
                  if (fmtTag == 7) G711.ulawToPcm else G711.alawToPcm
                raw.map(v => expand(v & 0xff).toShort)
              }
          case _ => b.position(b.position() + size + (size & 1)) // skip, pad
        }
      }
      require(samples != null, "no data chunk")
      Decoded(rate, channels, bits, samples, fmtTag)
    }
  }

  /** REAL audio codec for the COMPANDED case: ITU-T G.711 μ-law and
    * A-law expansion to linear PCM16 — the log-companded 8-bit telephony
    * format (public ITU-T Recommendation G.711, 1972). Stateless per
    * sample, so unlike ADPCM the decode is closed-form arithmetic the
    * oracle can recompute in SQL: μ-law is complement → (mantissa·8 +
    * 132) << exponent − 132 with bit 7 as sign; A-law is XOR 0x55 →
    * segment expansion with INVERTED sign convention (bit 7 set means
    * positive). Spec vectors pinned in the unit test: 0xFF→0 and
    * 0x80→+32124 (μ), 0x55→−8 and 0x2A→−32256 (A).
    *
    * Reference behavior: the reference platform stores media blobs
    * opaquely (web_scheduler.py upload handling); decode surfaces are
    * the training-pipeline extension. */
  object G711 {
    /** μ-law byte → linear PCM16 (BIAS 0x84). */
    def ulawToPcm(b: Int): Int = {
      val u = (~b) & 0xff
      val v = ((((u & 0xf) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
      if ((u & 0x80) != 0) -v else v
    }

    /** A-law byte → linear PCM16 (even bits inverted on the wire). */
    def alawToPcm(b: Int): Int = {
      val a = (b ^ 0x55) & 0xff
      val exp = (a >> 4) & 7
      val man = a & 0xf
      val v = if (exp == 0) (man << 4) + 8
              else ((man << 4) + 0x108) << (exp - 1)
      if ((a & 0x80) != 0) v else -v
    }

    /** Mono companded WAV writer: fmt tag 7 (μ-law) or 6 (A-law),
      * 8 bits/sample, 18-byte fmt chunk (non-PCM formats carry the
      * cbSize extension field — fmt size 16 here would be malformed),
      * and a RIFF pad byte when the data chunk is odd-sized. */
    def synth(formatTag: Int, sampleRate: Int, data: Array[Byte]): Array[Byte] = {
      require(formatTag == 6 || formatTag == 7, s"not G.711 (tag=$formatTag)")
      val pad = data.length & 1
      val out = java.nio.ByteBuffer.allocate(12 + 26 + 8 + data.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII"))
        .putInt(4 + 26 + 8 + data.length + pad)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(18)
        .putShort(formatTag.toShort).putShort(1) // mono
        .putInt(sampleRate).putInt(sampleRate) // byte rate: 1 byte/sample
        .putShort(1).putShort(8) // block align, bits
        .putShort(0) // cbSize
        .put("data".getBytes("US-ASCII")).putInt(data.length)
        .put(data)
      out.array() // trailing pad byte (if any) stays zero
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

  /** REAL image codec for the DICTIONARY-CODED case: GIF87a — logical
    * screen descriptor, packed global color table, image descriptor and
    * true variable-width LZW (clear/EOI codes, code width growth 5→12,
    * dictionary reset at 4096, KwKwK self-reference, 255-byte
    * sub-blocks). The encoder and decoder share nothing but the spec;
    * a bit-packing or dictionary bug on either side breaks the exact
    * pixel aggregates. Complements Png (entropy/zlib) and Jpeg
    * (transform-coded): this is the dictionary-coded family.
    *
    * Reference behavior: the reference platform stores media blobs
    * opaquely (web_scheduler.py upload handling); the decode surface is
    * the training-pipeline extension, spec per GIF87a (CompuServe 1987,
    * public domain spec) and Welch's LZW (IEEE Computer 1984). */
  object Gif {
    final case class Decoded(width: Int, height: Int,
                             /** row-major top-down (r,g,b) triples */
                             pixels: Array[(Int, Int, Int)])

    private val MinCodeSize = 4 // 16-color palette

    /** Write a single-frame GIF87a with a 16-entry global color table.
      * `palette(j)` gives color j; `pix(x,y)` gives the palette index. */
    def synth(width: Int, height: Int,
              palette: Int => (Int, Int, Int),
              pix: (Int, Int) => Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF87a".getBytes("US-ASCII"))
      // logical screen descriptor: w, h (LE16), packed, bg index, aspect
      out.write(width & 0xff); out.write(width >> 8)
      out.write(height & 0xff); out.write(height >> 8)
      // global color table flag=1, color resolution=7, size bits = 3 (2^4)
      out.write(0x80 | (7 << 4) | 3)
      out.write(0); out.write(0)
      var j = 0
      while (j < 16) {
        val (r, g, b) = palette(j)
        out.write(r); out.write(g); out.write(b)
        j += 1
      }
      // image descriptor: separator, left, top, w, h, packed (no LCT)
      out.write(0x2c)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(width & 0xff); out.write(width >> 8)
      out.write(height & 0xff); out.write(height >> 8)
      out.write(0)
      out.write(MinCodeSize)
      out.write(lzwEncode(Array.tabulate(width * height)(k =>
        pix(k % width, k / width))))
      out.write(0) // block terminator
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** GIF-variant LZW: clear code emitted first, codes packed LSB-first,
      * dictionary reset via clear code when the table fills at 4096.
      * Code-width accounting is keyed to the DATA-CODE COUNT since the
      * last clear (`cnt`), not the real dictionary size: the decoder's
      * table add for code *n* mirrors the encoder's add at code *n−1*
      * (one behind), and the encoder's final pre-EOI code has no add at
      * all — counting emitted/read data codes on both sides is the one
      * scheme that keeps the width of every code position, EOI included,
      * bit-identical. Returns the data sub-block stream (length-prefixed
      * 255-byte chunks, no 0 terminator). */
    private def lzwEncode(indexes: Array[Int]): Array[Byte] = {
      val clear = 1 << MinCodeSize
      val eoi = clear + 1
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nAcc = 0
      var codeWidth = MinCodeSize + 1
      def put(code: Int): Unit = {
        acc |= code.toLong << nAcc; nAcc += codeWidth
        while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
      }
      var dict = new java.util.HashMap[Long, Integer]()
      var cnt = eoi + 1 // next add slot AND width counter (equal on this side)
      put(clear)
      var w = -1
      var i = 0
      while (i < indexes.length) {
        val k = indexes(i)
        if (w < 0) w = k
        else {
          val key = w.toLong << 12 | k.toLong
          val hit = dict.get(key)
          if (hit != null) w = hit.intValue()
          else if (cnt < 4096) {
            put(w)
            dict.put(key, Integer.valueOf(cnt))
            cnt += 1
            if (cnt == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
            w = k
          } else { // table full: flush w, reset via clear
            put(w)
            put(clear)
            dict = new java.util.HashMap[Long, Integer]()
            cnt = eoi + 1
            codeWidth = MinCodeSize + 1
            w = k
          }
        }
        i += 1
      }
      if (w >= 0) {
        put(w) // flush code has no add, but still advances the width counter
        cnt += 1
        if (cnt == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
      }
      put(eoi)
      if (nAcc > 0) bits.write((acc & 0xff).toInt)
      // chunk into 255-byte sub-blocks
      val raw = bits.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      var off = 0
      while (off < raw.length) {
        val n = math.min(255, raw.length - off)
        out.write(n)
        out.write(raw, off, n)
        off += n
      }
      out.toByteArray
    }

    /** Parse + LZW-decode a GIF87a/89a stream; throws on malformed
      * input. Handles extension blocks (skip), KwKwK codes, width
      * growth and clear-code resets. */
    def decode(bytes: Array[Byte]): Decoded = {
      var p = 0
      def u8(): Int = {
        require(p < bytes.length, "truncated GIF")
        val v = bytes(p) & 0xff; p += 1; v
      }
      def u16(): Int = { val v = u8(); v | (u8() << 8) }
      require(bytes.length >= 13, "truncated GIF")
      val sig = new String(bytes, 0, 6, "US-ASCII"); p = 6
      require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: $sig")
      val sw = u16(); val sh = u16()
      val packed = u8(); u8(); u8() // bg index, aspect
      val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
      val palette = Array.fill(gctSize)((u8(), u8(), u8()))
      var result: Decoded = null
      while (result == null) {
        u8() match {
          case 0x3b => throw new IllegalArgumentException("trailer before image")
          case 0x21 => // extension: label, then sub-blocks
            u8()
            var n = u8()
            while (n != 0) {
              require(p + n <= bytes.length, "truncated GIF")
              p += n; n = u8()
            }
          case 0x2c =>
            u16(); u16() // left, top
            val w = u16(); val h = u16()
            val ip = u8()
            require((ip & 0x80) == 0, "local color tables unsupported")
            require((ip & 0x40) == 0, "interlace unsupported")
            require(w <= sw && h <= sh, "image exceeds screen")
            val minCode = u8()
            // gather sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              require(p + n <= bytes.length, "truncated GIF")
              data.write(bytes, p, n); p += n; n = u8()
            }
            val idx = lzwDecode(data.toByteArray, minCode, w * h)
            require(palette.nonEmpty, "no global color table")
            result = Decoded(w, h, idx.map { j =>
              require(j < palette.length, s"index $j outside palette")
              palette(j)
            })
          case other =>
            throw new IllegalArgumentException(f"unknown block 0x$other%02x")
        }
      }
      result
    }

    private def lzwDecode(data: Array[Byte], minCode: Int,
                          nPixels: Int): Array[Int] = {
      val clear = 1 << minCode
      val eoi = clear + 1
      var codeWidth = minCode + 1
      var acc = 0L; var nAcc = 0; var p = 0
      def next(): Int = {
        while (nAcc < codeWidth) {
          require(p < data.length, "LZW stream truncated")
          acc |= (data(p) & 0xffL) << nAcc; p += 1; nAcc += 8
        }
        val v = (acc & ((1L << codeWidth) - 1)).toInt
        acc >>= codeWidth; nAcc -= codeWidth
        v
      }
      val out = new Array[Int](nPixels)
      var outN = 0
      // table of sequences: prefix code + final byte per entry
      val prefix = new Array[Int](4096)
      val suffix = new Array[Int](4096)
      var nextFree = eoi + 1 // real table slot (lags the encoder by one add)
      var cnt = eoi + 1 // width counter: one per data code, mirrors encoder
      var prev = -1
      val stack = new Array[Int](4096)
      def emit(code: Int): Int = { // writes sequence, returns first index
        var d = 0; var c = code
        while (c >= clear) { stack(d) = suffix(c); d += 1; c = prefix(c) }
        val first = c
        require(outN + d + 1 <= nPixels, "LZW output overflows image")
        out(outN) = first; outN += 1
        while (d > 0) { d -= 1; out(outN) = stack(d); outN += 1 }
        first
      }
      var done = false
      while (!done) {
        val code = next()
        if (code == eoi) done = true
        else if (code == clear) {
          nextFree = eoi + 1; cnt = eoi + 1
          codeWidth = minCode + 1; prev = -1
        } else {
          if (prev < 0) {
            require(code < clear, "first code after clear must be literal")
            emit(code); prev = code
          } else {
            require(code < clear || code <= nextFree, s"bad LZW code $code")
            val first =
              if (code == nextFree) { // KwKwK: sequence = prev + first(prev)
                val f = emit(prev)
                require(outN + 1 <= nPixels, "LZW output overflows image")
                out(outN) = f; outN += 1
                f
              } else emit(code)
            if (nextFree < 4096) {
              prefix(nextFree) = prev; suffix(nextFree) = first
              nextFree += 1
            }
            prev = code
          }
          cnt += 1
          if (cnt == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
      }
      require(outN == nPixels, s"decoded $outN of $nPixels pixels")
      out
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
