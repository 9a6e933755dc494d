package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  private def media = {
    import spark.implicits._
    Seq(
      Multimodal.MediaRow(1L, "image", "payload-one".getBytes("UTF-8"), 64, 64, 0, 0),
      Multimodal.MediaRow(2L, "video", "payload-two-longer".getBytes("UTF-8"), 128, 128, 0, 10),
      Multimodal.MediaRow(3L, "audio", Array.emptyByteArray, 0, 0, 16000, 0)
    ).toDS()
  }

  test("extractFeatures: fixed-dim deterministic features, batch shape (mapPartitions)") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == 16))
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq) // deterministic
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.map(_.n_bytes).toSeq == Seq(11L, 18L, 0L))
    // features are bounded in [-1, 1]
    assert(f1.flatMap(_.features).forall(v => v >= -1f && v <= 1f))
  }

  test("payloadStats computes byte length / crc / md5 without any codec") {
    val stats = Multimodal.payloadStats(media.toDF()).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(stats(1L) == 11 && stats(2L) == 18 && stats(3L) == 0)
  }

  test("sampleFrameIndexes yields stride-spaced indexes bounded by n_frames") {
    val idx = Multimodal.sampleFrameIndexes(media.toDF(), stride = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(idx(2L).toSeq == Seq(0, 3, 6, 9))
    assert(idx(3L).toSeq == Seq(0)) // n_frames=0 clamps to a single index
  }

  test("Wav: PCM16 writer/parser roundtrip, chunk-walk tolerance, fail-loud") {
    val samples = Array.tabulate(300)(i => ((i * 1103) % 65536 - 32768).toShort)
    val bytes = Multimodal.Wav.synth(16000, samples)
    assert(bytes.length == 44 + 600)
    val d = Multimodal.Wav.decode(bytes)
    assert(d.sampleRate == 16000 && d.channels == 1 && d.bitsPerSample == 16)
    assert(d.samples.sameElements(samples))
    // real RIFF files carry extra chunks (LIST, fact) between fmt and data:
    // splice one in and the chunk walker must skip it
    val extra = java.nio.ByteBuffer.allocate(bytes.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(bytes, 0, 36) // up to end of fmt chunk
    extra.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))
    extra.put(bytes, 36, bytes.length - 36)
    val d2 = Multimodal.Wav.decode(extra.array())
    assert(d2.samples.sameElements(samples))
    // corrupt payloads fail loud, never yield garbage features
    intercept[IllegalArgumentException](
      Multimodal.Wav.decode("nonsense-bytes".getBytes))
    val mp3ish = bytes.clone(); mp3ish(0) = 'I'; mp3ish(1) = 'D'
    intercept[IllegalArgumentException](Multimodal.Wav.decode(mp3ish))
    // a NEGATIVE chunk size (corrupt length field on a skipped chunk) must
    // fail loud — pre-guard it rewound the cursor and spun the chunk walk
    // forever, hanging an executor core on one bad blob
    val negChunk = extra.array().clone()
    val nb = java.nio.ByteBuffer.wrap(negChunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nb.putInt(40, -8) // the spliced LIST chunk's size field
    val e = intercept[IllegalArgumentException](Multimodal.Wav.decode(negChunk))
    assert(e.getMessage.contains("corrupt WAVE chunk"), e.getMessage)
    // and an overlong size (past the remaining bytes) fails the same way
    val bigChunk = extra.array().clone()
    java.nio.ByteBuffer.wrap(bigChunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(40, Int.MaxValue)
    intercept[IllegalArgumentException](Multimodal.Wav.decode(bigChunk))
  }

  test("Bmp: 24bpp writer/parser roundtrip incl. the row-padding arithmetic") {
    // width 5 → row 15 bytes + 1 pad; decode must skip pads and un-flip
    // the bottom-up row order and BGR channel order
    val px = (x: Int, y: Int) => (x * 40 % 256, y * 60 % 256, (x + y) % 256)
    val bytes = Multimodal.Bmp.synth(5, 3, px)
    assert(Multimodal.Bmp.rowSize(5) == 16)
    assert(bytes.length == 54 + 16 * 3)
    val d = Multimodal.Bmp.decode(bytes)
    assert(d.width == 5 && d.height == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(d.pixels(y * 5 + x) == px(x, y), s"pixel ($x,$y)")
    // exact-multiple width has no padding — both branches covered
    val b4 = Multimodal.Bmp.synth(4, 2, px)
    assert(b4.length == 54 + 12 * 2)
    assert(Multimodal.Bmp.decode(b4).pixels(7) == px(3, 1))
    intercept[IllegalArgumentException](
      Multimodal.Bmp.decode(Array[Byte](1, 2, 3, 4)))
  }

  test("Png: compressed roundtrip through all five scanline filters; CRC and truncation fail loud") {
    val px = (x: Int, y: Int) => (x * 37 % 256, (y * 53 + 7) % 256, (x * 3 + y * 11) % 256)
    // height 7 > 5 rows: filters None/Sub/Up/Average/Paeth all exercised
    // (writer assigns filter y % 5), so the roundtrip proves every
    // unfilter reconstruction, not just the trivial one
    val bytes = Multimodal.Png.synth(6, 7, px)
    assert(bytes.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val d = Multimodal.Png.decode(bytes)
    assert(d.width == 6 && d.height == 7)
    for (y <- 0 until 7; x <- 0 until 6)
      assert(d.pixels(y * 6 + x) == px(x, y), s"pixel ($x,$y)")
    // 1×1 and wide-short shapes (single filter row, no up neighbor)
    assert(Multimodal.Png.decode(Multimodal.Png.synth(1, 1, px)).pixels
      .sameElements(Array(px(0, 0))))
    assert(Multimodal.Png.decode(Multimodal.Png.synth(9, 2, px)).pixels(9 + 4)
      == px(4, 1))
    // a flipped IDAT byte must break the chunk CRC, not yield garbage
    val corrupt = bytes.clone()
    corrupt(bytes.length - 20) = (corrupt(bytes.length - 20) ^ 0x5a).toByte
    intercept[IllegalArgumentException](Multimodal.Png.decode(corrupt))
    // truncation and non-PNG input fail loud
    intercept[IllegalArgumentException](
      Multimodal.Png.decode(bytes.take(bytes.length - 6)))
    intercept[IllegalArgumentException](
      Multimodal.Png.decode("not-a-png-at-all".getBytes))
  }

  test("Png: FDICT zlib stream fails loud instead of spinning the inflate loop") {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
        .array()
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(1).putInt(1)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    // zlib header CMF=0x78 FLG=0x20: FDICT bit set, (CMF·256+FLG)%31==0,
    // followed by a 4-byte DICTID. Inflater.inflate returns 0 on this
    // with needsInput()==false and needsDictionary()==true — the exact
    // shape that used to pass the needsInput-only check and loop forever.
    val fdictIdat = Array(0x78, 0x20, 0x00, 0x00, 0x00, 0x01).map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdictIdat) ++
      chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException](Multimodal.Png.decode(png))
    assert(e.getMessage.contains("FDICT"))
  }

  // the q155 plane functions: constant per 8×8 luma block / 16×16
  // original-pixel chroma cell — the shapes the flat-block DC-exactness
  // argument (Multimodal.Jpeg scaladoc) makes lossless end-to-end
  private def jy(id: Long)(x: Int, y: Int): Int =
    ((id * 7 + 31 * (x / 8) + 17 * (y / 8)) % 256).toInt
  private def jcb(id: Long)(x: Int, y: Int): Int =
    ((id * 11 + 13 * (x / 16) + 7 * (y / 16)) % 256).toInt
  private def jcr(id: Long)(x: Int, y: Int): Int =
    ((id * 5 + 3 * (x / 16) + 29 * (y / 16)) % 256).toInt

  test("Jpeg: flat-block images roundtrip EXACTLY through 4:2:0 + restarts (the q155 oracle contract)") {
    for (id <- 0L to 12L) {
      val w = 8 + 4 * (id % 5).toInt; val h = 8 + 8 * (id % 3).toInt
      val ri = if (id % 3 == 0) 2 else 0 // exercise DRI/RSTn on a third of ids
      val bytes = Multimodal.Jpeg.synth(w, h, jy(id), jcb(id), jcr(id),
        subsample = true, restartInterval = ri)
      assert((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8)
      val d = Multimodal.Jpeg.decode(bytes)
      assert(d.width == w && d.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        assert(d.y(y * w + x) == jy(id)(x, y), s"id=$id Y($x,$y)")
        assert(d.cb(y * w + x) == jcb(id)(x, y), s"id=$id Cb($x,$y)")
        assert(d.cr(y * w + x) == jcr(id)(x, y), s"id=$id Cr($x,$y)")
      }
    }
    // restart every MCU: every MCU boundary byte-aligns and checks the
    // RSTn modulo sequence — a numbering bug trips the decoder's require
    val b1 = Multimodal.Jpeg.synth(40, 40, jy(3L), jcb(3L), jcr(3L),
      subsample = true, restartInterval = 1)
    val d1 = Multimodal.Jpeg.decode(b1)
    assert(d1.y(40 * 39 + 39) == jy(3L)(39, 39))
  }

  test("Jpeg: general images decode with bounded quantization error; 4:4:4; fail-loud") {
    // smooth gradient, no mod-256 wrap (a wrap is a sharp edge — ringing)
    val yv = (x: Int, y: Int) => x * 4 + y * 3
    val cb = (x: Int, y: Int) => 64 + x * 2
    val cr = (x: Int, y: Int) => 200 - y * 3
    val bytes = Multimodal.Jpeg.synth(24, 16, yv, cb, cr, subsample = false)
    val d = Multimodal.Jpeg.decode(bytes)
    assert(d.width == 24 && d.height == 16)
    val errs = for (y <- 0 until 16; x <- 0 until 24)
      yield math.abs(d.y(y * 24 + x) - yv(x, y))
    assert(errs.max <= 32, s"max quantization error ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 6.0,
      s"mean quantization error ${errs.sum.toDouble / errs.size}")
    // deterministic bytes and decode
    assert(Multimodal.Jpeg.synth(24, 16, yv, cb, cr, subsample = false)
      .sameElements(bytes))
    // fail-loud: non-JPEG, truncated scan, progressive SOF
    intercept[IllegalArgumentException](
      Multimodal.Jpeg.decode("not-a-jpeg".getBytes))
    intercept[IllegalArgumentException](
      Multimodal.Jpeg.decode(bytes.take(bytes.length - 30)))
    val prog = bytes.clone()
    var i = 2
    while (!((prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0)) i += 1
    prog(i + 1) = 0xC2.toByte // SOF0 → SOF2 (progressive)
    val e = intercept[IllegalArgumentException](Multimodal.Jpeg.decode(prog))
    assert(e.getMessage.contains("baseline"))
  }

  test("Jpeg: the byte-stuffing path is actually exercised and reversible") {
    // find an image whose entropy stream contains a stuffed 0xFF00
    // (markers never carry 00, so FF00 can only come from stuffing).
    // Flat-block streams structurally almost never hit 0xFF — EOB '00'
    // lands every ~14 bits and caps one-runs — so this uses AC-rich
    // pseudo-random pixels, where the len-10 AC codes and magnitude bits
    // sweep the byte space. Exactness can't be asserted on a lossy
    // general image; instead the bounded-error check below catches what
    // a stuffing bug actually does — a desynced Huffman stream decodes
    // to garbage (mean error ~80 on random pixels) or throws, far
    // outside the quantization bound.
    // Alternating 0/255 luma blocks make every other DC magnitude the
    // 8-one-bit '11111111'; the flat chroma VALUE shifts the global bit
    // alignment by its first-block DC category, so some (chroma, width)
    // in this family must land a magnitude on a byte boundary = 0xFF.
    // (AC-rich random images can't: quantized AC values top out at 128,
    // so AC magnitudes never carry 8 ones — measured 0 stuffed bytes in
    // 100 random 48×48 frames.)
    def alt(x: Int, y: Int): Int = if (((x / 8) + (y / 8)) % 2 == 0) 0 else 255
    def hasStuffing(b: Array[Byte]): Boolean =
      (0 until b.length - 1).exists(i =>
        (b(i) & 0xff) == 0xFF && (b(i + 1) & 0xff) == 0x00)
    val hit = (for (cb <- 99 to 130; w <- Seq(16, 24, 32, 40)) yield (cb, w))
      .find { case (cb, w) =>
        hasStuffing(Multimodal.Jpeg.synth(w, 16, alt, (_, _) => cb,
          (_, _) => 163, subsample = false))
      }
    assert(hit.nonEmpty, "no (chroma, width) in the family stuffed a byte")
    val (cb, w) = hit.get
    // flat-block image ⇒ the stuffed stream must still roundtrip EXACTLY
    val d = Multimodal.Jpeg.decode(Multimodal.Jpeg.synth(w, 16, alt,
      (_, _) => cb, (_, _) => 163, subsample = false))
    for (y <- 0 until 16; x <- 0 until w) {
      assert(d.y(y * w + x) == alt(x, y), s"cb=$cb w=$w Y($x,$y)")
      assert(d.cb(y * w + x) == cb && d.cr(y * w + x) == 163)
    }
  }

  // ---- G.711 companded audio ----

  test("G711: mu-law and A-law spec vectors and table symmetry") {
    // ITU-T G.711 published table endpoints
    assert(Multimodal.G711.ulawToPcm(0xff) == 0) // +0
    assert(Multimodal.G711.ulawToPcm(0x7f) == 0) // -0
    assert(Multimodal.G711.ulawToPcm(0x80) == 32124) // max positive
    assert(Multimodal.G711.ulawToPcm(0x00) == -32124) // max negative
    assert(Multimodal.G711.alawToPcm(0xd5) == 8) // smallest positive
    assert(Multimodal.G711.alawToPcm(0x55) == -8) // smallest negative
    assert(Multimodal.G711.alawToPcm(0xaa) == 32256) // max positive
    assert(Multimodal.G711.alawToPcm(0x2a) == -32256) // max negative
    // b and b^0x80 are exact negations in both codings -> tables sum to 0
    assert((0 until 256).map(Multimodal.G711.ulawToPcm).sum == 0)
    assert((0 until 256).map(Multimodal.G711.alawToPcm).sum == 0)
    // mu-law magnitude is monotonic within the positive half
    val pos = (0x80 to 0xff).map(Multimodal.G711.ulawToPcm).reverse
    assert(pos == pos.sorted)
  }

  test("G711 WAV roundtrip: fmt 6/7 parse, 18-byte fmt chunk, odd-size pad") {
    val data = Array.tabulate(255)(i => ((i * 7) % 256).toByte) // odd length
    for (tag <- Seq(6, 7)) {
      val bytes = Multimodal.G711.synth(tag, 8000, data)
      assert(bytes.length == 12 + 26 + 8 + 255 + 1) // incl. RIFF pad byte
      val d = Multimodal.Wav.decode(bytes)
      assert(d.formatTag == tag && d.sampleRate == 8000)
      assert(d.samples.length == 255)
      val expand: Int => Int =
        if (tag == 7) Multimodal.G711.ulawToPcm else Multimodal.G711.alawToPcm
      assert(d.samples.toSeq == data.toSeq.map(b => expand(b & 0xff).toShort))
    }
  }

  test("Wav.decode still rejects non-audio formats loudly") {
    val pcm = Multimodal.Wav.synth(16000, Array[Short](1, 2, 3))
    // corrupt the format tag to 2 (ADPCM, unsupported)
    pcm(20) = 2
    intercept[IllegalArgumentException](Multimodal.Wav.decode(pcm))
  }

  // ---- GIF87a / LZW ----

  private def gifPalette(id: Long)(j: Int): (Int, Int, Int) =
    (((id * 3 + j * 17) % 256).toInt, ((id * 7 + j * 23) % 256).toInt,
     ((id * 11 + j * 29) % 256).toInt)

  test("Gif roundtrip: structured pixels across sizes") {
    for (id <- 0L until 24L) {
      val w = 4 + (id % 5).toInt; val h = 5 + (id % 4).toInt
      val pix = (x: Int, y: Int) => ((id + 5 * x + 7 * y) % 16).toInt
      val d = Multimodal.Gif.decode(Multimodal.Gif.synth(w, h, gifPalette(id), pix))
      assert(d.width == w && d.height == h)
      val expect = Array.tabulate(w * h)(k => gifPalette(id)(pix(k % w, k / w)))
      assert(d.pixels.toSeq == expect.toSeq)
    }
  }

  test("Gif LZW: constant image triggers the KwKwK code path") {
    val d = Multimodal.Gif.decode(
      Multimodal.Gif.synth(16, 16, gifPalette(5L), (_, _) => 3))
    assert(d.pixels.forall(_ == gifPalette(5L)(3)))
  }

  test("Gif LZW: large image crosses width growth and the 4096 reset") {
    // 256x256 = 64k hash-noisy pixels: average LZW match length stays
    // short, so the code table fills past 4095 several times over -> the
    // encoder must emit mid-stream clears; every width 5..12 is used
    val pix = (x: Int, y: Int) =>
      (((x * 2654435761L + y * 40503L) >> 3) % 16).toInt
    val d = Multimodal.Gif.decode(Multimodal.Gif.synth(256, 256, gifPalette(9L), pix))
    assert(d.width == 256 && d.height == 256)
    val expect = Array.tabulate(256 * 256)(k => gifPalette(9L)(pix(k % 256, k / 256)))
    assert(d.pixels.toSeq == expect.toSeq)
  }

  test("Gif.decode fails loud on malformed input") {
    val good = Multimodal.Gif.synth(5, 5, gifPalette(1L), (x, y) => (x + y) % 16)
    intercept[IllegalArgumentException](
      Multimodal.Gif.decode("NOTAGIF".getBytes("US-ASCII") ++ good))
    // truncated LZW stream
    intercept[IllegalArgumentException](
      Multimodal.Gif.decode(good.dropRight(8) :+ 0.toByte :+ 0x3b.toByte))
  }
}
