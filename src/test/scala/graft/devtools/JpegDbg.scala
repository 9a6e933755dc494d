package graft.devtools
object JpegDbg {
  def main(args: Array[String]): Unit = {
    def jr(k: Long)(x: Int, y: Int): Int =
      ((x * 31 + y * 57 + x * y * 13 + k * 29) % 256).toInt
    val b = graft.functions.Multimodal.Jpeg.synth(48, 48, jr(0), (_, _) => 99, (_, _) => 163, subsample = false)
    println("len=" + b.length)
    val hist = b.groupBy(x => x & 0xff).map { case (k, v) => k -> v.length }
    println("nFF=" + hist.getOrElse(0xFF, 0) + " maxByte=" + hist.keys.max)
    // where does the scan start
    var pos = 2
    var scan = -1
    while (scan < 0) {
      val m = b(pos + 1) & 0xff
      val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      if (m == 0xDA) scan = pos + 2 + len else pos += 2 + len
    }
    println("scan bytes=" + (b.length - scan))
    val scanBytes = b.slice(scan, b.length - 2)
    println("scan nFF=" + scanBytes.count(x => (x & 0xff) == 0xFF))
    // bit-one density in scan
    val ones = scanBytes.map(x => Integer.bitCount(x & 0xff)).sum
    println("one-bit density=" + ones.toDouble / (scanBytes.length * 8))
  }
}
