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
}
