package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed
  * partition-parallel.
  *
  * The Spark-side plumbing (schema, batch shape, partition parallelism,
  * deterministic outputs) is real and tested; the codec step itself is a
  * STUB — this container has no image/audio libraries, so `decodeStub`
  * derives deterministic pseudo-features from the payload bytes. A
  * production deployment swaps `decodeStub` for a real codec (JNI/javacv)
  * without touching any of the surrounding plumbing: the decode runs inside
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
}
