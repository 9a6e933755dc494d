package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration, sized by
  * deployment shape. All settings are plain Spark confs — nothing custom —
  * so the same library runs under any externally-provided session too.
  */
object GraftSession {

  /** Local development/test shape (what Verify/Bench use). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), shufflePartitions = cores)
      .getOrCreate()

  /** Cluster shape: shuffle partitions sized ~2-3× total executor cores
    * (callers pass the real number); AQE then coalesces small partitions at
    * runtime, so over-provisioning is safe and under-provisioning is not. */
  def cluster(builder: SparkSession.Builder, totalCores: Int): SparkSession.Builder =
    configure(builder, shufflePartitions = totalCores * 3)

  private def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.session.timeZone", "UTC")
    // AQE: runtime coalescing, skew-join splitting, dynamic join strategy —
    // the first line of defense at 100 TB before manual salting (SkewJoin)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // parquet: µs timestamps for cross-engine parity; 128 MB splits keep
    // scan tasks uniform on large files
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    .config("spark.ui.enabled", "false")
}
