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

  /** Scheduler-pool names: FAIR scheduling between pools keeps an API
    * query responsive while a long task job runs (the reference serves 4
    * gunicorn workers concurrently with the scheduler daemon). Pools are
    * created on demand; callers tag their thread via [[usePool]]. */
  val ServePool = "graft-serve"
  val TasksPool = "graft-tasks"

  /** Tag the CURRENT thread's Spark jobs with a FAIR pool (inherited by
    * child threads; no-op scheduling-wise unless spark.scheduler.mode=FAIR,
    * which [[configure]] sets). */
  def usePool(spark: SparkSession, pool: String): Unit =
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)

  private def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    // FAIR across pools: serving threads (ServePool) and the scheduler
    // daemon (TasksPool) each get a fair share of executor slots instead of
    // FIFO head-of-line blocking behind a long task job
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.session.timeZone", "UTC")
    // AQE: runtime coalescing, skew-join splitting, dynamic join strategy —
    // the first line of defense at 100 TB before manual salting (SkewJoin)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // runtime bloom-filter pruning: for a shuffle join whose small side
    // is a selective filter-over-scan (filtered fact-fact joins) the
    // optimizer injects a bloom filter built from that side's join keys
    // into the big side's scan — rows that cannot match are dropped
    // BEFORE the exchange, cutting shuffled bytes at 100 TB where it
    // matters most. Off by default in Spark; the thresholds keep it to
    // genuinely selective cases (injection fires — PlanAuditSpec).
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // NOTE: spark.sql.files.ignoreMissingFiles stays FALSE (default) for
    // the data path — a pipeline must fail loudly on incomplete input.
    // CatalogStore.read sets the option per read for catalog tables only,
    // where a scan racing a log compaction should degrade, not 500.
    // parquet: µs timestamps for cross-engine parity; 128 MB splits keep
    // scan tasks uniform on large files
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    // TIMESTAMP(NANOS) parquet (events.ts): Spark 4.1.2 here reads it
    // NATIVELY as TIMESTAMP_NTZ and this conf is a no-op; on older builds
    // that reject NANOS it maps the column to a raw nanos long instead of
    // failing the scan. Kept for that portability only — Tables.load
    // adapts to whichever mapping the reader produced (r6 post-mortem:
    // code that ASSUMED the long mapping broke when the native read
    // appeared). A session constant: never toggled at runtime.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
}
