package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * At cluster scale each of these would be a catalog table (partitioned,
  * possibly bucketed); here they are plain parquet scans. Column pruning and
  * predicate pushdown reach the scan because every downstream operator stays
  * declarative (no collect/UDF between read and filter).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-schema memo keyed by (path, content stamp): every query
    * construction re-reads the parquet footer(s) to infer the same schema
    * (driver-side work per call, hundreds of constructions per bench
    * run) — supplying the cached schema skips inference entirely while a
    * regenerated corpus (new stamp) still re-infers. Clear-on-threshold
    * bounded like the other content-stamp memos. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def read(spark: SparkSession, path: String): DataFrame = {
    val key = path + "@" + Warehouse.sourceStamp(path)
    var schema = schemaCache.get(key)
    if (schema == null) {
      schema = spark.read.parquet(path).schema
      if (schemaCache.size > 1024) schemaCache.clear()
      schemaCache.put(key, schema)
    }
    spark.read.schema(schema).parquet(path)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS). What Spark infers for it
      // varies by build: 4.1.2 in this sandbox reads it NATIVELY as
      // TIMESTAMP_NTZ (micros truncation — the corpus is micro-precision,
      // ns % 1000 == 0 everywhere, so lossless); older builds reject NANOS
      // unless `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
      // build in GraftSession/SparkSuite) maps it to a raw nanos LONG.
      // Adapt to what THIS reader inferred instead of assuming either —
      // r6 post-mortem: assuming the long mapping made every events query
      // fail analysis when a Spark upgrade turned the conf into a no-op.
      // The long branch also covers test fixtures that write ts as a plain
      // int64 of nanos. Integer `div` — double division would lose
      // precision above 2^53 ns.
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val df = read(spark, s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case TimestampNTZType => df
        // session TZ is UTC, so instant→ntz is the identity on the clock face
        case TimestampType => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
        case other => sys.error(s"events.ts: unexpected parquet mapping $other")
      }
    } else read(spark, s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for the SQL execution engine). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
