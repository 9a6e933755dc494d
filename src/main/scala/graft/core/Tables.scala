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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark does not read
      // natively; read the raw int64 and convert. The corpus is
      // micro-precision (ns % 1000 == 0 everywhere), so `div 1000` is
      // lossless. Integer div — double division would lose precision above
      // 2^53 ns.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TIMESTAMP_NTZ: the source column is naive (isAdjustedToUTC=false);
      // session TZ is UTC so the instant→ntz cast is the identity
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
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
