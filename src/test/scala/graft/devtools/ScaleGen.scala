package graft.devtools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler: builds an sf-N× replica corpus from a
  * driver-generated SF dir (default: sf0.1 → 10× = "sf1"), preserving the
  * statistical structure every oracle contract depends on:
  *
  *  - keyed tables replicate with disjoint key ranges (FKs remapped
  *    consistently: orders→customer, lineitem→orders/supplier/part);
  *  - events replicate with shifted time axes (one span + 5-day gap per
  *    replica) so event DENSITY, session structure, and proximity-join
  *    mass stay constant per replica — a 10× corpus means 10× history,
  *    not 10× events-per-minute (which would grow q106's pair mass 100×
  *    and break the naive-join oracle's feasibility);
  *  - documents replicate with an INJECTIVELY RENAMED token stream per
  *    replica (suffix "zz<r>"): n-gram Jaccard is invariant under token
  *    renaming, so each replica's dup/near-dup family structure is
  *    exactly the original's, while cross-replica shingle overlap is
  *    zero — dup RATE stays constant at 10× mass instead of the 90%
  *    dup-rate corpus naive copying would produce. doc_id offsets are
  *    multiples of 7150 = lcm(10,11,13,25,50), preserving every
  *    mod-convention plant (eval holdout %10=7, snapshot %11/%13,
  *    semantic-dedup %25, probe families %50);
  *  - embeddings replicate under a per-replica ±1 diagonal (orthogonal)
  *    transform: within-replica cosines are EXACTLY the original's
  *    (near-dup/ANN structure preserved), cross-replica cosines are
  *    sign-scrambled noise. vec_id offsets are multiples of 25 (the q41/
  *    q62 planted-dup convention).
  *
  * Usage: sbt "Test/runMain graft.devtools.ScaleGen <srcDir> <dstDir> <factor>"
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/data/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("WARN")
    replicateTo(spark, src, dst, factor)
    spark.stop()
  }

  /** The replication body, callable from specs (ScaleGenSpec pins the
    * invariants the scale evidence rests on). */
  def replicateTo(spark: SparkSession, src: String, dst: String,
                  factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L
    /** Union of `factor` replicas of df, transformed per replica. */
    def replicate(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(r => f(df, r)).reduce(_ unionByName _)

    // dims copy as-is (dictionary-sized at any scale)
    write(read("region"), "region")
    write(read("nation"), "nation")

    val customer = read("customer"); val custSpan = span(customer, "c_custkey")
    val supplier = read("supplier"); val suppSpan = span(supplier, "s_suppkey")
    val part     = read("part");     val partSpan = span(part, "p_partkey")
    val orders   = read("orders");   val ordSpan  = span(orders, "o_orderkey")

    write(replicate(customer)((d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * custSpan))), "customer")
    write(replicate(supplier)((d, r) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(r * suppSpan))), "supplier")
    write(replicate(part)((d, r) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(r * partSpan))), "part")
    write(replicate(orders)((d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * ordSpan))
       .withColumn("o_custkey", col("o_custkey") + lit(r * custSpan))), "orders")
    write(replicate(read("lineitem"))((d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * ordSpan))
       .withColumn("l_suppkey", col("l_suppkey") + lit(r * suppSpan))
       .withColumn("l_partkey", col("l_partkey") + lit(r * partSpan))), "lineitem")

    val events = read("events")
    val evtSpan = span(events, "event_id")
    val userSpan = span(events, "user_id")
    // 35-day shift per replica: the source span is ~30 days, so replicas
    // never overlap and the 5-day gap dwarfs every window/watermark/session
    // horizon in the suite
    write(replicate(events)((d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * evtSpan))
       .withColumn("user_id", col("user_id") + lit(r * userSpan))
       .withColumn("ts", col("ts") + expr(s"INTERVAL ${r * 35} DAYS"))), "events")

    val docs = read("documents")
    val docSpanRaw = span(docs, "doc_id")
    val docSpan = ((docSpanRaw + 7149L) / 7150L) * 7150L // lcm(10,11,13,25,50)
    write(replicate(docs)((d, r) => {
      val text = if (r == 0) col("text")
                 else regexp_replace(col("text"), "(\\S+)", s"$$1zz$r")
      d.withColumn("doc_id", col("doc_id") + lit(r * docSpan))
       .withColumn("text", text)
       .withColumn("n_chars", length(text).cast(d.schema("n_chars").dataType))
    }), "documents")

    val emb = read("embeddings")
    val vecSpanRaw = span(emb, "vec_id")
    val vecSpan = ((vecSpanRaw + 24L) / 25L) * 25L
    val dim = 64
    write(replicate(emb)((d, r) => {
      // deterministic per-replica sign pattern (orthogonal diagonal):
      // bit j of a splitmix-style hash of (r, j)
      val signs = Array.tabulate(dim) { j =>
        var z = (r * 0x9E3779B9L + j * 0xBF58476D1CE4E5B9L)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        if (r == 0 || ((z ^ (z >>> 31)) & 1L) == 0L) 1.0f else -1.0f
      }
      d.withColumn("vec_id", col("vec_id") + lit(r * vecSpan))
       .withColumn("embedding",
         zip_with(col("embedding"), typedLit(signs.toSeq), (x, s) => x * s))
    }), "embeddings")

    // manifest: row counts per table, for the scale run's provenance
    val counts = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s"""  "$t": ${spark.read.parquet(s"$dst/$t.parquet").count()}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dst/MANIFEST.json"),
      ("{\n" + counts.mkString(",\n") + "\n}\n").getBytes("UTF-8"))
    println(s"[scalegen] wrote ${factor}x corpus at $dst")
  }
}
