package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: old (explode+min-agg) vs fused-native MinHash signature
  * stage timing (not part of the API). */
object MinhashScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = graft.core.Tables.documents(spark, dir)
    val k = 32
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $label run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("agg-form ") {
      val exploded = df.select(col("doc_id").as("id"),
          explode(array_distinct(Dedup.shingles(Text.tokens(col("text"))))).as("sh"))
        .select(col("id"), xxhash64(col("sh")).as("h"))
      val minCols = (0 until k).map(i => min(hash(col("h"), lit(i))).as(s"m$i"))
      exploded.groupBy("id").agg(minCols.head, minCols.tail: _*)
        .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
        .count()
    }
    time("fused    ") {
      Dedup.minhashSignatures(df, "doc_id", "text", k).count()
    }
    time("q24-full ") {
      Dedup.minhashCandidates(df, "doc_id", "text", k = 32, bands = 8,
        threshold = 0.2).count()
    }
    spark.stop()
  }
}
