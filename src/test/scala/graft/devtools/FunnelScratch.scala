package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the q67/q68 flag construction (not shipped
  * behavior — see Scratch.scala precedent). */
object FunnelScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count(); docs.count() // warm
    import graft.functions.{Dedup, Text}
    t("keep-window") {
      docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
        .withColumn("k", col("doc_id") ===
          min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
        .select("doc_id", "k").count()
    }
    t("fingerprint-only") {
      docs.select(Text.fingerprint(col("text")).as("fp")).count()
    }
    def sh(d: org.apache.spark.sql.DataFrame) =
      Dedup.shingleHashRows(d, "doc_id", "text", w = 8)
        .withColumnRenamed("id", "doc_id")
    t("sh-docs-only") { sh(docs).count() }
    t("sh-docs-again") { sh(docs).count() }
    t("ev-distinct") {
      sh(docs.filter(pmod(col("doc_id"), lit(10)) === 7)).select("gh").distinct().count()
    }
    t("hits") {
      val ev = sh(docs.filter(pmod(col("doc_id"), lit(10)) === 7)).select("gh").distinct()
      sh(docs).join(broadcast(ev), "gh").groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits")).count()
    }
    t("hits-again") {
      val ev = sh(docs.filter(pmod(col("doc_id"), lit(10)) === 7)).select("gh").distinct()
      sh(docs).join(broadcast(ev), "gh").groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits")).count()
    }
    t("gopher-narrow") {
      docs.select(col("doc_id"),
        graft.operators.Pipeline.gopherOk(col("text")).as("q")).count()
    }
    t("tokencount-narrow") {
      docs.select(Text.tokenCount(col("text")).as("n")).agg(sum("n")).count()
    }
    t("full-funnel") {
      graft.operators.Pipeline.releaseFunnel(spark, dir).count()
    }
    spark.stop()
  }
}
