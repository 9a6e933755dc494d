package graft.devtools

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Dedup
import graft.operators.Pipeline

/** Stage-level timing for q108 containment (dev-only): grams
  * materialization, the two linear aggregates, candidate generation, and
  * end-to-end — so the probe-ratio analysis rests on measured stage walls,
  * not guesses. Usage: runMain graft.devtools.Q108Profile <dir> [reps] */
object Q108Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[q108prof] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to reps) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      graft.core.Mat.withMaterialized(
          Dedup.shingleHashRows(docs, "doc_id", "text", w = 3)) { grams =>
        time("grams_mat")(grams.count()) // materialization forced by first read
        time("stats_groupby")(grams.groupBy("id").agg(count(lit(1))).count())
        time("dfreq2_groupby")(grams.groupBy("gh").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2).count())
        time("candidates")(Pipeline.containmentCandidates(grams).count())
      }
      graft.core.Mat.releaseAll(blocking = true)
      time("end_to_end")(Pipeline.containmentPairs(spark, dir).count())
      graft.core.Mat.releaseAll(blocking = true)
      println("[q108prof] ---")
    }
    spark.stop()
  }
}
