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
        // decomposition of the candidate stage (mirrors
        // containmentCandidates internals): how much of its wall is the
        // rank window vs the prefix⋈full join vs the pair dedup
        locally {
          import org.apache.spark.sql.expressions.Window
          val stats = grams.groupBy("id").agg(count(lit(1)).as("n_sh"))
          val dfreq2 = grams.groupBy("gh").agg(count(lit(1)).as("df"))
            .filter(col("df") >= 2)
          val shared = grams.join(dfreq2, Seq("gh"))
          val sharedStats = shared.groupBy("id").agg(count(lit(1)).as("n_shared"))
          val rareShared = shared.filter(col("df") <= 256)
            .join(stats, Seq("id")).join(sharedStats, Seq("id"))
          val ranked = rareShared.withColumn("rk_sh",
            row_number().over(Window.partitionBy("id").orderBy("df", "gh")))
          time("ranked_rows")(ranked.count())
          val prefix = ranked
            .filter(col("n_sh") - col("n_shared") + col("rk_sh") <=
                    floor(col("n_sh") / 10) + 1)
            .select(col("gh"), col("id").as("id_p"), col("n_sh").as("n_p"))
          time("prefix_rows")(prefix.count())
          val full = shared.filter(col("df") <= 256).join(stats, Seq("id"))
            .select(col("gh"), col("id").as("id_f"), col("n_sh").as("n_f"))
          time("rawjoin_rows")(prefix.join(full, Seq("gh"))
            .filter(col("n_p") < col("n_f") ||
                    (col("n_p") === col("n_f") && col("id_p") < col("id_f")))
            .count())
        }
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
