package graft.devtools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Dedup
import graft.operators.Pipeline

/** Candidate-mass diagnostic for q108 containment (dev-only main) — the
  * four-numbers-tell-the-story probe from the r9 verdict: for each corpus
  * dir, measure
  *   - `old_cand`: pairs sharing ≥1 sub-cap gram (the pre-r10 candidate
  *     definition — what the old pipeline aggregated before its integer
  *     prefilter),
  *   - `old_surv`: of those, survivors of the old integer prefilter
  *     (c + min(ka,kb)) · 10 ≥ min(na,nb) · 9,
  *   - `pfx_cand`: pairs opened by the r10 positional prefix filter
  *     (what the new pipeline verifies exactly),
  *   - `true_pairs`: final verified ≥0.9-containment pairs,
  * plus corpus shape (docs, gram instances, distinct grams). Run with a
  * list of corpus dirs; prints one JSON line per corpus.
  *
  * Usage: runMain graft.devtools.ContainmentDiag <dir|synth:N:dir> ...
  * (`synth:N:dir` first synthesizes an N-document probe corpus — the
  * SAME generator Bench's scale probe uses — under dir, then measures.)
  */
object ContainmentDiag {
  private val dfCap = 256

  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val dirs = args.toSeq.map {
      case s if s.startsWith("synth:") =>
        val Array(_, n, dir) = s.split(":", 3)
        graft.Bench.synthProbeCorpus(spark, dir, n.toLong, 1000L)
        dir
      case d => d
    }
    for (dir <- dirs) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      graft.core.Mat.withMaterialized(
          Dedup.shingleHashRows(docs, "doc_id", "text", w = 3)) { grams =>
        val nGramRows = grams.count()
        val dfreq = grams.groupBy("gh").agg(count(lit(1)).as("df"))
        val nDistinct = dfreq.count()
        val tagged = grams.join(dfreq, Seq("gh"))
        val stats = tagged.groupBy("id").agg(
          count(lit(1)).as("n_sh"),
          sum(when(col("df") > dfCap, 1L).otherwise(0L)).as("n_capped"))
        val rare = tagged.filter(col("df") <= dfCap)
        val shared = rare.select(col("gh"), col("id").as("id_a"))
          .join(rare.select(col("gh"), col("id").as("id_b")), Seq("gh"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
        val withStats = shared
          .join(stats.select(col("id").as("id_a"), col("n_sh").as("na"),
                             col("n_capped").as("ka")), Seq("id_a"))
          .join(stats.select(col("id").as("id_b"), col("n_sh").as("nb"),
                             col("n_capped").as("kb")), Seq("id_b"))
        val oldCand = withStats.count()
        val oldSurv = withStats
          .filter((col("c") + least(col("ka"), col("kb"))) * 10 >=
                  least(col("na"), col("nb")) * 9).count()
        val pfxCand = Pipeline.containmentCandidates(grams, dfCap).count()
        val truePairs = Pipeline.containmentPairs(spark, dir).count()
        println(s"""{"dir":"$dir","docs":$nDocs,"gram_rows":$nGramRows,""" +
          s""""distinct_grams":$nDistinct,"old_cand":$oldCand,""" +
          s""""old_surv":$oldSurv,"pfx_cand":$pfxCand,""" +
          s""""true_pairs":$truePairs}""")
      }
      graft.core.Mat.releaseAll(blocking = true)
    }
    spark.stop()
  }
}
