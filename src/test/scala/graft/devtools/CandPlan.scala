package graft.devtools

/** Dev harness: dump the LAZY candidate-frame plans of the stored-table
  * band joins (q58 / q169's r18 rewiring). The queries' own top-level
  * plans are checkpoint-truncated (their results are Mat-materialized, so
  * `explain` shows a LogicalRDD stub); the candidate frames below are the
  * un-materialized join subplans the optimization claims are about —
  * bucketed scans on both sides, no exchange feeding the band join.
  * Usage: Test/runMain graft.devtools.CandPlan <outDir> [sfDir] [cpus]
  */
object CandPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.core.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val sfx = graft.core.Warehouse.corpusSuffix(dir)
    def dump(name: String,
             df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"), plan.getBytes("UTF-8"))
      println(s"wrote $outDir/$name.txt (${plan.length} chars)")
    }
    // ensure the artifacts exist/are warm (construction runs the builds
    // if needed; plans of ensure-backed frames embed stored-table scans)
    graft.SparkEntry.queries("q58_dup_clusters_lsh")(spark, dir).count()
    graft.core.Mat.releaseAll(blocking = true)
    graft.SparkEntry.queries("q169_grown_minhash")(spark, dir).count()
    graft.core.Mat.releaseAll(blocking = true)
    dump("q58_cand_from_stored_table_after",
      graft.functions.Dedup.minhashSelfCandidatesFromTable(
        spark, s"graft_sig_all32_$sfx", k = 32, bands = 8, threshold = 0.35))
    dump("q169_cand_table_vs_table_after",
      graft.functions.Dedup.minhashCandidatesTableVsTable(
        spark, s"graft_sig_panel_q169_$sfx", s"graft_sig_grown_q169_$sfx",
        k = 48, bands = 12, threshold = 0.2))
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
