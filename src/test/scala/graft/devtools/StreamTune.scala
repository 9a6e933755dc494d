package graft.devtools

/** Dev experiment: time the streaming queries under different
  * spark.sql.shuffle.partitions values (state-store partition count is
  * fixed per checkpoint, and each run stages a fresh checkpoint, so the
  * runtime conf takes effect). Measures whether micro-batch wall is
  * state-commit-bound (falls with fewer state partitions) or data-bound.
  * Usage: Test/runMain graft.devtools.StreamTune [sfDir] [cpus] [parts,...]
  */
object StreamTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val parts = (if (args.length > 2) args(2) else "32,8,4")
      .split(",").map(_.trim.toInt).toSeq
    val qs = Seq("q35_stream_window", "q48_stream_append", "q63_stream_dedup",
      "q71_stream_join", "q82_stream_incremental_dedup",
      "q96_stream_release_admission", "q109_stream_sessions",
      "q114_stream_locf", "q159_stream_embedding_admission")
    val spark = graft.core.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val reps = 2
    for (r <- 1 to reps; p <- parts) {
      spark.conf.set("spark.graft.stream.statePartitions", p.toString)
      for (q <- qs) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.core.Mat.releaseAll(blocking = true)
        println(f"rep=$r parts=$p%3d  $q%-36s $wall%6.2f s  rows=$n")
      }
    }
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
