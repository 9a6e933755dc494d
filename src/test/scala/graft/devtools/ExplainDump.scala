package graft.devtools

/** Dev harness: write `df.explain("formatted")` output for a list of
  * SparkEntry queries to files — the plan-evidence capture for the
  * optimization-round deliverables (plans/r17/<query>_{before,after}.txt).
  * Usage: Test/runMain graft.devtools.ExplainDump <outDir> <suffix>
  *          <q1,q2,...> [sfDir] [cpus]
  * Writes <outDir>/<query>_<suffix>.txt per query. The warehouse must be
  * warm (plans of ensure-backed queries embed their stored-artifact scans).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 4) args(4).toInt else 32
    val spark = graft.core.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
      graft.core.Mat.releaseAll(blocking = true)
    }
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
