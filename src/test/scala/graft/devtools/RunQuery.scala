package graft.devtools

import org.apache.spark.sql.SparkSession

/** Dev harness: run one SparkEntry query against a corpus dir and print
  * its rows + the executed-plan lines that matter for scale audits
  * (scans, pushed filters, bucket pruning, exchanges, aggregates).
  * Usage: Test/runMain graft.devtools.RunQuery <name> [sfDir] [maxRows] */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 20
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.show(n, false)
    val p = df.queryExecution.executedPlan.toString
    println("── plan audit lines ──")
    println(p.linesIterator.filter(l =>
        l.contains("Scan") || l.contains("PushedFilters") ||
        l.contains("Bucket") || l.contains("Exchange") ||
        l.contains("HashAggregate")).mkString("\n"))
    graft.core.Mat.releaseAll(blocking = true)
    spark.stop()
  }
}
