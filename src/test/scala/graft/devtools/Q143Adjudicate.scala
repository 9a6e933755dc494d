package graft.devtools

/** Dev harness for the r12 verdict's q143 adjudication: print the FINAL
  * (post-AQE) join strategy of the per-part threshold join at a given SF,
  * so the bench-SF broadcast vs 100×-SF shuffle decision is recorded from
  * evidence, not assumption. Usage: runMain graft.devtools.Q143Adjudicate
  * <sfDir> [<sfDir> ...] */
object Q143Adjudicate {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val df = graft.SparkEntry.queries("q143_small_order_revenue")(spark, dir)
      val t0 = System.nanoTime()
      df.collect() // finalize AQE on THIS dataset's plan
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("isFinalPlan"))
        .map(_.trim.take(160)).mkString("\n")
      println(f"=== q143 @ $dir ($sec%.2f s)\n$joins")
      graft.core.Mat.releaseAll()
    }
    spark.stop()
  }
}
