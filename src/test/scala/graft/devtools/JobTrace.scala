package graft.devtools

import org.apache.spark.scheduler._

/** Dev harness: run one SparkEntry query and print every Spark job it
  * spawns — start→end wall, #tasks, and the callsite — so a job-heavy
  * serve path can be attributed line by line.
  * Usage: Test/runMain graft.devtools.JobTrace <name> [sfDir] [cpus] [reps]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 2
    val spark = graft.core.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name.take(90)).getOrElse("?")
        val nTasks = e.stageInfos.map(_.numTasks).sum
        starts.put(e.jobId, (System.nanoTime(), site, nTasks))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, site, nTasks) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"  job ${e.jobId}%4d ${ms}%8.1f ms  tasks=$nTasks%4d  $site")
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { r =>
      println(s"=== rep $r of $name ===")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"=== rep $r wall ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n ===")
      graft.core.Mat.releaseAll(blocking = true)
      Thread.sleep(400)
    }
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
