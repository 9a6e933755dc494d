package graft.devtools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev harness: time a set of SparkEntry queries against a corpus dir and
  * break each wall-clock second into scheduler-visible work — #jobs,
  * #stages, #tasks, summed task time and summed shuffle bytes — so
  * "fixed per-job overhead" and "real compute" are distinguishable
  * (guide §1: decide whether the time goes to compute, shuffle, or
  * scheduling before touching anything).
  *
  * Usage: Test/runMain graft.devtools.Profile [sfDir] [q1,q2,...|all] [cpus]
  * Prints one line per query: wall, jobs, stages, tasks, taskSec, shufMB.
  */
object Profile {
  final class Acc extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snap(): (Long, Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get, shufR.get, shufW.get)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "all"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.core.GraftSession.local(cpus)
    // optional conf overrides for A/B runs: "k=v;k=v"
    if (args.length > 3 && args(3).nonEmpty)
      args(3).split(";").foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      }
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val names =
      if (which == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else which.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // one warmup pass over a cheap query to absorb JIT/session init
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    println(f"${"query"}%-36s ${"wall_s"}%8s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"task_s"}%8s ${"shufMB"}%8s")
    val rows = names.map { n =>
      val before = acc.snap()
      val t0 = System.nanoTime()
      val cnt = try graft.SparkEntry.queries(n)(spark, dir).count()
                catch { case t: Throwable => println(s"FAILED $n: $t"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      graft.core.Mat.releaseAll(blocking = true)
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      val after = acc.snap()
      val jobs = after._1 - before._1; val stg = after._2 - before._2
      val tks = after._3 - before._3; val tms = (after._4 - before._4) / 1e3
      val sh = (after._5 - before._5 + after._6 - before._6) / 1e6
      println(f"$n%-36s $wall%8.2f $jobs%5d $stg%5d $tks%6d $tms%8.1f $sh%8.1f")
      (n, wall, jobs, stg, tks, tms, sh, cnt)
    }
    println(f"TOTAL wall=${rows.map(_._2).sum}%.1f s  jobs=${rows.map(_._3).sum}  tasks=${rows.map(_._5).sum}  task_s=${rows.map(_._6).sum}%.1f")
    graft.core.Mat.releaseAllScopes(blocking = true)
    spark.stop()
  }
}
