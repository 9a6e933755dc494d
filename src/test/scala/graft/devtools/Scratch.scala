package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main for profiling individual queries (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      println(f"[scratch] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (sys.env.contains("SCRATCH_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
