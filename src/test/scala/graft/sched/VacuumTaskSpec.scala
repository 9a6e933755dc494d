package graft.sched

import graft.SparkSuite

/** VacuumTask's threshold arithmetic reads corpus row counts per tick —
  * §16 item 5 (r15): that was a parquet listing + count JOB on every tick
  * once tombstones existed. The counts are now cached by source stamp, so
  * a warm deferral tick's only Spark work is the tombstone aggregate. */
class VacuumTaskSpec extends SparkSuite {
  import spark.implicits._

  test("corpusCountCached: second read of an unchanged corpus runs ZERO Spark jobs; a regenerated corpus recounts") {
    val dir = tmpDir("vaccnt")
    (0L until 10L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    assert(VacuumTask.corpusCountCached(spark, dir, "documents") == 10L)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobCounter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(jobCounter)
    val n =
      try {
        val n = VacuumTask.corpusCountCached(spark, dir, "documents")
        Thread.sleep(1000) // listener bus is async — let events drain
        n
      } finally spark.sparkContext.removeSparkListener(jobCounter)
    assert(n == 10L)
    assert(jobs.get() == 0, s"cached corpus count ran ${jobs.get()} jobs")
    // a REGENERATED corpus (new source stamp) must recount, not serve the
    // memoized value — the stamp is the cache key, not the path
    (0L until 13L).map(i => (i, s"doc $i"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    assert(VacuumTask.corpusCountCached(spark, dir, "documents") == 13L)
    // an absent table reads 0 without a job
    assert(VacuumTask.corpusCountCached(spark, dir, "embeddings") == 0L)
  }
}
