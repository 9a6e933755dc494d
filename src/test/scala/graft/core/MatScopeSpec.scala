package graft.core

import java.util.concurrent.CountDownLatch

import graft.SparkSuite

/** Per-owner scoping contract of [[Mat]]: the orchestrator daemon ticks
  * (and drains) every ~1 s on its own thread while AdminApi run-now
  * executes tasks concurrently on handler threads. A drain by one owner
  * must never unpersist a frame another owner tracked mid-flight — a
  * localCheckpoint's lineage is truncated, so a released frame is
  * UNRECOVERABLE, not merely slow to recompute.
  */
class MatScopeSpec extends SparkSuite {

  test("a concurrent owner's releaseAll cannot release another thread's in-flight frame") {
    Mat.releaseAllScopes(blocking = false) // clean slate across suites
    val tracked = new CountDownLatch(1)
    val daemonDrained = new CountDownLatch(1)
    @volatile var counted = -1L
    @volatile var failure: Throwable = null
    val worker = new Thread(() => {
      try {
        // the "run-now handler": tracks a result frame, then is preempted
        // by a daemon tick before counting it
        val df = Mat.tracked(spark.range(1000).toDF("id"))
        tracked.countDown()
        daemonDrained.await()
        counted = df.count() // must still read from its own blocks
        Mat.releaseAll()     // handler's own request-end boundary
      } catch { case t: Throwable => failure = t; tracked.countDown() }
    }, "mat-scope-worker")
    worker.start()
    tracked.await()
    // the "daemon tick" on this thread: drains ITS OWN scope only
    Mat.releaseAll()
    daemonDrained.countDown()
    worker.join(30000)
    assert(failure == null, s"worker failed: $failure")
    assert(counted == 1000L)
    assert(Mat.liveCountAllScopes == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked storage blocks: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("releaseAllScopes drains frames abandoned by other threads") {
    Mat.releaseAllScopes(blocking = false)
    val t = new Thread(() => { Mat.tracked(spark.range(10).toDF("id")); () },
      "mat-abandoner")
    t.start(); t.join(30000)
    assert(Mat.liveCountAllScopes == 1) // this thread's releaseAll can't see it
    Mat.releaseAll()
    assert(Mat.liveCountAllScopes == 1)
    Mat.releaseAllScopes() // the shutdown boundary drains every scope, blocking
    assert(Mat.liveCountAllScopes == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
