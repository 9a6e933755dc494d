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

  test("frames abandoned by a dead thread are reaped at the next owner boundary") {
    Mat.releaseAllScopes(blocking = false)
    val t = new Thread(() => { Mat.tracked(spark.range(10).toDF("id")); () },
      "mat-abandoner")
    t.start(); t.join(30000)
    assert(!t.isAlive)
    assert(Mat.liveCountAllScopes == 1) // abandoned: the thread never drained
    // any live owner's periodic boundary (orchestrator tick, bench loop)
    // reaps dead-thread scopes — a stray worker cannot pin blocks until
    // JVM shutdown
    Mat.releaseAll()
    assert(Mat.liveCountAllScopes == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // and the shutdown boundary is a no-op on an already-clean registry
    Mat.releaseAllScopes()
    assert(Mat.liveCountAllScopes == 0)
  }
}
