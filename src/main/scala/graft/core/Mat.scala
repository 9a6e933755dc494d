package graft.core

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.DataFrame

/** Lifecycle management for materialized intermediates.
  *
  * Operators that self-join (MinHash banding, LSH bucketing) or iterate
  * (k-means) must materialize an intermediate — otherwise both join sides /
  * every iteration re-plan the full upstream subtree. But a
  * `localCheckpoint()` pins executor storage blocks until `unpersist()`:
  * in a long-lived session (the scheduler daemon, a bench loop) leaked
  * blocks accumulate, degrade every later query, and eventually OOM the
  * storage pool. Two disciplines fix this:
  *
  *  - [[withMaterialized]]: scope an intermediate whose consumers finish
  *    inside the function (blocks released on exit, even on failure);
  *  - [[tracked]]: eagerly materialize a RESULT frame handed back to a
  *    caller (driver writes it / counts it later), registered here so the
  *    session owner — bench loop, verify loop, orchestrator tick, admin
  *    request handler — drains all of them at its natural boundary via
  *    [[releaseAll]].
  *
  * The registry is scoped PER OWNER THREAD, not JVM-global: the
  * orchestrator daemon ticks every ~1 s on its own thread while AdminApi
  * run-now executes tasks concurrently on 4 handler threads. With one
  * global registry, a daemon tick's releaseAll would unpersist a snapshot
  * tracked by an in-flight run-now on another thread BEFORE its result is
  * counted — and since localCheckpoint truncates lineage, the released
  * frame cannot be recomputed (lost-block failure). Each owner (scheduler
  * loop, bench/verify loop, each HTTP handler thread) tracks into and
  * drains only its own queue; [[releaseAllScopes]] is the JVM-shutdown
  * boundary that drains everything before `SparkSession.stop()`.
  *
  * Invariant: after every owner has called `releaseAll()` at its boundary
  * (or one `releaseAllScopes()` at shutdown), the session holds ZERO
  * graft-originated storage blocks (asserted in OrchestratorSpec /
  * FunctionsSpec via `sparkContext.getPersistentRDDs`).
  */
object Mat {

  /** Owner-thread → its tracked frames. Keyed by thread so a handler-pool
    * thread (reused across requests) keeps one queue for its lifetime; a
    * queue abandoned by a dead thread is drained by [[releaseAllScopes]]. */
  private val scopes =
    new ConcurrentHashMap[Thread, ConcurrentLinkedQueue[DataFrame]]()

  private def myScope: ConcurrentLinkedQueue[DataFrame] =
    scopes.computeIfAbsent(Thread.currentThread(),
      _ => new ConcurrentLinkedQueue[DataFrame]())

  /** Unpersist the block set behind a checkpointed frame. NOTE
    * `Dataset.unpersist()` would be a silent no-op here: it only clears
    * CacheManager entries, while `localCheckpoint()` pins blocks on the
    * UNDERLYING RDD (wrapped by the plan's LogicalRDD leaf) — the r2 leak
    * survived precisely because nothing released that RDD.
    *
    * `blocking = true` at boundaries that precede `SparkSession.stop()`:
    * non-blocking unpersist futures racing the shutting-down block manager
    * flood stderr with RejectedExecutionException / "not removed normally"
    * noise (and displaced the r3 bench metric line out of the driver's
    * capture window). */
  def release(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking))

  /** Eagerly materialize WITHOUT registering — for iterative algorithms
    * where each step's frame replaces the previous one: the caller pairs
    * every materialize with a [[release]] as the iteration advances. */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Eagerly materialize `df` and register it in the CALLING THREAD's
    * scope for [[releaseAll]]. The returned frame reads from its own
    * blocks — upstream intermediates can be unpersisted immediately after
    * this call returns. */
  def tracked(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint() // eager
    myScope.add(c)
    c
  }

  /** Materialize `df`, run `f` on the materialized frame, release the
    * blocks. Whatever `f` returns must be fully computed inside the scope
    * (collected, written, or itself [[tracked]]) — the checkpoint's blocks
    * are gone on exit and a truncated lineage cannot recompute.
    *
    * The exit release is BLOCKING (one bounded wait per operator call, not
    * per iteration): a fire-and-forget future here has no queue entry for
    * the shutdown drain to await, so a scope that closes in the session's
    * final query races `SparkSession.stop()` and floods stderr. Iterative
    * algorithms keep their mid-loop [[release]] calls non-blocking. */
  def withMaterialized[T](df: DataFrame)(f: DataFrame => T): T = {
    val c = df.localCheckpoint()
    try f(c) finally release(c, blocking = true)
  }

  private def drain(q: ConcurrentLinkedQueue[DataFrame], blocking: Boolean): Unit = {
    var d = q.poll()
    while (d != null) { release(d, blocking); d = q.poll() }
  }

  /** Drain the calling thread's scope: called by the owner once the
    * results of its current unit of work (query, tick, HTTP request) are
    * consumed. Frames tracked concurrently by LIVE owners are untouched;
    * scopes abandoned by DEAD threads (a stray Future or worker that
    * tracked and exited without draining) are reaped here, so a long-
    * lived server's periodic boundary — the orchestrator tick — bounds
    * the leak instead of pinning blocks until JVM shutdown. */
  def releaseAll(blocking: Boolean = false): Unit = {
    val q = scopes.remove(Thread.currentThread())
    if (q != null) drain(q, blocking)
    val it = scopes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey.isAlive) {
        val dead = scopes.remove(e.getKey)
        if (dead != null) drain(dead, blocking)
      }
    }
  }

  /** Drain EVERY owner's scope — the JVM-shutdown boundary (bench/verify
    * end, test teardown), where no owner can still be mid-flight. Blocking
    * by default: this runs right before `SparkSession.stop()`. */
  def releaseAllScopes(blocking: Boolean = true): Unit = {
    val it = scopes.keySet().iterator()
    while (it.hasNext) {
      val q = scopes.remove(it.next())
      if (q != null) drain(q, blocking)
    }
  }

  /** Live tracked frames in the calling thread's scope (diagnostics/tests). */
  def liveCount: Int = {
    val q = scopes.get(Thread.currentThread())
    if (q == null) 0 else q.size()
  }

  /** Live tracked frames across ALL scopes (diagnostics/tests). */
  def liveCountAllScopes: Int = {
    var n = 0
    scopes.forEach((_, q) => n += q.size())
    n
  }
}
