package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

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
  *    session owner — bench loop, verify loop, orchestrator tick — drains
  *    all of them at its natural boundary via [[releaseAll]].
  *
  * Invariant: after `releaseAll()` at an owner boundary, the session holds
  * ZERO graft-originated storage blocks (asserted in OrchestratorSpec /
  * FunctionsSpec via `sparkContext.getPersistentRDDs`).
  */
object Mat {

  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist the block set behind a checkpointed frame. NOTE
    * `Dataset.unpersist()` would be a silent no-op here: it only clears
    * CacheManager entries, while `localCheckpoint()` pins blocks on the
    * UNDERLYING RDD (wrapped by the plan's LogicalRDD leaf) — the r2 leak
    * survived precisely because nothing released that RDD. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Eagerly materialize WITHOUT registering — for iterative algorithms
    * where each step's frame replaces the previous one: the caller pairs
    * every materialize with a [[release]] as the iteration advances. */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Eagerly materialize `df` and register it for [[releaseAll]]. The
    * returned frame reads from its own blocks — upstream intermediates can
    * be unpersisted immediately after this call returns. */
  def tracked(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint() // eager
    live.add(c)
    c
  }

  /** Materialize `df`, run `f` on the materialized frame, release the
    * blocks. Whatever `f` returns must be fully computed inside the scope
    * (collected, written, or itself [[tracked]]) — the checkpoint's blocks
    * are gone on exit and a truncated lineage cannot recompute. */
  def withMaterialized[T](df: DataFrame)(f: DataFrame => T): T = {
    val c = df.localCheckpoint()
    try f(c) finally release(c)
  }

  /** Drain the registry: called by the session owner once the results of
    * the current unit of work (query, tick) are consumed. */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) { release(d); d = live.poll() }
  }

  /** Number of live tracked frames (diagnostics / tests). */
  def liveCount: Int = live.size()
}
