package graft.sched

import java.time.{Duration, LocalDateTime}

import scala.util.Try

/** Driver-side scheduling policies — pure functions over metadata, mirroring
  * the reference's gating/retry/next-fire rules exactly (they decide per-task
  * on catalog-sized data; the heavy lifting stays in Spark jobs).
  */
object Policies {

  /** Parse a CSV dependency list (reference F1, web_scheduler.py:1243-1249):
    * - None/empty → no dependencies
    * - any non-integer element → INVALID format → treated as no deps (gate
    *   passes, reference returns True on ValueError)
    * - empty elements are filtered before parsing (`if dep_id`). */
  def parseDependencies(csv: Option[String]): Option[Seq[Long]] =
    csv.map(_.trim).filter(_.nonEmpty).flatMap { s =>
      val parts = s.split(",").filter(_.nonEmpty)
      Try(parts.toSeq.map(_.trim.toLong)).toOption match {
        case Some(ids) if ids.nonEmpty => Some(ids)
        case _                          => None // invalid or empty → no gating
      }
    }

  /** Dependency gate (web_scheduler.py:1231-1286): every dependency's LATEST
    * run must be 'success'. A dependency that exists but never ran blocks; a
    * dependency id not present in the task catalog is skipped (the
    * reference's IN-query simply doesn't return it). `latestStatus` maps
    * task id → status of its most recent task_log row.
    */
  def canExecute(dependencies: Option[String], knownTasks: Long => Boolean,
                 latestStatus: Long => Option[String]): Boolean =
    parseDependencies(dependencies) match {
      case None => true
      case Some(ids) =>
        ids.filter(knownTasks).forall(dep => latestStatus(dep).contains("success"))
    }

  /** Retry decision (web_scheduler.py:1331-1370): retry only when
    * - maxRetries > 0 and the latest log is 'failed',
    * - the count of 'failed' among the last (maxRetries+1) logs (by time
    *   desc) is ≤ maxRetries — i.e. the consecutive-failure budget is not
    *   exhausted (a success inside the window resets the effective count),
    * - at least retryDelay seconds have elapsed since the last execution.
    *
    * @param recentLogs (status, executionTime) ordered most-recent-first
    */
  def shouldRetry(recentLogs: Seq[(String, LocalDateTime)], maxRetries: Int,
                  retryDelaySeconds: Long, now: LocalDateTime): Boolean = {
    if (maxRetries <= 0 || recentLogs.isEmpty) return false
    val (lastStatus, lastTime) = recentLogs.head
    if (lastStatus != "failed") return false
    val failedCount = recentLogs.take(maxRetries + 1).count(_._1 == "failed")
    failedCount <= maxRetries &&
      Duration.between(lastTime, now).getSeconds >= retryDelaySeconds
  }

  /** Next-fire computation (O4, web_scheduler.py:1380-1390): cron if present
    * and valid, else interval; invalid cron falls back to interval. */
  def nextRun(cronExpression: Option[String], intervalSeconds: Long,
              now: LocalDateTime): LocalDateTime =
    cronExpression.filter(_.trim.nonEmpty) match {
      case Some(expr) =>
        Try(Cron.next(expr, now)).getOrElse(now.plusSeconds(intervalSeconds))
      case None => now.plusSeconds(intervalSeconds)
    }

  /** Due check (ST1): a task with no recorded nextRun fires immediately. */
  def isDue(nextRunTime: Option[LocalDateTime], now: LocalDateTime): Boolean =
    nextRunTime.forall(t => !now.isBefore(t))
}

/** ST3 — in-flight dedup: the reference's `executing_tasks` set + lock
  * (web_scheduler.py:43-47, 1311-1316) as a concurrent set. `tryAcquire`
  * returns false if the task is already running; always `release` in a
  * finally block. */
final class InFlightGuard {
  private val running = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
  def tryAcquire(taskId: Long): Boolean = running.add(taskId)
  def release(taskId: Long): Unit = running.remove(taskId)
  def isRunning(taskId: Long): Boolean = running.contains(taskId)
}
