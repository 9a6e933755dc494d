package graft.sched

import java.time.LocalDateTime

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.alerts.{AlertService, Notifier}
import graft.catalog.CatalogStore
import graft.catalog.Model._

/** The reference's single scheduler daemon drives BOTH task execution and
  * SQL-alert checks from one loop (web_scheduler.py:1289-1582 tasks,
  * 1446-1544 alerts, started together at 5486-5488). Orchestrator composes
  * [[Scheduler]] and [[AlertService]] under one tick with the alert-side
  * in-flight dedup (ST6's own `checking_alerts` set).
  */
final class Orchestrator(
    spark: SparkSession,
    store: CatalogStore,
    scheduler: Scheduler,
    alerts: AlertService,
    clock: () => LocalDateTime = () => LocalDateTime.now()) {

  /** In-flight alert checks — PUBLIC for the same reason Scheduler.inFlight
    * is: the API's manual check must share this set or it can race the
    * scheduled check of the same alert (duplicate emails). */
  val alertGuard = new InFlightGuard
  private var tickCount = 0L

  /** Every ~10 min of 1 s ticks, compact log tables whose append-file
    * count exceeds the threshold (each append writes one parquet file —
    * ~86k/day under this daemon; scan cost tracks file count). The
    * compactor tolerates the one concurrent writer these tables have
    * (run-now appends) — see CatalogStore.compactIfFragmented. */
  private val CompactEvery = 600L

  final case class AlertTickResult(alertId: Long, action: String)

  /** One combined tick: tasks first (reference order), then due alerts.
    * Tick end is the daemon's materialization boundary: every snapshot the
    * tick's SQL tasks tracked (Jdbc.runScript SELECTs, dedup results) is
    * consumed by now, so release the blocks — the reference's daemon runs
    * for days (web_scheduler.py:5486-5488) and must not creep to a
    * storage-memory OOM. */
  def tick(): (Seq[Scheduler#TickResult], Seq[AlertTickResult]) = try {
    tickCount += 1
    if (tickCount % CompactEvery == 0) {
      store.compactIfFragmented[TaskLog]("task_logs")
      store.compactIfFragmented[SqlAlertLog]("sql_alert_logs")
      store.compactIfFragmented[NotificationLog]("notification_logs")
    }
    tickInner()
  } finally graft.core.Mat.releaseAll()

  private def tickInner(): (Seq[Scheduler#TickResult], Seq[AlertTickResult]) = {
    val taskResults = scheduler.tick()
    val now = clock()
    val alertResults = store.read[SqlAlert]("sql_alerts").collect()
      .filter(_.isEnabled).sortBy(_.id).toSeq.map { a =>
        if (!alerts.isDue(a, now)) AlertTickResult(a.id, "not_due")
        else if (!alertGuard.tryAcquire(a.id)) AlertTickResult(a.id, "skipped_in_flight")
        else try {
          alerts.check(a.id) match {
            case Right(r) if r.triggered => AlertTickResult(a.id, "triggered")
            case Right(_)                => AlertTickResult(a.id, "no_trigger")
            case Left(err)               => AlertTickResult(a.id, s"failed: $err")
          }
        } catch {
          case NonFatal(e) => AlertTickResult(a.id, s"failed: ${e.getMessage}")
        } finally alertGuard.release(a.id)
      }
    (taskResults, alertResults)
  }

  @volatile var stopped = false

  /** ST1 — combined 1 s loop; per-tick failure isolation (ST7). */
  def runLoop(tickMillis: Long = 1000L): Unit =
    while (!stopped) {
      try tick()
      catch { case NonFatal(e) =>
        System.err.println(s"[orchestrator] tick failed: ${e.getMessage}") }
      Thread.sleep(tickMillis)
    }
}
