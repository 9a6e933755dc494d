package graft.alerts

import java.sql.Timestamp

import graft.SparkSuite
import graft.catalog.CatalogStore
import graft.catalog.Model._

/** send_task_notification semantics (web_scheduler.py:1147-1228). */
class TaskNotifierSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshEnv(): (CatalogStore, InMemoryNotifier, TaskNotifier) = {
    val store = new CatalogStore(spark, tmpDir("tn-cat"))
    import spark.implicits._
    store.overwrite(Seq(
      Task(1L, "nightly etl", "sql", None, Some(1L), 3600L, None, None,
        isActive = true, None, 0, 60, None, ts("2026-01-01 00:00:00"))).toDS(), "tasks")
    store.overwrite(Seq(
      EmailConfig(4L, "ops", "smtp", 25, false, "u", "p", "noreply@x", true,
        isDefault = true, ts("2026-01-01 00:00:00")),
      EmailConfig(5L, "backup", "smtp2", 25, false, "u2", "p2", "nr@x", true,
        isDefault = false, ts("2026-01-01 00:00:00"))).toDS(), "email_configs")
    val n = new InMemoryNotifier
    val tn = new TaskNotifier(spark, store, _ => n,
      clock = () => java.time.LocalDateTime.of(2026, 1, 10, 12, 0, 0))
    (store, n, tn)
  }

  test("fires every enabled matching alert, logs sent rows, exact body") {
    val (store, n, tn) = freshEnv()
    import spark.implicits._
    store.overwrite(Seq(
      TaskAlert(1L, Some("ok-watch"), Some(1L), "success", 4L, "a@x, b@x",
        isEnabled = true, ts("2026-01-01 00:00:00")),
      TaskAlert(2L, Some("other-cfg"), None, "success", 5L, "c@x",
        isEnabled = true, ts("2026-01-01 00:00:00")),
      TaskAlert(3L, Some("disabled"), None, "success", 4L, "d@x",
        isEnabled = false, ts("2026-01-01 00:00:00"))).toDS(), "task_alerts")
    val rows = tn.notify(1L, "success", "42 rows loaded")
    assert(rows.length == 2) // disabled alert skipped
    assert(n.sent.length == 2)
    assert(n.sent.head.recipients == Seq("a@x", "b@x")) // comma-split
    assert(n.sent.head.subject == "任务执行成功预警: nightly etl")
    assert(n.sent.head.body ==
      "任务执行成功，触发了预警通知。\n\n任务名称: nightly etl\n任务ID: 1\n" +
      "执行状态: 成功\n执行时间: 2026-01-10 12:00:00\n\n详细信息:\n42 rows loaded")
    val logged = store.read[NotificationLog]("notification_logs").collect()
    assert(logged.length == 2 && logged.forall(_.status == "sent"))
    assert(logged.map(_.emailConfigId).toSet == Set(Some(4L), Some(5L)))
  }

  test("reference quirk: 'failure'-typed alerts never match status 'failed'") {
    val (store, n, tn) = freshEnv()
    import spark.implicits._
    store.overwrite(Seq(
      TaskAlert(1L, Some("fail-watch"), None, "failure", 4L, "a@x",
        isEnabled = true, ts("2026-01-01 00:00:00"))).toDS(), "task_alerts")
    // alert_type compared to the raw status with NO mapping
    // (web_scheduler.py:1163) — 'failure' != 'failed', nothing fires
    assert(tn.notify(1L, "failed", "boom").isEmpty)
    assert(n.sent.isEmpty)
    // an alert typed with the literal status value DOES fire
    store.overwrite(Seq(
      TaskAlert(2L, Some("literal"), None, "failed", 4L, "a@x",
        isEnabled = true, ts("2026-01-01 00:00:00"))).toDS(), "task_alerts")
    assert(tn.notify(1L, "failed", "boom").length == 1)
  }

  test("send failure logs a 'failed' notification row with the error") {
    val (store, _, _) = freshEnv()
    import spark.implicits._
    store.overwrite(Seq(
      TaskAlert(1L, Some("w"), None, "success", 4L, "a@x",
        isEnabled = true, ts("2026-01-01 00:00:00"))).toDS(), "task_alerts")
    val failing = new Notifier {
      def send(r: Seq[String], s: String, b: String, a: Seq[String]) =
        Left("smtp down")
    }
    val tn = new TaskNotifier(spark, store, _ => failing,
      clock = () => java.time.LocalDateTime.of(2026, 1, 10, 12, 0, 0))
    val rows = tn.notify(1L, "success", "msg")
    assert(rows.length == 1 && rows.head.status == "failed")
    assert(rows.head.errorMessage.contains("smtp down"))
  }

  test("unknown task and no matching alerts are silent no-ops") {
    val (store, n, tn) = freshEnv()
    assert(tn.notify(99L, "success", "m").isEmpty) // missing task
    assert(tn.notify(1L, "success", "m").isEmpty)  // no alerts configured
    assert(n.sent.isEmpty)
    assert(!store.exists("notification_logs"))
  }

  test("scheduler run dispatches notifications end-to-end") {
    val (store, n, _) = freshEnv()
    import spark.implicits._
    store.overwrite(Seq(
      TaskAlert(1L, Some("w"), None, "success", 4L, "ops@x",
        isEnabled = true, ts("2026-01-01 00:00:00"))).toDS(), "task_alerts")
    // make the single task due now
    val t0 = store.read[Task]("tasks").collect().head
    store.upsert[Task]("tasks",
      Seq(t0.copy(nextRun = Some(ts("2026-01-09 00:00:00")))), _.id)
    val tn = new TaskNotifier(spark, store, _ => n,
      clock = () => java.time.LocalDateTime.of(2026, 1, 10, 12, 0, 0))
    val sched = new graft.sched.Scheduler(spark, store,
      _ => Right("loaded"),
      clock = () => java.time.LocalDateTime.of(2026, 1, 10, 12, 0, 0),
      taskNotifier = Some(tn))
    val results = sched.tick()
    assert(results.exists(r => r.action == "executed" && r.status.contains("success")))
    assert(n.sent.exists(_.subject == "任务执行成功预警: nightly etl"))
    assert(store.read[NotificationLog]("notification_logs").collect()
      .exists(l => l.taskId.contains(1L) && l.status == "sent"))
  }
}
