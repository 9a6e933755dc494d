package graft

import org.apache.spark.sql.SparkSession

import graft.alerts.{AlertService, Notifier, TaskNotifier}
import graft.catalog.CatalogStore
import graft.catalog.Model._
import graft.core.GraftSession
import graft.sched.{Orchestrator, Scheduler}
import graft.serve.{AdminApi, HttpApi}
import graft.sources.Jdbc

/** Production entrypoint — the composition the reference performs at
  * startup (web_scheduler.py:5480-5488: start the scheduler daemon
  * thread, then the Flask app): catalog store, combined scheduler+alert
  * daemon, query REST surface, mutating REST surface + dashboard, and a
  * graceful shutdown path (flip the daemon, stop accepting, drain handler
  * pools, final blocking materialization drain, session stop).
  *
  * `sbt "runMain graft.Main [catalogDir [httpPort adminPort]]"` — then
  * open `http://127.0.0.1:<adminPort>/` (seeded admin/admin123).
  */
object Main {

  /** Running service set. `stop()` is idempotent and leaves the session
    * with zero graft-originated storage blocks (MainSpec asserts it). */
  final class App(val store: CatalogStore,
                  val orchestrator: Orchestrator,
                  val httpApi: HttpApi, val httpPort: Int,
                  val adminApi: AdminApi, val adminPort: Int,
                  daemon: Thread) {
    def stop(): Unit = {
      orchestrator.stopped = true
      daemon.join(15000)
      val adminDrained = adminApi.stop() // stops accepting, drains handlers
      val httpDrained = httpApi.stop()
      // the global drain unpersists EVERY scope's frames — only safe once
      // no owner is still mid-flight (a live tick/handler's checkpoint has
      // truncated lineage and cannot be recomputed after release). A
      // straggler — e.g. a python task inside its 300 s subprocess
      // timeout — keeps its blocks; they fall with the session instead.
      if (!daemon.isAlive && adminDrained && httpDrained)
        graft.core.Mat.releaseAllScopes(blocking = true)
      else
        System.err.println("[graft] stop: an owner is still running after " +
          "the grace period; skipped the global materialization drain " +
          "(blocks are released when the session stops)")
    }
  }

  /** Alert e-mails resolve the catalog's default email config AT SEND
    * TIME (the reference re-reads config per send, so edits apply without
    * restart); no enabled default config → Left, recorded as
    * triggered_email_failed in the alert audit log. */
  private def defaultConfigNotifier(store: CatalogStore): Notifier =
    (recipients: Seq[String], subject: String, body: String,
     attachments: Seq[String]) =>
      store.read[EmailConfig]("email_configs").collect()
        .find(c => c.isDefault && c.notificationEnabled)
        .toRight("no enabled default email config")
        .flatMap(cfg => TaskNotifier.smtp(cfg)
          .send(recipients, subject, body, attachments))

  /** Wire and start every service against `catalogDir`. Ports 0 = OS-
    * assigned ephemeral (tests); the reference's defaults are 5000/5001.
    * `debugEndpoints` defaults OFF here: the reference ships its debug
    * surface unauthenticated (web_scheduler.py:2752-2754, 4491-4526) and
    * AdminApi keeps that default for parity harnesses, but the production
    * composition must not mint write-API tokens for any local process —
    * opt in explicitly when the deployment wants reference-exact debug
    * routes. */
  def start(spark: SparkSession, catalogDir: String,
            httpPort: Int = 0, adminPort: Int = 0,
            debugEndpoints: Boolean = false): App = {
    val store = new CatalogStore(spark, catalogDir)
    val taskNotifier = new TaskNotifier(spark, store)
    val alerts = new AlertService(spark, store, defaultConfigNotifier(store),
      exportDir = s"$catalogDir/exports")
    val executor = Scheduler.defaultExecutor(spark, store) _
    val scheduler = new Scheduler(spark, store, executor,
      taskNotifier = Some(taskNotifier))
    val orchestrator = new Orchestrator(spark, store, scheduler, alerts)

    val httpApi = new HttpApi(spark, HttpApi.Deps(
      tasks = () => store.read[Task]("tasks").toDF(),
      taskLogs = () => store.read[TaskLog]("task_logs").toDF(),
      sqlScripts = () => store.read[SqlScript]("sql_scripts").toDF(),
      notificationLogs = () => store.read[NotificationLog]("notification_logs").toDF(),
      emailConfigs = () => store.read[EmailConfig]("email_configs").toDF(),
      users = () => store.read[User]("users").toDF(),
      userTokens = () => store.read[UserToken]("user_tokens").toDF(),
      dbConfigs = () => store.read[DbConfig]("db_configs").toDF(),
      insert = (cfg, table, records) =>
        Jdbc.insertRecords(spark, Jdbc.target(cfg), table, records)))
    val boundHttp = httpApi.start(httpPort)

    val adminApi = new AdminApi(spark, store, executor, Some(alerts),
      taskNotifier = Some(taskNotifier),
      // filesystem session store next to the catalog (the reference's
      // flask_session/ dir): logins survive a server restart
      sessionDir = Some(s"$catalogDir/_sessions"),
      debugEndpoints = debugEndpoints,
      // ONE in-flight set per resource across the daemon and the API:
      // a manual run-now (or alert check) racing the scheduled run of
      // the same task/alert must 409, not double-execute
      taskInFlight = scheduler.inFlight,
      alertInFlight = orchestrator.alertGuard)
    val boundAdmin = adminApi.start(adminPort)

    val daemon = new Thread(() => orchestrator.runLoop(), "graft-orchestrator")
    daemon.setDaemon(true)
    daemon.start()
    new App(store, orchestrator, httpApi, boundHttp, adminApi, boundAdmin, daemon)
  }

  def main(args: Array[String]): Unit = {
    val catalogDir = args.lift(0).getOrElse("catalog")
    val httpPort = args.lift(1).map(_.toInt).getOrElse(5000)
    val adminPort = args.lift(2).map(_.toInt).getOrElse(5001)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val app = start(spark, catalogDir, httpPort, adminPort)
    println(s"graft up: query API :${app.httpPort}, admin+dashboard " +
      s"http://127.0.0.1:${app.adminPort}/ (admin/admin123), catalog $catalogDir")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      app.stop()
      spark.stop()
    }, "graft-shutdown"))
    Thread.currentThread().join() // services run until SIGTERM/Ctrl-C
  }
}
