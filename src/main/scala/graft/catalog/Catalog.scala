package graft.catalog

import java.sql.Timestamp

/** Typed metadata catalog — the reference's 12 SQLite tables re-expressed as
  * case classes (DDL: web_scheduler.py:335-702; column inventory FIXTURES.md §2).
  *
  * Stored as one Parquet directory per table via [[CatalogStore]]; every row
  * type gets a Spark `Encoder` automatically (case class → `Dataset[T]`).
  */
object Model {

  /** tasks (web_scheduler.py:360-375 + additive cols 392-422). */
  final case class Task(
      id: Long,
      name: String,
      taskType: String, // 'python' | 'sql'
      scriptPath: Option[String],
      sqlScriptId: Option[Long],
      scheduleInterval: Long, // seconds
      lastRun: Option[Timestamp],
      nextRun: Option[Timestamp],
      isActive: Boolean,
      dependencies: Option[String], // CSV of task ids (reference semantics F1)
      maxRetries: Int,
      retryDelay: Int, // seconds
      cronExpression: Option[String],
      createdAt: Timestamp)

  /** db_configs (web_scheduler.py:456-467). */
  final case class DbConfig(
      id: Long,
      name: String,
      dbType: String, // 'mysql' | 'postgresql' | 'sqlite' — external JDBC targets
      host: String,
      port: Int,
      username: String,
      password: String,
      database: Option[String],
      createdAt: Timestamp)

  /** sql_scripts (web_scheduler.py:470-479). */
  final case class SqlScript(
      id: Long,
      name: String,
      dbConfigId: Option[Long],
      sqlContent: String,
      createdAt: Timestamp)

  /** task_logs (web_scheduler.py:532-541) — append-only run log. */
  final case class TaskLog(
      id: Long,
      taskId: Long,
      status: String, // 'success' | 'failed'
      message: String,
      executionTime: Timestamp)

  /** sql_alerts (web_scheduler.py:617-633 + 648-667). */
  final case class SqlAlert(
      id: Long,
      name: String,
      sqlScriptId: Long,
      emailConfigId: Option[Long],
      recipients: String, // CSV
      conditionType: String, // not_empty | rows_gt | rows_lt | rows_eq | rows_neq
      threshold: Long,
      isEnabled: Boolean,
      lastCheck: Option[Timestamp],
      cronExpression: Option[String],
      nextCheck: Option[Timestamp])

  /** sql_alert_logs (web_scheduler.py:636-646). */
  final case class SqlAlertLog(
      id: Long,
      alertId: Long,
      alertName: String,
      status: String, // triggered | triggered_email_failed | no_trigger | failed
      message: String,
      executionTime: Timestamp,
      details: Option[String])

  /** task_alerts (web_scheduler.py:562-575 + 601-614). */
  final case class TaskAlert(
      id: Long,
      name: Option[String],
      taskId: Option[Long], // None = global alert
      alertType: String, // success | failure | timeout
      emailConfigId: Long,
      recipients: String,
      isEnabled: Boolean,
      createdAt: Timestamp)

  /** email_configs (web_scheduler.py:544-559 + 669-680). */
  final case class EmailConfig(
      id: Long,
      configName: String,
      mailServer: String,
      mailPort: Int,
      mailUseTls: Boolean,
      mailUsername: String,
      mailPassword: String,
      mailDefaultSender: String,
      notificationEnabled: Boolean,
      isDefault: Boolean,
      createdAt: Timestamp)

  /** notification_logs (web_scheduler.py:578-594). */
  final case class NotificationLog(
      id: Long,
      taskId: Option[Long],
      taskName: String,
      alertType: String,
      emailConfigId: Option[Long], // config may have been deleted (J5 left join)
      recipients: String,
      subject: String,
      body: String,
      status: String, // sent | failed
      errorMessage: Option[String],
      sentTime: Timestamp)

  /** users (web_scheduler.py:509-516). */
  final case class User(
      id: Long,
      username: String,
      passwordHash: String,
      createdAt: Timestamp)

  /** user_tokens (web_scheduler.py:519-529; `name` column used by the
    * token-management endpoints, :4232). */
  final case class UserToken(
      id: Long,
      userId: Long,
      token: String,
      expiresAt: Timestamp,
      createdAt: Timestamp,
      name: Option[String] = None)
}
