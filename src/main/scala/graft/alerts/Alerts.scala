package graft.alerts

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Row}

/** SQL-alert engine: condition evaluation over query-result cardinality,
  * audit transcript, and a pluggable notifier (reference §3.3,
  * web_scheduler.py:3116-3613).
  */
object Condition {

  /** A2 — result-cardinality predicates (web_scheduler.py:3354-3364):
    * not_empty: n > 0; rows_gt: n > t; rows_lt: n < t; rows_eq: n == t;
    * rows_neq: n != t. Unknown condition types never trigger. */
  def evaluate(conditionType: String, threshold: Long, rowCount: Long): Boolean =
    conditionType match {
      case "not_empty" => rowCount > 0
      case "rows_gt"   => rowCount > threshold
      case "rows_lt"   => rowCount < threshold
      case "rows_eq"   => rowCount == threshold
      case "rows_neq"  => rowCount != threshold
      case _           => false
    }

  /** Human label for a condition (web_scheduler.py:1118-1127). */
  def describe(conditionType: String, threshold: Long): String = conditionType match {
    case "not_empty" => "result not empty"
    case "rows_gt"   => s"row count > $threshold"
    case "rows_lt"   => s"row count < $threshold"
    case "rows_eq"   => s"row count == $threshold"
    case "rows_neq"  => s"row count != $threshold"
    case other       => s"unknown condition '$other'"
  }
}

/** Outcome of one alert check, including the observable `details` transcript
  * the reference writes to sql_alert_logs (web_scheduler.py:3437-3473):
  * config echo, SQL text, row count, first-10-row preview with column names.
  */
final case class AlertCheckResult(
    alertName: String,
    triggered: Boolean,
    rowCount: Long,
    columns: Seq[String],
    preview: Seq[Seq[String]], // first 10 rows, stringified
    details: String,
    checkedAt: LocalDateTime)

object AlertChecker {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Evaluate an alert query result against a condition. The count and the
    * 10-row preview are the ONLY driver-side materializations (df.limit(10)
    * — never a full collect), so the alert query itself can be 100 TB-sized.
    */
  def check(alertName: String, sql: String, result: DataFrame,
            conditionType: String, threshold: Long,
            now: LocalDateTime = LocalDateTime.now()): AlertCheckResult = {
    val n = result.count()
    val triggered = Condition.evaluate(conditionType, threshold, n)
    val cols = result.columns.toSeq
    val preview = result.limit(10).collect().toSeq
      .map((r: Row) => cols.indices.map(i => String.valueOf(r.get(i))))
    val details =
      s"""Alert: $alertName
         |Time: ${now.format(fmt)}
         |SQL: $sql
         |Condition: ${Condition.describe(conditionType, threshold)}
         |Row count: $n
         |Triggered: $triggered
         |Columns: ${cols.mkString(", ")}
         |Preview (first ${preview.size} rows):
         |${preview.map(_.mkString(" | ")).mkString("\n")}""".stripMargin
    AlertCheckResult(alertName, triggered, n, cols, preview, details, now)
  }
}

/** S11 — notification sink behind an interface so tests (and this offline
  * environment) stub SMTP; a production impl would use JavaMail. Recipients
  * are a comma-split list (web_scheduler.py:3750). */
trait Notifier {
  def send(recipients: Seq[String], subject: String, body: String,
           attachments: Seq[String] = Nil): Either[String, Unit]
}

/** Collects messages in memory — test double and offline default. */
final class InMemoryNotifier extends Notifier {
  final case class Sent(recipients: Seq[String], subject: String, body: String,
                        attachments: Seq[String])
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Sent]
  def sent: Seq[Sent] = buf.toSeq
  override def send(recipients: Seq[String], subject: String, body: String,
                    attachments: Seq[String]): Either[String, Unit] = {
    buf += Sent(recipients, subject, body, attachments); Right(())
  }
}

object Notifier {
  /** Comma-split recipients, trimmed, empties dropped (reference F1). */
  def splitRecipients(csv: String): Seq[String] =
    csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
}
