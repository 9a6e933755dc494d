package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's metadata-serving query layer (SURVEY.md §2.2-2.6 P/J/T
  * tables): filtered, joined, paginated list queries as DataFrame programs.
  */
object Serve {

  /** T4 — pagination envelope (web_scheduler.py:5239-5423): per_page clamped
    * to [1,100], ceil-div page count, ordered LIMIT/OFFSET page. */
  final case class Page(rows: Seq[org.apache.spark.sql.Row], page: Int,
                        perPage: Int, total: Long, pages: Long)

  def paginate(df: DataFrame, orderBy: Seq[Column], page: Int, perPage: Int): Page = {
    val pp = math.max(1, math.min(perPage, 100)) // clamp (web_scheduler.py:5336)
    val pg = math.max(1, page)
    val total = df.count()
    val pages = (total + pp - 1) / pp // ceil-div (F13, web_scheduler.py:5288)
    val rows = df.orderBy(orderBy: _*).offset((pg - 1) * pp).limit(pp).collect().toSeq
    Page(rows, pg, pp, total, pages)
  }

  /** P8 — dynamic conjunctive WHERE builder (web_scheduler.py:4599-4644):
    * fold provided predicates with AND; no predicates → pass-through. */
  def conjunctiveFilter(df: DataFrame, predicates: Seq[Column]): DataFrame =
    predicates.reduceOption(_ && _).map(df.filter).getOrElse(df)

  /** A4 — latest row per key (greatest-n-per-group window). */
  def latestPerKey(df: DataFrame, key: String, time: String, tieBreak: String): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key).orderBy(col(time).desc, col(tieBreak).desc)))
      .filter(col("__rn") === 1).drop("__rn")

  /** J6 — task list with latest-run status (web_scheduler.py:4621-4648):
    * LEFT join to the latest-log window; optional status filter where
    * "never_executed" selects the NULL side (the reference's
    * `tl.task_id IS NULL` anti-join shape). */
  def tasksWithLatestStatus(tasks: DataFrame, taskLogs: DataFrame,
                            statusFilter: Option[String] = None,
                            nameLike: Option[String] = None): DataFrame = {
    val latest = latestPerKey(taskLogs, "taskId", "executionTime", "id")
      .select(col("taskId"), col("status").as("latest_status"),
              col("executionTime").as("latest_execution_time"))
    val joined = tasks.join(latest, tasks("id") === latest("taskId"), "left")
      .drop("taskId")
    val byStatus = statusFilter match {
      case Some("never_executed") => joined.filter(col("latest_status").isNull)
      case Some(s)                => joined.filter(col("latest_status") === s)
      case None                   => joined
    }
    nameLike.map(s => byStatus.filter(col("name").contains(s))).getOrElse(byStatus)
      .orderBy(col("id").desc) // T1
  }

  /** F8/F9 — auth primitives. The reference stores werkzeug hashes
    * (web_scheduler.py:690,1652,4104 `generate_password_hash` /
    * `check_password_hash`), whose wire format is public:
    * `pbkdf2:sha256:<iterations>$<salt>$<hex(pbkdf2_hmac(sha256))>`.
    * Hashes EMITTED here use that exact format (JDK PBKDF2WithHmacSHA256,
    * werkzeug's current 600000-iteration default, 32-byte dk), so a users
    * table migrated FROM the reference's scheduler.db authenticates here
    * unchanged — and one exported TO it authenticates there. Legacy
    * `salt:sha256hex` rows written by earlier rounds still verify. */
  object Auth {
    private val rnd = new java.security.SecureRandom()
    private val DefaultIterations = 600000 // werkzeug ≥2.3 default

    private def pbkdf2Hex(password: String, salt: String, iterations: Int): String = {
      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt.getBytes("UTF-8"), iterations, 256)
      val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      f.generateSecret(spec).getEncoded.map("%02x".format(_)).mkString
    }

    def hashPassword(password: String, salt: String): String =
      hashPassword(password, salt, DefaultIterations)

    def hashPassword(password: String, salt: String, iterations: Int): String =
      s"pbkdf2:sha256:$iterations$$$salt$$${pbkdf2Hex(password, salt, iterations)}"

    /** werkzeug's gen_salt shape: 16 chars, url/db-safe alphanumerics. */
    def newSalt(): String = {
      val alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
      Array.fill(16)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }

    def verifyPassword(password: String, stored: String): Boolean =
      stored.split("\\$", 3) match {
        // werkzeug format: method$salt$hash, method = pbkdf2:sha256[:iter]
        case Array(method, salt, _) if method.startsWith("pbkdf2:sha256") =>
          val iterations = method.split(":", 3) match {
            case Array(_, _, it) => try it.toInt catch { case _: NumberFormatException => return false }
            case _ => DefaultIterations // werkzeug omits iter at its default
          }
          java.security.MessageDigest.isEqual(
            stored.getBytes("UTF-8"),
            hashPassword(password, salt, iterations).getBytes("UTF-8"))
        // legacy (pre-r8) format: salt:sha256(salt+password)
        case _ => stored.split(":", 2) match {
          case Array(salt, _) =>
            val md = java.security.MessageDigest.getInstance("SHA-256")
            val d = md.digest((salt + password).getBytes("UTF-8"))
            java.security.MessageDigest.isEqual(
              stored.getBytes("UTF-8"),
              (salt + ":" + d.map("%02x".format(_)).mkString).getBytes("UTF-8"))
          case _ => false
        }
      }

    /** secrets.token_urlsafe(32) equivalent (web_scheduler.py:4225). */
    def newToken(): String = {
      val b = new Array[Byte](32); rnd.nextBytes(b)
      java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
    }
  }
}
