package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time conventions (SURVEY.md F2-F6): the reference stores all timestamps
  * as naive Beijing-time (UTC+8) ISO-8601 strings (get_beijing_time,
  * web_scheduler.py:722-733 — UTC now + 8h, tzinfo stripped). The rebuild
  * standardizes on that convention explicitly instead of mixing server-local
  * and Beijing clocks like the reference does (trap list §7.5).
  */
object TimeUtils {

  val BeijingOffset: ZoneOffset = ZoneOffset.ofHours(8)

  /** F2 — naive Beijing now (UTC+8, no zone). */
  def beijingNow(clock: () => Instant = () => Instant.now()): LocalDateTime =
    LocalDateTime.ofInstant(clock(), BeijingOffset)

  /** F2 — the reference's `.isoformat()` with microseconds. */
  private val isoMicros = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
  def isoFormat(t: LocalDateTime): String = t.format(isoMicros)

  /** F3 — `datetime.fromisoformat` equivalent (accepts with/without
    * fraction). */
  def isoParse(s: String): LocalDateTime = LocalDateTime.parse(s)

  /** F4 — display format `%Y-%m-%d %H:%M:%S`. */
  private val display = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  def displayFormat(t: LocalDateTime): String = t.format(display)

  /** Column-level Beijing now (F2/F5 on the data path):
    * `from_utc_timestamp(current_timestamp, Asia/Shanghai)`. */
  def beijingNowCol: Column =
    from_utc_timestamp(current_timestamp(), "Asia/Shanghai")

  /** F11 — the export layer's date-column detection (web_scheduler.py:
    * 3657-3704): a column "looks like a date" if its NAME contains a date
    * keyword or a sampled VALUE matches one of the reference's patterns. */
  private val nameKeywords =
    Seq("date", "time", "created", "updated", "day", "日期", "时间")
  private val valuePatterns = Seq(
    "^\\d{4}-\\d{2}-\\d{2}$",
    "^\\d{4}/\\d{2}/\\d{2}$",
    "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$",
    "^\\d{4}/\\d{2}/\\d{2} \\d{2}:\\d{2}:\\d{2}$",
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}",
    "^\\d{2}/\\d{2}/\\d{4}$").map(_.r)

  def looksLikeDateColumn(name: String, sampleValues: Seq[String]): Boolean =
    nameKeywords.exists(name.toLowerCase.contains) ||
      sampleValues.filter(_ != null).take(10)
        .exists(v => valuePatterns.exists(_.findFirstIn(v).isDefined))
}
