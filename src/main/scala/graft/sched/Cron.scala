package graft.sched

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Pure-Scala 5-field cron (minute hour day-of-month month day-of-week),
  * reproducing croniter's `get_next(datetime)` semantics as used by the
  * reference (web_scheduler.py:1382-1383, 1518-1519): the next fire time
  * STRICTLY after the base time, seconds truncated.
  *
  * Supported syntax per field: `*`, `n`, `a-b`, `* / n`, `a-b/n`, and
  * comma-lists of those. Day-of-month and day-of-week combine with OR when
  * both are restricted (standard cron behavior). Invalid expressions throw
  * `IllegalArgumentException` — callers implement the reference's
  * fall-back-to-interval on invalid cron (O4, web_scheduler.py:1380-1390).
  */
object Cron {

  final case class Spec(minutes: Set[Int], hours: Set[Int], doms: Set[Int],
                        months: Set[Int], dows: Set[Int],
                        domRestricted: Boolean, dowRestricted: Boolean) {
    def matches(t: LocalDateTime): Boolean = {
      val dow = t.getDayOfWeek.getValue % 7 // cron: 0=Sunday
      val dayOk =
        if (domRestricted && dowRestricted) doms(t.getDayOfMonth) || dows(dow)
        else doms(t.getDayOfMonth) && dows(dow)
      minutes(t.getMinute) && hours(t.getHour) && dayOk && months(t.getMonthValue)
    }
  }

  def parse(expr: String): Spec = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron must have 5 fields: '$expr'")
    val Array(m, h, dom, mon, dow) = fields
    Spec(
      parseField(m, 0, 59), parseField(h, 0, 23), parseField(dom, 1, 31),
      parseField(mon, 1, 12), parseField(dow, 0, 7).map(_ % 7), // 7 == Sunday == 0
      domRestricted = dom != "*", dowRestricted = dow != "*")
  }

  private def parseField(f: String, lo: Int, hi: Int): Set[Int] =
    f.split(",").toSet.flatMap { part: String =>
      val (rangePart, step) = part.split("/") match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _           => throw new IllegalArgumentException(s"bad cron field '$f'")
      }
      require(step >= 1, s"bad cron step in '$f'")
      val range = rangePart match {
        case "*" => lo to hi
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-", 2).map(_.toInt)
          require(a >= lo && b <= hi && a <= b, s"bad cron range '$f'")
          a to b
        case n =>
          val v = n.toInt
          require(v >= lo && v <= hi, s"cron value $v out of [$lo,$hi]")
          v to v
      }
      range.by(step).toSet
    }

  /** Next fire time strictly after `base` (croniter get_next semantics).
    * Minute-resolution scan bounded to 4 years (beyond any 5-field cron's
    * period; Feb-29 schedules repeat within 4 years). */
  def next(expr: String, base: LocalDateTime): LocalDateTime = {
    val spec = parse(expr)
    var t = base.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = base.plusYears(4)
    while (!spec.matches(t)) {
      t = t.plusMinutes(1)
      if (t.isAfter(limit))
        throw new IllegalArgumentException(s"cron '$expr' never fires")
    }
    t
  }

  def isValid(expr: String): Boolean =
    try { parse(expr); true } catch { case _: Exception => false }
}
