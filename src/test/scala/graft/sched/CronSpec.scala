package graft.sched

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class CronSpec extends AnyFunSuite {
  private val base = LocalDateTime.of(2026, 3, 15, 10, 30, 45) // Sunday

  test("*/1 * * * * fires next minute, strictly after base") {
    assert(Cron.next("*/1 * * * *", base) == LocalDateTime.of(2026, 3, 15, 10, 31))
  }

  test("*/5 * * * * rounds up to the next multiple of 5") {
    assert(Cron.next("*/5 * * * *", base) == LocalDateTime.of(2026, 3, 15, 10, 35))
    // exactly on a boundary → strictly after
    assert(Cron.next("*/5 * * * *", LocalDateTime.of(2026, 3, 15, 10, 35, 0)) ==
      LocalDateTime.of(2026, 3, 15, 10, 40))
  }

  test("0 9 * * * fires at 09:00 next day when past 9am") {
    assert(Cron.next("0 9 * * *", base) == LocalDateTime.of(2026, 3, 16, 9, 0))
  }

  test("ranges, lists and steps") {
    assert(Cron.next("15,45 * * * *", base) == LocalDateTime.of(2026, 3, 15, 10, 45))
    assert(Cron.next("0 9-17/2 * * *", base) == LocalDateTime.of(2026, 3, 15, 11, 0))
  }

  test("day-of-week: 2026-03-15 is a Sunday (cron dow 0)") {
    assert(Cron.next("0 0 * * 0", base) == LocalDateTime.of(2026, 3, 22, 0, 0))
    // dow 7 is also Sunday
    assert(Cron.next("0 0 * * 7", base) == LocalDateTime.of(2026, 3, 22, 0, 0))
  }

  test("dom OR dow when both restricted (standard cron)") {
    // next 2026-03-20 (Friday, dom=20) vs next Monday (2026-03-16): OR → Monday
    assert(Cron.next("0 0 20 * 1", base) == LocalDateTime.of(2026, 3, 16, 0, 0))
  }

  test("month restriction skips months") {
    assert(Cron.next("0 0 1 7 *", base) == LocalDateTime.of(2026, 7, 1, 0, 0))
  }

  test("invalid expressions are rejected") {
    assert(!Cron.isValid("* * * *"))       // 4 fields
    assert(!Cron.isValid("61 * * * *"))    // out of range
    assert(!Cron.isValid("a b c d e"))
    assert(Cron.isValid("*/5 * * * *"))
    assert(Cron.isValid("0 9 * * 1-5"))
  }

  test("Feb 29 schedule fires on the next leap year") {
    assert(Cron.next("0 0 29 2 *", base) == LocalDateTime.of(2028, 2, 29, 0, 0))
  }
}
