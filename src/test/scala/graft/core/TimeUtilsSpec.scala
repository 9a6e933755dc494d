package graft.core

import java.time.{Instant, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

class TimeUtilsSpec extends AnyFunSuite {

  test("beijingNow = UTC + 8h, naive (F2)") {
    val fixed = Instant.parse("2026-01-10T00:30:00Z")
    assert(TimeUtils.beijingNow(() => fixed) ==
      LocalDateTime.of(2026, 1, 10, 8, 30))
  }

  test("iso round-trip with microseconds (F2/F3)") {
    val t = LocalDateTime.of(2026, 1, 10, 8, 30, 15, 123456000)
    assert(TimeUtils.isoFormat(t) == "2026-01-10T08:30:15.123456")
    assert(TimeUtils.isoParse(TimeUtils.isoFormat(t)) == t)
    assert(TimeUtils.isoParse("2026-01-10T08:30:15") ==
      LocalDateTime.of(2026, 1, 10, 8, 30, 15))
  }

  test("display format (F4)") {
    assert(TimeUtils.displayFormat(LocalDateTime.of(2026, 1, 2, 3, 4, 5)) ==
      "2026-01-02 03:04:05")
  }

  test("date-column detection by name and by value pattern (F11)") {
    assert(TimeUtils.looksLikeDateColumn("created_at", Nil))
    assert(TimeUtils.looksLikeDateColumn("日期", Nil))
    assert(TimeUtils.looksLikeDateColumn("x", Seq("2026-01-02")))
    assert(TimeUtils.looksLikeDateColumn("x", Seq("2026/01/02 03:04:05")))
    assert(!TimeUtils.looksLikeDateColumn("total_price", Seq("12.5", "99")))
  }

  test("script path normalization (S9)") {
    import graft.sched.Scheduler
    assert(Scheduler.normalizeScriptPath("uploads/job.py") == "uploads/job.py")
    assert(Scheduler.normalizeScriptPath("C:\\Users\\x\\job.py") == "uploads/job.py")
    assert(Scheduler.normalizeScriptPath("/opt/elsewhere/job.py") == "uploads/job.py")
  }
}
