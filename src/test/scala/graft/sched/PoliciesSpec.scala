package graft.sched

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

class PoliciesSpec extends AnyFunSuite {
  private val now = LocalDateTime.of(2026, 1, 10, 12, 0)
  private def t(minsAgo: Long) = now.minusMinutes(minsAgo)

  // --- dependency parsing (F1, web_scheduler.py:1243-1249) ---

  test("parseDependencies: empty/None → no deps") {
    assert(Policies.parseDependencies(None).isEmpty)
    assert(Policies.parseDependencies(Some("")).isEmpty)
    assert(Policies.parseDependencies(Some("  ")).isEmpty)
  }

  test("parseDependencies: CSV with empty elements filtered") {
    assert(Policies.parseDependencies(Some("1,,2,")) == Some(Seq(1L, 2L)))
  }

  test("parseDependencies: invalid format → None (gate passes, reference ValueError path)") {
    assert(Policies.parseDependencies(Some("1,abc")).isEmpty)
  }

  // --- dependency gate truth table (web_scheduler.py:1231-1286) ---

  private val known = Set(1L, 2L, 26L)

  test("gate: no deps → executes") {
    assert(Policies.canExecute(None, known, _ => None))
  }

  test("gate: dep latest success → executes") {
    assert(Policies.canExecute(Some("1"), known, _ => Some("success")))
  }

  test("gate: dep latest failed → blocked") {
    assert(!Policies.canExecute(Some("1"), known, _ => Some("failed")))
  }

  test("gate: dep never executed → blocked") {
    assert(!Policies.canExecute(Some("1"), known, _ => None))
  }

  test("gate: unknown dep id is skipped (reference IN-query omits it)") {
    assert(Policies.canExecute(Some("99"), known, _ => None))
  }

  test("gate: invalid format → executes") {
    assert(Policies.canExecute(Some("1,xyz"), known, _ => Some("failed")))
  }

  test("gate: self-dependency satisfied by own last success (prod task 26)") {
    assert(Policies.canExecute(Some("26"), known,
      id => if (id == 26L) Some("success") else None))
  }

  // --- retry policy (A3/ST5, web_scheduler.py:1331-1370) ---

  test("retry: maxRetries=0 never retries") {
    assert(!Policies.shouldRetry(Seq(("failed", t(10))), 0, 60, now))
  }

  test("retry: last success → no retry") {
    assert(!Policies.shouldRetry(Seq(("success", t(10)), ("failed", t(20))), 3, 60, now))
  }

  test("retry: failed within budget and delay elapsed → retry") {
    assert(Policies.shouldRetry(Seq(("failed", t(10))), 3, 60, now))
  }

  test("retry: delay not yet elapsed → no retry") {
    assert(!Policies.shouldRetry(Seq(("failed", t(10))), 3, 3600, now))
  }

  test("retry: consecutive-failure budget exhausted → no retry") {
    val logs = Seq(("failed", t(1)), ("failed", t(2)), ("failed", t(3)), ("failed", t(4)))
    // maxRetries=3: window of 4 logs has 4 failures > 3 → stop retrying
    assert(!Policies.shouldRetry(logs, 3, 0, now))
  }

  test("retry: a success inside the window resets the effective count") {
    val logs = Seq(("failed", t(1)), ("failed", t(2)), ("success", t(3)), ("failed", t(4)))
    // window of 4: 3 failed ≤ maxRetries=3 → retry allowed
    assert(Policies.shouldRetry(logs, 3, 0, now))
  }

  // --- next-run (O4) ---

  test("nextRun: interval when no cron") {
    assert(Policies.nextRun(None, 300, now) == now.plusSeconds(300))
  }

  test("nextRun: cron when valid") {
    assert(Policies.nextRun(Some("0 9 * * *"), 300, now) ==
      LocalDateTime.of(2026, 1, 11, 9, 0))
  }

  test("nextRun: invalid cron falls back to interval (web_scheduler.py:1385-1387)") {
    assert(Policies.nextRun(Some("not a cron"), 300, now) == now.plusSeconds(300))
  }

  test("isDue: missing nextRun fires immediately (ST1)") {
    assert(Policies.isDue(None, now))
    assert(Policies.isDue(Some(now), now))
    assert(!Policies.isDue(Some(now.plusSeconds(1)), now))
  }

  test("InFlightGuard: second acquire fails until release (ST3)") {
    val g = new InFlightGuard
    assert(g.tryAcquire(1))
    assert(!g.tryAcquire(1))
    g.release(1)
    assert(g.tryAcquire(1))
  }
}
