package graft.sched

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive-sweep property tests pinning croniter-compatible semantics
  * (F7) and the splitter's invariants (O1): every generated cron × base
  * combination must produce a strictly-later, spec-matching, minimal next
  * fire time. */
class CronPropertySpec extends AnyFunSuite {

  private val minutes = Seq("*", "0", "15", "*/15", "10-40/10", "5,35")
  private val hours   = Seq("*", "9", "*/4", "9-17")
  private val doms    = Seq("*", "1", "28")
  private val months  = Seq("*", "6", "1-6")
  private val dows    = Seq("*", "0", "1-5", "6,0")

  private val bases = Seq(
    LocalDateTime.of(2025, 1, 1, 0, 0, 0),
    LocalDateTime.of(2025, 6, 15, 10, 30, 45),
    LocalDateTime.of(2025, 12, 31, 23, 59, 59),
    LocalDateTime.of(2026, 2, 28, 23, 0, 1),
    LocalDateTime.of(2026, 7, 4, 12, 0, 0))

  test("next() is strictly after base, matches the spec, and is minimal") {
    for {
      m <- minutes; h <- hours; dom <- doms; mon <- months; dow <- dows
      base <- bases
    } {
      val expr = s"$m $h $dom $mon $dow"
      val spec = Cron.parse(expr)
      val n = Cron.next(expr, base)
      assert(n.isAfter(base.withSecond(0).withNano(0)), s"$expr @ $base")
      assert(spec.matches(n), s"$expr @ $base -> $n does not match")
      assert(n.getSecond == 0 && n.getNano == 0)
      // minimality: no earlier matching minute in (base, n) — bounded probe
      var t = base.withSecond(0).withNano(0).plusMinutes(1)
      var steps = 0
      while (t.isBefore(n) && steps < 500) {
        assert(!spec.matches(t), s"$expr @ $base: earlier match $t before $n")
        t = t.plusMinutes(1); steps += 1
      }
    }
  }

  test("splitter: joining split statements round-trips") {
    val stmts = Seq(
      "SELECT 1", "SELECT 'a;b'", "INSERT INTO t VALUES (1, 'x')",
      "SELECT /* c;c */ 2", "UPDATE t SET v = 'it''s'")
    // every ordered pair and triple round-trips through split
    for (a <- stmts; b <- stmts) {
      assert(graft.sqlx.Sql.splitStatements(s"$a; $b") == Seq(a, b))
    }
    for (a <- stmts; b <- stmts; c <- stmts) {
      assert(graft.sqlx.Sql.splitStatements(s"$a;$b;$c;") == Seq(a, b, c))
    }
  }
}
