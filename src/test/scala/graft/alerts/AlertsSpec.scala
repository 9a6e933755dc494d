package graft.alerts

import graft.SparkSuite

class AlertsSpec extends SparkSuite {

  // condition matrix per FIXTURES.md §3.7: each type × {0,1,t-1,t,t+1}
  test("condition matrix (web_scheduler.py:3354-3364)") {
    val t = 5L
    assert(!Condition.evaluate("not_empty", t, 0))
    assert(Condition.evaluate("not_empty", t, 1))
    assert(!Condition.evaluate("rows_gt", t, t))
    assert(Condition.evaluate("rows_gt", t, t + 1))
    assert(Condition.evaluate("rows_lt", t, t - 1))
    assert(!Condition.evaluate("rows_lt", t, t))
    assert(Condition.evaluate("rows_eq", t, t))
    assert(!Condition.evaluate("rows_eq", t, t + 1))
    assert(!Condition.evaluate("rows_neq", t, t))
    assert(Condition.evaluate("rows_neq", t, t - 1))
    assert(!Condition.evaluate("no_such_type", t, 100))
  }

  test("alert check produces transcript with count, columns and ≤10-row preview") {
    import spark.implicits._
    val df = (1 to 25).map(i => (i, s"row$i")).toDF("id", "label")
    val r = AlertChecker.check("spec-alert", "SELECT * FROM t", df, "rows_gt", 10)
    assert(r.triggered)
    assert(r.rowCount == 25)
    assert(r.columns == Seq("id", "label"))
    assert(r.preview.size == 10)
    assert(r.details.contains("spec-alert"))
    assert(r.details.contains("Row count: 25"))
    assert(r.details.contains("row count > 10"))
  }

  test("non-triggering alert") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "label")
    val r = AlertChecker.check("quiet", "SELECT 1", df, "rows_gt", 10)
    assert(!r.triggered && r.rowCount == 1)
  }

  test("notifier recipient splitting (F1, web_scheduler.py:3750)") {
    assert(Notifier.splitRecipients("a@x.com, b@y.com ,,c@z.com") ==
      Seq("a@x.com", "b@y.com", "c@z.com"))
  }

  test("in-memory notifier records sends") {
    val n = new InMemoryNotifier
    assert(n.send(Seq("a@x.com"), "subj", "body").isRight)
    assert(n.sent.head.subject == "subj")
  }
}
