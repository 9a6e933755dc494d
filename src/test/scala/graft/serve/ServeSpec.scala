package graft.serve

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ServeSpec extends SparkSuite {

  test("pagination envelope: clamp to 100, ceil-div pages, ordered page (T4)") {
    import spark.implicits._
    val df = (1 to 250).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val p = Serve.paginate(df, Seq(col("id").desc), page = 2, perPage = 1000)
    assert(p.perPage == 100) // clamp (web_scheduler.py:5336)
    assert(p.total == 250 && p.pages == 3)
    // page 2 of desc order: ids 150..51
    assert(p.rows.head.getLong(0) == 150L && p.rows.last.getLong(0) == 51L)
    val last = Serve.paginate(df, Seq(col("id").desc), page = 3, perPage = 100)
    assert(last.rows.size == 50)
  }

  test("conjunctive filter folds provided predicates only (P8)") {
    import spark.implicits._
    val df = Seq((1, "a", true), (2, "b", true), (3, "a", false))
      .toDF("id", "grp", "flag")
    assert(Serve.conjunctiveFilter(df, Nil).count() == 3)
    assert(Serve.conjunctiveFilter(df,
      Seq(col("grp") === "a", col("flag"))).count() == 1)
  }

  test("tasksWithLatestStatus: latest wins, never_executed = NULL side (J6)") {
    import spark.implicits._
    val tasks = Seq((1L, "etl"), (2L, "report"), (3L, "cleanup"))
      .toDF("id", "name")
    val logs = Seq(
      (10L, 1L, "failed",  "2026-01-01 10:00:00"),
      (11L, 1L, "success", "2026-01-01 11:00:00"), // latest for task 1
      (12L, 2L, "failed",  "2026-01-01 09:00:00")  // latest for task 2
    ).toDF("id", "taskId", "status", "executionTime")
      .withColumn("executionTime", to_timestamp(col("executionTime")))

    val all = Serve.tasksWithLatestStatus(tasks, logs).collect()
    assert(all.length == 3)
    val byId = all.map(r => r.getLong(0) -> r.getAs[String]("latest_status")).toMap
    assert(byId(1L) == "success" && byId(2L) == "failed" && byId(3L) == null)

    val never = Serve.tasksWithLatestStatus(tasks, logs, Some("never_executed"))
    assert(never.collect().map(_.getLong(0)).toSeq == Seq(3L))

    val failed = Serve.tasksWithLatestStatus(tasks, logs, Some("failed"))
    assert(failed.collect().map(_.getLong(0)).toSeq == Seq(2L))

    val liked = Serve.tasksWithLatestStatus(tasks, logs, None, Some("port"))
    assert(liked.collect().map(_.getAs[String]("name")).toSeq == Seq("report"))
  }

  test("auth: hash round-trip, reject wrong password, token shape (F8/F9)") {
    val h = Serve.Auth.hashPassword("admin123", Serve.Auth.newSalt())
    assert(Serve.Auth.verifyPassword("admin123", h))
    assert(!Serve.Auth.verifyPassword("nope", h))
    val tok = Serve.Auth.newToken()
    assert(tok.length >= 42 && !tok.contains("="))
  }
}
