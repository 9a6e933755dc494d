package graft.catalog

import java.sql.Timestamp

import graft.SparkSuite
import graft.catalog.Model._

class CatalogStoreSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def mkTask(id: Long, name: String) = Task(
    id, name, "sql", None, Some(1L), 300L, None, None, isActive = true,
    None, 3, 60, None, ts("2026-01-01 00:00:00"))

  test("read of a never-written table is empty") {
    val store = new CatalogStore(spark, tmpDir("cat"))
    assert(store.read[Task]("tasks").count() == 0)
  }

  test("overwrite/read round-trip preserves typed rows") {
    val store = new CatalogStore(spark, tmpDir("cat"))
    import spark.implicits._
    store.overwrite(spark.createDataset(Seq(mkTask(1, "a"), mkTask(2, "b"))), "tasks")
    val back = store.read[Task]("tasks").collect().sortBy(_.id)
    assert(back.map(_.name).toSeq == Seq("a", "b"))
    assert(back.head.sqlScriptId.contains(1L))
  }

  test("upsert replaces matching keys and keeps others (D7)") {
    val store = new CatalogStore(spark, tmpDir("cat"))
    import spark.implicits._
    store.overwrite(spark.createDataset(Seq(mkTask(1, "a"), mkTask(2, "b"))), "tasks")
    store.upsert[Task]("tasks", Seq(mkTask(2, "b2"), mkTask(3, "c")), _.id)
    val back = store.read[Task]("tasks").collect().sortBy(_.id)
    assert(back.map(t => t.id -> t.name).toSeq == Seq(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("delete by predicate returns removed count (FK-guard shape)") {
    val store = new CatalogStore(spark, tmpDir("cat"))
    import spark.implicits._
    store.overwrite(spark.createDataset(Seq(mkTask(1, "a"), mkTask(2, "b"))), "tasks")
    assert(store.delete[Task]("tasks", _.id == 1) == 1L)
    assert(store.read[Task]("tasks").collect().map(_.id).toSeq == Seq(2L))
  }

  test("append-only log table accumulates (S12)") {
    val store = new CatalogStore(spark, tmpDir("cat"))
    import spark.implicits._
    val l1 = TaskLog(1, 10, "success", "ok", ts("2026-01-01 10:00:00"))
    val l2 = TaskLog(2, 10, "failed", "boom", ts("2026-01-01 11:00:00"))
    store.append(spark.createDataset(Seq(l1)), "task_logs")
    store.append(spark.createDataset(Seq(l2)), "task_logs")
    assert(store.read[TaskLog]("task_logs").count() == 2)
  }
}
