package graft.serve

import org.apache.spark.sql.SparkSession

import graft.catalog.CatalogStore
import graft.catalog.Model._

/** Dev main: seed a catalog and serve the dashboard on :5050 for manual /
  * browser-driven UI checks (`sbt "runMain graft.serve.UiScratch"`). Not a
  * test — AdminApiSpec covers the routes; this exercises the page's JS. */
object UiScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    val store = new CatalogStore(spark,
      java.nio.file.Files.createTempDirectory("ui-cat").toString)
    val now = java.sql.Timestamp.valueOf(java.time.LocalDateTime.now())
    store.upsert[SqlScript]("sql_scripts", Seq(
      SqlScript(1L, "daily-report", None, "SELECT 1", now)), _.id)
    store.upsert[Task]("tasks", Seq(
      Task(1L, "每日汇总", "sql", None, Some(1L), 3600L, None, Some(now),
        isActive = true, None, 0, 60, None, now),
      Task(2L, "清洗脚本", "python", Some("uploads/clean.py"), None, 0L, None,
        Some(now), isActive = false, None, 1, 30, Some("0 2 * * *"), now)), _.id)
    val exec: Task => Either[String, String] = t => Right(s"ok ${t.name}")
    val api = new AdminApi(spark, store, exec)
    val port = api.start(5050)
    println(s"UI at http://127.0.0.1:$port/ (admin/admin123); Ctrl-C to stop")
    Thread.currentThread().join()
  }
}
