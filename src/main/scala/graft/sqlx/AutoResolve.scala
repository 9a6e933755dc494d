package graft.sqlx

import scala.util.matching.Regex

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}

/** O3 — database auto-discovery + SQL rewrite (web_scheduler.py:3211-3317):
  * when a query references `db.table` and that database is unreachable /
  * wrong, the reference scans SHOW DATABASES + SHOW TABLES LIKE and rewrites
  * the SQL text to the database actually holding the table. Reproduced as a
  * pre-flight catalog probe over `spark.catalog` with the same text-level
  * rewrite (first `db.table` reference wins, like the reference's regex).
  */
object AutoResolve {

  /** P10 — `db.table` extractor: first FROM/JOIN-qualified reference
    * (web_scheduler.py:3216-3222, first match wins). */
  private val dbTableRe: Regex = "(?i)(?:from|join)\\s+(\\w+)\\.(\\w+)".r

  def extractDbTable(sql: String): Option[(String, String)] =
    dbTableRe.findFirstMatchIn(sql).map(m => (m.group(1), m.group(2)))

  /** Find which database actually holds `table` (SHOW DATABASES → SHOW
    * TABLES LIKE per db, web_scheduler.py:3263-3286). System namespaces are
    * skipped like the reference skips information_schema/mysql/sys. */
  def findDatabase(spark: SparkSession, table: String): Option[String] = {
    import scala.jdk.CollectionConverters._
    spark.catalog.listDatabases().collect()
      .map(_.name)
      .filterNot(Set("information_schema", "sys"))
      .find(db => spark.catalog.tableExists(s"$db.$table"))
  }

  /** Rewrite every `wrongDb.table` reference to `foundDb.table` (text-level,
    * matching the reference's string replace at web_scheduler.py:3309). */
  def rewrite(sql: String, wrongDb: String, table: String, foundDb: String): String =
    sql.replaceAll(s"(?i)\\b$wrongDb\\.$table\\b", s"$foundDb.$table")

  /** Execute with auto-resolution: try as-is; on a missing-relation
    * AnalysisException, probe the catalog for the referenced table and retry
    * once with the rewritten SQL. Returns the DataFrame and the SQL that
    * actually ran. */
  def sqlWithResolve(spark: SparkSession, rawSql: String): (DataFrame, String) = {
    val sql = Sql.quoteNonAsciiIdentifiers(rawSql) // same dialect normalization as runScript
    try { (spark.sql(sql), sql) }
    catch {
      case e: AnalysisException if e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") =>
        (for {
          (db, table) <- extractDbTable(sql)
          found <- findDatabase(spark, table) if found != db
        } yield {
          val fixed = rewrite(sql, db, table, found)
          (spark.sql(fixed), fixed)
        }).getOrElse(throw e)
    }
  }
}
