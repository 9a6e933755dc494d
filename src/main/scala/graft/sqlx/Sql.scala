package graft.sqlx

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's federated SQL execution engine re-expressed on Spark SQL
  * (web_scheduler.py:896-1026): split a multi-statement script, classify each
  * statement SELECT-vs-DML, execute via `spark.sql`, and normalize results.
  */
object Sql {

  /** Quote- and comment-aware multi-statement splitter.
    *
    * The reference splits naively on ';' (web_scheduler.py:921) — this
    * preserves its observable behavior on its corpus (no quoted semicolons
    * there) while staying correct when ';' appears inside '...', "...",
    * `...`, line comments (--) or block comments. Empty statements are
    * dropped (reference filters falsy parts at :921). */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var state: Char = 'n' // n=normal, '\''=single, '"'=double, '`'=backtick, '-'=line comment, '*'=block comment
    var commentOpen = -1 // index of the '/' that opened the current block comment
    val n = script.length
    while (i < n) {
      val c = script.charAt(i)
      state match {
        case 'n' =>
          if (c == ';') { out += cur.toString; cur.clear() }
          else {
            if (c == '\'' || c == '"' || c == '`') state = c
            else if (c == '-' && i + 1 < n && script.charAt(i + 1) == '-') state = '-'
            else if (c == '/' && i + 1 < n && script.charAt(i + 1) == '*') { state = '*'; commentOpen = i }
            cur += c
          }
        case '\'' | '"' | '`' =>
          cur += c
          // backslash-escaped char inside a string literal (Spark's and
          // MySQL's default escape semantics): consume the escaped char so
          // `'O\'Brien; x'` stays ONE literal instead of splitting at the
          // quote. Backtick identifiers have no backslash escapes.
          if (c == '\\' && state != '`' && i + 1 < n) {
            cur += script.charAt(i + 1); i += 1
          }
          // doubled quote inside a quoted region is an escaped quote
          else if (c == state) {
            if (i + 1 < n && script.charAt(i + 1) == state) { cur += state; i += 1 }
            else state = 'n'
          }
        case '-' =>
          cur += c
          if (c == '\n') state = 'n'
        case '*' =>
          cur += c
          // the closing '*' must come AFTER the opening "/*" — otherwise the
          // 3-char input "/*/" would close using the opening '*' itself
          if (c == '/' && i - commentOpen >= 3 && script.charAt(i - 1) == '*') state = 'n'
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Dialect normalization: MySQL — the reference's production engine —
    * accepts unquoted non-ASCII identifiers (`total_price 总价格`, real
    * corpus script 33), Spark's lexer does not (INVALID_IDENTIFIER).
    * Back-quote any identifier run containing non-ASCII characters, leaving
    * string literals, quoted identifiers, and comments untouched. */
  def quoteNonAsciiIdentifiers(stmt: String): String = {
    val n = stmt.length
    val out = new StringBuilder(n + 8)
    var i = 0
    var state: Char = 'n'
    var commentOpen = -1
    def isIdentChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      val c = stmt.charAt(i)
      state match {
        case 'n' =>
          if (c == '\'' || c == '"' || c == '`') { state = c; out += c; i += 1 }
          else if (c == '-' && i + 1 < n && stmt.charAt(i + 1) == '-') { state = '-'; out += c; i += 1 }
          else if (c == '/' && i + 1 < n && stmt.charAt(i + 1) == '*') { state = '*'; commentOpen = i; out += c; i += 1 }
          else if (isIdentChar(c)) {
            val start = i
            while (i < n && isIdentChar(stmt.charAt(i))) i += 1
            val word = stmt.substring(start, i)
            if (word.exists(_ > 127)) out.append('`').append(word).append('`')
            else out.append(word)
          } else { out += c; i += 1 }
        case '\'' | '"' | '`' =>
          out += c
          if (c == state) {
            if (i + 1 < n && stmt.charAt(i + 1) == state) { out += state; i += 1 }
            else state = 'n'
          }
          i += 1
        case '-' =>
          out += c
          if (c == '\n') state = 'n'
          i += 1
        case '*' =>
          out += c
          if (c == '/' && i - commentOpen >= 3 && stmt.charAt(i - 1) == '*') state = 'n'
          i += 1
      }
    }
    out.toString
  }

  /** SELECT-vs-DML classification by prefix, matching the reference
    * (web_scheduler.py:931, 969, 1001). WITH/VALUES/SHOW/DESCRIBE also
    * produce result sets on Spark, so they classify as queries. */
  def isQuery(stmt: String): Boolean = {
    val s = stmt.trim.toUpperCase
    Seq("SELECT", "WITH", "VALUES", "SHOW", "DESCRIBE", "DESC", "EXPLAIN")
      .exists(s.startsWith)
  }

  /** Normalized per-statement result (reference's per-dialect shapes unified,
    * SURVEY.md §7.5): a result set for queries, an affected-row count for DML. */
  final case class StatementResult(
      sql: String,
      isQuery: Boolean,
      result: Option[DataFrame],
      affectedRows: Long)

  /** Execute a multi-statement script. Queries return their DataFrame
    * lazily (no collect — callers decide materialization); DML statements
    * execute eagerly, reporting affected rows where Spark exposes them.
    * Statement errors abort the script, mirroring the reference
    * (exception propagates from the per-statement execute, 1009-1026). */
  def runScript(spark: SparkSession, script: String): Seq[StatementResult] =
    splitStatements(script).map { raw =>
      val stmt = quoteNonAsciiIdentifiers(raw)
      if (isQuery(stmt)) {
        StatementResult(stmt, isQuery = true, Some(spark.sql(stmt)), -1L)
      } else {
        val df = spark.sql(stmt) // commands execute eagerly
        val affected = try {
          val rows = df.collect()
          if (rows.nonEmpty && df.columns.contains("num_affected_rows"))
            rows.head.getAs[Long]("num_affected_rows")
          else -1L
        } catch { case _: Throwable => -1L }
        StatementResult(stmt, isQuery = false, None, affected)
      }
    }

  /** The reference's flagship production workload — truncate-and-load
    * materialization (scheduler.db sql_scripts row 30:
    * `truncate table tgt; insert into tgt select * from src;`).
    * Runs against the session catalog; returns the refreshed target. */
  def truncateAndLoad(spark: SparkSession, source: String, target: String): DataFrame = {
    if (!spark.catalog.tableExists(target)) {
      // A managed-table DIRECTORY can survive from a previous JVM (the
      // warehouse dir persists, the in-memory catalog does not); CREATE then
      // throws LOCATION_ALREADY_EXISTS — overwrite mode doesn't help because
      // it only drops catalog-known tables. Truncate-and-load OWNS its
      // target (the reference clobbers it every run), so delete the stale
      // location before creating. (r1: this silently dropped q28 from the
      // correctness report.)
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      // managed-table layout: default-db tables live at <warehouse>/<t>,
      // qualified ones at <warehouse>/<db>.db/<t> — NOT <db>/<t> (a plain
      // '.'→'/' rewrite made the qualified-target cleanup a no-op and
      // CREATE still hit LOCATION_ALREADY_EXISTS)
      val rel = target.toLowerCase.split('.') match {
        case Array(db, t) => s"$db.db/$t"
        case parts        => parts.mkString("/")
      }
      val loc = new org.apache.hadoop.fs.Path(warehouse, rel)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      spark.table(source).limit(0).write.saveAsTable(target)
    }
    runScript(spark,
      s"TRUNCATE TABLE $target; INSERT INTO $target SELECT * FROM $source;")
    spark.table(target)
  }
}
