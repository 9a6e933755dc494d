package graft.sqlx

import graft.SparkSuite

class SqlSpec extends SparkSuite {

  test("splitter: plain multi-statement with trailing semicolon") {
    assert(Sql.splitStatements("SELECT 1; SELECT 2;") == Seq("SELECT 1", "SELECT 2"))
  }

  test("splitter: drops empty statements") {
    assert(Sql.splitStatements(";;SELECT 1;;  ;") == Seq("SELECT 1"))
  }

  test("splitter: semicolon inside single quotes survives") {
    assert(Sql.splitStatements("SELECT 'a;b'; SELECT 2") ==
      Seq("SELECT 'a;b'", "SELECT 2"))
  }

  test("splitter: escaped quote (doubled) inside literal") {
    assert(Sql.splitStatements("SELECT 'it''s; fine'; SELECT 2") ==
      Seq("SELECT 'it''s; fine'", "SELECT 2"))
  }

  test("splitter: backslash-escaped quote inside literal (Spark/MySQL default escapes)") {
    assert(Sql.splitStatements("""SELECT 'O\'Brien; x'; SELECT 2""") ==
      Seq("""SELECT 'O\'Brien; x'""", "SELECT 2"))
    // a trailing backslash before the closing quote is CONSUMED as an
    // escape pair, so the literal stays open across the next quote
    assert(Sql.splitStatements("""SELECT 'a\\'; SELECT 'b;c'""") ==
      Seq("""SELECT 'a\\'""", "SELECT 'b;c'"))
  }

  test("splitter: double quotes and backticks") {
    assert(Sql.splitStatements("""SELECT "a;b", `c;d`; SELECT 2""") ==
      Seq("""SELECT "a;b", `c;d`""", "SELECT 2"))
  }

  test("splitter: line and block comments hide semicolons") {
    assert(Sql.splitStatements("SELECT 1 -- c;omment\n; SELECT 2") ==
      Seq("SELECT 1 -- c;omment", "SELECT 2"))
    assert(Sql.splitStatements("SELECT /* a;b */ 1; SELECT 2") ==
      Seq("SELECT /* a;b */ 1", "SELECT 2"))
  }

  test("splitter: '/*/' does not close the comment it opens") {
    // the '*' of the opening '/*' must not double as the '*' of a closing
    // '*/' — "/*/" leaves the comment open, so the ';' after it is hidden
    assert(Sql.splitStatements("SELECT 1 /*/ ; 2") == Seq("SELECT 1 /*/ ; 2"))
    // a genuinely closed comment right after still works
    assert(Sql.splitStatements("SELECT 1 /**/; SELECT 2") ==
      Seq("SELECT 1 /**/", "SELECT 2"))
    // '/*/' inside a longer comment that later closes properly
    assert(Sql.splitStatements("SELECT /*/ ; */ 1; SELECT 2") ==
      Seq("SELECT /*/ ; */ 1", "SELECT 2"))
  }

  test("quoteNonAsciiIdentifiers: quotes CJK identifiers, leaves literals alone") {
    assert(Sql.quoteNonAsciiIdentifiers("SELECT total_price 总价格 FROM t") ==
      "SELECT total_price `总价格` FROM t")
    assert(Sql.quoteNonAsciiIdentifiers("SELECT a AS 订单号, b FROM db.t") ==
      "SELECT a AS `订单号`, b FROM db.t")
    // string literals and comments keep their content unquoted
    assert(Sql.quoteNonAsciiIdentifiers("SELECT '总价格', \"总\" FROM t -- 注释") ==
      "SELECT '总价格', \"总\" FROM t -- 注释")
    assert(Sql.quoteNonAsciiIdentifiers("SELECT /* 总 */ x FROM t") ==
      "SELECT /* 总 */ x FROM t")
    // already-quoted identifiers pass through untouched
    assert(Sql.quoteNonAsciiIdentifiers("SELECT `总价格` FROM t") ==
      "SELECT `总价格` FROM t")
    // pure-ASCII statements are unchanged
    val ascii = "INSERT INTO a.b SELECT * FROM c WHERE x = 'y;z'"
    assert(Sql.quoteNonAsciiIdentifiers(ascii) == ascii)
  }

  test("classifier: SELECT/WITH/SHOW are queries, DML/DDL are not") {
    assert(Sql.isQuery("select 1"))
    assert(Sql.isQuery("  WITH t AS (SELECT 1) SELECT * FROM t"))
    assert(Sql.isQuery("SHOW TABLES"))
    assert(!Sql.isQuery("INSERT INTO t VALUES (1)"))
    assert(!Sql.isQuery("TRUNCATE TABLE t"))
    assert(!Sql.isQuery("CREATE TABLE t (a INT)"))
  }

  test("runScript executes statements in order and returns result sets") {
    val rs = Sql.runScript(spark, "SELECT 1 AS a; SELECT 2 AS b;")
    assert(rs.length == 2)
    assert(rs.forall(_.isQuery))
    assert(rs(0).result.get.collect().head.getInt(0) == 1)
    assert(rs(1).result.get.collect().head.getInt(0) == 2)
  }

  test("truncateAndLoad refreshes target to match source (row 30 semantics)") {
    import spark.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
      .createOrReplaceTempView("src_tl")
    val out1 = Sql.truncateAndLoad(spark, "src_tl", "tgt_tl_spec")
    assert(out1.count() == 3)
    // run again — truncate must prevent doubling (idempotent full refresh)
    val out2 = Sql.truncateAndLoad(spark, "src_tl", "tgt_tl_spec")
    assert(out2.count() == 3)
    spark.sql("DROP TABLE tgt_tl_spec")
  }

  test("truncateAndLoad survives a stale warehouse directory (fresh catalog)") {
    // Simulates a restart: the warehouse dir persists on disk but the
    // in-memory catalog is empty — CREATE would throw
    // LOCATION_ALREADY_EXISTS without the stale-dir cleanup (this is how
    // q28 silently dropped out of the round-1 correctness report).
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("src_tl2")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, "tgt_tl_stale")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc) // stale managed-table dir from a "previous JVM"
    val out = Sql.truncateAndLoad(spark, "src_tl2", "tgt_tl_stale")
    assert(out.count() == 2)
    spark.sql("DROP TABLE tgt_tl_stale")
  }

  test("truncateAndLoad survives a stale dir for a DB-QUALIFIED target") {
    // qualified managed tables live at <warehouse>/<db>.db/<t> — the
    // cleanup must target that layout, not <db>/<t> (which silently
    // no-opped and left CREATE throwing LOCATION_ALREADY_EXISTS; the
    // flagship corpus shape is db-qualified)
    import spark.implicits._
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("src_tl3")
    spark.sql("CREATE DATABASE IF NOT EXISTS stale_db")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, "stale_db.db/tgt_q")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc) // stale qualified managed-table dir
    val out = Sql.truncateAndLoad(spark, "src_tl3", "stale_db.tgt_q")
    assert(out.count() == 1)
    spark.sql("DROP TABLE stale_db.tgt_q")
    spark.sql("DROP DATABASE stale_db")
  }
}
