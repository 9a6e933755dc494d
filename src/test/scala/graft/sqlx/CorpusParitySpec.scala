package graft.sqlx

import graft.SparkSuite

/** Runs the reference's ACTUAL production corpus (scheduler.db sql_scripts
  * rows 30/32/33 and the two task rows) through the engine — verbatim
  * script texts, not paraphrases. This is the literal "a user of the
  * reference could switch" check: the flagship truncate-and-load over
  * db-qualified names, the alert query with Chinese implicit aliases, the
  * Windows-style stored script path, and the self-dependency row. */
class CorpusParitySpec extends SparkSuite {

  // sql_scripts row 30 (= row 32), verbatim
  private val row30 =
    """truncate table erp_system.dwd_sale_shopify_orders_di;
      |insert into erp_system.dwd_sale_shopify_orders_di
      |Select  *
      |from erp_system.dwd_sale_shopify_order_di ;""".stripMargin

  // sql_scripts row 33, verbatim (implicit alias `total_price 总价格`)
  private val row33 =
    """Select  order_number as 订单号,source_name as 店铺,sku as sku,date as 日期,created_at  as 创建日期,total_price 总价格
      |from erp_system.dwd_sale_shopify_order_di""".stripMargin

  /** Drop the table AND its warehouse directory — a dir left by a previous
    * JVM makes CREATE fail with LOCATION_ALREADY_EXISTS even though the
    * fresh catalog has never heard of the table (the q28 failure mode). */
  private def hardDrop(qualified: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $qualified")
    val Array(db, t) = qualified.split('.')
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"$db.db/$t")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  private def stageSource(): Unit = {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS erp_system")
    hardDrop("erp_system.dwd_sale_shopify_order_di")
    hardDrop("erp_system.dwd_sale_shopify_orders_di")
    Seq(
      ("SO-1001", "shop-a", "SKU-1", "2026-01-01", "2026-01-01 08:00:00", 19.99),
      ("SO-1002", "shop-a", "SKU-2", "2026-01-01", "2026-01-01 09:00:00", 5.50),
      ("SO-1003", "shop-b", "SKU-1", "2026-01-02", "2026-01-02 10:00:00", 42.00))
      .toDF("order_number", "source_name", "sku", "date", "created_at", "total_price")
      .write.mode("overwrite").saveAsTable("erp_system.dwd_sale_shopify_order_di")
  }

  test("row 30: splitter + classifier produce the reference's statement plan") {
    val stmts = Sql.splitStatements(row30)
    assert(stmts.length == 2)
    assert(stmts(0).toLowerCase.startsWith("truncate table"))
    assert(!Sql.isQuery(stmts(0)) && !Sql.isQuery(stmts(1)))
  }

  test("row 30: flagship truncate-and-load executes verbatim, idempotently") {
    stageSource()
    // target exists with the source's shape (the reference pre-creates DWD
    // tables; auto-create is covered by Sql.truncateAndLoad/q28)
    spark.table("erp_system.dwd_sale_shopify_order_di").limit(0)
      .write.saveAsTable("erp_system.dwd_sale_shopify_orders_di")
    Sql.runScript(spark, row30)
    assert(spark.table("erp_system.dwd_sale_shopify_orders_di").count() == 3)
    Sql.runScript(spark, row30) // rerun must not double (full refresh)
    assert(spark.table("erp_system.dwd_sale_shopify_orders_di").count() == 3)
    val back = spark.sql(
      "SELECT order_number, total_price FROM erp_system.dwd_sale_shopify_orders_di ORDER BY order_number")
      .collect()
    assert(back.map(_.getString(0)).toSeq == Seq("SO-1001", "SO-1002", "SO-1003"))
    assert(back.map(_.getDouble(1)).toSeq == Seq(19.99, 5.50, 42.00))
  }

  test("row 33: alert query runs verbatim with Chinese implicit aliases") {
    stageSource()
    val stmts = Sql.splitStatements(row33)
    assert(stmts.length == 1 && Sql.isQuery(stmts.head))
    val df = Sql.runScript(spark, row33).head.result.get
    assert(df.columns.toSeq ==
      Seq("订单号", "店铺", "sku", "日期", "创建日期", "总价格"))
    assert(df.count() == 3)
    // and the alert lifecycle evaluates it like the reference's 预警-查询订单
    val res = graft.alerts.AlertChecker.check("预警-查询订单", row33, df,
      "not_empty", 1)
    assert(res.triggered && res.rowCount == 3)
    assert(res.columns.contains("订单号"))
  }

  test("task 26: Windows stored path normalizes to the managed dir") {
    // tasks row 26 stores 'uploads\excel_to_db.py'
    assert(graft.sched.Scheduler.normalizeScriptPath("uploads\\excel_to_db.py")
      == "uploads/excel_to_db.py")
  }

  test("task 26: self-dependency ('26' depends on task 26) cannot deadlock a tick") {
    // reference trap (SURVEY §7.5): a never-run task that depends on itself
    // must not block the scheduler loop; the gate resolves it deterministically
    val latest: Long => Option[String] = _ => None // never executed
    val known: Long => Boolean = _ == 26L
    // must return a decision (not throw / not loop); the reference blocks
    // the task itself but the tick proceeds
    val decision = graft.sched.Policies.canExecute(Some("26"), known, latest)
    assert(!decision) // never-run dependency blocks, exactly like the reference
  }

  test("row 33 against the WRONG database: auto-discovery rewrites and runs") {
    // the reference's O3 scenario: the script says `erp_system.x` but the
    // table actually lives elsewhere — probe the catalog, rewrite, retry
    import spark.implicits._
    hardDrop("erp_system.dwd_sale_shopify_order_di")
    hardDrop("erp_system.dwd_sale_shopify_orders_di")
    spark.sql("CREATE DATABASE IF NOT EXISTS ods_backup")
    hardDrop("ods_backup.dwd_sale_shopify_order_di")
    Seq(("SO-9", "s", "k", "d", "c", 1.0))
      .toDF("order_number", "source_name", "sku", "date", "created_at", "total_price")
      .write.mode("overwrite").saveAsTable("ods_backup.dwd_sale_shopify_order_di")
    val (df, ranSql) = AutoResolve.sqlWithResolve(spark, row33)
    assert(ranSql.contains("ods_backup.dwd_sale_shopify_order_di"))
    assert(df.columns.head == "订单号" && df.count() == 1)
    spark.sql("DROP TABLE ods_backup.dwd_sale_shopify_order_di")
  }
}
