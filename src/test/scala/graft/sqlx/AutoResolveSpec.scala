package graft.sqlx

import graft.SparkSuite

class AutoResolveSpec extends SparkSuite {

  test("extractDbTable: first from/join-qualified reference wins (P10)") {
    assert(AutoResolve.extractDbTable("SELECT * FROM erp.orders o JOIN other.x y") ==
      Some(("erp", "orders")))
    assert(AutoResolve.extractDbTable("SELECT 1").isEmpty)
  }

  test("rewrite replaces all qualified references case-insensitively") {
    assert(AutoResolve.rewrite(
      "SELECT * FROM ERP.orders JOIN erp.orders b", "erp", "orders", "prod") ==
      "SELECT * FROM prod.orders JOIN prod.orders b")
  }

  test("sqlWithResolve: wrong database is auto-discovered and rewritten (O3)") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_real_db")
    spark.sql("DROP TABLE IF EXISTS graft_real_db.ar_orders")
    Seq((1, 10.0), (2, 20.0)).toDF("id", "amount")
      .write.saveAsTable("graft_real_db.ar_orders")
    try {
      val (df, ranSql) = AutoResolve.sqlWithResolve(spark,
        "SELECT sum(amount) AS s FROM wrong_db.ar_orders")
      assert(df.collect().head.getDouble(0) == 30.0)
      assert(ranSql.contains("graft_real_db.ar_orders"))
    } finally {
      spark.sql("DROP TABLE graft_real_db.ar_orders")
      spark.sql("DROP DATABASE graft_real_db")
    }
  }

  test("sqlWithResolve: unresolvable table still raises") {
    intercept[Exception] {
      AutoResolve.sqlWithResolve(spark, "SELECT * FROM nope_db.nope_table")
    }
  }
}
