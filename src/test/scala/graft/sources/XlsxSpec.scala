package graft.sources

import graft.SparkSuite

class XlsxSpec extends SparkSuite {

  test("xlsx write→read round-trip: header, types inferred, values intact (S1/S7)") {
    import spark.implicits._
    val df = Seq(
      (1L, "widget & co", 19.99, "2026-01-02"),
      (2L, "<gadget>", 5.5, "2026-01-03"),
      (3L, "naïve 中文", 100.0, "2026-01-04"))
      .toDF("id", "name", "price", "order_date")
    val path = tmpDir("xlsx") + "/out.xlsx"
    Xlsx.write(df, path)

    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("id", "name", "price", "order_date"))
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("price").dataType.typeName == "double")
    assert(back.schema("name").dataType.typeName == "string")
    val rows = back.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "widget & co") // XML escaping round-trips
    assert(rows(1).getString(1) == "<gadget>")
    assert(rows(2).getString(1) == "naïve 中文")   // UTF-8 round-trips
    assert(rows(0).getDouble(2) == 19.99)
  }

  test("xlsx full-refresh ingest: the reference's excel_to_db flow (S1+S3)") {
    // export orders top-10 → xlsx → read back → truncate-load into a table
    val top = graft.operators.Relational.topOrders(spark, sfDir)
    val path = tmpDir("xlsx") + "/orders.xlsx"
    Xlsx.write(top, path)
    val staged = Xlsx.read(spark, path)
    spark.sql("DROP TABLE IF EXISTS xlsx_tgt")
    assert(Ingest.truncateLoad(staged, "xlsx_tgt") == 10)
    assert(Ingest.truncateLoad(staged, "xlsx_tgt") == 10) // idempotent refresh
    // values survived the round trip
    val a = top.selectExpr("sum(o_totalprice)").collect().head.getDouble(0)
    val b = spark.table("xlsx_tgt").selectExpr("sum(o_totalprice)")
      .collect().head.getDouble(0)
    assert(math.abs(a - b) < 1e-6)
    spark.sql("DROP TABLE xlsx_tgt")
  }

  test("multi-sheet workbook: select by name or index (excel_to_db.py:19-39)") {
    import spark.implicits._
    val sales = Seq((1L, "east", 100.0), (2L, "west", 250.0)).toDF("id", "region", "amt")
    val staff = Seq((10L, "alice"), (11L, "bob"), (12L, "carol")).toDF("id", "name")
    val path = tmpDir("xlsx") + "/book.xlsx"
    Xlsx.writeSheets(Seq("Sales" -> sales, "Staff" -> staff), path)
    assert(Xlsx.sheetNames(path) == Seq("Sales", "Staff"))
    // by name
    val byName = Xlsx.read(spark, path, sheetName = Some("Staff"))
    assert(byName.columns.toSeq == Seq("id", "name") && byName.count() == 3)
    // by index (pandas sheet_name=0 default → first sheet)
    val first = Xlsx.read(spark, path)
    assert(first.columns.toSeq == Seq("id", "region", "amt") && first.count() == 2)
    val second = Xlsx.read(spark, path, sheetIndex = 1)
    assert(second.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("alice", "bob", "carol"))
    // errors, like pandas
    intercept[IllegalArgumentException](Xlsx.read(spark, path, sheetName = Some("Nope")))
    intercept[IllegalArgumentException](Xlsx.read(spark, path, sheetIndex = 2))
  }

  test("mid-write failure leaves no truncated artifact (write-aside + rename)") {
    import spark.implicits._
    val dir = tmpDir("xlsx")
    val path = dir + "/book.xlsx"
    val good = Seq((1L, "a")).toDF("id", "name")
    Xlsx.writeSheets(Seq("Good" -> good), path)
    val before = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // a sheet whose collect throws mid-write must neither replace the
    // existing good workbook with a truncated zip nor leave a temp file
    val exploding = good.filter(org.apache.spark.sql.functions
      .expr("assert_true(id > 99)").isNull)
    intercept[Throwable](
      Xlsx.writeSheets(Seq("Good" -> good, "Boom" -> exploding), path))
    assert(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      .sameElements(before), "destination workbook was clobbered")
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp leftovers: ${leftovers.toSeq}")
  }

  test("empty cells become nulls and don't shift columns") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String], 2.0), (2L, Some("x"), 3.0))
      .toDF("a", "b", "c")
    val path = tmpDir("xlsx") + "/nulls.xlsx"
    Xlsx.write(df, path)
    val rows = Xlsx.read(spark, path).orderBy("a").collect()
    assert(rows(0).isNullAt(1) && rows(0).getDouble(2) == 2.0)
    assert(rows(1).getString(1) == "x")
  }
}
