package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IngestSpec extends SparkSuite {

  test("readTable csv: header row becomes columns, types inferred (S1)") {
    import spark.implicits._
    val dir = tmpDir("ing")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "in.csv"),
      "name,qty,price\nwidget,3,1.5\ngadget,7,2.25\n")
    val df = Ingest.readTable(spark, s"$dir/in.csv", "csv")
    assert(df.columns.toSeq == Seq("name", "qty", "price"))
    assert(df.schema("qty").dataType.typeName == "integer")
    assert(df.count() == 2)
  }

  test("truncateLoad: full refresh, no doubling, auto-create (S3)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS ing_tgt")
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    assert(Ingest.truncateLoad(df, "ing_tgt") == 2)
    assert(Ingest.truncateLoad(df, "ing_tgt") == 2) // idempotent refresh
    spark.sql("DROP TABLE ing_tgt")
  }

  test("insertRecords: columns from first record, append, missing-key error (S4)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS ing_rec")
    Seq((0L, "seed")).toDF("id", "label").write.saveAsTable("ing_rec")
    val ok = Ingest.insertRecords(spark, "ing_rec", Seq(
      Map("id" -> 1L, "label" -> "x"), Map("id" -> 2L, "label" -> "y")))
    assert(ok == Right(2L))
    assert(spark.table("ing_rec").count() == 3)
    val bad = Ingest.insertRecords(spark, "ing_rec",
      Seq(Map("id" -> 3L, "label" -> "z"), Map("id" -> 4L)))
    assert(bad.isLeft && bad.swap.exists(_.contains("record 1")))
    assert(spark.table("ing_rec").count() == 3) // nothing written on error
    spark.sql("DROP TABLE ing_rec")
  }

  test("sanitizeFilename strips forbidden chars and spaces (F10)") {
    assert(Ingest.sanitizeFilename("""a/b\c*d?e:f"g<h>i|j k""") == "abcdefghij_k")
  }

  test("exportResult: dates formatted, header present, single part (S7)") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05")))
      .toDF("id", "created_at")
    val out = tmpDir("exp")
    val path = Ingest.exportResult(df, out, "my report.csv")
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(0) == "id,created_at")
    assert(lines.get(1) == "1,2026-01-02 03:04:05")
    assert(path.contains("my_report.csv"))
  }
}
