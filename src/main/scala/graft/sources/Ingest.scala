package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest sources and sinks — the reference's Excel/JSON/record-batch load
  * paths (SURVEY.md §2.1 S1-S5) as pluggable Spark readers/writers.
  *
  * The reference's pandas `read_excel` maps to a `Source` trait with format
  * adapters; no xlsx parser ships in /opt/spark/jars (checked — no POI), so
  * the Excel adapter is the documented CSV fallback (SURVEY.md §7.4): the
  * semantics under test (header row → columns, type inference, full-refresh
  * load) are format-independent.
  */
object Ingest {

  /** S1 — tabular file source with schema-on-read: header → column names,
    * inferred types (pandas read_excel semantics,
    * excel_to_db/excel_to_db.py:19-39). */
  def readTable(spark: SparkSession, path: String, format: String = "parquet",
                schema: Option[StructType] = None): DataFrame = {
    if (format == "xlsx") return Xlsx.read(spark, path)
    val r0 = spark.read.format(format)
    val r1 = schema.map(r0.schema).getOrElse(r0)
    format match {
      case "csv" => r1.option("header", "true")
        .option("inferSchema", schema.isEmpty.toString).load(path)
      case _ => r1.load(path)
    }
  }

  /** S3 — truncate-and-load sink onto a managed table (full refresh,
    * auto-creates a missing target like the reference's to_sql,
    * excel_to_db/excel_to_db.py:72-100). `overwrite` on a saved table is the
    * managed-table equivalent of DELETE-all + append, and is atomic per
    * Spark's table commit protocol. */
  def truncateLoad(df: DataFrame, targetTable: String): Long = {
    df.write.mode(SaveMode.Overwrite).saveAsTable(targetTable)
    df.sparkSession.table(targetTable).count()
  }

  /** S4 — record-batch insert: homogeneous JSON-ish records (column set
    * taken from the FIRST record, web_scheduler.py:4410) appended to a
    * table. A record missing one of those columns is an error, matching the
    * reference's KeyError path (4485-4487). */
  def insertRecords(spark: SparkSession, targetTable: String,
                    records: Seq[Map[String, Any]]): Either[String, Long] = {
    if (records.isEmpty) return Left("no records provided")
    val cols = records.head.keys.toSeq.sorted
    val missing = records.zipWithIndex.collectFirst {
      case (r, i) if !cols.forall(r.contains) =>
        s"record $i missing column(s): ${cols.filterNot(r.contains).mkString(",")}"
    }
    missing.toLeft(()).map { _ =>
      val rows = records.map(r => Row.fromSeq(cols.map(c => r(c))))
      val schema = spark.table(targetTable).schema
      val ordered = StructType(cols.map(c => schema(c)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toList), ordered)
      df.write.mode(SaveMode.Append).insertInto(targetTable)
      records.size.toLong
    }
  }

  /** F10 — filename sanitization for exports (web_scheduler.py:3637-3638):
    * strip backslash, slash, star, question mark, colon, quote, angle
    * brackets and pipe; spaces → underscore. */
  def sanitizeFilename(name: String): String =
    name.replaceAll("[\\\\/*?:\"<>|]", "").replaceAll("\\s+", "_")

  /** S7 — result export with date-column formatting (web_scheduler.py:
    * 3615-3718): timestamp/date columns are rendered `yyyy-MM-dd HH:mm:ss`
    * (the reference's Excel number-format), everything else as-is; written
    * as a single CSV part (the export is a human artifact, driver-small —
    * the reference materializes it into one xlsx anyway). Returns the
    * written file path. */
  def exportResult(df: DataFrame, outDir: String, name: String): String = {
    val formatted = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType.typeName match {
        case "timestamp" | "timestamp_ntz" | "date" =>
          acc.withColumn(f.name, date_format(col(f.name), "yyyy-MM-dd HH:mm:ss"))
        case _ => acc
      }
    }
    val target = new java.io.File(outDir, sanitizeFilename(name))
    formatted.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(target.toString)
    target.listFiles().find(_.getName.endsWith(".csv"))
      .map(_.getAbsolutePath).getOrElse(target.toString)
  }
}
