package graft.sources

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Minimal XLSX adapter (S1 read / S7 write, excel_to_db/excel_to_db.py:19-39
  * and web_scheduler.py:3615-3718) built on JDK zip + DOM only — no external
  * library ships in /opt/spark/jars. Covers the subset the reference's
  * workload uses: one worksheet, header row, string/number cells (inline or
  * shared strings). Driver-side by design: the reference materializes one
  * xlsx per export anyway; large-scale data paths use parquet/csv.
  */
object Xlsx {

  // ---------- write ----------

  private def colRef(c: Int): String = { // 0 -> A, 26 -> AA
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Write a driver-small DataFrame to a single-sheet .xlsx. */
  def write(df: DataFrame, path: String, maxRows: Int = 100000): Unit =
    writeSheets(Seq("Sheet1" -> df), path, maxRows)

  /** Write one worksheet per (name, DataFrame) — header row + inline-string
    * / numeric cells. Collects — callers bound the size, as the reference
    * does for its export artifacts. */
  def writeSheets(sheets: Seq[(String, DataFrame)], path: String,
                  maxRows: Int = 100000): Unit = {
    require(sheets.nonEmpty, "at least one sheet required")
    def sheetXml(df: DataFrame): String = {
      val schema = df.schema
      val rows = df.limit(maxRows).collect()
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def cell(ref: String, v: Any): String = v match {
        case null => ""
        case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
        case other =>
          s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
      }
      sb.append("<row r=\"1\">")
      schema.fieldNames.zipWithIndex.foreach { case (n, c) =>
        sb.append(cell(s"${colRef(c)}1", n))
      }
      sb.append("</row>")
      rows.zipWithIndex.foreach { case (row, i) =>
        val r = i + 2
        sb.append(s"""<row r="$r">""")
        (0 until schema.length).foreach { c =>
          sb.append(cell(s"${colRef(c)}$r", row.get(c)))
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }

    // write-aside + rename: a mid-write failure (disk full, a sheet's
    // collect throwing) must neither leak the ZipOutputStream fd nor
    // leave a truncated .xlsx at the destination that a later reader
    // would trust
    val dest = java.nio.file.Paths.get(path).toAbsolutePath
    val tmp = java.nio.file.Files.createTempFile(
      dest.getParent, "." + dest.getFileName.toString + ".", ".tmp")
    val zos = new ZipOutputStream(new FileOutputStream(tmp.toFile))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    val idx = sheets.indices
    try {
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      idx.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString +
      """</Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      "<sheets>" +
      idx.map(i =>
        s"""<sheet name="${xmlEscape(sheets(i)._1)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""")
        .mkString +
      "</sheets></workbook>")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      idx.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
        .mkString +
      """</Relationships>""")
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(df))
      }
      zos.close()
      java.nio.file.Files.move(tmp, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case t: Throwable =>
      try zos.close() catch { case _: Throwable => () }
      java.nio.file.Files.deleteIfExists(tmp)
      throw t
    }
  }

  // ---------- read ----------

  private def zipEntryText(zf: ZipFile, name: String): Option[String] =
    Option(zf.getEntry(name)).map { e =>
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }

  /** Workbook sheet names in declared order (workbook.xml <sheet> order —
    * the order pandas indexes by). */
  def sheetNames(path: String): Seq[String] = {
    val zf = new ZipFile(new File(path))
    try parseWorkbookSheets(zf).map(_._1)
    finally zf.close()
  }

  /** Read one worksheet of an .xlsx into a DataFrame: first row = header;
    * numeric columns inferred (LongType if all integral, else DoubleType,
    * else StringType) — pandas read_excel's inference shape. Supports inline
    * and shared strings.
    *
    * Sheet selection follows `read_excel_data(file_path, sheet_name=0)`
    * (excel_to_db/excel_to_db.py:19-39): `sheetName` by name when given,
    * else `sheetIndex` by declared order (default first sheet). Unknown
    * name / out-of-range index is an error, like pandas. */
  def read(spark: SparkSession, path: String,
           sheetName: Option[String] = None, sheetIndex: Int = 0): DataFrame = {
    val zf = new ZipFile(new File(path))
    try {
      val shared: IndexedSeq[String] = zipEntryText(zf, "xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
      val sheets = parseWorkbookSheets(zf)
      val entryPath = (sheetName match {
        case Some(n) => sheets.find(_._1 == n).map(_._2).getOrElse(
          throw new IllegalArgumentException(
            s"no sheet named '$n' in $path (have: ${sheets.map(_._1).mkString(", ")})"))
        case None =>
          if (sheets.isEmpty && sheetIndex == 0) "xl/worksheets/sheet1.xml"
          else if (sheetIndex < 0 || sheetIndex >= sheets.length)
            throw new IllegalArgumentException(
              s"sheet index $sheetIndex out of range (0..${sheets.length - 1}) in $path")
          else sheets(sheetIndex)._2
      })
      val sheet = zipEntryText(zf, entryPath)
        .getOrElse(throw new IllegalArgumentException(s"no $entryPath in $path"))
      val rows = parseSheet(sheet, shared)
      require(rows.nonEmpty, s"empty sheet in $path")
      val header = rows.head.map(_.getOrElse(""))
      val width = header.length
      val body = rows.tail.map(r => r.padTo(width, None).take(width))

      def colValues(c: Int) = body.map(_(c))
      val fields = header.zipWithIndex.map { case (name, c) =>
        val vs = colValues(c).flatten
        val allLong = vs.nonEmpty && vs.forall(v => v.matches("-?\\d+"))
        val allNum = vs.nonEmpty && vs.forall(v =>
          scala.util.Try(v.toDouble).isSuccess)
        val dt = if (allLong) LongType else if (allNum) DoubleType else StringType
        StructField(name, dt, nullable = true)
      }
      val schema = StructType(fields)
      val data = body.map { r =>
        Row.fromSeq(r.zipWithIndex.map { case (v, c) =>
          (v, fields(c).dataType) match {
            case (None, _) => null
            case (Some(s), LongType) => s.toLong
            case (Some(s), DoubleType) => s.toDouble
            case (Some(s), _) => s
          }
        })
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toList), schema)
    } finally zf.close()
  }

  /** (sheet name, zip entry path) in workbook declaration order, resolved
    * through workbook.xml.rels (r:id → worksheets/sheetN.xml). */
  private def parseWorkbookSheets(zf: ZipFile): Seq[(String, String)] = {
    val wbXml = zipEntryText(zf, "xl/workbook.xml").getOrElse(return Seq.empty)
    val relXml = zipEntryText(zf, "xl/_rels/workbook.xml.rels").getOrElse(return Seq.empty)
    val db = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
    val rels = {
      val doc = db.parse(new java.io.ByteArrayInputStream(relXml.getBytes("UTF-8")))
      val ns = doc.getElementsByTagName("Relationship")
      (0 until ns.getLength).map { i =>
        val e = ns.item(i).asInstanceOf[org.w3c.dom.Element]
        e.getAttribute("Id") -> e.getAttribute("Target")
      }.toMap
    }
    val doc = db.parse(new java.io.ByteArrayInputStream(wbXml.getBytes("UTF-8")))
    val ns = doc.getElementsByTagName("sheet")
    (0 until ns.getLength).flatMap { i =>
      val e = ns.item(i).asInstanceOf[org.w3c.dom.Element]
      val rid = Option(e.getAttribute("r:id")).filter(_.nonEmpty)
        .getOrElse(e.getAttributeNS(
          "http://schemas.openxmlformats.org/officeDocument/2006/relationships", "id"))
      rels.get(rid).map(t => e.getAttribute("name") -> s"xl/${t.stripPrefix("/xl/")}")
    }
  }

  private def parseSharedStrings(xml: String): IndexedSeq[String] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val sis = doc.getElementsByTagName("si")
    (0 until sis.getLength).map(i => sis.item(i).getTextContent)
  }

  /** Parse sheetData rows into cell Option[String]s, honoring cell refs
    * (gaps become None). */
  private def parseSheet(xml: String,
                         shared: IndexedSeq[String]): Seq[IndexedSeq[Option[String]]] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val rowNodes = doc.getElementsByTagName("row")
    (0 until rowNodes.getLength).map { ri =>
      val row = rowNodes.item(ri).asInstanceOf[org.w3c.dom.Element]
      val cells = row.getElementsByTagName("c")
      val byCol = mutable.Map.empty[Int, String]
      (0 until cells.getLength).foreach { ci =>
        val cell = cells.item(ci).asInstanceOf[org.w3c.dom.Element]
        val ref = cell.getAttribute("r") // e.g. "B3"
        val colIdx = ref.takeWhile(_.isLetter)
          .foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
        val t = cell.getAttribute("t")
        val text = t match {
          case "inlineStr" => cell.getTextContent
          case "s" => shared(cell.getElementsByTagName("v").item(0)
            .getTextContent.trim.toInt)
          case _ =>
            val v = cell.getElementsByTagName("v")
            if (v.getLength == 0) null else v.item(0).getTextContent
        }
        if (text != null) byCol(colIdx) = text
      }
      val width = if (byCol.isEmpty) 0 else byCol.keys.max + 1
      (0 until width).map(c => byCol.get(c)).toIndexedSeq
    }
  }
}
