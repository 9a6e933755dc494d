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

  /** Write a driver-small DataFrame to a single-sheet .xlsx (header row +
    * inline-string / numeric cells). Collects — callers bound the size, as
    * the reference does for its export artifacts. */
  def write(df: DataFrame, path: String, maxRows: Int = 100000): Unit = {
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

    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>""")
    entry("xl/worksheets/sheet1.xml", sb.toString)
    zos.close()
  }

  // ---------- read ----------

  private def zipEntryText(zf: ZipFile, name: String): Option[String] =
    Option(zf.getEntry(name)).map { e =>
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }

  /** Read sheet1 of an .xlsx into a DataFrame: first row = header; numeric
    * columns inferred (LongType if all integral, else DoubleType, else
    * StringType) — pandas read_excel's inference shape. Supports inline and
    * shared strings. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val zf = new ZipFile(new File(path))
    try {
      val shared: IndexedSeq[String] = zipEntryText(zf, "xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
      val sheet = zipEntryText(zf, "xl/worksheets/sheet1.xml")
        .getOrElse(throw new IllegalArgumentException(s"no sheet1 in $path"))
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
