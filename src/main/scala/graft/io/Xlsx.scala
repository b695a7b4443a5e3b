package graft.io

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S2 — XLSX source (`/root/reference/read_file.py:9-10` reads the first
  * sheet of a workbook via openpyxl; no POI jar ships offline, so this is a
  * minimal native reader: XLSX is a ZIP of XML parts, and `java.util.zip` +
  * StAX are in the JDK).
  *
  * Supported: inline and shared strings, numeric cells, the first
  * worksheet, first row as header (matching `pd.read_excel` defaults).
  * All values surface as nullable strings (the conform layer owns typing,
  * same as the CSV path).
  *
  * Scale note: spreadsheets are dimension feeds, not the 100 TB fact path —
  * the file is parsed driver-side and parallelized; fact data arrives as
  * parquet/CSV (see [[Readers]]).
  */
object Xlsx {

  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = readRows(path)
    require(rows.nonEmpty, s"empty worksheet in $path")
    val header = rows.head.map(_.getOrElse("col"))
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = rows.tail.map(r =>
      Row.fromSeq(header.indices.map(i =>
        r.lift(i).flatten.orNull)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  /** Parse the first sheet into rows of optional cell strings. */
  private[io] def readRows(path: String): Vector[Vector[Option[String]]] = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(Vector.empty)
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(
          s"no xl/worksheets/sheet1.xml in $path"))
      parseSheet(zip.getInputStream(sheetEntry), shared)
    } finally zip.close()
  }

  private def parseSharedStrings(in: InputStream): Vector[String] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inSi = false
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT if reader.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.START_ELEMENT
            if inSi && reader.getLocalName == "t" =>
          sb.append(reader.getElementText)
        case XMLStreamConstants.END_ELEMENT if reader.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case _ =>
      }
    }
    reader.close()
    out.toVector
  }

  /** Column reference "BC12" → 0-based column index. */
  private[io] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def parseSheet(in: InputStream,
                         shared: Vector[String]): Vector[Vector[Option[String]]] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = ArrayBuffer.empty[Vector[Option[String]]]
    var row = ArrayBuffer.empty[Option[String]]
    var cellCol = 0
    var cellType = ""
    var value: Option[String] = None
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT => reader.getLocalName match {
          case "row" => row = ArrayBuffer.empty
          case "c" =>
            cellCol = Option(reader.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(row.length)
            cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("n")
            value = None
          case "v" =>
            val raw = reader.getElementText
            value = Some(if (cellType == "s") shared(raw.toInt) else raw)
          case "t" if cellType == "inlineStr" =>
            value = Some(reader.getElementText)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT => reader.getLocalName match {
          case "c" =>
            while (row.length < cellCol) row += None // gap = empty cells
            row += value
          case "row" => rows += row.toVector
          case _ =>
        }
        case _ =>
      }
    }
    reader.close()
    rows.toVector
  }
}
