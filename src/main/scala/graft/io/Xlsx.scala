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
  * Supported: inline and shared strings, numeric cells, date cells
  * (numeric serial + date number-format style, 1900 epoch incl. the
  * phantom-leap-day adjustment, matching openpyxl's `from_excel`), the
  * first worksheet, first row as header (matching `pd.read_excel`
  * defaults). All values surface as nullable strings — dates as ISO
  * `yyyy-MM-dd` (or `yyyy-MM-dd HH:mm:ss` when a time fraction is
  * present); the conform layer owns further typing, same as the CSV path.
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
      val dateStyles = Option(zip.getEntry("xl/styles.xml"))
        .map(e => parseDateStyles(zip.getInputStream(e)))
        .getOrElse(Set.empty[Int])
      val sheetEntry = Option(zip.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(
          s"no xl/worksheets/sheet1.xml in $path"))
      parseSheet(zip.getInputStream(sheetEntry), shared, dateStyles)
    } finally zip.close()
  }

  /** Built-in OOXML number formats that render as dates/times (ECMA-376
    * §18.8.30) plus the locale-variant ranges. */
  private val builtinDateFormats: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date format if, after stripping quoted
    * literals, [] sections and escapes, it contains a y/m/d/h/s token. */
  private[io] def isDateFormatCode(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    cleaned.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** styles.xml → the set of cellXfs indices whose number format is a
    * date format (the style a cell references via its `s` attribute). */
  private def parseDateStyles(in: InputStream): Set[Int] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val customDateFmts = scala.collection.mutable.Set.empty[Int]
    val xfFmtIds = ArrayBuffer.empty[Int]
    var inCellXfs = false
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT => reader.getLocalName match {
          case "numFmt" =>
            val id = Option(reader.getAttributeValue(null, "numFmtId"))
              .map(_.toInt)
            val code = Option(reader.getAttributeValue(null, "formatCode"))
            for (i <- id; c <- code if isDateFormatCode(c)) customDateFmts += i
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            xfFmtIds += Option(reader.getAttributeValue(null, "numFmtId"))
              .map(_.toInt).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT
            if reader.getLocalName == "cellXfs" => inCellXfs = false
        case _ =>
      }
    }
    reader.close()
    xfFmtIds.zipWithIndex.collect {
      case (fmt, i) if builtinDateFormats(fmt) || customDateFmts(fmt) => i
    }.toSet
  }

  /** 1900-system Excel serial → ISO string. Epoch 1899-12-30 with the
    * openpyxl `from_excel` adjustment for the phantom 1900-02-29 (serials
    * below 60 shift one day so serial 1 = 1900-01-01). Whole-day serials
    * render as dates; fractional serials carry a time-of-day component. */
  private[io] def serialToIso(serial: Double): String = {
    val adjusted = if (serial > 0 && serial < 60) serial + 1 else serial
    // bound: 1900-system serials span [0, ~2958465] (year 9999), far
    // inside Long; plusDays rejects out-of-range results loudly.
    val days = math.floor(adjusted).toLong
    val date = java.time.LocalDate.of(1899, 12, 30).plusDays(days)
    // bound: (adjusted - days) ∈ [0, 1), so the rounded value is in
    // [0, 86400] — trivially inside Long.
    val secs = math.round((adjusted - days) * 86400.0)
    if (secs == 0) date.toString
    else java.time.LocalDateTime.of(date, java.time.LocalTime.MIDNIGHT)
      .plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
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

  private def parseSheet(in: InputStream, shared: Vector[String],
                         dateStyles: Set[Int]): Vector[Vector[Option[String]]] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = ArrayBuffer.empty[Vector[Option[String]]]
    var row = ArrayBuffer.empty[Option[String]]
    var cellCol = 0
    var cellType = ""
    var cellIsDate = false
    var value: Option[String] = None
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT => reader.getLocalName match {
          case "row" => row = ArrayBuffer.empty
          case "c" =>
            cellCol = Option(reader.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(row.length)
            cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("n")
            cellIsDate = cellType == "n" &&
              Option(reader.getAttributeValue(null, "s"))
                .map(_.toInt).exists(dateStyles)
            value = None
          case "v" =>
            val raw = reader.getElementText
            value = Some(
              if (cellType == "s") shared(raw.toInt)
              else if (cellIsDate) serialToIso(raw.toDouble)
              else raw)
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

  // ---- writer ----------------------------------------------------------

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colLetters(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Minimal OOXML writer: one worksheet, every cell an inline string
    * (types are the conform layer's job, mirroring the reader). Driver-
    * side by design — spreadsheets are dimension feeds, never fact data;
    * `df` must be small enough to collect. Produces a complete, valid
    * package ([Content_Types], rels, workbook, sheet1) readable by
    * [[read]] and by any spreadsheet tool. */
  def write(df: DataFrame, path: String): Unit = {
    val header = df.schema.fieldNames.toVector
    // Fact-path misuse guard: collecting a big frame to the driver should
    // fail LOUDLY, not OOM. limit(cap+1) bounds what the probe itself can
    // pull back; xlsx is inherently a single-file dimension-feed format,
    // so a cap (not a streaming writer) is the honest contract.
    val cap = 100000
    val probe = df.limit(cap + 1).collect().toVector
    require(probe.size <= cap,
      s"Xlsx.write is a dimension-feed sink (driver-side, single file); " +
        s"input exceeds $cap rows — write parquet/orc/csv instead")
    val data = probe.map(r =>
      header.indices.map(i => Option(r.get(i)).map(_.toString)).toVector)
    val sheet = {
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      (Vector(header.map(Option(_))) ++ data).zipWithIndex.foreach {
        case (cells, r) =>
          sb ++= s"""<row r="${r + 1}">"""
          cells.zipWithIndex.foreach {
            case (Some(v), c) =>
              sb ++= s"""<c r="${colLetters(c)}${r + 1}" t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>"""
            case (None, _) => // omitted cell = null (reader fills the gap)
          }
          sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet)
    val out = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
