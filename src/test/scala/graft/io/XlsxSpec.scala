package graft.io

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.functions.lit
import graft.SparkSpec

/** The reader is exercised against a workbook authored here from raw OOXML
  * parts (shared + inline strings, numeric cells, sparse rows) — the same
  * shapes openpyxl/pandas emit. */
class XlsxSpec extends SparkSpec {

  private def writeFixture(): String = {
    val f = java.nio.file.Files.createTempFile("graft", ".xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>nom source</t></si><si><t>prenom source</t></si>
        |<si><t>Dupont</t></si><si><t>Jean</t></si></sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>n</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>42.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("[Content_Types].xml", "<?xml version=\"1.0\"?><Types/>")
    zos.close()
    f.getAbsolutePath
  }

  test("xlsx: shared strings, inline strings, numerics, sparse cells") {
    val df = Xlsx.read(spark, writeFixture())
    assert(df.columns.toSeq == Seq("nom source", "prenom source", "n"))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "Dupont" && rows(0).getString(1) == "Jean")
    assert(rows(0).getString(2) == "42.5")
    assert(rows(1).getString(0) == "Dupont" && rows(1).getString(1) == null)
    assert(rows(1).getString(2) == "7")
  }

  private def writeDateFixture(): String = {
    val f = java.nio.file.Files.createTempFile("graftdate", ".xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // cellXfs: style 0 = general, style 1 = builtin date (14),
    // style 2 = custom date (165), style 3 = custom NON-date (164).
    entry("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="0.00&quot; kg&quot;"/>
        |<numFmt numFmtId="165" formatCode="dd/mm/yyyy"/>
        |</numFmts>
        |<cellXfs count="4">
        |<xf numFmtId="0"/><xf numFmtId="14"/>
        |<xf numFmtId="165"/><xf numFmtId="164"/>
        |</cellXfs></styleSheet>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>birthday</t></is></c><c r="B1" t="inlineStr"><is><t>updated</t></is></c><c r="C1" t="inlineStr"><is><t>weight</t></is></c></row>
        |<row r="2"><c r="A2" s="1"><v>31111</v></c><c r="B2" s="2"><v>45000.5</v></c><c r="C2" s="3"><v>72.5</v></c></row>
        |<row r="3"><c r="A3" s="1"><v>59</v></c><c r="B3" s="1"><v>61</v></c><c r="C3"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("[Content_Types].xml", "<?xml version=\"1.0\"?><Types/>")
    zos.close()
    f.getAbsolutePath
  }

  test("xlsx: date cells convert 1900-epoch serials to ISO strings") {
    val df = Xlsx.read(spark, writeDateFixture())
    val rows = df.collect()
    // serial 31111 = 1985-03-05 (verified against openpyxl from_excel)
    assert(rows(0).getString(0) == "1985-03-05")
    // custom dd/mm/yyyy format detected as a date; .5 = noon
    assert(rows(0).getString(1) == "2023-03-15 12:00:00")
    // custom "0.00 kg" format is NOT a date: raw numeric survives
    assert(rows(0).getString(2) == "72.5")
    // pre-leap-bug serial: 59 shifts one day (1900-02-28), 61 = 1900-03-01
    assert(rows(1).getString(0) == "1900-02-28")
    assert(rows(1).getString(1) == "1900-03-01")
    // unstyled numeric untouched
    assert(rows(1).getString(2) == "1")
  }

  test("date format-code detection") {
    assert(Xlsx.isDateFormatCode("dd/mm/yyyy"))
    assert(Xlsx.isDateFormatCode("[$-409]h:mm AM/PM"))
    assert(!Xlsx.isDateFormatCode("0.00\" kg\""))   // quoted literal only
    assert(!Xlsx.isDateFormatCode("#,##0.00"))
    assert(!Xlsx.isDateFormatCode("[h]"))            // bracketed section only
  }

  test("column reference decoding") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("BC12") == 54)
  }

  test("writer round trip: nulls, XML-special characters, 27+ columns") {
    import spark.implicits._
    val df = Seq(
      ("a & b", Option("x<y>"), "1"),
      ("plain", None, "2")).toDF("name", "note", "k")
    val path = java.io.File.createTempFile("graft_wr", ".xlsx").getPath
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path).orderBy("k").collect()
    assert(back(0).getString(0) == "a & b")
    assert(back(0).getString(1) == "x<y>")
    assert(back(1).isNullAt(1)) // omitted cell reads back as null
    // column letters beyond Z (AA...) round-trip positionally
    val wide = spark.range(1).toDF("c0")
      .select((0 until 28).map(i => lit(s"v$i").as(s"c$i")): _*)
    val widePath = java.io.File.createTempFile("graft_ww", ".xlsx").getPath
    Xlsx.write(wide, widePath)
    val w = Xlsx.read(spark, widePath).collect()(0)
    assert(w.getString(26) == "v26" && w.getString(27) == "v27")
  }

  test("writer refuses fact-sized input loudly instead of collecting it") {
    val big = spark.range(100001).toDF("id")
    val path = java.io.File.createTempFile("graft_big", ".xlsx").getPath
    val e = intercept[IllegalArgumentException](Xlsx.write(big, path))
    assert(e.getMessage.contains("dimension-feed"))
  }
}
