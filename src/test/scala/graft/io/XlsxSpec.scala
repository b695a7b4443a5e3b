package graft.io

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
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

  test("column reference decoding") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("BC12") == 54)
  }
}
