package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.pipeline.{Extract, Schema}
import graft.sources.ExcelTables
import org.apache.spark.sql.functions._

/** S3op: the native XLSX source, against workbooks written here as real
  * SpreadsheetML (shared strings, inline strings, numbers, sparse rows)
  * — covering the cell shapes a postings workbook produced by pandas/
  * openpyxl contains.
  */
class ExcelIOSpec extends SparkSpec {

  private def writeWorkbook(path: String, shared: Seq[String],
                            sheetXml: String): Unit = {
    val zip = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    if (shared.nonEmpty)
      entry("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst count="${shared.size}" uniqueCount="${shared.size}">""" +
          shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetXml</sheetData></worksheet>""")
    zip.close()
  }

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    // file 1: shared strings + numbers + a sparse row (no country cell)
    writeWorkbook(s"$d/jobs1.xlsx",
      shared = Seq("company", "title", "country", "salary",
        "Acme Corp", "Senior Data Engineer (Remote)", "USA",
        "Beta LLC", "ML Engineer ii", "France"),
      sheetXml =
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2" t="s"><v>5</v></c><c r="C2" t="s"><v>6</v></c><c r="D2"><v>85000</v></c></row>""" +
        """<row r="3"><c r="A3" t="s"><v>7</v></c><c r="B3" t="s"><v>8</v></c><c r="C3" t="s"><v>9</v></c></row>""" +
        """<row r="4"><c r="A4" t="inlineStr"><is><t>Gamma Inc</t></is></c><c r="B4" t="inlineStr"><is><t>Analyst</t></is></c><c r="D4"><v>60</v></c></row>""")
    // file 2: same header, one more US row (multi-file union)
    writeWorkbook(s"$d/jobs2.xlsx",
      shared = Seq("company", "title", "country", "salary",
        "Delta Co", "Data Scientist", "US"),
      sheetXml =
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2" t="s"><v>5</v></c><c r="C2" t="s"><v>6</v></c><c r="D2"><v>120000.5</v></c></row>""")
    d
  }

  test("S3op: shared/inline strings, numbers, sparse cells, multi-file union") {
    val df = ExcelTables.read(spark, s"$dir/*.xlsx")
    assert(df.columns.toSeq == Seq("company", "title", "country", "salary"))
    assert(df.count() == 4)
    val byCompany = df.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(byCompany("Acme Corp") == (("Senior Data Engineer (Remote)", "USA", "85000")))
    assert(byCompany("Beta LLC") == (("ML Engineer ii", "France", null)))   // sparse salary
    assert(byCompany("Gamma Inc") == (("Analyst", null, "60")))             // inline strings, no country
    assert(byCompany("Delta Co") == (("Data Scientist", "US", "120000.5")))
  }

  test("S3op feeds the extract chain like any other source") {
    val df = ExcelTables.read(spark, s"$dir/jobs1.xlsx")
    val out = Extract.normalize(df, Schema.kaggleMap, "KaggleXlsx")
      .where(Extract.usaFilter(col("country"), col("job_location")))
    // country precedence: only the USA row survives (France out; Gamma
    // has no country cell -> null -> dropped under the IN-list)
    assert(out.select("company_name").collect().map(_.getString(0)).toSeq ==
      Seq("Acme Corp"))
  }
}
