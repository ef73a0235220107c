package graft.sources

import java.io.InputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3op: native XLSX read (reference `data_extract.py:64`,
  * `pd.read_excel`). SpreadsheetML is a ZIP of XML parts; this reads the
  * first worksheet plus the shared-strings table with the JDK's StAX
  * parser — no external dependency (the usual `spark-excel`/POI route is
  * unavailable offline, and the subset a postings workbook uses is
  * small: shared/inline strings, numbers, booleans).
  *
  * Shape notes:
  *  - every cell surfaces as a string column; the pipeline coerces types
  *    downstream (C9/C10), mirroring how the reference treats workbook
  *    columns;
  *  - row 1 is the header; missing cells are null via cell-reference
  *    placement, trailing all-null columns keep the header width;
  *  - files are the parallelism unit (`binaryFiles` + flatMap): one task
  *    per workbook, which matches the reference's many-small-objects S3
  *    drop. Workbooks are parsed streaming (StAX), but a single
  *    worksheet must fit a task — the right trade-off for spreadsheet
  *    sources, which are small by construction.
  */
object ExcelTables {

  /** Parse one workbook stream: (header row, data rows), all strings,
    * null for absent cells.
    */
  private[sources] def parseWorkbook(in: InputStream): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipInputStream(in)
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheetXml: Array[Byte] = null
    var sharedXml: Array[Byte] = null
    try {
      Iterator.continually(zip.getNextEntry).takeWhile(_ != null).foreach { e =>
        e.getName match {
          case "xl/sharedStrings.xml" => sharedXml = zip.readAllBytes()
          case n if n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml") =>
            if (sheetXml == null || n == "xl/worksheets/sheet1.xml")
              sheetXml = zip.readAllBytes()
          case _ =>
        }
      }
    } finally zip.close()
    require(sheetXml != null, "no worksheet part found in workbook")
    if (sharedXml != null) shared = parseSharedStrings(sharedXml)
    parseSheet(sheetXml, shared)
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += cur.toString
            case _ =>
          }
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** Column index of a cell reference: "A1" -> 0, "AB3" -> 27. */
  private[sources] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  private def parseSheet(bytes: Array[Byte],
                         shared: IndexedSeq[String]): (Seq[String], Seq[Seq[String]]) = {
    val r = XMLInputFactory.newInstance()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[Int, String]]
    var cells: scala.collection.mutable.Map[Int, String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val cur = new StringBuilder
    var nextCol = 0 // fallback position when a <c> has no r= attribute
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              cells = scala.collection.mutable.Map.empty; nextCol = 0
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              cellCol = ref.map(colIndex).getOrElse(nextCol)
              nextCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cur.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT => cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if cells != null =>
              val raw = cur.toString
              val value = cellType match {
                case "s" => shared(raw.trim.toInt)
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => raw // number, str (formula result), inlineStr
              }
              if (value.nonEmpty) cells(cellCol) = value
            case "row" => rows += cells.toMap; cells = null
            case _ =>
          }
        case _ =>
      }
    }
    if (rows.isEmpty) return (Seq.empty, Seq.empty)
    val width = rows.map(m => if (m.isEmpty) 0 else m.keys.max + 1).max
    val header = (0 until width)
      .map(i => rows.head.getOrElse(i, s"_c$i"))
    val data = rows.tail.map(m => (0 until width).map(i => m.get(i).orNull))
    (header, data.toSeq.map(_.toSeq))
  }

  /** S3op entry: read workbooks under the given paths into one string-
    * typed frame. The schema comes from the first workbook's header row;
    * every file is parsed in its own task.
    */
  def read(spark: SparkSession, paths: String*): DataFrame = {
    val files = spark.sparkContext.binaryFiles(paths.mkString(","))
    val (header, _) = parseWorkbook(files.first()._2.open())
    val width = header.length
    val rows = files.flatMap { case (_, pds) =>
      val (_, data) = parseWorkbook(pds.open())
      data.map(r => Row.fromSeq(r.padTo(width, null).take(width)))
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(rows, schema)
  }
}
