package graft.connections

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Driver-side readers for the File connection's spreadsheet/markup kinds
  * (reference: pandas read_excel / read_xml / read_html,
  * ankaflow/connections/file.py:136-147).
  *
  * These are small-ingest formats — the reference parses them in the
  * driver process with pandas and registers the frame, and this does the
  * same (parse locally, then `createDataFrame`). They are NOT the 100 TB
  * path; bulk data belongs in parquet/csv. No POI/jsoup jars exist in the
  * offline build, so the parsing is deliberately minimal and dependency
  * free:
  *  - xlsx: ZIP + StAX over xl/worksheets/sheet1.xml + sharedStrings.xml.
  *    First row is the header (pandas default header=0). Date cells
  *    surface as Excel serial numbers (style tables are not consulted).
  *  - xml: repeating children of the root element become rows; their
  *    attributes and child elements become columns (pandas read_xml's
  *    default child-of-root xpath).
  *  - html: first <table>'s rows; th/td text, tags stripped (pandas
  *    read_html(...)[0]).
  *
  * Columns come back typed by uniform inference (long → double → boolean
  * → string), mirroring how pandas infers dtypes for these readers.
  */
object TabularFiles {

  /** Hardened XML parser factory: DOCTYPEs (and with them external
    * entities) are refused outright — a crafted xlsx/xml could otherwise
    * read local files or make outbound requests during parse (XXE). */
  private def secureDocBuilder(): javax.xml.parsers.DocumentBuilder = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  // ------------------------------------------------------------------ xlsx

  def readXlsx(spark: SparkSession, file: String): DataFrame = {
    val zip = new ZipFile(file)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val sheetEntry = firstSheetPart(zip).flatMap(p =>
        Option(zip.getEntry(p)))
        .orElse(Option(zip.getEntry("xl/worksheets/sheet1.xml")))
        .getOrElse(sys.error(s"no first worksheet part found in $file"))
      val rows = parseSheet(zip.getInputStream(sheetEntry), shared)
      toDataFrame(spark, rows)
    } finally zip.close()
  }

  /** Resolve the FIRST sheet in workbook order through the relationship
    * table — sheets deleted/reordered in Excel keep their original part
    * names, so `sheet1.xml` is not necessarily the first sheet (pandas
    * resolves through openpyxl the same way). Falls back to sheet1.xml
    * for producers that omit the rels part. */
  private def firstSheetPart(zip: ZipFile): Option[String] =
    for {
      wbEntry <- Option(zip.getEntry("xl/workbook.xml"))
      relEntry <- Option(zip.getEntry("xl/_rels/workbook.xml.rels"))
      wb = secureDocBuilder().parse(zip.getInputStream(wbEntry))
      sheets = wb.getElementsByTagName("sheet")
      if sheets.getLength > 0
      rid = {
        val attrs = sheets.item(0).getAttributes
        // the r:id attribute may carry any namespace prefix
        (0 until attrs.getLength).map(attrs.item)
          .find(_.getNodeName.endsWith(":id")).map(_.getNodeValue)
          .getOrElse("")
      }
      rels = secureDocBuilder().parse(zip.getInputStream(relEntry))
        .getElementsByTagName("Relationship")
      target <- (0 until rels.getLength).map(rels.item).collectFirst {
        case r if Option(r.getAttributes.getNamedItem("Id"))
            .exists(_.getNodeValue == rid) =>
          val t = r.getAttributes.getNamedItem("Target").getNodeValue
          if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t"
      }
    } yield target

  /** StAX factory with DTD/external-entity support off (XXE). */
  private def secureStax(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def parseSharedStrings(in: java.io.InputStream): IndexedSeq[String] = {
    val reader = secureStax().createXMLStreamReader(in)
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT if reader.getLocalName == "si" =>
          inSi = true; cur.clear()
        case XMLStreamConstants.CHARACTERS if inSi =>
          cur.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT if reader.getLocalName == "si" =>
          inSi = false; out += cur.toString
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  /** Sheet XML → rows of (possibly sparse) cells, null-padded by the `r`
    * cell reference so skipped blanks keep later columns aligned. */
  private def parseSheet(in: java.io.InputStream,
      shared: IndexedSeq[String]): Seq[IndexedSeq[String]] = {
    val reader = secureStax().createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer[IndexedSeq[String]]()
    var row: mutable.ArrayBuffer[String] = null
    var cellType = ""
    var cellCol = -1
    var inV = false
    val v = new StringBuilder
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT => reader.getLocalName match {
          case "row" => row = mutable.ArrayBuffer[String]()
          case "c" if row != null =>
            cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("n")
            cellCol = Option(reader.getAttributeValue(null, "r"))
              .map(colIndex).getOrElse(row.length)
          case "v" | "t" if row != null => inV = true; v.clear()
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV =>
          v.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT => reader.getLocalName match {
          case "v" | "t" if row != null && inV =>
            inV = false
            val value = cellType match {
              case "s" => shared.lift(v.toString.trim.toInt).getOrElse("")
              case "b" => if (v.toString.trim == "1") "true" else "false"
              case _ => v.toString
            }
            while (row.length < cellCol) row += null
            if (cellCol < row.length) row(cellCol) = value else row += value
          case "row" if row != null =>
            rows += row.toIndexedSeq; row = null
          case _ =>
        }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** "B7" → 1 (zero-based column index). */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  // ------------------------------------------------------------------- xml

  def readXml(spark: SparkSession, file: String): DataFrame = {
    val doc = secureDocBuilder().parse(new java.io.File(file))
    val rootKids = doc.getDocumentElement.getChildNodes
    val cols = mutable.LinkedHashSet[String]()
    val rows = mutable.ArrayBuffer[mutable.LinkedHashMap[String, String]]()
    for (i <- 0 until rootKids.getLength) rootKids.item(i) match {
      case el: org.w3c.dom.Element =>
        val m = mutable.LinkedHashMap[String, String]()
        val attrs = el.getAttributes
        for (a <- 0 until attrs.getLength) {
          val at = attrs.item(a)
          m(at.getNodeName) = at.getNodeValue
        }
        val kids = el.getChildNodes
        for (k <- 0 until kids.getLength) kids.item(k) match {
          case kel: org.w3c.dom.Element => m(kel.getNodeName) = kel.getTextContent
          case _ =>
        }
        cols ++= m.keys
        rows += m
      case _ =>
    }
    val header = cols.toIndexedSeq
    val data = rows.toSeq.map(m => header.map(c => m.get(c).orNull))
    toDataFrame(spark, header +: data)
  }

  // ------------------------------------------------------------------ html

  private val TrRe = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val CellRe = "(?is)<t[hd][^>]*>(.*?)</t[hd]>".r
  private val TagRe = "(?s)<[^>]*>".r

  /** First `<table>`'s rows; lenient tag-stripping extraction (real-world
    * HTML is rarely well-formed XML, so no DOM parse here). */
  def readHtml(spark: SparkSession, file: String): DataFrame = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)), "UTF-8")
    val table = "(?is)<table[^>]*>(.*?)</table>".r
      .findFirstMatchIn(text)
      .getOrElse(sys.error(s"no <table> found in $file")).group(1)
    val rows = TrRe.findAllMatchIn(table).map { tr =>
      CellRe.findAllMatchIn(tr.group(1))
        .map(m => unescape(TagRe.replaceAllIn(m.group(1), "").trim))
        .toIndexedSeq
    }.toSeq.filter(_.nonEmpty)
    toDataFrame(spark, rows)
  }

  /** `&amp;` must be replaced LAST: doing it first turns a pre-escaped
    * `&amp;lt;` into `&lt;` and then `<` (double-unescape). */
  private def unescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    .replace("&amp;", "&")

  // ------------------------------------------------- shared materialization

  /** Header row + data rows (all strings) → typed DataFrame. */
  private[connections] def toDataFrame(spark: SparkSession,
      rows: Seq[IndexedSeq[String]]): DataFrame = {
    require(rows.nonEmpty, "empty tabular file (no header row)")
    val header = rows.head.map(h => Option(h).getOrElse("").trim)
    val width = header.length
    val data = rows.tail.map(r => r.padTo(width, null).take(width))
    val types = (0 until width).map { i => inferType(data.map(_(i))) }
    val schema = StructType(header.zip(types).map {
      case (name, t) => StructField(name, t, nullable = true)
    })
    val converted = data.map { r =>
      Row.fromSeq(r.zip(types).map { case (v, t) => convert(v, t) })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(converted.toList), schema)
  }

  private val LongRe = "-?\\d{1,18}".r
  private val DoubleRe = "-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?".r

  private def inferType(values: Seq[String]): DataType = {
    val present = values.filter(v => v != null && v.nonEmpty)
    if (present.isEmpty) StringType
    else if (present.forall(v => LongRe.matches(v))) LongType
    else if (present.forall(v => DoubleRe.matches(v))) DoubleType
    else if (present.forall(v => v == "true" || v == "false")) BooleanType
    else StringType
  }

  private def convert(v: String, t: DataType): Any =
    if (v == null || v.isEmpty) null
    else t match {
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case BooleanType => v.toBoolean
      case _ => v
    }
}
