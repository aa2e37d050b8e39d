package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Flow

/** File connection xlsx/xml/html kinds (reference pandas readers,
  * file.py:136-147) through real flows. The xlsx fixture is built from
  * scratch (ZIP + sheet XML + sharedStrings) — the same wire format any
  * producer emits. */
class TabularFilesSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private def tmp(suffix: String): String =
    Files.createTempDirectory("graft_tab").toString + "/f" + suffix

  private def writeXlsx(path: String): Unit = {
    val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>name</t></si><si><t>qty</t></si><si><t>price</t></si><si><t>widget</t></si><si><t>gadget</t></si></sst>""")
    // row 1 = header (shared strings 0..2); B3 blank → null padding via r refs
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>4</v></c><c r="C2"><v>1.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="C3"><v>2.25</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
  }

  test("xlsx tap: shared strings, sparse rows, typed columns") {
    val f = tmp(".xlsx")
    writeXlsx(f)
    val yaml =
      s"""
         |- name: Sheet
         |  kind: tap
         |  connection: {kind: File, locator: $f}
         |  query: SELECT name, qty, price FROM File ORDER BY name
         |""".stripMargin
    val df = Flow.runYaml(spark, yaml).df()
    val rows = df.collect()
    assert(df.schema.map(_.dataType.typeName).toList ==
      List("string", "long", "double"))
    assert(rows.map(_.getString(0)).toList == List("gadget", "widget"))
    assert(rows(1).getLong(1) == 4 && rows(1).getDouble(2) == 1.5)
    assert(rows(0).isNullAt(1) && rows(0).getDouble(2) == 2.25)
  }

  test("xlsx: first sheet resolves through workbook rels, not the part name") {
    // workbook order says the first sheet lives in sheet2.xml (as Excel
    // leaves things after deleting the original first sheet)
    val f = tmp("_rels.xlsx")
    val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(f)))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="2" r:id="rId5"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId5" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>""")
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>v</t></is></c></row>
        |<row r="2"><c r="A2"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    // decoy with different data — must NOT be read
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>wrong</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = Flow.runYaml(spark,
      s"""
         |- name: S
         |  kind: tap
         |  connection: {kind: File, locator: $f, filetype: xlsx}
         |""".stripMargin).df()
    assert(df.columns.toList == List("v"))
    assert(df.collect()(0).getLong(0) == 42L)
  }

  test("xml tap: repeating children become rows, attrs + elements columns") {
    val f = tmp(".xml")
    Files.write(java.nio.file.Paths.get(f),
      """<items>
        |  <item id="1"><name>alpha</name><score>10</score></item>
        |  <item id="2"><name>beta</name><score>20</score></item>
        |</items>""".stripMargin.getBytes("UTF-8"))
    val df = Flow.runYaml(spark,
      s"""
         |- name: X
         |  kind: tap
         |  connection: {kind: File, locator: $f}
         |  query: SELECT id, name, score FROM File ORDER BY id
         |""".stripMargin).df()
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1 && rows(0).getString(1) == "alpha"
      && rows(0).getLong(2) == 10)
  }

  test("html tap: first table, tags stripped, entities unescaped") {
    val f = tmp(".html")
    Files.write(java.nio.file.Paths.get(f),
      """<html><body><p>noise</p><table class="x">
        |<tr><th>city</th><th>pop</th></tr>
        |<tr><td><b>Oslo</b></td><td>709000</td></tr>
        |<tr><td>S&amp;P Town</td><td>1000</td></tr>
        |</table><table><tr><td>second table ignored</td></tr></table>
        |</body></html>""".stripMargin.getBytes("UTF-8"))
    val df = Flow.runYaml(spark,
      s"""
         |- name: H
         |  kind: tap
         |  connection: {kind: File, locator: $f}
         |  query: SELECT city, pop FROM File ORDER BY pop
         |""".stripMargin).df()
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toList == List("S&P Town", "Oslo"))
    assert(rows(1).getLong(1) == 709000L)
  }

  test("html tap: pre-escaped entities do not double-unescape") {
    val f = tmp(".html")
    // &amp;lt; is the ESCAPED text "&lt;" — one unescape pass must yield
    // the literal string "&lt;", not "<" (pandas read_html agrees)
    Files.write(java.nio.file.Paths.get(f),
      """<table><tr><th>t</th></tr>
        |<tr><td>a &amp;lt; b</td></tr>
        |</table>""".stripMargin.getBytes("UTF-8"))
    val df = Flow.runYaml(spark,
      s"""
         |- name: H
         |  kind: tap
         |  connection: {kind: File, locator: $f}
         |  query: SELECT t FROM File
         |""".stripMargin).df()
    assert(df.collect().head.getString(0) == "a &lt; b")
  }
}
