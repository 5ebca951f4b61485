package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.xlsx.{XCell, XlsxParser}
import org.scalatest.funsuite.AnyFunSuite

/** Parser-level edge cases on hand-crafted SpreadsheetML (things our own
  * writer never produces): shared strings (with empty and multi-run <si>),
  * custom date numFmts, sparse rows with A1-reference gaps, bad
  * shared-string indices, error cells. Mirrors the reference's cell
  * semantics (sheetreader_extension.cpp:117-135).
  */
class XlsxParserSpec extends AnyFunSuite {

  /** Build an in-memory workbook from raw part contents. */
  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos, StandardCharsets.UTF_8)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def workbook(bytes: Array[Byte]) =
    new XlsxParser.Workbook(() => new ByteArrayInputStream(bytes))

  private val workbookXml =
    """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
      | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
  private val relsXml =
    """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  private def rows(bytes: Array[Byte]): Seq[Array[XCell]] = {
    val wb = workbook(bytes)
    val buf = scala.collection.mutable.ArrayBuffer[Array[XCell]]()
    wb.foreachRow("xl/worksheets/sheet1.xml", (_, cells) => { buf += cells; true })
    buf.toSeq
  }

  test("shared strings resolve, including empty and multi-run <si>") {
    val b = zip(
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<si><t>plain</t></si>
          |<si><r><t>multi</t></r><r><t>-run</t></r></si>
          |<si><t/></si>
          |</sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val r = rows(b)(0)
    assert(r(0) == XCell.XString("plain"))
    assert(r(1) == XCell.XString("multi-run"))
    assert(r(2) == XCell.XString(""))
  }

  test("phonetic runs (rPh furigana) are excluded from shared strings") {
    val b = zip(
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<si><r><t>東京</t></r><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si>
          |</sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    assert(rows(b)(0)(0) == XCell.XString("東京"))
  }

  test("bad shared-string references are error cells, not crashes") {
    val b = zip(
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>x</t></si></sst>""",
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>99</v></c><c r="B1" t="s"><v>abc</v></c><c r="C1" t="s"><v/></c><c r="D1" t="e"><v>#DIV/0!</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val r = rows(b)(0)
    assert(r.forall(_ == XCell.XError))
  }

  test("A1-reference gaps become XNone at the right positions") {
    val b = zip(
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1"><v>1</v></c><c r="D1"><v>4</v></c></row>
          |<row r="2"><c r="AB2"><v>28</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val rs = rows(b)
    assert(rs(0).toSeq == Seq(XCell.XNumber(1.0), XCell.XNone, XCell.XNone, XCell.XNumber(4.0)))
    assert(rs(1).length == 28) // AB = column 28 (1-based)
    assert(rs(1)(27) == XCell.XNumber(28.0))
    assert(rs(1).take(27).forall(_ == XCell.XNone))
  }

  test("custom numFmt with date tokens tags cells as dates; literals don't fool it") {
    val b = zip(
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/styles.xml" ->
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<numFmts count="2">
          |<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd"/>
          |<numFmt numFmtId="165" formatCode="&quot;years&quot;0.0"/>
          |</numFmts>
          |<cellXfs count="3">
          |<xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="165"/>
          |</cellXfs></styleSheet>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" s="1"><v>45000</v></c><c r="B1" s="2"><v>1.5</v></c><c r="C1" s="0"><v>7</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val r = rows(b)(0)
    assert(r(0) == XCell.XDate(45000.0)) // custom yyyy-mm-dd format
    assert(r(1) == XCell.XNumber(1.5)) // "years" literal contains 'y' but is quoted
    assert(r(2) == XCell.XNumber(7.0)) // general format
    // serial 45000 = 2023-03-15 (days since 1899-12-30)
    assert(java.time.LocalDate.ofEpochDay(XCell.serialToEpochDay(45000.0).toLong)
      == java.time.LocalDate.of(2023, 3, 15))
  }

  test("inline strings and formula string results parse (superset of reference)") {
    val b = zip(
      "xl/workbook.xml" -> workbookXml,
      "xl/_rels/workbook.xml.rels" -> relsXml,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>inline</t></is></c><c r="B1" t="str"><v>formula-result</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val r = rows(b)(0)
    assert(r(0) == XCell.XString("inline"))
    assert(r(1) == XCell.XString("formula-result"))
  }
}
