package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal deterministic OOXML writer — fixture synthesis for the
  * distributed multi-workbook ingest gate (`p6_workbooks_distributed`
  * derives workbooks from the parquet `customer` table so DuckDB can
  * oracle the round trip) and for specs. Enough structure for any
  * standards-compliant reader: workbook + rels + one sheet XML per
  * sheet, inline strings for text, bare `<v>` for numerics. NOT a
  * general xlsx sink — the engine's output formats are parquet/JSON.
  */
object WorkbookFixtures {

  def writeXlsx(path: Path, sheets: Seq[(String, Seq[Seq[String]])]): Unit =
    writeXlsx(Files.newOutputStream(path), sheets)

  /** Stream variant: lets callers target any filesystem — notably the
    * Hadoop FS API (`FileSystem.create`), so fixture synthesis works
    * against file:/hdfs:/s3a: URIs identically (the
    * p6_workbooks_distributed gate writes through it; a multi-node
    * cluster just changes the root URI). Closes `out`.
    */
  def writeXlsx(out: java.io.OutputStream, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val zip = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val numeric = "^-?\\d+(\\.\\d+)?$".r
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets>""" +
        sheets.zipWithIndex.map { case ((n, _), i) =>
          s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + "</sheets></workbook>")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships>""" +
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>""")
          .mkString + "</Relationships>")
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      val body = rows.map { row =>
        "<row>" + row.map {
          case v if v.isEmpty => "<c/>"
          case v if numeric.matches(v) => s"<c><v>$v</v></c>"
          case v => s"""<c t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }.mkString + "</row>"
      }.mkString
      entry(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0"?><worksheet><sheetData>$body</sheetData></worksheet>""")
    }
    zip.close()
  }
}
