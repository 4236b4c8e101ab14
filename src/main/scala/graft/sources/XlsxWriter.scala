package graft.sources

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal XLSX writer — enough SpreadsheetML for the reader (and any
  * mainstream spreadsheet tool) to open: one sheet, inline strings
  * (no sharedStrings part), ISO strings for timestamps.
  *
  * Driver-side by design: like the reference's export endpoint this
  * produces a single human-downloadable file (reference:
  * src/controllers.rs:188-257). Rows STREAM through the driver
  * (`toLocalIterator` → zip stream, one partition in memory at a
  * time) — an unbounded SELECT exported to xlsx never materializes on
  * the driver. Results at cluster scale should still use
  * [[Writers.exportDir]] formats instead.
  */
object XlsxWriter {

  private def esc(s: String): String = {
    val entities = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
    // control chars (except tab/lf/cr) are illegal in XML 1.0 even
    // escaped — a single one corrupts the whole workbook; drop them
    entities.filter(c => c >= 0x20 || c == '\t' || c == '\n' || c == '\r')
  }

  /** Streams into `<target>.tmp` and renames on success, so a Spark
    * failure mid-iteration never leaves a truncated zip at the target
    * path (the pre-streaming writer had fail-before-open semantics;
    * this preserves them for consumers watching the final path).
    */
  def write(df: DataFrame, filePath: String, sheetName: String = "Sheet1"): java.nio.file.Path = {
    val target = Paths.get(filePath)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    try {
      writeTo(df, tmp, sheetName)
      Files.move(tmp, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      target
    } finally Files.deleteIfExists(tmp)
  }

  private def writeTo(df: DataFrame, target: java.nio.file.Path, sheetName: String): Unit = {
    val schema = df.schema
    val zos = new ZipOutputStream(Files.newOutputStream(target))
    try {
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }

    part("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    part("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    // the sheet part streams: rows flow from toLocalIterator straight
    // into the zip entry, so driver memory is bounded by one upstream
    // partition, not the result size
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(zos, java.nio.charset.StandardCharsets.UTF_8))
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def strCell(v: String): Unit =
      w.write(s"""<c t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
    // header row
    w.write("<row>")
    schema.fields.foreach(f => strCell(f.name))
    w.write("</row>")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    df.toLocalIterator().forEachRemaining { r =>
      w.write("<row>")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (r.isNullAt(i)) w.write("<c/>")
        else f.dataType match {
          case _: NumericType => w.write(s"<c><v>${r.get(i)}</v></c>")
          case BooleanType => w.write(s"""<c t="b"><v>${if (r.getBoolean(i)) 1 else 0}</v></c>""")
          case TimestampType => strCell(fmt.format(r.getTimestamp(i).toInstant))
          case _ => strCell(r.get(i).toString)
        }
      }
      w.write("</row>")
    }
    w.write("</sheetData></worksheet>")
    w.flush() // flush, NOT close — closing the writer would close the zip
    zos.closeEntry()
    } finally zos.close()
  }
}
