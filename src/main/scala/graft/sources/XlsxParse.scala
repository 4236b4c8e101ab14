package graft.sources

import java.io.InputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

/** Minimal, dependency-free XLSX (SpreadsheetML) parser.
  *
  * An .xlsx file is a zip of XML parts; this reads the parts needed to
  * surface sheet data: workbook.xml (sheet names), sharedStrings.xml,
  * styles.xml (to detect date-formatted numeric cells) and one
  * worksheet. Parsing is StAX streaming (JDK built-in) so a worksheet
  * is never materialized as a DOM. Everything here is static and
  * serializable-safe — it runs inside executor tasks
  * (see [[XlsxSource]]).
  *
  * Equivalent of the reference's calamine-based reader
  * (reference: src/data_source/excel.rs:12-107): header row = schema,
  * cells typed as string/number/bool/datetime.
  */
object XlsxParse {

  /** A raw cell value: String, Double, Boolean or java.sql.Timestamp. */
  type Cell = Any

  // Excel's 1900 date system epoch (serial 0 = 1899-12-30).
  private val ExcelEpochMs = -2209161600000L // 1899-12-30T00:00:00Z
  private val DayMs = 86400000L

  /** Built-in numFmt ids that render as dates/times. */
  private def isBuiltinDateFormat(id: Int): Boolean =
    (id >= 14 && id <= 22) || (id >= 45 && id <= 47)

  private def isDateFormatCode(code: String): Boolean = {
    // strip [] sections and quoted literals, then look for y/m/d/h/s tokens
    val cleaned = code.replaceAll("\\[[^]]*\\]", "").replaceAll("\"[^\"]*\"", "")
    cleaned.exists(c => "ymdhs".contains(c.toLower)) && !cleaned.contains('#')
  }

  private def newReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  /** One pass over the zip; collects the parts a sheet read needs.
    * Returns (sheetNames in workbook order, sharedStrings, dateStyles
    * = set of cellXf indices that are date-formatted, sheetXml bytes
    * for the requested sheet (by name, or head of workbook order)).
    */
  def readParts(open: () => InputStream, wantedSheet: Option[String]): XlsxParts = {
    var sheetMeta = Vector.empty[(String, String)] // (name, r:id) in workbook order
    var rels = Map.empty[String, String] // r:id -> part target
    var shared = Vector.empty[String]
    var dateStyles = Set.empty[Int]
    val sheetBytes = mutable.Map.empty[String, Array[Byte]] // part name -> bytes

    val zin = new ZipInputStream(open())
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { entry =>
        entry.getName match {
          case "xl/workbook.xml" => sheetMeta = parseSheetMeta(readAll(zin))
          case "xl/_rels/workbook.xml.rels" => rels = parseRels(readAll(zin))
          case "xl/sharedStrings.xml" => shared = parseSharedStrings(readAll(zin))
          case "xl/styles.xml" => dateStyles = parseDateStyles(readAll(zin))
          case n if n.startsWith("xl/worksheets/") && n.endsWith(".xml") =>
            sheetBytes(n) = readAll(zin)
          case _ =>
        }
      }
    } finally zin.close()

    val sheetNames = sheetMeta.map(_._1)
    val wanted = wantedSheet match {
      case Some(name) =>
        val i = sheetNames.indexOf(name)
        if (i < 0) throw new IllegalArgumentException(
          s"Sheet '$name' not found; workbook has: ${sheetNames.mkString(", ")}")
        i
      case None => 0
    }
    // Resolve the sheet's part through the workbook relationships
    // (sheet order does NOT imply sheetN.xml numbering once sheets have
    // been deleted/reordered); fall back to positional numbering only
    // when the rels part is absent.
    val part = sheetMeta.lift(wanted).map(_._2).flatMap(rels.get) match {
      case Some(target) =>
        val t = target.stripPrefix("/").stripPrefix("xl/")
        s"xl/$t"
      case None => s"xl/worksheets/sheet${wanted + 1}.xml"
    }
    val bytes = sheetBytes.getOrElse(part,
      throw new IllegalArgumentException(
        s"Worksheet part $part not found in workbook (sheets: ${sheetNames.mkString(", ")})"))
    XlsxParts(sheetNames, shared, dateStyles, bytes)
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    Iterator.continually(in.read(tmp)).takeWhile(_ > 0).foreach(n => buf.write(tmp, 0, n))
    buf.toByteArray
  }

  private def parseSheetMeta(bytes: Array[Byte]): Vector[(String, String)] = {
    val r = newReader(new java.io.ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
        // r:id is namespaced; scan attributes by local name
        var rid = ""
        var i = 0
        while (i < r.getAttributeCount) {
          if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
          i += 1
        }
        out += ((name, rid))
      }
    }
    r.close()
    out.result()
  }

  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val r = newReader(new java.io.ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
        val id = Option(r.getAttributeValue(null, "Id")).getOrElse("")
        val target = Option(r.getAttributeValue(null, "Target")).getOrElse("")
        if (id.nonEmpty) out += id -> target
      }
    }
    r.close()
    out.result()
  }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = newReader(new java.io.ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[String]
    var inSi = false
    var phoneticDepth = 0 // skip <rPh>/<phoneticPr> furigana runs
    val sb = new StringBuilder
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "si" => inSi = true; sb.clear()
        case "rPh" | "phoneticPr" if inSi => phoneticDepth += 1
        case _ =>
      }
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "si" => inSi = false; out += sb.toString
        case "rPh" | "phoneticPr" if inSi && phoneticDepth > 0 => phoneticDepth -= 1
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inSi && phoneticDepth == 0 =>
        sb.append(r.getText)
      case _ =>
    }
    r.close()
    out.result()
  }

  private def parseDateStyles(bytes: Array[Byte]): Set[Int] = {
    val r = newReader(new java.io.ByteArrayInputStream(bytes))
    val customDateFmts = mutable.Set.empty[Int]
    val xfFmtIds = Vector.newBuilder[Int]
    var inCellXfs = false
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "numFmt" =>
          val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
          val code = Option(r.getAttributeValue(null, "formatCode")).getOrElse("")
          id.foreach(i => if (isDateFormatCode(code)) customDateFmts += i)
        case "cellXfs" => inCellXfs = true
        case "xf" if inCellXfs =>
          xfFmtIds += Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt).getOrElse(0)
        case _ =>
      }
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
        inCellXfs = false
      case _ =>
    }
    r.close()
    xfFmtIds.result().zipWithIndex.collect {
      case (fmt, idx) if isBuiltinDateFormat(fmt) || customDateFmts(fmt) => idx
    }.toSet
  }

  /** Column index from an A1-style cell ref ("BC23" → 54). */
  def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // Excel serials are wall-clock values with no timezone; this engine
  // pins spark.sql.session.timeZone=UTC (GraftSession/Verify/Bench),
  // under which instant-based conversion renders the same wall-clock.
  // A non-UTC session would shift displays by its offset.
  private def serialToTimestamp(serial: Double): java.sql.Timestamp =
    new java.sql.Timestamp(ExcelEpochMs + math.round(serial * DayMs))

  /** Stream the worksheet's rows as arrays of raw cells (null = empty).
    * `width` pads/truncates every row to a fixed column count.
    */
  def rows(parts: XlsxParts, width: Int = -1): Iterator[Array[Cell]] = {
    val r = newReader(new java.io.ByteArrayInputStream(parts.sheetXml))
    val out = mutable.ArrayBuffer.empty[Array[Cell]]
    var row: mutable.ArrayBuffer[Cell] = null
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var inIs = false
    val text = new StringBuilder

    def endCell(): Unit = {
      if (cellCol >= 0) {
        while (row.size < cellCol) row += null
        val raw = text.toString
        val v: Cell = cellType match {
          case _ if raw.isEmpty && cellType != "inlineStr" && cellType != "str" => null
          case "s" =>
            val i = raw.trim.toInt
            if (i >= 0 && i < parts.sharedStrings.length) parts.sharedStrings(i) else null
          case "str" => raw
          case "inlineStr" => raw
          case "b" => raw.trim == "1"
          case "e" => null // formula error cell (#DIV/0! etc.) → SQL null
          case _ => // numeric (or date-styled numeric)
            try {
              if (parts.dateStyles(cellStyle)) serialToTimestamp(raw.toDouble)
              else raw.toDouble
            } catch { case _: NumberFormatException => null }
        }
        row += v
      }
      cellCol = -1; cellType = ""; cellStyle = -1; text.clear()
    }

    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row = mutable.ArrayBuffer.empty[Cell]
        case "c" =>
          cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
            .getOrElse(row.size)
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
          cellStyle = Option(r.getAttributeValue(null, "s")).map(_.toInt).getOrElse(-1)
          text.clear()
        case "v" => inV = true
        case "is" => inIs = true
        case "t" if inIs => // text collected via CHARACTERS
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV || inIs => text.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "c" => endCell()
        case "v" => inV = false
        case "is" => inIs = false
        case "row" =>
          if (width >= 0) {
            while (row.size < width) row += null
            out += row.take(width).toArray
          } else out += row.toArray
          row = null
        case _ =>
      }
      case _ =>
    }
    r.close()
    out.iterator
  }
}

/** The decoded parts of one workbook needed to read one sheet. */
case class XlsxParts(
    sheetNames: Vector[String],
    sharedStrings: Vector[String],
    dateStyles: Set[Int],
    sheetXml: Array[Byte])
