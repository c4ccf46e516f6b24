package graft.sources.excel

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Low-level xlsx (OOXML spreadsheet) parsing on top of `java.util.zip` +
  * StAX — no POI dependency exists in this environment (SURVEY.md §7:
  * xlsx = zip+XML). Streaming parse: worksheet XML is never materialized
  * as a DOM, so memory stays O(row) regardless of sheet size.
  *
  * Supports the cell types the format uses in practice:
  * `n` (number, default), `s` (sharedStrings index), `inlineStr`
  * (what the reference's committed workbook uses — it has no
  * sharedStrings.xml part), `str` (formula result), `b` (boolean).
  */
object XlsxParser {

  /** A parsed cell value: raw text (string), numeric text, or — when the
    * cell carried a DATE number format — the serial converted to
    * `yyyy-MM-dd HH:mm:ss[.SSS]` text with `isDate = true`.
    */
  final case class Cell(col: Int, value: String, isNumeric: Boolean,
      isDate: Boolean = false)

  /** Excel's 1900-system day-0 (1899-12-30T00:00:00Z — the offset that
    * absorbs the format's historical 1900 leap-year quirk for all
    * modern serials) and the 1904-system epoch, as epoch millis.
    */
  private val Epoch1900Ms = -2209161600000L
  private val Epoch1904Ms = -2082844800000L
  private val MsPerDay = 86400000L

  /** Excel date serial → `yyyy-MM-dd HH:mm:ss[.SSS]` (UTC wall time —
    * xlsx dates are zone-less; the engine pins sessions to UTC).
    * Rounded to milliseconds: a serial double carries ~µs precision for
    * modern dates, and rounding undoes the binary-fraction noise of
    * time-of-day arithmetic.
    */
  def serialToDateTimeString(serial: Double, date1904: Boolean): String = {
    val epoch = if (date1904) Epoch1904Ms else Epoch1900Ms
    val ms = Math.round(serial * MsPerDay) + epoch
    val i = java.time.Instant.ofEpochMilli(ms)
    val dt = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
    val base = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d " +
      f"${dt.getHour}%02d:${dt.getMinute}%02d:${dt.getSecond}%02d"
    val millis = dt.getNano / 1000000
    if (millis == 0) base else f"$base.$millis%03d"
  }

  /** Inverse of [[serialToDateTimeString]]'s epoch math, for writers. */
  def millisToSerial(epochMs: Long, date1904: Boolean = false): Double = {
    val epoch = if (date1904) Epoch1904Ms else Epoch1900Ms
    (epochMs - epoch).toDouble / MsPerDay
  }

  /** Is a custom number-format code a DATE/TIME format? The openpyxl /
    * pandas heuristic: any of the date-token letters (y m d h s)
    * appearing OUTSIDE quoted literals, `[...]` sections (colors,
    * conditions — but `[h]`/`[mm]`/`[ss]` elapsed-time tokens DO count),
    * and backslash-escaped characters.
    */
  def isDateFormatCode(code: String): Boolean = {
    var i = 0
    var inQuote = false
    while (i < code.length) {
      val c = code.charAt(i)
      if (inQuote) { if (c == '"') inQuote = false; i += 1 }
      else c match {
        case '"' => inQuote = true; i += 1
        case '\\' => i += 2
        case '[' =>
          val close = code.indexOf(']', i)
          val section = if (close < 0) code.substring(i + 1)
            else code.substring(i + 1, close)
          // elapsed-time tokens like [h] [mm] [ss] are date formats
          if (section.nonEmpty &&
              section.forall(ch => "hmsHMS".indexOf(ch) >= 0)) return true
          i = if (close < 0) code.length else close + 1
        case ch if "ymdhsYMDHS".indexOf(ch) >= 0 => return true
        case _ => i += 1
      }
    }
    false
  }

  /** Style indexes (the `s=` attribute of cells) whose number format is
    * a date/time format — builtin date ids (14-22, 27-36, 45-47) or a
    * custom format code [[isDateFormatCode]] recognizes. Empty when the
    * workbook has no styles part.
    */
  def dateStyles(zip: ZipFile): Set[Int] = {
    val e = zip.getEntry("xl/styles.xml")
    if (e == null) return Set.empty
    val custom = mutable.Map.empty[Int, String] // numFmtId -> code
    val xfFmts = mutable.ArrayBuffer.empty[Int] // xf order -> numFmtId
    var inCellXfs = false
    val r = xmlReader(zip.getInputStream(e))
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            var id = -1; var code: String = null
            var i = 0
            while (i < r.getAttributeCount) {
              val ln = r.getAttributeLocalName(i)
              if (ln == "numFmtId") id = r.getAttributeValue(i).toInt
              if (ln == "formatCode") code = r.getAttributeValue(i)
              i += 1
            }
            if (id >= 0 && code != null) custom(id) = code
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            var fmt = 0
            var i = 0
            while (i < r.getAttributeCount) {
              if (r.getAttributeLocalName(i) == "numFmtId")
                fmt = r.getAttributeValue(i).toInt
              i += 1
            }
            xfFmts += fmt
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    } finally r.close()
    def isDateFmt(id: Int): Boolean =
      (id >= 14 && id <= 22) || (id >= 27 && id <= 36) ||
        (id >= 45 && id <= 47) ||
        custom.get(id).exists(isDateFormatCode)
    xfFmts.zipWithIndex.collect {
      case (fmt, idx) if isDateFmt(fmt) => idx
    }.toSet
  }

  /** The workbook's `date1904` flag (Mac-epoch serials). */
  def date1904(zip: ZipFile): Boolean = {
    val wb = zip.getEntry("xl/workbook.xml")
    if (wb == null) return false
    val r = xmlReader(zip.getInputStream(wb))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT
          && r.getLocalName == "workbookPr") {
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "date1904") {
              val v = r.getAttributeValue(i)
              return v == "1" || v.equalsIgnoreCase("true")
            }
            i += 1
          }
        }
      }
    } finally r.close()
    false
  }

  private def xmlReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    // hardening: never resolve external entities from untrusted workbooks
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** Column letters of an `r="BC42"` cell reference → 0-based index. */
  def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Sheet names in workbook order, resolved to their zip entry paths. */
  def sheetEntries(zip: ZipFile): Seq[(String, String)] = {
    // workbook.xml: sheet name -> r:id
    val wb = zip.getEntry("xl/workbook.xml")
    require(wb != null, "not an xlsx: missing xl/workbook.xml")
    val sheets = mutable.ArrayBuffer.empty[(String, String)] // (name, rid)
    val r = xmlReader(zip.getInputStream(wb))
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT
          && r.getLocalName == "sheet") {
          var name: String = null; var rid: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            val ln = r.getAttributeLocalName(i)
            if (ln == "name") name = r.getAttributeValue(i)
            if (ln == "id") rid = r.getAttributeValue(i)
            i += 1
          }
          if (name != null && rid != null) sheets += ((name, rid))
        }
      }
    } finally r.close()

    // workbook.xml.rels: r:id -> worksheet target path
    val rels = zip.getEntry("xl/_rels/workbook.xml.rels")
    val ridToTarget = mutable.Map.empty[String, String]
    if (rels != null) {
      val rr = xmlReader(zip.getInputStream(rels))
      try {
        while (rr.hasNext) {
          if (rr.next() == XMLStreamConstants.START_ELEMENT
            && rr.getLocalName == "Relationship") {
            var id: String = null; var target: String = null
            var i = 0
            while (i < rr.getAttributeCount) {
              val ln = rr.getAttributeLocalName(i)
              if (ln == "Id") id = rr.getAttributeValue(i)
              if (ln == "Target") target = rr.getAttributeValue(i)
              i += 1
            }
            if (id != null && target != null) {
              val t = if (target.startsWith("/")) target.drop(1)
                      else if (target.startsWith("xl/")) target
                      else "xl/" + target
              ridToTarget(id) = t
            }
          }
        }
      } finally rr.close()
    }
    sheets.toSeq.map { case (name, rid) =>
      name -> ridToTarget.getOrElse(rid, s"xl/worksheets/sheet1.xml")
    }
  }

  /** sharedStrings.xml → indexed string table (absent part → empty). */
  def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val out = mutable.ArrayBuffer.empty[String]
    val r = xmlReader(zip.getInputStream(e))
    val sb = new StringBuilder
    var inSi = false
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.START_ELEMENT
          if inSi && r.getLocalName == "t" =>
          sb.append(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case _ =>
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** Stream rows of one worksheet entry as sparse cell seqs.
    * Each emitted row is (rowIndex0, cells). Runs `f` per row; returns
    * the number of rows visited (streaming — no row buffer kept).
    */
  def foreachRow(zip: ZipFile, entryPath: String, shared: IndexedSeq[String],
      dateStyleIdx: Set[Int] = Set.empty, date1904Flag: Boolean = false)(
      f: (Int, Seq[Cell]) => Unit): Int = {
    val e = zip.getEntry(entryPath)
    require(e != null, s"xlsx: missing worksheet entry $entryPath")
    val r = xmlReader(zip.getInputStream(e))
    var rowIdx = -1
    var nRows = 0
    var cells = mutable.ArrayBuffer.empty[Cell]
    var cellCol = -1
    var cellType = "n"
    var cellStyle = -1
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    var autoCol = -1 // fallback when r= attribute is absent
    try {
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            rowIdx += 1; autoCol = -1
            cells = mutable.ArrayBuffer.empty[Cell]
            // honour explicit r="n" row index (1-based) for sparse rows
            var i = 0
            while (i < r.getAttributeCount) {
              if (r.getAttributeLocalName(i) == "r")
                rowIdx = r.getAttributeValue(i).toInt - 1
              i += 1
            }
          case "c" =>
            cellType = "n"; cellStyle = -1; cellCol = { autoCol += 1; autoCol }
            var i = 0
            while (i < r.getAttributeCount) {
              val ln = r.getAttributeLocalName(i)
              if (ln == "r") { cellCol = colIndex(r.getAttributeValue(i)); autoCol = cellCol }
              if (ln == "t") cellType = r.getAttributeValue(i)
              if (ln == "s") cellStyle =
                try r.getAttributeValue(i).toInt catch { case _: NumberFormatException => -1 }
              i += 1
            }
          case "v" => inV = true; text.clear()
          case "t" => inIsT = true; text.clear()
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" =>
            inV = false
            val raw = text.toString
            val cell = cellType match {
              case "s" =>
                val idx = raw.trim.toInt
                Cell(cellCol, if (idx < shared.length) shared(idx) else "",
                  isNumeric = false)
              case "b" =>
                Cell(cellCol, if (raw.trim == "1") "true" else "false",
                  isNumeric = false)
              case "str" => Cell(cellCol, raw, isNumeric = false)
              case _ =>
                // a numeric cell with a DATE number format is a date —
                // how xlsx actually stores dates (serial + style);
                // pandas converts these to datetime64 (SURVEY.md §1.2
                // row 3), so parity requires the same here
                if (dateStyleIdx.contains(cellStyle))
                  try Cell(cellCol,
                    serialToDateTimeString(raw.trim.toDouble, date1904Flag),
                    isNumeric = false, isDate = true)
                  catch { case _: NumberFormatException =>
                    Cell(cellCol, raw, isNumeric = true) }
                else Cell(cellCol, raw, isNumeric = true)
            }
            cells += cell
          case "t" =>
            inIsT = false
            if (cellType == "inlineStr")
              cells += Cell(cellCol, text.toString, isNumeric = false)
          case "row" =>
            f(rowIdx, cells.toSeq); nRows += 1
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    nRows
  }
}
