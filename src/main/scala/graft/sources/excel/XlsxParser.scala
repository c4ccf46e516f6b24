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

  /** A parsed cell value: either raw text (string) or numeric text. */
  final case class Cell(col: Int, value: String, isNumeric: Boolean)

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
  def foreachRow(zip: ZipFile, entryPath: String, shared: IndexedSeq[String])(
      f: (Int, Seq[Cell]) => Unit): Int = {
    val e = zip.getEntry(entryPath)
    require(e != null, s"xlsx: missing worksheet entry $entryPath")
    val r = xmlReader(zip.getInputStream(e))
    var rowIdx = -1
    var nRows = 0
    var cells = mutable.ArrayBuffer.empty[Cell]
    var cellCol = -1
    var cellType = "n"
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
            cellType = "n"; cellCol = { autoCol += 1; autoCol }
            var i = 0
            while (i < r.getAttributeCount) {
              val ln = r.getAttributeLocalName(i)
              if (ln == "r") { cellCol = colIndex(r.getAttributeValue(i)); autoCol = cellCol }
              if (ln == "t") cellType = r.getAttributeValue(i)
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
              case _     => Cell(cellCol, raw, isNumeric = true)
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
