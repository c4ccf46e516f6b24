package graft.sources.excel

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Minimal xlsx writer: one workbook, N sheets, header row, inline
  * strings — the exact profile of the reference's committed workbook
  * (it has no sharedStrings.xml part; reference query_iterator.py:197-212
  * writes one sheet per query via openpyxl the same way).
  *
  * Data is pulled with `toLocalIterator` so the driver never holds more
  * than one partition of rows; a single .xlsx is inherently a single
  * file, so a driver-side funnel is the correct (and only) topology —
  * the distributed part of the job is everything upstream of the sink.
  */
object XlsxWriter {

  private def colRef(c: Int): String = {
    var n = c + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Write `sheets` (name → DataFrame) into one workbook at `path`. */
  def write(path: String, sheets: Seq[(String, DataFrame)]): Unit = {
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    try {
      val n = sheets.length
      entry("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
        ).mkString +
        """</Types>""")
      entry("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      entry("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        """</sheets></workbook>""")
      entry("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>"""
        ).mkString +
        """</Relationships>""")

      sheets.zipWithIndex.foreach { case ((_, df), si) =>
        zos.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
        val w = new java.io.OutputStreamWriter(zos, "UTF-8")
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        val schema = df.schema
        // header row
        w.write("<row r=\"1\">")
        schema.fields.zipWithIndex.foreach { case (f, c) =>
          w.write(s"""<c r="${colRef(c)}1" t="inlineStr"><is><t>${xmlEscape(f.name)}</t></is></c>""")
        }
        w.write("</row>")
        var r = 2
        val it = df.toLocalIterator()
        while (it.hasNext) {
          val row = it.next()
          w.write(s"""<row r="$r">""")
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            if (!row.isNullAt(c)) {
              val ref = s"${colRef(c)}$r"
              f.dataType match {
                case _: NumericType =>
                  w.write(s"""<c r="$ref"><v>${row.get(c)}</v></c>""")
                case BooleanType =>
                  w.write(s"""<c r="$ref" t="b"><v>${if (row.getBoolean(c)) 1 else 0}</v></c>""")
                case _ =>
                  w.write(s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(String.valueOf(row.get(c)))}</t></is></c>""")
              }
            }
          }
          w.write("</row>")
          r += 1
        }
        w.write("</sheetData></worksheet>")
        w.flush()
        zos.closeEntry()
      }
    } finally zos.close()
  }
}
