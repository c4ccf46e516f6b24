package graft.sources.excel

import java.util.zip.ZipFile
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("excel")` — a DataSource V2 Excel source.
  *
  * Replaces the reference's pandas `read_excel` (reference fsheet.py:33-36)
  * with a distributed scan: one input partition per (file, sheet), so a
  * directory of workbooks reads in parallel across executors. Column
  * pruning is pushed into the reader (pruned columns are parsed but not
  * converted/emitted; the XML itself must be streamed regardless — xlsx
  * is not a splittable columnar format, which is exactly why the pipeline
  * converts to parquet/views before heavy queries).
  *
  * Options:
  *   - `path`  (or `.load(path)`): one workbook
  *   - `sheet`: sheet name (default: first sheet)
  *   - `header`: first row is column names (default true)
  *   - `inferSchema`: numeric-vs-string per-column inference mirroring
  *     pandas' behavior on the reference data (default true; SURVEY.md
  *     §1.2: integers → long, decimals → double, everything else —
  *     including dates — stays string)
  *   - `sampleRows`: rows to sample for inference (default 1000)
  */
class ExcelDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "excel"

  override def supportsExternalMetadata(): Boolean = true

  private def opt(m: CaseInsensitiveStringMap, k: String, d: String) =
    Option(m.get(k)).getOrElse(d)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("excel: 'path' option required"))
    val sheet = Option(options.get("sheet"))
    val header = opt(options, "header", "true").toBoolean
    val infer = opt(options, "inferSchema", "true").toBoolean
    val sample = opt(options, "sampleRows", "1000").toInt
    // schema from the first matching workbook (files in one load share a
    // schema by contract, as with Spark's built-in file sources)
    ExcelSchema.infer(ExcelSchema.resolvePaths(path).head, sheet, header,
      infer, sample)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new ExcelTable(schema, properties.asScala.toMap)
}

private[excel] object ExcelSchema {

  /** Expand a path option to concrete workbook files: a single file, a
    * directory (all .xlsx/.xls inside, sorted), or a glob in the last
    * path segment. Each file becomes its own input partition, so a
    * directory of workbooks scans in parallel across executors.
    */
  def resolvePaths(path: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(path)
    def excel(f: java.nio.file.Path) = {
      val n = f.getFileName.toString
      n.endsWith(".xlsx") || n.endsWith(".xls")
    }
    val out =
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.filter(excel).map(_.toString).toSeq.sorted
      else if (path.contains("*")) {
        val dir = Option(p.getParent).getOrElse(Paths.get("."))
        val matcher = dir.getFileSystem.getPathMatcher(
          "glob:" + p.getFileName.toString)
        Files.list(dir).iterator().asScala
          .filter(f => matcher.matches(f.getFileName))
          .map(_.toString).toSeq.sorted
      } else Seq(path)
    require(out.nonEmpty, s"excel: no workbooks match '$path'")
    out
  }

  private val IntRe = "[+-]?\\d{1,19}".r
  private val NumRe = "[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?".r

  /** Integral iff the text is a base-10 integer that fits a Long —
    * 19-digit values are checked by an exact parse (Long.MaxValue is 19
    * digits, so a regex length cap alone either rejects valid ids or
    * admits overflows).
    */
  def isIntegral(s: String): Boolean = {
    val t = s.trim
    IntRe.matches(t) &&
      (t.length < 19 + (if (t.startsWith("-") || t.startsWith("+")) 1 else 0) ||
        scala.util.Try(t.toLong).isSuccess)
  }
  def isNumeric(s: String): Boolean = NumRe.matches(s.trim)

  /** Header names + per-column type from a bounded sample of the sheet.
    * Mirrors pandas inference as characterized in SURVEY.md §1.2: a
    * column whose non-empty sampled cells are all numeric-typed cells
    * becomes long (all integral) or double; anything else is string.
    */
  /** Iterate a sheet's rows regardless of container format: BIFF8 via
    * [[XlsParser]] for `.xls`, zip/XML via [[XlsxParser]] for `.xlsx`.
    */
  def foreachSheetRow(path: String, sheetOpt: Option[String])(
      f: (Int, Seq[XlsxParser.Cell]) => Unit): Unit =
    if (XlsParser.isXls(path)) {
      XlsParser.foreachRow(path, sheetOpt)(f)
    } else {
      val zip = new ZipFile(path)
      try {
        val entries = XlsxParser.sheetEntries(zip)
        val entry = sheetOpt match {
          case Some(s) => entries.find(_._1 == s).map(_._2).getOrElse(
            throw new IllegalArgumentException(
              s"excel: sheet '$s' not found in $path; has: ${entries.map(_._1).mkString(", ")}"))
          case None => entries.head._2
        }
        val shared = XlsxParser.sharedStrings(zip)
        // date-styled numeric cells surface as timestamps (pandas
        // parity; .xls legacy files keep serials numeric — documented)
        XlsxParser.foreachRow(zip, entry, shared,
          XlsxParser.dateStyles(zip), XlsxParser.date1904(zip))(f)
      } finally zip.close()
    }

  def infer(path: String, sheetOpt: Option[String], header: Boolean,
      inferTypes: Boolean, sampleRows: Int): StructType = {
    {
      var names: IndexedSeq[String] = IndexedSeq.empty
      val seenNumeric = mutable.ArrayBuffer.empty[Boolean] // all numeric so far
      val seenIntegral = mutable.ArrayBuffer.empty[Boolean]
      val seenDate = mutable.ArrayBuffer.empty[Boolean]    // all date-styled
      val seenAny = mutable.ArrayBuffer.empty[Boolean]
      var width = 0
      var visited = 0
      // bounded streaming scan; throws to abort early once sample is met
      object Done extends RuntimeException
      try {
        foreachSheetRow(path, sheetOpt) { (rowIdx, cells) =>
          if (rowIdx == 0 && header) {
            val w = if (cells.isEmpty) 0 else cells.map(_.col).max + 1
            val arr = Array.fill(w)("")
            cells.foreach(c => if (c.col < w) arr(c.col) = c.value)
            names = arr.toIndexedSeq.zipWithIndex.map { case (n, i) =>
              if (n.nonEmpty) n else s"_c$i"
            }
            width = w
          } else {
            val w = if (cells.isEmpty) 0 else cells.map(_.col).max + 1
            if (w > width) width = w
            while (seenNumeric.length < width) {
              seenNumeric += true; seenIntegral += true
              seenDate += true; seenAny += false
            }
            cells.foreach { c =>
              if (c.value.nonEmpty && c.col < seenNumeric.length) {
                seenAny(c.col) = true
                if (!(c.isNumeric || isNumeric(c.value)))
                  seenNumeric(c.col) = false
                if (!isIntegral(c.value)) seenIntegral(c.col) = false
                if (!c.isDate) seenDate(c.col) = false
              }
            }
            visited += 1
            if (visited >= sampleRows) throw Done
          }
        }
      } catch { case Done => }
      while (names.length < width) names = names :+ s"_c${names.length}"
      val fields = names.zipWithIndex.map { case (n, i) =>
        val dt: DataType =
          if (!inferTypes) StringType
          else if (i < seenAny.length && seenAny(i) && seenDate(i))
            TimestampType // all-date-styled column: pandas datetime64 parity
          else if (i < seenAny.length && seenAny(i) && seenNumeric(i))
            if (seenIntegral(i)) LongType else DoubleType
          else StringType
        StructField(n, dt, nullable = true)
      }
      StructType(fields)
    }
  }
}

private[excel] class ExcelTable(schema0: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"excel:${props.getOrElse("path", "?")}#${props.getOrElse("sheet", "<first>")}"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ExcelScanBuilder(schema0, options)
}

private[excel] class ExcelScanBuilder(
    fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ExcelScan(fullSchema, required,
    options.get("path"),
    Option(options.get("sheet")),
    Option(options.get("header")).forall(_.toBoolean))
}

private[excel] class ExcelScan(
    fullSchema: StructType, required: StructType,
    path: String, sheet: Option[String], header: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ExcelSchema.resolvePaths(path)
      .map(p => ExcelInputPartition(p, sheet, header): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ExcelPartitionReaderFactory(fullSchema, required)
}

private[excel] case class ExcelInputPartition(
    path: String, sheet: Option[String], header: Boolean)
    extends InputPartition

private[excel] class ExcelPartitionReaderFactory(
    fullSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ep = p.asInstanceOf[ExcelInputPartition]
    new ExcelPartitionReader(ep, fullSchema, required)
  }
}

/** Materializes one sheet's rows as InternalRows. The worksheet XML is
  * parsed up front into a row buffer for the partition (bounded by sheet
  * size — xlsx sheets cap at ~1M rows; true big data enters through
  * parquet, this source is the ingest edge).
  */
private[excel] class ExcelPartitionReader(
    part: ExcelInputPartition, fullSchema: StructType, required: StructType)
    extends PartitionReader[InternalRow] {

  private val fieldIdx: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))
  private val rows: Iterator[InternalRow] = readAll()
  private var current: InternalRow = _

  private def readAll(): Iterator[InternalRow] = {
    {
      val buf = mutable.ArrayBuffer.empty[InternalRow]
      val width = fullSchema.length
      ExcelSchema.foreachSheetRow(part.path, part.sheet) { (rowIdx, cells) =>
        if (!(part.header && rowIdx == 0)) {
          val full = Array.fill[String](width)(null)
          cells.foreach(c => if (c.col < width && c.value.nonEmpty)
            full(c.col) = c.value)
          val vals = new Array[Any](fieldIdx.length)
          var i = 0
          while (i < fieldIdx.length) {
            val raw = full(fieldIdx(i))
            vals(i) =
              if (raw == null) null
              else required.fields(i).dataType match {
                case LongType =>
                  // exact integer parse first: toDouble.toLong silently
                  // corrupts integers above 2^53, and XlsxWriter emits
                  // longs as exact text, so round-trips must be lossless.
                  // The double path remains for decimal/exponent forms
                  // ("3.0", "1e4") that schema inference typed integral.
                  try java.lang.Long.valueOf(raw.trim.toLong)
                  catch { case _: NumberFormatException =>
                    try java.lang.Long.valueOf(raw.trim.toDouble.toLong)
                    catch { case _: NumberFormatException => null }
                  }
                case DoubleType =>
                  try java.lang.Double.valueOf(raw.trim.toDouble)
                  catch { case _: NumberFormatException => null }
                case BooleanType =>
                  java.lang.Boolean.valueOf(raw.trim == "true" || raw.trim == "1")
                case TimestampType =>
                  // `yyyy-MM-dd HH:mm:ss[.SSS]` (UTC wall time from the
                  // serial conversion) → micros since epoch
                  try {
                    val t = raw.trim.replace(' ', 'T')
                    val ldt = java.time.LocalDateTime.parse(t)
                    val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
                    java.lang.Long.valueOf(
                      inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
                  } catch { case _: java.time.format.DateTimeParseException => null }
                case _ => UTF8String.fromString(raw)
              }
            i += 1
          }
          buf += InternalRow.fromSeq(vals.toIndexedSeq)
        }
      }
      buf.iterator
    }
  }

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
