package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.sources.excel.XlsxWriter

/** CSV → Excel side utility with a row cap — reference scratch.py:5-18
  * (A2 CSV scan + A3 limit + A15 Excel sink).
  */
object CsvToExcel {
  def convert(spark: SparkSession, csvPath: String, outPath: String,
      sheetName: String = "Sheet1", maxRows: Int = 1000): Unit = {
    val df = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(csvPath)
      .limit(maxRows)
    XlsxWriter.write(outPath, Seq(sheetName -> df))
  }
}
