package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.excel.XlsxWriter

/** Excel reader/writer round-trip: write with XlsxWriter, read back with
  * the `excel` DataSource V2 — covering the type-inference matrix
  * (FIXTURES.md §3 `typed.xlsx`), multi-sheet workbooks, blank cells,
  * and pandas-parity string-typed dates (SURVEY.md §1.2).
  */
class ExcelRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory("excel-spec").toString
    s"$d/$name"
  }

  test("typed round trip: long / double / string / blanks / mixed") {
    val df = Seq(
      (1L, 1.5, "alpha", Some("x"), "2013-08-30"),
      (2L, -2.25, "beta", None, "09/03/2013"),
      (3L, 3.0, "gamma, with comma", Some("z"), "not a date")
    ).toDF("id", "score", "name", "opt", "datestr")
    val path = tmp("typed.xlsx")
    XlsxWriter.write(path, Seq("Sheet1" -> df))

    val back = spark.read.format("excel").option("sheet", "Sheet1").load(path)
    assert(back.schema == StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("opt", StringType, nullable = true),
      // dates must stay strings (pandas parity, SURVEY.md §1.2)
      StructField("datestr", StringType, nullable = true))))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0) == Row(1L, 1.5, "alpha", "x", "2013-08-30"))
    assert(rows(1) == Row(2L, -2.25, "beta", null, "09/03/2013"))
    assert(rows(2) == Row(3L, 3.0, "gamma, with comma", "z", "not a date"))
  }

  test("mixed numeric+string column degrades to string") {
    val df = Seq(("1", "a"), ("2.5", "b"), ("three", "c")).toDF("mixed", "tag")
    val path = tmp("mixed.xlsx")
    XlsxWriter.write(path, Seq("Sheet1" -> df))
    val back = spark.read.format("excel").load(path)
    assert(back.schema("mixed").dataType == StringType)
    assert(back.select("mixed").as[String].collect().sorted
      === Array("1", "2.5", "three"))
  }

  test("multi-sheet workbook reads each sheet by name") {
    val a = Seq((1L, "one")).toDF("k", "v")
    val b = Seq((9.5, true)).toDF("x", "flag")
    val path = tmp("multisheet.xlsx")
    XlsxWriter.write(path, Seq("First" -> a, "Second" -> b))

    val backA = spark.read.format("excel").option("sheet", "First").load(path)
    val backB = spark.read.format("excel").option("sheet", "Second").load(path)
    assert(backA.columns.toSeq == Seq("k", "v"))
    assert(backA.collect() === Array(Row(1L, "one")))
    assert(backB.columns.toSeq == Seq("x", "flag"))
    // booleans are written as cells t="b"; inference keeps them strings
    // (pandas-parity: no bool column appears in the reference data)
    assert(backB.collect() === Array(Row(9.5, "true")))

    // default sheet = first in workbook order
    assert(spark.read.format("excel").load(path).columns.toSeq == Seq("k", "v"))
  }

  test("missing sheet errors clearly") {
    val path = tmp("one.xlsx")
    XlsxWriter.write(path, Seq("Sheet1" -> Seq((1L, "x")).toDF("a", "b")))
    val e = intercept[Exception] {
      spark.read.format("excel").option("sheet", "Nope").load(path).collect()
    }
    assert(e.getMessage.contains("Nope"))
  }

  test("special characters and identifier-quoting survive round trip") {
    // FIXTURES.md §1: `consumer_disputed?` — ? in a column name
    val df = Seq(("Yes", "a&b <c>", 511074L))
      .toDF("consumer_disputed?", "escaped", "complaint_id")
    val path = tmp("quoting.xlsx")
    XlsxWriter.write(path, Seq("Sheet1" -> df))
    val back = spark.read.format("excel").load(path)
    assert(back.columns.toSeq ==
      Seq("consumer_disputed?", "escaped", "complaint_id"))
    assert(back.collect() === Array(Row("Yes", "a&b <c>", 511074L)))
  }

  test("column pruning pushes into the scan") {
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("k", "s", "d")
    val path = tmp("prune.xlsx")
    XlsxWriter.write(path, Seq("Sheet1" -> df))
    val pruned = spark.read.format("excel").load(path).select("s")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq == Seq("s"),
      s"expected pruned scan schema, got ${scan.schema}")
    assert(pruned.as[String].collect().sorted === Array("a", "b"))
  }
}
