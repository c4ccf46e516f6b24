package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Dedup, TextFunctions}
import graft.operators.Combinators
import graft.sources.excel.XlsxWriter

/** Edges the oracle gate never hits: empty inputs, single-source
  * combinators, header-only workbooks, no-header reads, degenerate text.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("pivotStack with a single source still prepends provenance") {
    val a = Seq(("k", 1L)).toDF("x", "n")
    val out = Combinators.pivotStack(Seq("only" -> a))
    assert(out.columns.toSeq == Seq("index", "x", "n"))
    assert(out.collect() === Array(Row("only", "k", 1L)))
  }

  test("positionalConcat with three ragged parts") {
    val a = Seq("a1", "a2", "a3").toDF("v")
    val b = Seq("b1").toDF("v")
    val c = Seq("c1", "c2").toDF("v")
    val out = Combinators.positionalConcat(Seq(
      ("a", a, Seq(col("v"))), ("b", b, Seq(col("v"))), ("c", c, Seq(col("v")))))
    assert(out.columns.toSeq == Seq("row_id", "a_v", "b_v", "c_v"))
    val rows = out.collect()
    assert(rows.length == 3)
    assert(rows(2) == Row(3, "a3", null, null))
  }

  test("combinators on empty dataframes") {
    val empty = spark.emptyDataFrame.withColumn("x", lit("a")).filter(lit(false))
    assert(Combinators.prefixColumns(empty, "p").columns.toSeq == Seq("p_x"))
    val stacked = Combinators.pivotStack(Seq("e" -> empty))
    assert(stacked.count() == 0)
    assert(stacked.columns.toSeq == Seq("index", "x"))
  }

  test("header-only xlsx round trips as an empty typed frame") {
    val df = Seq((1L, "a")).toDF("k", "v").filter(lit(false))
    val dir = java.nio.file.Files.createTempDirectory("edge-xlsx").toString
    XlsxWriter.write(s"$dir/empty.xlsx", Seq("Sheet1" -> df))
    val back = spark.read.format("excel").load(s"$dir/empty.xlsx")
    assert(back.columns.toSeq == Seq("k", "v"))
    assert(back.count() == 0)
    // with no data to sample, inference degrades to string — documented
    assert(back.schema.fields.forall(_.dataType == StringType))
  }

  test("header=false reads the first row as data with generated names") {
    val df = Seq(("x", "1"), ("y", "2")).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("edge-xlsx2").toString
    XlsxWriter.write(s"$dir/nh.xlsx", Seq("Sheet1" -> df))
    val back = spark.read.format("excel")
      .option("header", "false").load(s"$dir/nh.xlsx")
    assert(back.columns.toSeq == Seq("_c0", "_c1"))
    assert(back.count() == 3) // header row counts as data
  }

  test("dedup primitives on empty and degenerate text") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.shingleRows(empty, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.jaccardPairs(
      Dedup.shingleRows(empty, col("doc_id"), col("text")), 0.5).count() == 0)

    // docs shorter than the shingle width produce no shingles
    val short = Seq((1L, "two words"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.shingleRows(short, col("doc_id"), col("text")).count() == 0)

    val lang = short.select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(lang.forall(_ == "und"))
  }

  test("duplicate column names across concat parts stay distinct via prefixes") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, "y")).toDF("id", "v")
    val out = Combinators.positionalConcat(Seq(
      ("s1", a, Seq(col("id"))), ("s2", b, Seq(col("id")))))
    assert(out.columns.toSet ==
      Set("row_id", "s1_id", "s1_v", "s2_id", "s2_v"))
  }
}
