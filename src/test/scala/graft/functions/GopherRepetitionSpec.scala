package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher repetition rules (`TextFunctions.gopherRepetition`,
  * arXiv:2112.11446 A1.1 Table A1): duplicate-line and repeated-n-gram
  * character-mass thresholds. The t18 gate proves the full arithmetic
  * against a relational DuckDB mirror; here we pin per-rule semantics
  * and the zero-shuffle plan.
  */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): Row =
    TextFunctions.gopherRepetition(
        Seq((1L, text)).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().head

  private def f(r: Row, name: String): Double =
    r.getAs[Double](name)

  test("a diverse document passes; duplicated lines trip the line rules") {
    val distinct = (1 to 40).map(i => s"tok$i").mkString(" ")
    val clean = run(distinct)
    assert(clean.getAs[Boolean]("pass"), clean.toString)
    assert(f(clean, "dup_line_frac") == 0.0)

    val line = "some repeated navigation header line"
    val dup = run(Seq(line, distinct, line, line).mkString("\n"))
    assert(f(dup, "dup_line_frac") == 0.5, "2 repeats of 4 lines")
    assert(f(dup, "dup_line_char_frac") > 0.2)
    assert(!dup.getAs[Boolean]("pass"))
  }

  test("a flooded bigram trips the top-2-gram mass rule") {
    val flood = Seq.fill(12)("buy now").mkString(" ") + " " +
      (1 to 10).map(i => s"w$i").mkString(" ")
    val r = run(flood)
    assert(f(r, "top_2gram_char_frac") > 0.20, r.toString)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("one duplicated 5-gram counts its repeat occurrences' characters") {
    val mid = (1 to 20).map(i => s"filler$i").mkString(" ")
    val text = s"a b c d e $mid a b c d e"
    val r = run(text)
    // repeat mass of the second "a b c d e" (9 chars) over doc chars —
    // plus the overlapping duplicated 5-grams that straddle nothing
    // here (the filler is unique), so exactly one repeated 5-gram
    assert(f(r, "dup_5gram_char_frac") == 9.0 / text.length, r.toString)
    assert(f(r, "dup_10gram_char_frac") == 0.0)
  }

  test("empty text scores zero everywhere and passes") {
    val r = run("")
    assert(r.getAs[Boolean]("pass"))
    assert(f(r, "dup_line_frac") == 0.0 && f(r, "dup_5gram_char_frac") == 0.0)
  }

  test("gopherRepetition is a zero-shuffle projection") {
    val plan = TextFunctions.gopherRepetition(
        Seq((1L, "a b c")).toDF("doc_id", "text"), col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"per-document folds must not shuffle:\n$plan")
  }
}
