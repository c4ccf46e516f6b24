package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4 cleaning filter (`TextFunctions.c4Filters`, arXiv:1910.10683
  * §2.2): line-level terminal-punctuation / min-words / javascript
  * rules, page-level lorem-ipsum / brace / min-lines rules. The t17
  * gate proves the arithmetic against the DuckDB oracle; here we pin
  * per-rule semantics and the zero-shuffle plan.
  */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): Row =
    Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.c4Filters(col("text")).as("c"))
      .collect().head.getStruct(0)

  test("keeps only punctuated, long-enough, javascript-free lines") {
    val out = run(Seq(
      "this line ends with a period.",      // kept
      "this line has no terminal mark",     // dropped: punctuation
      "too short.",                         // dropped: < 5 words
      "enable javascript tracking right now.", // dropped: javascript
      "is this a proper question?",         // kept
      "what an exciting exclamation line!"  // kept
    ).mkString("\n"))
    assert(out.getAs[String]("text") == Seq(
      "this line ends with a period.",
      "is this a proper question?",
      "what an exciting exclamation line!").mkString("\n"))
    assert(out.getAs[Long]("n_kept_lines") == 3L)
    assert(out.getAs[Boolean]("pass"))
  }

  test("page-level drops: lorem ipsum, braces, too few surviving lines") {
    val good = "a perfectly fine content line here."
    val lorem = run(s"$good\n$good\n$good\nsome Lorem Ipsum filler text here.")
    assert(lorem.getAs[Boolean]("has_lorem_ipsum") && !lorem.getAs[Boolean]("pass"))
    val brace = run(s"$good\n$good\n$good\nvar config = { beta }")
    assert(brace.getAs[Boolean]("has_brace") && !brace.getAs[Boolean]("pass"))
    val thin = run(s"$good\n$good")
    assert(thin.getAs[Long]("n_kept_lines") == 2L && !thin.getAs[Boolean]("pass"))
  }

  test("quote-terminated lines count as sentence ends; empty text is empty") {
    val q = run("he said this is a quote line.\"\nmore plain words here with no mark")
    assert(q.getAs[Long]("n_kept_lines") == 1L)
    val e = run("")
    assert(e.getAs[String]("text") == "" && e.getAs[Long]("n_kept_lines") == 0L)
  }

  test("c4Filters is a zero-shuffle projection") {
    val df = Seq(Tuple1("x.")).toDF("text")
      .select(TextFunctions.c4Filters(col("text")).as("c"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
