package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher quality rules (`TextFunctions.gopherRules`, arXiv:2112.11446
  * A1.1): each rule trips on a purpose-built document and the clean
  * document passes. The t16 gate proves the full-ratio arithmetic
  * against the DuckDB oracle; here we pin per-rule semantics and the
  * zero-shuffle plan.
  */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val cleanBody =
    (1 to 60).map(i => s"word$i").mkString(" ") + " the rain and that"

  private def verdicts(rows: Seq[(Long, String)]): Map[Long, Row] =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.gopherRules(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap

  test("a clean document passes; each planted violation fails its rule") {
    val out = verdicts(Seq(
      (1L, cleanBody),                                   // passes all
      (2L, "too short but the and"),                     // word count
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the and"), // mean len < 3
      (4L, cleanBody + " " + (1 to 20).map(_ => "#").mkString(" ")), // symbols
      (5L, "• one\n• two\n• three\n" + cleanBody.split(" ").take(0).mkString(" ")
        + "• four"),                                     // bullets > 0.9
      (6L, cleanBody + "\nwait...\nmore...\nsoon...\nnow...\nthen..."), // ellipsis
      (7L, (1 to 60).map(_ => "123456").mkString(" ") + " the and"), // alpha < 0.8
      (8L, (1 to 60).map(i => s"word$i").mkString(" "))  // no stopwords
    ))
    def field(id: Long, f: String) = out(id).getAs[Any](f)
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("pass") &&
      out(2L).getAs[Long]("n_words") < 50)
    assert(!out(3L).getAs[Boolean]("pass") &&
      out(3L).getAs[Double]("mean_word_len") < 3.0)
    assert(!out(4L).getAs[Boolean]("pass") &&
      out(4L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(!out(5L).getAs[Boolean]("pass") &&
      out(5L).getAs[Double]("bullet_line_ratio") > 0.9)
    assert(!out(6L).getAs[Boolean]("pass") &&
      out(6L).getAs[Double]("ellipsis_line_ratio") > 0.3)
    assert(!out(7L).getAs[Boolean]("pass") &&
      out(7L).getAs[Double]("alpha_word_ratio") < 0.8)
    assert(!out(8L).getAs[Boolean]("pass") &&
      out(8L).getAs[Long]("n_stopwords") < 2)
  }

  test("the unicode ellipsis and hash both count as symbols") {
    val out = verdicts(Seq(
      (1L, cleanBody + " x… y… z… w… v… u… t… s…")))
    assert(out(1L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(!out(1L).getAs[Boolean]("pass"))
  }

  test("edge whitespace never manufactures tokens (stripWs parity)") {
    // "  text \n" must produce identical metrics to "text": a phantom
    // empty edge token would inflate n_words and deflate mean_word_len
    // / alpha_word_ratio — the divergence the tokenizer strip prevents
    val out = verdicts(Seq(
      (1L, cleanBody),
      (2L, "  \t" + cleanBody + " \n "),
      (3L, "\n" + cleanBody)))
    Seq("n_words", "mean_word_len", "alpha_word_ratio", "n_stopwords")
      .foreach { f =>
        assert(out(2L).getAs[Any](f) == out(1L).getAs[Any](f),
          s"$f diverged on edge whitespace")
        assert(out(3L).getAs[Any](f) == out(1L).getAs[Any](f),
          s"$f diverged on leading newline")
      }
    assert(out(2L).getAs[Boolean]("pass") && out(3L).getAs[Boolean]("pass"))
  }

  test("gopherRules is a zero-shuffle projection") {
    val df = Seq((1L, cleanBody)).toDF("doc_id", "text")
      .select(TextFunctions.gopherRules(col("text")).as("g"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "per-document rules must not shuffle")
  }
}
