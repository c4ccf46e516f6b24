package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Markup stripping ([[TextFunctions.stripMarkup]]): the cleaning
  * rules on planted fixtures — block elements die with their
  * contents, prose math survives the letter-anchored tag regex,
  * entity decode is single-pass with `&amp;` last. The t30 gate
  * hash-checks the chain against DuckDB's identical regexes.
  */
class StripMarkupSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.stripMarkup(col("t")))
      .head().getString(0)

  test("script/style/comment blocks are removed WITH their contents") {
    assert(clean("<script>var x = 1 < 2;</script>keep") == "keep")
    assert(clean("<style>p{}</style>keep<!-- no -->") == "keep")
    assert(clean("<SCRIPT SRC=\"x\">a</SCRIPT>b") == "b",
      "case-insensitive, attributes allowed")
    assert(clean("<scripty>not a script</scripty>x") == "not a script x",
      "\\b: <scripty> is an ordinary tag, not a script block")
  }

  test("tags need a letter/slash/bang anchor — prose math survives") {
    assert(clean("a < b and c > d") == "a < b and c > d")
    assert(clean("<p>x</p> <BR/> <!doctype html>y") == "x y")
  }

  test("entities decode once, &amp; last") {
    assert(clean("a &lt; b &amp; c &quot;q&quot;") == "a < b & c \"q\"")
    assert(clean("&amp;lt;") == "&lt;", "no double decode")
    assert(clean("x&nbsp;&#39;y&apos;") == "x 'y'")
  }

  test("whitespace collapses; markup-free text is a trim no-op") {
    assert(clean("  a\t\tb\n\nc  ") == "a b c")
    assert(clean("already clean words") == "already clean words")
  }
}
