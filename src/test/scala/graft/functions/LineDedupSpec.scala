package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-document line dedup (`Dedup.dedupLines`): each distinct line
  * survives only at its first corpus occurrence (min doc id, then min
  * position); `maxLineDocFreq` drops true boilerplate entirely. The d18
  * gate proves the operator against the DuckDB oracle on real data;
  * here we pin the semantics on a corpus with known line structure and
  * the skew-safe plan shape.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "alpha\nshared line\nbeta"),
    (2L, "shared line\ngamma"),
    (3L, "delta\ndelta\nepsilon"), // same-doc repeat
    (4L, "shared line")            // nothing else — empties out
  ).toDF("doc_id", "text")

  private def result(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("each line survives only at its first corpus occurrence") {
    val out = result(Dedup.dedupLines(corpus, col("doc_id"), col("text")))
    assert(out(1L) == "alpha\nshared line\nbeta")
    assert(out(2L) == "gamma", "doc 2 loses the line doc 1 already has")
    assert(out(3L) == "delta\nepsilon", "same-doc repeat keeps first only")
    assert(out(4L) == "", "a fully-duplicated doc keeps its row, empty")
    assert(out.size == 4, "one output row per input row")
  }

  test("maxLineDocFreq drops boilerplate lines everywhere, with accounting") {
    val out = result(Dedup.dedupLines(corpus, col("doc_id"), col("text"),
      maxLineDocFreq = 2))
    // "shared line" is in 3 docs > cap — gone even from doc 1
    assert(out(1L) == "alpha\nbeta")
    assert(out(2L) == "gamma")
    val hot = Dedup.hotLines(corpus, col("doc_id"), col("text"),
        maxLineDocFreq = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hot == Seq(("shared line", 3L)))
  }

  test("custom separator segments on the given string, not a regex") {
    val df = Seq((1L, "a|b"), (2L, "a|c")).toDF("doc_id", "text")
    val out = result(Dedup.dedupLines(df, col("doc_id"), col("text"), sep = "|"))
    assert(out(1L) == "a|b" && out(2L) == "c")
  }

  test("plan shape: aggregates, not a window sort over the line hash") {
    val plan = Dedup.dedupLines(corpus, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // keep-first must be the partial-aggregatable min, never a
    // row_number window (whose sort would concentrate a boilerplate
    // line's 10^9 occurrences in one partition)
    assert(!plan.contains("Window"), s"no window over the hash:\n$plan")
  }
}
