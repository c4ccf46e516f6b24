package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Span-level decontamination ([[Dedup.decontaminateSpans]]): the cut
  * geometry on planted documents — only benchmark-matching windows
  * vanish, surrounding words survive, a clean doc passes verbatim, a
  * fully-contaminated doc comes back empty (cut, not dropped). The
  * d31 gate hash-checks the full corpus rewrite against DuckDB.
  */
class DecontaminateSpansSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq("q1 alpha beta gamma delta tail").toDF("text")

  private def run(corpus: Seq[(Long, String)], k: Int = 3) =
    Dedup.decontaminateSpans(
        corpus.toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), col("text"), k)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("only matching windows are cut; surroundings survive") {
    // "alpha beta gamma" and "beta gamma delta" are bench 3-windows;
    // their union covers alpha..delta, the rest survives
    assert(run(Seq((1L, "intro alpha beta gamma delta outro")))
      == Seq((1L, "intro outro")))
  }

  test("a clean document passes through verbatim, not rebuilt") {
    assert(run(Seq((1L, "totally clean words here")))
      == Seq((1L, "totally clean words here")))
  }

  test("a fully-contaminated document is cut to '', never dropped") {
    assert(run(Seq((1L, "alpha beta gamma"))) == Seq((1L, "")))
  }

  test("overlap is positional: the same words out of order survive") {
    assert(run(Seq((1L, "gamma beta alpha")))
      == Seq((1L, "gamma beta alpha")))
  }

  test("sub-window docs and k wider than the bench windows are safe") {
    assert(run(Seq((1L, "alpha beta"))) == Seq((1L, "alpha beta")))
    // k=7 > bench doc's 6 words → bench window set is empty
    assert(run(Seq((1L, "alpha beta gamma delta tail q1 seven")), k = 7)
      == Seq((1L, "alpha beta gamma delta tail q1 seven")))
  }

  test("the shuffle-join fallback (broadcastBench = false) is identical") {
    val corpus = Seq((1L, "intro alpha beta gamma delta outro"),
      (2L, "totally clean words here"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    def run(bcast: Boolean) =
      Dedup.decontaminateSpans(corpus, bench, col("doc_id"), col("text"),
          col("text"), k = 3, broadcastBench = bcast)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(run(true) == run(false))
  }

  test("the persisted span index reproduces the live path; k rides inside") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-spanidx").toString
    Dedup.writeSpanIndex(bench, col("text"), dir, k = 3)
    val k = spark.read.parquet(s"$dir/meta").head.getInt(0)
    assert(k == 3, "window width must be stored in the artifact")
    val corpus = Seq((1L, "intro alpha beta gamma delta outro"),
      (2L, "totally clean words here")).toDF("doc_id", "text")
    val viaIndex = Dedup.decontaminateSpansWithIndex(corpus,
        col("doc_id"), col("text"), dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaIndex == Seq((1L, "intro outro"),
      (2L, "totally clean words here")))
  }
}
