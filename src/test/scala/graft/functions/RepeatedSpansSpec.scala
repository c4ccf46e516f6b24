package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exact-substring span removal (`Dedup.removeRepeatedSpans`,
  * arXiv:2107.06499 §4.1 adapted to word windows): any k-word window
  * occurring more than once in the corpus keeps only its first
  * occurrence; every later occurrence's span is removed. The d23 gate
  * proves the operator against the DuckDB oracle on real data; here we
  * pin the semantics on corpora with known duplication structure and
  * the skew-safe plan shape.
  */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int): Map[Long, String] =
    Dedup.removeRepeatedSpans(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("a copied k-word passage survives only in its first carrier") {
    val passage = "one two three four"
    val out = run(Seq(
      (1L, s"intro $passage outro"),
      (2L, s"different opening here $passage and a different close"),
      (3L, "entirely unrelated words nowhere repeated at all")
    ), k = 4)
    assert(out(1L) == s"intro $passage outro", "first carrier unchanged")
    assert(out(2L) == "different opening here and a different close",
      "later carrier loses exactly the copied span")
    assert(out(3L) == "entirely unrelated words nowhere repeated at all")
  }

  test("within-document repeats keep the first occurrence only") {
    val out = run(Seq(
      (1L, "a b c d x y z a b c d")
    ), k = 4)
    assert(out(1L) == "a b c d x y z")
  }

  test("overlapping duplicated windows merge into one removed span") {
    // the shared run is 6 words at k=4 — three overlapping duplicated
    // windows in doc 2 whose coverage must union, not stack
    val run6 = "p q r s t u"
    val out = run(Seq(
      (1L, s"first $run6 tail"),
      (2L, s"second $run6 ending")
    ), k = 4)
    assert(out(1L) == s"first $run6 tail")
    assert(out(2L) == "second ending")
  }

  test("documents shorter than k words pass through; empty stays empty") {
    val out = run(Seq(
      (1L, "too short"),
      (2L, "too short"), // duplicated, but no k-window exists
      (3L, "")
    ), k = 4)
    assert(out(1L) == "too short")
    assert(out(2L) == "too short")
    assert(out(3L) == "")
  }

  test("a fully-duplicated later document empties out") {
    val body = "m n o p q r"
    val out = run(Seq((1L, body), (2L, body)), k = 4)
    assert(out(1L) == body)
    assert(out(2L) == "")
  }

  test("repeatedSpanStats accounts for exactly the removed positions") {
    import spark.implicits._
    val passage = "one two three four"
    val docs = Seq(
      (1L, s"intro $passage outro"),
      (2L, s"different opening here $passage and a different close"),
      (3L, "entirely unrelated words nowhere repeated at all"))
    val stats = Dedup.repeatedSpanStats(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(1L) == (6L, 0L), "first carrier loses nothing")
    assert(stats(2L) == (11L, 4L), "later carrier loses the 4-word span")
    assert(stats(3L) == (7L, 0L))
    // consistency with the remover: n_words - n_removed = surviving words
    val out = run(docs, 4)
    stats.foreach { case (id, (n, rem)) =>
      val surviving = out(id).split(" ").count(_.nonEmpty)
      assert(surviving == n - rem, s"doc $id: $surviving != $n - $rem")
    }
  }

  test("duplicate detection aggregates partially — no window sort over the corpus") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val plan = Dedup.removeRepeatedSpans(df, col("doc_id"), col("text"), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial min")
        || plan.contains("HashAggregate"),
      s"expected partial-aggregatable duplicate detection, got:\n$plan")
    assert(!plan.contains("RunningWindowFunction"),
      "no window sort in the duplicate-detection stage")
  }

  // ---- incremental form (d33) ------------------------------------------

  import org.apache.spark.sql.functions.col
  import spark.implicits._

  private def incRun(rows: Seq[(Long, String)], path: String,
      broadcastIndex: Boolean = false): Map[Long, String] =
    Dedup.removeRepeatedSpansIncremental(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), path, broadcastIndex)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private val passage = "one two three four five six seven eight"

  test("incremental == batch over the union, restricted to the increment " +
      "(in-order ids); append chains a second epoch") {
    val archive = Seq(
      (1L, s"alpha start $passage omega end"),
      (2L, "an unrelated archived document body here"))
    val inc1 = Seq(
      (10L, s"carrier of $passage again"),                 // archive-owned
      (11L, "fresh rare tokens qux zz yy xx ww vv uu tt"), // first of a pair
      (12L, "prefix fresh rare tokens qux zz yy xx ww vv uu tt suffix"))
    val inc2 = Seq(
      (20L, s"late copy $passage resurfaces"),             // still archive-owned
      (21L, "fresh rare tokens qux zz yy xx ww vv uu tt")) // owned by epoch 1
    val path = java.nio.file.Files
      .createTempDirectory("graft-spaninc").toString
    Dedup.writeCorpusSpanIndex(archive.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, k = 8)
    val got1 = incRun(inc1, path)
    Dedup.appendCorpusSpanIndex(inc1.toDF("doc_id", "text"),
      col("doc_id"), col("text"), path)
    val got2 = incRun(inc2, path)
    // the batch reference over everything, restricted per epoch
    val batch = run(archive ++ inc1 ++ inc2, k = 8)
    inc1.map(_._1).foreach(id => assert(got1(id) === batch(id), s"doc $id"))
    inc2.map(_._1).foreach(id => assert(got2(id) === batch(id), s"doc $id"))
    // the semantics themselves: 10/20 lose the archived passage, 11
    // keeps (its epoch's first), 12 and 21 lose the duplicated run
    assert(got1(10L) === "carrier of again")
    assert(got1(11L) === inc1(1)._2)
    assert(got1(12L) === "prefix suffix")
    assert(got2(21L) === "")
    // the broadcast hatch changes nothing
    assert(incRun(inc2, path, broadcastIndex = true) === got2)
  }

  test("incremental: k rides in the artifact — an index built at one " +
      "width cuts at that width regardless of caller assumptions") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-spank").toString
    // k=5 index: a 5-word passage is owned by the archive
    Dedup.writeCorpusSpanIndex(
      Seq((1L, "aa bb cc dd ee tail words")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, k = 5)
    val got = incRun(Seq((10L, "start aa bb cc dd ee finish")), path)
    assert(got(10L) === "start finish")
  }

  test("k commits atomically with the hashes (ADVICE r16): _meta_k " +
      "lives inside the swapped root; legacy sibling-meta artifacts " +
      "still read") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-spanmeta").toString + "/idx"
    Dedup.writeCorpusSpanIndex(
      Seq((1L, "aa bb cc dd ee tail words")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, k = 5)
    assert(new java.io.File(s"$path/hashes/_meta_k").exists(),
      "k must ride inside the hashes root the swap commits")
    assert(!new java.io.File(s"$path/meta").exists(),
      "no sibling meta outside the atomic swap")
    assert(Dedup.readCorpusSpanIndexK(spark, path) === 5)
    // a REBUILD at a new k swaps hashes and k together: no window
    // where new hashes pair with the old width
    Dedup.writeCorpusSpanIndex(
      Seq((1L, "aa bb cc dd ee ff tail words")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), path, k = 6)
    assert(Dedup.readCorpusSpanIndexK(spark, path) === 6)
    val got = incRun(Seq((10L, "start aa bb cc dd ee ff finish")), path)
    assert(got(10L) === "start finish")
    // legacy pre-r17 artifact (sibling meta parquet, no _meta_k):
    // the fallback still reads it
    val legacy = java.nio.file.Files
      .createTempDirectory("graft-spanlegacy").toString + "/idx"
    Dedup.writeCorpusSpanIndex(
      Seq((1L, "aa bb cc dd ee tail words")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), legacy, k = 5)
    assert(new java.io.File(s"$legacy/hashes/_meta_k").delete())
    spark.range(1).select(lit(5).as("k"))
      .write.mode("overwrite").parquet(s"$legacy/meta")
    assert(Dedup.readCorpusSpanIndexK(spark, legacy) === 5)
  }
}
