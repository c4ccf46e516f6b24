package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bigram LM familiarity scoring ([[TextFunctions.lmTrainBigrams]] /
  * [[TextFunctions.lmFamiliarity]]): hand-computed model counts and
  * scores on a planted mini-corpus, the null contract for unknown
  * docs, and plan-order invariance of the integer sums. The t29 gate
  * hash-checks the full pipeline against the DuckDB mirror; here we
  * pin the arithmetic a reader can check by hand.
  */
class LmFamiliaritySpec extends SparkSpec {
  import spark.implicits._

  // model corpus: "a b a b c" and "a b x"
  // bigrams: (a b)×3, (b a)×1, (b c)×1, (b x)×1
  // contexts: a → 3 continuations, b → 3 continuations
  private lazy val model = TextFunctions.lmTrainBigrams(
    Seq("a b a b c", "a b x").toDF("text"), col("text"))

  test("model rows carry the bigram count and its context count") {
    val rows = model.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a b", 3L, 3L), ("b a", 1L, 3L),
      ("b c", 1L, 3L), ("b x", 1L, 3L)))
  }

  test("familiarity = Σc2/Σc1 over matched bigrams; coverage counted") {
    val docs = Seq(
      (1L, "a b c"),     // (a b)+(b c): Σc2=4, Σc1=6
      (2L, "z z z"),     // two bigrams, none in the model
      (3L, "one"),       // no bigram at all
      (4L, "a b q b a")  // (a b),(b q),(q b),(b a): 2 of 4 known
    ).toDF("doc_id", "text")
    val got = TextFunctions.lmFamiliarity(docs, model,
        col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got(0) == ((1L, 2L, 2L, Some(4.0 / 6.0))))
    assert(got(1) == ((2L, 2L, 0L, None)), "all-OOV doc scores null")
    assert(got(2) == ((3L, 0L, 0L, None)), "sub-bigram doc scores null")
    assert(got(3) == ((4L, 4L, 2L, Some(4.0 / 6.0))))
  }

  test("minCount prunes hapax bigrams; context mass stays pre-prune") {
    val pruned = TextFunctions.lmTrainBigrams(
      Seq("a b a b c", "a b x").toDF("text"), col("text"), minCount = 2L)
    val rows = pruned.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // only "a b" (c2=3) survives; its c1 still counts ALL of a's mass
    assert(rows == Set(("a b", 3L, 3L)))
  }

  test("scores are invariant to input partitioning (integer partials)") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val m = TextFunctions.lmTrainBigrams(
      docs.filter(col("lang") === "en"), col("text"))
    def run(d: org.apache.spark.sql.DataFrame) =
      TextFunctions.lmFamiliarity(d, m, col("doc_id"), col("text"))
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }

  test("the reference slice self-scores with full coverage, never null") {
    // every bigram of a model-slice doc is in the model by construction
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val slice = docs.filter(col("lang") === "en")
    val m = TextFunctions.lmTrainBigrams(slice, col("text"))
    val scored = TextFunctions.lmFamiliarity(slice, m,
      col("doc_id"), col("text"))
    assert(scored.filter(col("n_known") =!= col("n_bigrams") ||
      col("familiarity").isNull).count() == 0)
  }

  // ---- order-n generalization (t32/t33) ----

  test("order-3 model: hand-computed trigram and context counts") {
    // corpus "a b c a b c" → trigrams (a b c)×2, (b c a)×1, (c a b)×1
    // contexts: "a b" → 2, "b c" → 1, "c a" → 1
    val m3 = TextFunctions.lmTrainNgrams(
      Seq("a b c a b c").toDF("text"), col("text"), order = 3)
    val rows = m3.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("a b c", 2L, 2L), ("b c a", 1L, 1L),
      ("c a b", 1L, 1L)))
  }

  test("order-2 through the n-gram path IS the bigram model") {
    val viaN = TextFunctions.lmTrainNgrams(
      Seq("a b a b c", "a b x").toDF("text"), col("text"), order = 2)
    assert(viaN.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSet ==
      model.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet)
  }

  test("order-3 scoring: Σc2/Σc1 over matched trigrams; null contract") {
    val m3 = TextFunctions.lmTrainNgrams(
      Seq("a b c a b c").toDF("text"), col("text"), order = 3)
    val docs = Seq(
      (1L, "a b c a"),   // (a b c)+(b c a): Σc2=3, Σc1=3
      (2L, "two words"), // no trigram at all
      (3L, "z z z z")    // two trigrams, none known
    ).toDF("doc_id", "text")
    val got = TextFunctions.lmFamiliarityNgrams(docs, m3,
        col("doc_id"), col("text"), order = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got(0) == ((1L, 2L, 2L, Some(1.0))))
    assert(got(1) == ((2L, 0L, 0L, None)), "sub-trigram doc scores null")
    assert(got(2) == ((3L, 2L, 0L, None)), "all-OOV doc scores null")
  }

  test("model artifact: order in meta; with-index == live; hatch == broadcast") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val slice = docs.filter(col("lang") === "en")
    val path = java.nio.file.Files
      .createTempDirectory("lm_model").toString + "/idx"
    TextFunctions.writeLmModel(slice, col("text"), path, order = 3,
      minCount = 2L)
    val meta = spark.read.parquet(s"$path/meta").head
    assert(meta.getAs[Int]("order") == 3
      && meta.getAs[Long]("min_count") == 2L,
      "order and minCount live IN the artifact")
    val live = TextFunctions.lmFamiliarityNgrams(docs,
        TextFunctions.lmTrainNgrams(slice, col("text"), 3, 2L),
        col("doc_id"), col("text"), order = 3)
      .orderBy("doc_id").collect().toSeq
    val viaIdx = TextFunctions.lmFamiliarityWithIndex(docs, path,
        col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    val viaHatch = TextFunctions.lmFamiliarityWithIndex(docs, path,
        col("doc_id"), col("text"), broadcastModel = false)
      .orderBy("doc_id").collect().toSeq
    assert(viaIdx == live, "artifact path must be bit-equal to live")
    assert(viaHatch == live, "shuffle hatch must change no row")
  }
}
