package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR-style importance resampling (t39): the properties the
  * hash-gated oracle can't isolate — target-likeness ordering, the
  * null-importance drop, consistency with the one-sided familiarity
  * scores, the broadcast hatch, and determinism.
  */
class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  // raw corpus: a target-like slice and an off-domain slice with its
  // own strong mode (the case where a one-sided filter misfires)
  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "the cat ran to the mat"),
    (4L, "zz qq zz qq zz qq zz qq"),
    (5L, "zz qq zz qq zz qq"),
    (6L, "qq zz qq zz qq"),
    (7L, "solo")).toDF("doc_id", "text")

  private val target = Seq(
    "the cat sat on the mat",
    "the cat ran on the mat").toDF("text")

  private def weights(broadcastModels: Boolean = true) =
    TextFunctions.importanceWeights(corpus, target, col("doc_id"),
        col("text"), col("text"), order = 2,
        broadcastModels = broadcastModels)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap

  test("target-like documents outscore the off-domain mode") {
    val w = weights()
    // docs 1-3 share the target's bigrams; 4-6 are the raw corpus's
    // own strong mode, unknown to the target model
    Seq(1L, 2L, 3L).foreach { d =>
      assert(w(d).isDefined && w(d).get > 0.9, s"doc $d: ${w(d)}")
    }
    Seq(4L, 5L, 6L).foreach { d =>
      assert(w(d).isEmpty, s"off-domain doc $d must score null (no " +
        s"target-matched ngram), got ${w(d)}")
    }
    // the sub-bigram doc scores null too
    assert(w(7L).isEmpty)
  }

  test("importance equals the ratio of the two one-sided familiarities") {
    val famT = TextFunctions.lmFamiliarityNgrams(corpus,
        TextFunctions.lmTrainNgrams(target, col("text"), 2),
        col("doc_id"), col("text"), 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val famR = TextFunctions.lmFamiliarityNgrams(corpus,
        TextFunctions.lmTrainNgrams(corpus, col("text"), 2),
        col("doc_id"), col("text"), 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val w = weights()
    corpus.collect().map(_.getLong(0)).foreach { d =>
      (famT(d), famR(d)) match {
        case (Some(t), Some(r)) => assert(w(d) === Some(t / r), s"doc $d")
        case _ => assert(w(d).isEmpty, s"doc $d")
      }
    }
  }

  test("broadcast hatch and repartitioning change nothing") {
    assert(weights() === weights(broadcastModels = false))
    val a = TextFunctions.importanceResample(corpus, target,
        col("doc_id"), col("text"), col("text"), scale = 0.8)
      .orderBy("doc_id").collect().toSeq
    val b = TextFunctions.importanceResample(corpus.repartition(7), target,
        col("doc_id"), col("text"), col("text"), scale = 0.8)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("resample keeps only non-null importance and respects the " +
      "hash threshold") {
    val kept = TextFunctions.importanceResample(corpus, target,
        col("doc_id"), col("text"), col("text"), scale = 1000.0)
      .collect().map(_.getLong(0)).toSet
    // scale large enough that min(1, w·scale) = 1 for every scored doc
    assert(kept === Set(1L, 2L, 3L))
  }

  test("artifact path is bit-equal to live; order mismatch fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("graft-imp").toString
    TextFunctions.writeLmModel(target, col("text"), s"$root/t", order = 2)
    TextFunctions.writeLmModel(corpus, col("text"), s"$root/r", order = 2)
    val viaIdx = TextFunctions.importanceWeightsWithIndex(corpus,
        s"$root/t", s"$root/r", col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    val live = TextFunctions.importanceWeights(corpus, target,
        col("doc_id"), col("text"), col("text"), order = 2)
      .orderBy("doc_id").collect().toSeq
    assert(viaIdx === live)
    // a raw model trained at a different order must be rejected, not
    // silently score everything OOV
    TextFunctions.writeLmModel(corpus, col("text"), s"$root/r3", order = 3)
    val e = intercept[IllegalArgumentException](
      TextFunctions.importanceWeightsWithIndex(corpus, s"$root/t",
        s"$root/r3", col("doc_id"), col("text")))
    assert(e.getMessage.contains("order"))
  }
}
