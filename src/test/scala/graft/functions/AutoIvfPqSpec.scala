package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall-targeted IVF-PQ sizing ([[Similarity.autoIvfPqConfig]]):
  * the rule's fixed points a reader can check by hand, and the claim
  * that justifies its existence — recall@k at the DERIVED config,
  * MEASURED against brute-force ground truth on the same corpus the
  * r14 recall curve was taken on, must meet the target. The e17 gate
  * hash-checks the arithmetic against the DuckDB mirror; e18
  * hash-checks the targetRecall=1.0 degeneration to exact search.
  */
class AutoIvfPqSpec extends SparkSpec {
  import Similarity.{IvfPqConfig, autoIvfPqConfig}

  test("targetRecall = 1.0 degenerates to the exact search") {
    val c = autoIvfPqConfig(500L, dims = 64, k = 5, targetRecall = 1.0)
    assert(c.nprobe == c.kCoarse, "full probe — the e16 identity")
    assert(c.rerank == 500, "rerank = n — exact re-rank of everything")
  }

  test("cell count: sqrt rule, capped by training mass, floors at 1") {
    assert(autoIvfPqConfig(1000000L, 64, 10, 0.9).kCoarse == 1000)
    // 500/39 = 12 < floor(sqrt(500)) = 22: the training-mass cap binds
    assert(autoIvfPqConfig(500L, 64, 10, 0.9).kCoarse == 12)
    assert(autoIvfPqConfig(10L, 64, 1, 0.9).kCoarse == 1)
  }

  test("subspaces: largest sub in {8,4,2,1} dividing dims") {
    assert(autoIvfPqConfig(1000000L, 64, 10, 0.8).m == 8)   // sub 8
    assert(autoIvfPqConfig(1000000L, 20, 10, 0.8).m == 5)   // sub 4
    assert(autoIvfPqConfig(1000000L, 6, 10, 0.8).m == 3)    // sub 2
    assert(autoIvfPqConfig(1000000L, 7, 10, 0.8).m == 7)    // sub 1
  }

  test("nprobe monotone in target; rerank tracks nprobe (dilution rule)") {
    val cs = Seq(0.1, 0.3, 0.5, 0.7, 0.9, 1.0)
      .map(t => autoIvfPqConfig(1000000L, 64, 10, t))
    assert(cs.sliding(2).forall { case Seq(a, b) => a.nprobe <= b.nprobe },
      s"nprobe must not fall as the target rises: ${cs.map(_.nprobe)}")
    cs.filter(_.rerank < 1000000).foreach { c =>
      assert(c.rerank >= 2 * 10 * c.nprobe,
        s"2k shortlist slots per probed cell (dilution rule): $c")
    }
    assert(cs.forall(c => c.rerank >= 40), "rerank floor 4k")
  }

  test("rejects empty corpora, k past n, and out-of-range targets") {
    intercept[IllegalArgumentException](autoIvfPqConfig(0L, 64, 1, 0.5))
    intercept[IllegalArgumentException](autoIvfPqConfig(5L, 64, 6, 0.5))
    intercept[IllegalArgumentException](autoIvfPqConfig(5L, 64, 1, 0.0))
    intercept[IllegalArgumentException](autoIvfPqConfig(5L, 64, 1, 1.1))
  }

  test("measured recall@10 at the derived config meets the target") {
    // the curve corpus: sf0.001 embeddings, 10 held-out queries
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 10).cache()
    val queries = emb.filter(col("vec_id") < 10)
    val n = corpus.count()
    val target = 0.8
    val cfg = autoIvfPqConfig(n, dims = 64, k = 10, targetRecall = target)
    val cents = Similarity.ivfTrain(corpus, cfg.kCoarse)
    val cb = Similarity.pqTrain(corpus, m = cfg.m, k = 8, dims = 64)
    val index = Similarity.ivfPqIndex(corpus, cents, cb, m = cfg.m,
      dims = 64)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.knnBrute(corpus, queries, 10))
    val got = pairs(Similarity.knnIvfPq(index, cents, cb, queries, corpus,
      k = 10, nprobe = cfg.nprobe, rerank = cfg.rerank, m = cfg.m,
      dims = 64))
    val recall = (truth & got).size.toDouble / truth.size
    corpus.unpersist()
    assert(recall >= target,
      s"derived $cfg must hit recall >= $target on the curve corpus; " +
        f"measured $recall%.3f")
  }
}
