package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Johnson–Lindenstrauss random-sign projection (`Similarity.jlProject`)
  * and the coarse-quantize-then-verify KNN built on it
  * (`Similarity.knnJlPrefilter`). The e07/e08 gates prove both against
  * the DuckDB oracle; here we pin the arithmetic against an independent
  * Scala reference, the sign/bucket-bit correspondence, the
  * prefilter's exactness at full candidate width, and determinism.
  */
class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4
  private lazy val emb = Seq(
    (0L, Seq(1.00f, 0.00f, -0.50f, 0.25f)),
    (1L, Seq(0.99f, 0.01f, -0.49f, 0.26f)),
    (2L, Seq(-1.00f, 0.75f, 0.10f, -0.30f)),
    (3L, Seq(0.00f, -0.20f, 0.80f, 0.40f)),
    (4L, Seq(0.50f, 0.50f, 0.50f, 0.50f))
  ).toDF("vec_id", "embedding")

  // the operator's documented arithmetic, re-derived independently:
  // proj[j] = Σ_d floor(x_d·1000 + 0.5) · sign(j, d)
  private def reference(vec: Seq[Float], outDims: Int): Seq[Long] = {
    val signs = Similarity.planeSigns(outDims, dims)
    (0 until outDims).map { j =>
      vec.indices.map { d =>
        math.floor(vec(d) * 1000.0 + 0.5).toLong * signs(j)(d)
      }.sum
    }
  }

  test("projection components match the independent reference") {
    val out = emb
      .select(col("vec_id"), Similarity.jlProject(col("embedding"), 3, dims).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val in = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    in.foreach { case (id, vec) =>
      assert(out(id) == reference(vec, 3), s"vec $id")
    }
  }

  test("component signs are the LSH bucket bits (same hyperplane matrix)") {
    val out = emb.select(col("vec_id"),
        Similarity.jlProject(col("embedding"), 3, dims).as("p"),
        Similarity.lshBuckets(col("embedding"), 3, dims).as("b"))
      .collect()
    out.foreach { r =>
      val proj = r.getSeq[Long](1)
      val bucket = r.getLong(2)
      (0 until 3).foreach { j =>
        val bit = (bucket >> j) & 1L
        assert((proj(j) > 0) == (bit == 1L),
          s"vec ${r.getLong(0)} component $j: proj=${proj(j)} bucket=$bucket")
      }
    }
  }

  test("prefilter at full candidate width reproduces brute-force exactly") {
    val corpus = emb.filter(col("vec_id") >= 2)
    val queries = emb.filter(col("vec_id") < 2)
    val brute = Similarity.knnBrute(corpus, queries, 2)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted.toSeq
    val jl = Similarity.knnJlPrefilter(corpus, queries, k = 2,
        candidates = 3, outDims = 3, dims = dims)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted.toSeq
    assert(jl == brute)
  }

  test("narrow shortlist still returns k ranked rows per query") {
    val corpus = emb.filter(col("vec_id") >= 2)
    val queries = emb.filter(col("vec_id") < 2)
    val out = Similarity.knnJlPrefilter(corpus, queries, k = 2,
        candidates = 2, outDims = 3, dims = dims).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to rows.length))
    }
  }

  test("deterministic across runs") {
    def run() = Similarity.knnJlPrefilter(
        emb.filter(col("vec_id") >= 2), emb.filter(col("vec_id") < 2),
        k = 2, candidates = 2, outDims = 3, dims = dims)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }
}
