package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CCNet-style head/middle/tail tiering (`TextFunctions.qualityTiers`):
  * quantile cutoffs on the corpus-relative word-rank score, every doc
  * labeled. The t20 gate proves score + cutoffs + labels against
  * DuckDB's quantile_cont; here we pin the tier semantics and the
  * no-global-sort plan.
  */
class QualityTiersSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs over a tiny vocabulary: "a" dominates (rank 1), "z q" are
  // rare — docs of only-"a" score lowest (head), rare-token docs
  // highest (tail)
  private lazy val docs = Seq(
    (1L, "a a a a"), (2L, "a a a b"), (3L, "a a b b"),
    (4L, "a b b c"), (5L, "b c c z"), (6L, "z q q c")
  ).toDF("doc_id", "text")

  test("every doc gets exactly one tier; common-vocab docs head, rare tail") {
    val out = TextFunctions.qualityTiers(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out.size == 6)
    assert(out(1L) == "head", "only the top-ranked word → head")
    assert(out(6L) == "tail", "rare-token garble → tail")
    assert(Set("head", "middle", "tail").subsetOf(out.values.toSet))
  }

  test("tier boundaries: score ordering is monotone head <= middle <= tail") {
    val rows = TextFunctions.qualityTiers(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(4), r.getDouble(3)))
    def scores(t: String) = rows.filter(_._1 == t).map(_._2)
    val (h, m, tl) = (scores("head"), scores("middle"), scores("tail"))
    assert(h.nonEmpty && tl.nonEmpty)
    if (m.nonEmpty) {
      assert(h.max <= m.min)
      assert(m.max <= tl.min)
    } else assert(h.max <= tl.min)
  }

  test("deterministic across runs") {
    def run() = TextFunctions.qualityTiers(docs, col("doc_id"), col("text"))
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }

  test("plan: no single-partition global window — cutoffs broadcast back") {
    val plan = TextFunctions.qualityTiers(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // the scored frame joins a broadcast of the 1-row bounds aggregate;
    // tier labeling must not introduce a corpus-wide Window/Sort
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
