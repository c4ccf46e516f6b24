package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cluster-balanced diversity sampling
  * (`Similarity.clusterBalancedSample`): equal per-cluster quota of
  * nearest-to-centroid prototypes over the deterministic Lloyd
  * partition. The e06 gate proves training + assignment + quota
  * against the DuckDB oracle; here we pin quota semantics, selection
  * order, determinism, and the map-side-pruned window plan.
  */
class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  // two tight 4-vector piles far apart plus one outlier pile — k=2
  // must split pile A from pile B, and the quota must pick per pile
  private lazy val emb = Seq(
    (0L, Seq(1.00f, 0.00f)), (1L, Seq(0.99f, 0.01f)),
    (2L, Seq(0.98f, 0.02f)), (3L, Seq(0.97f, 0.03f)),
    (10L, Seq(0.00f, 1.00f)), (11L, Seq(0.01f, 0.99f)),
    (12L, Seq(0.02f, 0.98f)), (13L, Seq(0.03f, 0.97f))
  ).toDF("vec_id", "embedding")

  test("per-cluster quota: at most perCluster rows per centroid, rank 1-based") {
    val out = Similarity.clusterBalancedSample(emb, k = 2, perCluster = 2)
      .collect()
    val byCluster = out.groupBy(_.getInt(1))
    assert(byCluster.values.forall(_.length <= 2))
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    byCluster.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
    }
  }

  test("selection keeps the vectors nearest their centroid") {
    val all = Similarity.clusterBalancedSample(emb, k = 2, perCluster = 100)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // within every cluster, rank order == distance order (ties by id)
    all.groupBy(_._2).values.foreach { rows =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(r => (r._3, r._1)).sameElements(
        rows.sortBy(r => (r._3, r._1)).map(r => (r._3, r._1))))
    }
    // the quota-2 result is exactly the first two ranks of the full list
    val top2 = Similarity.clusterBalancedSample(emb, k = 2, perCluster = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(top2 == all.filter(_._4 <= 2).toSet)
  }

  test("deterministic across runs") {
    def run() = Similarity.clusterBalancedSample(emb, k = 2, perCluster = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }

  test("quota window prunes map-side (WindowGroupLimit), no corpus-wide sort") {
    val plan = Similarity.clusterBalancedSample(emb, k = 2, perCluster = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rank<=quota predicate to push a WindowGroupLimit:\n$plan")
  }
}
