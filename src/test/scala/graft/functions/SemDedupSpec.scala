package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic deduplication (`Similarity.semDedup`, d34 — SemDeDup,
  * Abbas et al. arXiv:2303.09540). The d34 gate hash-pins the full
  * chain against the DuckDB replay; here we pin the CONTRACTS the
  * composition adds over its verified pieces: the within-cluster
  * restriction (a cross-cluster near-pair is deliberately not a
  * duplicate), transitive grouping with the min-id representative,
  * singleton self-labels, and the hot-cluster exclusion guard.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4

  /** A unit-ish vector along axis `ax` with a small `wobble` on the
    * next axis — same-axis vectors are near-dups (cos ≈ 1), different
    * axes are orthogonal (cos ≈ 0), so k=2 clustering splits them. */
  private def v(ax: Int, wobble: Double): Seq[Float] =
    (0 until dims).map(d =>
      if (d == ax) 1.0f
      else if (d == (ax + 1) % dims) wobble.toFloat else 0.0f)

  test("same-cluster near-dups group under the min id; singletons and " +
      "cross-cluster vectors label as themselves") {
    val emb = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.01)), (3L, v(0, 0.02)), // one group
      (10L, v(2, 0.00)), (11L, v(2, 0.01)),                 // another
      (20L, v(1, 0.00))                                     // singleton
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(emb, k = 3, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("transitivity: a chain a~b, b~c groups all three even when " +
      "a and c alone fall under the threshold") {
    // wobbles 0.00 / 0.22 / 0.44: adjacent cos > 0.95, ends ~0.905
    val emb = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.22)), (3L, v(0, 0.44))
    ).toDF("vec_id", "embedding")
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(v(0, 0.00), v(0, 0.22)) > 0.95)
    assert(cos(v(0, 0.00), v(0, 0.44)) < 0.95, "fixture lost its point")
    val got = Similarity.semDedup(emb, k = 1, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("the within-cluster restriction is real: near-dups split across " +
      "clusters do NOT pair (the documented SemDeDup trade)") {
    // two tight bundles on orthogonal axes; k=2 separates them. The
    // pair (2, 10) is planted INSIDE bundle B but numbered into A's id
    // range — ids play no role in clustering, so this is just naming.
    val emb = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.01)),
      (10L, v(2, 0.00)), (11L, v(2, 0.01))
    ).toDF("vec_id", "embedding")
    val labels = Similarity.semDedup(emb, k = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // groups form within each axis bundle only
    assert(labels(2L) === labels(1L))
    assert(labels(11L) === labels(10L))
    assert(labels(1L) !== labels(10L),
      "orthogonal bundles must never merge")
  }

  test("hot-cluster guard: a cluster past maxClusterSize is excluded " +
      "from pairing (members label as singletons), small clusters " +
      "still dedup") {
    val big = (0 until 8).map(i => (100L + i, v(0, 0.001 * i)))
    val small = Seq((1L, v(2, 0.00)), (2L, v(2, 0.01)))
    val emb = (big ++ small).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(emb, k = 2, threshold = 0.95,
        maxClusterSize = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    big.foreach { case (id, _) =>
      assert(got(id) === id, s"hot-cluster member $id must self-label")
    }
    assert(got(2L) === got(1L), "small cluster must still dedup")
  }

  test("semDedupCanonical keeps each group's highest-score member, " +
      "ties to the lowest vec_id") {
    val emb = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.01)), (3L, v(0, 0.02)),
      (20L, v(1, 0.00))
    ).toDF("vec_id", "embedding")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 9L), (20L, 1L))
      .toDF("vec_id", "score")
    val got = Similarity.semDedupCanonical(emb, quality, k = 2,
        threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // group {1,2,3}: top score 9 shared by 2 and 3 -> 2 wins the tie
    assert(got(1L) === ((1L, 2L)))
    assert(got(2L) === ((1L, 2L)))
    assert(got(3L) === ((1L, 2L)))
    // singleton is its own canonical
    assert(got(20L) === ((20L, 20L)))
  }

  test("semDedupCanonical with partial quality coverage labels EVERY " +
      "row: unscored members never win, an all-unscored group falls " +
      "back to its lowest vec_id (ADVICE r17: no silent drops)") {
    val emb = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.01)), (3L, v(0, 0.02)), // group A
      (10L, v(2, 0.00)), (11L, v(2, 0.01)),                 // group B
      (20L, v(1, 0.00))                                     // singleton
    ).toDF("vec_id", "embedding")
    // group A: only 3 is scored; group B: entirely unscored; the
    // singleton 20 is unscored too — the old inner join would have
    // dropped 1, 2, 10, 11, and 20 from the output entirely
    val quality = Seq((3L, 1L)).toDF("vec_id", "score")
    val got = Similarity.semDedupCanonical(emb, quality, k = 3,
        threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 20L),
      "every input row must come back labeled")
    // group A: the sole scored member wins even at the highest vec_id
    Seq(1L, 2L, 3L).foreach(id => assert(got(id) === ((1L, 3L))))
    // group B all-unscored: lowest-vec_id fallback
    Seq(10L, 11L).foreach(id => assert(got(id) === ((10L, 10L))))
    assert(got(20L) === ((20L, 20L)))
  }

  test("semDedupFarthest keeps each group's farthest-from-centroid " +
      "member (the paper's keep rule), ties to the lowest vec_id; " +
      "singletons are their own canonical") {
    // one tight bundle: k=1 puts the centroid at the integer mean, so
    // the largest-wobble member is farthest; plus a singleton axis
    val emb = Seq(
      (1L, v(0, 0.00)), (2L, v(0, 0.01)), (3L, v(0, 0.04)),
      (20L, v(1, 0.00))
    ).toDF("vec_id", "embedding")
    val labels = Similarity.semDedupWithDist(emb, k = 2, threshold = 0.95)
    val got = Similarity.farthestFromLabels(labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // group {1,2,3}: centroid ~ the mean of the bundle, 3 is farthest
    assert(got(1L) === ((1L, 3L)))
    assert(got(2L) === ((1L, 3L)))
    assert(got(3L) === ((1L, 3L)))
    assert(got(20L) === ((20L, 20L)))
    // the end-to-end form agrees with the two-step composition
    val e2e = Similarity.semDedupFarthest(emb, k = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(e2e === got)
  }

  test("autoSemDedupK: calibrated balance point, occupancy floor, and " +
      "n clamp") {
    // the measured wall minimum: k = 8 at the k-curve's n = 2040
    assert(Similarity.autoSemDedupK(2040L) === 8)
    // balance scales as sqrt(n/iters)
    assert(Similarity.autoSemDedupK(2040L, iters = 10) === 4)
    assert(Similarity.autoSemDedupK(1000000L) === 177)
    // occupancy floor: the average cell must stay under the hot cap
    assert(Similarity.autoSemDedupK(1000000L, maxOccupancy = 1000)
      === 1000)
    // n clamp: never more centroids than points
    assert(Similarity.autoSemDedupK(7L, maxOccupancy = 2) === 4)
    assert(Similarity.autoSemDedupK(1L) === 1)
    intercept[IllegalArgumentException] {
      Similarity.autoSemDedupK(0L)
    }
  }

  test("recall at the derived k stays TOTAL: every planted duplicate " +
      "pair still groups under semDedupAuto (clustering can only " +
      "split groups, and exact copies always co-cluster)") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.df(spark, dir, "embeddings")
    val planted = emb.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val n = corpus.count()
    val k = Similarity.autoSemDedupK(n)
    val labels = Similarity.semDedupAuto(corpus, threshold = 0.95,
        corpusSize = n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plantIds = planted.select(col("vec_id"))
      .collect().map(_.getLong(0))
    assert(plantIds.nonEmpty, "fixture lost its plants")
    plantIds.foreach { pid =>
      assert(labels(pid) === labels(pid - 100000),
        s"planted dup $pid must group with its original at derived k=$k")
    }
  }

  test("semDedupStats: the hand-derived duplicate-group size " +
      "histogram (the dedup data card)") {
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // one triple
      (10L, 10L), (11L, 10L),      // one pair
      (20L, 20L), (30L, 30L)       // two singletons
    ).toDF("vec_id", "rep_id")
    val got = Similarity.semDedupStats(labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L)),
      3L -> ((1L, 3L))))
    // the release numbers read off it: 7 vectors, 4 groups kept,
    // 3 duplicates dropped, largest pile 3
    assert(got.map { case (s, (g, _)) => s * g }.sum === 7L)
    assert(got.values.map(_._1).sum === 4L)
  }

  test("degenerate knobs are rejected loudly") {
    val emb = Seq((1L, v(0, 0.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.semDedup(emb, k = 0, threshold = 0.9)
    }
    intercept[IllegalArgumentException] {
      Similarity.semDedup(emb, k = 1, threshold = 0.9, maxClusterSize = 1)
    }
  }
}
