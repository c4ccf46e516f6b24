package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Graph.pageRank]]: deterministic quantized authority ranking;
  * [[Graph.triangleCounts]]: degree-ordered triangle counting.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("triangles: counts per node on a mixed graph") {
    // 1-2-3 triangle, 3-4 pendant, 5-6-7-8 square (triangle-free),
    // K4 on 10..13 (4 triangles, every node in 3)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (11L, 12L), (11L, 13L), (12L, 13L)
    ).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L,
      10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L)
    assert(got == want, s"got $got")
  }

  test("triangles: celebrity star is triangle-free and cheap (no hub wedges)") {
    // hub 0 with 50 leaves — the orientation points every edge INTO the
    // hub (leaves have degree 1), so the hub emits zero wedges
    val star = (1L to 50L).map(i => (0L, i)).toDF("id_a", "id_b")
    val got = Graph.triangleCounts(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 51 && got.values.forall(_ == 0L))
  }

  test("triangles: match a brute-force reference on a pseudo-random graph") {
    // deterministic pseudo-random graph: 40 nodes, edge (i, j) present
    // iff a hash condition holds — dense enough for many triangles
    val edges = for {
      i <- 0L until 40L; j <- (i + 1) until 40L
      if scala.util.hashing.MurmurHash3.productHash((i, j)) % 5 == 0
    } yield (i, j)
    val got = Graph.triangleCounts(edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val want = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.foreach { case (a, b) => want(a) += 0; want(b) += 0 }
    for {
      (a, b) <- edges
      c <- adj(b) if adj(a).contains(c)
    } { want(a) += 1; want(b) += 1; want(c) += 1 }
    assert(got == want.toMap, s"diff: ${got.toSet.diff(want.toSet)}")
  }

  test("clustering coefficients: clique nodes at 1.0, chain nodes at 0") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // triangle: coeff 1 everywhere
      (3L, 4L), (4L, 5L)            // chain off node 3
    ).toDF("id_a", "id_b")
    val out = Graph.clusteringCoefficients(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    // node 3: degree 3, one triangle → 2·1/(3·2) = 1/3
    assert(out(3L) == ((3L, 1L, 1.0 / 3)))
    assert(out(4L) == ((2L, 0L, 0.0)))
    assert(out(5L)._1 == 1L && out(5L)._3 == 0.0, "degree-1 node → 0.0")
  }

  test("triangles: deterministic across partitioning; duplicate and " +
      "reversed input edges collapse") {
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 3L))
      .toDF("id_a", "id_b")
    val a = Graph.triangleCounts(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.triangleCounts(pairs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == Set((1L, 1L), (2L, 1L), (3L, 1L)))
    assert(a == b)
  }

  test("symmetric graphs rank equally; hubs outrank leaves") {
    // triangle: all three nodes structurally identical
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val triRanks = Graph.pageRank(tri).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(triRanks.values.toSet.size == 1,
      s"triangle nodes must rank equally: $triRanks")

    // star: the hub collects every leaf's full contribution
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
      .toDF("id_a", "id_b")
    val ranks = Graph.pageRank(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(10L) > ranks(1L),
      s"hub must outrank leaves: $ranks")
    assert(Seq(1L, 2L, 3L, 4L).map(ranks).toSet.size == 1,
      "symmetric leaves must rank equally")
  }

  test("deterministic across partitioning (exact integer arithmetic)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    val a = Graph.pageRank(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(pairs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"partitioning changed ranks: ${a.diff(b)}")
  }

  test("deep run: 30 iterations on a 60-node chain completes (cadenced " +
      "lineage truncation), and tolPpm stops early with the same ranks") {
    // a long chain is the worst case for lineage: every iteration adds
    // two joins; without the CheckpointEvery truncation 30 rounds build
    // a 60-join plan
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val deep = Graph.pageRank(chain, iters = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(deep.size == 60)
    // interior nodes (degree 2) outrank the two endpoints (degree 1)
    assert(deep(30L) > deep(1L) && deep(30L) > deep(60L))
    // convergence exit: with a loose tolerance the run stops early yet
    // lands within tol of the fixed-30 ranks at every node
    val tol = 200L
    val early = Graph.pageRank(chain, iters = 30, tolPpm = tol).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(early.keySet == deep.keySet)
    // one extra iteration moves scores by <= tol, and iterating further
    // only contracts — the early result sits within a few tol of deep
    early.foreach { case (id, pr) =>
      assert(math.abs(pr - deep(id)) <= 10 * tol,
        s"node $id: early $pr vs deep ${deep(id)}")
    }
  }

  test("scores stay in sane ppm bounds (mass only leaks via floor)") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val ranks = Graph.pageRank(pairs, iters = 10).collect()
      .map(r => r.getLong(1))
    // base (150k) is the floor; total mass can't exceed the initial
    // 3M by construction (floor divisions only ever LOSE mass)
    assert(ranks.forall(_ >= 150000L), ranks.mkString(","))
    assert(ranks.sum <= 3000000L, s"mass created: ${ranks.sum}")
  }

  test("kCore: multi-round peel, nested cores, loud iteration cap") {
    // 4-clique with a 4-deep tail: the tail peels one vertex per round
    // (never all at once — each removal exposes the next), the clique
    // survives any k <= 3
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L))
    val g = (clique ++ tail).toDF("id_a", "id_b")
    val core2 = Graph.kCore(g, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core2.keySet == Set(1L, 2L, 3L, 4L))
    assert(core2.values.forall(_ == 3L))
    val core3 = Graph.kCore(g, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core3.keySet == Set(1L, 2L, 3L, 4L))
    // k above the clique degree empties the graph
    assert(Graph.kCore(g, k = 4).isEmpty)
    // the tail needs 4 peel rounds; a 2-round cap must fail loudly,
    // never silently return a non-core
    intercept[IllegalStateException] {
      Graph.kCore(g, k = 2, maxIters = 2).collect()
    }
  }

  test("labelPropagation: a bridge does not merge dense communities") {
    // barbell: two triangles joined by one edge — CC collapses this to
    // one cluster; density-honoring LPA must keep two
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("id_a", "id_b")
    val out = Graph.labelPropagation(g, iters = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // deterministic across partitioning (the sync + min-tie contract)
    val rep = Graph.labelPropagation(g.repartition(7), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rep == out)
    // a clique converges to its min id as the community label
    val clique = Seq((10L, 11L), (10L, 12L), (11L, 12L)).toDF("id_a", "id_b")
    val cl = Graph.labelPropagation(clique, iters = 3).collect()
      .map(r => r.getLong(1)).toSet
    assert(cl == Set(10L))
  }

  test("self-loops are ignored through BOTH edge directions") {
    // labelPropagation: with the loop, node 2's self-vote ties round
    // 2's count and the min tie-break freezes it at label 1; loop-free
    // semantics oscillate to 2 — so equality here proves the loop
    // never votes (the g05 oracle filters both union halves)
    val path = Seq((1L, 2L)).toDF("id_a", "id_b")
    val looped = (Seq((1L, 2L), (2L, 2L))).toDF("id_a", "id_b")
    val clean = Graph.labelPropagation(path, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val withLoop = Graph.labelPropagation(looped, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(withLoop == clean, s"self-vote leaked: $withLoop vs $clean")

    // kCore: a vertex held up only by its self-loop has true degree 0
    // — it must peel, not survive as a phantom 1-core
    val lone = Seq((9L, 9L), (1L, 2L)).toDF("id_a", "id_b")
    val core1 = Graph.kCore(lone, k = 1).collect()
      .map(r => r.getLong(0)).toSet
    assert(core1 == Set(1L, 2L), s"self-loop kept a phantom core: $core1")
  }

  test("personalized PageRank: mass concentrates around the seeds") {
    // two structurally IDENTICAL triangles, bridged; seeds in the
    // first — its nodes must outrank their mirror images, and with no
    // seeds anywhere reachable a node scores exactly 0
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),    // triangle A (seeded)
      (4L, 5L), (5L, 6L), (4L, 6L),    // triangle B (mirror)
      (3L, 4L),                        // bridge
      (20L, 21L)                       // far island, unreachable
    ).toDF("id_a", "id_b")
    val seeds = Seq(1L, 2L).toDF("doc_id")
    val pr = Graph.personalizedPageRank(pairs, seeds, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(1L) > pr(6L) && pr(2L) > pr(5L) && pr(3L) > pr(4L),
      s"seeded triangle must outrank its mirror: $pr")
    assert(pr(20L) == 0L && pr(21L) == 0L,
      s"unreachable island must score exactly 0: $pr")
    // global pageRank is seed-blind: the mirrors tie there
    val global = Graph.pageRank(pairs.filter(col("id_a") < 20L), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(global(1L) == global(6L) && global(2L) == global(5L),
      s"sanity: global PR must tie the mirrors: $global")
  }

  test("personalized PageRank: determinism under repartitioning") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("doc_id")
    def run(p: org.apache.spark.sql.DataFrame) =
      Graph.personalizedPageRank(p, seeds, iters = 6)
        .orderBy("doc_id").collect().toSeq
    assert(run(pairs) == run(pairs.repartition(5)))
  }

  private def hitsOf(edges: Seq[(Long, Long)], iters: Int = 5,
      parts: Int = 1): Map[Long, (Long, Long)] =
    Graph.hits(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("HITS: star — sources are the hubs, the sink is the authority") {
    // 1,2,3 all point at 4; 4 points nowhere
    val h = hitsOf(Seq((1L, 4L), (2L, 4L), (3L, 4L)))
    assert(h(4L) === ((0L, Graph.Unit1M)), "pure sink: auth 1M, hub 0")
    Seq(1L, 2L, 3L).foreach { n =>
      assert(h(n) === ((Graph.Unit1M, 0L)), s"pure source $n: hub 1M, auth 0")
    }
  }

  test("HITS: the hub pointing at MORE authorities outranks (direction " +
      "matters — undirected PR ties what HITS separates)") {
    // hub 1 cites both authorities, hub 2 cites one
    val h = hitsOf(Seq((1L, 10L), (1L, 11L), (2L, 10L)))
    assert(h(1L)._1 === Graph.Unit1M, "two-citation hub is the top hub")
    assert(h(2L)._1 < h(1L)._1)
    // authority cited by both hubs outranks the one cited by one
    assert(h(10L)._2 === Graph.Unit1M)
    assert(h(11L)._2 < h(10L)._2)
  }

  test("HITS: one hand-computed sweep (iters = 1)") {
    // edges: 1->3, 2->3, 2->4
    //   auth raw: 3 <- hub(1)+hub(2) = 2M, 4 <- 1M; max 2M
    //   auth:     3 = 1M, 4 = 500000
    //   hub raw:  1 -> auth(3) = 1M, 2 -> auth(3)+auth(4) = 1.5M; max 1.5M
    //   hub:      1 = 666666 (floor), 2 = 1M
    val h = hitsOf(Seq((1L, 3L), (2L, 3L), (2L, 4L)), iters = 1)
    assert(h(3L)._2 === Graph.Unit1M)
    assert(h(4L)._2 === 500000L)
    assert(h(2L)._1 === Graph.Unit1M)
    assert(h(1L)._1 === 666666L)
  }

  test("HITS: renormalization pins the top of each side at exactly 1M") {
    val h = hitsOf(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)), iters = 7)
    assert(h.values.map(_._1).max === Graph.Unit1M)
    assert(h.values.map(_._2).max === Graph.Unit1M)
  }

  test("HITS: deterministic across partitioning; multi-edges count " +
      "per occurrence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (1L, 3L))
    assert(hitsOf(edges, parts = 1) === hitsOf(edges, parts = 8))
    // a doubled edge shifts mass toward its endpoints
    val doubled = hitsOf(Seq((1L, 10L), (1L, 10L), (2L, 11L)))
    assert(doubled(10L)._2 > doubled(11L)._2,
      "the double-cited authority must outrank")
  }

  test("ppmDiv: exact below 2^43; no Long overflow at web-scale " +
      "in-degrees; monotone and near-exact above") {
    // raw sums up to in_degree * 1M: 2e13 models a 2e7-in-degree hub
    // page — (raw * 1M) would overflow Long without the guard
    val cases = Seq(
      (1L, 1L), (999999L, 1000000L), (1L << 42, 1L << 42),
      ((1L << 42) - 7L, (1L << 42) + 5L), // straddles the shift cutoff
      (20000000000000L, 20000000000000L),
      (7777777777777L, 20000000000000L),
      (1L, 20000000000000L), (9223370000000000L, 9223372036854775L))
    val got = cases.toDF("ar", "am")
      .select(Graph.ppmDiv("ar", "am").as("ppm"))
      .collect().map(_.getLong(0)).toSeq
    got.foreach(v => assert(v >= 0L && v <= Graph.Unit1M,
      s"ppm out of range: $v"))
    cases.zip(got).foreach { case ((ar, am), v) =>
      val exact = (BigInt(ar) * Graph.Unit1M / BigInt(am)).toLong
      if (am < (1L << 43)) assert(v === exact,
        s"sub-2^43 must be bit-exact: ($ar, $am) -> $v != $exact")
      else assert(math.abs(v - exact) <= 1L,
        s"guarded quotient drifted: ($ar, $am) -> $v vs $exact")
    }
    // the full operator survives ppm sums past the old overflow bound:
    // hub seeds are 1M each, so a 9.3M-in-degree star's first auth sum
    // is 9.3e12 * ... exercised cheaply via one wide-ish star plus a
    // direct expression check above (a real 9.3M-edge frame is too
    // slow for a unit suite)
    val star = (1L to 2000L).map(i => (i, 0L)).toDF("src", "dst")
    val h = Graph.hits(star, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h(0L)._2 === Graph.Unit1M)
    assert(h(1L)._1 === Graph.Unit1M)
  }
}
