package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Graph analytics over pair tables (the near-dup graphs this library
  * already produces, link graphs a crawl pipeline carries): PageRank as
  * the authority-ranking complement to [[Dedup.connectedComponents]] —
  * the standard quality prior for web-scale corpus curation (rank hosts
  * or documents by link authority, then filter/weight by rank).
  */
object Graph {

  /** One-millionth units: scores and the damping factor live in exact
    * ppm-scaled longs, so every arithmetic step is integer add /
    * multiply / floor-divide — bit-identical across engines, partition
    * counts, and partial-aggregation orders (a double PageRank drifts
    * by ulps with summation order and can't be oracle-gated).
    */
  val Unit1M = 1000000L

  /** Deterministic quantized PageRank over an UNDIRECTED pair graph
    * (`id_a`, `id_b` — e.g. [[Dedup.jaccardPairs]] output or any edge
    * list). Fixed `iters` power iterations of the non-normalized
    * formulation: `score' = (1M − damping) + damping·Σ(contrib) / 1M`
    * with `contrib = score div degree` — floor divisions lose a little
    * mass (documented; ranking order is what the quality filter uses),
    * but make the fixpoint exactly reproducible: the DuckDB oracle
    * unrolls the same iterations (the e03 k-means precedent).
    *
    * Scale shape: per iteration, one join of the edge list to the score
    * table on the source id plus one aggregate on the destination id —
    * two hash shuffles over edges, no cartesian anywhere; the edge list
    * and degrees are materialized ONCE up front (via [[Materialize]] —
    * the pair generation feeding this is usually the expensive
    * subtree), and the score table's lineage is truncated every
    * [[CheckpointEvery]] iterations (the CC operators' rule), so a
    * 50-iteration run on a deep graph carries a bounded plan instead of
    * a 100-join lineage chain. Total work is O(iters · |E|) shuffled
    * rows.
    *
    * `tolPpm` (default 0 = off) adds an early convergence exit: after
    * each iteration past the first, stop when the maximum absolute
    * per-node score change is ≤ `tolPpm` ppm. The check is one extra
    * join+aggregate per iteration, so it is opt-in; leave it off when
    * the iteration count itself is the contract (the g01 oracle unrolls
    * exactly `iters` sweeps).
    *
    * Returns (doc_id, pr) — ppm-scaled long scores.
    */
  def pageRank(pairs: DataFrame, iters: Int = 5,
      dampingPpm: Long = 850000L, tolPpm: Long = 0L): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    require(dampingPpm >= 0 && dampingPpm <= Unit1M,
      s"pageRank: dampingPpm must be in [0, $Unit1M]")
    require(tolPpm >= 0, "pageRank: tolPpm must be >= 0 (0 = off)")
    val edges = Materialize(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    val degrees = Materialize(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val base = Unit1M - dampingPpm
    var scores = degrees.select(col("src").as("doc_id"),
      lit(Unit1M).cast(LongType).as("pr"))
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      // damping applied PER CONTRIBUTION, before the sum: the summed
      // damped contributions are bounded by the graph's total mass
      // (~N·1M), which fits a long for any realistic corpus, whereas
      // damping after the sum would overflow at ~10^7 nodes
      val contrib = edges
        .join(scores, edges("src") === scores("doc_id"))
        .join(degrees, Seq("src"))
        .select(col("dst"),
          expr(s"((pr * $dampingPpm) div $Unit1M) div deg").as("c"))
      val next0 = contrib.groupBy(col("dst").as("doc_id"))
        .agg(sum(col("c")).as("__m"))
        .select(col("doc_id"), (lit(base) + col("__m")).cast(LongType).as("pr"))
      // truncate on cadence (but not for the final round's output,
      // which is consumed exactly once); always when the convergence
      // check will read `next` twice (delta join + next round)
      val next =
        if (tolPpm > 0 ||
            ((i + 1) % CheckpointEvery == 0 && (i + 1) < iters))
          Materialize(next0)
        else next0
      if (tolPpm > 0) {
        val maxDelta = next.as("n")
          .join(scores.as("o"), col("n.doc_id") === col("o.doc_id"))
          .agg(max(abs(col("n.pr") - col("o.pr"))).as("d"))
          .head.getLong(0)
        converged = maxDelta <= tolPpm
      }
      scores = next
      i += 1
    }
    scores
  }

  /** Personalized PageRank — [[pageRank]] with the teleport mass
    * landing ONLY on a seed set, so scores measure authority *relative
    * to the seeds* (random walks restart at them): the
    * seed-set-expansion signal a curation pipeline uses to grow a
    * trusted slice — seed the domains/documents editors vetted, rank
    * the corpus by proximity, keep the head. Same exact integer ppm
    * arithmetic as [[pageRank]] (damping per contribution, base term
    * `1M − damping` added at seed nodes only, seed init 1M / non-seed
    * 0), so results are bit-stable on any topology and the oracle
    * replays the identical `div` chain. The seed set is broadcast (a
    * seed list is small by definition); per-iteration cost is the same
    * two O(|E|) hash shuffles as [[pageRank]], lineage truncated on
    * the [[CheckpointEvery]] cadence. Nodes outside the seed set's
    * reachable component score exactly 0 — drop them before
    * normalizing.
    */
  def personalizedPageRank(pairs: DataFrame, seeds: DataFrame,
      iters: Int = 5, dampingPpm: Long = 850000L): DataFrame = {
    require(iters >= 1, "personalizedPageRank: iters must be >= 1")
    require(dampingPpm >= 0 && dampingPpm <= Unit1M,
      s"personalizedPageRank: dampingPpm must be in [0, $Unit1M]")
    require(seeds.columns.length == 1,
      "personalizedPageRank: seeds must be a single id column, got " +
        seeds.columns.mkString("(", ", ", ")"))
    val edges = Materialize(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    val degrees = Materialize(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val base = Unit1M - dampingPpm
    val seedSet = broadcast(seeds.toDF("__sid").distinct()
      .withColumn("__seed", lit(true)))
    // an empty seed frame would silently zero every score — almost
    // certainly an upstream filter bug, so fail loudly (seed lists are
    // small by contract; the count is cheap)
    require(!seedSet.isEmpty,
      "personalizedPageRank: seeds is empty — every score would be 0")
    var scores = degrees
      .join(seedSet, degrees("src") === seedSet("__sid"), "left")
      .select(col("src").as("doc_id"),
        when(col("__seed"), lit(Unit1M)).otherwise(lit(0L))
          .cast(LongType).as("pr"))
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(scores, edges("src") === scores("doc_id"))
        .join(degrees, Seq("src"))
        .select(col("dst"),
          expr(s"((pr * $dampingPpm) div $Unit1M) div deg").as("c"))
      val next0 = contrib.groupBy(col("dst").as("doc_id"))
        .agg(sum(col("c")).as("__m"))
        .join(seedSet, col("doc_id") === col("__sid"), "left")
        .select(col("doc_id"),
          (when(col("__seed"), lit(base)).otherwise(lit(0L)) + col("__m"))
            .cast(LongType).as("pr"))
      scores =
        if ((i + 1) % CheckpointEvery == 0 && (i + 1) < iters)
          Materialize(next0)
        else next0
      i += 1
    }
    scores
  }

  /** Score-table lineage truncation cadence for [[pageRank]] — every
    * N iterations the accumulated join chain is cut (the
    * [[Dedup.connectedComponents]] convention). Small enough that a
    * deep run never builds an unanalyzable plan, large enough that the
    * materialization cost stays a rounding error next to the per-
    * iteration shuffles.
    */
  val CheckpointEvery = 5

  /** HITS hubs and authorities (Kleinberg, JACM '99) over a DIRECTED
    * edge list (`src`, `dst`) — the two-sided complement to
    * [[pageRank]]'s single authority score: a crawl-curation pipeline
    * wants BOTH "which pages are cited by good hubs" (authority — the
    * quality prior for content) and "which pages point at good
    * content" (hub — the quality prior for link/index pages, and the
    * frontier-expansion signal for the crawler itself). Direction
    * matters here, so the input is an edge list as-crawled, not the
    * symmetrized pair graph the undirected operators take.
    *
    * Fixed `iters` power sweeps of the mutual recursion in EXACT ppm
    * integers (the [[Unit1M]] contract): `auth'(v) = Σ_{u→v} hub(u)`,
    * `hub'(u) = Σ_{u→v} auth'(v)` — each side renormalized per sweep
    * by its MAXIMUM (`x·1M div max`), not the classic L2 norm: a
    * per-sweep positive scalar keeps the power iteration's direction
    * and every ranking identical, but `max` + floor-division is
    * bit-reproducible across engines and summation orders where an L2
    * `sqrt`-of-a-double-sum drifts with partial-aggregation order (the
    * g01 determinism rule; the g07 oracle unrolls the identical `//`
    * chain). The top hub and top authority read exactly 1M each sweep.
    * Nodes with no in-edges score auth 0, no out-edges hub 0;
    * multi-edges count once per occurrence (adjacency-matrix
    * semantics — `distinct` the input to collapse them).
    *
    * Overflow guard: a raw sum is bounded by in-degree × 1M, so the
    * naive `(raw * 1M) div max` multiply overflows Long past
    * in-degree ~9.2×10⁶ — real for a web-scale crawl graph's hub
    * pages. [[ppmDiv]] pre-scales BOTH sides of the division by a
    * shared power of two whenever the max is wide enough that the
    * multiply could overflow (`bin()`-length bit count, pure integer
    * ops — deterministic), which keeps the quotient exact to within
    * 1 part in ~4×10¹² and leaves every sub-2⁴³ sweep bit-identical
    * to the unscaled arithmetic the g07 oracle unrolls.
    *
    * Scale shape: per sweep, two O(|E|) hash-join+aggregate passes
    * (edges→hub on src grouped by dst, then edges→auth on dst grouped
    * by src) plus two single-row max aggregates broadcast back — no
    * cartesian, no collect; edges and the node universe are
    * materialized once up front, and the hub table's lineage is cut on
    * the [[CheckpointEvery]] cadence. Total work O(iters · |E|)
    * shuffled rows, the same envelope as [[pageRank]].
    *
    * Returns (doc_id, hub, auth) — ppm-scaled longs over the node
    * universe (every id appearing as src or dst).
    */
  /** `(raw * 1M) div mx` with an overflow guard: when `mx` needs more
    * than 43 bits (so `raw * 1M` with `raw <= mx` could exceed Long),
    * both operands are shifted right by the shared excess first —
    * `raw >> s <= mx >> s < 2^43`, so the multiply stays in range and
    * the quotient keeps ~43 significant bits. `bin()` length is the
    * bit count (pure integer/string ops, deterministic); `s = 0`
    * below 2^43 leaves the arithmetic bit-identical to the unguarded
    * form the gated oracles unroll. Both columns must be positive
    * Longs (raw sums of ppm scores — always >= 1 for any node that
    * reaches the renorm join).
    */
  private[functions] def ppmDiv(raw: String, mx: String): Column = {
    val s = s"greatest(0, length(bin($mx)) - 43)"
    expr(s"(shiftright($raw, $s) * $Unit1M) div " +
      s"greatest(shiftright($mx, $s), 1)")
  }

  def hits(edgeList: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    val edges = Materialize(edgeList.select(
      col("src").cast(LongType).as("src"),
      col("dst").cast(LongType).as("dst")))
    val nodes = Materialize(edges.select(col("src").as("doc_id"))
      .unionByName(edges.select(col("dst").as("doc_id"))).distinct())
    var hub = nodes.select(col("doc_id").as("id"),
      lit(Unit1M).cast(LongType).as("hub"))
    var auth: DataFrame = null
    var i = 0
    while (i < iters) {
      // each raw-sum frame is read TWICE (its max aggregate + the
      // renorm join), so it is materialized every sweep — the pageRank
      // tolPpm rule: an unmaterialized double reference doubles the
      // plan per read and the sweep chain would grow 4^iters. The
      // frames are node-cardinality, a rounding error next to the
      // O(|E|) join that produced them.
      val araw = Materialize(
        edges.join(hub, edges("src") === hub("id"))
          .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("ar")))
      val amax = araw.agg(max(col("ar")).as("am"))
      val authK = araw.crossJoin(broadcast(amax))
        .select(col("id"), ppmDiv("ar", "am").as("auth"))
      val hraw = Materialize(
        edges.join(authK, edges("dst") === authK("id"))
          .groupBy(col("src").as("id")).agg(sum(col("auth")).as("hr")))
      val hmax = hraw.agg(max(col("hr")).as("hm"))
      val hubK = hraw.crossJoin(broadcast(hmax))
        .select(col("id"), ppmDiv("hr", "hm").as("hub"))
      hub = hubK
      auth = authK
      i += 1
    }
    nodes.join(hub.select(col("id").as("doc_id"), col("hub")),
        Seq("doc_id"), "left")
      .join(auth.select(col("id").as("doc_id"), col("auth")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hub"), lit(0L)).cast(LongType).as("hub"),
        coalesce(col("auth"), lit(0L)).cast(LongType).as("auth"))
  }

  /** Per-node triangle counts over an UNDIRECTED pair graph — the
    * clustering-coefficient numerator (spam/boilerplate link farms are
    * triangle-dense; a curation pipeline uses the count as a graph
    * quality prior next to [[pageRank]]'s authority score).
    *
    * Degree-ordered orientation (Suri & Vassilvitskii, "Counting
    * triangles and the curse of the last reducer", WWW'11, public):
    * every canonical edge is oriented from its lower-(degree, id)
    * endpoint to the higher, which bounds every node's out-degree by
    * O(√E) regardless of the degree distribution — the celebrity node
    * that would otherwise emit deg² wedges from one reducer instead
    * RECEIVES its wedges. Wedge generation is one self-join of the
    * oriented edges on the shared source (Σ out-deg² = O(E^1.5) wedge
    * rows worst case, each a fixed-width triple), the closing check is
    * one hash join back to the oriented edges, and every triangle
    * materializes exactly once (at its unique minimum-(degree, id)
    * vertex). Three hash shuffles total, no cartesian, no single hot
    * reducer.
    *
    * Returns (doc_id, n_triangles) for every node incident to at least
    * one edge (0 for triangle-free nodes).
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val canon = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val sym = canon.select(col("a").as("x"), col("b").as("y"))
      .unionByName(canon.select(col("b").as("x"), col("a").as("y")))
    val deg = sym.groupBy(col("x").as("id")).agg(count(lit(1)).as("deg"))
    // orient each edge lower-(deg, id) → higher; a<b by construction,
    // so the id tie-break reduces to da <= db — written in full so the
    // orientation is self-evidently a total order
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = Materialize(canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(lowFirst, col("a")).otherwise(col("b")).as("src"),
        when(lowFirst, col("b")).otherwise(col("a")).as("dst"),
        when(lowFirst, col("db")).otherwise(col("da")).as("ddeg")))
    // wedges at the minimum vertex: the two out-neighbors ordered by
    // (deg, id) so the closing edge, if present, is oriented d1 → d2
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src") &&
        (col("e1.ddeg") < col("e2.ddeg") ||
          (col("e1.ddeg") === col("e2.ddeg") &&
            col("e1.dst") < col("e2.dst"))))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
    val tris = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("t"))
    deg.select(col("id"))
      .join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("t"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient per node: `2·t / (deg·(deg−1))` —
    * how close each node's neighborhood is to a clique, the standard
    * tightly-knit-community signal next to [[triangleCounts]]'s raw
    * counts (link farms and mirror clusters sit near 1; organic link
    * graphs near 0). Degree-1 nodes get 0.0 (no possible triangle).
    *
    * The division is ONE IEEE double over exact integers — the
    * d14/t09 determinism convention, so the ratio is engine-portable
    * and oracle-gated. Cost on top of [[triangleCounts]]: one
    * partial-aggregatable degree count over the pair frame plus a
    * label join — the triangle machinery dominates.
    *
    * Returns (doc_id, degree, n_triangles, coeff).
    */
  def clusteringCoefficients(pairs: DataFrame): DataFrame = {
    val canon = pairs.select(
        least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    triangleCounts(pairs)
      .join(deg, col("doc_id") === col("id"))
      .select(col("doc_id"), col("degree"), col("n_triangles"),
        when(col("degree") > 1,
          (col("n_triangles") * 2).cast(DoubleType) /
            (col("degree") * (col("degree") - 1)).cast(DoubleType))
          .otherwise(lit(0.0)).as("coeff"))
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert & Kumara, arXiv:0709.2938) made deterministic: labels start
    * as node ids; each round EVERY node simultaneously adopts the most
    * frequent label among its neighbors, ties broken by the smallest
    * label. The published algorithm is asynchronous with random visit
    * order and random tie-breaks — unreproducible across runs, let
    * alone engines; the synchronous min-tie-break variant is a pure
    * function of the graph, so a fixed `iters` run is oracle-gated
    * round for round (g05; the g01/g04 unrolled-fixpoint convention).
    * Communities = groups of near-dup documents / mutually linked hosts
    * — the label is the community's smallest member id, directly usable
    * as a [[Dedup.connectedComponents]]-style cluster key but honoring
    * DENSITY (a thin bridge between two dense clusters does not merge
    * them the way CC does).
    *
    * Scale shape per round: one hash join of the symmetric edge list to
    * the label table (on the source id) + one count per (node,
    * neighbor-label) + one partial-aggregatable `min(struct(-count,
    * label))` arg-max per node — two shuffles of O(|E|) fixed-width
    * rows, no window, no cartesian, no hot reducer. Label lineage is
    * truncated every [[CheckpointEvery]] rounds (the [[pageRank]]
    * rule). Fixed iteration count by design: synchronous LPA can
    * 2-cycle on bipartite structures, so "run to convergence" is not
    * well-defined — pick `iters` ≥ the expected community diameter.
    *
    * Returns (doc_id, community) for every node with at least one edge.
    */
  def labelPropagation(pairs: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, "labelPropagation: iters must be >= 1")
    // self-loops filtered on the PAIR frame so BOTH directions are
    // clean — filtering only the forward select would let an
    // id_a == id_b row back in via the reversed half (a self-vote
    // every round, diverging from the g05 oracle's two-sided filter)
    val noLoops = pairs.filter(col("id_a") =!= col("id_b"))
    val edges = Materialize(
      noLoops.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(noLoops.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct())
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lab"))
    var i = 0
    while (i < iters) {
      val votes = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst"), col("lab")).agg(count(lit(1)).as("c"))
      // arg-max by (count desc, label asc) as ONE partial-aggregatable
      // min over struct(-count, label) — no per-node window sort
      val next0 = votes.groupBy(col("dst").as("id"))
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("l"))).as("w"))
        .select(col("id"), col("w.l").as("lab"))
      labels =
        if ((i + 1) % CheckpointEvery == 0 && (i + 1) < iters)
          Materialize(next0)
        else next0
      i += 1
    }
    labels.select(col("id").as("doc_id"), col("lab").as("community"))
  }

  /** k-core of an UNDIRECTED pair graph: the maximal subgraph in which
    * every vertex keeps degree ≥ k — the standard "dense nucleus"
    * extractor (a boilerplate/mirror cluster is a high-k core; a
    * curation pipeline prunes or down-weights cores the way it uses
    * [[pageRank]] and [[clusteringCoefficients]] as priors).
    *
    * Iterative peeling to the FIXPOINT: each round computes degrees
    * (one partial-aggregatable groupBy over the directed edge list),
    * finds vertices below k, and drops their incident edges (two hash
    * anti-joins). The peel set shrinks monotonically, so the loop
    * terminates in at most the graph's degeneracy-peel depth; each
    * round's edge frame is materialized (the [[Dedup
    * .connectedComponents]] convention) — it is read three times next
    * round and lineage must not stack. Cost O(rounds · |E|) shuffled
    * rows; no cartesian, no hot reducer (the aggregate is map-side
    * combined). A pathological path graph peels O(|V|) rounds —
    * `maxIters` caps runaway depth loudly rather than silently
    * returning a non-core.
    *
    * Returns (doc_id, core_deg) for exactly the k-core members;
    * core_deg is the degree WITHIN the core (≥ k by construction).
    */
  def kCore(pairs: DataFrame, k: Int, maxIters: Int = 100): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    require(maxIters >= 1, "kCore: maxIters must be >= 1")
    // two-sided self-loop filter (the labelPropagation rule): a loop
    // would count toward its node's degree via the reversed half and
    // keep a sub-k vertex alive past the peel
    val noLoops = pairs.filter(col("id_a") =!= col("id_b"))
    var edges = Materialize(
      noLoops.select(col("id_a").as("v"), col("id_b").as("u"))
        .unionByName(noLoops.select(col("id_b").as("v"), col("id_a").as("u")))
        .distinct())
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      val bad = Materialize(
        edges.groupBy(col("v")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") < k).select(col("v").as("__bad")))
      if (bad.isEmpty) done = true
      else {
        edges = Materialize(
          edges.join(bad, edges("v") === bad("__bad"), "left_anti")
            .join(bad, edges("u") === bad("__bad"), "left_anti"))
      }
      i += 1
    }
    if (!done) throw new IllegalStateException(
      s"kCore: no fixpoint after $maxIters peel rounds — raise maxIters " +
        "(pathological chain graphs peel O(|V|) rounds)")
    edges.groupBy(col("v").as("doc_id")).agg(count(lit(1)).as("core_deg"))
  }
}
