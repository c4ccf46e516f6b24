package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end near-dedup composition (`Dedup.dedupNear`, VERDICT r6 #5):
  * pairs → connected components → keep-one representative → surviving
  * rows. The d12 gate proves the min-id policy against the DuckDB
  * transitive-closure oracle on real data; here we pin the semantics on
  * a corpus with KNOWN cluster structure, the keepBy policy (not
  * SQL-expressible in the gate), and the plan shape.
  */
class DedupNearSpec extends SparkSpec {
  import spark.implicits._

  // two exact-dup clusters ({1,2,5} and {6,7}) + two unique docs; word
  // 3-gram Jaccard of identical texts = 1.0, of unrelated texts = 0
  private lazy val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon", 0.2),
    (2L, "alpha beta gamma delta epsilon", 0.9),
    (5L, "alpha beta gamma delta epsilon", 0.5),
    (3L, "one two three four five", 0.1),
    (4L, "zebra yak xylophone walrus vulture", 0.3),
    (6L, "red orange yellow green blue", 0.4),
    (7L, "red orange yellow green blue", 0.4)
  ).toDF("doc_id", "text", "score")

  test("min-id policy keeps the smallest id per cluster plus all singletons") {
    val out = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8)
    // schema passes through unchanged
    assert(out.columns.toSeq == Seq("doc_id", "text", "score"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 6L))
  }

  test("keepBy policy keeps the best-scoring member, ties broken by min id") {
    val out = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
        keepBy = Some(col("score")))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // cluster {1,2,5}: doc 2 has the top score; cluster {6,7}: scores
    // tie at 0.4 so min id 6 wins; singletons 3,4 survive untouched
    assert(out == Seq(2L, 3L, 4L, 6L))
  }

  test("shuffled-anti-join fallback produces the identical result") {
    val a = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
        broadcastDrops = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("dedupIncremental: corpus dups die first, then within-batch keep-one") {
    // existing corpus: the {alpha...} text and one unique doc
    val existing = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "keep this corpus document intact")
    ).toDF("doc_id", "text")
    // batch: 1 duplicates the corpus (dropped in stage 1), {2,3} are a
    // within-batch cluster cross-unique to the corpus (stage 2 keeps 2),
    // 4 is genuinely new
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "red orange yellow green blue"),
      (3L, "red orange yellow green blue"),
      (4L, "zebra yak xylophone walrus vulture")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupIncremental(batch, existing,
        col("doc_id"), col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 4L))
    // a batch id EQUAL to a corpus id must not mix sides: batch doc 100
    // (unique text) survives even though corpus doc 100 exists
    val collide = Seq((100L, "totally different arriving text here"))
      .toDF("doc_id", "text")
    val out2 = Dedup.dedupIncremental(collide, existing,
        col("doc_id"), col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out2 == Seq(100L))
    // keepBy passes through to the within-batch stage
    val scored = batch.withColumn("score",
      when(col("doc_id") === 3, 9.0).otherwise(1.0))
    val out3 = Dedup.dedupIncremental(scored, existing,
        col("doc_id"), col("text"), 0.8, keepBy = Some(col("score")))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out3 == Seq(3L, 4L))
  }

  test("ngramOverlapPairsBloom equals the exact path bit-for-bit and " +
      "actually pre-screens the corpus side") {
    val corpusDocs = Seq(
      (20L, "alpha beta gamma delta epsilon zeta"), // leaks benchmark 1
      (21L, "one two three four five six seven"),
      (22L, "totally unrelated corpus words here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "eight nine ten eleven twelve thirteen")
    ).toDF("doc_id", "text")
    val cs = Dedup.shingleRows(corpusDocs, col("doc_id"), col("text"))
    val bs = Dedup.shingleRows(bench, col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
    val exact = rows(Dedup.ngramOverlapPairs(cs, bs, minCommon = 2))
    val bloom = rows(Dedup.ngramOverlapPairsBloom(cs, bs, minCommon = 2))
    assert(exact == bloom)
    assert(exact.nonEmpty, "fixture must produce a real contamination hit")
    // the pre-screen really fires: doc 22's shingles (no bench overlap)
    // never reach the join input
    val screened = cs.filter(
      org.apache.spark.sql.GraftExpressionBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.GraftExpressionBridge.expression(lit {
            val h = bs.select(xxhash64(col("shingle")).as("__h")).distinct()
            val bf = h.stat.bloomFilter("__h", 100L, 0.01)
            val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
            bos.toByteArray
          }),
          org.apache.spark.sql.GraftExpressionBridge.expression(
            xxhash64(col("shingle"))))))
    val screenedDocs = screened.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(screenedDocs.contains(20L) && !screenedDocs.contains(22L),
      s"bloom must keep the leaking doc and drop the unrelated one: $screenedDocs")
    // and the probe is a codegen'd filter, not a UDF
    val plan = Dedup.ngramOverlapPairsBloom(cs, bs, minCommon = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"probe must stay inside codegen:\n$plan")
    // the one-call decontaminate drops exactly the leaking doc, same
    // result with the pre-screen on or off, schema passed through
    val kept = Dedup.decontaminate(corpusDocs, bench,
      col("doc_id"), col("text"), minCommon = 2)
    assert(kept.columns.toSeq == corpusDocs.columns.toSeq)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(21L, 22L))
    val keptExact = Dedup.decontaminate(corpusDocs, bench,
        col("doc_id"), col("text"), minCommon = 2, bloomPrescreen = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptExact == Seq(21L, 22L))
  }

  test("crossJaccardPairs scores the asymmetric pairs exactly") {
    val a = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val b = Seq((7L, "alpha beta gamma delta epsilon"),
      (8L, "unrelated words entirely here now")).toDF("doc_id", "text")
    val got = Dedup.crossJaccardPairs(
        Dedup.shingleRows(a, col("doc_id"), col("text")),
        Dedup.shingleRows(b, col("doc_id"), col("text")), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 7L, 1.0)))
  }

  test("plan shape: the keep step is a broadcast anti-join (no new wide stage)") {
    val out = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"expected an anti-join keep step:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"drop list must reach df as a BROADCAST anti-join — a shuffle " +
        s"here would re-partition the full corpus at scale:\n$p")
  }

  test("MinHashLsh strategy keeps the same survivors as Exact on a " +
      "total-recall corpus (identical texts always collide)") {
    val exact = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val lsh = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
      strategy = Dedup.MinHashLsh(bands = 4, rowsPerBand = 2))
    assert(lsh.columns.toSeq == Seq("doc_id", "text", "score"))
    assert(lsh.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == exact)
    // keepBy composes with the strategy
    val scored = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
        keepBy = Some(col("score")),
        strategy = Dedup.MinHashLsh(bands = 4, rowsPerBand = 2))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(scored == Seq(2L, 3L, 4L, 6L))
  }

  test("Containment strategy drops a doc embedded verbatim in a larger one " +
      "that Jaccard keeps") {
    val df = Seq(
      // doc 2 = doc 1's text embedded in a much larger document:
      // containment(1,2) = 1.0, jaccard(1,2) well below 0.8
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon one two three four five six " +
        "seven eight nine ten eleven twelve thirteen fourteen fifteen"),
      (3L, "unrelated corpus document words here")
    ).toDF("doc_id", "text")
    val jac = Dedup.dedupNear(df, col("doc_id"), col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val con = Dedup.dedupNear(df, col("doc_id"), col("text"), 0.8,
        strategy = Dedup.Containment())
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(jac == Seq(1L, 2L, 3L), "Jaccard ships the embedded duplicate")
    assert(con == Seq(1L, 3L), "Containment collapses it to the min id")
  }

  test("dedupIncremental threads the strategy into its within-batch stage") {
    val existing = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "red orange yellow green blue"),
      (3L, "red orange yellow green blue"),
      (4L, "zebra yak xylophone walrus vulture")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupIncremental(batch, existing,
        col("doc_id"), col("text"), 0.8,
        strategy = Dedup.MinHashLsh(bands = 4, rowsPerBand = 2))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 4L))
  }

  test("MinHashLsh.sized picks the sharpest banding that meets the recall " +
      "floor within the signature budget") {
    val cfg = Dedup.MinHashLsh.sized(0.8, minRecall = 0.95, maxSignature = 16)
    assert(cfg.bands * cfg.rowsPerBand <= 16)
    assert(Dedup.MinHashLsh.recallAt(0.8, cfg.bands, cfg.rowsPerBand) >= 0.95)
    // no sharper r fits: either the budget breaks or so would recall
    val sharper = (cfg.rowsPerBand + 1 to 16).forall { r =>
      val bNeeded = math.ceil(
        math.log(0.05) / math.log(1.0 - math.pow(0.8, r))).toInt.max(1)
      bNeeded * r > 16
    }
    assert(sharper, s"a sharper r than ${cfg.rowsPerBand} fits the budget")
    // the S-curve is selective where it should be: sub-threshold pairs
    // collide far less often than threshold pairs
    assert(Dedup.MinHashLsh.recallAt(0.4, cfg.bands, cfg.rowsPerBand) <
      0.5 * Dedup.MinHashLsh.recallAt(0.8, cfg.bands, cfg.rowsPerBand))
    // the sized config runs end-to-end through dedupNear
    val out = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
        strategy = cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 3L, 4L, 6L))
    // unreachable floors fail loudly, never silently under-recall
    intercept[IllegalArgumentException] {
      Dedup.MinHashLsh.sized(0.1, minRecall = 0.999, maxSignature = 4)
    }
  }

  test("MinHashLsh.sized survives t^r underflow and defends the recall floor") {
    // t = 0.3 at budget 32: (b = 9, r = 1) is the valid config — the old
    // log(1 - t^r) form underflowed at r = 32 (1.0 - t^32 == 1.0 in
    // doubles), collapsed b to 1, and returned (1, 32) with recall ~ 0
    val cfg = Dedup.MinHashLsh.sized(0.3, maxSignature = 32)
    assert(cfg.bands * cfg.rowsPerBand <= 32)
    assert(Dedup.MinHashLsh.recallAt(0.3, cfg.bands, cfg.rowsPerBand) >= 0.95,
      s"recall floor broken: $cfg")
    // t = 0.09 at the default budget genuinely cannot reach the floor:
    // loud failure, never a recall-0 config
    intercept[IllegalArgumentException] { Dedup.MinHashLsh.sized(0.09) }
    // and every returned config across a threshold sweep meets the floor
    for (t <- Seq(0.2, 0.35, 0.5, 0.65, 0.8, 0.95)) {
      val c = Dedup.MinHashLsh.sized(t, maxSignature = 32)
      assert(Dedup.MinHashLsh.recallAt(t, c.bands, c.rowsPerBand) >= 0.95,
        s"recall floor broken at t=$t: $c")
    }
  }

  test("Auto strategy: guarded Exact below the size budget, sized LSH above") {
    assert(Dedup.resolveStrategy(Dedup.Auto(), 0.8, 100L) ==
      Dedup.Exact(10000))
    Dedup.resolveStrategy(Dedup.Auto(), 0.8, 200000L) match {
      case m: Dedup.MinHashLsh =>
        assert(m.maxShingleDocFreq == 10000, "finite guard must survive")
        assert(Dedup.MinHashLsh.recallAt(0.8, m.bands, m.rowsPerBand) >= 0.95)
      case other => fail(s"expected MinHashLsh above the budget, got $other")
    }
    // explicit strategies pass through untouched — even unguarded Exact
    assert(Dedup.resolveStrategy(Dedup.Exact(), 0.8, 1L << 40) ==
      Dedup.Exact())
    // the default end-to-end call resolves to Exact here and matches it
    val auto = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val exact = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
        strategy = Dedup.Exact())
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(auto == exact)
  }

  /** User-requested broadcast-hint count across every join of the
    * optimized plan — hint-level, so the assertion holds regardless of
    * AQE or auto-broadcast size estimates.
    */
  private def broadcastHintCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    df.queryExecution.optimizedPlan.collect {
      case j: Join =>
        Seq(j.hint.leftHint, j.hint.rightHint).flatten
          .count(_.strategy.contains(BROADCAST))
    }.sum
  }

  test("broadcastDrops=false removes EVERY broadcast from the keepBy path " +
      "(cc member join included) and keeps the result identical") {
    val bcast = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
      keepBy = Some(col("score")), strategy = Dedup.Exact())
    val shuffled = Dedup.dedupNear(corpus, col("doc_id"), col("text"), 0.8,
      keepBy = Some(col("score")), broadcastDrops = false,
      strategy = Dedup.Exact())
    assert(broadcastHintCount(bcast) >= 2,
      "default path should broadcast both the cc labels and the drop list")
    assert(broadcastHintCount(shuffled) == 0,
      s"broadcastDrops=false must leave no unconditional broadcast:\n" +
        shuffled.queryExecution.optimizedPlan)
    assert(
      bcast.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        shuffled.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("decontaminate broadcastDrops=false is hash-identical, broadcast-free") {
    val corpusDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated corpus document here"),
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    val bench = Seq((90L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bc = Dedup.decontaminate(corpusDf, bench, col("doc_id"), col("text"),
      minCommon = 2L)
    val nb = Dedup.decontaminate(corpusDf, bench, col("doc_id"), col("text"),
      minCommon = 2L, broadcastDrops = false)
    assert(broadcastHintCount(nb) == 0,
      s"broadcastDrops=false must drop the hint:\n${nb.queryExecution.optimizedPlan}")
    assert(bc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      nb.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(nb.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("contaminationReport attributes leaks to the right benchmark") {
    val corpusDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // leaks benchA
      (2L, "totally unrelated corpus document here"),
      (3L, "one two three four five six"),           // leaks benchB
      (4L, "one two three four five six")            // leaks benchB too
    ).toDF("doc_id", "text")
    // bench ids deliberately COLLIDE with corpus ids — the composite
    // id must keep the sides apart
    val bench = Seq(
      (1L, "benchA", "alpha beta gamma delta epsilon zeta"),
      (2L, "benchB", "one two three four five six"),
      (3L, "benchB", "seven eight nine ten eleven twelve")
    ).toDF("doc_id", "eval_set", "text")
    val rep = Dedup.contaminationReport(corpusDf, bench,
        col("doc_id"), col("text"), col("doc_id"), col("eval_set"),
        minCommon = 2L)
      .orderBy("eval_set").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.toSeq == Seq(
      ("benchA", 1L, 1L, 1L),   // doc 1 x benchA item 1
      ("benchB", 2L, 1L, 2L)))  // docs 3,4 x benchB item 2
  }

  /** Joins whose condition equates two shingle-hash attributes WITHOUT
    * any doc-id equality gate — the Σ df² self-join shape the LSH
    * strategy exists to avoid. Exact's pair stage is exactly one of
    * these; in the LSH plan the only h = h join is the candidate-gated
    * verify (which also equates a pair id to a doc id).
    */
  private def ungatedShingleSelfJoins(
      df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isDefined =>
        val eqs = j.condition.get.collect {
          case EqualTo(a: AttributeReference, b: AttributeReference) => (a.name, b.name)
        }
        val hEq = eqs.exists { case (a, b) => a == "h" && b == "h" }
        val idGate = eqs.exists { case (a, b) => a != "h" || b != "h" }
        if (hEq && !idGate) 1 else 0
    }.sum
  }

  test("plan shape: Exact pairs ARE the full shingle self-join; the LSH " +
      "plan contains none (banded candidates + gated verify only)") {
    val sh = Dedup.shingleRows(corpus, col("doc_id"), col("text"))
    val exactPairs = Dedup.nearDupPairs(sh, 0.8, Dedup.Exact())
    val lshPairs = Dedup.nearDupPairs(sh, 0.8,
      Dedup.MinHashLsh(bands = 4, rowsPerBand = 2))
    assert(ungatedShingleSelfJoins(exactPairs) == 1,
      s"Exact must pair via the inverted-index self-join:\n" +
        exactPairs.queryExecution.optimizedPlan)
    assert(ungatedShingleSelfJoins(lshPairs) == 0,
      s"LSH plan must never contain an ungated shingle self-join:\n" +
        lshPairs.queryExecution.optimizedPlan)
    // and the signatures actually made it into the plan
    assert(lshPairs.queryExecution.optimizedPlan.toString.contains("md5"))
  }

  test("jaccardForPairs: broadcastPairs=false is hash-identical and drops " +
      "the broadcast from the pair side of the plan") {
    val sh = Dedup.shingleRows(corpus, col("doc_id"), col("text"))
    val cands = Dedup.lshCandidatePairs(Dedup.minhashSignatures(sh, 8), 4, 2)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
    val bc = Dedup.jaccardForPairs(sh, cands, 0.8)
    val nb = Dedup.jaccardForPairs(sh, cands, 0.8, broadcastPairs = false)
    assert(bc.collect().map(key).sortBy(identity).toSeq ==
      nb.collect().map(key).sortBy(identity).toSeq)
    assert(bc.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "default path must carry the broadcast hint on the pair list")
    assert(!nb.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "broadcastPairs=false must leave NO broadcast hint anywhere — the " +
        "pair join then shuffles on the id keys (driver-safe at scale)")
    // with auto-broadcast off, the unhinted plan must show no
    // BroadcastExchange at all — proving the flag, not the size
    // estimator, decides the join strategy
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val nb2 = Dedup.jaccardForPairs(sh, cands, 0.8, broadcastPairs = false)
      assert(!nb2.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        s"pair side must not materialize a BroadcastExchange:\n" +
          nb2.queryExecution.executedPlan)
      val bc2 = Dedup.jaccardForPairs(sh, cands, 0.8)
      assert(bc2.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "hinted path must still broadcast under threshold -1")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
