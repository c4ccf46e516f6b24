package graft

/** Physical-plan assertions: the properties that make these queries scale
  * are pinned here so a regression (lost pushdown, un-broadcast join,
  * codegen fallback) fails CI, not a 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01: filter and column pruning reach the parquet scan") {
    val f = formatted("q01_filter_project")
    assert(f.contains("PushedFilters:") &&
      (f.contains("LessThan(l_shipdate") || f.contains("GreaterThan(l_quantity")),
      s"filters not pushed:\n$f")
    // pruned read schema: no l_partkey/l_suppkey/l_tax in the scan
    assert(!f.contains("l_partkey"), "scan reads pruned column l_partkey")
  }

  test("q04: dimension joins are broadcast, fact side not shuffled for the join") {
    val p = plan("q04_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join fell back to SMJ:\n$p")
  }

  test("q03: hash aggregate with map-side partial aggregation") {
    val p = plan("q03_group_multi")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means map-side combine before the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      s"no partial aggregation:\n$p")
  }

  test("q13: global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan("q13_topk_global")
    assert(p.contains("TakeOrderedAndProject"), s"top-k plans a full sort:\n$p")
  }

  test("q06: EXISTS semantics plan as a semi join (no row explosion)") {
    val p = plan("q06_join_semi")
    assert(p.contains("LeftSemi"), p)
  }

  test("whole-stage codegen spans the scan→filter→project pipeline") {
    // AQE materializes the final plan lazily — execute first, then the
    // WholeStageCodegen spans are visible in executedPlan. (q03, not q01:
    // q01 selects zero rows at sf0.001 and AQE rewrites the whole plan to
    // EmptyRelation.)
    val df = SparkEntry.queries("q03_group_multi")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages print as `*(n)` in the compact plan form
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
  }

  test("e01: corpus side is streamed against a broadcast of the queries") {
    val p = plan("e01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"ANN scoring shuffles the corpus:\n$p")
  }

  test("banded near-dup candidate stages scan their input once (exchange reuse)") {
    // the self-join's two sides are the SAME exploded (table, bucket)
    // projection, so the second side must reuse the first's shuffle
    // exchange: the scan + quantize/signature + bucket projection — the
    // expensive part — appears once in the executed plan, not once per
    // side (or worse, once per table branch, the pre-round-5 d06 shape).
    // Auto-broadcast is disabled so the joins take the shuffle path they
    // would at corpus scale (a broadcast build side at sf0.001 has no
    // exchange to reuse and hides the property under test). d06 allows
    // 2 scans: its gate unions the corpus with planted duplicates,
    // reading the parquet twice BELOW the candidate stage; e02's two
    // scans are corpus + queries (different subsets, query side an
    // explicit broadcast hint).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((name, maxScans) <- Seq(
          "d07_simhash_pairs" -> 1, "d06_embedding_neardup" -> 2,
          "e02_knn_lsh" -> 2)) {
        // sf0.01, NOT sf0.001: DedupSimilaritySpec caches the sf0.001
        // documents/embeddings relations, and the cache manager would
        // substitute InMemoryRelation here — whose printed form embeds
        // the cached child's FileScan lines, breaking the scan count
        val df = SparkEntry.queries(name)(spark, sf("sf0.01"))
        df.collect() // AQE: reused stages only visible in the final plan
        // AdaptiveSparkPlan prints "== Final Plan ==" then "== Initial
        // Plan ==" (pre-reuse); only the final section is what executed
        val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        val scans = "Scan parquet".r.findAllIn(p).length
        assert(scans <= maxScans,
          s"$name candidate stage re-scans its input ($scans scans > $maxScans):\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("round-6 operators: no cartesians, zero-shuffle scans, single-shuffle rank") {
    // d11 decontamination: inverted-index equi-join, never a cartesian
    val d11 = plan("d11_decontamination")
    assert(!d11.contains("CartesianProduct") &&
      !d11.contains("BroadcastNestedLoopJoin"),
      s"d11 candidate stage degenerated to a cross product:\n$d11")
    // t06 sampling + t07 regex scan: pure codegen'd filter/projection —
    // the only exchange allowed is the output ORDER BY's range exchange
    for (name <- Seq("t06_stratified_sample", "t07_regex_scan")) {
      val p = plan(name)
      val exchanges = "Exchange".r.findAllIn(p).length
      assert(exchanges <= 1, s"$name shuffles beyond its output sort:\n$p")
    }
    // t08 top-k per group: one shuffle on the group key + the output
    // sort; a global Sort over all rows before ranking would be wrong
    val t08 = plan("t08_top_per_group")
    assert("Exchange".r.findAllIn(t08).length <= 2,
      s"t08 shuffles more than (group key, output sort):\n$t08")
    assert(t08.contains("RunningWindowFunction") || t08.contains("Window"),
      s"t08 lost its windowed rank:\n$t08")
  }

  test("round-10 shuffle removals stay removed: shingleRows in-row dedup, " +
      "LSH first-matching-band candidates") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.df(spark, sf("sf0.001"), "documents")
    // shingleRows: zero Exchange — the per-document dedup must be the
    // in-row array_distinct, never a global distinct() of the widest
    // stream in every shingle-based operator
    val sr = functions.Dedup.shingleRows(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!sr.contains("Exchange"),
      s"shingleRows shuffles — the in-row dedup regressed:\n$sr")
    // lshCandidatePairs: exactly the signature aggregate's exchange(s) —
    // no extra exchange for a candidate-pair distinct(), and no
    // HashAggregate keyed on (id_a, id_b)
    val cand = functions.Dedup.lshCandidatePairs(
        functions.Dedup.minhashSignatures(
          functions.Dedup.shingleRows(docs, col("doc_id"), col("text")), 8),
        bands = 4, rowsPerBand = 2)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!cand.contains("keys=[id_a"),
      s"LSH candidates re-aggregate on the pair — distinct() is back:\n$cand")
  }

  test("x08: partitioned read prunes to the filtered partition directories") {
    val f = formatted("x08_partitioned_scan")
    // the lang predicate must be a PARTITION filter (directory pruning
    // at listing time), never a data filter the scan evaluates per row
    assert("""PartitionFilters: \[lang#\d+ IN \((en,de|de,en)\)\]""".r
      .findFirstIn(f).isDefined,
      s"lang IN predicate not a partition filter:\n$f")
  }

  test("excel scan plans as a DSv2 BatchScan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-xlsx").toString
    graft.sources.excel.XlsxWriter.write(s"$dir/t.xlsx",
      Seq("Sheet1" -> Seq((1L, "a")).toDF("k", "v")))
    val p = spark.read.format("excel").load(s"$dir/t.xlsx")
      .select("v").queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
  }

  test("round-14 operators: broadcast models, bounded shuffles, no cartesians") {
    // p08 z-order values: a pure projection — the only exchange is the
    // gate's output ORDER BY
    val p08 = plan("p08_zorder_layout")
    assert("Exchange".r.findAllIn(p08).length <= 1,
      s"p08 z-value computation shuffles:\n$p08")
    // t29 LM scoring: the model side joins as a BROADCAST (the whole
    // design — corpus never shuffles for the lookup); the per-doc
    // aggregate is hash-based with a map-side partial
    val t29 = plan("t29_lm_familiarity")
    assert(t29.contains("BroadcastHashJoin"),
      s"t29 model join not broadcast:\n$t29")
    assert(t29.contains("partial_count") || t29.contains("HashAggregate"),
      s"t29 lost map-side partial aggregation:\n$t29")
    // d31 span decontamination: bench marking join broadcast, never a
    // cartesian anywhere in the rewrite
    val d31 = plan("d31_decontaminate_spans")
    assert(d31.contains("BroadcastHashJoin"),
      s"d31 bench set not broadcast:\n$d31")
    assert(!d31.contains("CartesianProduct") &&
      !d31.contains("BroadcastNestedLoopJoin"),
      s"d31 degenerated to a cross product:\n$d31")
  }
}
