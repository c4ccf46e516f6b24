package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Distribution-matching resampler: derived rates, binding-group
  * preservation, weight-0 drop semantics, determinism, and the
  * no-corpus-shuffle plan shape.
  */
class ResampleMixSpec extends SparkSpec {

  private val mix = Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
    "fr" -> 0.15, "zh" -> 0.15)

  private def docs = Tables.df(spark, sf(), "documents")

  test("binding group keeps every row; others land near the target mix") {
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = mix.keys.minBy(g => counts(g) / mix(g))
    val kept = TextFunctions.resampleToMix(docs, col("lang"), col("doc_id"), mix)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept(binding) == counts(binding),
      s"binding group $binding thinned: ${kept(binding)} of ${counts(binding)}")
    // every kept group is a subset, and the realized mix tracks the
    // target within hash-binomial noise (loose bound — mechanism gate,
    // the exact kept SET is pinned by the t19 oracle)
    val total = kept.values.sum.toDouble
    mix.foreach { case (g, w) =>
      assert(kept(g) <= counts(g))
      val realized = kept(g) / total
      assert(math.abs(realized - w) < 0.08,
        s"$g realized $realized vs target $w")
    }
  }

  test("token weighting: binding group by token mass; kept TOKEN mix tracks target") {
    val tokens = docs.groupBy("lang")
      .agg(sum(col("n_chars")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = mix.keys.minBy(g => tokens(g) / mix(g))
    val keptRows = TextFunctions.resampleToMixTokens(docs, col("lang"),
      col("doc_id"), col("n_chars"), mix)
    val kept = keptRows.groupBy("lang")
      .agg(sum(col("n_chars")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept(binding) == tokens(binding),
      s"binding group $binding thinned by tokens")
    val total = kept.values.sum.toDouble
    mix.foreach { case (g, w) =>
      assert(kept(g) <= tokens(g))
      val realized = kept(g) / total
      assert(math.abs(realized - w) < 0.08,
        s"$g realized token share $realized vs target $w")
    }
    // same determinism contract as the row form
    val a = keptRows.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TextFunctions.resampleToMixTokens(docs.repartition(7),
        col("lang"), col("doc_id"), col("n_chars"), mix)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("groups without a weight are dropped; empty-overlap mix throws nothing extra") {
    val kept = TextFunctions.resampleToMix(docs, col("lang"), col("doc_id"),
        Map("en" -> 0.7, "de" -> 0.3))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(kept == Set("en", "de"), s"got $kept")
    intercept[IllegalArgumentException] {
      TextFunctions.resampleToMix(docs, col("lang"), col("doc_id"),
        Map("en" -> 0.0))
    }
  }

  test("deterministic across partitionings") {
    val a = TextFunctions.resampleToMix(docs, col("lang"), col("doc_id"), mix)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TextFunctions.resampleToMix(docs.repartition(7), col("lang"),
        col("doc_id"), mix)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("plan: the corpus is never shuffled — thresholds broadcast onto it") {
    val p = TextFunctions.resampleToMix(docs, col("lang"), col("doc_id"), mix)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    // the only exchanges allowed are on the tiny per-group count frame
    // (and broadcast exchanges); the corpus-side join must not shuffle
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join:\n$p")
  }

  test("smoothed: alpha=0.5 keeps the smallest group whole and flattens") {
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    val kept = TextFunctions.resampleSmoothed(docs, col("lang"), col("doc_id"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every minimal-count group survives intact
    counts.filter(_._2 == nMin).keys.foreach { g =>
      assert(kept(g) == nMin, s"smallest group $g thinned")
    }
    // realized rate tracks (n_min/n)^(1-alpha) within hash noise
    counts.foreach { case (g, n) =>
      val expect = math.sqrt(nMin.toDouble / n) * n
      assert(math.abs(kept(g) - expect) <= 6 * math.sqrt(expect) + 3,
        s"$g kept ${kept(g)}, expected ~$expect")
    }
    // alpha=1 is the identity mix (rates all 1)
    val id1 = TextFunctions.resampleSmoothed(docs, col("lang"),
      col("doc_id"), alpha = 1.0).count()
    assert(id1 == docs.count())
    intercept[IllegalArgumentException] {
      TextFunctions.resampleSmoothed(docs, col("lang"), col("doc_id"),
        alpha = 0.0)
    }
  }
}
