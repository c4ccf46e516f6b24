package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Curation.curate]]: the composed one-call recipe keeps its stage
  * contracts.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("en", "de", "fr")
  private lazy val out = Curation.curate(
    Tables.df(spark, sf(), "documents"),
    col("doc_id"), col("text"), col("lang"),
    langs = langs, tokens = col("n_chars"),
    rates = Seq("en" -> 0.5, "de" -> 0.5), defaultRate = 0.25,
    budget = 2000L).cache()

  test("only allow-listed languages survive, with bins assigned") {
    val gotLangs = out.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(gotLangs.subsetOf(langs.toSet), gotLangs.toString)
    assert(out.filter(col("bin").isNull).count() == 0)
    assert(out.count() > 0, "recipe filtered everything — gate is vacuous")
  }

  test("at most one survivor per near-dup cluster (dedup before sampling)") {
    val docs = Tables.df(spark, sf(), "documents")
      .filter(col("lang").isInCollection(langs))
    val sh = Dedup.shingleRows(docs, col("doc_id"), col("text"))
    val cc = Dedup.connectedComponents(Dedup.jaccardPairs(sh, 0.8))
    val perCluster = out.join(cc, Seq("doc_id"))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(perCluster == 0, s"$perCluster clusters kept multiple members")
  }

  test("keepBy keeps each cluster's highest-quality member, ties min id") {
    val docs = Tables.df(spark, sf(), "documents")
      .filter(col("lang").isInCollection(langs))
    val outQ = Curation.curate(
      Tables.df(spark, sf(), "documents"),
      col("doc_id"), col("text"), col("lang"),
      langs = langs, tokens = col("n_chars"),
      rates = Seq("en" -> 0.5, "de" -> 0.5), defaultRate = 0.25,
      budget = 2000L,
      keepBy = Some(TextFunctions.qualityScore(col("text"))))
    val sh = Dedup.shingleRows(docs, col("doc_id"), col("text"))
    val cc = Dedup.connectedComponents(Dedup.jaccardPairs(sh, 0.8))
    // expected survivor per cluster: (score desc, id asc) first
    val scored = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("score"))
    val best = cc.join(scored, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val clustered = cc.select("doc_id").collect().map(_.getLong(0)).toSet
    // the DEDUP stage (pre-sampling) must keep exactly `best` of the
    // clustered docs; check via the dedupNear call curate delegates to
    val survivors = Dedup.dedupNear(docs, col("doc_id"), col("text"), 0.8,
        keepBy = Some(TextFunctions.qualityScore(col("text"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((survivors & clustered) == best)
    // the composed recipe's survivors are a subset of the quality-kept
    // dedup output (sampling and packing only ever remove/annotate)
    val qSurvivors = outQ.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(qSurvivors.subsetOf(survivors))
  }

  test("dataCard: slice consistency, duplicate accounting, one corpus read") {
    val docs = Seq(
      (1L, "alpha beta", "en", "web"),
      (2L, "alpha beta", "en", "book"),   // exact dup of 1 (fingerprint)
      (3L, "gamma delta epsilon", "en", "web"),
      (4L, "zeta eta", "de", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val card = Curation.dataCard(docs, col("text"), col("lang"),
      col("source")).collect()
    // three slices: 2 langs + 2 sources + 1 overall
    assert(card.length == 5)
    def slice(l: Option[String], s: Option[String]) = card.find(r =>
      Option(r.getString(0)) == l && Option(r.getString(1)) == s).get
    val en = slice(Some("en"), None)
    assert(en.getLong(2) == 3 && en.getLong(5) == 2) // n_docs, n_distinct
    assert(en.getDouble(6) == 1.0 / 3.0)             // dup_rate exact IEEE
    val all = slice(None, None)
    assert(all.getLong(2) == 4 && all.getLong(5) == 3)
    assert(all.getLong(3) == 2 + 2 + 3 + 2)          // token total
    val web = slice(None, Some("web"))
    assert(web.getLong(2) == 3 && web.getLong(5) == 3) // no dups within web
    // the corpus is scanned once: a single file-scan node in the plan
    val plan = Curation.dataCard(docs, col("text"), col("lang"),
      col("source")).queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).length <= 1)
  }

  test("curateWeb stage seams: url keep-first before quality; spans cut, not drop") {
    import spark.implicits._
    // four crawl docs: 1 and 2 share a canonical URL (2 is the decorated
    // variant and FAILS quality — keep-first must still collapse the
    // group to doc 1, not let 2 dodge the dedup by failing the gate);
    // doc 3 is fully contaminated by the bench; doc 4 is clean.
    // docs 5 and 6 share a canonical URL where the MIN-id member fails
    // quality: keep-first-THEN-quality kills the whole group (keep 5,
    // gate drops 5) — quality-first would have let 6 survive, so the
    // group's absence pins the stage order itself
    val docs = Seq(
      (1L, "http://x.com/p?b=2&a=1",
        "the quick brown fox jumps over the lazy dog and that is all with more"),
      (2L, "HTTP://WWW.x.com:80/p/?utm_source=t&a=1&b=2#f", "short junk"),
      (3L, "http://y.com/q",
        "leaked bench alpha beta gamma delta epsilon zeta eta theta words here"),
      (4L, "http://z.com/r",
        "a clean page of prose that must survive with the text intact and be kept"),
      (5L, "http://w.com/s", "tiny page"),
      (6L, "HTTP://WWW.w.com:80/s/",
        "a perfectly fine prose page whose lower id twin fails the gate first")
    ).toDF("doc_id", "url", "text")
    val bench = Seq(
      (100L, "prefix leaked bench alpha beta gamma delta epsilon zeta eta theta words here end")
    ).toDF("doc_id", "text")
    val quality = Some(TextFunctions.gopherRules(col("text"),
      minWords = 5, minStopwords = 0).getField("pass"))
    val out = Curation.curateWebSpans(docs, col("doc_id"), col("url"),
        col("text"), bench, col("text"), k = 5, quality = quality)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 4L),
      s"doc 2 collapses into doc 1's group; the 5/6 group dies because " +
        s"keep-first runs BEFORE quality (keeps 5, gate drops 5): ${out.toSeq}")
    assert(out(0)._2 == "http://x.com/p?a=1&b=2", "canonical url emitted")
    assert(out(1)._3 == "", "fully-contaminated doc is CUT to '', never dropped")
    assert(out(2)._3.startsWith("a clean page"), "clean doc verbatim")
    // the drop policy differs in exactly the last seam
    val dropped = Curation.curateWeb(docs, col("doc_id"), col("url"),
        col("text"), bench, col("doc_id"), col("text"),
        minCommon = 5, quality = quality)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(dropped.toSeq == Seq(1L, 4L),
      "curateWeb DROPS the contaminated doc the span form keeps as ''")
  }

  test("bins are contiguous per language starting at 0") {
    val bins = out.groupBy(col("lang"))
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"),
        count_distinct(col("bin")).as("n"))
      .collect()
    bins.foreach { r =>
      assert(r.getLong(1) == 0L, s"${r.getString(0)}: min bin ${r.getLong(1)}")
      // start-offset binning fills bins in order; a document longer
      // than the budget can straddle (skipping at most one bin index
      // is impossible with budget >= max token count — n_chars <= 553)
      assert(r.getLong(3) == r.getLong(2) + 1,
        s"${r.getString(0)}: non-contiguous bins")
    }
  }
}
