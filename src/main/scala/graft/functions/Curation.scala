package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one-call corpus-curation recipe — the end-to-end story a
  * training-data pipeline actually runs, composed from this library's
  * individually-gated stages so the whole chain stays deterministic,
  * rerun-stable, and oracle-checkable:
  *
  *   1. language filter (allow-list on the label column);
  *   2. near-duplicate removal, keep-one per cluster
  *      ([[Dedup.dedupNear]] — exact-Jaccard pair graph → connected
  *      components → representative);
  *   3. per-language mixture sampling
  *      ([[TextFunctions.sampleByStratum]] — portable-hash filter,
  *      never `rand()`);
  *   4. context-window sequence packing
  *      ([[TextFunctions.packSequences]] — per-stratum cumsum bins).
  *
  * Stage order matters and is fixed: dedup before sampling (so a
  * cluster can't dodge dedup by losing members to the sampler), and
  * packing last over exactly the surviving rows. Shuffle profile is
  * the sum of its parts: the pair/CC shuffles of dedup + one window
  * shuffle for packing; the filter and sampler are zero-shuffle scans.
  */
object Curation {

  /** @param docs     corpus frame
    * @param id       unique document id column
    * @param text     text column (near-dedup input)
    * @param lang     stratum/label column (filter + mixture + packing)
    * @param langs    allow-list for `lang`
    * @param tokens   token-count column for packing (e.g. a
    *                 precomputed `n_chars`/`n_tokens`)
    * @param rates    per-language sampling rates; `defaultRate` for the
    *                 rest
    * @param budget   tokens per training bin
    * @param jaccardThreshold near-dup pair threshold
    * @param pairStrategy candidate-pair strategy for the dedup stage —
    *                 [[Dedup.Auto]] (default: guarded exact below the
    *                 documented corpus-size budget, recall-floor-sized
    *                 [[Dedup.MinHashLsh]] above it), or an explicit
    *                 [[Dedup.Exact]] / [[Dedup.MinHashLsh]] /
    *                 [[Dedup.Containment]] to pin the mode
    * @param keepBy   cluster-representative policy for the dedup stage:
    *                 `None` (default) keeps the min-id member; pass a
    *                 score column (e.g.
    *                 [[TextFunctions.qualityScore]]`(text)`) to keep the
    *                 HIGHEST-scoring member instead — the policy a real
    *                 curation wants, since the survivor is what trains —
    *                 ties broken by min id, so the result stays
    *                 deterministic either way. Cost: one extra window
    *                 over cluster MEMBERS only (see
    *                 [[Dedup.dedupNear]]'s scale notes).
    * @return the surviving rows plus their `bin` assignment
    */
  def curate(docs: DataFrame, id: Column, text: Column, lang: Column,
      langs: Seq[String], tokens: Column,
      rates: Seq[(String, Double)], defaultRate: Double,
      budget: Long, jaccardThreshold: Double = 0.8,
      pairStrategy: Dedup.PairStrategy = Dedup.Auto(),
      keepBy: Option[Column] = None): DataFrame = {
    require(langs.nonEmpty, "curate: empty language allow-list")
    val filtered = docs.filter(lang.isInCollection(langs))
    val deduped = Dedup.dedupNear(filtered, id, text, jaccardThreshold,
      keepBy = keepBy, strategy = pairStrategy)
    val sampled = TextFunctions.sampleByStratum(
      deduped, lang, id, rates, defaultRate)
    TextFunctions.packSequences(sampled, lang, id, tokens, budget)
  }

  /** Per-shard manifest of a [[TextFunctions.packSequences]] layout:
    * one row per (stratum, bin) with document count, token total, and
    * the id range — the table a training launcher reads to schedule
    * data loading, and the p04-gated contract for [[writeShards]].
    * One extra partial-aggregatable groupBy over the packed frame.
    */
  def shardManifest(docs: DataFrame, stratum: Column, order: Column,
      tokens: Column, budget: Long): DataFrame =
    TextFunctions.packSequences(docs, stratum, order, tokens, budget)
      .groupBy(stratum.as("stratum"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokens.cast(org.apache.spark.sql.types.LongType)).as("n_tokens"),
        min(order).as("first_doc"), max(order).as("last_doc"))

  /** The curation pipeline's OUTPUT stage: write the packed corpus as
    * deterministic training shards — one directory per
    * `stratum=…/bin=…` (Hive layout, so a shard-targeted read prunes
    * at the partition level and never lists the rest of the corpus) —
    * and return the [[shardManifest]].
    *
    * Rerun-stable by construction: bin assignment is the
    * packSequences cumulative sum (no `rand()`, no
    * partition-dependent state), so a re-run overwrites each shard
    * with identical content — safe to resume after a partial failure.
    *
    * Scale: ONE window shuffle (packSequences) then a write
    * repartitioned by the shard key, so each task writes whole
    * shards (no 1000-executors × 10000-shards small-file explosion);
    * `maxRecordsPerFile` bounds any single file. The manifest
    * aggregate reuses the packed frame.
    *
    * @param stratumName/orderName/tokensName column NAMES (the write
    *   path and manifest schema are name-keyed)
    */
  def writeShards(docs: DataFrame, stratumName: String, orderName: String,
      tokensName: String, budget: Long, path: String,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    val packed = TextFunctions.packSequences(docs, col(stratumName),
      col(orderName), col(tokensName), budget)
      .withColumnRenamed(stratumName, "stratum")
    packed.repartition(col("stratum"), col("bin"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("stratum", "bin")
      .parquet(path)
    shardManifest(docs, col(stratumName), col(orderName),
      col(tokensName), budget)
  }

  /** Corpus data card — the release-notes table every published
    * training set ships (docs/tokens/chars, exact-duplicate load,
    * mean document length) sliced per language, per source, and
    * overall, in ONE aggregation pass.
    *
    * Plan shape: a zero-shuffle per-doc projection (token count,
    * char count, the d02 content fingerprint), then a single
    * GROUPING SETS aggregate — Spark expands the three slices inside
    * one aggregation, so the corpus is read ONCE no matter how many
    * slices the card reports. Two shuffles total (measured): the
    * distinct-aggregate's partial (slice, fp) pre-aggregation plus
    * the final slice rollup — `COUNT(DISTINCT fp)` is the one
    * non-sketch distinct in the library, acceptable because the card
    * is a per-release report, not a hot path; swap in
    * [[expressions.KmvDistinct]] when slice cardinality makes exact
    * distinct the bottleneck.
    *
    * All counts exact; `dup_rate`/`mean_tokens` are single IEEE
    * divisions of exact longs (cross-engine bit-stable, the d06
    * precedent). Slice labels: a null `lang`/`source` marks the
    * aggregated-out dimension (the corpus columns are non-null by
    * contract).
    */
  def dataCard(docs: DataFrame, text: Column, lang: Column,
      source: Column): DataFrame = {
    val perDoc = docs.select(lang.as("lang"), source.as("source"),
      size(TextFunctions.words(text)).cast("long").as("t"),
      length(text).cast("long").as("c"),
      TextFunctions.fingerprint(text).as("fp"))
    perDoc
      .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        sum(col("c")).as("n_chars"),
        countDistinct(col("fp")).as("n_distinct_docs"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_distinct_docs")).cast("double")
          / col("n_docs"))
      .withColumn("mean_tokens",
        col("n_tokens").cast("double") / col("n_docs"))
  }
}
