package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** The one-call WEB-corpus recipe — [[curate]]'s crawl-side sibling,
    * composing the individually-gated crawl stages in the order a real
    * web pipeline runs them (each stage feeds exactly the survivors of
    * the previous one; the order is FIXED and is itself the contract
    * the p10 gate pins):
    *
    *   1. markup strip ([[TextFunctions.stripMarkup]]) — cheapest,
    *      zero-shuffle, and every later stage must see prose, not
    *      tags;
    *   2. URL-level dedup — keep the minimum-id document per
    *      [[TextFunctions.canonicalizeUrl]] key (the same page
    *      arrives under scheme/www/port/tracking-param variants);
    *      one hash-aggregate shuffle, run BEFORE quality so a
    *      duplicate can't dodge the dedup by failing the gate while
    *      its twin passes;
    *   3. quality gate — default
    *      [[TextFunctions.gopherRules]]`.pass` at the paper's
    *      thresholds, evaluated on the CLEANED text (pass any boolean
    *      Column over `text` to compose differently, e.g. the
    *      Gopher∧C4 conjunction); stateless, zero shuffle;
    *   4. near-duplicate removal ([[Dedup.dedupNear]] — content
    *      twins that survive URL dedup because they live at genuinely
    *      different canonical URLs);
    *   5. benchmark decontamination ([[Dedup.decontaminate]] — drop
    *      survivors sharing ≥ `minCommon` word n-grams with any
    *      benchmark document), LAST so the expensive overlap join
    *      sees the smallest possible corpus.
    *
    * Shuffle profile is the sum of its gated parts: one hash-agg for
    * the URL keep-first, the pair/CC shuffles of the dedup stage, one
    * overlap join against the (bloom-prescreened, broadcast) bench
    * side; stages 1 and 3 are codegen projections. Nothing here is
    * new machinery — the value is the seam order, which p01/p02
    * proved catches real bugs that per-stage gates cannot.
    *
    * `quality` resolves against a frame whose cleaned text column is
    * named `text` (and canonical URL `url`).
    *
    * @return surviving rows as (doc_id, url, text) — canonical URL,
    *         cleaned text
    */
  def curateWeb(docs: DataFrame, id: Column, url: Column, text: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      minCommon: Long = 10L, ngram: Int = 3,
      jaccardThreshold: Double = 0.8,
      pairStrategy: Dedup.PairStrategy = Dedup.Auto(),
      keepBy: Option[Column] = None,
      quality: Option[Column] = None): DataFrame =
    // decontaminate reads its corpus twice (overlap shingles + the
    // final anti-join) and the corpus here is the whole stage-1–4
    // chain — materialize it once (the dedupNear shingle-index seam)
    Dedup.decontaminate(
        Materialize(webSurvivors(docs, id, url, text, jaccardThreshold,
          pairStrategy, keepBy, quality, ngram)),
        bench.select(benchId.as("doc_id"), benchText.as("text")),
        col("doc_id"), col("text"), minCommon, ngram)
      .select(col("doc_id"), col("url"), col("text"))

  /** [[curateWeb]] with SPAN-LEVEL decontamination — the surgical
    * final stage ([[Dedup.decontaminateSpans]], the GPT-3/PaLM rule):
    * instead of DROPPING every survivor that overlaps the benchmark,
    * cut only the overlapping k-word spans and keep the rest of the
    * document. Stages 1–4 are [[curateWeb]]'s, verbatim; the policy
    * choice lives entirely in the last seam. A fully-contaminated
    * document comes back with `text = ''` (cut, not dropped — the
    * caller's length filter drops it, keeping the accounting
    * visible). Same scale shape as d31: the bench window set
    * broadcasts, only HIT documents are rebuilt.
    */
  def curateWebSpans(docs: DataFrame, id: Column, url: Column,
      text: Column, bench: DataFrame, benchText: Column,
      k: Int = 13, ngram: Int = 3,
      jaccardThreshold: Double = 0.8,
      pairStrategy: Dedup.PairStrategy = Dedup.Auto(),
      keepBy: Option[Column] = None,
      quality: Option[Column] = None,
      broadcastBench: Boolean = true): DataFrame = {
    // the survivor frame is read 3+ times downstream (the span cutter
    // windows it, semi-joins it, and left-joins it back; the url
    // rejoin reads it again) and its producer is the whole stage-1–4
    // chain incl. the pair graph — materialize it once (the
    // Dedup.dedupNear shingle-index seam, same env-selected mode)
    val surv = Materialize(webSurvivors(docs, id, url, text,
      jaccardThreshold, pairStrategy, keepBy, quality, ngram))
    Dedup.decontaminateSpans(surv, bench, col("doc_id"), col("text"),
        benchText, k, broadcastBench)
      .join(surv.select(col("doc_id"), col("url")), Seq("doc_id"))
      .select(col("doc_id"), col("url"), col("text"))
  }

  /** [[curateWeb]]'s stages 1–4 (markup strip → canonical-URL
    * keep-first → quality gate → near-dedup), shared by both
    * decontamination policies — public so a caller (or the shared
    * gate-fixture layer) can materialize the survivor frame once and
    * fan several final-stage policies out from it. Returns
    * (doc_id, url, text) survivors.
    */
  def webSurvivors(docs: DataFrame, id: Column, url: Column,
      text: Column, jaccardThreshold: Double = 0.8,
      pairStrategy: Dedup.PairStrategy = Dedup.Auto(),
      keepBy: Option[Column] = None,
      quality: Option[Column] = None, ngram: Int = 3): DataFrame = {
    val cleaned = docs.select(id.as("doc_id"),
      TextFunctions.canonicalizeUrl(url).as("url"),
      TextFunctions.stripMarkup(text).as("text"))
    val keep = cleaned.groupBy(col("url"))
      .agg(min(col("doc_id")).as("doc_id"))
    val urlDeduped = cleaned.join(keep, Seq("url", "doc_id"), "left_semi")
    val gate = quality.getOrElse(
      TextFunctions.gopherRules(col("text")).getField("pass"))
    val qualified = urlDeduped.filter(gate)
    Dedup.dedupNear(qualified, col("doc_id"), col("text"),
      jaccardThreshold, n = ngram, keepBy = keepBy,
      strategy = pairStrategy)
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

  /** Packing-utilization report over a [[shardManifest]] layout
    * (p18) — the launcher-side data card for the whole-document bin
    * pack: per stratum, how many bins the budget produced, the doc
    * and token mass, the fullest bin (bins legitimately OVERSHOOT the
    * budget — a straddling document stays whole in the bin where it
    * started), and utilization = tokens / (bins · budget), one IEEE
    * division over exact integer sums (the t09 convention). Rolls up
    * the manifest — one extra partial-aggregatable pass, no window.
    */
  def shardUtilization(docs: DataFrame, stratum: Column, order: Column,
      tokens: Column, budget: Long): DataFrame =
    shardManifest(docs, stratum, order, tokens, budget)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        max(col("n_tokens")).as("max_bin_tokens"),
        (sum(col("n_tokens")).cast(org.apache.spark.sql.types.DoubleType)
          / (count(lit(1)) * budget)).as("utilization"))

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
  /** The deterministic training-order shuffle key (t42): a 56-bit
    * portable hash of `seed || order` — reproducible in any engine
    * with md5 (the t05/t26 determinism contract, never `rand()`), so
    * the same seed always yields the same global permutation and a
    * re-run or a second engine replays it bit-for-bit. Order by
    * `(shuffleKey, order)` — the id tiebreak makes the permutation
    * total under hash collisions.
    */
  def shuffleKey(order: Column, seed: Long): Column =
    TextFunctions.portableHash64(
      concat(lit(s"shuffle:$seed:"),
        order.cast(org.apache.spark.sql.types.StringType)))

  /** Curriculum training order (t45): documents sort by (curriculum
    * tier, deterministic shuffle key, id) — the easy-to-hard schedule
    * curriculum-learning training runs want, with the t42 determinism
    * contract inside each tier (same seed → same permutation, any
    * engine). Pass the result as the pack/write order (e.g. to
    * [[TextFunctions.packSequences]] or as a [[writeShards]] order
    * expression): each stratum's stream then emits tier 0's documents
    * shuffled, then tier 1's, … `tierRank` is any integer column
    * (lower = earlier in training).
    */
  def curriculumKey(tierRank: Column, order: Column, seed: Long): Column =
    struct(tierRank, shuffleKey(order, seed), order)

  /** `packBy` (p16): pack in an arbitrary caller-supplied total order
    * — the composition hook [[curriculumKey]] plugs into, writing the
    * shard TREE in curriculum order (tier rank → in-tier shuffle →
    * cumsum pack) so the trainable artifact, not just the bin
    * assignment, carries the schedule. Mutually exclusive with
    * `shuffleSeed` (which is the `packBy = (shuffleKey, order)`
    * special case kept for the t42 surface). */
  def writeShards(docs: DataFrame, stratumName: String, orderName: String,
      tokensName: String, budget: Long, path: String,
      maxRecordsPerFile: Long = 0L,
      shuffleSeed: Option[Long] = None,
      packBy: Option[Column] = None): DataFrame = {
    require(shuffleSeed.isEmpty || packBy.isEmpty,
      "writeShards: shuffleSeed and packBy are mutually exclusive — " +
        "packBy IS the general order (use curriculumKey/shuffleKey)")
    // shuffleSeed (t42): pack in deterministic-shuffle order instead
    // of id order — the randomized training layout every loader wants,
    // with the same reproducibility contract as the id pack (ORDER BY
    // (hash, id) replays in any engine; one range shuffle, zero
    // rand()). first_doc/last_doc stay min/max of the ORDER key, so on
    // a shuffled tree a bin's id range is wide by design — targeted
    // id-range reads and manifest-pruned deletes degrade to
    // most-bins-touched (document the trade; compactShards without the
    // seed restores id-clustered bins).
    val packOrder = packBy.getOrElse(shuffleSeed.fold(col(orderName))(
      seed => struct(shuffleKey(col(orderName), seed), col(orderName))))
    val packed = TextFunctions.packSequences(docs, col(stratumName),
      packOrder, col(tokensName), budget)
      .withColumnRenamed(stratumName, "stratum")
    packed.repartition(col("stratum"), col("bin"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("stratum", "bin")
      .parquet(path)
    // manifest over the SAME pack (one pack, not two — and required
    // under shuffleSeed, where a re-pack by id would bin differently);
    // identical arithmetic to shardManifest on the unshuffled path
    packed.groupBy(col("stratum"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensName).cast(org.apache.spark.sql.types.LongType))
          .as("n_tokens"),
        min(col(orderName)).as("first_doc"),
        max(col(orderName)).as("last_doc"))
  }

  /** EPOCH-FROZEN incremental shard maintenance — the O(increment)
    * dual of [[writeShards]] for a continuously growing corpus: bins
    * already written are IMMUTABLE; each call packs ONLY its increment,
    * continuing every stratum's global token cumsum from a per-stratum
    * carry snapshot. This is what a real 100 TB ingest runs — the
    * per-epoch full rebuild (the s10 shape) is the one plan you could
    * not run on a growing corpus, and it becomes the explicit
    * [[compactShards]] call instead.
    *
    * Bin math: a document's bin is
    * `floor((carry + cumThroughDoc − tokens) / budget)` where `carry`
    * is the stratum's total packed tokens so far — the SAME operands
    * and IEEE ops as [[TextFunctions.packSequences]]'s global cumsum,
    * so under the in-order-arrival contract (each epoch's `order` keys
    * per stratum follow everything already packed — what a monotone
    * ingest id or event time gives for free) the grown tree's bin
    * assignment is BIT-IDENTICAL to a one-shot batch pack over all
    * rows (s12, hash-gated against the s10 oracle's manifest SQL).
    * Out-of-order late arrivals still pack — into CURRENT bins, never
    * rewriting frozen ones (training shards don't need globally
    * re-flowed bins); [[compactShards]] is the periodic re-flow.
    *
    * On-disk layout under `path` (underscore names are invisible to
    * data reads):
    *   - `stratum=…/bin=…/epoch=…` data tree — the `epoch`
    *     sub-partition keeps every epoch's files untouched by later
    *     epochs (spec-pinned) and makes crash replay cleanable;
    *     `stratum`/`bin` stay the leading partition keys, so
    *     bin-targeted readers prune identically.
    *   - `_manifest_delta/epoch=N` — epoch N's [[shardManifest]] rows
    *     (O(increment) write; [[readShardManifest]] merges them).
    *   - `_manifest_ckpt/epoch=M` + `_ckpts/M` — every `ckptEvery`
    *     epochs, the MERGED manifest through M (one small parquet, the
    *     delta-checkpoint pattern): deltas already covered by the
    *     PREVIOUS checkpoint are pruned into it, so the live
    *     `_manifest_delta` listing stays O(2·ckptEvery) no matter how
    *     many epochs the tree has lived — without a checkpoint,
    *     [[readShardManifest]] on a 10⁵-epoch tree pays 10⁵ directory
    *     listings. The one-checkpoint prune lag mirrors the two-marker
    *     commit log: rolling back the newest commit still finds every
    *     delta the previous checkpoint needs.
    *   - `_carry/epoch=N` — (stratum, cum_tokens) after epoch N: one
    *     row per stratum, the entire packer state. Pruned to the last
    *     TWO epochs (same rollback lag).
    *   - `_commits/N` — empty commit-marker files (atomic create,
    *     never rewritten — the Structured Streaming commit-log
    *     pattern); committed epoch = max. `_inflight/N` — intent
    *     marker for crash detection.
    *
    * Failure semantics (the foreachBatch at-least-once contract, made
    * idempotent): a replayed epoch ≤ the committed marker is a NO-OP;
    * a replay after a crash finds the `_inflight` marker, deletes
    * exactly that epoch's `epoch=N` directories, and re-runs — delta,
    * carry, and data writes are all per-epoch-keyed and overwritten,
    * so every crash position re-converges to exactly-once content.
    * Steady state never lists the data tree: per epoch it reads one
    * O(strata) carry snapshot and writes O(increment) rows + three
    * tiny markers.
    *
    * @return THIS epoch's manifest delta rows (lazy — consuming it
    *   re-runs the increment pack; on a replayed epoch, the stored
    *   delta it committed the first time). The merged view over all
    *   epochs is [[readShardManifest]] — an on-demand reporting call
    *   whose O(#epochs) delta-dir listing must not ride along on every
    *   epoch (returning the merged frame here would pay that listing
    *   per micro-batch).
    */
  def appendShards(increment: DataFrame, stratumName: String,
      orderName: String, tokensName: String, budget: Long, path: String,
      epoch: Long, maxRecordsPerFile: Long = 0L,
      ckptEvery: Int = 16): DataFrame = {
    require(budget > 0, "appendShards: budget must be positive")
    val spark = increment.sparkSession
    // a [[compactShards]] crash can leave the tree renamed aside or
    // fully staged but not yet swapped in; finish (or roll back) that
    // swap BEFORE reading the commit log — starting a fresh tree on the
    // transiently-empty path would silently restart every carry at 0
    recoverSwap(spark, path, s"$path-compacting")
    val committed = committedEpoch(spark, path)
    if (committed.exists(_ >= epoch)) {
      // replay no-op: hand back the delta this epoch committed the
      // first time. Only a dir with NO data files falls back to the
      // empty delta-shaped frame (an EMPTY epoch writes a parquet dir
      // holding just _SUCCESS, and a checkpoint may have pruned old
      // delta dirs entirely); a dir WITH data files is read without a
      // safety net — a corrupted committed delta must throw, never
      // silently vanish into an empty result
      val deltaDir = s"$path/_manifest_delta/epoch=$epoch"
      return if (dirHasDataFiles(spark, deltaDir))
        spark.read.parquet(deltaDir)
      else manifestDelta(
        increment.withColumnRenamed(stratumName, "stratum")
          .withColumn("bin", lit(0L)).filter(lit(false)),
        orderName, tokensName)
    }
    // crashed prior attempt (inflight marker survived a failed epoch):
    // remove its partial epoch=N data dirs, then re-run idempotently
    inflightEpochs(spark, path).foreach { stale =>
      if (!committed.exists(_ >= stale)) deleteEpochDirs(spark, path, stale)
      else deleteMarker(spark, s"$path/_inflight/$stale")
    }
    touchMarker(spark, s"$path/_inflight/$epoch")
    val carry = committed.map(c =>
        spark.read.parquet(s"$path/_carry/epoch=$c")
          .select(col("stratum"), col("cum_tokens").as("__carry")))
    val w = Window.partitionBy(col("stratum")).orderBy(col(orderName))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val based = increment.withColumnRenamed(stratumName, "stratum")
    val carried = carry.fold(based.withColumn("__carry", lit(0L)))(c =>
      based.join(broadcast(c), Seq("stratum"), "left")
        .withColumn("__carry", coalesce(col("__carry"), lit(0L))))
    val packed = carried
      .withColumn("__cum", col("__carry")
        + sum(col(tokensName).cast(LongType)).over(w))
      .withColumn("bin",
        floor((col("__cum") - col(tokensName).cast(LongType))
          .cast("double") / budget).cast(LongType))
      .drop("__cum")
      .persist()
    packed.drop("__carry")
      .withColumn("epoch", lit(epoch))
      .repartition(col("stratum"), col("bin"))
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("stratum", "bin", "epoch")
      .parquet(path)
    val delta = manifestDelta(packed, orderName, tokensName).persist()
    delta.write.mode("overwrite")
      .parquet(s"$path/_manifest_delta/epoch=$epoch")
    // next-epoch carry: previous carry advanced by this epoch's totals
    // (strata untouched this epoch carry forward unchanged). Derived
    // from the already-persisted DELTA, not a third pass over the
    // packed increment (optimization r18, guide §1.2): the delta's
    // per-(stratum, bin) n_tokens sums to the epoch's per-stratum
    // total, and the carry base is the (broadcast) prior carry row —
    // identical arithmetic to the old max(__carry) + sum(tokens) form
    // because __carry is constant per stratum.
    val deltaTotals = delta.groupBy(col("stratum"))
      .agg(sum(col("n_tokens")).as("__add"))
    val epochTotals = carry.fold(
        deltaTotals.withColumn("__carry", lit(0L)))(c =>
        deltaTotals.join(broadcast(c), Seq("stratum"), "left")
          .withColumn("__carry", coalesce(col("__carry"), lit(0L))))
      .select(col("stratum"), (col("__carry") + col("__add")).as("cum_tokens"))
    val nextCarry = carry.fold(epochTotals)(c =>
      c.select(col("stratum"), col("__carry").as("cum_tokens"))
        .join(epochTotals.select(col("stratum").as("__s2"),
          col("cum_tokens").as("__c2")),
          col("stratum") === col("__s2"), "full")
        .select(coalesce(col("stratum"), col("__s2")).as("stratum"),
          coalesce(col("__c2"), col("cum_tokens")).as("cum_tokens")))
    nextCarry.write.mode("overwrite").parquet(s"$path/_carry/epoch=$epoch")
    touchMarker(spark, s"$path/_commits/$epoch")
    deleteMarker(spark, s"$path/_inflight/$epoch")
    // prune below the PREVIOUS committed marker, not this one: the
    // newest marker's predecessor must survive so that rolling back /
    // losing the newest commit still exposes a valid carry chain —
    // steady state keeps exactly two markers (and two carry snapshots)
    committed.foreach { c =>
      pruneMarkers(spark, s"$path/_commits", keep = c)
      listEpochDirs(spark, s"$path/_carry").filter(_ < c)
        .foreach(e => deleteMarker(spark, s"$path/_carry/epoch=$e"))
    }
    maybeCheckpointManifest(spark, path, epoch, ckptEvery)
    packed.unpersist()
    delta.unpersist()
    delta
  }

  /** Roll the per-epoch manifest deltas into a checkpoint once enough
    * have accumulated since the last one — the delta-checkpoint pattern
    * that keeps [[readShardManifest]]'s delta listing O(ckptEvery)
    * instead of O(#epochs). Crash-ordered like the data commit: the
    * merged parquet is written FIRST, the `_ckpts/<epoch>` marker
    * second (an unmarked checkpoint dir is invisible debris, swept on
    * the next checkpoint), and pruning runs last. Deltas are pruned
    * only up to the PREVIOUS checkpoint and checkpoints are kept two
    * deep, so losing/rolling back the newest commit marker still finds
    * a checkpoint + delta chain that covers it.
    */
  private def maybeCheckpointManifest(spark: SparkSession, path: String,
      epoch: Long, ckptEvery: Int): Unit = {
    if (ckptEvery <= 0) return
    val lastCkpt = listMarkers(spark, s"$path/_ckpts").maxOption
    val deltaEpochs = listEpochDirs(spark, s"$path/_manifest_delta")
    if (deltaEpochs.count(e => lastCkpt.forall(e > _)) < ckptEvery) return
    // an EMPTY epoch's delta dir holds only _SUCCESS; a window of
    // nothing but empty epochs has no schema to read — skip this
    // checkpoint (the next data-bearing epoch's window rolls them up)
    if (!deltaEpochs.exists(e =>
        dirHasDataFiles(spark, s"$path/_manifest_delta/epoch=$e"))) return
    val deltas = spark.read.parquet(s"$path/_manifest_delta")
      .filter(col("epoch") <= epoch &&
        lastCkpt.map(c => col("epoch") > c).getOrElse(lit(true)))
      .drop("epoch")
    val merged = mergeManifest(lastCkpt.fold(deltas)(c =>
      spark.read.parquet(s"$path/_manifest_ckpt/epoch=$c")
        .unionByName(deltas)))
    merged.write.mode("overwrite")
      .parquet(s"$path/_manifest_ckpt/epoch=$epoch")
    touchMarker(spark, s"$path/_ckpts/$epoch")
    // prune: deltas the PREVIOUS checkpoint already covers, checkpoints
    // below the previous one, and unmarked checkpoint debris
    lastCkpt.foreach { prev =>
      deltaEpochs.filter(_ <= prev)
        .foreach(e => deleteMarker(spark, s"$path/_manifest_delta/epoch=$e"))
      listMarkers(spark, s"$path/_ckpts").filter(_ < prev).foreach { e =>
        deleteMarker(spark, s"$path/_ckpts/$e")
        deleteMarker(spark, s"$path/_manifest_ckpt/epoch=$e")
      }
    }
    val marked = listMarkers(spark, s"$path/_ckpts").toSet
    listEpochDirs(spark, s"$path/_manifest_ckpt").filterNot(marked)
      .foreach(e => deleteMarker(spark, s"$path/_manifest_ckpt/epoch=$e"))
  }

  /** The (stratum, bin) manifest-merge aggregate shared by
    * [[readShardManifest]] and the checkpoint writer: additive counts,
    * extremal id range — associative, so checkpoint-then-merge equals
    * one flat merge. */
  private def mergeManifest(rows: DataFrame): DataFrame =
    rows.groupBy(col("stratum"), col("bin"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))

  /** One epoch's (stratum, bin) manifest rows over a packed frame. */
  private def manifestDelta(packed: DataFrame, orderName: String,
      tokensName: String): DataFrame =
    packed.groupBy(col("stratum"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensName).cast(LongType)).as("n_tokens"),
        min(col(orderName)).as("first_doc"),
        max(col(orderName)).as("last_doc"))

  /** The merged (stratum, bin) manifest of an [[appendShards]] tree as
    * of its last COMMITTED epoch: the newest committed checkpoint plus
    * only the deltas NEWER than it, one partial-aggregatable group-by —
    * bins spanning an epoch boundary (the carry-continued bin) merge to
    * exactly the row a batch [[shardManifest]] over the same rows
    * produces (s12). Reads O(ckptEvery) delta dirs + one checkpoint
    * file — never O(#epochs) listings (the checkpoint writer prunes
    * consumed deltas), never the data tree.
    */
  def readShardManifest(spark: SparkSession, path: String): DataFrame = {
    recoverSwap(spark, path, s"$path-compacting")
    recoverTakedown(spark, path)
    val committed = committedEpoch(spark, path).getOrElse(
      throw new IllegalStateException(
        s"readShardManifest: no committed epoch under $path"))
    // newest checkpoint within the committed range: a checkpoint ahead
    // of a rolled-back commit marker is skipped in favor of its
    // predecessor, whose delta chain the one-checkpoint prune lag keeps
    val ckpt = listMarkers(spark, s"$path/_ckpts")
      .filter(_ <= committed).maxOption
    // a window of only-empty epochs has no delta schema to read: fall
    // back to the checkpoint alone (it IS the manifest then)
    val anyDeltaData = listEpochDirs(spark, s"$path/_manifest_delta")
      .exists(e => dirHasDataFiles(spark, s"$path/_manifest_delta/epoch=$e"))
    if (!anyDeltaData)
      return ckpt.fold(
        throw new IllegalStateException(
          s"readShardManifest: no manifest data under $path"))(c =>
        spark.read.parquet(s"$path/_manifest_ckpt/epoch=$c"))
    val deltas = spark.read.parquet(s"$path/_manifest_delta")
      .filter(col("epoch") <= committed &&
        ckpt.map(c => col("epoch") > c).getOrElse(lit(true)))
      .drop("epoch")
    mergeManifest(ckpt.fold(deltas)(c =>
      spark.read.parquet(s"$path/_manifest_ckpt/epoch=$c")
        .unionByName(deltas)))
  }

  /** Explicit full re-flow of an [[appendShards]] tree — the batch
    * rebuild that used to run on every micro-batch, now a maintenance
    * call: re-pack ALL rows with a one-shot [[writeShards]] (bins
    * renumber globally; epoch sub-dirs and per-epoch small files
    * collapse into one clean `stratum=…/bin=…` tree) and reset the
    * incremental state to a single committed epoch so appends can
    * resume on top. Run it on a cadence (or never — frozen bins are
    * valid training shards forever); cost is one pass over the corpus,
    * the price s10 used to pay per micro-batch.
    *
    * The rebuild stages into a sibling directory and swaps via
    * [[swapStaged]] (rename the live tree ASIDE, rename the staged tree
    * in, drop the old one last), so a crash at ANY point leaves either
    * the old tree or the new one reachable, never a mix and never an
    * empty path — and every entry point ([[appendShards]],
    * [[readShardManifest]], [[readShards]], this call) first runs
    * [[recoverSwap]] to finish or roll back an interrupted swap.
    * SINGLE-WRITER contract: pause the ingest stream while compacting —
    * an epoch appended between the staging read and the swap would be
    * dropped by the swap (the commit-log reset also assumes no
    * concurrent appendShards).
    */
  def compactShards(spark: SparkSession, path: String, orderName: String,
      tokensName: String, budget: Long,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    recoverSwap(spark, path, s"$path-compacting")
    val staged = s"$path-compacting"
    deleteMarker(spark, staged)
    val rows = spark.read.parquet(path).drop("bin", "epoch")
    // same pack + whole-shards-per-task write as writeShards, but
    // keeping the epoch sub-partition (all rows land in epoch=0) so
    // the compacted tree and later appends share ONE directory shape
    // (mixed leaf layouts break partition discovery)
    TextFunctions.packSequences(rows, col("stratum"), col(orderName),
        col(tokensName), budget)
      .withColumn("epoch", lit(0L))
      .repartition(col("stratum"), col("bin"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("stratum", "bin", "epoch")
      .parquet(staged)
    val manifest = shardManifest(rows, col("stratum"), col(orderName),
      col(tokensName), budget)
    manifest.write.mode("overwrite")
      .parquet(s"$staged/_manifest_delta/epoch=0")
    manifest.groupBy(col("stratum"))
      .agg(sum(col("n_tokens")).as("cum_tokens"))
      .write.mode("overwrite").parquet(s"$staged/_carry/epoch=0")
    touchMarker(spark, s"$staged/_commits/0")
    swapStaged(spark, staged, path)
    readShardManifest(spark, path)
  }

  /** Epoch-FILE compaction for an [[appendShards]] tree — the light
    * maintenance call between full [[compactShards]] re-flows: every
    * epoch leaves one small file per straddled bin, so a thousand
    * epochs leave a thousand files inside every long-lived
    * `stratum=…/bin=…` directory and the file-listing cost of a
    * bin-targeted read eventually eats the partition-pruning win (the
    * same debris mode [[Similarity.compactIvfPqIndex]] fixes for the
    * ANN index). This call merges each bin's per-epoch files into one
    * clean file set WITHOUT re-flowing bin boundaries — bins are frozen
    * by the append contract, so the row set and every bin assignment
    * are trivially unchanged, unlike [[compactShards]] which renumbers
    * bins globally.
    *
    * What changes: committed data rows collapse from `epoch=…` subdirs
    * into a single `epoch=<committed>` dir per bin, whole-bins-per-task
    * files. What is preserved VERBATIM: the manifest deltas,
    * checkpoints, and their markers (so [[readShardManifest]] and the
    * replay no-op contract are byte-identical before and after), and
    * the committed carry snapshot. What resets: the commit log and
    * carry history collapse to the single committed epoch — epoch
    * history below the compaction point is gone, so a rollback past it
    * is impossible by construction (the same trade [[compactShards]]
    * makes). Uncommitted (crash-partial) epoch files are NOT copied —
    * compaction doubles as cleanup.
    *
    * Stage + [[swapStaged]] + [[recoverSwap]], single-writer, like
    * every other tree maintenance call. Cost: one pass over the DATA
    * tree (no window, no re-pack — a read + repartition(stratum, bin) +
    * write).
    */
  def compactShardEpochs(spark: SparkSession, path: String,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    recoverSwap(spark, path, s"$path-compacting")
    val committed = committedEpoch(spark, path).getOrElse(
      throw new IllegalStateException(
        s"compactShardEpochs: no committed epoch under $path " +
          "(plain writeShards trees have nothing to compact)"))
    val staged = s"$path-compacting"
    deleteMarker(spark, staged)
    spark.read.parquet(path)
      .filter(col("epoch") <= committed)
      .withColumn("epoch", lit(committed))
      .repartition(col("stratum"), col("bin"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("stratum", "bin", "epoch")
      .parquet(staged)
    copyTree(spark, s"$path/_manifest_delta", s"$staged/_manifest_delta")
    copyTree(spark, s"$path/_manifest_ckpt", s"$staged/_manifest_ckpt")
    copyTree(spark, s"$path/_ckpts", s"$staged/_ckpts")
    copyTree(spark, s"$path/_carry/epoch=$committed",
      s"$staged/_carry/epoch=$committed")
    touchMarker(spark, s"$staged/_commits/$committed")
    swapStaged(spark, staged, path)
    readShardManifest(spark, path)
  }

  /** File-debris compaction for a
    * [[graft.streaming.CorpusStream.chunkIngest]] tree — the p07
    * contract on the chunk table: every micro-batch leaves its own
    * `batch=<id>` span dir, so a long-lived ingest accumulates one
    * directory (and file set) per batch and the loader's listing cost
    * grows without bound. This folds ALL existing batch dirs into the
    * single highest `batch=<maxId>` dir — pure file consolidation, the
    * span GRID is untouched (same rows, asserted by the gate sharing
    * t43's oracle through a compacted tree).
    *
    * Crash-safe via the [[swapStaged]] discipline (staged sibling →
    * aside rename → swap; [[recoverSwap]] runs here and in the ingest
    * entry point), with `_carry` epochs and the `_stream_lineage`
    * binding carried into the staged tree verbatim so the stream
    * resumes seamlessly. SINGLE-WRITER contract (the
    * [[Similarity.compactIvfPqIndex]] rule): run with the ingest
    * stopped after clean termination. The one crash-replay hazard a
    * stopped-stream contract can't exclude — a restart replaying the
    * final batch whose checkpoint commit didn't land — is closed by
    * `_compacted/<id>` markers for every folded batch: the ingest step
    * SKIPS a batch whose marker exists (its rows are already in the
    * consolidated dir; overwriting `batch=<maxId>` with one batch's
    * rows would destroy the folded history).
    */
  def compactChunkBatches(spark: SparkSession, path: String,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    recoverSwap(spark, path, s"$path-compacting")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batches = fs.listStatus(root).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
    require(batches.nonEmpty,
      s"compactChunkBatches: no batch= dirs under $path — not a " +
        "chunkIngest tree (or nothing ingested yet)")
    val maxB = batches.max
    val staged = s"$path-compacting"
    deleteMarker(spark, staged)
    // same flat file layout inside the batch dir as the stream writes
    // (a partitioned interior would make discovery depths inconsistent
    // with later stream batches)
    spark.read.parquet(path)
      .drop("batch")
      .coalesce(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(s"$staged/batch=$maxB")
    copyTree(spark, s"$path/_carry", s"$staged/_carry")
    copyTree(spark, s"$path/_stream_lineage", s"$staged/_stream_lineage")
    // markers from an EARLIER compaction still guard their batches
    // (copied FIRST — copyTree nests when the destination exists);
    // then this fold's markers, all BEFORE the swap so a crash after
    // it already carries the fold record
    copyTree(spark, s"$path/_compacted", s"$staged/_compacted")
    batches.foreach(b => touchMarker(spark, s"$staged/_compacted/$b"))
    swapStaged(spark, staged, path)
    spark.read.parquet(path)
  }

  /** TAKEDOWN for an [[appendShards]] tree — the deletion verb the
    * shard lifecycle was missing ([[Similarity.deleteFromIvfPqIndex]]'s
    * rule applied to the data tree): remove every document whose ORDER
    * key appears in `ids` (single-column frame), rewriting ONLY the
    * `stratum=…/bin=…` partitions that can contain them. Bins stay
    * FROZEN: deletion leaves holes, never re-flows boundaries, so
    * untouched bins are bit-identical (spec-pinned via file mtimes) and
    * a targeted reader's bin arithmetic is unchanged
    * ([[compactShards]] remains the explicit re-flow).
    *
    * Locating the ids NEVER scans the corpus: candidate bins come from
    * the manifest's per-bin [first_doc, last_doc] order-key ranges (a
    * broadcast range join against the tiny manifest frame), so rewrite
    * cost is O(bins that can hold the ids), not O(corpus). A range
    * false positive — an absent id inside some bin's range — rewrites
    * that bin to identical content: wasted I/O, never wrong data.
    *
    * Each touched bin rewrites via its own stage-and-swap under the
    * underscore roots `_delete_staged`/`_delete_old` (invisible to
    * data reads — a `bin=N-old` SIBLING would poison partition
    * discovery, which is why [[swapStaged]]'s `-old` suffix cannot be
    * used inside the data tree), with [[recoverBinSwaps]] run up front
    * here and on both read entry points. Per-bin atomicity; the call
    * is IDEMPOTENT — a crash mid-sequence leaves every bin either old
    * or new and a re-run converges; deletion is monotone, so a reader
    * in the window sees at worst not-yet-deleted rows, never corrupt
    * ones.
    *
    * The manifest is RESET, not delta'd: deltas are additive and
    * cannot re-derive a bin's min/max id range after rows vanish. The
    * touched bins' manifest rows are recomputed from the kept rows,
    * merged with the untouched rows, written as the checkpoint AT the
    * committed epoch, and every delta it covers is pruned — with ZERO
    * prune lag on purpose: the usual one-checkpoint lag exists so the
    * newest commit can roll back, and a takedown must not be
    * rollback-able to the deleted rows.
    *
    * The per-stratum CARRY is deliberately untouched: future appends
    * continue the token cumsum as if the deleted mass were still
    * packed (the frozen-bin contract — re-basing the carry would
    * re-flow every future bin against the batch-pack oracle).
    *
    * SINGLE-WRITER like every maintenance call. Returns the fresh
    * merged manifest.
    */
  def deleteFromShards(spark: SparkSession, path: String, ids: DataFrame,
      orderName: String, tokensName: String,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    recoverSwap(spark, path, s"$path-compacting")
    val committed = committedEpoch(spark, path).getOrElse(
      throw new IllegalStateException(
        s"deleteFromShards: no committed epoch under $path " +
          "(appendShards trees only — re-run writeShards for plain trees)"))
    withTakedownLease(spark, path, "deleteFromShards") {
    // crashed-predecessor debris, recovered under OUR lease
    recoverTakedown(spark, path, holdingLease = true)
    val idSide = broadcast(
      ids.select(col(ids.columns.head).as("__del_id")).distinct())
    val manifest = readShardManifest(spark, path)
    val touchedDf = manifest.join(idSide,
        col("__del_id") >= col("first_doc") &&
          col("__del_id") <= col("last_doc"), "left_semi")
    val touched = touchedDf.select(col("stratum"), col("bin")).collect()
    val keptRows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Row]
    if (touched.nonEmpty) {
      // ONE partition-pruned read + ONE partitioned staged write for
      // every touched bin (a per-bin job loop pays fixed job overhead
      // per bin — measured 3-4x slower at 16 bins); the swap stays a
      // per-bin metadata loop. Small touched sets prune STATICALLY via
      // an OR-chain of (stratum, bin) equalities; larger ones (the
      // chain overflows the expression converter past a few hundred
      // terms) go through a broadcast semi join on the partition
      // columns — dynamic partition pruning when the planner applies
      // it, a full listing otherwise, and in either case only touched
      // bins are REWRITTEN. A mass deletion approaching the whole tree
      // should use the compactShards-style rebuild instead.
      val tree = spark.read.parquet(path)
      val rows =
        if (touched.length <= 64)
          tree.filter(touched.map(r =>
              col("stratum") === lit(r.get(0)) &&
                col("bin") === lit(r.get(1)))
            .reduce(_ || _))
        else
          tree.join(
            broadcast(touchedDf.select(col("stratum"), col("bin"))
              .distinct()),
            Seq("stratum", "bin"), "left_semi")
      val kept = rows.join(idSide,
        rows(orderName) === col("__del_id"), "left_anti").persist()
      try {
        val w = kept.write.mode("overwrite")
          .option("maxRecordsPerFile", maxRecordsPerFile)
        (if (kept.columns.contains("epoch"))
           w.partitionBy("stratum", "bin", "epoch")
         else w.partitionBy("stratum", "bin"))
          .parquet(s"$path/_delete_staged")
        // fresh manifest rows for the touched bins, collected BEFORE
        // the swaps (the lazy frame reads the pre-swap files); a
        // fully-deleted bin yields no row and leaves the manifest
        kept.groupBy(col("stratum"), col("bin").cast(LongType).as("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col(tokensName).cast(LongType)).as("n_tokens"),
            min(col(orderName)).as("first_doc"),
            max(col(orderName)).as("last_doc"))
          .collect().foreach(keptRows += _)
      } finally kept.unpersist()
      swapTouchedBins(spark, path, touched, "deleteFromShards")
    }
    val recomputed = spark.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(keptRows.toSeq).asJava),
      manifest.schema)
    val untouched = manifest.join(
      touchedDf.select(col("stratum"), col("bin")).distinct(),
      Seq("stratum", "bin"), "left_anti")
    // STAGE the reset manifest, never overwrite a marked checkpoint in
    // place (ADVICE r15): on any second takedown the checkpoint at
    // this epoch already exists MARKED with its delta chain pruned, so
    // an in-place overwrite that crashed mid-write would leave a
    // marked-but-partial checkpoint with nothing to rebuild from. The
    // staged write also reads the live checkpoint's files safely (the
    // lazy union is fully consumed before the swap touches them), so
    // the pre-r16 Materialize barrier is no longer needed.
    untouched.unionByName(recomputed)
      .write.mode("overwrite")
      .parquet(s"$path/_manifest_ckpt_staged/epoch=$committed")
    swapStaged(spark, s"$path/_manifest_ckpt_staged/epoch=$committed",
      s"$path/_manifest_ckpt/epoch=$committed")
    deleteMarker(spark, s"$path/_manifest_ckpt_staged")
    touchMarker(spark, s"$path/_ckpts/$committed")
    listEpochDirs(spark, s"$path/_manifest_delta").filter(_ <= committed)
      .foreach(e => deleteMarker(spark, s"$path/_manifest_delta/epoch=$e"))
    listMarkers(spark, s"$path/_ckpts").filter(_ < committed).foreach { e =>
      deleteMarker(spark, s"$path/_ckpts/$e")
      deleteMarker(spark, s"$path/_manifest_ckpt/epoch=$e")
    }
    deleteMarker(spark, s"$path/_delete_staged")
    deleteMarker(spark, s"$path/_delete_old")
    }
    readShardManifest(spark, path)
  }

  /** The per-bin atomic swap sequence shared by [[deleteFromShards]]
    * and [[deleteFromChunks]]: for each touched (stratum, bin), rename
    * the live bin aside under `_delete_old`, rename the staged rewrite
    * in from `_delete_staged` (a fully-deleted bin has no staged dir:
    * the bin simply ends — partition discovery skips the absent
    * directory), drop the aside. Per-bin atomicity; a crash at any
    * point leaves each bin recoverable by [[recoverBinSwaps]]. Caller
    * holds the takedown lease.
    */
  private def swapTouchedBins(spark: SparkSession, path: String,
      touched: Array[org.apache.spark.sql.Row], verb: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.foreach { r =>
      val st = r.get(0)
      val bin = r.get(1)
      val binDir = new org.apache.hadoop.fs.Path(
        s"$path/stratum=$st/bin=$bin")
      val staged = new org.apache.hadoop.fs.Path(
        s"$path/_delete_staged/stratum=$st/bin=$bin")
      val aside = new org.apache.hadoop.fs.Path(
        s"$path/_delete_old/stratum=$st/bin=$bin")
      fs.mkdirs(aside.getParent)
      require(fs.rename(binDir, aside),
        s"$verb: could not rename $binDir aside to $aside")
      if (fs.exists(staged)) require(fs.rename(staged, binDir),
        s"$verb: could not swap $staged into $binDir")
      fs.delete(aside, true)
      ()
    }
  }

  /** The takedown lease protocol shared by [[deleteFromShards]] and
    * [[deleteFromChunks]]: acquire the create-exclusive lease LOCK
    * (loudly failing if a live takedown holds it — the single-writer
    * contract), keep it fresh from a daemon refresher thread for the
    * body's whole run (a staged corpus-scale write can outlast any
    * one-shot TTL), and release it only on success.
    *
    * A transient IOException from touchMarker must not silently kill
    * the refresher (ADVICE r16): the lease would go stale after the
    * TTL while the takedown is still mutating — exactly the long-run
    * case the refresher exists for — and a reader or second writer
    * would then take over mid-write. Failures retry on a short
    * cadence; if the lease cannot be kept fresh well inside the TTL,
    * the takedown is aborted LOUDLY (interrupt + post-body check)
    * instead of continuing unprotected. On abort or body failure the
    * lease file is deliberately LEFT: it goes stale after the TTL and
    * the next writer (or a reader's recovery) takes over the debris.
    */
  private def withTakedownLease[T](spark: SparkSession, path: String,
      verb: String)(body: => T): T = {
    val leasePath = s"$path/_delete_lease"
    val leaseP = new org.apache.hadoop.fs.Path(leasePath)
    val leaseFs = leaseP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    acquireDeleteLease(leaseFs, leaseP, failIfHeld = true)
    val leaseFailure =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val takedownThread = Thread.currentThread()
    val leaseRefresher = new Thread(() => {
      var failures = 0
      var live = true
      while (live) {
        try {
          Thread.sleep(
            if (failures == 0) DeleteLeaseRefreshMs else DeleteLeaseRetryMs)
          touchMarker(spark, leasePath)
          failures = 0
        } catch {
          case _: InterruptedException => live = false
          case scala.util.control.NonFatal(e) =>
            failures += 1
            if (failures >= DeleteLeaseMaxRefreshFailures) {
              leaseFailure.set(e)
              takedownThread.interrupt()
              live = false
            }
        }
      }
    }, "graft-delete-lease")
    leaseRefresher.setDaemon(true)
    leaseRefresher.start()
    def leaseLost(suppressed: Option[Throwable]): Nothing = {
      Thread.interrupted() // clear the flag the refresher set
      val ex = new IllegalStateException(
        s"$verb: the takedown lease could not be kept fresh " +
          s"($DeleteLeaseMaxRefreshFailures consecutive refresh " +
          "failures) — aborting rather than mutating past the TTL " +
          "unprotected", leaseFailure.get())
      suppressed.foreach(ex.addSuppressed)
      throw ex
    }
    val result =
      try body
      catch {
        case e: Throwable if leaseFailure.get() != null =>
          leaseLost(Some(e))
      } finally {
        leaseRefresher.interrupt()
        leaseRefresher.join(2000)
      }
    // the abort interrupt may have landed between interruptible waits
    // and never surfaced as an exception — never report success when
    // the lease was lost
    if (leaseFailure.get() != null) leaseLost(None)
    deleteMarker(spark, leasePath)
    result
  }

  /** How long a [[deleteFromShards]] liveness lease stays fresh. The
    * writer re-touches its lease every [[DeleteLeaseRefreshMs]] from a
    * daemon thread, so a live writer's lease is never older than ~1
    * minute; only a crashed writer leaves one to go stale. */
  private[functions] val DeleteLeaseTtlMs = 10L * 60 * 1000
  private val DeleteLeaseRefreshMs = 60L * 1000
  // failed refreshes retry on this short cadence; after
  // [[DeleteLeaseMaxRefreshFailures]] consecutive failures (~2 minutes
  // since the last successful touch, well inside the 10-minute TTL)
  // the takedown aborts loudly
  private val DeleteLeaseRetryMs = 10L * 1000
  private[functions] val DeleteLeaseMaxRefreshFailures = 6

  private def leaseFresh(fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): Boolean =
    scala.util.Try(fs.getFileStatus(lease)).toOption.exists(st =>
      System.currentTimeMillis() - st.getModificationTime < DeleteLeaseTtlMs)

  /** Atomically acquire the takedown lease via CREATE-EXCLUSIVE (the
    * one atomic primitive every Hadoop filesystem offers) — the lease
    * is a lock, not just a freshness beacon, so a reader's
    * stale-debris recovery and a starting writer can never interleave
    * their renames (the check-then-act TOCTOU a bare freshness test
    * leaves open). A FRESH existing lease means a live owner:
    * `failIfHeld = true` (the writer) throws — two concurrent
    * takedowns violate the documented single-writer contract and now
    * fail loudly instead of corrupting; `failIfHeld = false` (a
    * reader wanting to recover crash debris) just returns false and
    * skips — the owner will leave the tree consistent. A STALE lease
    * is a crashed owner's: atomically CLAIMED via rename
    * ([[claimStaleLease]] — never blind-deleted) and re-acquired
    * (create-exclusive arbitrates racing takeovers — exactly one
    * wins).
    */
  private[functions] def acquireDeleteLease(
      fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path, failIfHeld: Boolean): Boolean = {
    var tries = 0
    while (tries < 3) {
      if (leaseFresh(fs, lease)) {
        if (failIfHeld) throw new IllegalStateException(
          s"deleteFromShards: a fresh takedown lease exists at $lease — " +
            "another deleteFromShards appears to be running (the call " +
            "is SINGLE-WRITER); wait for it, or delete the lease if " +
            "its owner is known dead.")
        return false
      }
      // stale or absent; a PRESENT stale lease must be atomically
      // claimed before the slot is free (ADVICE r16: a blind delete
      // after a separate freshness check could destroy a racing
      // winner's FRESH lease created in that window, leaving BOTH
      // claimants holding the "lock")
      val present = scala.util.Try(fs.getFileStatus(lease)).isSuccess
      if (!present || claimStaleLease(fs, lease)) {
        try {
          fs.mkdirs(lease.getParent)
          val out = fs.create(lease, false) // atomic create-exclusive
          out.close()
          return true
        } catch {
          case _: java.io.IOException => tries += 1 // lost the race; re-check
        }
      } else tries += 1 // claim lost (or stole-and-restored a fresh lease)
    }
    if (failIfHeld) throw new IllegalStateException(
      s"deleteFromShards: could not acquire the takedown lease at $lease")
    false
  }

  /** Atomically CLAIM (remove) a stale lease file: rename it to a
    * unique per-claimant name — rename arbitrates, exactly one racing
    * claimant wins — then RE-VERIFY the claimed file really was stale.
    * If the rename in fact stole a FRESH lease (a racing winner
    * created one between our freshness check and the rename), it is
    * renamed straight back; the owner also re-touches every minute
    * and [[touchMarker]] recreates, so even a failed restore
    * self-heals well inside the TTL. The claim name is dot-prefixed
    * (invisible to partition discovery); a claim leaked by a crash is
    * swept by [[recoverTakedown]] once it ages past the TTL.
    * Returns true when the stale lease was claimed (the path is now
    * free for create-exclusive), false when there was nothing to
    * claim or the claim lost.
    */
  private[functions] def claimStaleLease(
      fs: org.apache.hadoop.fs.FileSystem,
      lease: org.apache.hadoop.fs.Path): Boolean = {
    val claim = new org.apache.hadoop.fs.Path(lease.getParent,
      s".${lease.getName}-claim-${java.util.UUID.randomUUID()}")
    val won =
      try fs.rename(lease, claim)
      catch { case _: java.io.IOException => false }
    if (!won) return false
    val stoleFresh = scala.util.Try(fs.getFileStatus(claim)).toOption
      .exists(st => System.currentTimeMillis() -
        st.getModificationTime < DeleteLeaseTtlMs)
    if (stoleFresh) {
      // put the live owner's lease back; if the owner (or another
      // claimant) already recreated it, drop our copy — theirs stands
      val restored =
        try fs.rename(claim, lease)
        catch { case _: java.io.IOException => false }
      if (!restored) fs.delete(claim, false)
      false
    } else {
      fs.delete(claim, false)
      true
    }
  }

  /** Finish (or roll back) per-bin swaps a [[deleteFromShards]] crash
    * interrupted. For each aside under `_delete_old`: live bin present
    * → the swap completed, the aside is debris; live bin missing with
    * the staged copy present → staging had finished (the aside rename
    * is ordered after it), finish the swap; otherwise roll the aside
    * back. Remaining `_delete_staged` dirs are mid-staging debris.
    * Idempotent; a few metadata calls when the roots are absent, so
    * the read entry points run it up front.
    *
    * Call through [[recoverTakedown]] — this body assumes the caller
    * holds (or has lawfully bypassed) the takedown lease.
    */
  private def recoverBinSwaps(spark: SparkSession,
      path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val oldRoot = new org.apache.hadoop.fs.Path(s"$path/_delete_old")
    val fs = oldRoot.getFileSystem(conf)
    if (fs.exists(oldRoot)) {
      fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$path/_delete_old/*/*")).foreach { s =>
        val bin = s.getPath.getName
        val stratum = s.getPath.getParent.getName
        val live = new org.apache.hadoop.fs.Path(s"$path/$stratum/$bin")
        val staged = new org.apache.hadoop.fs.Path(
          s"$path/_delete_staged/$stratum/$bin")
        // rename results CHECKED (the swapStaged discipline): the
        // live parent may be absent when a whole stratum was renamed
        // away, and HDFS-likes return false, not an exception
        if (fs.exists(live)) fs.delete(s.getPath, true)
        else if (fs.exists(staged)) {
          fs.mkdirs(live.getParent)
          require(fs.rename(staged, live),
            s"recoverBinSwaps: could not finish the swap $staged -> $live")
          fs.delete(s.getPath, true)
        } else {
          fs.mkdirs(live.getParent)
          require(fs.rename(s.getPath, live),
            s"recoverBinSwaps: could not roll back ${s.getPath} to $live")
        }
        ()
      }
      fs.delete(oldRoot, true)
    }
    deleteMarker(spark, s"$path/_delete_staged")
  }

  /** LIVENESS + MUTUAL EXCLUSION for takedown recovery (ADVICE r15,
    * hardened round 16): recovery must not race an ACTIVE
    * [[deleteFromShards]] — a reader that rolled back mid-delete would
    * see a fully-deleted bin's aside (live missing, no staged copy)
    * and resurrect the deleted rows; and a reader's recovery of a
    * CRASHED delete's debris must not interleave with a new writer
    * starting up (the one-shot freshness check left that TOCTOU
    * window). So the lease is a LOCK: while it is fresh, readers skip
    * recovery entirely (mid-swap they see at worst a not-yet-deleted
    * or already-absent bin — both inside the documented
    * monotone-deletion window); to recover stale debris a reader must
    * WIN the create-exclusive takeover ([[acquireDeleteLease]]) first,
    * which is the same lock a starting writer takes — exactly one of
    * them runs. Healthy trees pay a few `exists` probes.
    *
    * `holdingLease = true` is the writer's path: it already owns the
    * lock, so the recovery bodies run directly.
    */
  private[functions] def recoverTakedown(spark: SparkSession,
      path: String, holdingLease: Boolean = false): Unit = {
    if (holdingLease) {
      recoverBinSwaps(spark, path)
      recoverCkptSwaps(spark, path)
      return
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val lease = new org.apache.hadoop.fs.Path(s"$path/_delete_lease")
    val fs = lease.getFileSystem(conf)
    if (leaseFresh(fs, lease)) return // a live writer owns the tree
    def ex(p: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(p))
    val ckptRoot = new org.apache.hadoop.fs.Path(s"$path/_manifest_ckpt")
    val debris = ex(s"$path/_delete_old") || ex(s"$path/_delete_staged") ||
      ex(s"$path/_manifest_ckpt_staged") ||
      (fs.exists(ckptRoot) && fs.listStatus(ckptRoot)
        .exists(_.getPath.getName.endsWith("-old")))
    if (!debris) {
      // a stale beacon with nothing to recover — claimed atomically,
      // never blind-deleted (ADVICE r16: a writer's fresh lease
      // created between our freshness check and a bare delete must
      // survive; claimStaleLease re-verifies staleness after the
      // arbitrating rename and restores a stolen fresh lease)
      if (scala.util.Try(fs.getFileStatus(lease)).isSuccess)
        claimStaleLease(fs, lease)
      return
    }
    if (!acquireDeleteLease(fs, lease, failIfHeld = false)) return
    try {
      // claims leaked by crashed takeovers (dot-prefixed — invisible
      // to partition discovery) are swept once they age past the TTL;
      // younger ones may belong to a live claimant mid-verify
      val now = System.currentTimeMillis()
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$path/.${lease.getName}-claim-*")))
        .getOrElse(Array.empty)
        .filter(st => now - st.getModificationTime >= DeleteLeaseTtlMs)
        .foreach(st => fs.delete(st.getPath, false))
      recoverBinSwaps(spark, path)
      recoverCkptSwaps(spark, path)
    } finally {
      fs.delete(lease, false) // ours — acquired above
      ()
    }
  }

  /** Finish (or roll back) a manifest-checkpoint swap a
    * [[deleteFromShards]] crash interrupted (ADVICE r15: the takedown
    * must never overwrite a MARKED checkpoint in place — after the
    * first takedown the marker exists with no delta chain left, so a
    * crash mid-overwrite would lose the manifest permanently). The
    * reset manifest stages under `_manifest_ckpt_staged/epoch=N` and
    * swaps in via [[swapStaged]]; this recovery applies the
    * [[recoverSwap]] branches per staged epoch, rolls back any
    * orphaned `epoch=N-old` aside, and clears remaining staging debris
    * (a partial staged dir can only exist while the live checkpoint —
    * or, on a first takedown, the delta chain — is still intact).
    * Idempotent; two metadata probes when the roots are absent, so the
    * same entry points that run [[recoverBinSwaps]] run this.
    */
  private[functions] def recoverCkptSwaps(spark: SparkSession,
      path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val stagedRoot = new org.apache.hadoop.fs.Path(
      s"$path/_manifest_ckpt_staged")
    val fs = stagedRoot.getFileSystem(conf)
    if (fs.exists(stagedRoot)) {
      fs.listStatus(stagedRoot)
        .filter(_.getPath.getName.startsWith("epoch=")).foreach { st =>
          val name = st.getPath.getName
          // the swapStaged invariant holds here: a live-missing epoch
          // dir means the aside rename ran, which is ordered after the
          // staged write completed — so finishing the swap from the
          // staged dir is safe, and a PARTIAL staged dir can only
          // coexist with an intact live dir (or, first takedown, an
          // absent-but-unmarked one, where the renamed debris stays
          // invisible to the marker-driven readShardManifest)
          recoverSwap(spark, s"$path/_manifest_ckpt/$name",
            st.getPath.toString)
        }
      fs.delete(stagedRoot, true)
    }
    val ckptRoot = new org.apache.hadoop.fs.Path(s"$path/_manifest_ckpt")
    if (fs.exists(ckptRoot)) {
      fs.listStatus(ckptRoot)
        .filter(_.getPath.getName.endsWith("-old")).foreach { o =>
          val live = new org.apache.hadoop.fs.Path(ckptRoot,
            o.getPath.getName.stripSuffix("-old"))
          if (fs.exists(live)) fs.delete(o.getPath, true)
          else require(fs.rename(o.getPath, live),
            // the ignored-false HDFS hazard swapStaged checks for
            // (ADVICE r16): a silent false would leave the live
            // checkpoint missing with only the -old aside, and the
            // "recovered" read would proceed against a missing epoch
            s"recoverCkptSwaps: could not roll back ${o.getPath} to $live")
          ()
        }
    }
  }

  /** Recursive copy of a directory tree (no-op if `src` is absent) —
    * used by [[compactShardEpochs]] to carry the manifest/checkpoint
    * state into the staged tree verbatim. */
  private def copyTree(spark: SparkSession, src: String, dst: String): Unit = {
    graft.TreeCopy.copy(spark, src, dst)
    ()
  }

  /** Crash-safe directory swap: rename the live `dest` ASIDE to
    * `dest-old`, rename the fully-written `staged` tree into place,
    * delete the old tree LAST. The live tree is never deleted before
    * its replacement is in place, so a crash at any point leaves a
    * complete tree recoverable by [[recoverSwap]]: before the aside →
    * `dest` untouched; between aside and swap → `staged` is complete
    * (this is only called after staging finishes) and `dest-old` holds
    * the previous tree; after the swap → `dest` is the new tree and
    * `dest-old` is deletable debris.
    */
  private[functions] def swapStaged(spark: SparkSession, staged: String,
      dest: String): Unit = {
    val destP = new org.apache.hadoop.fs.Path(dest)
    val fs = destP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new org.apache.hadoop.fs.Path(s"$dest-old")
    fs.delete(oldP, true) // debris from an earlier COMPLETED swap
    // rename results are CHECKED and the destination parent is created
    // first: HDFS-like filesystems return false (no exception) when
    // the parent is absent — an ignored false here would delete the
    // staged tree below while the marker still points at nothing (the
    // first-takedown manifest-checkpoint swap targets a _manifest_ckpt
    // dir that may not exist yet). A loud failure leaves a state
    // recoverSwap can finish or roll back.
    fs.mkdirs(destP.getParent)
    if (fs.exists(destP)) require(fs.rename(destP, oldP),
      s"swapStaged: could not rename $dest aside to $dest-old")
    require(fs.rename(new org.apache.hadoop.fs.Path(staged), destP),
      s"swapStaged: could not rename $staged into $dest")
    fs.delete(oldP, true)
    ()
  }

  /** Finish (or roll back) an interrupted [[swapStaged]]. Branches, in
    * order: `dest` present → any `dest-old` is post-swap debris, drop
    * it (a partial `staged` from a crash DURING staging is left for the
    * next compaction's own cleanup); `dest` missing and `staged`
    * present → the crash hit between the aside and the swap, when
    * staging had already completed — finish the swap; `dest` missing
    * with only `dest-old` present → roll the aside back. Idempotent and
    * cheap (2–3 metadata calls), so every shard-tree entry point runs
    * it up front.
    */
  private[graft] def recoverSwap(spark: SparkSession, dest: String,
      staged: String): Unit = {
    val destP = new org.apache.hadoop.fs.Path(dest)
    val fs = destP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new org.apache.hadoop.fs.Path(s"$dest-old")
    val stagedP = new org.apache.hadoop.fs.Path(staged)
    if (fs.exists(destP)) fs.delete(oldP, true)
    else if (fs.exists(stagedP)) {
      fs.rename(stagedP, destP)
      fs.delete(oldP, true)
    } else if (fs.exists(oldP)) fs.rename(oldP, destP)
    ()
  }

  /** Whether `dir` exists and holds at least one data file (not just
    * `_SUCCESS`) — distinguishes "empty/absent epoch" (fine, empty
    * frame) from "present but unreadable" (must throw on read). */
  private def dirHasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_"))
  }

  /** Shard-targeted read — the training-loader side of the
    * [[writeShards]]/[[appendShards]] lifecycle: load exactly one
    * stratum's bin RANGE from a shard tree. Because the tree is
    * Hive-partitioned on (stratum, bin), both predicates are static
    * partition filters: the scan lists and reads ONLY the requested
    * `stratum=…/bin=…` directories (PartitionFilters — spec-asserted
    * with the scan's partitions/files metrics, the e12 discipline), so
    * a loader scheduling bins across trainer ranks does per-rank I/O
    * proportional to its bin range, never the corpus. Works on both
    * layouts (plain [[writeShards]] trees and [[appendShards]] trees
    * with the `epoch=` sub-partition — the epoch column, when present,
    * is dropped).
    *
    * COMMITTED-ONLY on [[appendShards]] trees: when the tree has a
    * commit log, only `epoch <= committed` rows are visible — a crash
    * mid-epoch leaves partial `epoch=N` data files on disk until the
    * NEXT append's recovery pass, and without this filter a training
    * loader could read partial/duplicate rows the commit log says don't
    * exist. The filter is a static partition predicate, so it prunes at
    * the listing alongside the stratum/bin predicates. Plain
    * [[writeShards]] trees (no `_commits`) read as-is.
    *
    * @param binFrom/binTo inclusive bin range
    */
  def readShards(spark: SparkSession, path: String, stratum: String,
      binFrom: Long, binTo: Long): DataFrame = {
    require(binFrom <= binTo, "readShards: need binFrom <= binTo")
    recoverSwap(spark, path, s"$path-compacting")
    recoverTakedown(spark, path)
    val rows = spark.read.parquet(path)
      .filter(col("stratum") === stratum &&
        col("bin") >= binFrom && col("bin") <= binTo)
    committedEpoch(spark, path) match {
      case Some(c) if rows.columns.contains("epoch") =>
        rows.filter(col("epoch") <= c).drop("epoch")
      case _ => rows.drop("epoch")
    }
  }

  /** Persist a [[TextFunctions.packChunks]] span table as a
    * range-readable tree — the concat-and-chunk layout's loader half
    * (VERDICT r16 #5: t43/s21 write the span table, nothing read
    * fixed-length batches back by range the way p06 reads shards).
    * Chunk ids are dense integers (one per seqLen tokens), far too
    * many for one Hive directory each, so the tree partitions on
    * (stratum, bin) with `bin = chunk_id div chunksPerBin` — a bin is
    * the loader's scheduling unit, a directory of `chunksPerBin`
    * consecutive sequences. `chunksPerBin` rides INSIDE the artifact
    * (`_meta_chunks_per_bin`, written into the tree the same way the
    * span index carries k) so a reader can never bin-math with the
    * wrong width. Returns the span table as written.
    */
  def writeChunks(docs: DataFrame, stratumName: String, orderName: String,
      tokensName: String, seqLen: Long, path: String,
      chunksPerBin: Long = 1024L,
      maxRecordsPerFile: Long = 0L): DataFrame = {
    require(chunksPerBin >= 1L,
      s"writeChunks: chunksPerBin must be >= 1, got $chunksPerBin")
    val spark = docs.sparkSession
    val spans = TextFunctions.packChunks(docs, col(stratumName),
        col(orderName), col(tokensName), seqLen)
      .withColumnRenamed(stratumName, "stratum")
      // the loader projection (the chunkIngest schema): the span table
      // carries addresses into the corpus, never the document payload
      .select(col("stratum"), col("chunk_id"), col(orderName),
        col("doc_offset"), col("chunk_offset"), col("n_span_tokens"))
      .withColumn("bin", expr(s"chunk_id div $chunksPerBin"))
    spans.repartition(col("stratum"), col("bin"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("stratum", "bin")
      .parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_meta_chunks_per_bin"), true)
    try out.write(chunksPerBin.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the per-bin MANIFEST (the p04 discipline on the chunk grid):
    // order-key and chunk ranges per (stratum, bin), computed from the
    // just-written tree with the scan pruned to the manifest columns —
    // [[deleteFromChunks]] locates takedown candidates against these
    // ranges instead of scanning the corpus, and a loader scheduling
    // ranks reads span/token totals here instead of aggregating bins.
    // An EMPTY corpus writes no data files (schema inference on the
    // bare tree would throw), so the aggregation falls back to the
    // — equally empty — span frame and the manifest still lands with
    // the right schema.
    val treeRows = scala.util.Try(spark.read.parquet(path))
      .getOrElse(spans)
    writeChunkManifest(spark, chunkManifestRows(treeRows, orderName),
      path)
    spans
  }

  /** The manifest aggregation shared by [[writeChunks]] and the
    * [[deleteFromChunks]] reset: one partial-aggregatable pass. */
  private def chunkManifestRows(rows: DataFrame,
      orderName: String): DataFrame =
    rows.groupBy(col("stratum"), col("bin").cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("n_span_tokens").cast(LongType)).as("n_span_tokens"),
        min(col("chunk_id")).as("first_chunk"),
        max(col("chunk_id")).as("last_chunk"),
        min(col(orderName)).as("first_doc"),
        max(col(orderName)).as("last_doc"))

  private def writeChunkManifest(spark: SparkSession, rows: DataFrame,
      path: String): Unit =
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/_chunk_manifest")

  /** Read a [[writeChunks]] tree's per-bin manifest: (stratum, bin,
    * n_spans, n_span_tokens, first_chunk, last_chunk, first_doc,
    * last_doc). Recovers interrupted takedown swaps first (the
    * [[readShardManifest]] discipline). Loud on pre-manifest trees —
    * re-run [[writeChunks]] rather than range-guessing. */
  def readChunkManifest(spark: SparkSession, path: String): DataFrame = {
    recoverChunkTakedown(spark, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/_chunk_manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"readChunkManifest: no _chunk_manifest under $path — a " +
        "pre-manifest writeChunks tree; rebuild with writeChunks to " +
        "get the takedown/loader manifest")
    spark.read.parquet(s"$path/_chunk_manifest")
  }

  /** TAKEDOWN for a [[writeChunks]] chunk grid — the deletion verb the
    * concat-and-chunk lifecycle was missing ([[deleteFromShards]]'s
    * rule applied to the span table a training loader ACTUALLY reads):
    * remove every span whose ORDER key appears in `ids`
    * (single-column frame), rewriting ONLY the `stratum=…/bin=…`
    * partitions whose manifest [first_doc, last_doc] range can contain
    * them — a broadcast range join against the tiny manifest, never a
    * corpus scan; a range false positive rewrites a bin to identical
    * content (wasted I/O, never wrong data).
    *
    * FROZEN-HOLES policy (the p12 frozen-bin rule on the sequence
    * grid): deleted documents' spans vanish; every surviving span
    * keeps its chunk_id, chunk_offset and doc_offset VERBATIM, so
    * untouched bins are bit-identical, [[readChunks]]' bin arithmetic
    * is unchanged, and a training loader sees the same sequence ids
    * with holes where the deleted text was (it already pads the final
    * sequence; a takedown hole is the same mask case). Re-packing
    * would re-flow every later chunk in the stratum — exactly what a
    * takedown must NOT do; rebuild with [[writeChunks]] when re-flow
    * is wanted.
    *
    * Crash safety is [[deleteFromShards]]' verbatim: per-bin
    * stage-and-swap under `_delete_staged`/`_delete_old`
    * ([[recoverChunkTakedown]] runs up front here and in the read
    * entry points), the manifest RESET staged and swapped (touched
    * bins' rows recomputed from the kept rows; a fully-deleted bin
    * leaves the manifest), all under the takedown lease LOCK
    * ([[withTakedownLease]] — single-writer, loud on contention,
    * stale-crash takeover). IDEMPOTENT: a re-run with the same ids
    * converges (recomputed ranges no longer cover them, or a covering
    * bin rewrites to identical content). Returns the fresh manifest.
    */
  def deleteFromChunks(spark: SparkSession, path: String, ids: DataFrame,
      orderName: String, maxRecordsPerFile: Long = 0L): DataFrame = {
    chunksPerBinOf(spark, path) // fail fast on non-writeChunks trees
    withTakedownLease(spark, path, "deleteFromChunks") {
      recoverChunkSwaps(spark, path)
      require(new org.apache.hadoop.fs.Path(s"$path/_chunk_manifest")
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(s"$path/_chunk_manifest")),
        s"deleteFromChunks: no _chunk_manifest under $path — a " +
          "pre-manifest writeChunks tree; rebuild with writeChunks " +
          "before running takedowns")
      val idSide = broadcast(
        ids.select(col(ids.columns.head).as("__del_id")).distinct())
      val manifest = spark.read.parquet(s"$path/_chunk_manifest")
      val touchedDf = manifest.join(idSide,
        col("__del_id") >= col("first_doc") &&
          col("__del_id") <= col("last_doc"), "left_semi")
      val touched = touchedDf.select(col("stratum"), col("bin")).collect()
      val keptRows = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      if (touched.nonEmpty) {
        // ONE partition-pruned read + ONE partitioned staged write for
        // every touched bin (the deleteFromShards plan shape: a
        // per-bin job loop pays fixed job overhead per bin); small
        // touched sets prune statically via an OR-chain, larger ones
        // via a broadcast semi join on the partition columns
        val tree = spark.read.parquet(path)
        val rows =
          if (touched.length <= 64)
            tree.filter(touched.map(r =>
                col("stratum") === lit(r.get(0)) &&
                  col("bin") === lit(r.get(1)))
              .reduce(_ || _))
          else
            tree.join(
              broadcast(touchedDf.select(col("stratum"), col("bin"))
                .distinct()),
              Seq("stratum", "bin"), "left_semi")
        val kept = rows.join(idSide,
          rows(orderName) === col("__del_id"), "left_anti").persist()
        try {
          kept.write.mode("overwrite")
            .option("maxRecordsPerFile", maxRecordsPerFile)
            .partitionBy("stratum", "bin")
            .parquet(s"$path/_delete_staged")
          // fresh manifest rows for the touched bins, collected BEFORE
          // the swaps (the lazy frame reads the pre-swap files)
          chunkManifestRows(kept, orderName)
            .collect().foreach(keptRows += _)
        } finally kept.unpersist()
        swapTouchedBins(spark, path, touched, "deleteFromChunks")
      }
      // no bins touched (the idempotent replay / no-match sweep) =
      // nothing to reset: skip the staged manifest rewrite entirely
      // instead of swapping in a byte-identical copy (wasted I/O and
      // an unnecessary crash window on every replayed takedown)
      if (touched.nonEmpty) {
        val manifestSchema =
          spark.read.parquet(s"$path/_chunk_manifest").schema
        val recomputed = spark.createDataFrame(
          new java.util.ArrayList(
            scala.jdk.CollectionConverters.SeqHasAsJava(keptRows.toSeq)
              .asJava),
          manifestSchema)
        val untouched = spark.read.parquet(s"$path/_chunk_manifest").join(
          touchedDf.select(col("stratum"), col("bin")).distinct(),
          Seq("stratum", "bin"), "left_anti")
        // STAGE the reset manifest, never overwrite in place (the
        // deleteFromShards checkpoint rule): the staged write fully
        // consumes the live manifest's files before the swap moves them
        untouched.unionByName(recomputed)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$path/_chunk_manifest_staged")
        swapStaged(spark, s"$path/_chunk_manifest_staged",
          s"$path/_chunk_manifest")
      }
      deleteMarker(spark, s"$path/_delete_staged")
      deleteMarker(spark, s"$path/_delete_old")
    }
    readChunkManifest(spark, path)
  }

  /** The chunk-grid recovery bodies (caller holds the lease): finish
    * or roll back per-bin swaps, then an interrupted manifest swap.
    * Mid-staging manifest debris (live manifest intact, a partial
    * `_chunk_manifest_staged` from a crash DURING the staged write)
    * is DELETED — recoverSwap deliberately leaves it, but here the
    * next takedown rewrites it from scratch anyway, and leaving it
    * would make every later read detect "debris", win the lease, and
    * no-op forever (and a writer racing one of those transient reader
    * leases would throw a spurious concurrent-takedown error). */
  private def recoverChunkSwaps(spark: SparkSession, path: String): Unit = {
    recoverBinSwaps(spark, path)
    recoverSwap(spark, s"$path/_chunk_manifest",
      s"$path/_chunk_manifest_staged")
    deleteMarker(spark, s"$path/_chunk_manifest_staged")
  }

  /** Reader-side takedown recovery for [[writeChunks]] trees — the
    * [[recoverTakedown]] lease-lock protocol on the chunk grid: while
    * the takedown lease is FRESH a live writer owns the tree and
    * readers skip recovery (mid-swap they see at worst a
    * not-yet-deleted or already-absent bin — inside the documented
    * monotone-deletion window); stale debris is recovered only after
    * WINNING the same create-exclusive lease a starting writer takes,
    * so reader recovery and a new writer can never interleave.
    * Healthy trees pay a few `exists` probes.
    */
  private[functions] def recoverChunkTakedown(spark: SparkSession,
      path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val lease = new org.apache.hadoop.fs.Path(s"$path/_delete_lease")
    val fs = lease.getFileSystem(conf)
    if (leaseFresh(fs, lease)) return // a live writer owns the tree
    def ex(p: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(p))
    val debris = ex(s"$path/_delete_old") || ex(s"$path/_delete_staged") ||
      ex(s"$path/_chunk_manifest_staged") ||
      ex(s"$path/_chunk_manifest-old")
    if (!debris) {
      if (scala.util.Try(fs.getFileStatus(lease)).isSuccess)
        claimStaleLease(fs, lease)
      return
    }
    if (!acquireDeleteLease(fs, lease, failIfHeld = false)) return
    try recoverChunkSwaps(spark, path)
    finally {
      fs.delete(lease, false) // ours — acquired above
      ()
    }
  }

  /** The `chunksPerBin` a [[writeChunks]] tree was laid out with. */
  private def chunksPerBinOf(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_meta_chunks_per_bin")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"readChunks: no _meta_chunks_per_bin under $path — not a " +
        "writeChunks tree")
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      new String(buf.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    } finally in.close()
  }

  /** Serve one stratum's chunk-id RANGE from a [[writeChunks]] tree —
    * the training loader's "give rank R sequences [from, to]" call.
    * The stratum equality and the derived bin range are STATIC
    * partition filters (only the covering `stratum=…/bin=…`
    * directories are listed or read — the [[readShards]] discipline,
    * spec-asserted); the exact chunk_id bounds then prune row groups
    * via the parquet min/max pushdown within those bins. I/O is
    * proportional to the requested range, never the corpus.
    *
    * @param chunkFrom/chunkTo inclusive chunk_id range
    */
  def readChunks(spark: SparkSession, path: String, stratum: String,
      chunkFrom: Long, chunkTo: Long): DataFrame = {
    require(chunkFrom <= chunkTo, "readChunks: need chunkFrom <= chunkTo")
    recoverChunkTakedown(spark, path)
    val cpb = chunksPerBinOf(spark, path)
    spark.read.parquet(path)
      .filter(col("stratum") === stratum &&
        col("bin") >= Math.floorDiv(chunkFrom, cpb) &&
        col("bin") <= Math.floorDiv(chunkTo, cpb) &&
        col("chunk_id") >= chunkFrom && col("chunk_id") <= chunkTo)
      .drop("bin")
  }

  /** Last committed [[appendShards]] epoch: max name in `_commits/`. */
  private def committedEpoch(spark: SparkSession, path: String): Option[Long] =
    listMarkers(spark, s"$path/_commits").maxOption

  private def inflightEpochs(spark: SparkSession, path: String): Seq[Long] =
    listMarkers(spark, s"$path/_inflight")

  /** Epoch numbers of the `epoch=N` partition dirs under `dir` (empty
    * if the dir doesn't exist) — one metadata listing. */
  private def listEpochDirs(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .flatMap(n => scala.util.Try(n.stripPrefix("epoch=").toLong).toOption)
  }

  private def listMarkers(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
  }

  private def touchMarker(spark: SparkSession, file: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    out.close()
  }

  private def deleteMarker(spark: SparkSession, file: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** Keep the commit log O(1) to list: drop markers below the newest
    * (the max defines the committed epoch; deleting history is safe at
    * any crash point). */
  private def pruneMarkers(spark: SparkSession, dir: String,
      keep: Long): Unit =
    listMarkers(spark, dir).filter(_ < keep)
      .foreach(e => deleteMarker(spark, s"$dir/$e"))

  /** Remove a crashed epoch's partial `epoch=N` data dirs (glob over
    * the partition tree — recovery-path only, never steady state). */
  private def deleteEpochDirs(spark: SparkSession, path: String,
      epoch: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) {
      val glob = new org.apache.hadoop.fs.Path(s"$path/*/*/epoch=$epoch")
      val hits = fs.globStatus(glob)
      if (hits != null) hits.foreach(h => fs.delete(h.getPath, true))
    }
    deleteMarker(spark, s"$path/_manifest_delta/epoch=$epoch")
    deleteMarker(spark, s"$path/_carry/epoch=$epoch")
    deleteMarker(spark, s"$path/_inflight/$epoch")
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

  /** Morton (Z-order) interleave of two non-negative dimension codes:
    * bit `i` of `a` lands at z-bit `2i`, bit `i` of `b` at `2i+1`, for
    * the low `bits` bits of each. Pure long arithmetic unrolled at
    * plan-build time into `bits` shift/mask/or terms — codegen'd,
    * zero shuffle, engine-portable (the same shifts in any SQL
    * dialect). Callers must pre-code dimensions into `[0, 2^bits)`;
    * out-of-range inputs fail loudly rather than silently aliasing
    * into a neighbor's tile.
    */
  def zorderValue(a: Column, b: Column, bits: Int): Column =
    zorderValue(Seq(a, b), bits)

  /** N-dimensional Morton interleave (round-robin: bit `i` of dimension
    * `j` lands at z-bit `i·D + j`, so for D = 2 this IS the classic
    * (a, b) layout above — the 2-D form is a view of this one). Real
    * z-order clustering takes however many dimensions the corpus is
    * queried by (Delta `OPTIMIZE ZORDER BY c1, …, cN`); the interleave
    * stays pure unrolled long arithmetic — codegen'd, zero shuffle,
    * engine-portable — and each dimension keeps its own loud
    * out-of-range guard (silent aliasing into a neighbor's tile is the
    * failure a layout op can least afford). `bits · D ≤ 63` keeps the
    * key in one signed long.
    */
  def zorderValue(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d >= 1, "zorderValue: need at least one dimension")
    require(bits >= 1 && bits * d <= 63,
      s"zorderValue: need 1 <= bits and bits*dims <= 63 (got $bits*$d)")
    val cap = 1L << bits
    val guard = (c: Column, n: String) =>
      when(c.isNull || c < 0 || c >= cap,
        raise_error(concat(lit(s"zorderValue: $n out of [0, $cap): "),
          c.cast("string")))).otherwise(c)
    val vs = dims.zipWithIndex.map { case (c, j) =>
      guard(c.cast(LongType), if (d == 2) (if (j == 0) "a" else "b")
        else s"dim$j") }
    (for {
      i <- 0 until bits
      (v, j) <- vs.zipWithIndex
    } yield shiftleft(shiftright(v, i).bitwiseAND(1L), i * d + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Z-order clustered layout — the multi-dimensional data-skipping
    * organization (Delta `OPTIMIZE ZORDER BY` / Hudi space-filling
    * clustering, built here from first principles): range-partition
    * the corpus by [[zorderValue]] into `numFiles` write tasks and
    * sort within each, so every output file covers one contiguous
    * z-range = one aligned tile of the (a, b) grid. A min/max-pruned
    * scan with a predicate on EITHER dimension then touches
    * `O(numFiles^(1/2))`-ish of the files, where a 1-D sort serves
    * only its own sort key and reads everything for the other
    * dimension (ZorderSpec measures exactly this on a uniform grid).
    * Cost: the one range-exchange any clustered rewrite pays; the
    * z-value itself is a zero-shuffle projection. This is a LAYOUT
    * op: run it once per rewrite cycle, not per query.
    */
  def zorderLayout(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int): DataFrame =
    zorderLayout(df, Seq(a, b), bits, numFiles)

  /** N-dimensional [[zorderLayout]] — one range exchange on the
    * [[zorderValue]] key over however many dimensions the corpus is
    * queried by. The staging key column picks a name the input does
    * not already use (an input that legitimately carries a `__z`
    * column must survive the layout intact, not be silently
    * overwritten and dropped).
    */
  def zorderLayout(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, "zorderLayout: numFiles must be positive")
    val z = Iterator.from(0)
      .map(i => if (i == 0) "__z" else s"__z$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(z, zorderValue(dims, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }
}
