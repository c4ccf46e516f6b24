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
}
