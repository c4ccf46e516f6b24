package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for 100 TB-scale corpora. Four tiers, from
  * exact to fuzzy, each expressed as shuffle-minimal DataFrame plans:
  *
  *   - exact:     one hash-aggregate on the dedup key
  *   - fingerprint: exact over a normalization hash ([[TextFunctions.fingerprint]])
  *   - MinHash+LSH: shingle → k minhashes (ONE aggregate produces all k)
  *                  → banded bucket join → candidate pairs, O(n·shingles)
  *                  instead of O(n²)
  *   - n-gram Jaccard: exact pair scores via an inverted shingle index —
  *                  the verification stage behind MinHash candidates
  *
  * SimHash gives a complementary hamming-distance signature.
  */
object Dedup {

  /** Candidate-pair strategy for the composed one-call entry points
    * ([[dedupNear]], [[dedupIncremental]], [[Curation.curate]]) — the
    * scale dial SCALE.md's 100 TB rule ("on a full corpus, always
    * LSH-gate first") requires to be REACHABLE from the APIs a
    * pipeline user actually calls, not only from the building blocks:
    *
    *   - [[Exact]]: inverted-index Jaccard over every shingle-sharing
    *     pair (the d03 stage). Complete recall; join cost is Σ df²
    *     over shingle doc frequencies, so at corpus scale it NEEDS
    *     `maxShingleDocFreq` (boilerplate shingles otherwise make the
    *     self-join quadratic). Right for batches / per-partition runs
    *     that fit the quadratic budget.
    *   - [[MinHashLsh]]: MinHash signatures → banded buckets →
    *     candidate pairs → EXACT Jaccard verify on candidates only
    *     (the d04 + [[jaccardForPairs]] composition) — near-linear
    *     candidate generation, the 100 TB default. Recall is
    *     probabilistic in (bands, rowsPerBand) — identical docs always
    *     collide; borderline pairs may be missed — while the verify
    *     stage removes every false positive, so emitted scores are
    *     exact either way.
    *
    * Both honor the stop-shingle guard: hot shingles leave the index
    * BEFORE any signature/pairing work, and the verified score is the
    * exact Jaccard over the pruned shingle space ([[hotShingles]] is
    * the accounting in both modes). [[Containment]] swaps the scorer
    * for subset-duplication detection; [[Auto]] (the composed APIs'
    * default) picks guarded-[[Exact]] vs recall-floor-sized
    * [[MinHashLsh]] from the corpus size, so the naive call is
    * scale-safe by construction.
    */
  sealed trait PairStrategy { def maxShingleDocFreq: Int }

  /** Exact inverted-index pairing (d03) with the stop-shingle guard. */
  final case class Exact(maxShingleDocFreq: Int = Int.MaxValue)
    extends PairStrategy

  /** LSH-gated pairing (d04 candidates, exact verify). `maxBucketSize`
    * is [[lshCandidatePairs]]'s hot-bucket guard; `broadcastPairs`
    * controls the verify join (set false when the candidate list
    * outgrows broadcast — correctness is identical).
    */
  final case class MinHashLsh(bands: Int = 4, rowsPerBand: Int = 2,
      maxBucketSize: Int = Int.MaxValue,
      maxShingleDocFreq: Int = Int.MaxValue,
      broadcastPairs: Boolean = true) extends PairStrategy

  /** Containment pairing (the d09 scorer): edge when
    * `common / min(|A|, |B|) ≥ threshold` — catches SUBSET duplication
    * (a document embedded verbatim in a larger one scores ~1.0 here
    * while its symmetric Jaccard can be arbitrarily low, so
    * Jaccard-keyed dedup ships the duplicate). Same inverted-index
    * join shape and `maxShingleDocFreq` guard as [[Exact]].
    */
  final case class Containment(maxShingleDocFreq: Int = Int.MaxValue)
    extends PairStrategy

  /** Corpus-size-adaptive pairing — the scale-safe DEFAULT for the
    * composed entry points ([[dedupNear]], [[dedupIncremental]],
    * [[Curation.curate]]): resolves to [[Exact]] with a FINITE
    * stop-shingle guard while the corpus fits the documented quadratic
    * budget (`docCount ≤ maxExactDocs` — complete recall where the
    * Σ df² join is affordable), and to [[MinHashLsh.sized]] at the
    * dedup threshold (recall ≥ 0.95 banding, same finite guard) above
    * it. This removes the 100 TB footgun of an unguarded-exact
    * default: a naive `dedupNear(df, id, text)` call now takes the
    * banded-candidate path exactly when corpus size demands it, and
    * boilerplate shingles are capped in BOTH modes. Resolution costs
    * one count of the input — metadata-cheap against columnar sources
    * and a rounding error next to the pair join it sizes; pass an
    * explicit strategy to skip the count and pin the mode.
    */
  final case class Auto(maxExactDocs: Long = 100000L,
      maxShingleDocFreq: Int = 10000) extends PairStrategy

  /** [[Auto]] resolution at a known corpus size (by-name, so the count
    * job only runs when the strategy actually is [[Auto]]).
    */
  private[graft] def resolveStrategy(strategy: PairStrategy,
      threshold: Double, docCount: => Long): PairStrategy = strategy match {
    case Auto(maxExact, maxDf) =>
      if (docCount <= maxExact) Exact(maxDf)
      else MinHashLsh.sized(threshold).copy(maxShingleDocFreq = maxDf)
    case s => s
  }

  object MinHashLsh {

    /** Banded-LSH collision probability for a pair at Jaccard `s`
      * under (bands, rowsPerBand): `1 − (1 − s^r)^b` — the S-curve
      * whose inflection `(1/b)^(1/r)` the banding trades around.
      */
    def recallAt(s: Double, bands: Int, rowsPerBand: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)

    /** The sizing rule for [[MinHashLsh]], applied not just documented
      * (the `autoPlanes` / `autoSimhashBits` discipline): the MOST
      * SELECTIVE (bands, rowsPerBand) whose recall at `threshold` is
      * ≥ `minRecall` within a signature budget of `maxSignature` =
      * bands·rowsPerBand minhashes. Larger r sharpens the S-curve
      * (fewer sub-threshold false candidates reach the verify join —
      * the work that grows with the corpus); for each r the smallest
      * sufficient b is `ceil(ln(1−minRecall) / ln(1−t^r))`, and the
      * largest r whose (b·r) fits the budget wins. The default budget
      * 16 matches one 128-bit digest worth of 8-byte minhashes per
      * two docs — signatures stay a rounding error next to the shingle
      * index. Throws if even r = 1 cannot reach `minRecall` within the
      * budget (raise `maxSignature` or lower `minRecall`).
      */
    def sized(threshold: Double, minRecall: Double = 0.95,
        maxSignature: Int = 16): MinHashLsh = {
      require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
      require(minRecall > 0 && minRecall < 1, "minRecall must be in (0, 1)")
      val fits = (1 to maxSignature).flatMap { r =>
        // log1p(-t^r), not log(1 - t^r): for small thresholds t^r
        // underflows the subtraction (1.0 - t^r == 1.0 in doubles),
        // log returns 0 and the division collapses b to a garbage
        // value that "fits" with recall ≈ 0 — log1p is exact for tiny
        // t^r. The recallAt re-check below is the defensive floor.
        val bReal = math.ceil(
          math.log1p(-minRecall) / math.log1p(-math.pow(threshold, r)))
        if (bReal >= 1.0 && bReal * r <= maxSignature &&
            recallAt(threshold, bReal.toInt, r) >= minRecall)
          Some((bReal.toInt, r))
        else None
      }
      require(fits.nonEmpty,
        s"MinHashLsh.sized: no (bands, rows) within $maxSignature minhashes " +
          s"reaches recall $minRecall at threshold $threshold — raise " +
          "maxSignature or lower minRecall")
      val (b, r) = fits.maxBy(_._2)
      MinHashLsh(bands = b, rowsPerBand = r)
    }
  }

  /** Near-dup pairs ≥ `threshold` under the chosen [[PairStrategy]] —
    * the pluggable pair stage behind [[dedupNear]]. Returns
    * (id_a, id_b, score) in EVERY mode — the score column is aliased
    * uniformly so callers can switch strategy without rewiring
    * downstream selects; its meaning is per-strategy (exact Jaccard
    * for [[Exact]]/[[MinHashLsh]]/[[Auto]], containment for
    * [[Containment]] — the building blocks [[jaccardPairs]] /
    * [[containmentPairs]] keep their semantic names).
    */
  def nearDupPairs(shingles: DataFrame, threshold: Double,
      strategy: PairStrategy = Auto(),
      materialize: Boolean = true): DataFrame = strategy match {
    case Exact(maxDf) =>
      jaccardPairs(shingles, threshold, maxDf, materialize)
        .withColumnRenamed("jaccard", "score")
    case Containment(maxDf) =>
      containmentPairs(shingles, threshold, maxDf, materialize)
        .withColumnRenamed("containment", "score")
    case MinHashLsh(bands, rowsPerBand, maxBucket, maxDf, bcast) =>
      val sh0 = guardShingles(shingles, maxDf)
      // signature AND verify stages read the (guarded) shingle frame
      val sh = if (materialize) Materialize(sh0) else sh0
      val cands = lshCandidatePairs(
        minhashSignatures(sh, bands * rowsPerBand), bands, rowsPerBand,
        maxBucket)
      jaccardForPairs(sh, cands, threshold, bcast)
        .withColumnRenamed("jaccard", "score")
    case a: Auto =>
      nearDupPairs(shingles, threshold, resolveStrategy(a, threshold,
        shingles.select(col("doc_id")).distinct().count()), materialize)
  }

  /** Shingle-text-level stop-shingle guard (the [[hashedShingles]]
    * rule applied BEFORE signature computation, for stages that need
    * the shingle text): drops shingles in more than `maxDocFreq` docs
    * via a broadcast anti-join of the tiny hot set.
    */
  private def guardShingles(shingles: DataFrame, maxDocFreq: Int): DataFrame =
    if (maxDocFreq == Int.MaxValue) shingles
    else shingles.join(
      broadcast(hotShingles(shingles, maxDocFreq).select(col("shingle"))),
      Seq("shingle"), "left_anti")

  /** Exact dedup: keep the minimum-id row per key (id ties broken by
    * the remaining columns, so the result is deterministic). ONE
    * shuffle as a partial-aggregatable min over (id, row) structs —
    * map-side combine collapses each key's duplicates BEFORE the
    * exchange, so a hot key (empty text, a boilerplate document
    * repeated 10⁹ times) ships one row per map task instead of
    * concentrating its whole group into a single task's window sort.
    * [[dedupLines]] states the same rule ("a partial-aggregatable
    * min, never a row_number window"); this is its whole-row form.
    * Requires orderable column types (no maps) — the normal case for
    * a dedup input.
    */
  def dedupExact(df: DataFrame, key: Column, id: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(key.as("__dedup_key"))
      .agg(min(struct(id.as("__ord_id") +: cols.map(col(_)): _*)).as("__keep"))
      .select(cols.map(c => col(s"__keep.`$c`").as(c)): _*)
  }

  /** Duplicate groups: key → representative id + multiplicity (> 1). */
  def duplicateGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Distinct word-shingle set per document, exploded to
    * (id, shingle) rows — the inverted-index base for Jaccard/MinHash.
    *
    * The dedup is IN-ROW (`array_distinct` before the explode), not a
    * `.distinct()` of the exploded stream: a document's repeats are the
    * only duplicates possible when `id` is unique per input row (every
    * caller's contract — ids are document keys), and a global distinct
    * would shuffle the ENTIRE (doc, shingle) stream — the widest
    * intermediate in every shingle-based operator — on a key no
    * downstream stage groups by (they re-shuffle on the shingle hash).
    * At corpus scale that removed shuffle is the difference between one
    * wide exchange per dedup run and zero.
    *
    * The shingle build itself is the fused native
    * [[graft.functions.expressions.DistinctWordShingles]] expression
    * (one pass over the word array, dedup included) — bit-identical to
    * `array_distinct(wordShingles(words, n))`, without the
    * interpreted per-window lambda evaluation.
    */
  def shingleRows(df: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    df.select(id.as("doc_id"),
      explode(expressions.DistinctWordShingles(TextFunctions.words(text), n))
        .as("shingle"))

  /** k MinHash signature values per document, computed in ONE aggregate
    * pass (k min() columns over the exploded shingles) — no per-seed
    * re-shuffle. Portable hash: md5 of `seed:shingle`, hex-string min —
    * a uniform permutation surrogate any engine reproduces.
    */
  def minhashSignatures(shingles: DataFrame, k: Int = 8): DataFrame =
    shingles.groupBy(col("doc_id"))
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("mh0"),
        (1 until k).map(j =>
          min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j")): _*)

  /** Banded bucket rows (doc_id, keys, band, key) behind
    * [[lshCandidatePairs]] and [[lshDroppedBuckets]]: the full band-key
    * array is computed once per document and carried through the
    * explode, so the multi-band duplicate-pair dedup can be a codegen
    * filter over data already on the joined row (see
    * [[lshCandidatePairs]]) instead of a distinct() shuffle.
    */
  private def lshBucketRows(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val keyCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      concat_ws("|", parts: _*)
    }
    sigs.select(col("doc_id"), array(keyCols: _*).as("keys"))
      .select(col("doc_id"), col("keys"),
        posexplode(col("keys")).as(Seq("band", "key")))
  }

  /** First-matching-band dedup predicate over two band-key arrays joined
    * at band `band`: true iff no lower-indexed band already collided, so
    * a pair colliding in several bands is emitted exactly once — by a
    * codegen'd array-element comparison, not a distinct() shuffle of the
    * candidate set. CASE-chain shaped (not an OR of `band = i AND …`
    * arms) for the same exchange-reuse reason as
    * `Similarity.firstMatchingTable`.
    */
  private def firstMatchingBand(ka: Column, kb: Column, bands: Int): Column =
    (0 until bands).foldRight(lit(false)) { (t, elseBranch) =>
      val earlierAllDiffer = (0 until t)
        .map(k => !(element_at(ka, k + 1) === element_at(kb, k + 1)))
        .foldLeft(lit(true))(_ && _)
      when(col("band") === t, earlierAllDiffer).otherwise(elseBranch)
    }

  /** LSH banding: (bands × rowsPerBand) signature values → one bucket key
    * per band; docs sharing any bucket become candidate pairs. Candidate
    * generation is a self-join per bucket — with b·r = k small and
    * buckets well-distributed this is near-linear, the core trick that
    * makes fuzzy dedup feasible at 100 TB.
    *
    * `maxBucketSize` is the hot-bucket guard: a bucket with m members
    * yields m·(m−1)/2 candidates, so ONE boilerplate-heavy bucket (the
    * normal case in web crawls — shared headers, license blocks) turns
    * the self-join quadratic. Buckets larger than the cap are dropped
    * BEFORE the join via a broadcast anti-join (the hot set is tiny by
    * definition — it's the buckets that exceeded the cap). Dropping a
    * bucket is a recall trade-off, never silent: call
    * [[lshDroppedBuckets]] with the same arguments to enumerate exactly
    * which buckets (and how many members) the cap suppressed, and log
    * or persist that accounting next to the dedup output.
    *
    * Pairs colliding in several bands emit ONCE via the codegen'd
    * [[firstMatchingBand]] filter over the band-key arrays already on
    * the joined rows — no distinct() shuffle of the candidate set (the
    * same shape as the simhash and hyperplane-LSH candidate stages).
    */
  def lshCandidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val buckets0 = lshBucketRows(sigs, bands, rowsPerBand)
    val buckets =
      if (maxBucketSize == Int.MaxValue) buckets0
      else buckets0.join(
        broadcast(lshDroppedBuckets(sigs, bands, rowsPerBand, maxBucketSize)
          .select(col("band"), col("key"))),
        Seq("band", "key"), "left_anti")
    val a = buckets.select(col("doc_id").as("id_a"), col("keys").as("ka"),
      col("band"), col("key"))
    val b = buckets.select(col("doc_id").as("id_b"), col("keys").as("kb"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b") &&
        firstMatchingBand(col("ka"), col("kb"), bands))
      .select(col("id_a"), col("id_b"))
  }

  /** The accounting side of [[lshCandidatePairs]]'s `maxBucketSize`
    * guard: (band, key, bucket_size) for every bucket the cap drops.
    * One aggregate over the bucket rows — run it (or `.count()` it)
    * whenever the cap is active, so a capped dedup run always reports
    * what it skipped instead of silently under-recalling.
    */
  def lshDroppedBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int,
      maxBucketSize: Int): DataFrame =
    lshBucketRows(sigs, bands, rowsPerBand)
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > maxBucketSize)

  /** Hashed shingle index (doc_id, h) with the optional stop-shingle
    * guard behind [[jaccardPairs]] / [[containmentPairs]]: a shingle
    * appearing in more than `maxDocFreq` documents contributes
    * df·(df−1)/2 joined rows, so boilerplate shingles (shared headers,
    * license text — the normal case in web crawls) make the inverted-
    * index self-join quadratic in their document frequency. Hashes over
    * the cap are removed with a broadcast anti-join (the hot set is tiny
    * by definition). Use [[hotShingles]] with the same cap for the
    * accounting — a capped run should always report what it dropped.
    */
  private def hashedShingles(shingles: DataFrame, maxDocFreq: Int,
      materialize: Boolean = false): DataFrame = {
    val hs0 = shingles.select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    // materialize = persist the inverted index once (16 bytes/shingle,
    // far smaller than the text) instead of re-running the scan +
    // shingle projection for every consumer — the winnowPairs seam,
    // measured ~20% on the d03 shape
    val hs = if (materialize) Materialize(hs0) else hs0
    if (maxDocFreq == Int.MaxValue) hs
    else hs.join(
      broadcast(hs.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq).select(col("h"))),
      Seq("h"), "left_anti")
  }

  /** Accounting for the `maxShingleDocFreq` guard: (shingle, doc_freq)
    * for every shingle the cap removes from the index. `shingles` must
    * be [[shingleRows]] output (distinct per doc, so count = doc freq).
    */
  def hotShingles(shingles: DataFrame, maxDocFreq: Int): DataFrame =
    shingles.groupBy(col("shingle")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") > maxDocFreq)

  /** Exact pairwise Jaccard over the inverted shingle index: join on
    * shingle, count common, |A∪B| = |A|+|B|−common. Only emits pairs
    * with ≥ 1 shared shingle — the index prunes the O(n²) space.
    *
    * The join key is `xxhash64(shingle)` — a fixed-width long compares
    * and shuffles far cheaper than the shingle text (collision odds for
    * a v-shingle vocabulary are ~v²/2⁶⁴; at any realistic vocabulary
    * that is < 1e-9, and a collision only perturbs one pair's count
    * by 1).
    *
    * `maxShingleDocFreq` (default off) enables the stop-shingle guard:
    * hot shingles leave the index BEFORE the self-join, and the per-doc
    * sizes are computed on the pruned index, so the score is the exact
    * Jaccard over the stopword-pruned shingle space — the standard
    * boilerplate-robust variant, with [[hotShingles]] as its explicit
    * accounting.
    *
    * `materialize` (default true) materializes the hashed index via
    * [[Materialize]]: three consumers (both self-join sides + the
    * per-doc counts) read it, its producer is a zero-shuffle projection
    * with no exchange to reuse, and the index (16 bytes/shingle) is far
    * smaller than the text it derives from — the [[winnowPairs]] seam.
    * HOW it materializes (fast executor-local blocks vs fault-tolerant
    * reliable checkpoint — the at-scale choice) is the
    * `spark.graft.materialize` conf; see [[Materialize]] for the
    * executor-loss trade-off. Pass false if you maintain a persisted
    * index yourself.
    */
  def jaccardPairs(shingles: DataFrame, threshold: Double,
      maxShingleDocFreq: Int = Int.MaxValue,
      materialize: Boolean = true): DataFrame = {
    val hs = hashedShingles(shingles, maxShingleDocFreq, materialize)
    val counts = hs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = hs.as("a")
    val b = hs.as("b")
    val common = a.join(b,
        col("a.h") === col("b.h")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    jaccardFromCommon(common, counts, threshold)
  }

  /** Containment near-dup pairs: `common / min(|A|, |B|)` over the
    * inverted shingle index. Containment catches SUBSET duplication —
    * a document embedded verbatim inside a larger one scores ~1.0 here
    * while its symmetric Jaccard (common/union) can be arbitrarily low,
    * so Jaccard-only dedup ships the duplicate. Same join shape, scale
    * profile, and `maxShingleDocFreq` stop-shingle guard as
    * [[jaccardPairs]] (index prunes the pair space; LSH-gate first at
    * full corpus scale).
    */
  def containmentPairs(shingles: DataFrame, threshold: Double,
      maxShingleDocFreq: Int = Int.MaxValue,
      materialize: Boolean = true): DataFrame = {
    val hs = hashedShingles(shingles, maxShingleDocFreq, materialize)
    val counts = hs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = hs.as("a")
    val b = hs.as("b")
    a.join(b,
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
      .join(counts.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("id_b") === col("cb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast(DoubleType) /
          least(col("ca.n"), col("cb.n"))).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Train/test DECONTAMINATION: for every (corpus doc, benchmark doc)
    * pair sharing at least `minCommon` distinct n-gram shingles, the
    * shared count — the standard contamination check before training on
    * a scraped corpus (benchmark items leaked into training data score
    * high here and get dropped). Same inverted-index join shape and
    * scale profile as [[jaccardPairs]], but ASYMMETRIC: the benchmark
    * side is orders of magnitude smaller than the corpus, so the
    * shuffle is dominated by one pass over the corpus shingles and the
    * group-by keys are bounded by true overlaps. `maxShingleDocFreq`
    * prunes stop-shingles exactly as in [[jaccardPairs]] (frequency
    * computed across both sides combined, so a shingle ubiquitous in
    * the corpus cannot flood the join through a rare benchmark hit).
    * Returns (doc_id, bench_id, common).
    */
  def ngramOverlapPairs(corpusShingles: DataFrame, benchShingles: DataFrame,
      minCommon: Long = 1L, maxShingleDocFreq: Int = Int.MaxValue): DataFrame = {
    val tagged = corpusShingles.withColumn("__side", lit(0))
      .unionByName(benchShingles.withColumn("__side", lit(1)))
    val hs = hashedShingles(tagged.select(
      struct(col("__side"), col("doc_id")).as("doc_id"), col("shingle")),
      maxShingleDocFreq)
    val a = hs.filter(col("doc_id.__side") === 0)
      .select(col("doc_id.doc_id").as("doc_id"), col("h"))
    val b = hs.filter(col("doc_id.__side") === 1)
      .select(col("doc_id.doc_id").as("bench_id"), col("h"))
    a.join(b, Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
  }

  /** [[ngramOverlapPairs]] behind a BLOOM-FILTER pre-screen on the
    * corpus side — same output, bit-for-bit, radically less shuffle at
    * corpus scale. The benchmark's distinct shingle hashes fold into
    * one bloom filter (a distributed aggregate over the SMALL side;
    * the driver holds only the filter bytes — ~1.2 MB at fpp 0.01 per
    * million benchmark shingles, the d11 asymmetry in sketch form),
    * and the corpus shingles pass a codegen'd `might_contain` BEFORE
    * the overlap join. Correctness is exact, not approximate:
    *   - a bloom filter has NO false negatives, so every shingle with
    *     a true benchmark occurrence reaches the join;
    *   - false positives (≈ `fpp` of the corpus) just ride along and
    *     find no bench partner — the exact join drops them;
    *   - the bloom tests a shingle's hash, so all occurrences of a
    *     shingle pass or fail together — the `maxShingleDocFreq`
    *     accounting over survivors is unchanged (pruned shingles have
    *     no bench occurrence, hence produced no pairs and no relevant
    *     guard state).
    * At 100 TB this turns the decontamination shuffle from "every
    * corpus shingle" into "benchmark-hitting shingles + fpp·corpus" —
    * the filter does its work inside the scan stage, before any
    * exchange.
    */
  def ngramOverlapPairsBloom(corpusShingles: DataFrame, benchShingles: DataFrame,
      minCommon: Long = 1L, maxShingleDocFreq: Int = Int.MaxValue,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.{GraftExpressionBridge => Bridge}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val benchHashes = benchShingles
      .select(xxhash64(col("shingle")).as("__h")).distinct()
    // expected-items count: one cheap job on the small side (metadata-
    // bounded next to the corpus pass the bloom then saves)
    val n = math.max(1L, benchHashes.count())
    val bf = benchHashes.stat.bloomFilter("__h", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bos.toByteArray)),
      Bridge.expression(xxhash64(col("shingle")))))
    ngramOverlapPairs(corpusShingles.filter(mightContain), benchShingles,
      minCommon, maxShingleDocFreq)
  }

  /** One-call train/test DECONTAMINATION: drop from `corpus` every
    * document sharing at least `minCommon` distinct n-gram shingles
    * with the benchmark set — the composed form of
    * [[ngramOverlapPairs]] (or its bloom-prescreened variant; the
    * round-9 one-call-API discipline: the scale path reachable without
    * hand-wiring). Returns the surviving corpus rows, schema unchanged.
    *
    * Scale shape: the pair stage is the d11/d19 asymmetric join (cost
    * anchored to the benchmark side; `bloomPrescreen` additionally
    * kills the non-overlapping corpus shingles inside the scan stage —
    * measured 98.75% of the shuffle at the x10 curve point); the drop
    * list is bounded by true overlaps, hence broadcast for the final
    * anti-join.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, id: Column,
      text: Column, minCommon: Long = 10L, n: Int = 3,
      maxShingleDocFreq: Int = Int.MaxValue,
      bloomPrescreen: Boolean = true, fpp: Double = 0.01,
      broadcastDrops: Boolean = true): DataFrame = {
    val cs = shingleRows(corpus, id, text, n)
    val bs = shingleRows(bench, id, text, n)
    val hits =
      if (bloomPrescreen)
        ngramOverlapPairsBloom(cs, bs, minCommon, maxShingleDocFreq, fpp)
      else ngramOverlapPairs(cs, bs, minCommon, maxShingleDocFreq)
    val drops = hits.select(col("doc_id").as("__drop_id")).distinct()
    // drop list ≤ true overlaps — broadcastable in the normal case, but
    // a heavily contaminated corpus breaks the bound: pass
    // broadcastDrops = false there for a shuffled anti-join instead
    val dropSide = if (broadcastDrops) broadcast(drops) else drops
    corpus.join(dropSide, id === col("__drop_id"), "left_anti")
  }

  /** Persist the BENCHMARK side of decontamination as a reusable
    * artifact: `path/hashes` — the hashed shingle index (bench_id, h)
    * as parquet — plus `path/bloom` — the serialized bloom filter over
    * the distinct hashes. Benchmarks are static while the corpus grows
    * daily, so shingling and hashing them ONCE and reading the artifact
    * per increment run (kilobytes of filter + a benchmark-sized
    * parquet) replaces a full benchmark re-shingle on every run — the
    * index-as-artifact discipline (e12) applied to decontamination.
    * The bloom is built FROM the written hashes, so filter and index
    * can never drift.
    */
  def writeBenchIndex(bench: DataFrame, id: Column, text: Column,
      path: String, n: Int = 3, fpp: Double = 0.01): Unit = {
    shingleRows(bench, id, text, n)
      .select(col("doc_id").as("bench_id"), xxhash64(col("shingle")).as("h"))
      .write.mode("overwrite").parquet(s"$path/hashes")
    val spark = bench.sparkSession
    val distinctH = spark.read.parquet(s"$path/hashes")
      .select(col("h")).distinct()
    val nH = math.max(1L, distinctH.count())
    val bf = distinctH.stat.bloomFilter("h", nH, fpp)
    val p = new org.apache.hadoop.fs.Path(s"$path/bloom")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try bf.writeTo(os) finally os.close()
  }

  /** [[decontaminate]] against a [[writeBenchIndex]] artifact — the
    * daily-increment shape: the corpus increment is shingled live, the
    * benchmark side comes entirely from the artifact. The bloom
    * pre-screen (codegen'd `might_contain` inside the corpus scan
    * stage) and the exact overlap join have the d19 semantics
    * unchanged: no false negatives, false positives die in the join —
    * so the result is bit-identical to the live [[decontaminate]] path
    * (d28 vs d22, hash-gated against one oracle).
    *
    * Note the live path's `maxShingleDocFreq` guard counts document
    * frequency across corpus+bench TOGETHER and therefore cannot be
    * precomputed benchmark-side; this path is the guard-off (default)
    * semantics. Schema out: surviving corpus rows, unchanged.
    */
  def decontaminateWithIndex(corpus: DataFrame, indexPath: String,
      id: Column, text: Column, minCommon: Long = 10L, n: Int = 3,
      broadcastDrops: Boolean = true): DataFrame = {
    import org.apache.spark.sql.{GraftExpressionBridge => Bridge}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val spark = corpus.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/bloom")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val is = fs.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var r = is.read(buf)
      while (r >= 0) { bos.write(buf, 0, r); r = is.read(buf) }
      bos.toByteArray
    } finally is.close()
    val mightContain = Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bytes)),
      Bridge.expression(xxhash64(col("shingle")))))
    val cs = shingleRows(corpus, id, text, n).filter(mightContain)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val drops = cs.join(spark.read.parquet(s"$indexPath/hashes"), Seq("h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .select(col("doc_id").as("__drop_id")).distinct()
    val dropSide = if (broadcastDrops) broadcast(drops) else drops
    corpus.join(dropSide, id === col("__drop_id"), "left_anti")
  }

  /** Per-benchmark contamination AUDIT ([[decontaminate]]'s reporting
    * twin): instead of silently dropping contaminated training docs,
    * answer the question an eval-integrity review actually asks —
    * WHICH benchmark leaked, how many training docs it touches, how
    * many of its own items are compromised, and how big the worst
    * overlap is. One row per benchmark set: (eval_set, n_contaminated
    * [distinct corpus docs hit], n_bench_hit [distinct benchmark items
    * hit], n_pairs, max_common).
    *
    * Same inverted-index overlap join as d11 (the benchmark set label
    * rides inside the composite bench id through [[ngramOverlapPairs]]
    * — no extra join), then one partial-aggregatable rollup over the
    * bounded pair set. The d11 asymmetry applies unchanged: cost
    * tracks benchmark size × shingle doc-frequency, never the corpus
    * squared.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      id: Column, text: Column, benchId: Column, benchSet: Column,
      minCommon: Long = 10L, n: Int = 3,
      maxShingleDocFreq: Int = Int.MaxValue): DataFrame = {
    // both sides carry the same composite id shape — the overlap
    // join's internal union requires identical doc_id types
    val cs = shingleRows(corpus,
      struct(lit("__corpus").as("set"), id.as("bid")), text, n)
    val bs = shingleRows(bench,
      struct(benchSet.cast(org.apache.spark.sql.types.StringType).as("set"),
        benchId.as("bid")), text, n)
    ngramOverlapPairs(cs, bs, minCommon, maxShingleDocFreq)
      .groupBy(col("bench_id.set").as("eval_set"))
      .agg(count_distinct(col("doc_id.bid")).as("n_contaminated"),
        count_distinct(col("bench_id.bid")).as("n_bench_hit"),
        count(lit(1)).as("n_pairs"),
        max(col("common")).as("max_common"))
  }

  /** Cross-corpus exact Jaccard: every (new, existing) document pair
    * sharing ≥ 1 shingle, scored `common / (|A|+|B|−common)` over the
    * two inverted indexes — [[ngramOverlapPairs]]'s asymmetric join
    * shape with [[jaccardPairs]]'s verdict. With the hot-shingle cap
    * on, sides are tagged BEFORE the cap (a boilerplate shingle is
    * boilerplate whichever side it appears on) and keep separate
    * per-doc counts, so ids may collide across snapshots without
    * mixing sides. With the cap OFF (the default) no cross-side
    * doc-freq exists to compute, so each side is hashed independently
    * — the union/tag/filter formulation would make every one of the
    * four consumers (two join sides, two count aggregates) re-evaluate
    * BOTH inputs' shingle projections, i.e. the CORPUS side four times
    * per run (measured ~25% of d15 at sf0.1); the split formulation
    * evaluates each side only for its own two consumers. Returns
    * (doc_id, old_id, jaccard), `doc_id` from the NEW side.
    */
  def crossJaccardPairs(newShingles: DataFrame, oldShingles: DataFrame,
      threshold: Double, maxShingleDocFreq: Int = Int.MaxValue): DataFrame = {
    val (a, b) =
      if (maxShingleDocFreq == Int.MaxValue) (
        newShingles.select(col("doc_id"), xxhash64(col("shingle")).as("h")),
        oldShingles.select(col("doc_id").as("old_id"),
          xxhash64(col("shingle")).as("h")))
      else {
        val tagged = newShingles.withColumn("__side", lit(0))
          .unionByName(oldShingles.withColumn("__side", lit(1)))
        val hs = hashedShingles(tagged.select(
          struct(col("__side"), col("doc_id")).as("doc_id"), col("shingle")),
          maxShingleDocFreq)
        (hs.filter(col("doc_id.__side") === 0)
          .select(col("doc_id.doc_id").as("doc_id"), col("h")),
          hs.filter(col("doc_id.__side") === 1)
            .select(col("doc_id.doc_id").as("old_id"), col("h")))
      }
    val cA = a.groupBy(col("doc_id")).agg(count(lit(1)).as("__na"))
    val cB = b.groupBy(col("old_id")).agg(count(lit(1)).as("__nb"))
    a.join(b, Seq("h"))
      .groupBy(col("doc_id"), col("old_id"))
      .agg(count(lit(1)).as("common"))
      .join(cA, Seq("doc_id")).join(cB, Seq("old_id"))
      .select(col("doc_id"), col("old_id"),
        (col("common").cast(DoubleType) /
          (col("__na") + col("__nb") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental near-dedup for snapshot ingestion: drop from `newDf`
    * every document that near-duplicates the EXISTING corpus
    * ([[crossJaccardPairs]]), then keep-one within the remaining batch
    * ([[dedupNear]]). Returns the surviving `newDf` rows — the set safe
    * to append to the corpus.
    *
    * Scale shape: the cross-side stage is the inverted-index join of
    * the new batch's shingles against the existing index, so its cost
    * tracks the increment times per-shingle doc frequency — never
    * corpus × corpus (the d11 decontamination asymmetry; at 100 TB the
    * daily batch is orders of magnitude smaller than the accumulated
    * corpus, and the measured d11 curve shows probe work anchored to
    * the small side). The within-batch stage is d12 on the increment
    * alone. The drop list is bounded by the batch, hence broadcast.
    */
  def dedupIncremental(newDf: DataFrame, existing: DataFrame,
      id: Column, text: Column, threshold: Double = 0.8, n: Int = 3,
      maxShingleDocFreq: Int = Int.MaxValue,
      keepBy: Option[Column] = None,
      strategy: PairStrategy = Auto(),
      materialize: Boolean = true): DataFrame = {
    // the BATCH shingle index is read by both stages and by multiple
    // consumers within each (join sides + count aggregates), and its
    // producer is a zero-shuffle projection with no exchange to reuse —
    // so materialize it once (winnowPairs precedent; measured ~15% on
    // the d15 shape). Bounded by the INCREMENT, never the corpus: the
    // existing-corpus shingles are deliberately NOT checkpointed —
    // recompute beats materializing a corpus-sized frame at 100 TB
    // (persist the corpus index yourself and pass materialize = false
    // if you already maintain one).
    val newSh0 = shingleRows(newDf, id, text, n)
    val newSh = if (materialize) Materialize(newSh0) else newSh0
    // the drop list is BOUNDED BY THE BATCH and read by multiple
    // actions: both anti-join sides of the final plan share one
    // broadcast, but under the Auto strategy the stage-2 resolver also
    // runs a count() ACTION over stage1 — a separate action rebuilds
    // the whole cross-corpus chain just to size the batch
    // (optimization r19, guide §5: materialize what separate actions
    // re-derive). One checkpoint of the tiny id list caps the
    // cross-Jaccard chain at exactly one evaluation.
    val dupOfOld0 = crossJaccardPairs(
        newSh, shingleRows(existing, id, text, n),
        threshold, maxShingleDocFreq)
      .select(col("doc_id").as("__drop_id")).distinct()
    val dupOfOld = if (materialize) Materialize(dupOfOld0) else dupOfOld0
    val stage1 = newDf.join(broadcast(dupOfOld),
      id === col("__drop_id"), "left_anti")
    // stage-2 shingles = the batch index already built for stage 1,
    // minus the dropped docs — the same broadcast anti-join, reusing
    // the distinct-exchange instead of re-splitting/re-exploding the
    // batch (shingles are per-doc, so filtering rows ≡ re-deriving)
    val stage1Sh = newSh.join(broadcast(dupOfOld),
      col("doc_id") === col("__drop_id"), "left_anti")
    // stage1Sh derives from the already-materialized batch index via a
    // cheap broadcast anti-join — no second checkpoint needed
    dedupNearFromShingles(stage1, stage1Sh, id, threshold, keepBy,
      strategy = strategy, materialize = false)
  }

  /** Exact Jaccard for an explicit (small) candidate pair set — the
    * verification stage after LSH. With `broadcastPairs = true`
    * (default) the pair list is broadcast against the shingle index
    * twice, so cost is O(|pairs|·avg-shingles), never the full pairwise
    * join. Set `broadcastPairs = false` when the candidate list itself
    * outgrows the broadcast budget (a duplicate-heavy corpus at full
    * scale) — the joins then shuffle on the id keys; correctness is
    * identical.
    */
  def jaccardForPairs(shingles: DataFrame, pairs: DataFrame,
      threshold: Double, broadcastPairs: Boolean = true): DataFrame = {
    val hs = shingles.select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val counts = hs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val p0 = pairs.select(col("id_a"), col("id_b"))
    val pairSide = if (broadcastPairs) broadcast(p0) else p0
    val common = pairSide
      .join(hs.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(hs.as("sb"),
        col("id_b") === col("sb.doc_id") && col("sa.h") === col("sb.h"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    jaccardFromCommon(common, counts, threshold)
  }

  private def jaccardFromCommon(common: DataFrame, counts: DataFrame,
      threshold: Double): DataFrame =
    common
      .join(counts.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("id_b") === col("cb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast(DoubleType) /
          (col("ca.n") + col("cb.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** SimHash near-dup pairs within `maxHamming`, scale-shaped via
    * pigeonhole banding: split the `bits`-wide signature into
    * `maxHamming + 1` contiguous bit bands — a pair within hamming
    * distance `maxHamming` has differing bits in at most `maxHamming`
    * bands, so it agrees EXACTLY on at least one band. A self-join on
    * (band, band-chunk) therefore yields a complete candidate set
    * (zero false negatives) with no cartesian product; exact
    * `bit_count(xor)` verification on candidates removes the false
    * positives. Result is identical to the all-pairs scan, but the
    * plan is a hash self-join + filter — the shape that survives 100 TB
    * (with 64-bit signatures the per-band chunks are 16 bits wide and
    * the buckets are sharply selective; the 16-bit gate configuration
    * keeps the oracle readable).
    */
  /** The at-scale `bits` setting for [[simhash]]/[[simhashPairs]].
    *
    * Pigeonhole banding needs maxHamming+1 bands; candidate work per
    * band is Θ(n²/2^width) with width = bits/(maxHamming+1), so — like
    * `Similarity.autoPlanes`, and measured the same way in SCALE.md —
    * keeping bucket occupancy at `targetOccupancy` needs the chunk
    * width to grow ≈ log₂(n/targetOccupancy) with the corpus. Returns
    * the matching total signature width, clamped to the library's
    * 56-bit signature ceiling (width is capped at 56/(maxHamming+1));
    * past the cap, reduce maxHamming per pass or pre-partition the
    * corpus.
    */
  def autoSimhashBits(corpusSize: Long, maxHamming: Int = 3,
      targetOccupancy: Int = 32): Int = {
    require(corpusSize > 0 && targetOccupancy > 0)
    // 13 is the largest maxHamming where the 56-bit signature ceiling
    // still permits the documented 4-bit band floor (56/14 = 4); past it
    // the formula would silently emit sub-floor or zero-width bands —
    // reduce maxHamming per pass or pre-partition the corpus instead
    require(maxHamming >= 0 && maxHamming <= 13,
      s"autoSimhashBits: maxHamming must be in [0, 13] (got $maxHamming); " +
        "wider budgets cannot fit >= 4-bit bands under the 56-bit ceiling")
    val bands = maxHamming + 1
    val width = math.ceil(
      math.log(corpusSize.toDouble / targetOccupancy) / math.log(2)).toInt
    bands * math.min(56 / bands, math.max(4, width))
  }

  /** [[simhash]] + [[simhashPairs]] with the signature width sized to
    * the corpus by [[autoSimhashBits]] — the at-scale default, so the
    * sizing rule is applied, not just documented. Pass `corpusSize`
    * when the count is already known; otherwise one count job runs
    * first (a metadata-only scan against columnar sources — cheap next
    * to the banded self-join it sizes).
    */
  def simhashPairsAuto(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3, corpusSize: Long = 0L,
      targetOccupancy: Int = 32): DataFrame = {
    val n = if (corpusSize > 0) corpusSize else df.count()
    val bits = autoSimhashBits(n, maxHamming, targetOccupancy)
    simhashPairs(simhash(df, id, text, bits), bits, maxHamming)
  }

  def simhashPairs(sigs: DataFrame, bits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    // even-as-possible contiguous bit ranges: band b covers [lo, hi)
    val bounds = (0 to bands).map(b => b * bits / bands)
    // Scala's << is mod 64, so a full-width band (bits=64, maxHamming=0)
    // would compute mask 0 and collapse every signature into one bucket
    def maskFor(width: Int): Long =
      if (width >= 64) -1L else (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      val lo = bounds(b)
      val width = bounds(b + 1) - lo
      struct(lit(b).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(maskFor(width))).as("chunk"))
    }
    // EXPANDING self-join: the bucket frame is a few bytes per row but
    // the join emits Θ(Σ_bucket n_c²) candidate pairs, so AQE's
    // byte-sized coalescing (LocalSession, optimization r19) would
    // collapse the post-shuffle stage to one near-empty-input partition
    // and run the quadratic verify single-threaded (measured: d07's
    // join stage 4.1 s serial). An explicit count on the repartition
    // pins the exchange (user-specified counts are AQE-exempt) at the
    // session's configured shuffle width — scale-parameterized, not a
    // local constant — and both join sides reuse the ONE exchange.
    val buckets = sigs
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.chunk").as("chunk"))
      .repartition(
        sigs.sparkSession.sessionState.conf.numShufflePartitions,
        col("band"), col("chunk"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    // first-matching-band dedup: a pair sharing several bands is emitted
    // only at its lowest shared band — a codegen'd filter over the
    // signatures already on the row, replacing a dropDuplicates SHUFFLE
    // of the (large) candidate set with zero data movement.
    // CASE WHEN chain, not an OR of `(band = i AND …)` arms: the OR form
    // lets the optimizer extract a vacuous `band IN (…)` filter into ONE
    // side of the self-join, making the sides structurally different and
    // defeating exchange reuse (the signature aggregate + explode would
    // run twice).
    def chunkOf(sig: org.apache.spark.sql.Column, band: Int) = {
      val lo = bounds(band)
      shiftright(sig, lo).bitwiseAND(lit(maskFor(bounds(band + 1) - lo)))
    }
    val firstMatch = (0 until bands).foldRight(lit(false)) { (bnd, elseBranch) =>
      val earlierAllDiffer = (0 until bnd)
        .map(earlier => !(chunkOf(col("a.simhash"), earlier) ===
          chunkOf(col("b.simhash"), earlier)))
        .foldLeft(lit(true))(_ && _)
      when(col("a.band") === bnd, earlierAllDiffer).otherwise(elseBranch)
    }
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk")
          && col("a.doc_id") < col("b.doc_id"))
      .filter(firstMatch)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Duplicate clusters from a near-dup pair list: connected components
    * over the undirected pair graph, each node labeled with the minimum
    * doc id reachable from it (the cluster's canonical representative —
    * the id exact dedup would keep). Returns (doc_id, cluster_id) for
    * every doc that appears in at least one pair.
    *
    * Min-label propagation: each round joins current labels across the
    * edge list and takes the elementwise minimum, converging in
    * O(component diameter) rounds — near-dup clusters are tight, so a
    * handful. Per round: one shuffle join + one aggregate; lineage is
    * truncated each round via [[Materialize]] (executor-local blocks by
    * default; set a checkpoint dir for the fault-tolerant reliable
    * flavor — see there for the trade-off). This is
    * the simple member of the MapReduce-CC family; the fixpoint test is
    * one count per round. For graphs whose component diameter exceeds a
    * sensible maxIters (long chains — NOT the tight near-dup clusters
    * this gates), use [[connectedComponentsStar]], which converges in
    * O(log n) alternation rounds regardless of diameter.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val sym = pairs
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
    val symM = Materialize(sym)
    var labels = Materialize(
      symM.select(col("a").as("id")).distinct()
        .withColumn("label", col("id")))
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val neighborMin = symM
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("label")).as("nmin"))
      // the fixpoint test rides the round's own projection: old and
      // new label are both in scope here, so a __chg flag on the
      // materialized frame replaces the next⋈labels shuffle join the
      // old test ran per round (optimization r19, guide §1.2) — the
      // count over the just-materialized blocks is a narrow job
      val next = Materialize(labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("__chg")))
      val changed = next.filter(col("__chg")).count()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0
      it += 1
    }
    // no silent caps: an unconverged label set is NOT a component
    // labeling — fail loudly rather than return plausible-looking
    // partial clusters (raise maxIters for graphs of larger diameter)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds " +
        "(component diameter exceeds maxIters); raise maxIters or use " +
        "connectedComponentsStar (diameter-independent)")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Connected components via alternating large-star / small-star — the
    * high-diameter fallback for [[connectedComponents]], after Kiveris
    * et al., "Connected Components in MapReduce and Beyond" (SoCC'14).
    * Where min-label propagation needs O(component diameter) rounds (a
    * 10k-node chain = 10k rounds), the alternation contracts the graph
    * toward per-component stars in O(log n) rounds regardless of shape:
    *
    *   - large-star: every node's strictly-larger neighbors re-attach to
    *     the minimum of its closed neighborhood (min(Γ(u) ∪ u));
    *   - small-star: every node and its smaller neighbors attach to that
    *     minimum.
    *
    * Each operation is one shuffle (groupBy-min + re-join); at the
    * fixpoint the edge set IS the answer — stars whose centers are the
    * component minima. Same output contract as [[connectedComponents]]:
    * (doc_id, cluster_id = min reachable id) for every node appearing in
    * at least one pair, converge-or-throw, per-round lineage truncation
    * via [[Materialize]].
    */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    // canonical undirected edges, larger endpoint first
    var edges = Materialize(pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var edgeCount = edges.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // large-star over the symmetrized neighborhood
      val sym = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      val large = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star: large's output is already canonical (u > v)
      val smins = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val small = Materialize(large.join(smins, Seq("u"))
        .select(col("v").as("n"), col("m"))
        .unionByName(smins.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct())
      // convergence test, cheapest-first (optimization r19, guide
      // §1.2): both edge sets are DISTINCT, so unequal cardinality
      // already proves A ≠ B with one narrow count over the
      // just-materialized blocks (the previous round's count is
      // carried over, so this is one count job per round) — the
      // contraction shrinks the edge set almost every round, so the
      // exact |AΔB| shuffle job (one signed union → groupBy,
      // optimization r18) only runs for the final same-size rounds
      // where it is the proof of fixpoint.
      val smallCount = small.count()
      val changed =
        if (smallCount != edgeCount) 1L
        else small.withColumn("__side", lit(1))
          .unionByName(edges.withColumn("__side", lit(-1)))
          .groupBy(col("u"), col("v"))
          .agg(sum(col("__side")).as("__d"))
          .filter(col("__d") =!= 0)
          .count()
      edges = small
      edgeCount = smallCount
      converged = changed == 0
      it += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxIters rounds")
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(edges.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .distinct()
  }

  /** End-to-end near-dedup: the one step a pipeline user otherwise
    * wires by hand from the d03/d08 pieces (the reference's own dedup
    * analogue — distinct-fsheet elimination, query_iterator.py:88-99 —
    * is likewise a keep-one semantic). Composition:
    *
    *   shingles → exact-Jaccard pairs ≥ threshold → connected
    *   components → keep ONE deterministic representative per cluster →
    *   return the surviving input ROWS (schema unchanged).
    *
    * Keep policy: min id by default; pass `keepBy` to keep the
    * highest-scoring member instead (e.g. `qualityScore(text)`), ties
    * broken by min id so the result is deterministic either way.
    *
    * Scale shape: all heavy lifting is the existing pair/CC stages.
    * The final keep step only touches CLUSTER MEMBERS (nodes with at
    * least one near-dup edge — a small fraction of any real corpus,
    * and already materialized by CC), so:
    *   - min-id policy: zero new wide stages — the drop list is a
    *     filter of the CC output, applied to `df` as a broadcast
    *     anti-join;
    *   - keepBy policy: one extra window over the member set (tiny vs
    *     the corpus), then the same broadcast anti-join.
    * If the drop list itself outgrows broadcast (a pathologically
    * duplicate-heavy corpus), pass `broadcastDrops = false` for a
    * shuffled anti-join instead — correctness is identical.
    */
  def dedupNear(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.8, n: Int = 3,
      keepBy: Option[Column] = None,
      broadcastDrops: Boolean = true,
      maxIters: Int = 20,
      strategy: PairStrategy = Auto(),
      materialize: Boolean = true): DataFrame =
    dedupNearFromShingles(df, shingleRows(df, id, text, n), id, threshold,
      keepBy, broadcastDrops, maxIters, strategy, materialize)

  /** [[dedupNear]] over a PRECOMPUTED shingle index — the composition
    * seam [[dedupIncremental]] uses to reuse the batch's shingles
    * across both of its stages instead of re-exploding the documents.
    * `shingles` must be [[shingleRows]]-shaped output covering exactly
    * `df`'s rows (shingles are per-document, so filtering index rows
    * is equivalent to re-deriving the index from filtered documents).
    */
  def dedupNearFromShingles(df: DataFrame, shingles: DataFrame, id: Column,
      threshold: Double = 0.8,
      keepBy: Option[Column] = None,
      broadcastDrops: Boolean = true,
      maxIters: Int = 20,
      strategy: PairStrategy = Auto(),
      materialize: Boolean = true): DataFrame = {
    // every strategy reads the shingle frame several times (signature +
    // verify stages, or both self-join sides + counts) and its producer
    // is a zero-shuffle projection with nothing for Spark to reuse —
    // materialize it once (the winnowPairs seam; measured 12-20% across
    // the Exact and LSH paths at sf0.1). Pass materialize = false when
    // the caller already persists the index (dedupIncremental does).
    val sh = if (materialize) Materialize(shingles) else shingles
    val resolved = resolveStrategy(strategy, threshold, df.count())
    // sh is already materialized above — the pair stage must not
    // checkpoint it a second time (double the block-manager garbage
    // for zero reuse gain)
    val pairs = nearDupPairs(sh, threshold, resolved, materialize = false)
    val cc = connectedComponents(pairs, maxIters)
    // broadcastDrops also governs the keepBy member/label join below:
    // the CC label set has one row per clustered doc — unbounded on a
    // duplicate-heavy corpus — so the same flag that shuffles the drop
    // anti-join must shuffle this join too (no unconditional broadcast
    // on a corpus-sized frame).
    val drops = keepBy match {
      case None =>
        // min-id representative: CC labels ARE min reachable id, so the
        // drop list is exactly the non-representative members
        cc.filter(col("doc_id") =!= col("cluster_id"))
          .select(col("doc_id").as("__drop_id"))
      case Some(score) =>
        val ccSide = if (broadcastDrops) broadcast(cc) else cc
        val members = df.select(id.as("__m_id"), score.as("__m_score"))
          .join(ccSide, col("__m_id") === col("doc_id"))
        val w = Window.partitionBy(col("cluster_id"))
          .orderBy(col("__m_score").desc, col("__m_id"))
        members.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") > 1)
          .select(col("__m_id").as("__drop_id"))
    }
    val dropSide = if (broadcastDrops) broadcast(drops) else drops
    df.join(dropSide, id === col("__drop_id"), "left_anti")
  }

  /** Cross-document LINE dedup — the CCNet/RefinedWeb-style boilerplate
    * removal that operates BELOW document granularity: each distinct
    * line (or paragraph/segment — any `sep`-delimited unit) survives
    * only at its FIRST corpus occurrence (min (doc_id, position));
    * every later occurrence, in the same document or any other, is
    * removed. Whole-document dedup ships two documents that share a
    * navigation header verbatim; line dedup strips the header from the
    * second one. Returns (doc_id, text) — one row per input row, text
    * reassembled from the surviving lines in original order (empty
    * string when nothing survives).
    *
    * `maxLineDocFreq` additionally drops EVERY occurrence of lines
    * present in more than that many documents (true boilerplate —
    * cookie banners, license footers — where even the first occurrence
    * is noise). Accounting mirror: [[hotLines]].
    *
    * Scale shape (100 TB-ready):
    *   - one partial-aggregatable shuffle per aggregate — (line-hash,
    *     doc) → min position, then line-hash → (first occurrence, doc
    *     freq). Map-side combine collapses boilerplate BEFORE the
    *     shuffle, so a line in 10⁹ docs ships one row per map task,
    *     not 10⁹ rows (the skew-safety argument for aggregating
    *     instead of a row_number window over the hash, whose sort
    *     would concentrate the hot line in one partition);
    *   - the keeper join is on the line hash with exactly one keeper
    *     row per hash — a hash join with no fan-out (AQE skew-join
    *     splits the hot-hash partitions);
    *   - reassembly is one aggregate on doc_id (input-bounded);
    *   - lines join/shuffle as xxhash64 longs, never the line text
    *     (same collision argument as [[jaccardPairs]]).
    */
  def dedupLines(df: DataFrame, id: Column, text: Column,
      sep: String = "\n", maxLineDocFreq: Int = Int.MaxValue): DataFrame = {
    val lines = df.select(id.as("doc_id"), text.as("__text"))
      .select(col("doc_id"),
        posexplode(split(col("__text"),
          java.util.regex.Pattern.quote(sep))).as(Seq("idx", "line")))
      .withColumn("h", xxhash64(col("line")))
    val perDoc = lines.groupBy(col("h"), col("doc_id"))
      .agg(min(col("idx")).as("__midx"))
    val keepers = perDoc.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("__midx"))).as("k"),
        count(lit(1)).as("__docf"))
      .filter(col("__docf") <= maxLineDocFreq)
      .select(col("h"), col("k.doc_id").as("__k_doc"),
        col("k.__midx").as("__k_idx"))
    val kept = lines.join(keepers, Seq("h"))
      .filter(col("doc_id") === col("__k_doc") && col("idx") === col("__k_idx"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          s => s("line"))).as("__kept"))
    df.select(id.as("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__kept"), lit("")).as("text"))
  }

  /** Accounting for [[dedupLines]]'s `maxLineDocFreq` guard: (line,
    * doc_freq) for every line the cap drops entirely — persist or log
    * next to the dedup output so a capped run reports what it removed.
    */
  def hotLines(df: DataFrame, id: Column, text: Column,
      sep: String = "\n", maxLineDocFreq: Int = Int.MaxValue): DataFrame =
    df.select(id.as("doc_id"), text.as("__text"))
      .select(col("doc_id"),
        explode(split(col("__text"),
          java.util.regex.Pattern.quote(sep))).as("line"))
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") > maxLineDocFreq)

  /** SimHash: `bits`-wide signature; bit j is the sign of the sum of
    * ±1 votes from each distinct word's portable hash bit j. Near-dups
    * land within small hamming distance (`bit_count(xor)`).
    *
    * Computed by the fused native
    * [[graft.functions.expressions.SimHashSignature]] expression as a
    * ZERO-SHUFFLE projection: SimHash is a per-document function, but
    * the relational formulation (explode → distinct → groupBy vote
    * sums — what the d05/d07/d20 oracles still mirror, bit-identically)
    * paid two wide exchanges of the (doc, word) stream to compute it.
    * In-row there is no explode, no distinct, no aggregation — the
    * signature stage is embarrassingly parallel at any corpus size.
    * Wordless documents produce no signature row (same as the
    * relational form, where they produced no word rows).
    */
  def simhash(df: DataFrame, id: Column, text: Column, bits: Int = 16): DataFrame =
    df.select(id.as("doc_id"),
        expressions.SimHashSignature(TextFunctions.words(text), bits)
          .as("simhash"))
      .filter(col("simhash").isNotNull)

  /** MOSS-style near-copy pairs over shared WINNOWING fingerprints
    * (Schleimer et al., SIGMOD 2003 §5): every (id_a, id_b) sharing at
    * least `minShared` fingerprints, with the shared count. Winnowing
    * guarantees a fingerprint in every w-gram stretch, so any copied
    * run of ≥ k + w − 1 characters yields shared fingerprints — this
    * catches LOCAL verbatim copying (a paragraph lifted into an
    * otherwise-different document) that whole-document Jaccard/SimHash
    * dilute below threshold. Same inverted-index join shape and scale
    * profile as [[jaccardPairs]]; `maxFpDocFreq` is the stop-gram
    * guard (a fingerprint in df documents contributes df·(df−1)/2
    * joined rows — boilerplate must be capped at corpus scale), as a
    * broadcast anti-join of the tiny hot set.
    *
    * `fingerprints` is (doc_id, fp) — the exploded
    * [[TextFunctions.winnowFromGrams]] output (distinct per doc by
    * construction). Returns (id_a, id_b, shared).
    *
    * `materialize` (default true) materializes (via [[Materialize]]) the fingerprint
    * frame first: the composition reads it three times (doc-freq
    * guard, both self-join sides) and the typical producer — a
    * zero-shuffle [[TextFunctions.gramHashes]] projection — has no
    * exchange for Spark to reuse, so without materialization the
    * per-character hashing re-runs per consumer (measured 2.7× on the
    * d13 shape). The checkpoint is ~the corpus's fingerprint fraction
    * (≈ 2/(w+1) of grams); on a cluster prefer an explicit
    * `persist`/`checkpoint` of the input and pass `materialize =
    * false` if recompute is genuinely cheaper than storage.
    */
  def winnowPairs(fingerprints: DataFrame, minShared: Long = 2L,
      maxFpDocFreq: Int = Int.MaxValue,
      materialize: Boolean = true): DataFrame = {
    val fpIn = fingerprints.select(col("doc_id"), col("fp"))
    val fp0 = if (materialize) Materialize(fpIn) else fpIn
    val fps =
      if (maxFpDocFreq == Int.MaxValue) fp0
      else fp0.join(
        broadcast(fp0.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxFpDocFreq).select(col("fp"))),
        Seq("fp"), "left_anti")
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Exact-SUBSTRING dedup (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499 §4.1, adapted from
    * token suffix arrays to word windows): every k-word window that
    * occurs more than once in the corpus — in another document or
    * repeated within the same one — keeps only its FIRST occurrence
    * (min (doc_id, position)); the word span of every later occurrence
    * is removed from its document. This is the remedy for verbatim
    * passage reuse (quotes, templated paragraphs, syndicated intros)
    * that document-level dedup never fires on and line dedup misses
    * when the copied run doesn't align with line boundaries. Returns
    * (doc_id, text) — one row per input row, text reassembled from the
    * surviving words in original order ('' when nothing survives;
    * documents shorter than k words pass through with their words
    * space-rejoined).
    *
    * The suffix-array formulation is inherently single-machine; the
    * window-hash formulation is the same guarantee — any duplicated
    * run of ≥ k words contains a duplicated k-window — re-expressed as
    * relational algebra Spark can distribute:
    *   - window hashes are a zero-shuffle per-row projection (the
    *     [[TextFunctions.gramHashes]] shape over words, not chars);
    *     occurrences ship as (hash, doc, pos) — 20 bytes per corpus
    *     word, never the window text;
    *   - duplicate detection is ONE partial-aggregatable shuffle on
    *     the hash (min(struct(doc,pos)) + count): a boilerplate window
    *     in 10⁹ documents collapses map-side to one row per map task;
    *   - marking later occurrences is a hash equi-join of the
    *     occurrence stream with the duplicated-window set (AQE splits
    *     the hot hashes); span coverage explodes ONLY marked windows
    *     (k rows each, bounded by duplicated volume, deduped per
    *     word by `distinct` before the anti-join);
    *   - reassembly is one input-bounded aggregate per document.
    * No stage sorts the corpus and no stage is quadratic in anything
    * but true duplication volume.
    */
  def removeRepeatedSpans(df: DataFrame, id: Column, text: Column,
      k: Int = 8, materialize: Boolean = true): DataFrame = {
    require(k >= 1, "removeRepeatedSpans: need k >= 1 (window width)")
    val words = spanWords(df, id, text)
    rebuildKeptText(df, id, words,
      coveredSpanPositions(words, k, materialize))
  }

  /** Rebuild (doc_id, text) from `words`, keeping every position NOT
    * in `covered` — shared by the one-shot and incremental span-dedup
    * forms. One input-bounded aggregate per document; docs that lose
    * everything come back as `''` (cut, not dropped). */
  private def rebuildKeptText(df: DataFrame, id: Column, words: DataFrame,
      covered: DataFrame): DataFrame = {
    val toks = words.select(col("doc_id"),
        posexplode(col("w")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("idx"), col("tok"))
    val rebuilt = toks.join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
          s => s("tok"))).as("__kept"))
    df.select(id.as("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__kept"), lit("")).as("text"))
  }

  /** Persist the distinct window hash-pairs of an already-ingested
    * ARCHIVE — the state the incremental form of
    * [[removeRepeatedSpans]] dedups daily increments against (the
    * [[writeSpanIndex]] pattern turned on the corpus itself). The
    * width `k` rides inside the artifact (`path/hashes/_meta_k`,
    * committed by the same swap as the hashes — a mismatched k would
    * match nothing and silently skip the dedup). Ownership
    * detail is deliberately NOT stored: under the in-order-ingest
    * contract (increment ids above everything archived — what a
    * monotone ingest id gives for free), an archived occurrence is
    * always globally first, so membership alone decides the cut.
    */
  def writeCorpusSpanIndex(archive: DataFrame, id: Column, text: Column,
      path: String, k: Int = 8): Unit = {
    require(k >= 1, "writeCorpusSpanIndex: need k >= 1 (window width)")
    // a REBUILD replaces the whole window set: previously appended
    // epoch>=1 deltas must not survive it — the rebuild is the
    // documented compaction cadence, and stale deltas would re-admit
    // windows of documents the new archive no longer contains. Stage
    // the new epoch-0 write, then swap the hashes root through the
    // shard-tree swap discipline (Curation.swapStaged: aside rename →
    // checked staged rename → aside delete), so a crash at any point
    // leaves a state recoverSpanIndexSwap on every entry point can
    // finish or roll back — a bare delete-then-rename left a window
    // with NO hashes root and no recovery.
    val spark = archive.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSpanIndexSwap(spark, path)
    spanWindows(spanWords(archive, id, text), k)
      .select(col("h"), col("h2")).distinct()
      .write.mode("overwrite").parquet(s"$path/hashes_staged/epoch=0")
    // the window width k is staged INSIDE the hashes root (a
    // dot-prefix-free underscore file — invisible to partition
    // discovery) so ONE swap commits hashes and meta atomically
    // (ADVICE r16: a meta write AFTER the swap left a crash window
    // where new hashes paired with the old k, and span probes then
    // computed wrong-width k-grams and silently matched nothing)
    writeSpanIndexKFile(fs, s"$path/hashes_staged", k)
    Curation.swapStaged(spark, s"$path/hashes_staged", s"$path/hashes")
    // the pre-r17 sibling meta (now shadowed by hashes/_meta_k) must
    // not survive to be read back by the legacy fallback after a
    // LATER layout change; deleted after the swap — a crash here
    // leaves the in-root copy authoritative
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    // the rebuild also severs any previous stream binding — a stale
    // lineage marker (CorpusStream.guardStateLineage) would refuse a
    // legitimately fresh stream over the rebuilt index. Deleted LAST:
    // a crash before the swap completed keeps the marker, so the old
    // lineage's surviving epochs stay guarded.
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_stream_lineage"),
      false)
    ()
  }

  /** Finish (or roll back) a [[writeCorpusSpanIndex]] rebuild swap a
    * crash interrupted — [[Curation.recoverSwap]] on the
    * `hashes_staged` → `hashes` pair, run by every span-index entry
    * point (two metadata probes when healthy). A leftover PARTIAL
    * staged dir (crash during staging, live root intact) is inert:
    * `hashes_staged` is a sibling no read path ever lists, and the
    * next rebuild overwrites it.
    */
  private def recoverSpanIndexSwap(spark: SparkSession,
      path: String): Unit =
    Curation.recoverSwap(spark, s"$path/hashes", s"$path/hashes_staged")

  /** Write the span-index window width as a plain `_meta_k` file
    * inside a hashes root — underscore-prefixed, so partition
    * discovery over the root never sees it; plain text, so reading it
    * back is two metadata calls, not a Spark job. */
  private def writeSpanIndexKFile(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, k: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_meta_k")
    val out = fs.create(p, true)
    try out.write(
      k.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a corpus span index's window width: the in-root `_meta_k`
    * file when present (the r17 layout — committed atomically with
    * the hashes by one swap), else the legacy sibling `meta` parquet
    * (pre-r17 artifacts). */
  private[functions] def readCorpusSpanIndexK(spark: SparkSession,
      path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/hashes/_meta_k")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      } finally in.close()
    } else spark.read.parquet(s"$path/meta").head.getInt(0)
  }

  /** Grow a [[writeCorpusSpanIndex]] artifact by one increment's
    * windows — O(increment), written as its own `hashes/epoch=<e>`
    * delta (duplicate hash-pairs across epochs are harmless to the
    * semi-join membership test; rewrite the index with
    * [[writeCorpusSpanIndex]] over the full corpus on a compaction
    * cadence if the duplication ever dominates). Append the
    * increment's RAW text (pre-dedup) — batch parity needs the window
    * set of what ARRIVED, and a later duplicate of a cut span must
    * still be recognized. The explicit `epoch` is the
    * replay-idempotence hook for the streaming form: a re-delivered
    * batch OVERWRITES its own delta instead of stacking a copy; batch
    * callers omit it and get max-existing + 1.
    */
  def appendCorpusSpanIndex(increment: DataFrame, id: Column,
      text: Column, path: String, epoch: Option[Long] = None): Unit = {
    val spark = increment.sparkSession
    recoverSpanIndexSwap(spark, path)
    val k = readCorpusSpanIndexK(spark, path)
    val e = epoch.getOrElse {
      val p = new org.apache.hadoop.fs.Path(s"$path/hashes")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("epoch=")).map(_.drop(6).toLong).max + 1L
    }
    spanWindows(spanWords(increment, id, text), k)
      .select(col("h"), col("h2")).distinct()
      .write.mode("overwrite").parquet(s"$path/hashes/epoch=$e")
  }

  /** INCREMENTAL [[removeRepeatedSpans]] (d33) — the daily-increment
    * shape for exact-substring self-dedup: archived documents are
    * immutable, so only the increment is cleaned, against (a) the
    * archive's window set from the [[writeCorpusSpanIndex]] artifact
    * (an archived occurrence is globally first under the in-order
    * contract — every increment occurrence of it is cut) and (b) the
    * increment's OWN duplicate windows (keep the increment-local
    * first occurrence — the one-shot keep-first rule). Under the
    * in-order-ingest contract the result is BIT-IDENTICAL to the
    * batch [[removeRepeatedSpans]] over archive ∪ increment,
    * restricted to the increment's ids (d33 shares d23's oracle
    * algebra over the union).
    *
    * Cost tracks the INCREMENT: its window projection, one
    * membership semi-join against the artifact (shuffle by default —
    * the archive window set grows with the corpus and is NOT
    * broadcast-safe; `broadcastIndex = true` is the small-archive
    * hatch), the increment-local keep-first aggregate, and one
    * rebuild — the accumulated corpus is never re-read. Call
    * [[appendCorpusSpanIndex]] with the same increment afterwards to
    * grow the archive state.
    */
  def removeRepeatedSpansIncremental(increment: DataFrame, id: Column,
      text: Column, indexPath: String, broadcastIndex: Boolean = false,
      beforeEpoch: Option[Long] = None): DataFrame = {
    val spark = increment.sparkSession
    recoverSpanIndexSwap(spark, indexPath)
    val k = readCorpusSpanIndexK(spark, indexPath)
    val idx0 = spark.read.parquet(s"$indexPath/hashes")
    // the streaming form's replay guard: a re-delivered batch must not
    // see its OWN crashed-attempt delta as "archive" (it would cut its
    // own first occurrences); epochs at or past the batch's slot are
    // excluded
    val idx = beforeEpoch.fold(idx0)(e => idx0.filter(col("epoch") < e))
      .select(col("h"), col("h2"))
    removeRepeatedSpansAgainst(increment, id, text, idx, k, broadcastIndex)
  }

  /** The frame-based core of [[removeRepeatedSpansIncremental]]:
    * dedup `increment` against an explicit archive window set
    * (h, h2) plus its own local duplicates. */
  def removeRepeatedSpansAgainst(increment: DataFrame, id: Column,
      text: Column, archiveWindows: DataFrame, k: Int,
      broadcastIndex: Boolean = false): DataFrame = {
    require(k >= 1, "removeRepeatedSpansAgainst: need k >= 1")
    val idxSide =
      if (broadcastIndex) broadcast(archiveWindows) else archiveWindows
    val words = spanWords(increment, id, text)
    val wins = Materialize(spanWindows(words, k))
    val archiveHit = wins.join(idxSide, Seq("h", "h2"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("idx"))
    val covered = archiveHit
      .unionByName(laterOccurrencePositions(wins, k))
      .distinct()
    rebuildKeptText(increment, id, words, covered)
  }

  /** SPAN-level decontamination — the GPT-3/PaLM eval-overlap rule
    * ([[decontaminate]]'s surgical sibling): instead of DROPPING every
    * training document that shares an n-gram with the benchmark, cut
    * only the overlapping spans and keep the rest of the document. The
    * word positions covered by any corpus k-window whose text equals a
    * benchmark k-window are removed; everything else survives
    * verbatim. `k = 13` is the published contamination width; gates
    * pin a smaller k so organic cross-split overlaps exercise the
    * path.
    *
    * Plan shape, sized for a 100 TB corpus against a ~10⁶-row bench
    * set: the benchmark's distinct window hash-pairs are BROADCAST
    * (bench sets are small by definition — that asymmetry is the whole
    * design), so marking is a zero-shuffle map-side semi join over the
    * corpus window projection. Only documents that HIT a benchmark
    * window enter the rebuild aggregate — the contaminated fraction,
    * not the corpus — and untouched documents pass through without
    * being exploded and re-joined (unlike [[removeRepeatedSpans]],
    * whose duplicate test itself needs the corpus-global aggregate).
    * Windows compare by the same salted 128-bit hash pair (collision =
    * a wrongly-cut span; 64 bits would expect ~10⁶ at target scale,
    * 128 bits expects zero).
    *
    * Returns (doc_id, text); a fully-contaminated document comes back
    * as `''` (cut, not dropped — the caller's length filter will drop
    * it, keeping the accounting visible).
    */
  /** `broadcastBench = false` switches the marking join to an ordinary
    * shuffle join for bench window sets past the broadcast budget
    * (a 10⁶-item benchmark × tens of windows each is ~10⁷–10⁸ hash
    * pairs) — same rows, one extra exchange on the window hash. */
  def decontaminateSpans(corpus: DataFrame, bench: DataFrame, id: Column,
      text: Column, benchText: Column, k: Int = 13,
      broadcastBench: Boolean = true): DataFrame = {
    require(k >= 1, "decontaminateSpans: need k >= 1 (window width)")
    cutContaminatedSpans(corpus, id, text,
      spanWindows(spanWords(bench, lit(0L), benchText), k)
        .select(col("h"), col("h2")).distinct(), k, broadcastBench)
  }

  /** Persist a benchmark's span-decontamination index — the
    * [[writeBenchIndex]] pattern for [[decontaminateSpans]]:
    * benchmarks are static while the corpus grows daily, so the bench
    * side is windowed+hashed ONCE into `path/hashes` (distinct 128-bit
    * pairs) and every corpus increment decontaminates against the
    * artifact ([[decontaminateSpansWithIndex]]). The window width `k`
    * is stored IN the artifact (`path/meta`) and read back at use —
    * a caller-supplied k that disagreed with the indexed hashes would
    * match nothing and silently skip the decontamination, the failure
    * mode a contamination sweep can least afford.
    */
  def writeSpanIndex(bench: DataFrame, benchText: Column, path: String,
      k: Int = 13): Unit = {
    require(k >= 1, "writeSpanIndex: need k >= 1 (window width)")
    spanWindows(spanWords(bench, lit(0L), benchText), k)
      .select(col("h"), col("h2")).distinct()
      .write.mode("overwrite").parquet(s"$path/hashes")
    bench.sparkSession.range(1).select(lit(k).as("k"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** [[decontaminateSpans]] against a [[writeSpanIndex]] artifact —
    * the daily-increment shape: the increment is windowed live, the
    * benchmark side (hash pairs AND window width) comes entirely from
    * the artifact. Result bit-identical to the live path over the
    * same bench (d32 shares d31's oracle).
    */
  def decontaminateSpansWithIndex(corpus: DataFrame, id: Column,
      text: Column, indexPath: String,
      broadcastBench: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val k = spark.read.parquet(s"$indexPath/meta").head.getInt(0)
    cutContaminatedSpans(corpus, id, text,
      spark.read.parquet(s"$indexPath/hashes"), k, broadcastBench)
  }

  /** The cut machinery shared by the live and artifact span-decontam
    * paths: mark positions covered by any corpus window in the
    * `contaminated` (h, h2) set (broadcast by default), rebuild ONLY
    * hit docs. */
  private def cutContaminatedSpans(corpus: DataFrame, id: Column,
      text: Column, contaminated: DataFrame, k: Int,
      broadcastBench: Boolean): DataFrame = {
    val words = spanWords(corpus, id, text)
    val benchSide =
      if (broadcastBench) broadcast(contaminated) else contaminated
    val covered = spanWindows(words, k)
      .join(benchSide, Seq("h", "h2"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (k - 1))).as("idx"))
      .distinct()
    val hitDocs = covered.select(col("doc_id")).distinct()
    val toks = words.join(hitDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("idx"), col("tok"))
    val rebuilt = toks.join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
          s => s("tok"))).as("__kept"))
    corpus.select(id.as("doc_id"), text.as("__orig"))
      .join(hitDocs.withColumn("__hit", lit(true)), Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__hit"), coalesce(col("__kept"), lit("")))
          .otherwise(col("__orig")).as("text"))
  }

  /** (doc_id, w) word arrays — the shared base of the span-removal
    * family. */
  private def spanWords(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), split(text, " ").as("w"))

  /** The k-window / first-occurrence / coverage-union algebra shared
    * by [[removeRepeatedSpans]] and [[repeatedSpanStats]]: every word
    * position of every LATER occurrence of a duplicated k-window, as
    * distinct (doc_id, idx) rows. `materialize` materializes (via [[Materialize]]) the
    * window-hash frame — it feeds both the duplicate aggregate and the
    * marking join, and its producer is the zero-shuffle per-row hash
    * projection (the same seam as [[jaccardPairs]]).
    *
    * Windows are keyed by a 128-bit PAIR of independently-salted
    * xxhash64 values, never a single 64-bit hash: a collision here
    * silently deletes a NON-duplicated span (this operator rewrites
    * text, unlike the pair-generating stages where a collision only
    * costs a wasted verification). At the 100 TB target (~10¹³
    * windows) the 64-bit birthday bound expects ~10⁶ colliding pairs —
    * millions of wrongly-removed spans; at 128 bits the expectation is
    * ~10⁻¹³ pairs, i.e. zero in any realizable corpus. Cost: 8 extra
    * bytes per shuffled occurrence row (28 vs 20). The reference
    * technique (Lee et al. arXiv:2107.06499 suffix arrays) compares
    * exact strings; the paired hash restores that guarantee to within
    * cosmic-ray probability while still never shipping window text.
    */
  /** (doc_id, p, h, h2) k-word windows of every doc — the paired-hash
    * window projection shared by the span-removal family. Zero
    * shuffle; window text never leaves the row. */
  private def spanWindows(words: DataFrame, k: Int): DataFrame =
    words.select(col("doc_id"), posexplode(
        when(size(col("w")) < k, array().cast(ArrayType(StringType)))
          .otherwise(transform(sequence(lit(1), size(col("w")) - (k - 1)),
            p => concat_ws(" ", slice(col("w"), p, lit(k))))))
        .as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).as("p"),
        xxhash64(col("g")).as("h"),
        xxhash64(lit("graft:span:2"), col("g")).as("h2"))

  private def coveredSpanPositions(words: DataFrame, k: Int,
      materialize: Boolean): DataFrame = {
    val wins0 = spanWindows(words, k)
    val wins = if (materialize) Materialize(wins0) else wins0
    laterOccurrencePositions(wins, k)
  }

  /** Positions covered by every window occurrence that is NOT its
    * hash-pair's first (min (doc_id, p)) — the keep-first half of the
    * span-dedup algebra, shared by the one-shot and incremental
    * forms. */
  private def laterOccurrencePositions(wins: DataFrame, k: Int): DataFrame = {
    val dups = wins.groupBy(col("h"), col("h2"))
      .agg(min(struct(col("doc_id"), col("p"))).as("first"),
        count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("h"), col("h2"), col("first.doc_id").as("__f_doc"),
        col("first.p").as("__f_p"))
    wins.join(dups, Seq("h", "h2"))
      .filter(!(col("doc_id") === col("__f_doc") && col("p") === col("__f_p")))
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + (k - 1)))
        .as("idx"))
      .distinct()
  }

  /** Accounting for [[removeRepeatedSpans]]: per document, how many
    * word positions the span removal covered (0 for untouched docs) —
    * persist or log next to the dedup output so a run reports what it
    * removed (the [[hotLines]]/[[hotShingles]] convention). Same
    * window/first-occurrence algebra as the remover; one extra
    * input-bounded count aggregate.
    */
  def repeatedSpanStats(df: DataFrame, id: Column, text: Column,
      k: Int = 8, materialize: Boolean = true): DataFrame = {
    require(k >= 1, "repeatedSpanStats: need k >= 1 (window width)")
    val words = spanWords(df, id, text)
    val counts = coveredSpanPositions(words, k, materialize)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed_words"))
    words.select(col("doc_id"), size(col("w")).cast(LongType).as("n_words"))
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_removed_words"), lit(0L)).as("n_removed_words"))
  }

  /** Fuzzy record-linkage candidate pairs: records sharing a blocking
    * key whose `name` values sit within `maxDist` edit distance
    * (Levenshtein — Spark's codegen'd built-in; identical DP metric in
    * DuckDB, so the gate is exact). The classic entity-resolution
    * blocking shape (Fellegi–Sunter lineage): the block key bounds the
    * quadratic — candidate work is Σ_blocks m², never n².
    *
    * THE BLOCK KEY'S CARDINALITY MUST GROW WITH THE CORPUS. Σm² stays
    * near-linear only while expected block size m ≈ n/|blocks| stays
    * bounded; a FIXED-cardinality key (country, segment, a 125-value
    * demographic pair) makes every block grow ∝ n and total pair work
    * grow ∝ n² — measured on this corpus at exponent ≈ 2.0 (159k →
    * 16.2M block pairs across a 10× scale-up,
    * bench/scale_r11/work_counts_new.json) — until every block trips
    * `maxBlockSize` and the guard degenerates to loud-but-useless
    * (everything dropped, nothing linked). Right keys grow with n:
    * name prefixes/fragments (see [[linkRecordPairsMultiKey]] — the
    * d27-gated shape, pair count ~linear at the same scale-up),
    * name+zip, phonetic codes, canopy keys. Fixed-cardinality keys are
    * for SCOPING (only pair within a country), never for bounding.
    *
    * Blocks larger than `maxBlockSize` are dropped BEFORE the self-join
    * via a broadcast anti-join on the hot-block set (tiny by
    * definition: at most n/maxBlockSize blocks can exceed the cap) —
    * the [[hotShingles]]/annJoin guard shape, because one degenerate
    * block ("UNKNOWN", "") otherwise does m² work on a single task.
    * Never silent: [[linkDroppedBlocks]] with the same arguments
    * enumerates what the cap suppressed.
    *
    * Schema out: (id_a, id_b, dist), id_a < id_b.
    */
  def linkRecordPairs(df: DataFrame, id: Column, name: Column,
      blockKey: Column, maxDist: Int, maxBlockSize: Int = 10000): DataFrame = {
    require(maxDist >= 0, "linkRecordPairs: maxDist must be >= 0")
    require(maxBlockSize > 1, "linkRecordPairs: maxBlockSize must be > 1")
    val rows = df.select(id.as("__id"), name.as("__name"),
      blockKey.as("__blk"))
    val hot = broadcast(
      rows.groupBy(col("__blk")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBlockSize)
        .select(col("__blk")))
    // EXPANDING self-join with per-pair Levenshtein verify (the d07
    // rule, optimization r19): block rows are tiny but the join does
    // Θ(Σ m_b²) edit-distance evaluations, so byte-sized AQE
    // coalescing would run them on one near-empty-input partition.
    // The explicit count pins the exchange (AQE-exempt) at the
    // session's configured shuffle width; both sides reuse it.
    val guarded = rows.join(hot, Seq("__blk"), "left_anti")
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("__blk"))
    guarded.as("a")
      .join(guarded.as("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.__id") < col("b.__id"))
      .withColumn("dist",
        levenshtein(col("a.__name"), col("b.__name")).cast(IntegerType))
      .filter(col("dist") <= maxDist)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("dist"))
  }

  /** Multi-key (canopy) blocking: the UNION of [[linkRecordPairs]] over
    * several independent blocking keys, deduped on (id_a, id_b) — a
    * pair missed by one key is caught by another, so recall composes
    * across keys while every key individually keeps its blocks small.
    * This is the ergonomic escape from the fixed-cardinality-key trap
    * documented on [[linkRecordPairs]]: wildcard/fragment keys (e.g.
    * the name with position i masked, for each i — the deletion-
    * neighborhood construction, which has FULL recall of single-
    * substitution typos) have cardinality ∝ n, so Σm² stays ~linear at
    * any corpus size.
    *
    * Scale shape: one [[linkRecordPairs]] self-join per key (each
    * guarded by `maxBlockSize` independently, each one shuffle on its
    * own key), then ONE partial-aggregatable min per (id_a, id_b) to
    * collapse multi-key duplicates — map-side combined, never a
    * window. `dist` is key-independent (same Levenshtein on the same
    * names), so min is the value itself.
    *
    * Schema out: (id_a, id_b, dist), id_a < id_b.
    */
  def linkRecordPairsMultiKey(df: DataFrame, id: Column, name: Column,
      blockKeys: Seq[Column], maxDist: Int,
      maxBlockSize: Int = 10000): DataFrame = {
    require(blockKeys.nonEmpty, "linkRecordPairsMultiKey: need >= 1 key")
    blockKeys
      .map(k => linkRecordPairs(df, id, name, k, maxDist, maxBlockSize))
      .reduce(_ unionByName _)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("dist")).as("dist"))
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo, DMKD
    * 1998): sort records by `sortKey`, slide a window of `window`
    * positions over the sorted order, and pair every record with the
    * records inside its window whose `name` sits within `maxDist`
    * Levenshtein distance. The third blocking discipline next to
    * single-key ([[linkRecordPairs]]) and canopy
    * ([[linkRecordPairsMultiKey]]), with the property neither has:
    * candidate work is EXACTLY n·(window−1) pairs — independent of the
    * key's value distribution, so a skewed or constant-heavy key
    * ("UNKNOWN" everywhere) cannot create a hot block and no
    * `maxBlockSize` guard is needed. The trade is recall-by-locality:
    * only records within `window−1` sorted positions can pair, so the
    * sort key must put likely matches near each other (multi-pass SNM
    * — union over several sort keys, dedup on (id_a, id_b) — composes
    * exactly like the canopy union when one ordering isn't enough).
    *
    * Scale shape: ONE range-partition shuffle of (id, name, key) rows
    * establishes the global sort; ranks are exact global sort
    * positions computed as per-partition row_numbers plus partition
    * offsets (the offsets are one collected count per partition —
    * driver state bounded by the partition count, the [[Materialize]]d
    * frame guaranteeing both jobs see one partitioning). The windowed
    * pairing is an equi-join on `rank div (window−1)` with the a-side
    * exploded into its two candidate buckets — every qualifying rank
    * pair lands in exactly one bucket pair, so the join emits each
    * candidate once and no post-dedup is needed. No broadcast of
    * anything corpus-sized; the per-partition window never spans
    * partitions (ranks make adjacency explicit, so boundary records
    * need no replication).
    *
    * Schema out: (id_a, id_b, dist), id_a < id_b — [[linkRecordPairs]]'
    * contract, so the closure/canonical stages compose unchanged.
    */
  def linkRecordPairsSorted(df: DataFrame, id: Column, name: Column,
      sortKey: Column, window: Int, maxDist: Int): DataFrame = {
    require(window >= 2, "linkRecordPairsSorted: window must be >= 2")
    require(maxDist >= 0, "linkRecordPairsSorted: maxDist must be >= 0")
    val spark = df.sparkSession
    val parts = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val ranged = Materialize(
      df.select(id.as("__id"), name.as("__name"), sortKey.as("__k"))
        .repartitionByRange(parts, col("__k"), col("__id"))
        .withColumn("__pid", spark_partition_id()))
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0 -> 0L) {
      case ((_, off), (pid, n)) => pid -> (off + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = broadcast(
      spark.createDataFrame(offsets.toIndexedSeq).toDF("__pid", "__off"))
    val ranked = ranged
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(col("__k"), col("__id"))))
      .join(offDf, Seq("__pid"))
      .select(col("__id"), col("__name"),
        (col("__off") + col("__r") - 1).as("__rank"))
    val b = window - 1
    val aSide = ranked.select(col("__id").as("__ia"),
        col("__name").as("__na"), col("__rank").as("__ra"))
      .withColumn("__jb", explode(array(expr(s"__ra div $b"),
        expr(s"__ra div $b") + 1)))
    val bSide = ranked.select(col("__id").as("__ib"),
      col("__name").as("__nb"), col("__rank").as("__rb"),
      expr(s"__rank div $b").as("__bb"))
    aSide.join(bSide, col("__jb") === col("__bb") &&
        col("__rb") > col("__ra") && col("__rb") <= col("__ra") + b)
      .withColumn("dist",
        levenshtein(col("__na"), col("__nb")).cast(IntegerType))
      .filter(col("dist") <= maxDist)
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("dist"))
  }

  /** Multi-pass sorted-neighborhood (the Hernández–Stolfo
    * multi-pass SNM): the UNION of [[linkRecordPairsSorted]] over
    * several sort keys, deduped on (id_a, id_b) — the recall composer
    * for the one weakness a single ordering has: only records within
    * `window−1` positions of ONE sort order can pair, so a typo in the
    * key's leading characters (the first character of a name, under a
    * name sort) teleports a true match across the corpus. A second
    * ordering that keys on what the typo did NOT touch (e.g.
    * `reverse(name)`) puts the pair adjacent again; recall composes
    * across passes exactly like the canopy union
    * ([[linkRecordPairsMultiKey]], d27).
    *
    * Scale shape: one [[linkRecordPairsSorted]] per key — each a
    * single range-partition shuffle with EXACTLY n·(window−1)
    * candidate pairs under any key skew — then ONE
    * partial-aggregatable min per (id_a, id_b) to collapse multi-pass
    * duplicates (map-side combined, never a window; `dist` is
    * key-independent so min is the value itself). Total candidate work
    * is keys·n·(window−1) — still linear in n, still skew-immune, no
    * guard needed.
    *
    * Schema out: (id_a, id_b, dist), id_a < id_b — [[linkRecordPairs]]'
    * contract, so the closure/canonical stages compose unchanged.
    */
  def linkRecordPairsSortedMulti(df: DataFrame, id: Column, name: Column,
      sortKeys: Seq[Column], window: Int, maxDist: Int): DataFrame = {
    require(sortKeys.nonEmpty, "linkRecordPairsSortedMulti: need >= 1 key")
    sortKeys
      .map(k => linkRecordPairsSorted(df, id, name, k, window, maxDist))
      .reduce(_ unionByName _)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("dist")).as("dist"))
  }

  /** Accounting for [[linkRecordPairs]]'s `maxBlockSize` guard:
    * (block, block_size) for every dropped block. One
    * partial-aggregatable count — run it whenever the cap is finite so
    * a capped run reports what it skipped.
    */
  def linkDroppedBlocks(df: DataFrame, blockKey: Column,
      maxBlockSize: Int): DataFrame =
    df.groupBy(blockKey.as("block"))
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlockSize)

  /** Entity resolution over [[linkRecordPairs]]: transitive closure of
    * the fuzzy-match graph ([[connectedComponentsStar]] — min reachable
    * id labels a component; the star alternation because fuzzy-match
    * graphs chain (A≈B≈C with A̸≈C is the normal case), so the
    * diameter-independent O(log n) variant is the right default), every
    * input record assigned an `entity_id` (singletons map to
    * themselves). The complete dedup-entities pipeline in one call:
    * blocking → bounded pairwise scoring → clustering → assignment.
    *
    * Scale shape: one shuffle on the block key for the pair stage
    * (bounded by `maxBlockSize`), the CC rounds on the MATCH graph
    * (bounded by true duplicates, not corpus size), and one left join
    * of assignments back to the input. No broadcast of anything
    * corpus-sized.
    *
    * Schema out: input id column plus (entity_id).
    */
  def linkRecords(df: DataFrame, id: Column, name: Column,
      blockKey: Column, maxDist: Int, maxBlockSize: Int = 10000): DataFrame = {
    val pairs = linkRecordPairs(df, id, name, blockKey, maxDist, maxBlockSize)
    val labels = connectedComponentsStar(pairs)
      .select(col("doc_id").as("__id"), col("cluster_id"))
    df.select(id.as("rec_id"))
      .join(labels.withColumnRenamed("__id", "rec_id"), Seq("rec_id"), "left")
      .select(col("rec_id"),
        coalesce(col("cluster_id"), col("rec_id")).as("entity_id"))
  }

  /** [[linkRecords]] plus canonical-record selection: each entity's
    * representative is its highest-`keepBy` member (ties → lowest
    * rec_id) — the master-record choice real entity resolution ends
    * with (keep the most complete / most recent / highest-value
    * record), the record-linkage analogue of [[dedupNear]]'s `keepBy`
    * and `Curation.curate`'s quality-aware survivor.
    *
    * The arg-max is ONE partial-aggregatable `max(struct(keepBy,
    * -rec_id))` per entity — map-side combine, no window, so a
    * million-record entity ships one row per map task (the
    * [[dedupExact]] discipline). Returns
    * (rec_id, entity_id, canonical_id).
    */
  def linkRecordsCanonical(df: DataFrame, id: Column, name: Column,
      blockKey: Column, maxDist: Int, keepBy: Column,
      maxBlockSize: Int = 10000): DataFrame =
    canonicalFromEntities(
      linkRecords(df, id, name, blockKey, maxDist, maxBlockSize),
      df, id, keepBy)

  /** The canonical-record selection of [[linkRecordsCanonical]] over
    * an ALREADY-COMPUTED (rec_id, entity_id) assignment — lets a
    * caller (or the shared gate-fixture layer) materialize one
    * [[linkRecords]] closure and fan several keep policies out from
    * it without re-deriving the blocking + Levenshtein + closure
    * chain. Same plan shape: one partial-aggregatable arg-max per
    * entity, no window. */
  def canonicalFromEntities(assigned: DataFrame, df: DataFrame,
      id: Column, keepBy: Column): DataFrame = {
    val scored = assigned
      .join(df.select(id.as("rec_id"), keepBy.as("__score")), Seq("rec_id"))
    val canon = scored
      .groupBy(col("entity_id"))
      .agg(max(struct(col("__score").as("s"), (-col("rec_id")).as("nid")))
        .as("__best"))
      .select(col("entity_id"), (-col("__best.nid")).as("canonical_id"))
    scored.join(canon, Seq("entity_id"))
      .select(col("rec_id"), col("entity_id"), col("canonical_id"))
  }
}
