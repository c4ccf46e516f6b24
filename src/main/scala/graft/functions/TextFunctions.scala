package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines —
  * all built from codegen'd `org.apache.spark.sql.functions` (no UDFs in
  * the hot path), so whole-stage codegen spans the full expression tree
  * and every operator scales embarrassingly parallel over partitions.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def words(text: Column): Column = split(text, "\\s+")

  /** Unicode normalization (NFC by default; NFD/NFKC/NFKD accepted) —
    * run this BEFORE any content-keyed dedup on a corpus that mixes
    * sources: precomposed (U+00E9) and decomposed (U+0065 U+0301)
    * renderings of the same text otherwise produce different
    * fingerprints/shingles/line-hashes and silently miss duplicates.
    * Native codegen'd projection ([[expressions.UnicodeNormalize]]);
    * already-normalized text (the common case) is detected without
    * allocation. Zero shuffle.
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    expressions.UnicodeNormalize(text, form)

  /** Accent folding: NFD-decompose, drop combining marks, recompose —
    * `café münchen` → `cafe munchen`; non-decomposable characters
    * (`ø`, `ß`, CJK) pass through. The canonical "same word modulo
    * diacritics" key for record linkage ([[Dedup.linkRecords]]) and
    * cross-source matching; parity with DuckDB's `strip_accents`
    * (t22 oracle). Native codegen'd projection with an ASCII
    * zero-allocation fast path. Zero shuffle.
    */
  def foldAccents(text: Column): Column = expressions.StripAccents(text)

  /** Word n-gram shingles (the unit set for Jaccard/MinHash dedup).
    * Empty result for docs shorter than n words.
    *
    * PERFORMANCE: pass a *materialized array column* (e.g. project
    * `words(text).as("w")` first and pass `col("w")`), not `words(text)`
    * directly. Higher-order-function lambdas re-evaluate captured
    * non-attribute expressions per element — an inlined split() turns
    * O(words) into O(words²) per document. [[Dedup.shingleRows]] does
    * this correctly.
    */
  def wordShingles(wordArray: Column, n: Int = 3): Column = {
    val cnt = size(wordArray) - (n - 1)
    // guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not an
    // empty array — short docs must short-circuit to [] explicitly
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(k => element_at(wordArray, i + k)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Deterministic 56-bit hash, identical in any engine with md5:
    * first 14 hex digits of md5 as a big-endian integer. Used wherever a
    * portable (oracle-reproducible) hash is needed; for pure-Spark paths
    * prefer the codegen'd built-in `xxhash64`.
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast(LongType)

  /** Deterministic train/validation/test assignment from a stable key:
    * bucket = portable hash of the key mod `buckets`, so the split is
    * reproducible across runs, engines, and cluster topologies (never
    * `rand()` — resampling on retry leaks test data into training).
    * Zero shuffle; thresholds are cumulative bucket counts.
    */
  def hashSplit(key: Column, buckets: Int = 10,
      thresholds: Seq[(String, Int)] = Seq("train" -> 8, "valid" -> 9, "test" -> 10)): Column = {
    val b = pmod(portableHash64(key.cast(StringType)), lit(buckets))
    thresholds.init.foldRight(lit(thresholds.last._1): Column) {
      case ((name, upper), rest) => when(b < upper, name).otherwise(rest)
    }
  }

  /** Deterministic WEIGHTED Bernoulli sample: keep each row with
    * probability `min(1, weight · scale)`, decided by the portable
    * hash of `key` — per-row importance sampling (keep ∝ quality
    * score, length, dedup-cluster size, …), the Poisson-sampling
    * primitive behind proportional token budgeting. Same determinism
    * contract as [[hashSplit]]/[[sampleByStratum]]: a pure function of
    * (key, weight), rerun-stable, identical on any topology and in any
    * engine with md5 (never `rand()` — a retry must not resample), and
    * a ZERO-SHUFFLE filter, so it composes into any scan for free.
    *
    * Exactness: the keep test is `hash mod 10⁴ < floor(p·10⁴)` where
    * p's arithmetic is one multiply + min of exact operands — the
    * t05/t06/t19 engine-portability convention (gated as t26). Rows
    * with weight ≥ 1/scale are ALWAYS kept (p caps at 1); non-positive
    * weights are never kept.
    */
  def sampleByWeight(df: DataFrame, key: Column, weight: Column,
      scale: Double): DataFrame = {
    require(scale > 0, "sampleByWeight: scale must be positive")
    val m = 10000L
    val thresh = floor(
      least(lit(1.0), weight.cast(DoubleType) * lit(scale)) * m)
      .cast(LongType)
    df.filter(
      pmod(portableHash64(key.cast(StringType)), lit(m)) < thresh)
  }

  /** Rolling `k`-char gram hashes for winnowing: position i gets the
    * 64-bit hash of `text[i, i+k)`. Empty array for texts shorter than
    * `k`. MATERIALIZE the result as a column before passing it to
    * [[winnowFromGrams]] — the HOF-lambda re-evaluation rule (see
    * [[wordShingles]]) otherwise re-hashes the whole text once per
    * window.
    *
    * `hashFn` defaults to the md5-based [[portableHash64]] so fingerprints
    * are reproducible in any engine (the t04 oracle); production runs
    * that only need self-consistency should pass `xxhash64(_)` — one
    * codegen'd hash instead of an md5 per gram.
    */
  def gramHashes(text: Column, k: Int = 5,
      hashFn: Column => Column = portableHash64): Column =
    when(length(text) < k, array().cast(ArrayType(LongType)))
      .otherwise(transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => hashFn(text.substr(i, lit(k)))))

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    * slide a window of `w` gram hashes over a MATERIALIZED
    * [[gramHashes]] column, keep each window's minimum, dedupe.
    * Winnowing guarantees a fingerprint in every `w`-gram stretch, so
    * any shared substring of length ≥ k + w − 1 yields a shared
    * fingerprint — the standard plagiarism/near-copy detection
    * primitive. Documents with fewer than `w` grams yield their single
    * global minimum; empty gram arrays fingerprint to empty.
    *
    * Pure codegen'd projection — zero shuffle, O(grams·w) per document.
    */
  def winnowFromGrams(grams: Column, w: Int = 4): Column =
    // per-window slice+array_min, O(grams·w). A sparse-table sliding
    // min (zip_with levels) was tried and measured SLOWER here:
    // higher-order functions evaluate interpreted, and each zip_with
    // level's tree references the previous level twice, so the nested
    // form re-evaluates 2^levels ≈ w times anyway — with full-array
    // allocations instead of w-slices. The window cost is dominated by
    // the gram hashing either way; see winnowPairs(materialize).
    array_distinct(
      when(size(grams) === 0, array().cast(ArrayType(LongType)))
        .otherwise(transform(
          sequence(lit(1), greatest(size(grams) - (w - 1), lit(1))),
          j => array_min(slice(grams, j, lit(w))))))

  /** Fused native winnowing — [[gramHashes]] + [[winnowFromGrams]] in
    * ONE pass via the codegen'd
    * [[graft.functions.expressions.WinnowFingerprints]] expression:
    * the text's bytes are walked once, each gram digests its byte
    * range in place, and the window minima fold over a primitive long
    * array. BIT-IDENTICAL output to the HOF pipeline (same md5-based
    * gram hash, same clamped windows, same first-occurrence dedup),
    * measured ~10× faster on the t04 shape — prefer this for
    * production fingerprinting; keep the composable pieces when a
    * pipeline needs the intermediate gram array. One deliberate
    * difference: NULL text returns NULL here, where the HOF pipeline
    * leaks a `[null]` singleton (a `greatest(null, 1)` wart) —
    * spec-pinned in WinnowFingerprintsSpec.
    */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.expressions.WinnowFingerprints(text, k, w)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** PII detector presets for [[regexScan]]: the common training-data
    * decontamination targets, written in the Java∩RE2 regex subset so
    * the same pattern runs in Spark and any RE2-based oracle engine.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Per-pattern regex hit counts over a text column — the scrubbing /
    * policy-filter primitive (PII detection with [[PiiPatterns]],
    * boilerplate markers, blocklist terms). One output row per input
    * row: `<name>_hits` ints per pattern plus a `has_hits` flag. Pure
    * codegen'd projection — zero shuffle, linear scan, trivially
    * partition-parallel at any corpus size.
    */
  def regexScan(df: DataFrame, id: Column, text: Column,
      patterns: Seq[(String, String)] = PiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "regexScan: no patterns")
    val hits = patterns.map { case (name, p) =>
      size(regexp_extract_all(text, lit(p), lit(0))).as(s"${name}_hits")
    }
    val any = patterns.map { case (name, _) => col(s"${name}_hits") > 0 }
      .reduce(_ || _)
    df.select(id.as("doc_id") +: hits: _*)
      .withColumn("has_hits", any)
  }

  /** PII redaction: rewrite every match of each pattern to a
    * `<NAME>` placeholder (sequentially, in pattern order — mirrored
    * exactly by the t23 oracle) and report per-pattern hit counts
    * measured on the ORIGINAL text. The emit-side twin of
    * [[regexScan]]: scan gates/filters a corpus, redact ships it.
    * Patterns must stay in the Java∩RE2 regex subset
    * ([[PiiPatterns]]) so engines agree; leftmost non-overlapping
    * global replacement is the shared semantics.
    *
    * Scale: pure per-row projection of codegen'd `regexp_replace` /
    * `regexp_extract_all` — zero shuffle, runs inside the scan stage.
    */
  def redactPii(df: DataFrame, id: Column, text: Column,
      patterns: Seq[(String, String)] = PiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "redactPii: no patterns")
    val redacted = patterns.foldLeft(text) { case (acc, (name, p)) =>
      regexp_replace(acc, lit(p), lit(s"<${name.toUpperCase}>"))
    }
    val hits = patterns.map { case (name, p) =>
      size(regexp_extract_all(text, lit(p), lit(0))).as(s"${name}_hits")
    }
    df.select(Seq(id.as("doc_id"), redacted.as("redacted")) ++ hits: _*)
      .withColumn("has_hits",
        patterns.map { case (n, _) => col(s"${n}_hits") > 0 }.reduce(_ || _))
  }

  /** Keep the top `k` rows per group by `score` (ties broken by
    * `tiebreak`, which must be unique within a group for deterministic,
    * engine-portable results) — the standard quality-filter /
    * mixture-cap step: "best N documents per domain/language". One
    * shuffle on the group key, then a codegen'd running rank; no global
    * sort, no collect. At 100 TB the shuffle carries only (group, score,
    * tiebreak, payload) rows — project before calling if the payload is
    * wide. BATCH-ONLY: the rank window blocks on its whole partition, so
    * this cannot incrementalize over a stream (TextStreamingSpec pins
    * the loud failure); the streaming-composable operators are
    * [[regexScan]] and [[sampleByStratum]].
    */
  def topKPerGroup(df: DataFrame, group: Column, score: Column,
      tiebreak: Column, k: Int): DataFrame = {
    require(k > 0, "topKPerGroup: k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(score.desc, tiebreak)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Top-`k` distinguishing terms per document by TF-IDF rank. The
    * score is `tf / df` — the same ranking as any classic
    * `tf·log(N/df)` variant for a fixed corpus (monotone in tf and
    * 1/df), but computed as ONE IEEE division of exact integers, so the
    * ranking is bit-reproducible across engines and partial-aggregation
    * orders (a log-based idf would differ by ulps between libm
    * implementations). Ties break on the term text. Two aggregates (tf
    * per (doc, term), df per term) + one join on term + the per-doc
    * rank — no collect, no global sort; the df side is a per-term
    * aggregate, broadcastable when the vocabulary is small and an
    * ordinary shuffle join when it isn't. BATCH-ONLY: the distinct
    * aggregate and rank window cannot incrementalize over a stream
    * (TextStreamingSpec pins the loud failure).
    */
  def tfidfTopTerms(df: DataFrame, id: Column, text: Column,
      k: Int = 3): DataFrame = {
    require(k > 0, "tfidfTopTerms: k must be positive")
    val w = df.select(id.as("doc_id"), explode(words(text)).as("term"))
    val tf = w.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = w.groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score", col("tf").cast(DoubleType) / col("df"))
    topKPerGroup(scored, col("doc_id"), col("score"), col("term"), k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** Markup stripping — the FIRST stage of every web-corpus pipeline
    * (C4/CCNet start from crawled HTML): drop `<script>`/`<style>`
    * blocks WITH their contents and HTML comments, strip remaining
    * tags (a tag must open with `</`, `<!` or `<letter`, so prose
    * math like `a < b` survives), decode the six common entities with
    * `&amp;` LAST (single-pass decode: `&amp;lt;` → `&lt;`, never
    * `<`), and collapse whitespace. Pure regexp/replace chain on the
    * Java∩RE2 subset (the t07/t23 convention, so the oracle replays
    * it verbatim) — codegen'd, zero shuffle, embarrassingly parallel.
    * This is a cleaner, not a parser: pathological markup (unclosed
    * `<script`, attributes containing `>`) degrades to extra stripped
    * text, the standard tradeoff every regex-based pipeline cleaner
    * makes; documents that need DOM fidelity need a DOM, not a regex.
    */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(text,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "</?[!a-zA-Z][^>]*>", " ")
    val decoded = replace(replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&apos;"), lit("'")), lit("&nbsp;"), lit(" "))
    trim(regexp_replace(replace(decoded, lit("&amp;"), lit("&")),
      "\\s+", " "))
  }

  /** URL canonicalization — the dedup key a crawl pipeline computes
    * before anything else (the same page arrives as `HTTP://WWW.X.COM
    * :80/p/?utm_source=a#frag` and `http://x.com/p`): lowercase
    * scheme+host, strip a leading `www.`, drop the scheme's default
    * port, drop the fragment, strip trailing path slashes, remove
    * tracking parameters (`utm_*`, `fbclid`, `gclid`) and SORT the
    * survivors so parameter order can't split a group. Path case and
    * interior slashes are preserved (they are semantic). Strings with
    * no `scheme://` pass through unchanged — this is a normalizer,
    * not a validator. Pure regexp/HOF chain on the Java∩RE2 subset
    * (t07/t23 convention), zero shuffle; `groupBy(canonicalizeUrl(u))`
    * keep-first IS the URL-level dedup, one hash-agg shuffle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val path = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // the query starts at the FIRST '?' BEFORE any '#': [^#?]* can
    // cross neither, so a '?' inside the fragment can never leak in
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    // (www\.)+ not a single strip: www.www.x.com must canonicalize to
    // x.com in ONE pass or the form isn't a fixed point (idempotence
    // is what lets a re-canonicalized pipeline share dedup groups with
    // a first-pass one — PropertySpec pins it with doubled prefixes)
    val noWww = regexp_replace(hostport, "^(www\\.)+", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val cpath = regexp_replace(path, "/+$", "")
    val cq = array_join(array_sort(filter(split(query, "&"),
      x => length(x) > 0 && !x.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))),
      "&")
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, cpath,
        when(cq === "", lit("")).otherwise(concat(lit("?"), cq))))
  }

  /** Train the bigram language model for [[lmFamiliarity]]: one row per
    * distinct bigram `s` ("w1 w2", space-joined) with its corpus count
    * `c2` and its CONTEXT count `c1` (total continuations of `w1` —
    * `sum(c2)` over bigrams sharing the first word), so each model row
    * carries everything the conditional frequency `c2/c1` needs. Two
    * aggregates over the reference slice; the result is vocabulary²-
    * bounded — orders of magnitude smaller than the corpus — which is
    * what makes the scoring side a broadcast join at any corpus size.
    * A 100 TB pipeline trains this once on its trusted reference slice
    * and persists it like any other model artifact.
    *
    * `minCount` is the standard LM pruning knob — on open-domain text
    * the raw bigram TYPE count grows far past any broadcast budget
    * (hapax bigrams dominate), and dropping `c2 < minCount` rows
    * shrinks the model by orders of magnitude while barely moving the
    * scores (pruned bigrams score as OOV, which the coverage columns
    * report). Context counts `c1` are computed BEFORE pruning, so a
    * pruned model still conditions on the true context mass.
    */
  def lmTrainBigrams(corpus: DataFrame, text: Column,
      minCount: Long = 1L): DataFrame =
    lmTrainNgrams(corpus, text, order = 2, minCount)

  /** Order-n generalization of [[lmTrainBigrams]] — the model the
    * published CCNet/Gopher quality filters actually use is a 5-gram
    * LM, not a bigram one. One row per distinct n-gram `s`
    * (space-joined) with its corpus count `c2` and its CONTEXT count
    * `c1` (total continuations of the n-gram's first n−1 words), so
    * the exact-integer Σc2/Σc1 scoring contract carries over from the
    * bigram form unchanged. The context key is the shingle minus its
    * last word (`substring_index(s, ' ', order − 1)` — equal to the
    * oracle's `regexp_replace(s, ' [^ ]*$', '')` because an order-n
    * shingle contains exactly n−1 spaces); for order = 2 that IS the
    * first word, which is why [[lmTrainBigrams]] is this with order = 2.
    * Same pruning contract: `c1` is computed BEFORE the `minCount`
    * filter, so a pruned model still conditions on true context mass.
    */
  def lmTrainNgrams(corpus: DataFrame, text: Column, order: Int,
      minCount: Long = 1L): DataFrame = {
    require(order >= 2,
      "lmTrainNgrams: need order >= 2 (a context to condition on)")
    require(minCount >= 1, "lmTrainNgrams: minCount must be >= 1")
    val shingled = corpus.select(words(text).as("__w"))
      .select(explode(wordShingles(col("__w"), order)).as("s"))
    val big = shingled.groupBy(col("s")).agg(count(lit(1)).as("c2"))
    // c1 = Σc2 over the n-gram's context (s minus its last word) as a
    // whole-partition window instead of the groupBy(ctx)+self-join it
    // replaced (optimization r19, guide §2.4): the join re-exchanged
    // BOTH sides on the context key where the window pays that
    // exchange once, and the context key itself drops the per-row
    // regex for substring_index — a shingle of order n is exactly
    // n−1 single spaces between whitespace-free tokens, so "prefix
    // before the last space" ≡ "prefix before the (n−1)th space".
    // c1 is still computed BEFORE the minCount filter (the pruning
    // contract above); values are bit-identical (exact integer sums).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(substring_index(col("s"), " ", order - 1))
    big.withColumn("c1", sum(col("c2")).over(w))
      .filter(col("c2") >= minCount)
      .select(col("s"), col("c2"), col("c1"))
  }

  /** Bigram language-model familiarity scoring — the perplexity-style
    * quality filter of CCNet/Gopher pipelines (score every document
    * against an n-gram model trained on a trusted reference slice,
    * then keep/weight by score), re-expressed in EXACT integer
    * arithmetic. A classic per-bigram `log(c2/c1)` sum is not
    * reproducible across engines or partial-aggregation orders (libm
    * ulps + float addition order); instead each doc aggregates two
    * BIGINT sums over its model-matched bigrams — `Σc2` and `Σc1` —
    * and emits ONE IEEE division `familiarity = Σc2/Σc1` (the
    * context-frequency-weighted mean conditional probability, the same
    * keep/drop ordering signal), plus the coverage counts `n_bigrams`
    * and `n_known` whose ratio is the OOV-rate filter. Bit-identical
    * under any plan: integer partial sums commute.
    *
    * Scoring is a zero-shuffle shingle projection, a broadcast join
    * against the vocabulary²-bounded model, and one per-doc partial
    * aggregate — the doc-contiguous input makes the combine map-side,
    * so the whole filter costs one small shuffle at 100 TB. Documents
    * with no model-matched bigram (or fewer than two words) score
    * null — unknown, not zero; route them by `n_known`/`n_bigrams`.
    */
  def lmFamiliarity(docs: DataFrame, model: DataFrame, id: Column,
      text: Column, broadcastModel: Boolean = true): DataFrame =
    lmFamiliarityNgrams(docs, model, id, text, order = 2, broadcastModel)
      .withColumnRenamed("n_ngrams", "n_bigrams")

  /** Order-n [[lmFamiliarity]] — score against an [[lmTrainNgrams]]
    * model of the matching order. Same exact-integer contract: two
    * BIGINT sums per doc over its model-matched n-grams, ONE IEEE
    * division, null (not zero) for docs with no matched n-gram.
    *
    * `broadcastModel = false` switches the scoring join to an ordinary
    * shuffle join — the hatch for UNPRUNED open-domain models, whose
    * n-gram type count (hapax n-grams dominate, worse with order) can
    * grow past any broadcast budget; same rows, one extra exchange on
    * the shingle key (the d31 `broadcastBench` pattern).
    *
    * Schema out: (doc_id, n_ngrams, n_known, familiarity).
    */
  def lmFamiliarityNgrams(docs: DataFrame, model: DataFrame, id: Column,
      text: Column, order: Int, broadcastModel: Boolean = true): DataFrame = {
    require(order >= 2,
      "lmFamiliarityNgrams: need order >= 2 (a context to condition on)")
    val b = docs.select(id.as("doc_id"), words(text).as("__w"))
      .select(col("doc_id"),
        explode_outer(wordShingles(col("__w"), order)).as("s"))
    val m = if (broadcastModel) broadcast(model) else model
    b.join(m, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_ngrams"),
        count(col("c2")).as("n_known"),
        sum(col("c2")).as("__sc2"),
        sum(col("c1")).as("__sc1"))
      .select(col("doc_id"), col("n_ngrams"), col("n_known"),
        (col("__sc2").cast(DoubleType) / col("__sc1")).as("familiarity"))
  }

  /** Persist an [[lmTrainNgrams]] model as an artifact — the
    * train-once/score-daily shape every other model family here
    * already has ([[Dedup.writeBenchIndex]], [[Dedup.writeSpanIndex]],
    * the IVF-PQ `_model/` tree): the reference slice is shingled and
    * counted ONCE into `path/model`, and every corpus increment scores
    * against the artifact ([[lmFamiliarityWithIndex]]). The order and
    * minCount are stored IN the artifact (`path/meta`, the d32
    * k-in-meta rule) and read back at use — a caller-supplied order
    * that disagreed with the indexed shingles would match nothing and
    * silently score every document OOV.
    */
  def writeLmModel(corpus: DataFrame, text: Column, path: String,
      order: Int = 5, minCount: Long = 1L): Unit = {
    lmTrainNgrams(corpus, text, order, minCount)
      .write.mode("overwrite").parquet(s"$path/model")
    corpus.sparkSession.range(1)
      .select(lit(order).as("order"), lit(minCount).as("min_count"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** [[lmFamiliarityNgrams]] against a [[writeLmModel]] artifact — the
    * daily-increment shape: the increment is shingled live, the model
    * side (counts AND order) comes entirely from the artifact. Result
    * bit-identical to the live path over the same reference slice
    * (t33 shares t32's oracle).
    */
  def lmFamiliarityWithIndex(docs: DataFrame, indexPath: String,
      id: Column, text: Column, broadcastModel: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    val order = spark.read.parquet(s"$indexPath/meta")
      .select(col("order")).head.getInt(0)
    lmFamiliarityNgrams(docs, spark.read.parquet(s"$indexPath/model"),
      id, text, order, broadcastModel)
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * score every corpus document by how much more a TARGET-domain
    * n-gram model likes it than the RAW-corpus model does —
    * `importance = familiarity_target / familiarity_raw` — the
    * select-what-looks-like-the-target signal that beats a one-sided
    * quality filter when the raw corpus has its own strong modes.
    * Deterministic divergences from the paper, both forced by the
    * reproducibility contract: the per-feature log-likelihood sum
    * becomes the [[lmFamiliarityNgrams]] exact-integer Σc2/Σc1 ratio
    * (a libm `log` drifts by ulps across engines; the familiarity
    * ratio is the same keep/drop ordering signal), and each side is
    * ONE IEEE division of exact BIGINT sums, the importance a third —
    * a fixed expression tree of correctly-rounded ops, bit-identical
    * anywhere.
    *
    * One shingle projection over the corpus, ONE left join against
    * each model (both vocabulary-bounded; `broadcastModels = false`
    * is the unpruned-model shuffle hatch), one per-doc map-side-
    * combined aggregate computing all four BIGINT sums at once — the
    * corpus is read once and never shuffled beyond the doc-id combine.
    * Documents with no target-matched n-gram score importance null
    * (unknown, not zero — the zero-target-probability drop of the
    * paper); `n_known_target`/`n_ngrams` is the coverage diagnostic.
    *
    * Schema out: (doc_id, n_ngrams, n_known_target, n_known_raw,
    * familiarity_target, familiarity_raw, importance).
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame, id: Column,
      text: Column, targetText: Column, order: Int = 2,
      minCount: Long = 1L, broadcastModels: Boolean = true): DataFrame = {
    require(order >= 2,
      "importanceWeights: need order >= 2 (a context to condition on)")
    scoreImportance(corpus,
      lmTrainNgrams(target, targetText, order, minCount),
      lmTrainNgrams(corpus, text, order, minCount),
      id, text, order, broadcastModels)
  }

  /** The shared t39/t40 scoring pass over explicit (s, c2, c1) model
    * frames. */
  private def scoreImportance(corpus: DataFrame, modelTarget: DataFrame,
      modelRaw: DataFrame, id: Column, text: Column, order: Int,
      broadcastModels: Boolean): DataFrame = {
    val mT = modelTarget
      .select(col("s"), col("c2").as("__c2t"), col("c1").as("__c1t"))
    val mR = modelRaw
      .select(col("s"), col("c2").as("__c2r"), col("c1").as("__c1r"))
    // ONE merged model probe instead of two sequential left joins
    // (optimization r19, guide §3/§2.3): each model keys `s` uniquely
    // (groupBy(s) upstream), so a full-outer merge on `s` carries both
    // count pairs on one row and a single left join reproduces exactly
    // the rows the two-join chain produced — the corpus-sized exploded
    // frame crosses ONE join instead of two, and only one broadcast is
    // built. The merge itself is vocabulary-bounded.
    val m = mT.join(mR, Seq("s"), "full_outer")
    val bm = if (broadcastModels) broadcast(m) else m
    val famT = col("__sc2t").cast(DoubleType) / col("__sc1t")
    val famR = col("__sc2r").cast(DoubleType) / col("__sc1r")
    corpus.select(id.as("doc_id"), words(text).as("__w"))
      .select(col("doc_id"),
        explode_outer(wordShingles(col("__w"), order)).as("s"))
      .join(bm, Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("s")).as("n_ngrams"),
        count(col("__c2t")).as("n_known_target"),
        count(col("__c2r")).as("n_known_raw"),
        sum(col("__c2t")).as("__sc2t"), sum(col("__c1t")).as("__sc1t"),
        sum(col("__c2r")).as("__sc2r"), sum(col("__c1r")).as("__sc1r"))
      .select(col("doc_id"), col("n_ngrams"), col("n_known_target"),
        col("n_known_raw"), famT.as("familiarity_target"),
        famR.as("familiarity_raw"), (famT / famR).as("importance"))
  }

  /** [[importanceWeights]] against two [[writeLmModel]] artifacts —
    * the train-once shape for the DSIR selector: both the TARGET model
    * (static by definition) and the RAW-corpus model (retrained on a
    * drift cadence, not per increment) are persisted trees, and every
    * corpus increment scores against them. The two artifacts' orders
    * must agree — mismatched orders would produce n-gram keys that
    * never match and silently score everything OOV, so the call
    * fails loudly instead (the d32 k-in-meta rule, applied across two
    * artifacts). Result bit-identical to the live path over the same
    * slices (t40 shares t39's oracle).
    */
  def importanceWeightsWithIndex(corpus: DataFrame, targetPath: String,
      rawPath: String, id: Column, text: Column,
      broadcastModels: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val ot = spark.read.parquet(s"$targetPath/meta")
      .select(col("order")).head.getInt(0)
    val or = spark.read.parquet(s"$rawPath/meta")
      .select(col("order")).head.getInt(0)
    require(ot == or,
      s"importanceWeightsWithIndex: target model order $ot != raw model " +
        s"order $or — the n-gram keys would never match and every " +
        "document would silently score OOV")
    scoreImportance(corpus, spark.read.parquet(s"$targetPath/model"),
      spark.read.parquet(s"$rawPath/model"), id, text, ot,
      broadcastModels)
  }

  /** [[importanceResample]] against two [[writeLmModel]] artifacts —
    * [[importanceWeightsWithIndex]] fed through the same portable-hash
    * Bernoulli keep. */
  def importanceResampleWithIndex(corpus: DataFrame, targetPath: String,
      rawPath: String, id: Column, text: Column, scale: Double,
      broadcastModels: Boolean = true): DataFrame =
    sampleByWeight(
      importanceWeightsWithIndex(corpus, targetPath, rawPath, id, text,
        broadcastModels).filter(col("importance").isNotNull),
      col("doc_id"), col("importance"), scale)

  /** Importance RESAMPLING — [[importanceWeights]] fed through the
    * [[sampleByWeight]] portable-hash Bernoulli keep (probability
    * `min(1, importance · scale)`): the deterministic stand-in for the
    * paper's Gumbel-top-k draw (a Gumbel perturbation needs `log`;
    * the hash filter keeps the proportional-to-weight selection with
    * the never-`rand()` reproducibility contract — a rerun or retry
    * keeps exactly the same corpus). Documents with null importance
    * (no target-matched n-gram) are dropped. Selection is a codegen'd
    * filter over the scored frame — no shuffle beyond
    * [[importanceWeights]]' one combine.
    */
  def importanceResample(corpus: DataFrame, target: DataFrame, id: Column,
      text: Column, targetText: Column, scale: Double, order: Int = 2,
      minCount: Long = 1L, broadcastModels: Boolean = true): DataFrame =
    sampleByWeight(
      importanceWeights(corpus, target, id, text, targetText, order,
        minCount, broadcastModels)
        .filter(col("importance").isNotNull),
      col("doc_id"), col("importance"), scale)

  /** Deterministic per-stratum sampling: keep a row iff the portable
    * hash of its key lands under the stratum's rate threshold
    * (`pmod(hash(key), granularity) < rate·granularity`). Hash-based,
    * never `rand()`: the sample is reproducible across runs, engines,
    * and cluster topologies, a rerun or retry keeps exactly the same
    * rows, and the same key samples consistently in every pipeline
    * stage. Zero shuffle — a codegen'd filter over the scan. This is
    * how a 100 TB corpus gets its per-language / per-source mixture
    * weights applied without materializing anything.
    */
  def sampleByStratum(df: DataFrame, stratum: Column, key: Column,
      rates: Seq[(String, Double)], defaultRate: Double = 0.0,
      granularity: Int = 10000): DataFrame = {
    require(granularity > 0, "sampleByStratum: granularity must be positive")
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "sampleByStratum: rates must be in [0, 1]")
    val threshold = rates.foldRight(
      lit(math.round(defaultRate * granularity).toInt): Column) {
      case ((name, rate), rest) =>
        when(stratum === name, lit(math.round(rate * granularity).toInt))
          .otherwise(rest)
    }
    df.filter(
      pmod(portableHash64(key.cast(StringType)), lit(granularity.toLong)) < threshold)
  }

  /** Distribution-matching down-sampler — the data-MIXING operator
    * ([[sampleByStratum]]'s dual: there the caller fixes per-stratum
    * rates; here the caller fixes the target MIX and the rates are
    * DERIVED from the observed counts). Given per-group target weights
    * (e.g. the domain/language proportions a training run wants), keep
    * a deterministic hash-selected subset whose group sizes follow the
    * target distribution at the largest total achievable WITHOUT
    * upsampling any group: scale `S = min_g(n_g / w_g)`, per-group
    * keep-rate `r_g = min(1, w_g·S / n_g)` (the binding group keeps
    * everything; over-represented groups are thinned).
    *
    * Selection is `portableHash64(id) mod buckets < floor(buckets·r_g)`
    * — reproducible across runs, engines, and cluster topologies (never
    * `rand()`: resampling on retry would silently change the corpus).
    * Rows whose group has no weight are dropped (weight 0 semantics).
    *
    * Scale shape: ONE partial-aggregatable count per group (group
    * cardinality = #domains/#languages — small by construction), a
    * driver-free scalar min over that tiny frame, and a broadcast join
    * of the per-group thresholds back onto the corpus — the corpus
    * itself is never shuffled, the filter is a codegen projection.
    */
  def resampleToMix(df: DataFrame, group: Column, id: Column,
      weights: Map[String, Double], buckets: Int = 1 << 20): DataFrame =
    resampleByMass(df, group, id, count(lit(1)), weights, buckets,
      "resampleToMix")

  /** [[resampleToMix]] weighted by TOKENS instead of rows — the mix a
    * training run actually specifies ("30% code, 50% web, 20% books"
    * means token mass, not document count; a corpus whose code
    * documents average 10× the web documents' length would be wildly
    * off-mix under row weighting). Group mass is `Σ tokens` (exact
    * BIGINT), scale `S = min_g(T_g / w_g)`, per-group keep-rate
    * `r_g = min(1, w_g·S / T_g)` — the binding group keeps everything.
    * Selection stays the per-ROW portable hash: within a group it is
    * length-agnostic, so the kept token mass matches the target in
    * expectation with the same reproducibility contract (never
    * `rand()`); same one-tiny-aggregate + broadcast-thresholds plan,
    * the corpus never shuffles.
    */
  def resampleToMixTokens(df: DataFrame, group: Column, id: Column,
      tokens: Column, weights: Map[String, Double],
      buckets: Int = 1 << 20): DataFrame =
    resampleByMass(df, group, id, sum(tokens.cast(LongType)), weights,
      buckets, "resampleToMixTokens")

  private def resampleByMass(df: DataFrame, group: Column, id: Column,
      mass: Column, weights: Map[String, Double], buckets: Int,
      name: String): DataFrame = {
    require(weights.nonEmpty, s"$name: weights must be non-empty")
    require(weights.values.forall(_ > 0),
      s"$name: weights must be positive (omit a group to drop it)")
    require(buckets > 0, s"$name: buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF("__grp", "__w")
    val keyed = df.withColumn("__grp", group)
    // inner join: groups without a weight are dropped by construction
    val counts = keyed.groupBy(col("__grp")).agg(mass.as("__n"))
      .join(broadcast(w), "__grp")
    val scale = counts.agg(min(col("__n") / col("__w")).as("__scale"))
    val thresholds = counts.crossJoin(broadcast(scale))
      .select(col("__grp"),
        floor(lit(buckets.toDouble) *
          least(lit(1.0), col("__w") * col("__scale") / col("__n")))
          .as("__thr"))
    keyed.join(broadcast(thresholds), "__grp")
      .filter(pmod(portableHash64(id.cast(StringType)), lit(buckets.toLong))
        < col("__thr"))
      .drop("__grp", "__thr")
  }

  /** Temperature-smoothed mixture resampling ([[resampleToMix]]'s
    * self-deriving sibling): instead of a caller-fixed target mix, the
    * target weight of each group is its own observed count raised to
    * `alpha` — `w_g = n_g^α` — the multinomial smoothing rule of
    * multilingual pretraining (Lample & Conneau, arXiv:1901.07291 §3.1,
    * published α = 0.5; α = 1 keeps the natural distribution, α → 0
    * approaches uniform). The derived keep-rate collapses to
    * `r_g = (n_min / n_g)^(1−α)`: the SMALLEST group keeps everything
    * and larger groups thin toward a flatter mix — low-resource
    * languages stop drowning.
    *
    * Determinism: selection is the t05/t06 portable-hash filter (never
    * `rand()`). At the published α = 0.5 the weights use `sqrt`, which
    * IEEE-754 requires to be correctly rounded — bit-identical in any
    * engine, so the whole operator is oracle-gated (t24). Other α go
    * through `pow`, which libms round differently in the last ulp; a
    * threshold landing within an ulp of an integer could then flip one
    * bucket between engines (documented; the spec pins α-sweep
    * semantics engine-internally).
    *
    * Scale shape: identical to [[resampleToMix]] — one tiny per-group
    * count, broadcast thresholds, zero-shuffle codegen filter over the
    * corpus.
    */
  def resampleSmoothed(df: DataFrame, group: Column, id: Column,
      alpha: Double = 0.5, buckets: Int = 1 << 20): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"resampleSmoothed: alpha must be in (0, 1], got $alpha")
    require(buckets > 0, "resampleSmoothed: buckets must be positive")
    val keyed = df.withColumn("__grp", group)
    val counts = keyed.groupBy(col("__grp")).agg(count(lit(1)).as("__n"))
    val w = if (alpha == 0.5) sqrt(col("__n").cast(DoubleType))
            else pow(col("__n").cast(DoubleType), lit(alpha))
    val cw = counts.withColumn("__w", w)
    val scale = cw.agg(min(col("__n") / col("__w")).as("__scale"))
    val thresholds = cw.crossJoin(broadcast(scale))
      .select(col("__grp"),
        floor(lit(buckets.toDouble) *
          least(lit(1.0), col("__w") * col("__scale") / col("__n")))
          .as("__thr"))
    keyed.join(broadcast(thresholds), "__grp")
      .filter(pmod(portableHash64(id.cast(StringType)), lit(buckets.toLong))
        < col("__thr"))
      .drop("__grp", "__thr")
  }

  /** BPE-ish subword token count: alphabetic runs are split into ≤4-char
    * chunks (a cheap stand-in for byte-pair merges), digits and other
    * symbols count singly. Portable: regex run extraction + arithmetic.
    */
  def bpeishTokenCount(text: Column): Column = {
    val runs = regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))
    aggregate(runs, lit(0L),
      (acc, r) => acc + ceil(length(r).cast(DoubleType) / 4.0).cast(LongType))
  }

  /** Vocab-driven tokenization: deterministic greedy longest-match
    * segmentation of `text` against a fixed `vocab`, returning the
    * `array<int>` of token ids (0-based vocab index; `-1` = UNK, one
    * code point). The EXACT token source for sequence packing and shard
    * budgets — `size(tokenizeGreedy(text, vocab))` replaces the
    * [[bpeishTokenCount]] approximation wherever the real tokenizer's
    * vocab is known. Zero shuffle: a codegen'd per-row trie walk with
    * the vocab embedded as a plan literal (the broadcast-artifact
    * contract); mirrored token for token by the t27 oracle's recursive
    * greedy walk. See [[expressions.GreedyTokenize]] for the full
    * semantics (longest match, UNK advance, determinism).
    */
  def tokenizeGreedy(text: Column, vocab: Seq[String]): Column =
    expressions.GreedyTokenize(text, vocab)

  /** BPE merge application ([[bpeTrain]]'s encode half): tokenize
    * `text` by splitting each whitespace-separated word into code
    * points and applying `merges` in rank order, each as one
    * left-to-right non-overlapping pass. Returns `array<string>` of
    * token strings in document order. A native codegen'd expression
    * (see [[expressions.BpeEncode]] for the min-rank-repeat
    * implementation and the well-formedness contract) — zero shuffle,
    * merge-count-independent per-word cost.
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    expressions.BpeEncode(text, merges)

  /** BPE tokenizer TRAINING (Sennrich et al., arXiv:1508.07909 §3.2) —
    * the train half of the tokenizer lifecycle: [[bpeTrain]] learns the
    * merge list, [[bpeEncode]] applies it, [[tokenizeGreedy]] consumes
    * a flat vocabulary where a WordPiece-style walk is wanted instead.
    * Classic semantics: start from the corpus word-frequency table with
    * words split into code points; `numMerges` times, count every
    * adjacent symbol pair (weighted by word frequency, overlapping
    * positions counted — the published counting rule), merge the most
    * frequent pair everywhere it occurs, ties broken (count desc, left
    * asc, right asc) so the learned list is deterministic and
    * oracle-replayable. Stops early when no pair remains or the best
    * count falls below `minPairCount` (Sennrich's frequency threshold).
    * Merges never cross word boundaries; no end-of-word marker is
    * appended (the within-word formulation — callers that need
    * boundary-aware vocab can append their own sentinel to `text`).
    *
    * Returns (rank, left, right, merged) with rank 1-based in learned
    * order — the artifact [[bpeEncode]] and [[writeBpeModel]] consume.
    *
    * Scale shape, sized for a 100 TB corpus: the corpus is read ONCE
    * (the word-frequency aggregate — partial-aggregatable, the only
    * corpus-wide shuffle); every training iteration then runs over the
    * cached DISTINCT-WORD table — vocabulary-bound, not corpus-bound
    * (`minWordCount` prunes the hapax tail that dominates open-domain
    * vocabularies, the standard trainer knob). Iteration state is
    * never mutated-and-checkpointed: the current tokenization is
    * re-derived each round by the codegen'd [[bpeEncode]] with the
    * merges learned so far (per-word cost is bounded by word LENGTH,
    * not merge count — a word stops changing once fully merged), so
    * lineage stays flat at any `numMerges`. Per iteration: one scan of
    * the cached word table + one pair-count shuffle whose keys are
    * symbol pairs (tiny) + one `limit(1)` argmax — the only driver
    * state is one row per iteration and the growing merge list
    * (`numMerges` entries, the broadcast-artifact contract).
    */
  def bpeTrain(df: DataFrame, text: Column, numMerges: Int,
      minPairCount: Long = 1L, minWordCount: Long = 1L): DataFrame = {
    require(numMerges >= 1 && numMerges <= (1 << 16),
      s"bpeTrain: numMerges must be in [1, ${1 << 16}], got $numMerges")
    require(minPairCount >= 1L,
      s"bpeTrain: minPairCount must be >= 1, got $minPairCount")
    require(minWordCount >= 1L,
      s"bpeTrain: minWordCount must be >= 1, got $minWordCount")
    val spark = df.sparkSession
    val base = df.select(explode(words(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .filter(col("f") >= minWordCount)
      .persist()
    try {
      val learned = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String)]
      var stop = false
      while (learned.size < numMerges && !stop) {
        // current tokenization, re-derived from the frozen word table:
        // code-point split for round 1, then the merges learned so far
        val syms =
          if (learned.isEmpty) regexp_extract_all(col("w"), lit("."), lit(0))
          else bpeEncode(col("w"), learned.toSeq.map(m => (m._2, m._3)))
        val top = base.select(col("f"), syms.as("s"))
          .filter(size(col("s")) >= 2)
          .select(col("f"), explode(zip_with(
              slice(col("s"), lit(1), size(col("s")) - 1),
              slice(col("s"), lit(2), size(col("s")) - 1),
              (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < minPairCount) stop = true
        else {
          val l = top(0).getString(0)
          val r = top(0).getString(1)
          learned += ((learned.size + 1, l, r, l + r))
        }
      }
      import spark.implicits._
      learned.toSeq.toDF("rank", "left", "right", "merged")
    } finally base.unpersist()
  }

  /** [[bpeTrain]] with INCREMENTAL pair-count maintenance (VERDICT r15
    * #4 — the vocab axis): bit-identical output (t41 shares t36's
    * oracle; BpeSpec pins equality on the tie-break fixtures), but the
    * per-merge cost no longer re-derives the whole vocabulary's
    * tokenization and re-counts every pair. Two frames are maintained
    * across iterations:
    *
    *   - `cur` (tokens array, word frequency) — the current
    *     tokenization of the distinct-word table;
    *   - `counts` (l, r, cnt) — the adjacent-pair counts over `cur`.
    *
    * Per merge: the argmax reads `counts` directly (no recount); only
    * the words actually CONTAINING the chosen pair are re-tokenized
    * (one single-pair left-to-right pass — an `aggregate` fold, not
    * the full merge-list replay), and `counts` is adjusted by the
    * exact ± pair delta of just those words. Since the fraction of
    * words containing merge k's pair falls rapidly with k (pair
    * frequencies are Zipfian), per-merge work SHRINKS as training
    * proceeds, where [[bpeTrain]]'s stays Θ(vocabulary) — the
    * difference between 32k sequential full passes and 32k
    * touched-rows updates. The serial driver loop remains (BPE merges
    * are inherently ordered), as does one `limit(1)` argmax collect
    * per merge.
    *
    * State frames are [[Materialize]]d each round (env-selected local
    * vs reliable checkpoint — the iterative-operator discipline from
    * [[Graph.pageRank]]), so lineage stays flat at any `numMerges`.
    */
  def bpeTrainIncremental(df: DataFrame, text: Column, numMerges: Int,
      minPairCount: Long = 1L, minWordCount: Long = 1L): DataFrame = {
    require(numMerges >= 1 && numMerges <= (1 << 16),
      s"bpeTrainIncremental: numMerges must be in [1, ${1 << 16}]," +
        s" got $numMerges")
    require(minPairCount >= 1L,
      s"bpeTrainIncremental: minPairCount must be >= 1, got $minPairCount")
    require(minWordCount >= 1L,
      s"bpeTrainIncremental: minWordCount must be >= 1, got $minWordCount")
    val spark = df.sparkSession
    def pairsOf(s: Column): Column = zip_with(
      slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
      (l, r) => struct(l.as("l"), r.as("r")))
    // one single-pair left-to-right non-overlapping pass over a token
    // array: fold left, merging whenever the accumulator's last token
    // is `l` and the next is `r` — non-overlap is structural (the
    // merged token l+r can never equal l, so it cannot re-fire)
    def mergeOnce(s: Column, l: String, r: String): Column =
      aggregate(s, array().cast("array<string>"), (acc, t) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) &&
            t === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(t))))
    var cur = Materialize(df.select(explode(words(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .filter(col("f") >= minWordCount)
      .select(regexp_extract_all(col("w"), lit("."), lit(0)).as("s"),
        col("f")))
    var counts = Materialize(cur.filter(size(col("s")) >= 2)
      .select(col("f"), explode(pairsOf(col("s"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("f")).as("cnt")))
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String)]
    var stop = false
    while (learned.size < numMerges && !stop) {
      val top = counts.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) stop = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        learned += ((learned.size + 1, l, r, l + r))
        val hasPair = exists(pairsOf(col("s")),
          p => p("l") === lit(l) && p("r") === lit(r))
        val affected = cur.filter(size(col("s")) >= 2 && hasPair)
        val merged = affected
          .select(mergeOnce(col("s"), l, r).as("s"), col("f"))
        // exact pair-count delta from just the touched words: their
        // old pairs leave (-f), their new pairs enter (+f); everything
        // else is untouched by construction, so counts stays equal to
        // a from-scratch recount at every round
        val delta = affected
          .select(col("f"), explode(pairsOf(col("s"))).as("p"))
          .select(col("p.l").as("l"), col("p.r").as("r"),
            (-col("f")).as("d"))
          .unionByName(merged.filter(size(col("s")) >= 2)
            .select(col("f"), explode(pairsOf(col("s"))).as("p"))
            .select(col("p.l").as("l"), col("p.r").as("r"),
              col("f").as("d")))
          .groupBy(col("l"), col("r")).agg(sum(col("d")).as("d"))
        counts = Materialize(counts.join(delta, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("cnt"), lit(0L)) +
              coalesce(col("d"), lit(0L))).as("cnt"))
          .filter(col("cnt") > 0))
        // the union doubles the partition count every round (untouched
        // parts + merged parts) — coalesce back to the session's
        // parallelism BEFORE materializing or round k runs 32·k tasks
        // per job (measured: the 64-merge point went superlinear)
        cur = Materialize(
          cur.filter(!(size(col("s")) >= 2 && hasPair))
            .unionByName(merged)
            .coalesce(spark.sparkContext.defaultParallelism))
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "left", "right", "merged")
  }

  /** BATCHED BPE training (VERDICT r16 #4 — the production-vocab
    * axis): [[bpeTrainIncremental]] fixed the per-merge DATA term, but
    * each merge was still a serial driver round of ~5 Spark jobs — at
    * a 32k-merge production vocabulary that is ~160k driver-scheduled
    * jobs of pure fixed overhead. This trainer amortizes the heavy
    * per-round work over up to `batch` merges per driver round:
    *
    *   - per round, the top `window = 8 * batch` candidate pairs (by
    *     the Sennrich (count desc, left, right) order) are collected
    *     ONCE, and up to `batch` pairwise SYMBOL-DISJOINT pairs are
    *     greedily selected in that order (a pair sharing a symbol
    *     with an earlier selection is skipped, the walk continues);
    *   - disjoint merges touch disjoint token positions, so they
    *     commute and ONE touched-words pass applies the whole batch
    *     (the fold applies them in rank order — equal by
    *     disjointness), with the pair-count frame adjusted by the
    *     batch's exact ± delta exactly as the incremental trainer
    *     does per single merge.
    *
    * Driver rounds fall from `numMerges` to ~`numMerges / batch`
    * (conflict-heavy rounds select fewer). At `batch = 1` the
    * selection degenerates to the global argmax and the output is
    * BIT-EQUAL to [[bpeTrain]] / [[bpeTrainIncremental]] (BpeSpec
    * pins it). At `batch > 1` the semantics are the DOCUMENTED rule
    * above — deliberately not always identical to sequential Sennrich
    * (a skipped conflicting pair can out-rank a selected one after
    * the earlier merge lands; exact sequential fidelity would forfeit
    * the batching win) — and the t46 oracle replays the batched rule
    * itself: per round, the windowed candidate ranking, the greedy
    * disjoint selection, and the per-selection fold, truncated to
    * `numMerges` total.
    */
  def bpeTrainBatched(df: DataFrame, text: Column, numMerges: Int,
      batch: Int, minPairCount: Long = 1L,
      minWordCount: Long = 1L): DataFrame = {
    require(numMerges >= 1 && numMerges <= (1 << 16),
      s"bpeTrainBatched: numMerges must be in [1, ${1 << 16}]," +
        s" got $numMerges")
    require(batch >= 1 && batch <= 256,
      s"bpeTrainBatched: batch must be in [1, 256], got $batch")
    require(minPairCount >= 1L,
      s"bpeTrainBatched: minPairCount must be >= 1, got $minPairCount")
    require(minWordCount >= 1L,
      s"bpeTrainBatched: minWordCount must be >= 1, got $minWordCount")
    val spark = df.sparkSession
    val window = 8 * batch
    def pairsOf(s: Column): Column = zip_with(
      slice(s, lit(1), size(s) - 1), slice(s, lit(2), size(s) - 1),
      (l, r) => struct(l.as("l"), r.as("r")))
    var cur = Materialize(df.select(explode(words(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .filter(col("f") >= minWordCount)
      .select(regexp_extract_all(col("w"), lit("."), lit(0)).as("s"),
        col("f")))
    var counts = Materialize(cur.filter(size(col("s")) >= 2)
      .select(col("f"), explode(pairsOf(col("s"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("f")).as("cnt")))
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String)]
    var stop = false
    while (learned.size < numMerges && !stop) {
      val top = counts.filter(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(window).collect()
      val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val usedSyms = scala.collection.mutable.Set.empty[String]
      for (row <- top if sel.size < batch) {
        val l = row.getString(0)
        val r = row.getString(1)
        if (!usedSyms(l) && !usedSyms(r)) {
          sel += ((l, r)); usedSyms += l; usedSyms += r
        }
      }
      if (sel.isEmpty) stop = true
      else {
        sel.foreach { case (l, r) =>
          learned += ((learned.size + 1, l, r, l + r))
        }
        // rank-order application of the batch in ONE pass over the
        // word table — disjoint merges commute, so the sequential
        // composition equals simultaneous application; the native
        // [[expressions.BpeApply]] kernel runs the per-merge
        // left-to-right passes as a tight loop (the equivalent
        // `batch` nested aggregate() HOFs measured ~2.7× per-round).
        // An UNTOUCHED word maps to itself, so the next round's word
        // table is just this projection — no exists() prescreen, no
        // touched/untouched split-and-union, no partition-doubling
        // coalesce (all three were per-round costs of the
        // single-merge incremental form).
        val applied = Materialize(cur.select(col("s"), col("f"),
          expressions.BpeApply(col("s"), sel.toSeq).as("s2")))
        // exact pair-count delta from just the CHANGED words: their
        // old pairs leave (-f), their new pairs enter (+f)
        val affected = applied.filter(!(col("s") === col("s2")))
        val delta = affected
          .select(col("f"), explode(pairsOf(col("s"))).as("p"))
          .select(col("p.l").as("l"), col("p.r").as("r"),
            (-col("f")).as("d"))
          .unionByName(affected.filter(size(col("s2")) >= 2)
            .select(col("f"), explode(pairsOf(col("s2"))).as("p"))
            .select(col("p.l").as("l"), col("p.r").as("r"),
              col("f").as("d")))
          .groupBy(col("l"), col("r")).agg(sum(col("d")).as("d"))
        counts = Materialize(counts.join(delta, Seq("l", "r"), "full_outer")
          .select(col("l"), col("r"),
            (coalesce(col("cnt"), lit(0L)) +
              coalesce(col("d"), lit(0L))).as("cnt"))
          .filter(col("cnt") > 0))
        cur = applied.select(col("s2").as("s"), col("f"))
      }
    }
    import spark.implicits._
    // the final round may overshoot numMerges (it selects a full
    // batch); the RESULT is truncated — state overshoot is harmless
    // because training stops here
    learned.take(numMerges).toSeq.toDF("rank", "left", "right", "merged")
  }

  /** Persist a trained BPE merge list — the [[writeLmModel]] pattern
    * for the tokenizer: train once on the trusted corpus, encode every
    * increment against the artifact. The training knobs ride INSIDE
    * the artifact (`path/meta`) so a consumer can audit what produced
    * the merges; the merges themselves live at `path/model` ordered by
    * rank.
    */
  def writeBpeModel(df: DataFrame, text: Column, path: String,
      numMerges: Int, minPairCount: Long = 1L,
      minWordCount: Long = 1L): Unit = {
    bpeTrain(df, text, numMerges, minPairCount, minWordCount)
      .write.mode("overwrite").parquet(s"$path/model")
    df.sparkSession.range(1)
      .select(lit(numMerges).as("num_merges"),
        lit(minPairCount).as("min_pair_count"),
        lit(minWordCount).as("min_word_count"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Read a [[writeBpeModel]] artifact back as the rank-ordered merge
    * list [[bpeEncode]] takes. The collect is bounded by the artifact's
    * own `num_merges` (driver state = the merge list, the same
    * broadcast-artifact contract as the PQ codebooks).
    */
  def readBpeModel(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(s"$path/model")
      .orderBy(col("rank"))
      .select(col("left"), col("right"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))

  /** [[bpeEncode]] against a [[writeBpeModel]] artifact — the
    * daily-increment shape: the increment is encoded live, the merge
    * list comes entirely from the artifact. Result bit-identical to
    * encoding with the in-session trained list (t38 shares t37's
    * oracle). Appends a `bpe_tokens` array column.
    */
  def bpeEncodeWithModel(df: DataFrame, text: Column,
      path: String): DataFrame =
    df.withColumn("bpe_tokens",
      bpeEncode(text, readBpeModel(df.sparkSession, path)))

  /** Quality heuristics (length / punctuation / stopword ratios), packed
    * into one struct column. All ratios are int/int divisions in double —
    * bit-identical across engines.
    */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text)
    val toks = words(text)
    val nWords = size(toks)
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val nStop = size(filter(toks, w => w.isInCollection(stop)))
    val nPunct = length(text) - length(regexp_replace(text, "[\\.,;:!\\?]", ""))
    struct(
      nChars.cast(LongType).as("n_chars"),
      nWords.cast(LongType).as("n_words"),
      (nChars.cast(DoubleType) / nWords).as("avg_word_len"),
      (nStop.cast(DoubleType) / nWords).as("stopword_ratio"),
      (nPunct.cast(DoubleType) / nChars).as("punct_ratio"))
  }

  /** Scalar quality score in [0,1]: rewards mid-length docs with a sane
    * stopword rate, penalizes punctuation soup.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f("n_words").cast(DoubleType) / 50.0, lit(1.0))
    val stopScore = least(f("stopword_ratio") * 5.0, lit(1.0))
    val punctPenalty = least(f("punct_ratio") * 10.0, lit(1.0))
    (lenScore * 0.5 + stopScore * 0.3 + (lit(1.0) - punctPenalty) * 0.2)
  }

  /** The Gopher stop-word presence set (Rae et al., rule 8). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** C4 cleaning filter (Raffel et al. 2020, arXiv:1910.10683 §2.2) —
    * the published line+page heuristics behind the C4 corpus, as one
    * zero-shuffle codegen projection. Line level: keep only lines that
    * end in a terminal punctuation mark (`.` `!` `?` `"`), contain at
    * least `minWordsPerLine` words, and do not mention "javascript"
    * (case-insensitive). Page level: drop any page with fewer than
    * `minLines` surviving lines, any page containing the phrase
    * "lorem ipsum" (case-insensitive), and any page containing a curly
    * brace. (The paper's bad-words-list rule is a pluggable wordlist
    * concern — compose with [[regexScan]]; its three-sentence dedup is
    * [[graft.functions.Dedup.dedupLines]].) Returns a struct:
    *   (text, n_kept_lines, has_lorem_ipsum, has_brace, pass)
    * with `text` the surviving lines rejoined in order — usable even
    * when `pass` is false (the caller chooses page- vs line-level
    * enforcement). Per-document arithmetic only — embarrassingly
    * parallel, no shuffle, no UDF.
    */
  def c4Filters(text: Column, sep: String = "\n",
      minWordsPerLine: Int = 5, minLines: Int = 3): Column = {
    val lines = split(text, java.util.regex.Pattern.quote(sep))
    // `def`, not `val`: a lambda-bearing Column reused twice in one
    // projection shares NamedLambdaVariable ids between its two
    // occurrences; when a caller feeds this function a computed input
    // that itself contains higher-order functions, optimizer inlining
    // can collide those shared ids across nesting depths and bind a
    // lambda variable to the WRONG enclosing lambda (observed: the
    // size() instance counting words of the outer transform's element
    // instead of this filter's line). A fresh tree per use keeps every
    // instance self-consistent.
    def kept = filter(lines, l => {
      val t = rtrim(l)
      (t.endsWith(".") || t.endsWith("!") || t.endsWith("?") ||
        t.endsWith("\"")) &&
        // trim first: splitting an edge-whitespace line on \s+ yields
        // empty edge tokens that would inflate the word count
        size(split(trim(l), "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("javascript")
    })
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    struct(
      concat_ws(sep, kept).as("text"),
      size(kept).cast(LongType).as("n_kept_lines"),
      hasLorem.as("has_lorem_ipsum"),
      hasBrace.as("has_brace"),
      (size(kept) >= minLines && !hasLorem && !hasBrace).as("pass"))
  }

  /** Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446
    * Appendix A1.1) — the published web-corpus filter, as one
    * zero-shuffle codegen projection. Returns a struct with every rule
    * input and the combined verdict:
    *   (n_words, mean_word_len, symbol_word_ratio, bullet_line_ratio,
    *    ellipsis_line_ratio, alpha_word_ratio, n_stopwords, pass)
    * where pass = word count within [minWords, maxWords], mean word
    * length within [minMeanWordLen, maxMeanWordLen], '#' and ellipsis
    * counts per word EACH ≤ maxSymbolWordRatio (the paper's
    * per-symbol rule; the struct reports the max of the two ratios),
    * bullet-starting lines ≤
    * maxBulletLineRatio, ellipsis-ending lines ≤ maxEllipsisLineRatio,
    * words containing an alphabetic character ≥ minAlphaWordRatio, and
    * at least minStopwords [[GopherStopwords]] occurrences — the
    * paper's published defaults throughout. Distinct from
    * [[qualityScore]] (a soft 0-1 ranking signal): this is the hard
    * keep/drop gate pipelines run first.
    *
    * Per-document arithmetic only — embarrassingly parallel at any
    * corpus size, no shuffle, no UDF.
    */
  def gopherRules(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwords: Int = 2): Column = {
    // tokenize the EDGE-STRIPPED text: splitting "  a b " on \s+ yields
    // a phantom empty first token that inflates n_words and deflates
    // every per-word ratio — the same edge-word strip the
    // gopherRepetition kernel applies (RepetitionMetrics.stripWs) and
    // c4Filters' per-line trim, now consistent across the family.
    // Published Gopher tokenization has no empty words.
    val toks = words(regexp_replace(text, "^\\s+|\\s+$", ""))
    val nWords = size(toks)
    // every lambda-bearing column below is a `def`, not a `val`: a
    // reused lambda Column shares NamedLambdaVariable ids between its
    // occurrences, and optimizer inlining under a caller's own
    // higher-order functions can collide those ids across nesting
    // depths (see [[c4Filters]] for the observed failure); a fresh
    // tree per use keeps every instance self-consistent
    def meanLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
      .cast(DoubleType) / nWords
    // the paper applies the 0.1 threshold to EACH symbol separately
    // ("either the hash symbol or the ellipsis"), so the reported
    // ratio is the max of the two per-symbol ratios — a document fails
    // iff at least one symbol alone exceeds the cap, never because the
    // two jointly do
    val nEllipsis =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3 +
        (length(text) - length(regexp_replace(text, "…", "")))
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val symbolRatio =
      greatest(nEllipsis.cast(DoubleType) / nWords,
        nHash.cast(DoubleType) / nWords)
    val lines = split(text, "\n")
    val nLines = size(lines)
    def nBullet = size(filter(lines, l => {
      val t = ltrim(l)
      t.startsWith("•") || t.startsWith("-") || t.startsWith("*")
    }))
    def bulletRatio = nBullet.cast(DoubleType) / nLines
    def nEllLine = size(filter(lines, l => {
      val t = rtrim(l)
      t.endsWith("...") || t.endsWith("…")
    }))
    def ellipsisRatio = nEllLine.cast(DoubleType) / nLines
    def alphaRatio = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast(DoubleType) / nWords
    def nStop = size(filter(toks, w => w.isInCollection(GopherStopwords)))
    struct(
      nWords.cast(LongType).as("n_words"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_word_ratio"),
      bulletRatio.as("bullet_line_ratio"),
      ellipsisRatio.as("ellipsis_line_ratio"),
      alphaRatio.as("alpha_word_ratio"),
      nStop.cast(LongType).as("n_stopwords"),
      (nWords >= minWords && nWords <= maxWords &&
        meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
        symbolRatio <= maxSymbolWordRatio &&
        bulletRatio <= maxBulletLineRatio &&
        ellipsisRatio <= maxEllipsisLineRatio &&
        alphaRatio >= minAlphaWordRatio &&
        nStop >= minStopwords).as("pass"))
  }

  /** Language-marker table for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "nicht"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "que", "los"),
    "zh" -> Seq("的", "是", "不"))

  /** Heuristic language ID: argmax over marker-word hit counts, with a
    * deterministic tie-break on language code ("und" = undetermined when
    * nothing matches). Pure expression — no dictionary shuffle, no UDF.
    */
  def langId(text: Column): Column = {
    val toks = words(text)
    val scored = langMarkers.map { case (lang, markers) =>
      val hits = size(filter(toks, w => w.isInCollection(markers)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // struct comparison is lexicographic: max by (hits, then lang), so
    // equal-hit languages deterministically pick the last alphabetically;
    // all-zero → "und"
    val best = greatest(scored: _*)
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Per-line language segmentation: [[langId]] applied line-by-line,
    * contiguous same-language runs grouped into segments — the
    * polyglot-document splitter (web pages routinely interleave
    * languages; a monolingual filter at doc granularity either drops
    * the whole page or keeps the contamination, while segments let the
    * pipeline keep exactly the lines in the target language). Returns
    * one row per (doc_id, seg_id): predicted language, line count,
    * first/last line numbers (0-based).
    *
    * Scale shape: the line explode and per-line langId are
    * zero-shuffle projections; the run-grouping is ONE shuffle on
    * doc_id (a lag + running-sum window, partition-bounded by the
    * longest single document, never corpus-wide).
    */
  def lineLanguageSegments(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("line_no"))
    df.select(id.as("doc_id"),
        posexplode(split(text, "\n")).as(Seq("line_no", "line")))
      .select(col("doc_id"), col("line_no"), langId(col("line")).as("lang_pred"))
      .withColumn("__chg",
        when(lag(col("lang_pred"), 1).over(w).isNull ||
          lag(col("lang_pred"), 1).over(w) =!= col("lang_pred"), 1L)
          .otherwise(0L))
      .withColumn("seg_id", sum(col("__chg")).over(w))
      .groupBy(col("doc_id"), col("seg_id"), col("lang_pred"))
      .agg(count(lit(1)).as("n_lines"),
        min(col("line_no")).as("first_line"),
        max(col("line_no")).as("last_line"))
  }

  /** Feature-hashed bag-of-words vector (the "hashing trick" —
    * Weinberger et al., ICML 2009, public): component i is the signed
    * count of words hashing to bucket i, with the bucket from
    * [[portableHash64]] mod `dims` and the ±1 sign from the parity of
    * md5 hex digit 15 (an independent bit of the same digest) — the
    * sign trick that makes collisions cancel in expectation, keeping
    * hashed inner products unbiased estimates of the true
    * bag-of-words inner product. The no-model text→vector bridge: its
    * output feeds every embedding-side operator here (cosine near-dup,
    * ANN, clustering) without a trained encoder, and two engines
    * produce bit-identical vectors (md5-portable, exact integers).
    *
    * ZERO shuffle — a pure per-row fold. Hash work is hoisted so each
    * word is digested exactly ONCE: one pass maps tokens to their
    * (bucket, sign) pair from a single md5 (bucket from hex digits
    * 1–14, sign from digit 15 — both bits of the same digest), then one
    * fold scatters the pairs into a dims-length accumulator. Cost is
    * O(words) digests + O(words·dims) long compares/adds (dims is small
    * by construction; the hashing trick's point is a fixed low
    * dimension) — the naive per-dimension refold costs 2·words·dims
    * digests, a 2·dims× constant-factor tax at the same output.
    * Lambda-bearing columns are `def`s per the [[gopherRules]]
    * collision rule.
    */
  def hashEmbed(text: Column, dims: Int = 16): Column = {
    require(dims > 0, "hashEmbed: dims must be positive")
    def toks = transform(transform(words(text), w => md5(w)), h =>
      struct(
        pmod(conv(substring(h, 1, 14), 16, 10).cast(LongType),
          lit(dims.toLong)).as("b"),
        when(conv(substring(h, 15, 1), 16, 10).cast(LongType) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("s")))
    aggregate(toks, array_repeat(lit(0L), dims),
      (acc, tk) => transform(acc, (v, i) =>
        v + when(tk.getField("b") === i.cast(LongType), tk.getField("s"))
          .otherwise(0L)))
  }

  /** Document fingerprint: md5 over the whitespace-normalized, lowercased,
    * punctuation-stripped text — the canonical exact-dedup key that is
    * robust to formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Highest element frequency in a SORTED array, computed as the
    * longest equal-run: a single left fold over the array (the
    * `aggregate` higher-order function), so the whole computation stays
    * a per-row projection — no explode, no (doc, term) shuffle. Empty
    * arrays fold to 0.
    */
  private def maxRunLength(sortedArr: Column): Column =
    aggregate(sortedArr,
      struct(lit(null).cast(StringType).as("prev"),
        lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && x === acc("prev"),
          acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Gopher REPETITION rules (Rae et al. 2021, arXiv:2112.11446 A1.1
    * Table A1) — the other half of the published filter next to
    * [[gopherRules]]: drop documents dominated by repeated content.
    * Per document, with the paper's thresholds:
    *   - duplicate LINE fraction ≤ 0.30 and duplicate-line CHARACTER
    *     fraction ≤ 0.20 (lines are `sep`-delimited; pass a paragraph
    *     separator for the paper's paragraph variants);
    *   - TOP word-n-gram character fraction, n = 2/3/4 ≤ 0.20/0.18/0.16
    *     (count × n-gram length over document characters; ties on count
    *     break to the byte-order-smallest n-gram);
    *   - DUPLICATE word-n-gram character fraction, n = 5..10 ≤
    *     0.15/0.14/0.13/0.12/0.11/0.10, counting every occurrence
    *     beyond the first (published implementations differ on overlap
    *     handling; this definition — repeat-occurrence character mass
    *     over document characters — is exact, deterministic, and
    *     engine-portable).
    * Returns (doc_id, dup_line_frac, dup_line_char_frac,
    * top_{2,3,4}gram_char_frac, dup_{5..10}gram_char_frac, pass).
    *
    * Computed by the fused native
    * [[graft.functions.expressions.RepetitionMetrics]] expression —
    * one compiled pass per document instead of nine materialized,
    * sorted, interpreted-lambda gram arrays (measured 6.2× on the t18 gate
    * at sf0.1). Zero shuffle either way: a pure map stage over the scan at
    * any corpus size, like [[repetitionStats]]. Zero-character
    * documents score 0 everywhere (and therefore pass).
    */
  def gopherRepetition(df: DataFrame, id: Column, text: Column,
      sep: String = "\n"): DataFrame = {
    import graft.functions.expressions.{RepetitionMetrics => RM}
    val fields =
      Seq("dup_line_frac", "dup_line_char_frac") ++
        RM.TopNs.map(n => s"top_${n}gram_char_frac") ++
        RM.DupNs.map(n => s"dup_${n}gram_char_frac") :+ "pass"
    df.select(id.as("doc_id"), RM(text, sep).as("__m"))
      .select(col("doc_id") +: fields.map(f => col(s"__m.$f").as(f)): _*)
  }

  /** Gopher-style repetition statistics (Rae et al. 2021's quality
    * rules): per document, the distinct-word ratio, the fraction of
    * words taken by the single most frequent word, and the fraction of
    * bigrams taken by the most frequent bigram — the standard signals
    * for dropping looped/boilerplate documents from a training corpus.
    *
    * Entirely per-row arithmetic: words and bigrams are materialized
    * array columns (the [[wordShingles]] HOF rule), top frequencies are
    * longest-runs over locally sorted copies ([[maxRunLength]]), and
    * every ratio is an exact-integer IEEE division — ZERO shuffle, so
    * at 100 TB this is a pure map stage over the scan, and the result
    * is bit-identical in any engine. `top_bigram_frac` is null for
    * single-word documents (no bigrams exist).
    */
  def repetitionStats(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), words(text).as("__w"))
      .select(col("doc_id"), col("__w"),
        wordShingles(col("__w"), 2).as("__b"))
      .select(
        col("doc_id"),
        size(col("__w")).cast(LongType).as("n_words"),
        (size(array_distinct(col("__w"))).cast(DoubleType)
          / size(col("__w")).cast(DoubleType)).as("distinct_ratio"),
        (maxRunLength(array_sort(col("__w"))).cast(DoubleType)
          / size(col("__w")).cast(DoubleType)).as("top_word_frac"),
        when(size(col("__b")) > 0,
          maxRunLength(array_sort(col("__b"))).cast(DoubleType)
            / size(col("__b")).cast(DoubleType)).as("top_bigram_frac"))

  /** Deterministic contiguous sequence packing: assign each document a
    * training-batch bin so every bin holds ~`budget` tokens — the
    * context-window packing step of an LLM data pipeline. Documents are
    * laid out in `(stratum, order)` order and a document's bin is the
    * bin its START offset falls in (`floor(cumBefore / budget)`), so
    * assignment is greedy-contiguous: deterministic, rerun-stable, and
    * reproducible in any engine (one window cumsum + one IEEE floor
    * division of exact integers). A document longer than `budget`
    * straddles bins and still gets exactly one (its start bin) —
    * packers that split documents should explode on this output.
    *
    * One shuffle, on `stratum` (the same shard key real packers use —
    * packing is per-shard, never global: a single global order would
    * serialize the corpus through one partition). `order` must be
    * unique per stratum for determinism (doc_id, not a score with
    * ties). Returns the input plus a `bin` column.
    */
  def packSequences(df: DataFrame, stratum: Column, order: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(order)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__cum", sum(tokens.cast(LongType)).over(w))
      .withColumn("bin",
        floor((col("__cum") - tokens.cast(LongType)).cast(DoubleType)
          / budget).cast(LongType))
      .drop("__cum")
  }

  /** Packing-efficiency report for a [[packChunks]] layout (t47) —
    * the per-stratum data card a training launcher reads before
    * committing a corpus to a run: sequence count, span count,
    * document count, how many documents SPLIT across sequence
    * boundaries (each split is an attention-mask segment boundary the
    * loader must emit), and the padding the layout costs —
    * concat-and-chunk's selling point is that ONLY each stratum's
    * final partial sequence pads, so `pad_tokens` is
    * `n_chunks·seqLen − total_tokens` per stratum (< seqLen by
    * construction; the whole-document [[packSequences]] layout pads
    * every bin's tail instead). One partial-aggregatable pass over
    * the span table — map-side combined, no window.
    */
  def chunkStats(df: DataFrame, stratum: Column, order: Column,
      tokens: Column, seqLen: Long): DataFrame = {
    val spans = packChunks(df, stratum, order, tokens, seqLen)
    spans.groupBy(stratum)
      .agg(
        (max(col("chunk_id")) + 1L).as("n_chunks"),
        count(lit(1)).as("n_spans"),
        countDistinct(order).as("n_docs"),
        // a split document's every span is partial (strictly shorter
        // than the document), so distinct-ids-with-a-partial-span
        // counts exactly the boundary-straddling documents
        countDistinct(when(
          col("n_span_tokens") < tokens.cast(LongType), order))
          .as("n_split_docs"),
        ((max(col("chunk_id")) + 1L) * seqLen -
          sum(col("n_span_tokens"))).as("pad_tokens"))
  }

  /** Concat-and-chunk sample packing (t43) — the GPT-style batch
    * assembly step [[packSequences]] deliberately is not: documents
    * concatenate in `order` within each stratum into one token
    * stream, the stream is cut into fixed `seqLen`-token training
    * sequences, and documents SPLIT across sequence boundaries
    * (packSequences assigns whole documents to budget bins; this
    * produces the per-sequence span table a training loader uses to
    * assemble fixed-length batches with document-boundary attention
    * masks). Output: one row per (document × sequence) overlap —
    * (stratum, chunk_id, doc_id, doc_offset, chunk_offset,
    * n_span_tokens): tokens `[doc_offset, doc_offset+n_span_tokens)`
    * of the document land at `[chunk_offset, …)` of sequence
    * `chunk_id`. Every sequence except each stratum's last is exactly
    * `seqLen` tokens of coverage; every document's spans partition its
    * tokens (spec-pinned invariants). Zero-token documents contribute
    * nothing.
    *
    * All arithmetic is exact integer (window cumsum, `div`, min/max),
    * so the layout is rerun-stable and engine-replayable (the t12
    * determinism contract). One shuffle, on `stratum` — packing is
    * per-shard like every real loader; `order` must be unique per
    * stratum. Row multiplication is bounded by
    * `ceil(tokens/seqLen) + 1` spans per document.
    */
  def packChunks(df: DataFrame, stratum: Column, order: Column,
      tokens: Column, seqLen: Long): DataFrame =
    packChunksFrom(df, stratum, order, tokens, seqLen, carry = None)

  /** [[packChunks]] continued from a PER-STRATUM token carry — the
    * O(increment) growth form (the [[graft.functions.Curation]]
    * appendShards carry contract applied to the sequence grid): the
    * increment's streams start at `carry.cum_tokens` instead of 0, so
    * under the in-order contract (increment order keys follow
    * everything already packed) the union of per-increment span
    * tables is BIT-IDENTICAL to the one-shot [[packChunks]] over all
    * rows (t44 shares t43's oracle). The carry to pass next time is
    * this increment's per-stratum token sum added to the current
    * carry. A boundary-straddling sequence legitimately receives
    * spans from both increments — the grid is global, the work is
    * per-increment.
    *
    * `carry` columns: (stratum, cum_tokens); strata absent from it
    * start at 0. It is broadcast (strata-bound, tiny by contract).
    */
  def packChunksFrom(df: DataFrame, stratum: Column, order: Column,
      tokens: Column, seqLen: Long, carry: Option[DataFrame]): DataFrame = {
    require(seqLen > 0, "packChunks: seqLen must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(order)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val L = lit(seqLen)
    val based = carry.fold(df.withColumn("__base", lit(0L))) { c =>
      df.join(broadcast(c.select(stratum.as("__cstr"),
          col("cum_tokens").cast(LongType).as("__base"))),
          stratum === col("__cstr"), "left")
        .withColumn("__base", coalesce(col("__base"), lit(0L)))
        .drop("__cstr")
    }
    based
      .withColumn("__cum",
        col("__base") + sum(tokens.cast(LongType)).over(w))
      .withColumn("__start", col("__cum") - tokens.cast(LongType))
      .filter(tokens.cast(LongType) > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"__start div $seqLen"),
        expr(s"(__cum - 1) div $seqLen"))))
      .withColumn("doc_offset",
        greatest(lit(0L), col("chunk_id") * L - col("__start")))
      .withColumn("chunk_offset",
        greatest(lit(0L), col("__start") - col("chunk_id") * L))
      .withColumn("n_span_tokens",
        least((col("chunk_id") + 1) * L, col("__cum")) -
          greatest(col("chunk_id") * L, col("__start")))
      .drop("__cum", "__start", "__base")
  }

  /** Corpus-level vocabulary table: the `topN` terms by corpus term
    * frequency with document frequency, frequency rank, and CUMULATIVE
    * coverage (fraction of all corpus tokens a vocabulary truncated at
    * this rank would cover) — the table a tokenizer/vocab budget
    * decision reads ("32k entries cover 97.4% of tokens"). Ranking ties
    * break on the term text; coverage is one IEEE division of exact
    * integer sums (the t09 convention — engine-portable, no libm).
    *
    * Scale shape: ONE shuffle for the (term → tf, df) aggregate
    * (map-side combined), a TakeOrdered top-N (never a global sort),
    * a broadcast scalar total, and a running sum over the topN rows
    * only — the single-partition window is bounded by the vocabulary
    * BUDGET (thousands), not the corpus vocabulary, so it is
    * driver-sized at any corpus scale.
    */
  def vocabCoverage(df: DataFrame, id: Column, text: Column,
      topN: Int): DataFrame = {
    require(topN > 0, "vocabCoverage: topN must be positive")
    val w = df.select(id.as("__doc"), explode(words(text)).as("term"))
    val stats = w.groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("__doc")).as("df"))
    val total = stats.agg(sum(col("tf")).as("__total"))
    val top = stats.orderBy(col("tf").desc, col("term")).limit(topN)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("tf").desc, col("term"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(win).cast(IntegerType))
      .withColumn("coverage",
        sum(col("tf")).over(win).cast(DoubleType) / col("__total"))
      .select(col("rank"), col("term"), col("tf"), col("df"), col("coverage"))
  }

  /** Corpus-relative word-rank quality score — the integer-exact proxy
    * for the CCNet-style language-model quality filter
    * (arXiv:1911.00359 uses LM perplexity; log-probabilities are libm
    * floats that drift across engines, so this uses the frequency RANK
    * of each word instead): every vocabulary word gets its dense rank
    * by corpus frequency (rank 1 = most frequent, ties broken by the
    * word for determinism), and a document scores the MEAN RANK of its
    * word occurrences. Boilerplate- and stopword-heavy documents score
    * low; rare-token soup (the classic spam/garble signature) scores
    * high; the useful middle survives a two-sided [[quantileTrim]].
    * Exact integer sums; the single final division is one IEEE op,
    * bit-identical on any engine (the `dsum` discipline).
    *
    * Returns (doc_id, n_words, rank_sum, mean_rank).
    *
    * Scale shape: word explode + one vocab aggregate + the rank join
    * (shuffles on the word — bounded by corpus token count) + one
    * doc aggregate. The rank itself is a windowed sort of the VOCAB
    * (no partition key — like [[vocabCoverage]] the sort is
    * vocabulary-bounded, ~10⁷ rows for a word vocab at any corpus
    * size, a rounding error next to the corpus-bounded stages; for
    * sub-word/n-gram vocabularies swap in a sort + zipWithIndex).
    */
  def wordRankScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = df.select(id.as("doc_id"), explode(words(text)).as("w"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("w"))
    val ranked = w.groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", dense_rank().over(win).cast(LongType))
      .select(col("w"), col("rank"))
    w.join(ranked, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("rank")).as("rank_sum"))
      .withColumn("mean_rank",
        col("rank_sum").cast(DoubleType) / col("n_words"))
  }

  /** CCNet-style quality tiering (Wenzek et al., arXiv:1911.00359 §4.3,
    * public): partition the corpus into `head` / `middle` / `tail` by
    * corpus quantiles of a per-document quality score — the paper cuts
    * on KenLM perplexity at the 1/3 and 2/3 quantiles so downstream
    * training can weight or drop tiers; here the score is the
    * integer-exact [[wordRankScore]] (its documented CCNet LM-filter
    * proxy: low mean corpus-frequency rank = common-vocabulary text →
    * `head`, high = rare-token garble → `tail`).
    *
    * Cutoffs are EXACT interpolated percentiles of the score
    * distribution (`percentile`, bit-equal to DuckDB's `quantile_cont`
    * — the [[quantileTrim]] pattern): ONE small corpus-wide aggregate
    * broadcast back to the scored frame, so no global sort and no
    * single-partition window anywhere. Ties at a cutoff all take the
    * lower tier (`<=` comparisons, deterministic).
    *
    * The scored frame feeds BOTH the cutoff aggregate and the output
    * projection, and its producer carries a corpus aggregate + rank
    * join Spark has nothing to reuse for — so it goes through the
    * [[Materialize]] seam once (`materialize = false` to opt out and
    * persist at the caller's own boundary).
    *
    * Returns (doc_id, n_words, rank_sum, mean_rank, tier).
    */
  def qualityTiers(df: DataFrame, id: Column, text: Column,
      cut1: Double = 1.0 / 3, cut2: Double = 2.0 / 3,
      materialize: Boolean = true): DataFrame = {
    require(cut1 > 0 && cut2 < 1 && cut1 <= cut2,
      s"qualityTiers: need 0 < cut1 <= cut2 < 1, got ($cut1, $cut2)")
    val scored0 = wordRankScore(df, id, text)
    val scored = if (materialize) Materialize(scored0) else scored0
    val bounds = scored.agg(
      percentile(col("mean_rank"), lit(cut1)).as("__c1"),
      percentile(col("mean_rank"), lit(cut2)).as("__c2"))
    scored.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_words"), col("rank_sum"),
        col("mean_rank"),
        when(col("mean_rank") <= col("__c1"), lit("head"))
          .when(col("mean_rank") <= col("__c2"), lit("middle"))
          .otherwise(lit("tail")).as("tier"))
  }

  /** Sliding word-window chunking: split each document into
    * `window`-token chunks advancing by `stride` tokens (overlap =
    * `window - stride`) — the step that turns raw documents into
    * bounded-length pieces for embedding / context-window training, the
    * inverse concern of [[packSequences]] (which bins whole documents
    * UP to a budget; this cuts documents DOWN to one). Chunk count per
    * document is `max(1, ceil((n - window) / stride) + 1)` so every
    * token is covered and a short document still yields its one chunk.
    *
    * Returns (doc_id, chunk_id, chunk_text, n_tokens), `chunk_id`
    * 0-based within the document. ZERO shuffle: tokenize, a per-row
    * `sequence` of chunk starts, one `explode`, and `slice`/
    * `array_join` projections — all inside whole-stage codegen; output
    * rows ≈ input tokens / stride, so the operator is a map-side
    * row-multiplier that parallelizes with the scan at any corpus
    * size. The chunk-count arithmetic is one IEEE double division of
    * small exact integers, bit-reproducible across engines (the d14/t09
    * convention).
    */
  def chunkDocuments(df: DataFrame, id: Column, text: Column,
      window: Int, stride: Int): DataFrame = {
    require(window > 0, "chunkDocuments: window must be positive")
    require(stride > 0 && stride <= window,
      "chunkDocuments: need 0 < stride <= window")
    val nc = greatest(lit(1),
      floor((col("__n") - window + stride - 1).cast(DoubleType) / stride)
        .cast(IntegerType) + 1)
    df.select(id.as("doc_id"), words(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("chunk_id", explode(sequence(lit(0), nc - 1)))
      .select(col("doc_id"), col("chunk_id"),
        array_join(
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(window)),
          " ").as("chunk_text"),
        least(lit(window), col("__n") - col("chunk_id") * stride)
          .cast(IntegerType).as("n_tokens"))
  }

  /** Keep rows whose `value` lies inside the stratum's
    * [lo-quantile, hi-quantile] band (inclusive) — the outlier-trimming
    * quality filter ("drop the shortest 10% and longest 10% per
    * language"). Bounds are EXACT interpolated percentiles
    * (`percentile`, the q39-gated function, bit-equal to DuckDB's
    * `quantile_cont`), computed in one small per-stratum aggregate and
    * broadcast back — the fact table is scanned twice but never
    * shuffled, so at 100 TB the cost is two map stages plus a
    * #strata-row broadcast.
    */
  def quantileTrim(df: DataFrame, stratum: Column, value: Column,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi,
      s"quantileTrim: need 0 <= lo <= hi <= 1, got ($lo, $hi)")
    val bounds = df.groupBy(stratum.as("__stratum"))
      .agg(percentile(value, lit(lo)).as("__lo"),
        percentile(value, lit(hi)).as("__hi"))
    df.join(broadcast(bounds), stratum === col("__stratum"))
      .filter(value.cast(DoubleType) >= col("__lo") &&
        value.cast(DoubleType) <= col("__hi"))
      .drop("__stratum", "__lo", "__hi")
  }
}
