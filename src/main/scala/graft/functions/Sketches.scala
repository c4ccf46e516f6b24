package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Set-operation estimates over [[expressions.KmvSketch]] arrays — the
  * theta-sketch combine (the Apache DataSketches lineage): once each
  * side of a question like "how many distinct users/shingles/documents
  * do corpora A and B SHARE?" is reduced to its k-minimum-hash array,
  * union and intersection cardinalities are pure array arithmetic on
  * two ≤ k-long rows. At 100 TB this replaces the classic
  * overlap-measurement join — which shuffles every distinct value of
  * both corpora — with two independent single-pass sketch scans plus a
  * constant-size combine: the sketches can even be built in different
  * jobs, persisted, and combined later.
  *
  * Estimator (Dasgupta et al., "Theta-Sketch Framework"): let θ be the
  * SMALLER of the two sketches' k-th-smallest hashes (a sketch with
  * fewer than k entries has θ = 1, i.e. it retained everything). Every
  * retained hash below θ is a uniform sample of its set at rate θ, so
  * |A ∩ B| ≈ |{h ∈ sketchA ∩ sketchB : h < θ}| / θ, and likewise for
  * the union. When BOTH sides hold fewer than k distinct values the
  * sketches ARE the hash sets, θ = 1, and every count is EXACT — the
  * x11 gate pins that regime against DuckDB's true distinct-join
  * counts; the ~1/√k estimate regime is spec-pinned (KmvDistinctSpec).
  *
  * Hash comparisons are UNSIGNED (the sketch's order): columns are
  * flipped by xor with Long.MinValue so signed `<` gives unsigned
  * order, matching [[expressions.KmvDistinct.UnsignedOrder]] exactly.
  */
object Sketches {

  /** Signed-comparable image of an unsigned-ordered hash. */
  private def flip(h: Column): Column = h.bitwiseXOR(lit(Long.MinValue))

  /** The hash→(0,1] density of a FLIPPED k-th-smallest hash θ:
    * (θ_unsigned + 1)/2^64 — the [[expressions.KmvDistinct]] eval
    * mapping bit-for-bit (flipped + 2^63 = unsigned value). */
  private def densityF(thetaF: Column): Column =
    (thetaF.cast(DoubleType) + lit(9.223372036854775808e18) + lit(1.0)) /
      lit(1.8446744073709552e19)

  /** θ of one sketch as its FLIPPED hash, null = retained everything
    * (fewer than k entries, density 1). Sketch arrays are
    * unsigned-ascending, so element k is the k-th smallest. */
  private def thetaFlipped(sketch: Column, k: Int): Column =
    when(size(sketch) >= k, flip(element_at(sketch, k)))

  /** Count of retained hashes strictly below the (flipped) θ; a null θ
    * counts everything. */
  private def countBelow(arr: Column, thetaF: Column): Column =
    when(thetaF.isNull, size(arr).cast(LongType))
      .otherwise(size(filter(arr, h => flip(h) < thetaF)).cast(LongType))

  /** Scale a below-θ count by θ's density; null θ = exact count. */
  private def scaled(cnt: Column, thetaF: Column): Column =
    when(thetaF.isNull, cnt)
      .otherwise(round(cnt.cast(DoubleType) / densityF(thetaF))
        .cast(LongType))

  /** Distinct-count estimate of a single sketch — the
    * [[expressions.KmvDistinct]] estimate recomputed from the array:
    * exact size below k, (k−1)/θ density above. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    val tf = thetaFlipped(sketch, k)
    when(tf.isNull, size(sketch).cast(LongType))
      .otherwise(round(lit((k - 1).toDouble) / densityF(tf)).cast(LongType))
  }

  /** The theta combine of two sketches built with the same `k`:
    * struct(n_a, n_b, n_union, n_intersect), all BIGINT estimates.
    * Exact when both sides saw fewer than k distinct values (θ = 1 on
    * both sides — the gated regime); ~1/√k relative error otherwise.
    * Select the fields out to scalar columns (the array-free gate
    * rule applies to the sketches themselves).
    */
  def kmvSetEstimates(sketchA: Column, sketchB: Column, k: Int): Column = {
    val tf = least(thetaFlipped(sketchA, k), thetaFlipped(sketchB, k))
    struct(
      kmvEstimate(sketchA, k).as("n_a"),
      kmvEstimate(sketchB, k).as("n_b"),
      scaled(countBelow(array_union(sketchA, sketchB), tf), tf)
        .as("n_union"),
      scaled(countBelow(array_intersect(sketchA, sketchB), tf), tf)
        .as("n_intersect"))
  }

  /** Merge two [[expressions.QuantileSketch]] arrays built with the
    * same `k`: the bottom-k of the union — BIT-IDENTICAL to the sketch
    * a one-shot aggregate over both inputs would build, because the k
    * smallest hashes of a union are a subset of the union of each
    * side's k smallest (SampleQuantileSpec pins the identity). Pure
    * array arithmetic on two ≤ k-pair rows: concat → sort (stored
    * hashes are pre-flipped, so the struct's natural order IS unsigned
    * hash order) → drop equal-hash repeats keeping the smallest value
    * (the aggregate's collision rule; exact duplicates from merging
    * OVERLAPPING sketches collapse the same way) → keep k.
    *
    * Associative and commutative, so per-shard sketches fold in any
    * tree — the x11 pattern applied to quantiles: per-shard
    * distribution cards become one sketch scan per shard plus
    * constant-size merges, never a corpus re-aggregate.
    */
  def quantileSketchMerge(sketchA: Column, sketchB: Column,
      k: Int): Column = {
    val sorted = array_sort(concat(sketchA, sketchB))
    // equal hashes sort adjacent with values ascending — keeping the
    // FIRST of each hash run is the offer() min-value tie-break.
    // The run check compares each element to its predecessor via a
    // null-shifted zip (LINEAR): indexing the sorted array from inside
    // a lambda (element_at(sorted, i)) would re-evaluate the whole
    // sort per element — O(n² log n) per output column, measured at
    // 60+ s on a 5k-pair merge.
    val entry = "struct<hf:bigint,v:double>"
    val shifted = concat(array(lit(null).cast(entry)), sorted)
    val marked = zip_with(sorted, shifted, (cur, prev) =>
      when(prev.isNull || prev.getField("hf") =!= cur.getField("hf"), cur))
    slice(filter(marked, _.isNotNull), 1, k)
  }

  /** percentile_disc(`q`) estimate from a [[expressions.QuantileSketch]]
    * array — the same ceil(q·n) rank arithmetic as
    * [[expressions.SampleQuantile]]'s eval, over the (possibly merged)
    * sample's values. Exact whenever the sample retained everything
    * (combined inputs below k — the x13-gated regime); ~1/√k rank
    * error above. Null on an empty sketch.
    */
  def quantileSketchEstimate(sketch: Column, q: Double): Column = {
    require(q >= 0.0d && q <= 1.0d,
      s"quantileSketchEstimate: q must be in [0, 1], got $q")
    val vals = array_sort(transform(sketch, s => s.getField("v")))
    val n = size(vals).cast(LongType)
    val idx1 = least(n, greatest(lit(1L), ceil(lit(q) * n).cast(LongType)))
    when(size(vals) > 0, get(vals, (idx1 - 1L).cast("int")))
  }

  /** Count-Min sketch of `item` per group: the `depth × width` counter
    * matrix as a row-major `array<bigint>` — the bounded-memory
    * POINT-QUERY counter (see [[expressions.CountMinSketch]] for the
    * guarantees and the portable-hash contract). */
  def cmsSketch(item: Column, depth: Int, width: Int): Column =
    expressions.CountMinSketch(item, depth, width)

  /** Point-count estimate of `item` from a [[cmsSketch]] array built
    * with the same `depth`/`width`: the minimum of the item's `depth`
    * counters. Never undercounts; overcounts by at most the collision
    * mass of the item's emptiest row. The bucket arithmetic is the
    * portable 56-bit md5 hash of `cms:<row>:<item>` mod width — the
    * exact chain [[expressions.CountMinSketch.bucket]] runs on the
    * build side and the x14 DuckDB oracle replays.
    */
  def cmsEstimate(sketch: Column, item: Column, depth: Int,
      width: Int): Column = {
    require(depth >= 1 && depth <= 16,
      s"cmsEstimate: depth must be in [1, 16], got $depth")
    require(width >= 2 && width <= (1 << 20),
      s"cmsEstimate: width must be in [2, ${1 << 20}], got $width")
    (0 until depth).map { j =>
      element_at(sketch,
        (pmod(TextFunctions.portableHash64(
            concat(lit(s"cms:$j:"), item)), lit(width.toLong))
          + lit(j.toLong * width) + lit(1L)).cast(IntegerType))
    }.reduce(least(_, _))
  }

  /** Merge two [[cmsSketch]] arrays (same depth/width) by pointwise
    * addition — CMS is linear, so the merged sketch equals the sketch
    * of the concatenated inputs EXACTLY (x15 shares x14's oracle
    * through this combine; CountMinSpec pins linearity). This is how
    * per-shard / per-day sketches roll up without touching the raw
    * data again. */
  def cmsMerge(sketchA: Column, sketchB: Column): Column =
    zip_with(sketchA, sketchB, (a, b) => a + b)
}
