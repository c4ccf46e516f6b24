package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.SampleQuantile

/** Bottom-k hash-sample quantile (`expressions.SampleQuantile`, the
  * third native TypedImperativeAggregate). The x12 gate pins the exact
  * regime (group size <= k) against the same rank arithmetic in DuckDB;
  * here we pin the percentile_disc convention, the estimate regime's
  * error, topology-independence, null handling, and the
  * partial-aggregation plan shape.
  */
class SampleQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k: percentile_disc semantics, nulls skipped") {
    // values 10,20,30,40 — disc quantiles pick elements, never
    // interpolate: q=0.5 → rank ceil(0.5*4)=2 → 20
    val df = Seq((1L, Some(30.0)), (2L, Some(10.0)), (3L, Some(40.0)),
      (4L, Some(20.0)), (5L, None)).toDF("id", "v")
    def q(p: Double) = df.agg(SampleQuantile(col("id"), col("v"), 64, p))
      .collect().head.getDouble(0)
    assert(q(0.0) == 10.0)
    assert(q(0.25) == 10.0)
    assert(q(0.5) == 20.0)
    assert(q(0.51) == 30.0)
    assert(q(0.75) == 30.0)
    assert(q(0.76) == 40.0)
    assert(q(1.0) == 40.0)
  }

  /** Uniform-ish [0,1) values INDEPENDENT of the sketch's row-selection
    * hash. The sketch samples the rows with the smallest `xxhash64(id)`
    * — deriving test values from `xxhash64(id)` too (the original form
    * of these tests) made the sample exactly the values nearest 0.5,
    * so every quantile estimated ≈0.5 and the q=0.5 assertion passed
    * VACUOUSLY. A multiplicative-congruential scramble of the id shares
    * no structure with xxhash64.
    */
  private def uniformV = (((col("id") * lit(2654435761L)) % 1000003L
    + 1000003L) % 1000003L).cast("double") / lit(1000003.0)

  test("estimate regime: rank error ~1/sqrt(k) at n >> k") {
    val df = spark.range(100000).select(col("id"), uniformV.as("v"))
    val est = df.agg(SampleQuantile(col("id"), col("v"), 1024, 0.5))
      .collect().head.getDouble(0)
    // 1/sqrt(1024) ~ 3% rank error; allow 4 sigma
    assert(math.abs(est - 0.5) < 0.13, s"p50 estimate $est too far from 0.5")
  }

  test("error-vs-k curve: measured rank error within 4/sqrt(k) at every " +
      "k, and more sample buys more accuracy (the sizing table in SCALE.md)") {
    // deterministic uniform 0..1 values, INDEPENDENT of the selection
    // hash (see uniformV) — the measured errors are reproducible
    // constants, and the SCALE.md table IS this run
    val df = spark.range(200000).select(col("id"), uniformV.as("v"))
    val ks = Seq(64, 256, 1024, 4096)
    val qs = Seq(0.1, 0.5, 0.9)
    val errs = ks.map { k =>
      val maxErr = qs.map { p =>
        val est = df.agg(SampleQuantile(col("id"), col("v"), k, p))
          .collect().head.getDouble(0)
        val err = math.abs(est - p) // uniform: rank error == value error
        assert(err < 4.0 / math.sqrt(k),
          f"k=$k q=$p err=$err%.4f breaches 4/sqrt(k)=${4.0 / math.sqrt(k)}%.4f")
        err
      }.max
      info(f"k=$k%5d  worst |est-q| over q∈{0.1,0.5,0.9} = $maxErr%.4f" +
        f"  (bound 4/√k = ${4.0 / math.sqrt(k)}%.4f)")
      k -> maxErr
    }
    // the curve points down: 64x more sample must beat the smallest k
    assert(errs.last._2 < errs.head._2,
      s"error did not improve from k=64 to k=4096: $errs")
  }

  test("topology-independent: any partitioning gives the same estimate") {
    val df = spark.range(30000)
      .select(col("id"), (col("id") % 997).cast("double").as("v"))
    val res = Seq(1, 7, 32).map { p =>
      df.repartition(p)
        .agg(SampleQuantile(col("id"), col("v"), 256, 0.9))
        .collect().head.getDouble(0)
    }
    assert(res.distinct.size == 1)
  }

  test("grouped, validation, and partial aggregation in the plan") {
    intercept[IllegalArgumentException] {
      SampleQuantile(col("id"), col("v"), 1, 0.5)
    }
    intercept[IllegalArgumentException] {
      SampleQuantile(col("id"), col("v"), 64, 1.5)
    }
    val df = spark.range(8000)
      .select(col("id"), (col("id") % 4).as("g"),
        expr("cast((id div 4) % 100 as double)").as("v"))
    val agg = df.groupBy(col("g"))
      .agg(SampleQuantile(col("id"), col("v"), 4096, 0.5).as("p50"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_samplequantile") || plan.contains("Partial"),
      s"no partial aggregation stage in:\n$plan")
    // 2000 rows per group, k=4096 → exact: values 0..99 repeated, p50
    // = rank ceil(0.5*2000)=1000 of the sorted 2000 → value 49
    val rows = agg.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows.values.forall(_ == 49.0), rows.toString)
  }

  test("sketch content composes: merged group sketches == one-shot " +
      "sketch over the union, in BOTH regimes") {
    import spark.implicits._
    import graft.functions.expressions.QuantileSketch
    val df = (1L to 500L).map(i => (i, i % 7, (i * 37 % 101).toDouble))
      .toDF("id", "g", "v")
    def check(k: Int): Unit = {
      // per-group sketches folded with the Column merge…
      val perGroup = df.groupBy(col("g"))
        .agg(QuantileSketch(col("id"), col("v"), k).as("sk"))
        .agg(collect_list(col("sk")).as("sks"))
        // fold from the first sketch: merge is associative+commutative
        // and emits sorted content, so collect_list's order is moot
        .select(aggregate(slice(col("sks"), 2, 1000),
          element_at(col("sks"), 1),
          (acc, s) => graft.functions.Sketches.quantileSketchMerge(acc, s, k))
          .as("m"))
      // …must equal the one-shot sketch over all rows, hash for hash
      val oneShot = df.agg(QuantileSketch(col("id"), col("v"), k).as("m"))
      val a = perGroup.select(to_json(col("m"))).head.getString(0)
      val b = oneShot.select(to_json(col("m"))).head.getString(0)
      assert(a == b, s"k=$k merge diverged from one-shot")
    }
    check(1024) // below k: the sample is the whole input
    check(32)   // estimate regime: bottom-k of union == merge of bottom-ks

    // merged estimate is exact below k and matches the point aggregate
    val halves = Seq(df.filter(col("id") % 2 === 0),
      df.filter(col("id") % 2 === 1))
    val sks = halves.map(h =>
      h.agg(QuantileSketch(col("id"), col("v"), 1024).as("sk")))
    val merged = sks.head.select(col("sk").as("a"))
      .crossJoin(sks(1).select(col("sk").as("b")))
      .select(graft.functions.Sketches.quantileSketchEstimate(
        graft.functions.Sketches.quantileSketchMerge(
          col("a"), col("b"), 1024), 0.5).as("p50"))
      .head.getDouble(0)
    val direct = df.agg(SampleQuantile(col("id"), col("v"), 1024, 0.5))
      .head.getDouble(0)
    assert(merged == direct, s"composed p50 $merged != direct $direct")
  }
}
