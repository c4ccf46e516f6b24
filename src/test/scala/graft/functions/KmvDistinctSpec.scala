package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.{KmvDistinct, KmvSketch}

/** KMV distinct-count sketch (`expressions.KmvDistinct`, a native
  * TypedImperativeAggregate). The x09 gate pins the exact regime
  * (n < k) against DuckDB's COUNT(DISTINCT); here we pin the estimate
  * regime's error, topology-independence, null handling, and the
  * partial-aggregation plan shape that makes it 100 TB-safe.
  */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k, including duplicates and nulls") {
    val df = (1L to 500L).map(i => Some(i % 137)).toSeq
      .appendedAll(Seq(None, None)).toDF("v")
    val n = df.agg(KmvDistinct(col("v"), 256).as("n"))
      .collect().head.getLong(0)
    assert(n == 137L)
  }

  test("estimate regime: ~1/sqrt(k) relative error at n >> k") {
    val exact = 50000L
    val df = spark.range(exact).select(col("id").as("v"))
    val est = df.agg(KmvDistinct(col("v"), 256).as("n"))
      .collect().head.getLong(0)
    // deterministic estimate; 1/sqrt(256) ~ 6% expected, allow 4 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"estimate $est too far from $exact")
  }

  test("topology-independent: any partitioning gives the same sketch") {
    val df = spark.range(20000).select((col("id") % 3000).as("v"))
    val res = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(KmvDistinct(col("v"), 512).as("n"))
        .collect().head.getLong(0)
    }
    assert(res.distinct.size == 1)
  }

  private def combine(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, k: Int): (Long, Long, Long, Long) = {
    val row = a.agg(KmvSketch(col("v"), k).as("sa"))
      .crossJoin(b.agg(KmvSketch(col("v"), k).as("sb")))
      .select(Sketches.kmvSetEstimates(col("sa"), col("sb"), k).as("o"))
      .select("o.*").collect().head
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  test("theta combine: set operations exact when both sides below k") {
    val a = spark.range(0, 1000).select(col("id").as("v"))
    val b = spark.range(600, 1800).select(col("id").as("v"))
    assert(combine(a, b, 4096) == ((1000L, 1200L, 1800L, 400L)))
    // disjoint sets: zero intersection, additive union
    val c = spark.range(5000, 5500).select(col("id").as("v"))
    assert(combine(a, c, 4096) == ((1000L, 500L, 1500L, 0L)))
  }

  test("theta combine: estimate regime error at n >> k") {
    val a = spark.range(0, 60000).select(col("id").as("v"))
    val b = spark.range(30000, 90000).select(col("id").as("v"))
    val (na, nb, nu, ni) = combine(a, b, 256)
    assert(math.abs(na - 60000L).toDouble / 60000 < 0.25)
    assert(math.abs(nb - 60000L).toDouble / 60000 < 0.25)
    assert(math.abs(nu - 90000L).toDouble / 90000 < 0.25)
    // intersection samples |I|·θ ≈ k·|I|/|U| ≈ 85 hashes → wider band
    assert(math.abs(ni - 30000L).toDouble / 30000 < 0.5)
  }

  test("theta combine: topology-independent") {
    val a = spark.range(0, 40000).select((col("id") % 9000).as("v"))
    val b = spark.range(0, 40000).select((col("id") % 12000 + 4000).as("v"))
    val res = Seq(1, 7, 32).map { p =>
      combine(a.repartition(p), b.repartition(p), 512)
    }
    assert(res.distinct.size == 1)
  }

  test("grouped, k-validation, and partial aggregation in the plan") {
    intercept[IllegalArgumentException] { KmvDistinct(col("v"), 1) }
    val df = spark.range(10000)
      .select((col("id") % 4).as("g"), (col("id") % 700).as("v"))
    val agg = df.groupBy(col("g")).agg(KmvDistinct(col("v"), 1024).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs as ObjectHashAggregate with a
    // partial stage before the exchange — map-side combine, ≤ k longs
    // per group per task
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_kmvdistinct") || plan.contains("Partial"),
      s"no partial aggregation stage in:\n$plan")
    val rows = agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.values.forall(_ == 700L / 4))
  }
}
