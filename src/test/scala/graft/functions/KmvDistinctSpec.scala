package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.KmvDistinct

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
