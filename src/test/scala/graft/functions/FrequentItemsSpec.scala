package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.FrequentItems

/** Misra–Gries heavy-hitters sketch (`expressions.FrequentItems`, a
  * native TypedImperativeAggregate). The x10 gate pins the exact
  * regime (distinct < k) against DuckDB's GROUP BY + row_number;
  * here we pin the approximate regime's undercount bound, the
  * guaranteed-presence property, topology-independence in the exact
  * regime, null handling, and the partial-aggregation plan shape.
  */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  private def topOf(rows: Array[Row]): Seq[(String, Long)] =
    rows.head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))

  test("exact below k: true counts, (n desc, item asc) order, nulls skipped") {
    val items = Seq.fill(30)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(10)("gamma") ++ Seq.fill(3)("delta")
    val df = (items.map(Option(_)) ++ Seq(None, None)).toDF("w")
    val top = topOf(df.agg(FrequentItems(col("w"), 64, 3).as("t")).collect())
    // alpha/beta tie at 30 → item asc breaks it; delta cut by m=3
    assert(top == Seq(("alpha", 30L), ("beta", 30L), ("gamma", 10L)))
  }

  test("approximate regime: undercount ≤ n/(k+1), heavy item guaranteed present") {
    // one heavy item (f = 3000) in a stream of 6000 distinct light items,
    // k = 64: every counter obeys f - n/(k+1) ≤ c ≤ f
    val n = 9000L
    val df = spark.range(n).select(
      when(col("id") < 3000, lit("HEAVY"))
        .otherwise(concat(lit("light_"), col("id"))).as("w"))
    val top = topOf(df.agg(FrequentItems(col("w"), 64, 5).as("t")).collect())
    val heavy = top.find(_._1 == "HEAVY")
    assert(heavy.isDefined, s"heavy hitter evicted: $top")
    val c = heavy.get._2
    assert(c <= 3000L, s"Misra–Gries must never overcount, got $c")
    assert(c >= 3000L - n / 65L, s"undercount beyond n/(k+1): $c")
  }

  test("exact regime is topology-independent") {
    val df = spark.range(5000).select(
      concat(lit("w"), col("id") % 200).as("w"))
    val res = Seq(1, 7, 32).map { p =>
      topOf(df.repartition(p).agg(FrequentItems(col("w"), 512, 10).as("t"))
        .collect())
    }
    assert(res.distinct.size == 1)
    assert(res.head.forall(_._2 == 25L))
  }

  test("grouped, parameter validation, partial aggregation in the plan") {
    intercept[IllegalArgumentException] { FrequentItems(col("w"), 2, 1) }
    intercept[IllegalArgumentException] { FrequentItems(col("w"), 16, 17) }
    val df = spark.range(8000).select((col("id") % 4).as("g"),
      concat(lit("w"), col("id") % 100).as("w"))
    val agg = df.groupBy(col("g")).agg(FrequentItems(col("w"), 256, 4).as("t"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_frequentitems") || plan.contains("Partial"),
      s"no partial aggregation stage in:\n$plan")
    val rows = agg.collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val top = r.getSeq[Row](1).map(x => (x.getString(0), x.getLong(1)))
      assert(top.length == 4)
      // 4 | 100 → word j lands entirely in group j%4: 80 occurrences
      assert(top.forall(_._2 == 80L))
      assert(top == top.sortBy { case (w, c) => (-c, w) })
    }
  }
}
