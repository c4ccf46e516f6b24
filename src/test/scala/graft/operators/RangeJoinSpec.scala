package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pointInInterval equals the naive theta-join on the events fixture") {
    val ev = Tables.df(spark, sf(), "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 6 HOURS")).as("s_end"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))

    val binned = RangeJoin.pointInInterval(clicks, signups,
        "c_ts", "s_ts", "s_end", keys = Seq("c_user" -> "s_user"))
      .select("click_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = clicks.join(signups,
        col("c_user") === col("s_user") &&
        col("c_ts") >= col("s_ts") && col("c_ts") <= col("s_end"))
      .select("click_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(binned == naive,
      s"range-join divergence: ${binned.diff(naive).take(3)} vs ${naive.diff(binned).take(3)}")
    assert(binned.nonEmpty, "fixture produced no in-window pairs — gate is vacuous")
  }

  test("inclusive bounds and sub-second edges (bins floor to seconds)") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00.000001")), // just inside start
      (2L, ts("2024-01-01 11:00:00.0")),      // exactly at end
      (3L, ts("2024-01-01 11:00:00.000001")), // just past end
      (4L, ts("2024-01-01 09:59:59.999999"))  // just before start
    ).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:00:00.000001"), ts("2024-01-01 11:00:00.0"))
    ).toDF("iid", "start", "end")

    val got = RangeJoin.pointInInterval(points, intervals, "pt", "start", "end",
        binSeconds = 60)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"expected inclusive [start, end] only, got $got")
  }

  test("keyless (pure time-range) join and invalid intervals") {
    val points = Seq((1L, ts("2024-01-01 10:30:00")),
      (2L, ts("2024-01-02 10:30:00"))).toDF("pid", "pt")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (11L, ts("2024-01-01 12:00:00"), ts("2024-01-01 09:00:00")) // end < start: dropped
    ).toDF("iid", "start", "end")
    val got = RangeJoin.pointInInterval(points, intervals, "pt", "start", "end")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("a match appears exactly once (no dedup pass needed)") {
    // interval spanning many bins; the point's single bin matches once
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val intervals = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "start", "end")
    val rows = RangeJoin.pointInInterval(points, intervals, "pt", "start", "end",
      binSeconds = 600).collect()
    assert(rows.length == 1, s"duplicate matches: ${rows.length}")
  }

  test("oversized intervals fail in-plan with a clear message") {
    val points = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("pid", "pt")
    val intervals = Seq((10L, ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00")))
      .toDF("iid", "start", "end")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "pt", "start", "end",
        binSeconds = 60, maxBins = 100).collect()
    }
    assert(e.getMessage.contains("pointInInterval"), e.getMessage)
  }

  test("plan is an equi-join — no nested-loop, no cartesian") {
    val ev = Tables.df(spark, sf(), "events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 6 HOURS")).as("s_end"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val plan = RangeJoin.pointInInterval(clicks, signups,
        "c_ts", "s_ts", "s_end", keys = Seq("c_user" -> "s_user"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a non-equi strategy:\n$plan")
  }
}
