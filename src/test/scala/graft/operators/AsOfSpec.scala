package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsOfSpec extends SparkSpec {

  test("asofLatest equals the naive range join (and shuffles once)") {
    val events = Tables.df(spark, sf(), "events")
    val composed = AsOf.asofSelf(events, "user_id", "ts",
        col("event_type") === "signup", "prior_signup")
      .select("event_id", "prior_signup")
      .collect().map(r => (r.getLong(0), r.get(1))).toMap

    // naive O(n·m) truth: max signup ts <= event ts per event
    val s = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_uid"), col("ts").as("s_ts"))
    val naive = events
      .join(s, col("user_id") === col("s_uid") && col("s_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(col("s_ts")).as("prior_signup"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap

    assert(composed.size == naive.size)
    val diffs = naive.collect {
      case (k, v) if composed(k) != v => (k, v, composed(k))
    }
    assert(diffs.isEmpty, s"asof mismatches: ${diffs.take(3)}")

    // events with no prior signup stay null
    assert(composed.values.exists(_ == null))
  }

  test("same-instant right rows match (<= semantics)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val df = Seq(
      (1L, 7L, ts, "signup"),
      (2L, 7L, ts, "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = AsOf.asofSelf(df, "user_id", "ts",
        col("event_type") === "signup", "prior")
      .select("event_id", "prior").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toMap
    assert(out(1L) == ts, "a signup is its own as-of match")
    assert(out(2L) == ts, "same-instant signup visible to the click")
  }
}
