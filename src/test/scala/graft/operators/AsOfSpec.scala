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

  test("asofNearest: directions, tolerance, ties, one shuffle") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, t("2024-01-01 10:00:00")), // back 09:00, fwd 10:30 → nearest fwd
      (2L, 7L, t("2024-01-01 09:30:00")), // back 09:00 (30m) beats fwd 10:30 (1h)
      (3L, 7L, t("2024-01-01 06:00:00")), // no back; fwd 09:00 (3h)
      (4L, 8L, t("2024-01-01 12:00:00"))  // no signups for user 8 at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, t("2024-01-01 09:00:00")),
      (7L, t("2024-01-01 10:30:00"))
    ).toDF("user_id", "sts")

    def run(dir: String, tol: Option[Long]) =
      AsOf.asofNearest(left, right, "user_id", "ts", "sts", "m",
          direction = dir, tolerance = tol)
        .select("event_id", "m").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(1)))).toMap

    val back = run("backward", None)
    assert(back(1L).contains(t("2024-01-01 09:00:00")))
    assert(back(3L).isEmpty, "no prior right row → null")
    val fwd = run("forward", None)
    assert(fwd(1L).contains(t("2024-01-01 10:30:00")))
    assert(fwd(3L).contains(t("2024-01-01 09:00:00")))
    assert(fwd(4L).isEmpty)
    val near = run("nearest", None)
    assert(near(1L).contains(t("2024-01-01 10:30:00")), "30m fwd beats 1h back")
    assert(near(2L).contains(t("2024-01-01 09:00:00")), "30m back beats 1h fwd")
    // tolerance 2h: event 3's only match is 3h away → null
    val tol = run("nearest", Some(2L * 3600L * 1000000L))
    assert(tol(3L).isEmpty, "beyond tolerance must null out")
    assert(tol(1L).contains(t("2024-01-01 10:30:00")))

    // exact tie resolves backward
    val tie = AsOf.asofNearest(
        Seq((1L, 7L, t("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts"),
        Seq((7L, t("2024-01-01 09:00:00")), (7L, t("2024-01-01 11:00:00")))
          .toDF("user_id", "sts"),
        "user_id", "ts", "sts", "m", direction = "nearest")
      .select("m").collect().head.getTimestamp(0)
    assert(tie == t("2024-01-01 09:00:00"), "ties resolve backward")

    // same-instant right row matches in BOTH directions
    val same = AsOf.asofNearest(
        Seq((1L, 7L, t("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts"),
        Seq((7L, t("2024-01-01 10:00:00"))).toDF("user_id", "sts"),
        "user_id", "ts", "sts", "m", direction = "forward")
      .select("m").collect().head.getTimestamp(0)
    assert(same == t("2024-01-01 10:00:00"))

    // one exchange: both direction windows reuse the partition shuffle
    val plan = AsOf.asofNearest(left, right, "user_id", "ts", "sts", "m",
      direction = "nearest").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected one partition shuffle, plan:\n$plan")
    intercept[IllegalArgumentException] {
      AsOf.asofNearest(left, right, "user_id", "ts", "sts", "m", "sideways")
    }
  }

  test("asofNearest: fractional time columns never truncate distances") {
    import spark.implicits._
    // back at 8.1 is 1.9 away, fwd at 11.2 is 1.2 away: a cast-to-long
    // of the distances truncates BOTH to 1 and the backward tie-break
    // picks 8.1 — the native-type comparison must pick 11.2
    val left = Seq((1L, 7L, 10.0)).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, 8.1), (7L, 11.2)).toDF("user_id", "sts")
    val near = AsOf.asofNearest(left, right, "user_id", "ts", "sts", "m",
        direction = "nearest")
      .select("m").collect().head.getDouble(0)
    assert(near == 11.2, s"fractional nearest must compare untruncated: $near")

    // tolerance gating must see the fractional distance too: tol=1
    // excludes the 1.2-away forward row (truncated it would pass)
    val gated = AsOf.asofNearest(left, right, "user_id", "ts", "sts", "m",
        direction = "forward", tolerance = Some(1L))
      .select("m").collect().head
    assert(gated.isNullAt(0), "1.2 > tolerance 1 must null out")

    // date columns: exact integer day distances (never the long-cast
    // fallback, which nulls/garbles DateType)
    def d(s: String) = java.sql.Date.valueOf(s)
    val dl = Seq((1L, 7L, d("2024-01-10"))).toDF("event_id", "user_id", "ts")
    val dr = Seq((7L, d("2024-01-07")), (7L, d("2024-01-12")))
      .toDF("user_id", "sts")
    val dnear = AsOf.asofNearest(dl, dr, "user_id", "ts", "sts", "m",
        direction = "nearest")
      .select("m").collect().head.getDate(0)
    assert(dnear == d("2024-01-12"), "2 days fwd beats 3 days back")
  }

  test("asofNearest: TimestampNTZ ticks are session-timezone-free " +
      "(linear across a DST fall-back)") {
    import spark.implicits._
    // wall-clock times around the US 2024-11-03 fall-back: 00:45 →
    // 01:30 is 45 wall minutes, 01:30 → 02:10 is 40 — nearest must
    // pick 02:10 from pure wall arithmetic. A session-timezone cast
    // under America/Los_Angeles maps 02:10 to PST (an extra epoch
    // hour), flipping the pick to 00:45.
    def ntz(s: String) = java.time.LocalDateTime.parse(s)
    val left = Seq((1L, 7L, ntz("2024-11-03T01:30:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ntz("2024-11-03T00:45:00")),
        (7L, ntz("2024-11-03T02:10:00")))
      .toDF("user_id", "sts")
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      val picks = Seq("UTC", "America/Los_Angeles").map { tz =>
        spark.conf.set("spark.sql.session.timeZone", tz)
        AsOf.asofNearest(left, right, "user_id", "ts", "sts", "m",
            direction = "nearest")
          .select("m").collect().head.getAs[java.time.LocalDateTime](0)
      }
      assert(picks.forall(_ == ntz("2024-11-03T02:10:00")),
        s"NTZ nearest must be wall-clock in every session zone: $picks")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }
}
