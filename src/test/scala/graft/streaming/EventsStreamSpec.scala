package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Structured Streaming drives: file-source stream → watermark + window →
  * memory sink, checked against the equivalent batch plan; stateful
  * sessionization via flatMapGroupsWithState checked against the batch
  * sessionize query logic.
  */
class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir: String = {
    // stage the events table as a streaming source directory
    val dir = Files.createTempDirectory("events-stream").toString
    Tables.df(spark, sf(), "events").coalesce(2).write
      .mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts: stream result equals batch result") {
    val dir = eventsDir
    val stream = EventsStream.windowedCounts(
      EventsStream.readEvents(spark, dir))
    // complete mode: append would hold back windows newer than the
    // watermark (they stay in state until later data advances it), so a
    // bounded file replay would under-report the trailing windows.
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_out")
      .select("win_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val expected = spark.read.parquet(dir)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got == expected,
      s"stream/batch divergence: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
  }

  test("windowed heavy hitters: the sketch streams to the exact batch result") {
    val dir = eventsDir
    // TypedImperativeAggregate state (the Misra–Gries buffer) must
    // survive the streaming state store's serialize/merge cycle — this
    // is what the test pins beyond plain batch/stream plan parity
    val stream = EventsStream.windowedHeavyHitters(
      EventsStream.readEvents(spark, dir), col("user_id"),
      capacity = 1024, k = 5)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("hh_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hh_out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    val expected = EventsStream.windowedHeavyHitters(
        spark.read.parquet(dir), col("user_id"), capacity = 1024, k = 5)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got == expected,
      s"stream/batch divergence: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("heavy hitters ABOVE capacity: Misra–Gries bounds hold through " +
      "the state store") {
    // s15's gate regime is exact (distinct « capacity); the operator's
    // whole point is the other regime — here 2003 distinct users per
    // window crowd a 16-counter sketch, streamed in four micro-batches
    // so the MG buffer survives serialize/merge cycles, and the
    // published deterministic bounds must hold: every item with true
    // frequency f > n/(capacity+1) IS reported, with estimate in
    // [f − n/(capacity+1), f].
    val capacity = 16
    val k = 5
    val heavies = Seq("hh_a" -> 300, "hh_b" -> 300, "hh_c" -> 300)
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def rows(winOffsetH: Int): Seq[(java.sql.Timestamp, String)] = {
      val t0 = base.getTime + winOffsetH * 3600L * 1000L
      val heavy = heavies.flatMap { case (u, f) =>
        (0 until f).map(i => (new java.sql.Timestamp(t0 + i), u)) }
      val light = (1 to 2000).map(i =>
        (new java.sql.Timestamp(t0 + 1000 + i), f"u$i%04d"))
      heavy ++ light
    }
    val n = rows(0).size // per-window mass: 2900
    val slack = n / (capacity + 1) // 170: the MG undercount bound
    val dir = Files.createTempDirectory("events-hh-cap").toString
    // shuffle arrival order deterministically so each micro-batch
    // carries a mix of heavy and light rows (merges do real work)
    (rows(0) ++ rows(1)).sortBy { case (t, u) =>
      (u.hashCode * 31 + t.getTime).abs }
      .zipWithIndex.groupBy(_._2 % 4).foreach { case (part, rs) =>
        rs.map(_._1).toDF("ts", "user_id").coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/drop=$part")
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.StringType)))
    val stream = EventsStream.windowedHeavyHitters(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/drop=*"),
      col("user_id"), capacity = capacity, k = k)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("hh_cap_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hh_cap_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(got.size == 2, s"two windows expected: ${got.keys}")
    got.foreach { case (win, top) =>
      assert(top.size <= k, s"$win: at most k rows")
      heavies.foreach { case (u, f) =>
        assert(top.contains(u),
          s"$win: true-heavy $u (f=$f > n/(cap+1)=$slack) must be reported")
        val est = top(u)
        assert(est <= f && est >= f - slack,
          s"$win: $u estimate $est outside [${f - slack}, $f]")
      }
      // MG never overcounts: a light item can never outrank a heavy's
      // guaranteed floor
      top.foreach { case (u, est) =>
        if (!heavies.exists(_._1 == u))
          assert(est <= 1 + slack, s"$win: light $u overcounted to $est")
      }
    }
  }

  test("redelivery dedup: duplicated files stream to the exact batch result") {
    // the same events written TWICE into the watched directory — an
    // at-least-once source redelivering every file
    val dir = Files.createTempDirectory("events-redeliver").toString
    val ev = Tables.df(spark, sf(), "events").coalesce(1)
    ev.write.mode("overwrite").parquet(s"$dir/first")
    ev.write.mode("overwrite").parquet(s"$dir/second")
    Files.newDirectoryStream(java.nio.file.Paths.get(s"$dir/first")).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.copy(p, java.nio.file.Paths.get(dir, "a_" + p.getFileName))
    }
    Files.newDirectoryStream(java.nio.file.Paths.get(s"$dir/second")).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.copy(p, java.nio.file.Paths.get(dir, "b_" + p.getFileName))
    }

    // dedup + windowed agg: two stateful operators in one query
    val stream = EventsStream.windowedCounts(
      EventsStream.dedupEvents(EventsStream.readEvents(spark, dir)),
      setWatermark = false)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out")
      .select("win_start", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // expected: as if each event arrived exactly once
    val expected = EventsStream.windowedCounts(
        Tables.df(spark, sf(), "events"))
      .select("win_start", "win_end", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"redelivered stream diverged: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
  }

  test("content dedup: stream keeps exactly the batch fingerprint set") {
    val dir = Files.createTempDirectory("events-content").toString
    Tables.df(spark, sf(), "events").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val content = concat_ws(" ", col("event_type"), col("props"))
    val stream = EventsStream.dedupByContent(
      EventsStream.readEvents(spark, dir), content)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("content_dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val fp = graft.functions.TextFunctions.fingerprint(content)
    val got = spark.table("content_dedup_out")
      .select(fp.as("fp")).collect().map(_.getString(0)).toSeq
    val want = EventsStream.dedupByContent(
        Tables.df(spark, sf(), "events"), content)
      .select(fp.as("fp")).collect().map(_.getString(0)).toSeq
    assert(got.distinct.lengthCompare(got.length) == 0,
      "streaming emitted a duplicated fingerprint")
    assert(got.sorted == want.sorted,
      "streaming and batch keep different content sets")
  }

  test("stream-static enrichment: stream result equals batch result") {
    val dir = eventsDir
    val dim = Tables.df(spark, sf(), "customer")
    val stream = EventsStream.enrichedCounts(
      EventsStream.readEvents(spark, dir), dim,
      col("user_id"), col("c_custkey"), col("c_mktsegment"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try q.processAllAvailable() finally q.stop()
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("win_start", "segment", "n", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val got = shape(spark.table("enrich_out"))
    val expected = shape(EventsStream.enrichedCounts(
      Tables.df(spark, sf(), "events"), dim,
      col("user_id"), col("c_custkey"), col("c_mktsegment")))
    assert(got == expected,
      s"divergence: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
  }

  test("content dedup: entirely non-Latin contents do NOT collapse together") {
    import spark.implicits._
    // four events: two distinct CJK texts (normalized form is empty for
    // both — the naive fingerprint would merge them), one exact CJK
    // re-post, one Latin control
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", "你好世界"),
      (2L, "2024-01-01 00:01:00", "完全不同的文本"),
      (3L, "2024-01-01 00:02:00", "你好世界"),
      (4L, "2024-01-01 00:03:00", "hello world"))
      .map { case (id, ts, txt) =>
        (id, java.sql.Timestamp.valueOf(ts), txt)
      }.toDF("event_id", "ts", "content")
    val out = EventsStream.dedupByContent(rows, col("content"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    // distinct CJK texts both survive; the exact re-post (id 3) drops
    assert(out == Set(1L, 2L, 4L), s"got $out")
  }

  test("watermark drops late events in append mode") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import EventsStream.Event
    def ev(id: Long, ts: String): Event =
      Event(id, java.sql.Timestamp.valueOf(ts), 1L, "click", 1.0, "{}")

    val input = MemoryStream[Event]
    val agg = EventsStream.windowedCounts(input.toDF(),
      window_ = "1 hour", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: events in hour 10 and hour 12 — watermark advances to
      // 12:50, closing the hour-10 and hour-11 windows
      input.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"),
        ev(3, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      // batch 2: a straggler for hour 10 — beyond the watermark, dropped
      input.addData(ev(4, "2024-01-01 10:30:00"))
      q.processAllAvailable()
      // batch 3: advance far enough to flush every window
      input.addData(ev(5, "2024-01-01 20:00:00"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("late_out")
      .select("win_start", "n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // the late event 4 must NOT be counted: hour-10 window stays at 2
    assert(out("2024-01-01 10:00:00.0") == 2L,
      s"late event leaked into a closed window: $out")
  }

  test("stateful sessionization matches the batch session count") {
    import EventsStream._
    val ev = Tables.df(spark, sf(), "events").as[Event]
    // batch truth: count sessions per user via the lag+cumsum plan
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batchSessions = Tables.df(spark, sf(), "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .agg(sum(col("new_session"))).as[Long].head()

    // streaming path (single batch = all closed sessions + open per user)
    val closed = sessionize(ev).collect()
    val openPerUser = ev.select(col("user_id")).distinct().count()
    assert(closed.length + openPerUser == batchSessions,
      s"closed=${closed.length} + open=$openPerUser != batch=$batchSessions")
    // sanity on a closed session's invariants
    closed.headOption.foreach { s =>
      assert(s.n_events > 0 &&
        !s.session_end.before(s.session_start))
    }
  }

  test("ORACLE PARITY: AvailableNow streaming duals == gated s01/s02 results, exactly") {
    import org.apache.spark.sql.streaming.Trigger
    import EventsStream.Event
    // These two comparisons are against the *driver-gated* batch queries
    // (s01_event_window / s02_sessionize hash-match their DuckDB oracles
    // every round), so equality here is transitively oracle parity for
    // the streaming path itself — full rows, every column, exact doubles.
    val dir = eventsDir

    // s01 dual: file stream -> watermarked windowed agg, AvailableNow
    val q = EventsStream.windowedCounts(EventsStream.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("s01_parity")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val gotWin = spark.table("s01_parity")
      .select("win_start", "event_type", "n", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val wantWin = graft.ExtensionQueries.queries("s01_event_window")(spark, sf())
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(gotWin == wantWin,
      s"s01 stream/oracle divergence: ${gotWin.diff(wantWin).take(3)} vs ${wantWin.diff(gotWin).take(3)}")

    // s02 dual: stateful sessionization + end-of-stream flush
    val gotSes = EventsStream
      .sessionizeWithFinalFlush(Tables.df(spark, sf(), "events").as[Event])
      .collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start, s.session_end))
      .toSet
    val wantSes = graft.ExtensionQueries.queries("s02_sessionize")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    assert(gotSes == wantSes,
      s"s02 stream/oracle divergence: ${gotSes.diff(wantSes).take(3)} vs ${wantSes.diff(gotSes).take(3)}")
  }

  test("sessionization state carries across micro-batches (incremental == batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import EventsStream.Event

    // chronological thirds, so per-user order holds across batches — the
    // state machine must stitch sessions that SPAN batch boundaries
    val all = Tables.df(spark, sf(), "events").as[Event]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val cut1 = all(all.length / 3).ts
    val cut2 = all(2 * all.length / 3).ts
    val b1 = all.filter(e => e.ts.before(cut1))
    val b2 = all.filter(e => !e.ts.before(cut1) && e.ts.before(cut2))
    val b3 = all.filter(e => !e.ts.before(cut2))
    // per-user flush sentinels (same construction as sessionizeWithFinalFlush)
    val sentinels = all.groupBy(_.user_id).map { case (uid, evs) =>
      val lastSec = evs.map(e => Math.floorDiv(e.ts.getTime, 1000L)).max
      Event(-1L, new java.sql.Timestamp((lastSec + 1801L) * 1000L), uid,
        "__flush", 0.0, null)
    }.toSeq

    val input = MemoryStream[Event]
    val q = EventsStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("xbatch_sessions")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      Seq(b1.toSeq, b2.toSeq, b3.toSeq, sentinels).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("xbatch_sessions")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    val want = graft.ExtensionQueries.queries("s02_sessionize")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    assert(got == want,
      s"cross-batch sessionization diverged: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
  }

  test("quota state carries across micro-batches (transformWithState)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import EventsStream.Event

    // transformWithState requires the RocksDB provider (runtime conf —
    // read per query start)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // chronological halves: a user's quota must be CONSUMED in batch 1
    // and REMEMBERED in batch 2 — the ValueState carry
    val all = Tables.df(spark, sf(), "events").as[Event]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val cut = all(all.length / 2).ts
    val b1 = all.filter(e => e.ts.before(cut))
    val b2 = all.filter(e => !e.ts.before(cut))

    val input = MemoryStream[Event]
    val q = EventsStream.quotaPerUser(input.toDS().toDF(), n = 7)
      .writeStream.outputMode("append")
      .format("memory").queryName("xbatch_quota")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      Seq(b1.toSeq, b2.toSeq).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark.table("xbatch_quota")
      .select("event_id").collect().map(_.getLong(0)).toSet
    // batch contract at the same n: first 7 per user by (ts, event_id)
    val want = EventsStream.quotaPerUser(
        Tables.df(spark, sf(), "events"), n = 7)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"cross-batch quota diverged: ${got.diff(want).take(5)} vs ${want.diff(got).take(5)}")
    // and the batch contract is exactly the row_number form
    val rn = Tables.df(spark, sf(), "events")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")))
      .filter(col("rn") <= 7).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(want == rn)
  }

  test("stream-stream attribution join equals the gated s04 batch result") {
    // two separately-watched directories — genuinely independent streams
    val ev = Tables.df(spark, sf(), "events")
    val cDir = Files.createTempDirectory("clicks-stream").toString
    val pDir = Files.createTempDirectory("purchases-stream").toString
    ev.filter(col("event_type") === "click").coalesce(2)
      .write.mode("overwrite").parquet(cDir)
    ev.filter(col("event_type") === "purchase").coalesce(2)
      .write.mode("overwrite").parquet(pDir)

    val out = EventsStream.attribution(
      spark.readStream.schema(ev.schema).parquet(cDir),
      spark.readStream.schema(ev.schema).parquet(pDir),
      horizonMinutes = 360)
    // inner stream-stream joins emit on match in append mode; the
    // bounded time-range condition is what lets Spark EVICT buffered
    // state, so this same query runs forever at constant memory
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("attr_out")
      .select("click_id", "purchase_id", "user_id", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // the driver-gated batch form (s04 hash-matches its DuckDB oracle),
    // so equality here is transitively oracle parity for the stream
    val want = graft.ExtensionQueries.queries("s04_attribution")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want,
      s"s04 stream/batch divergence: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(got.nonEmpty, "no attribution pairs — gate is vacuous")
  }

  test("left-outer stream-stream attribution equals the gated s09 batch result") {
    val ev = Tables.df(spark, sf(), "events")
    val cDir = Files.createTempDirectory("clicks-outer").toString
    val pDir = Files.createTempDirectory("purch-outer").toString
    ev.filter(col("event_type") === "click").coalesce(2)
      .write.mode("overwrite").parquet(cDir)
    ev.filter(col("event_type") === "purchase").coalesce(2)
      .write.mode("overwrite").parquet(pDir)

    val out = EventsStream.attribution(
      spark.readStream.schema(ev.schema).parquet(cDir),
      spark.readStream.schema(ev.schema).parquet(pDir),
      horizonMinutes = 360, joinType = "left_outer")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()
    try {
      q.processAllAvailable()
      // an unmatched click only emits once the watermark passes its
      // horizon — push both watermarks far forward with a sentinel
      // event in each stream (excluded from the comparison below)
      val maxTs = ev.agg(max(col("ts"))).collect().head.getTimestamp(0)
      val future = new java.sql.Timestamp(maxTs.getTime + 86400000L * 30)
      val sentinel = Seq((-1L, future, -1L, "click", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .select(ev.schema.fieldNames.map(col): _*)
      sentinel.coalesce(1).write.mode("append").parquet(cDir)
      sentinel.withColumn("event_type", lit("purchase"))
        .coalesce(1).write.mode("append").parquet(pDir)
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
    val got = spark.table("attr_outer")
      .filter(col("click_id") >= 0 &&
        (col("purchase_id").isNull || col("purchase_id") >= 0))
      .select("click_id", "purchase_id").collect().map(key).toSet
    // transitively oracle parity: s09 hash-matches its DuckDB oracle
    val want = graft.ExtensionQueries.queries("s09_attribution_outer")(
        spark, sf())
      .filter(col("click_id") >= 0)
      .select("click_id", "purchase_id").collect().map(key).toSet
    assert(want.exists(_._2.isEmpty), "no unmatched clicks — test is vacuous")
    assert(got == want,
      s"s09 stream/batch divergence: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
  }

  test("multimodal: partition-batched feature extraction is deterministic") {
    import graft.functions.Multimodal
    val media = Multimodal.syntheticMedia(Tables.df(spark, sf(), "documents"))
    val rows = media.select("media_id", "kind", "content")
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(rows).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(rows.repartition(7))
      .orderBy("media_id").collect()
    assert(f1.length == 500)
    // determinism across partitionings (the decode stub is pure)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.head.features.length == 8)
    // binary pruning: metadata-only projection must not read `content`
    val metaOnly = media.select("media_id", "kind")
    assert(!metaOnly.queryExecution.executedPlan.toString.contains("content"))
  }
}
