package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — the streaming extension
  * (SURVEY.md §7.6; the reference is strictly batch, §2.E).
  *
  * Batch and stream share the same logical transformations: the batch
  * queries in [[graft.ExtensionQueries]] (s01/s02) are the
  * `Trigger.AvailableNow`-style materializations of these plans, which is
  * exactly the contract Structured Streaming is built on (a stream is an
  * incrementally-executed batch plan).
  */
object EventsStream {

  /** The events schema (TESTDATA.md), for `readStream` (streaming sources
    * must declare schemas — no inference at runtime).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet/json files. */
  def readEvents(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventsSchema).format(format).load(dir)

  /** Tumbling-window aggregation with a watermark: late events beyond
    * 10 minutes are dropped, state is bounded (the scale requirement —
    * unbounded state is the classic streaming OOM at 100 TB/day rates).
    */
  def windowedCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "10 minutes",
      setWatermark: Boolean = true): DataFrame =
    // setWatermark = false when composing after an operator that already
    // declared the event-time watermark (e.g. [[dedupEvents]]) — Spark
    // disallows redefining it within one query
    (if (setWatermark) events.withWatermark("ts", watermark) else events)
      .groupBy(window(col("ts"), window_), col("event_type"))
      // decimal-summed value: exact, order-independent arithmetic, so the
      // incremental stream aggregation is bit-identical to the batch
      // (and DuckDB-oracle-gated) s01 plan — a float sum would drift by
      // ulps with partial-aggregation order
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Windowed heavy hitters — the "top talkers per hour" monitor every
    * ingest pipeline runs, as a SKETCH under streaming: per tumbling
    * window, the top `k` items by a Misra–Gries summary
    * ([[graft.functions.expressions.FrequentItems]]) of `capacity`
    * counters, so per-window state is `capacity` entries NO MATTER how
    * many distinct items the window sees — the property that keeps a
    * 100 TB/day stream's aggregation state bounded where an exact
    * per-(window, item) count grows with the key cardinality. The
    * summary is a TypedImperativeAggregate with map-side partials, and
    * the identical plan runs batch or streaming (`withWatermark` is a
    * no-op on batch frames — the [[windowedCounts]] convention;
    * EventsStreamSpec pins stream == batch). Below `capacity` distinct
    * items per window the summary is provably exact (the x10 regime —
    * the s15 gate's DuckDB oracle is the TRUE per-window top-k);
    * above, counts carry the documented ≤ n/capacity undercount.
    * Schema out: (win_start, rank, item, n).
    */
  def windowedHeavyHitters(events: DataFrame, item: Column,
      capacity: Int = 1024, k: Int = 5,
      window_ : String = "1 hour", watermark: String = "10 minutes",
      setWatermark: Boolean = true): DataFrame =
    (if (setWatermark) events.withWatermark("ts", watermark) else events)
      .groupBy(window(col("ts"), window_))
      .agg(graft.functions.expressions.FrequentItems(
        item.cast(StringType), capacity, k).as("top"))
      .select(col("window.start").as("win_start"),
        posexplode(col("top")).as(Seq("i", "tw")))
      .select(col("win_start"), (col("i") + 1).cast(LongType).as("rank"),
        col("tw.item").as("item"), col("tw.n").as("n"))

  /** Stream–static enrichment: join each event to a static (or
    * slowly-changing, re-read per micro-batch) dimension table, then
    * the watermarked tumbling-window aggregate per (window, dimension
    * attribute) — the canonical ingest shape "events by customer
    * segment per hour". The dimension is broadcast (small by
    * contract: a dimension that doesn't fit a broadcast belongs in a
    * stream-stream join with its own watermark); a stream–static INNER
    * join is stateless in Structured Streaming — each micro-batch
    * probes the broadcast hash table, no join state accumulates — so
    * the only stateful operator is the windowed aggregate, whose state
    * the watermark bounds.
    *
    * Batch and stream run the IDENTICAL plan (`withWatermark` is a
    * no-op on batch frames), and the decimal-summed value keeps the
    * incremental aggregation bit-identical to the batch oracle (the
    * [[windowedCounts]] convention). Schema out:
    * (win_start, win_end, segment, n, total_value).
    */
  def enrichedCounts(events: DataFrame, dim: DataFrame,
      eventKey: org.apache.spark.sql.Column,
      dimKey: org.apache.spark.sql.Column,
      attr: org.apache.spark.sql.Column,
      window_ : String = "1 hour", watermark: String = "10 minutes",
      setWatermark: Boolean = true): DataFrame = {
    val d = broadcast(dim.select(dimKey.as("__k"), attr.as("segment")))
    val wm = if (setWatermark) events.withWatermark("ts", watermark)
      else events
    wm.join(d, eventKey === col("__k"))
      .groupBy(window(col("ts"), window_), col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("segment"), col("n"), col("total_value"))
  }

  /** Exactly-once ingestion under at-least-once delivery: drop
    * redelivered events by `event_id`. On a stream this is
    * `dropDuplicatesWithinWatermark` — dedup state is EVICTED once the
    * watermark passes an event's time, so state stays bounded no matter
    * how long the stream runs (the plain streaming `dropDuplicates`
    * keeps every id forever — the classic slow OOM); redeliveries are
    * only expected within the delivery-retry horizon, which is what the
    * watermark models. On a batch frame the same call is a plain
    * dropDuplicates (batch sees all data at once). Composes in front of
    * [[windowedCounts]]/[[sessionize]] — multiple stateful operators in
    * one streaming query are supported on Spark 4.
    */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** CONTENT-keyed ingest dedup — drop events whose normalized content
    * ([[graft.functions.TextFunctions.fingerprint]]: lowercase,
    * punctuation stripped, whitespace collapsed, md5) was already seen.
    * This is the ingest-time case [[dedupEvents]]'s id-keyed dedup
    * misses: the same article re-crawled or re-posted under a FRESH
    * event id. On a stream, `dropDuplicatesWithinWatermark` on the
    * fingerprint keeps state bounded forever (content older than the
    * watermark horizon is evicted — a re-post beyond the horizon is
    * accepted as fresh, the modeled product decision); on a batch
    * frame the keep-one is the deterministic min-event_id
    * ([[graft.functions.Dedup.dedupExact]] — a partial-aggregatable
    * min, since batch has no arrival order to prefer). Both keep
    * exactly ONE row per distinct fingerprint; which row survives
    * differs by mode (arrival order vs min id) — spec-pinned.
    *
    * Normalization contract: the fingerprint's canonicalization is
    * ASCII-oriented (it strips every character outside `[a-z0-9 ]`), so
    * content that is ENTIRELY non-Latin (CJK, Cyrillic, emoji) would
    * normalize to the empty string — and a naive fingerprint key would
    * collapse every such event into one survivor (silent data loss on
    * multilingual ingest). Guard: when the normalized form is empty,
    * the key falls back to a domain-separated hash of the RAW content —
    * non-Latin events still dedup on exact content equality, they just
    * don't get the formatting-robust canonicalization (which has no
    * meaning for scripts it would erase).
    */
  /** Keep-first dedup on an ARBITRARY key expression — the generic
    * form of [[dedupByContent]] for keys that are already canonical
    * (a canonicalized URL, an external content id): on a stream,
    * `dropDuplicatesWithinWatermark` keyed on the expression (state
    * evicted as the watermark passes — bounded forever); on a batch
    * frame, the deterministic min-`id` keep-one
    * ([[graft.functions.Dedup.dedupExact]]). No normalization is
    * applied to the key — canonicalize BEFORE keying (that's the
    * caller's stage, e.g. [[graft.functions.TextFunctions.canonicalizeUrl]]).
    */
  def dedupByKey(events: DataFrame, key: org.apache.spark.sql.Column,
      watermark: String = "10 minutes",
      id: org.apache.spark.sql.Column = col("event_id"),
      setWatermark: Boolean = true): DataFrame = {
    val keyed = events.withColumn("__k", key)
    if (events.isStreaming) {
      val wm = if (setWatermark) keyed.withWatermark("ts", watermark)
        else keyed // already watermarked upstream (one per query)
      wm.dropDuplicatesWithinWatermark("__k").drop("__k")
    } else
      graft.functions.Dedup.dedupExact(keyed, col("__k"), id)
        .drop("__k")
  }

  def dedupByContent(events: DataFrame, content: org.apache.spark.sql.Column,
      watermark: String = "10 minutes",
      id: org.apache.spark.sql.Column = col("event_id"),
      setWatermark: Boolean = true): DataFrame = {
    val normalized = regexp_replace(
      regexp_replace(lower(content), "[^a-z0-9 ]", ""), " +", " ")
    val keyed = events.withColumn("__fp",
      when(trim(normalized) === "",
        md5(concat(lit("graft:raw:"), content)))
        .otherwise(graft.functions.TextFunctions.fingerprint(content)))
    if (events.isStreaming) {
      val wm = if (setWatermark) keyed.withWatermark("ts", watermark)
        else keyed // already watermarked upstream (one per query)
      wm.dropDuplicatesWithinWatermark("__fp").drop("__fp")
    } else
      graft.functions.Dedup.dedupExact(keyed, col("__fp"), id)
        .drop("__fp")
  }

  /** Click→purchase attribution: every (click, purchase) pair for the
    * same user where the purchase lands within `horizonMinutes` after
    * the click (inclusive bounds) — the canonical STREAM-STREAM interval
    * join. On streams, both sides carry event-time watermarks and the
    * join condition bounds `purchase_ts` to a finite window after
    * `click_ts`, which is exactly what lets Structured Streaming EVICT
    * join state: a buffered click older than watermark − horizon can
    * never match again and is dropped, so state stays bounded at any
    * rate (an unbounded-condition stream-stream join grows state
    * forever — the slow OOM). On batch frames the watermarks are
    * analyzer-eliminated and the same plan is an ordinary equi-join on
    * user_id with a time-range filter — the s04-gated form; the
    * streaming result is spec-gated equal to it (EventsStreamSpec).
    * Batch at scale note: for a skewed pure-range workload prefer
    * [[graft.operators.RangeJoin.pointInInterval]]; here the equi-key
    * (user_id) already carries the join and the horizon filter prunes
    * per-key pairs.
    */
  /** Click→purchase attribution: stream-stream interval join. INNER
    * emits on match; `joinType = "left_outer"` also emits every click
    * with NO purchase inside the horizon (null purchase columns) —
    * in streaming the unmatched row is emitted only once the
    * watermark passes the click's horizon, so state stays bounded
    * AND the "did not convert" signal is complete. Both modes run at
    * constant memory because the time-range condition lets Spark
    * evict buffered rows past the watermark.
    */
  def attribution(clicks: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 60, watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    require(horizonMinutes > 0, "attribution: horizonMinutes must be positive")
    require(Set("inner", "left_outer").contains(joinType),
      s"attribution: joinType must be inner or left_outer, got $joinType")
    val c0 = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val p0 = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("purchase_ts"),
      col("value"))
    val c = if (clicks.isStreaming) c0.withWatermark("click_ts", watermark) else c0
    val p = if (purchases.isStreaming) p0.withWatermark("purchase_ts", watermark) else p0
    c.join(p,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  // ---- stateful sessionization ----------------------------------------

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class SessionState(sessionId: Long, start: Option[Timestamp],
      last: Option[Timestamp], n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** `unix_timestamp` semantics: floor of the epoch second. Gap checks
    * use this so the state machine agrees with the batch s02 plan
    * (`unix_timestamp(ts) - unix_timestamp(prev) > gap`) on every
    * borderline sub-second case.
    */
  private def epochSec(t: Timestamp): Long = Math.floorDiv(t.getTime, 1000L)

  /** Full-precision ordering key: epoch millis plus the complete
    * sub-second nano field (events carry microsecond timestamps — an
    * ms-truncated sort would mis-order same-millisecond events relative
    * to the batch `ORDER BY ts, event_id`).
    */
  private def orderKey(e: Event): (Long, Int, Long) =
    (e.ts.getTime, e.ts.getNanos, e.event_id)

  /** Custom state machine via flatMapGroupsWithState: a session closes
    * after `gapSeconds` of inactivity (or on state timeout in continuous
    * operation). Emits closed sessions — the streaming dual of the batch
    * s02_sessionize query, with identical arithmetic: floor-second gap
    * comparison, full-precision event ordering, and original (µs)
    * timestamps in the emitted session bounds.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(orderKey)
          var st = state.getOption.getOrElse(SessionState(0L, None, None, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            st.last match {
              case None =>
                st = SessionState(st.sessionId + 1, Some(e.ts), Some(e.ts), 1L)
              case Some(last) if epochSec(e.ts) - epochSec(last) > gapSeconds =>
                out += SessionOut(userId, st.sessionId, st.n, st.start.get, last)
                st = SessionState(st.sessionId + 1, Some(e.ts), Some(e.ts), 1L)
              case Some(last) =>
                st = st.copy(
                  last = Some(if (e.ts.after(last)) e.ts else last),
                  n = st.n + 1)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** [[sessionize]] plus an end-of-stream flush: appends one sentinel
    * event per user just past that user's last activity + gap, which
    * forces the state machine to close (and therefore EMIT) the final,
    * still-open session of every user. The sentinel's own one-event
    * session stays in state and is never emitted. With the flush, the
    * batch/AvailableNow output matches the batch s02 sessionization
    * exactly — every session appears, including each user's last.
    */
  def sessionizeWithFinalFlush(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val sentinels = events.groupByKey(_.user_id).mapGroups { (uid, it) =>
      val lastSec = it.map(e => epochSec(e.ts)).max
      // strictly beyond the gap in floor-second arithmetic
      Event(-1L, new Timestamp((lastSec + gapSeconds + 1L) * 1000L), uid,
        "__flush", 0.0, null)
    }
    sessionize(events.unionByName(sentinels), gapSeconds)
  }

  // ---- per-key quota via transformWithState (Spark 4 state API) -------

  case class QuotaOut(event_id: Long, user_id: Long, event_type: String,
      value: Double)

  /** The [[quotaPerUser]] state machine on Spark 4's
    * `transformWithState` API — the arbitrary-state successor to
    * `flatMapGroupsWithState` ([[sessionize]] keeps the older API so
    * the library demonstrates both): typed `ValueState` handles from
    * the processor handle, explicit `TimeMode`/`TTLConfig`, and the
    * same processor runs unchanged in BATCH mode (how the s08 gate
    * executes it against the SQL oracle).
    *
    * State per user is ONE long (events emitted so far) — bounded
    * regardless of stream length; at 100 TB/day ingest the state
    * store holds |users| longs, not events.
    */
  class QuotaProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, QuotaOut] {
    @transient private var emitted:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      emitted = getHandle.getValueState[Long]("emitted",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[QuotaOut] = {
      // deterministic within an invocation: full-precision event-time
      // order (matches the batch ORDER BY ts, event_id exactly)
      val sorted = rows.toVector.sortBy(orderKey)
      val sofar = if (emitted.exists()) emitted.get() else 0L
      val room = math.min(math.max(0L, n - sofar), sorted.size.toLong).toInt
      val kept = sorted.take(room)
      if (kept.nonEmpty) emitted.update(sofar + kept.size)
      kept.iterator.map(e =>
        QuotaOut(e.event_id, e.user_id, e.event_type, e.value))
    }
  }

  /** First-`n`-events-per-user quota — the per-entity rate cap every
    * ingest pipeline carries (abuse control, per-source contribution
    * caps, free-tier limits). In batch the kept set is exactly the
    * first `n` by (ts, event_id) per user (the s08-gated contract); on
    * a stream the quota is consumed in arrival order, which equals the
    * batch result whenever micro-batches arrive in event-time order
    * (the spec's replay pins stream == batch).
    */
  def quotaPerUser(events: DataFrame, n: Int,
      watermark: String = "1 hour"): DataFrame = {
    require(n > 0, "quotaPerUser: n must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    // batch-mode transformWithState loads REAL state stores, whose
    // maintenance reports to the StateStoreCoordinator RPC endpoint —
    // registered by the StreamingQueryManager's constructor, which a
    // purely-batch session never builds. Touch it so the endpoint
    // exists before any task loads a store.
    spark.streams
    val ds = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"), col("props")).as[Event]
    val src = if (ds.isStreaming) ds.withWatermark("ts", watermark) else ds
    src.groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
