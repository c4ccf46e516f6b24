package graft.pipeline

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.streaming.EventsStream

/** Drives [[Pipeline.runStreaming]] over a LIVE directory: event files
  * arrive one at a time (plus a final per-user flush file for the
  * sessionizer), and the maintained outputs must equal the driver-gated
  * s01/s02 batch results row-for-row — transitively, DuckDB-oracle
  * parity for the streaming pipeline entry point.
  */
class PipelineStreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Write the events table as N chronological parquet files under a
    * fresh watch directory, returned in feed order (chronological
    * thirds, so per-user event order holds across file boundaries —
    * sessions must stitch across increments).
    */
  private def stagedIncrements(watchDir: Path, n: Int): Seq[Path] = {
    val all = Tables.df(spark, sf(), "events").as[EventsStream.Event]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val staging = Files.createTempDirectory("events-staging")
    val cuts = (1 until n).map(k => all(k * all.length / n).ts)
    val parts = (0 until n).map { k =>
      all.filter { e =>
        (k == 0 || !e.ts.before(cuts(k - 1))) &&
          (k == n - 1 || e.ts.before(cuts(k)))
      }
    }
    val perUserFlush = all.groupBy(_.user_id).map { case (uid, evs) =>
      val lastSec = evs.map(e => Math.floorDiv(e.ts.getTime, 1000L)).max
      EventsStream.Event(-1L, new java.sql.Timestamp((lastSec + 1801L) * 1000L),
        uid, "__flush", 0.0, null)
    }.toSeq
    // one global sentinel far past everything: advances the WATERMARK
    // beyond every real window so an append-mode file sink emits them
    // all (per-user flushes close sessions but can sit well before the
    // global max event time). Its own one-event session stays in state.
    val globalLastSec = all.map(e => Math.floorDiv(e.ts.getTime, 1000L)).max
    val flush = perUserFlush :+ EventsStream.Event(-2L,
      new java.sql.Timestamp((globalLastSec + 7 * 3600L) * 1000L),
      -999L, "__flush", 0.0, null)
    (parts :+ flush.toArray).zipWithIndex.map { case (part, k) =>
      val dir = staging.resolve(s"part$k")
      spark.createDataset(part.toSeq).coalesce(1).write.parquet(dir.toString)
      val file = Files.list(dir).iterator()
      var found: Path = null
      while (file.hasNext) {
        val p = file.next()
        if (p.getFileName.toString.endsWith(".parquet")) found = p
      }
      found
    }
  }

  test("runStreaming over arriving files == gated s01/s02 results") {
    val watchDir = Files.createTempDirectory("events-watch")
    val increments = stagedIncrements(watchDir, 3)

    val run = Pipeline.runStreaming(spark, watchDir.toString,
      Pipeline.MemoryTables("pipe_stream"))
    try {
      increments.zipWithIndex.foreach { case (file, k) =>
        Files.copy(file, watchDir.resolve(s"increment$k.parquet"))
        run.processAllAvailable()
      }
    } finally run.stop()

    // s01 parity — note the flush file adds synthetic "__flush" events to
    // the windowed stream too; exclude them from the comparison (they
    // exist only to close sessions)
    val gotWin = spark.table("pipe_stream_windowed")
      .filter(col("event_type") =!= "__flush")
      .select("win_start", "event_type", "n", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val wantWin = graft.ExtensionQueries.queries("s01_event_window")(spark, sf())
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(gotWin == wantWin,
      s"windowed stream/oracle divergence: ${gotWin.diff(wantWin).take(3)} vs ${wantWin.diff(gotWin).take(3)}")

    // s02 parity — the flush file closed every user's final session
    val gotSes = spark.table("pipe_stream_sessions")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    val wantSes = graft.ExtensionQueries.queries("s02_sessionize")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    assert(gotSes == wantSes,
      s"session stream/oracle divergence: ${gotSes.diff(wantSes).take(3)} vs ${wantSes.diff(gotSes).take(3)}")
  }

  test("runStreaming to parquet directories appends closed results") {
    val watchDir = Files.createTempDirectory("events-watch-pq")
    val outDir = Files.createTempDirectory("events-out-pq")
    val increments = stagedIncrements(watchDir, 2)

    val run = Pipeline.runStreaming(spark, watchDir.toString,
      Pipeline.ParquetDir(outDir.toString))
    try {
      increments.zipWithIndex.foreach { case (file, k) =>
        Files.copy(file, watchDir.resolve(s"increment$k.parquet"))
        run.processAllAvailable()
      }
    } finally run.stop()

    // sessions: file sink appends exactly the closed sessions — with the
    // flush increment that is ALL sessions (the gated s02 result)
    val gotSes = spark.read.parquet(s"$outDir/sessions")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    val wantSes = graft.ExtensionQueries.queries("s02_sessionize")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    assert(gotSes == wantSes)

    // windowed: append mode emits only watermark-closed windows — a
    // subset of the batch result, never disagreeing rows (correct
    // continuous-operation semantics; the flush events sit far past the
    // real data, so every real window has been closed and emitted)
    val got = spark.read.parquet(s"$outDir/windowed")
      .filter(col("event_type") =!= "__flush")
      .select("win_start", "event_type", "n", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = graft.ExtensionQueries.queries("s01_event_window")(spark, sf())
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want,
      s"append-mode windows diverge: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
  }
}
