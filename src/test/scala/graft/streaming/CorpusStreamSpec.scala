package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Streaming corpus curation: quality gate (stateless) + watermarked
  * content dedup (stateful) composed in ONE streaming query, pinned to
  * the s06-gated batch form (the s01/s03 parity pattern — s06
  * hash-matches its DuckDB oracle every round, so equality here is
  * transitively oracle parity for the streaming path).
  */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fp(c: org.apache.spark.sql.Column) =
    graft.functions.TextFunctions.fingerprint(c)

  test("curated ingest: file stream keeps exactly the batch survivor content set") {
    // originals + every-4th re-posted under a fresh id (the s06 plant),
    // with a deterministic event time for the watermark
    val d = Tables.df(spark, sf(), "documents")
    // 1704067200 = 2024-01-01T00:00:00Z
    val originals = d.select(col("doc_id"), col("text"),
      timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
    val reposts = d.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"),
        timestamp_seconds(lit(1704069200L) + col("doc_id")).as("ts"))
    val dir = Files.createTempDirectory("corpus-stream").toString
    originals.coalesce(1).write.mode("append").parquet(dir)
    reposts.coalesce(1).write.mode("append").parquet(dir)

    val stream = CorpusStream.curatedIngest(
      CorpusStream.readDocs(spark, dir), col("text"), col("doc_id"),
      watermark = "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("s06_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("s06_out").select(fp(col("text")).as("f"))
      .collect().map(_.getString(0)).toSeq
    // survivor CONTENT is arrival-order-independent (which id survives
    // is not — the MemoryStream test below pins that): compare sets
    val want = CorpusStream.curatedIngest(
        originals.unionByName(reposts), col("text"), col("doc_id"))
      .select(fp(col("text")).as("f")).collect().map(_.getString(0)).toSeq
    assert(got.distinct.lengthCompare(got.length) == 0,
      "streaming emitted a duplicated fingerprint")
    assert(got.sorted == want.sorted,
      "streaming and batch keep different content sets")
    assert(got.nonEmpty, "curated ingest kept nothing — gate is vacuous")
    // every survivor passed the quality gate
    val nFail = spark.table("s06_out").filter(
      !graft.functions.TextFunctions.gopherRules(col("text"))
        .getField("pass")).count()
    assert(nFail == 0, s"$nFail survivors fail the Gopher gate")
  }

  test("web ingest: file stream keeps exactly the batch survivor set " +
      "(both stateful stages)") {
    // the s17 crawl: markup wrappers on every 4th doc, synthesized URL
    // variants with per-decade keep-first pairs, re-posts under fresh
    // ids — a re-post gets a fresh canonical URL (passes the URL
    // stage) and the same fingerprint (dies at the content stage)
    val d = Tables.df(spark, sf(), "documents")
    val base = d.select(col("doc_id"), col("text"))
    val all = base.unionByName(base.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    val pid = when(col("doc_id") % 10 < 2,
      col("doc_id") - (col("doc_id") % 10)).otherwise(col("doc_id"))
    val crawl = all.select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("<p>"), col("text"), lit("</p>")))
        .otherwise(col("text")).as("raw"),
      when(col("doc_id") % 2 === 0,
        concat(lit("HTTP://WWW.web"), (pid % 40).cast("string"),
          lit(".COM:80/a/"), pid.cast("string"),
          lit("/?utm_source=x&b=2&a=1#f")))
        .otherwise(concat(lit("http://web"), (pid % 40).cast("string"),
          lit(".com/a/"), pid.cast("string"), lit("?a=1&b=2")))
        .as("url"),
      timestamp_seconds(lit(1704067200L) + col("doc_id")).as("ts"))
    val quality = Some(graft.functions.TextFunctions.gopherRules(
      col("text"), minWords = 10).getField("pass"))
    val dir = Files.createTempDirectory("web-stream").toString
    // two drops in id order so first-arrival == min-id survivors
    crawl.filter(col("doc_id") < 1000000L).orderBy("doc_id").coalesce(1)
      .write.mode("append").parquet(dir)
    crawl.filter(col("doc_id") >= 1000000L).orderBy("doc_id").coalesce(1)
      .write.mode("append").parquet(dir)
    val schema = crawl.schema
    val stream = CorpusStream.curatedWebIngest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir),
      col("url"), col("raw"), col("doc_id"),
      watermark = "24 hours", quality = quality)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("s17_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s17_out").select("doc_id", "url", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    val want = CorpusStream.curatedWebIngest(crawl, col("url"),
        col("raw"), col("doc_id"), quality = quality)
      .select("doc_id", "url", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == want,
      s"stream/batch divergence: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(got.nonEmpty, "web ingest kept nothing — a stage is vacuous")
    // both stateful stages did real work: some id collapsed at the URL
    // stage, and every re-post collapsed at the fingerprint stage
    assert(!got.exists(_._1 >= 1000000L), "re-posts must die on content")
    val urlDupIds = got.map(_._1).filter(i => i % 10 == 1)
    assert(urlDupIds.isEmpty, "decade+1 docs must die on canonical URL")
  }

  test("curated ingest: cross-batch dedup state pins first-arrival == min-id survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ≥50 words, mean word length in [3,10], ≥2 stopwords, all-alpha —
    // passes every Gopher rule; 6×11 = 66 words
    val passing = Seq.fill(6)(
      "the storm and rain that have come with thunder over mountains")
      .mkString(" ")
    val passingB = Seq.fill(6)(
      "the river and stone that have stood with silence under starlight")
      .mkString(" ")
    val failing = "too short" // fails the 50-word minimum

    def doc(id: Long, text: String, minute: Int): (Long, String, Timestamp) =
      (id, text, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"))

    val input = MemoryStream[(Long, String, Timestamp)]
    val q = CorpusStream.curatedIngest(
        input.toDS().toDF("doc_id", "text", "ts"), col("text"),
        col("doc_id"), watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("s06_xbatch")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: two distinct passing docs + a failing one
      input.addData(doc(1, passing, 0), doc(2, passingB, 1), doc(3, failing, 2))
      q.processAllAvailable()
      // batch 2: re-posts under fresh ids — the passing re-post must hit
      // batch-1 dedup STATE and drop; the failing re-post dies at the
      // gate before ever reaching the stateful operator
      input.addData(doc(100, passing, 5), doc(101, failing, 6))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("s06_xbatch").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"got $got")

    // batch form on the same rows: min-id keep-one lands on the same set
    val batch = Seq(doc(1, passing, 0), doc(2, passingB, 1),
      doc(3, failing, 2), doc(100, passing, 5), doc(101, failing, 6))
      .toDF("doc_id", "text", "ts")
    val want = CorpusStream.curatedIngest(batch, col("text"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want == got, s"stream $got != batch $want")
  }

  test("quality override composes: Gopher ∧ C4 conjunction gates harder") {
    import graft.functions.TextFunctions
    // C4 needs ≥3 terminal-punctuated ≥5-word lines; gopher-passing text
    // without them fails the conjunction
    val c4ok = Seq.fill(3)(
      "the storm and rain that have come with thunder tonight.")
      .mkString("\n") + "\n" +
      Seq.fill(5)("the river and stone that have stood with silence here.")
        .mkString("\n")
    val gopherOnly = Seq.fill(6)(
      "the storm and rain that have come with thunder over mountains")
      .mkString(" ")
    val df = Seq((1L, c4ok), (2L, gopherOnly)).toDF("doc_id", "text")
    val both = TextFunctions.gopherRules(col("text")).getField("pass") &&
      TextFunctions.c4Filters(col("text")).getField("pass")
    val out = CorpusStream.curatedIngest(df, col("text"), col("doc_id"),
        quality = Some(both))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"got $out")
  }

  test("streaming BPE encode re-reads the model artifact each batch " +
      "(a retrain between batches is picked up, never half-applied)") {
    import graft.functions.TextFunctions
    val root = Files.createTempDirectory("bpe-stream").toString
    val model = s"$root/model"
    val in = s"$root/in"
    val out = s"$root/out"
    // model v1: merge (l,o) only
    val corpusV1 = Seq("lo lo lo").toDF("text")
    TextFunctions.writeBpeModel(corpusV1, col("text"), model, numMerges = 1)
    val docs = Seq((1L, "low")).toDF("doc_id", "text")
    docs.coalesce(1).write.mode("append").parquet(in)

    def runBatch(ckpt: String): Map[(Long, Int), String] = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = CorpusStream.bpeEncodeIngest(stream, col("doc_id"),
        col("text"), model, out, checkpointPath = Some(s"$root/$ckpt"),
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
      spark.read.parquet(out).drop("batch").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    }

    // batch 1 under model v1: "low" -> lo|w
    val got1 = runBatch("ckpt1")
    assert(got1 === Map((1L, 0) -> "lo", (1L, 1) -> "w"))

    // retrain: model v2 learns (l,o) then (lo,w); the next batch (same
    // doc re-delivered as a new file) must see the NEW merges
    val corpusV2 = Seq("low low low").toDF("text")
    TextFunctions.writeBpeModel(corpusV2, col("text"), model, numMerges = 2)
    docs.select((col("doc_id") + 1).as("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(in)
    val got2 = runBatch("ckpt1")
    assert(got2((2L, 0)) === "low", s"retrained merge not picked up: $got2")
    // batch 1's output is untouched (idempotent batch dirs)
    assert(got2((1L, 0)) === "lo" && got2((1L, 1)) === "w")
  }

  test("chunk ingest: streamed grid == one-shot batch grid; carry " +
      "persisted per epoch; restart with nothing new changes nothing") {
    import graft.functions.TextFunctions
    val root = Files.createTempDirectory("chunk-stream").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val docs = Seq(
      ("en", 1L, 300L), ("en", 2L, 600L), ("en", 3L, 124L),
      ("en", 4L, 200L), ("de", 10L, 1100L)
    ).toDF("lang", "doc_id", "n_toks")
    // two in-order drops -> two micro-batches
    docs.filter(col("doc_id") <= 2L).orderBy(col("doc_id")).coalesce(1)
      .write.mode("append").parquet(in)
    docs.filter(col("doc_id") > 2L).orderBy(col("doc_id")).coalesce(1)
      .write.mode("append").parquet(in)
    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = CorpusStream.chunkIngest(stream, stratumName = "lang",
        orderName = "doc_id", tokensName = "n_toks", seqLen = 512L,
        outPath = out, checkpointPath = Some(s"$root/ckpt"),
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
    }
    run()
    def spans = spark.read.parquet(out).drop("batch")
      .orderBy(col("stratum"), col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    val oneShot = TextFunctions.packChunks(docs, col("lang"),
        col("doc_id"), col("n_toks"), seqLen = 512L)
      .select(col("lang").as("stratum"), col("chunk_id"), col("doc_id"),
        col("doc_offset"), col("chunk_offset"), col("n_span_tokens"))
      .orderBy(col("stratum"), col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    val streamed = spans
    assert(streamed === oneShot, "streamed grid diverged from one-shot")
    // the carry advanced once per batch: epochs 1 and 2 on disk, en at
    // 900 tokens after batch 0 (docs 1+2), 1224 after batch 1
    val c1 = spark.read.parquet(s"$out/_carry/epoch=1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 === Map("en" -> 900L))
    val c2 = spark.read.parquet(s"$out/_carry/epoch=2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2 === Map("en" -> 1224L, "de" -> 1100L))
    // restart over the same checkpoint with nothing new: no-op
    run()
    assert(spans === oneShot)

    // ---- compaction (p17): fold the per-batch dirs into one --------
    import graft.functions.Curation
    assert(new java.io.File(out).listFiles()
      .count(_.getName.startsWith("batch=")) === 2)
    Curation.compactChunkBatches(spark, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(dirs === Seq("batch=1"), s"expected one folded dir, got $dirs")
    assert(spans === oneShot, "compaction changed the grid")
    // carry and lineage survive the swap; fold markers exist
    assert(new java.io.File(s"$out/_carry/epoch=2").isDirectory)
    assert(new java.io.File(s"$out/_stream_lineage").exists)
    assert(new java.io.File(s"$out/_compacted/0").exists &&
      new java.io.File(s"$out/_compacted/1").exists)
    // a REPLAY of a folded batch must be skipped — an overwrite of the
    // consolidated batch=1 dir would destroy batch 0's folded rows
    CorpusStream.chunkIngestStep(docs.filter(col("doc_id") > 2L), 1L,
      "lang", "doc_id", "n_toks", 512L, out)
    assert(spans === oneShot, "folded-batch replay clobbered the tree")
    // the stream itself continues past the compaction: a restart over
    // the same checkpoint with nothing new stays a no-op on the
    // compacted tree
    run()
    assert(spans === oneShot)
  }

  test("chunk compaction recovery: a swap interrupted between the " +
      "aside rename and the swap-in is finished by the next ingest") {
    import graft.functions.Curation
    val root = Files.createTempDirectory("chunk-recover").toString
    val in = s"$root/in"
    val out = s"$root/out"
    val docs = Seq(("en", 1L, 300L), ("en", 2L, 600L))
      .toDF("lang", "doc_id", "n_toks")
    docs.orderBy(col("doc_id")).coalesce(1)
      .write.mode("append").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = CorpusStream.chunkIngest(stream, stratumName = "lang",
      orderName = "doc_id", tokensName = "n_toks", seqLen = 512L,
      outPath = out, checkpointPath = Some(s"$root/ckpt"),
      trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
    val before = spark.read.parquet(out).drop("batch")
      .orderBy(col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    // simulate the compaction crash window: staged tree fully written,
    // live renamed aside, swap-in never ran
    Curation.compactChunkBatches(spark, out)
    val live = new java.io.File(out)
    val staged = new java.io.File(s"$out-compacting")
    val aside = new java.io.File(s"$out-old")
    assert(live.renameTo(staged))
    assert(staged.isDirectory && !live.exists)
    // next verb entry runs recoverSwap: the staged tree is complete
    // (the aside rename is ordered after staging), so it swaps in
    Curation.compactChunkBatches(spark, out)
    assert(live.isDirectory && !aside.exists)
    val after = spark.read.parquet(out).drop("batch")
      .orderBy(col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(after === before, "recovered tree diverged")
  }

  test("span-index ingest binds the index to ONE checkpoint lineage: a " +
      "fresh checkpoint over a stream-grown index fails loudly; the " +
      "original checkpoint restarts fine") {
    import graft.functions.Dedup
    val root = Files.createTempDirectory("span-lineage").toString
    val idx = s"$root/idx"
    val in = s"$root/in"
    val out = s"$root/out"
    val docs = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    Dedup.writeCorpusSpanIndex(docs.limit(0), col("doc_id"), col("text"),
      idx, k = 8)
    docs.coalesce(1).write.mode("append").parquet(in)
    def run(ckpt: String): Unit = {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = CorpusStream.repeatedSpansIngest(stream, col("doc_id"),
        col("text"), idx, out, checkpointPath = Some(s"$root/$ckpt"),
        trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination()
    }
    run("ckptA")
    assert(new java.io.File(s"$idx/hashes/epoch=1").exists(),
      "first run must grow the index")
    // same lineage restarting (nothing new to process) is fine
    run("ckptA")
    // a FRESH checkpoint over the grown index restarts batch ids at 0
    // and would overwrite epoch=1 — must fail loudly instead (ADVICE
    // r15), before any query starts
    val e = intercept[IllegalStateException] { run("ckptB") }
    assert(e.getMessage.contains("different checkpoint lineage"),
      s"wrong error: ${e.getMessage}")
    // no checkpoint at all over a grown index is the same hazard
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val e2 = intercept[IllegalStateException] {
      CorpusStream.repeatedSpansIngest(stream, col("doc_id"),
        col("text"), idx, out)
    }
    assert(e2.getMessage.contains("no checkpoint"),
      s"wrong error: ${e2.getMessage}")
    // marker lost (a maintenance swap can eat it): an ESTABLISHED
    // checkpoint re-adopts — its batch ids continue monotonically, so
    // re-binding is safe — and the marker is restored
    assert(new java.io.File(s"$idx/_stream_lineage").delete())
    run("ckptA")
    assert(new java.io.File(s"$idx/_stream_lineage").exists(),
      "adoption must restore the marker")
    // ... but a FRESH checkpoint over marker-less stream state is
    // refused (an unknown writer's epochs), and the refusal must not
    // establish the fresh checkpoint — the retry fails the same way
    assert(new java.io.File(s"$idx/_stream_lineage").delete())
    val e3 = intercept[IllegalStateException] { run("ckptC") }
    assert(e3.getMessage.contains("records no lineage"),
      s"wrong error: ${e3.getMessage}")
    val e4 = intercept[IllegalStateException] { run("ckptC") }
    assert(e4.getMessage.contains("records no lineage"),
      s"retry after refusal must not adopt: ${e4.getMessage}")
    // a marker that OUTLIVED its stream state (index rebuilt, deltas
    // gone) records a dead lineage over nothing clobberable — a fresh
    // checkpoint re-binds instead of being blocked forever
    Dedup.writeCorpusSpanIndex(docs.limit(0), col("doc_id"), col("text"),
      idx, k = 8)
    assert(!new java.io.File(s"$idx/_stream_lineage").exists(),
      "rebuild must sever the old binding")
    // write through the Hadoop FS: the local FS keeps checksum
    // sidecars, and a bare java.nio write would poison the .crc
    locally {
      val hp = new org.apache.hadoop.fs.Path(s"$idx/_stream_lineage")
      val hfs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val o = hfs.create(hp, true)
      try o.write("dead-lineage".getBytes("UTF-8")) finally o.close()
    }
    run("ckptD") // no epoch>=1 deltas: adopt, don't block
    assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$idx/_stream_lineage")) != "dead-lineage",
      "clean-state mismatch must re-bind the marker")
  }
}
