package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions

/** Streaming composition of the round-6 batch text operators
  * (VERDICT r6 #7). [[TextFunctions.regexScan]] and
  * [[TextFunctions.sampleByStratum]] are stateless projections/filters,
  * so the SAME code that runs in the batch gates (t07, t06) must
  * incrementalize over a file-source stream UNCHANGED — append mode, no
  * watermark, no state store — and produce the identical row set.
  * [[TextFunctions.topKPerGroup]] and [[TextFunctions.tfidfTopTerms]]
  * are batch-only by construction (a blocking rank window / distinct
  * aggregate cannot incrementalize); the last test pins that they fail
  * LOUDLY at stream start rather than silently mis-compute.
  */
class TextStreamingSpec extends SparkSpec {

  private lazy val docsBatch = Tables.df(spark, sf(), "documents")

  /** Stage the documents table as a watched directory and open it as a
    * file-source stream (schema from the batch read — streaming sources
    * require one upfront).
    */
  private def docsStream() = {
    val dir = Files.createTempDirectory("docs-stream").toString
    docsBatch.coalesce(2).write.mode("overwrite").parquet(dir)
    spark.readStream.schema(docsBatch.schema).parquet(dir)
  }

  test("regexScan composes over a stream unchanged, equal to the batch result") {
    val out = TextFunctions.regexScan(docsStream(), col("doc_id"), col("text"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("regex_stream_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("regex_stream_out").collect()
      .map(_.toSeq).toSet
    val expected = TextFunctions.regexScan(docsBatch, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(got == expected,
      s"stream/batch divergence: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("sampleByStratum composes over a stream unchanged, equal to the batch result") {
    val rates = Seq("en" -> 0.5, "de" -> 0.25)
    val out = TextFunctions.sampleByStratum(docsStream(),
      col("lang"), col("doc_id"), rates, defaultRate = 0.1)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stratum_stream_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("stratum_stream_out").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expected = TextFunctions.sampleByStratum(docsBatch,
        col("lang"), col("doc_id"), rates, defaultRate = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the hash filter is deterministic, so the streamed sample is
    // EXACTLY the batch sample — reruns and retries keep the same rows
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("semanticDedup is batch-only and fails loudly at call time on a stream") {
    val embBatch = Tables.df(spark, sf(), "embeddings")
    val dir = Files.createTempDirectory("emb-stream").toString
    embBatch.coalesce(2).write.mode("overwrite").parquet(dir)
    val embStream = spark.readStream.schema(embBatch.schema).parquet(dir)
    // ivfTrain's driver-side seed collect cannot run on an unbounded
    // source: the failure must surface when semanticDedup is CALLED,
    // not as a silent per-micro-batch retrain
    val e = intercept[AnalysisException] {
      graft.functions.Similarity.semanticDedup(embStream, k = 8,
        threshold = 0.95)
    }
    assert(e.getMessage.toLowerCase.contains("stream"))
  }

  test("chunkDocuments composes over a stream unchanged, equal to the batch result") {
    val out = TextFunctions.chunkDocuments(docsStream(),
      col("doc_id"), col("text"), window = 32, stride = 24)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("chunk_stream_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("chunk_stream_out").collect()
      .map(_.toSeq).toSet
    val expected = TextFunctions.chunkDocuments(docsBatch,
        col("doc_id"), col("text"), window = 32, stride = 24)
      .collect().map(_.toSeq).toSet
    // a stateless row-multiplying projection: the streamed chunk set is
    // exactly the batch chunk set, whatever the file/micro-batch split
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("topKPerGroup and tfidfTopTerms are batch-only and fail loudly on a stream") {
    // blocking rank window: no incremental execution exists
    val topk = intercept[AnalysisException] {
      val q = TextFunctions.topKPerGroup(docsStream(),
          col("lang"), col("n_chars"), col("doc_id"), 5)
        .writeStream.outputMode("append")
        .format("memory").queryName("topk_stream_out").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(topk.getMessage.toLowerCase.contains("window") ||
      topk.getMessage.toLowerCase.contains("streaming"))

    // distinct aggregate (df per term) cannot incrementalize either
    val tfidf = intercept[AnalysisException] {
      val q = TextFunctions.tfidfTopTerms(docsStream(),
          col("doc_id"), col("text"))
        .writeStream.outputMode("append")
        .format("memory").queryName("tfidf_stream_out").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(tfidf.getMessage.nonEmpty)
  }

  test("repetitionStats composes over a stream unchanged, equal to the batch result") {
    // round 7: pure per-row folds — stateless, so the same code
    // incrementalizes with no watermark and no state store
    val out = TextFunctions.repetitionStats(docsStream(),
      col("doc_id"), col("text"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rep_stream_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("rep_stream_out").collect().map(_.toSeq).toSet
    val expected = TextFunctions.repetitionStats(docsBatch,
      col("doc_id"), col("text")).collect().map(_.toSeq).toSet
    assert(got == expected,
      s"stream/batch divergence: ${got.diff(expected).take(3)} vs ${expected.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("packSequences and quantileTrim are batch-only and fail loudly on a stream") {
    // blocking cumsum window — same class of failure as topKPerGroup
    val pack = intercept[AnalysisException] {
      val q = TextFunctions.packSequences(docsStream(),
          col("lang"), col("doc_id"), col("n_chars"), 2000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("pack_stream_out").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(pack.getMessage.toLowerCase.contains("window") ||
      pack.getMessage.toLowerCase.contains("streaming"))

    // percentile aggregate + join on its own stream output
    val trim = intercept[AnalysisException] {
      val q = TextFunctions.quantileTrim(docsStream(),
          col("lang"), col("n_chars"), 0.10, 0.90)
        .writeStream.outputMode("append")
        .format("memory").queryName("trim_stream_out").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(trim.getMessage.nonEmpty)
  }
}
