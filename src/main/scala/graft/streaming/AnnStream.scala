package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.Similarity

/** Continuous ANN-index maintenance — the streaming dual of the batch
  * [[graft.functions.Similarity.writeIvfPqIndex]] /
  * [[graft.functions.Similarity.appendIvfPqIndex]] pair: embedding rows
  * arrive as a stream (new documents' vectors from a continuously
  * ingested corpus) and the on-disk IVF-PQ tree grows with them, so
  * searches ([[graft.functions.Similarity.knnIvfPqOnDisk]]) always see
  * the corpus as of the last completed epoch.
  *
  * This composes the round's two artifact seams: the curated-corpus
  * stream (s06/s10) produces documents; their embeddings flow through
  * here into the searchable index — the full continuous-ingest path a
  * training-data platform runs, with no batch rebuild anywhere.
  */
object AnnStream {

  /** Maintain an on-disk IVF-PQ index over a STREAM of embedding rows
    * (s11). Each micro-batch is encoded with the frozen model — a
    * zero-shuffle [[graft.functions.Similarity.ivfPqIndex]] projection,
    * O(batch) work — and appended into its `centroid_id=` directories.
    * No rebuild, no read of existing index files, ever: unlike the s10
    * shard tree (whose bin boundaries are corpus-global and shift with
    * late arrivals), an IVF-PQ row depends only on its own vector and
    * the frozen model, so append-only IS the exact semantics — after
    * epoch N the tree row set equals a one-shot batch build over
    * everything ingested through N (s11, hash-gated against the e11
    * oracle).
    *
    * FROZEN-MODEL contract (see
    * [[graft.functions.Similarity.appendIvfPqIndex]]): `centroids` and
    * `codebooks` are fixed for the stream's lifetime; retraining the
    * model means a new tree. The per-batch model `collect()` is bounded
    * (k·dims longs — the ivfTrain driver-state contract).
    *
    * The append is at-least-once per epoch — run with a checkpoint so
    * epochs don't replay, and reset the tree and checkpoint TOGETHER
    * when restarting a logical run from scratch (the s11 gate does
    * exactly that).
    */
  def indexIngest(vectors: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, indexPath: String,
      m: Int = 4, dims: Int = 64,
      checkpointPath: Option[String] = None,
      trigger: Option[Trigger] = None,
      shufflePartitions: Option[Int] = None): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, _) => {
      Similarity.appendIvfPqIndex(
        Similarity.ivfPqIndex(batch, centroids, codebooks, m, dims),
        indexPath)
      ()
    }
    val writer = vectors.writeStream.outputMode("append").foreachBatch(step)
    checkpointPath.foreach(p => writer.option("checkpointLocation", p))
    trigger.foreach(t => writer.trigger(t))
    CorpusStream.startTuned(vectors.sparkSession, shufflePartitions, None) {
      writer.start()
    }
  }

  /** The QUERY side of the continuous-ANN story (s14) — a stream of
    * query vectors searched against a frozen self-contained
    * ([[graft.functions.Similarity.retrainIvfPqIndex]]) on-disk index,
    * each micro-batch's top-k appended under `resultsPath`. This is
    * the online-serving shape of the index lifecycle: the tree is
    * built/retrained offline, and an arriving query pays exactly the
    * batch search cost — the probed `centroid_id=` directories pushed
    * to the file listing by
    * [[graft.functions.Similarity.knnIvfPqOnDisk]], never a scan of
    * the tree. Per-batch driver state stays bounded: the model read is
    * k·dims longs and the probe collect is queries×nprobe ints.
    *
    * The model is re-read from `_model/` each batch (two tiny parquet
    * reads) so a search can never pair a retrained tree with stale
    * frames — the e15 self-contained contract, kept under streaming.
    *
    * Failure semantics: each batch writes its OWN `batch=<id>`
    * directory with `mode("overwrite")`, so at-least-once redelivery
    * overwrites instead of duplicating result rows (the s10 staging
    * idempotence pattern). Run with a checkpoint so completed batches
    * don't replay; reset results and checkpoint TOGETHER when
    * restarting a logical run.
    */
  def searchIngest(queries: DataFrame, indexPath: String,
      corpus: DataFrame, resultsPath: String,
      k: Int, nprobe: Int = 2, rerank: Int = 50,
      m: Int = 4, dims: Int = 64,
      checkpointPath: Option[String] = None,
      trigger: Option[Trigger] = None,
      shufflePartitions: Option[Int] = None): StreamingQuery = {
    val step: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      val spark = batch.sparkSession
      val (cents, cb) = Similarity.readIvfPqModel(spark, indexPath)
      Similarity.knnIvfPqOnDisk(spark, indexPath, cents, cb, batch,
          corpus, k, nprobe, rerank, m, dims)
        .write.mode("overwrite").parquet(s"$resultsPath/batch=$batchId")
      ()
    }
    val writer = queries.writeStream.outputMode("append").foreachBatch(step)
    checkpointPath.foreach(p => writer.option("checkpointLocation", p))
    trigger.foreach(t => writer.trigger(t))
    CorpusStream.startTuned(queries.sparkSession, shufflePartitions, None) {
      writer.start()
    }
  }
}
