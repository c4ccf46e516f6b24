package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Concat-and-chunk sample packing (`TextFunctions.packChunks`, t43):
  * the per-sequence span table's structural invariants — full
  * coverage, exact-`seqLen` interior sequences, per-document span
  * partition, boundary splitting, and determinism under
  * repartitioning. The t43 gate hash-pins every value against the
  * DuckDB grid replay; here we pin the CONTRACTS a loader relies on.
  */
class PackChunksSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // en stream: 300 + 600 + 124 + 200 = 1224 tokens over L=512:
    // doc 2 straddles chunks 0/1, doc 4 straddles 1/2
    ("en", 1L, 300L), ("en", 2L, 600L), ("en", 3L, 124L), ("en", 4L, 200L),
    // de stream: a single doc LONGER than 2 sequences (spans 3 chunks)
    ("de", 10L, 1100L),
    // fr: exactly one full sequence, then an empty doc (must vanish)
    ("fr", 20L, 512L), ("fr", 21L, 0L)
  ).toDF("lang", "doc_id", "n_toks")

  private def packed = TextFunctions.packChunks(corpus,
    col("lang"), col("doc_id"), col("n_toks"), seqLen = 512L)

  test("spans partition each document's tokens, offsets contiguous") {
    val spans = packed.select(col("doc_id"), col("chunk_id"),
        col("doc_offset"), col("n_span_tokens"))
      .collect().groupBy(_.getLong(0))
    val toks = corpus.collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    toks.foreach { case (id, n) =>
      val s = spans.getOrElse(id, Array.empty).sortBy(_.getLong(2))
      assert(s.map(_.getLong(3)).sum === n, s"doc $id coverage")
      if (n == 0) assert(s.isEmpty, "zero-token doc must contribute nothing")
      else {
        assert(s.head.getLong(2) === 0L, s"doc $id first span offset")
        s.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
          assert(a.getLong(2) + a.getLong(3) === b.getLong(2),
            s"doc $id spans not contiguous")
          assert(a.getLong(1) + 1 === b.getLong(1),
            s"doc $id spans not on consecutive chunks")
        }
      }
    }
  }

  test("every sequence except each stratum's last covers exactly seqLen") {
    val byChunk = packed.groupBy(col("lang"), col("chunk_id"))
      .agg(sum(col("n_span_tokens")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val last = byChunk.keys.groupBy(_._1)
      .map { case (l, ks) => l -> ks.map(_._2).max }
    byChunk.foreach { case ((l, c), n) =>
      if (c == last(l)) assert(n <= 512L, s"($l,$c) overfull tail")
      else assert(n === 512L, s"($l,$c) interior sequence not full")
    }
    // hand-derived boundary facts: en doc 2 splits 212/388 across
    // chunks 0/1; de doc 10 spans exactly chunks 0,1,2 as 512/512/76
    val en2 = packed.filter(col("doc_id") === 2L)
      .orderBy(col("chunk_id"))
      .select(col("chunk_id"), col("chunk_offset"), col("n_span_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(en2 === Seq((0L, 300L, 212L), (1L, 0L, 388L)))
    val de10 = packed.filter(col("doc_id") === 10L)
      .orderBy(col("chunk_id"))
      .select(col("chunk_id"), col("doc_offset"), col("n_span_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(de10 === Seq((0L, 0L, 512L), (1L, 512L, 512L), (2L, 1024L, 76L)))
  }

  test("carry-continued increments reproduce the one-shot grid bit " +
      "for bit (the t44 contract)") {
    val first = corpus.filter(col("doc_id") <= 2L)
    val second = corpus.filter(col("doc_id") > 2L)
    val carry = first.groupBy(col("lang"))
      .agg(sum(col("n_toks")).as("cum_tokens"))
    val inc = TextFunctions.packChunks(first, col("lang"), col("doc_id"),
        col("n_toks"), seqLen = 512L)
      .unionByName(TextFunctions.packChunksFrom(second, col("lang"),
        col("doc_id"), col("n_toks"), seqLen = 512L, carry = Some(carry)))
      .orderBy(col("lang"), col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    val oneShot = packed
      .orderBy(col("lang"), col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(inc === oneShot)
    // the en boundary sequence (chunk 1) received spans from BOTH
    // increments: doc 2 (first) and doc 3 (second) — the straddle the
    // carry exists for
    val straddle = TextFunctions.packChunksFrom(second, col("lang"),
        col("doc_id"), col("n_toks"), seqLen = 512L, carry = Some(carry))
      .filter(col("lang") === "en" && col("chunk_id") === 1L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(straddle === Set(3L), s"straddle spans: $straddle")
  }

  test("deterministic under repartitioning; seqLen must be positive") {
    val a = packed.orderBy(col("lang"), col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    val b = TextFunctions.packChunks(corpus.repartition(7),
        col("lang"), col("doc_id"), col("n_toks"), seqLen = 512L)
      .orderBy(col("lang"), col("chunk_id"), col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      TextFunctions.packChunks(corpus, col("lang"), col("doc_id"),
        col("n_toks"), seqLen = 0L)
    }
  }

  test("chunkStats: the hand-derived per-stratum data card (t47)") {
    val got = TextFunctions.chunkStats(corpus, col("lang"),
        col("doc_id"), col("n_toks"), seqLen = 512L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // en: 1224 tokens -> 3 sequences; doc 2 straddles 0/1 (the only
    // split); pad = 3*512 - 1224
    assert(got("en") === ((3L, 5L, 4L, 1L, 312L)))
    // de: one 1100-token doc spans 3 sequences, split; pad 436
    assert(got("de") === ((3L, 3L, 1L, 1L, 436L)))
    // fr: exactly one full sequence — concat-and-chunk's zero-pad case
    assert(got("fr") === ((1L, 1L, 1L, 0L, 0L)))
  }

  test("writeChunks/readChunks: range read serves the exact spans and " +
      "reads ONLY the covering bin directories (p15)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_chunks").toString + "/t"
    // chunksPerBin=1 → one Hive dir per chunk: en has chunks 0..2,
    // de 0..2, fr 0 — pruning is observable per chunk
    Curation.writeChunks(corpus, "lang", "doc_id", "n_toks",
      seqLen = 512L, path = path, chunksPerBin = 1L)
    assert(new java.io.File(s"$path/stratum=en/bin=0").isDirectory)
    assert(new java.io.File(s"$path/_meta_chunks_per_bin").isFile)
    val out = Curation.readChunks(spark, path, "en", 1L, 2L)
    val rows = out.collect()
    // the served spans equal the in-memory grid restricted to range
    val want = packed.filter(col("lang") === "en" &&
        col("chunk_id").between(1L, 2L))
      .select(col("doc_id"), col("chunk_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("chunk_id"))).toSet === want)
    assert(!out.columns.contains("bin"))
    // metric-level pruning (the readShards discipline): partitions
    // read == exactly the en bin-1/bin-2 dirs, never other strata/bins
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val scan = allScans(out.queryExecution.executedPlan).head
    val total = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("stratum=")).flatMap(_.listFiles()).length
    assert(scan.metrics("numPartitions").value == 2L,
      s"read ${scan.metrics("numPartitions").value} partitions, wanted 2")
    assert(total > 2, "pruning demonstrated nothing")
    // a mis-binned read is impossible: the width rides in the artifact
    val e = intercept[IllegalArgumentException] {
      Curation.readChunks(spark, s"$path-missing", "en", 0L, 1L)
    }
    assert(e.getMessage.contains("_meta_chunks_per_bin"))
  }
}
