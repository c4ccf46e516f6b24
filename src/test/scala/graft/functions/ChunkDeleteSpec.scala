package graft.functions

import org.apache.spark.sql.functions._

import graft.{Scratch, SparkSpec}

/** Chunk-grid takedown (`Curation.deleteFromChunks`, p19) and the
  * chunk manifest that locates it. The p19 gate hash-pins the
  * surviving grid against t43's filtered oracle; here we pin the
  * lifecycle contracts: frozen holes (survivor spans verbatim,
  * untouched bins byte-identical), manifest-ranged candidate location
  * and reset, delete-twice idempotence (the second run touches
  * NOTHING), fully-deleted bins ending cleanly, crash recovery on the
  * read path, and loud failure on contention and pre-manifest trees.
  */
class ChunkDeleteSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // the PackChunksSpec corpus: en docs 1/2/3/4 (300+600+124+200 over
  // L=512 -> chunks 0..2, doc 2 straddling 0/1, doc 4 alone in 2),
  // de doc 10 spanning 3 chunks alone, fr doc 20 exactly one chunk
  private def corpus = Seq(
    ("en", 1L, 300L), ("en", 2L, 600L), ("en", 3L, 124L), ("en", 4L, 200L),
    ("de", 10L, 1100L),
    ("fr", 20L, 512L)
  ).toDF("lang", "doc_id", "n_toks")

  /** chunksPerBin = 1: every chunk its own bin, so bin-level effects
    * are hand-checkable. */
  private def freshTree(tag: String): String = {
    val path = Scratch.path(dir, tag)
    Scratch.reset(path)
    Curation.writeChunks(corpus, "lang", "doc_id", "n_toks",
      seqLen = 512L, path, chunksPerBin = 1L)
    path
  }

  private def binMtimes(path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/*/*"))
      .filter(_.getPath.getParent.getName.startsWith("stratum="))
      .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile).map(f =>
        s"${d.getPath.getParent.getName}/${d.getPath.getName}/" +
          f.getPath.getName -> f.getModificationTime))
      .toMap
  }

  test("writeChunks emits a per-bin manifest with order-key and chunk " +
      "ranges; deleteFromChunks leaves frozen holes (survivor spans " +
      "verbatim), resets touched manifest rows, and never rewrites an " +
      "untouched bin") {
    val path = freshTree("cdel_holes")
    val before = spark.read.parquet(path)
      .select(col("stratum"), col("chunk_id"), col("doc_id"),
        col("doc_offset"), col("chunk_offset"), col("n_span_tokens"))
      .collect().toSet
    val m0 = Curation.readChunkManifest(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    // en bin 0 holds docs {1, 2}; bin 1 {2, 3}; bin 2 {4}
    assert(m0(("en", 0L)) === ((2L, 1L, 2L)))
    assert(m0(("en", 1L)) === ((2L, 2L, 3L)))
    assert(m0(("en", 2L)) === ((1L, 4L, 4L)))
    val mt0 = binMtimes(path)
    Curation.deleteFromChunks(spark, path,
      Seq(2L).toDF("doc_id"), orderName = "doc_id")
    val after = spark.read.parquet(path)
      .select(col("stratum"), col("chunk_id"), col("doc_id"),
        col("doc_offset"), col("chunk_offset"), col("n_span_tokens"))
      .collect().toSet
    // frozen holes: the surviving spans are EXACTLY the before-set
    // minus doc 2's spans — same chunk ids, same offsets
    assert(after === before.filterNot(_.getLong(2) == 2L))
    // only en bins 0 and 1 were rewritten; every other bin's files
    // are byte-untouched (mtimes pinned)
    val mt1 = binMtimes(path)
    mt0.foreach { case (f, t) =>
      // en bins 0/1 were legitimately rewritten; every OTHER bin's
      // files must be byte-untouched
      if (!f.startsWith("stratum=en/bin=0/") &&
          !f.startsWith("stratum=en/bin=1/"))
        assert(mt1.get(f).contains(t), s"untouched bin file $f moved")
    }
    // manifest reset: touched rows recomputed, untouched verbatim
    val m1 = Curation.readChunkManifest(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    assert(m1(("en", 0L)) === ((1L, 1L, 1L)))
    assert(m1(("en", 1L)) === ((1L, 3L, 3L)))
    assert(m1(("en", 2L)) === ((1L, 4L, 4L)))
    assert(m1(("de", 0L)) === m0(("de", 0L)))
    assert(m1(("fr", 0L)) === m0(("fr", 0L)))
  }

  test("delete-twice idempotence: the recomputed manifest ranges no " +
      "longer cover the ids, so the second run touches NOTHING (every " +
      "bin's files byte-untouched)") {
    val path = freshTree("cdel_idem")
    Curation.deleteFromChunks(spark, path,
      Seq(2L).toDF("doc_id"), orderName = "doc_id")
    val rows1 = spark.read.parquet(path).collect().toSet
    val mt1 = binMtimes(path)
    Curation.deleteFromChunks(spark, path,
      Seq(2L).toDF("doc_id"), orderName = "doc_id")
    assert(spark.read.parquet(path).collect().toSet === rows1)
    assert(binMtimes(path) === mt1,
      "a second identical takedown must rewrite no bin at all")
  }

  test("a fully-deleted stratum's bins END (partition discovery skips " +
      "them); its manifest rows vanish; the read path serves the rest") {
    val path = freshTree("cdel_full")
    Curation.deleteFromChunks(spark, path,
      Seq(10L).toDF("doc_id"), orderName = "doc_id")
    val langs = spark.read.parquet(path)
      .select(col("stratum")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs === Set("en", "fr"))
    val m = Curation.readChunkManifest(spark, path)
      .select(col("stratum")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(m === Set("en", "fr"))
    // readChunks through the scarred tree still serves exact ranges
    val en = Curation.readChunks(spark, path, "en", 0L, 0L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(en === Set(1L, 2L))
  }

  test("crash recovery: a bin left renamed-aside (no staged copy) " +
      "rolls BACK on the next read; one with a completed staged copy " +
      "rolls FORWARD") {
    val path = freshTree("cdel_recover")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val before = spark.read.parquet(path).collect().toSet
    // crash shape 1: aside exists, no staged copy -> roll back
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$path/_delete_old/stratum=en"))
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$path/stratum=en/bin=0"),
      new org.apache.hadoop.fs.Path(
        s"$path/_delete_old/stratum=en/bin=0")))
    assert(Curation.readChunks(spark, path, "en", 0L, 2L).count() > 0)
    assert(spark.read.parquet(path).collect().toSet === before,
      "aside with no staged copy must roll back")
    // crash shape 2: staged copy present -> roll forward (the staged
    // rewrite dropped doc 2's span from en bin 0)
    val binRows = spark.read.parquet(s"$path/stratum=en/bin=0")
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$path/_delete_staged/stratum=en"))
    binRows.filter(col("doc_id") =!= 2L)
      .write.parquet(s"$path/_delete_staged/stratum=en/bin=0")
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$path/_delete_old/stratum=en"))
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$path/stratum=en/bin=0"),
      new org.apache.hadoop.fs.Path(
        s"$path/_delete_old/stratum=en/bin=0")))
    Curation.readChunkManifest(spark, path) // triggers recovery
    val after = spark.read.parquet(path)
      .filter(col("stratum") === "en" && col("bin") === 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(after === Set(1L), "completed staging must roll forward")
  }

  test("mid-staging manifest debris (live manifest intact) is SWEPT " +
      "by the next read — not detected as debris forever — and a new " +
      "writer proceeds") {
    val path = freshTree("cdel_mdebris")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val before = Curation.readChunkManifest(spark, path)
      .collect().map(_.toString).sorted.toSeq
    // crash DURING the staged manifest write: partial staged dir,
    // live manifest untouched
    val staged = new org.apache.hadoop.fs.Path(
      s"$path/_chunk_manifest_staged")
    fs.mkdirs(staged)
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$path/_chunk_manifest_staged/part-partial.parquet"), true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val after = Curation.readChunkManifest(spark, path)
      .collect().map(_.toString).sorted.toSeq
    assert(after === before, "live manifest must be untouched")
    assert(!fs.exists(staged),
      "staging debris must be swept, or every later read re-detects " +
        "it and a racing writer hits a spurious concurrent-takedown")
    // a writer now proceeds normally
    Curation.deleteFromChunks(spark, path,
      Seq(2L).toDF("doc_id"), orderName = "doc_id")
    assert(!spark.read.parquet(path)
      .collect().exists(_.getAs[Long]("doc_id") == 2L))
  }

  test("a FRESH takedown lease makes a second writer fail loudly " +
      "(single-writer contract); readers skip recovery while it is " +
      "fresh") {
    val path = freshTree("cdel_lease")
    val conf = spark.sparkContext.hadoopConfiguration
    val lease = new org.apache.hadoop.fs.Path(s"$path/_delete_lease")
    val fs = lease.getFileSystem(conf)
    val out = fs.create(lease, true)
    out.close()
    val e = intercept[IllegalStateException] {
      Curation.deleteFromChunks(spark, path,
        Seq(1L).toDF("doc_id"), orderName = "doc_id")
    }
    assert(e.getMessage.contains("lease"))
    fs.delete(lease, false)
    // with the lease gone the takedown proceeds
    Curation.deleteFromChunks(spark, path,
      Seq(1L).toDF("doc_id"), orderName = "doc_id")
    assert(!spark.read.parquet(path)
      .collect().exists(_.getAs[Long]("doc_id") == 1L))
  }

  test("an EMPTY corpus still writes a readable (empty) manifest and " +
      "a deletable tree") {
    val path = Scratch.path(dir, "cdel_empty")
    Scratch.reset(path)
    Curation.writeChunks(corpus.filter(col("doc_id") < 0L),
      "lang", "doc_id", "n_toks", seqLen = 512L, path,
      chunksPerBin = 1L)
    assert(Curation.readChunkManifest(spark, path).count() === 0L)
    // a takedown against the empty tree is a clean no-op
    val m = Curation.deleteFromChunks(spark, path,
      Seq(1L).toDF("doc_id"), orderName = "doc_id")
    assert(m.count() === 0L)
  }

  test("pre-manifest trees are rejected loudly, not range-guessed") {
    val path = freshTree("cdel_nomanifest")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_chunk_manifest"),
      true)
    val e = intercept[IllegalArgumentException] {
      Curation.deleteFromChunks(spark, path,
        Seq(1L).toDF("doc_id"), orderName = "doc_id")
    }
    assert(e.getMessage.contains("_chunk_manifest"))
  }
}
