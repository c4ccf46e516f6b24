package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The epoch-frozen incremental shard packer ([[Curation.appendShards]]
  * / [[Curation.readShardManifest]] / [[Curation.compactShards]]):
  * O(increment) per epoch, immutable history, idempotent replay, and
  * bit-parity with the one-shot batch pack under in-order arrival.
  */
class CurationIncrementalSpec extends SparkSpec {

  private def docs =
    Tables.df(spark, sf(), "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))

  private def freshPath(): String = {
    val d = Files.createTempDirectory("graft-incshards").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/tree"
  }

  private def epochsOf(df: DataFrame, n: Int): Seq[DataFrame] = {
    val maxId = df.agg(max(col("doc_id"))).head.getLong(0)
    (0 until n).map { e =>
      val hi = maxId * (e + 1) / n
      val aboveLo =
        if (e == 0) lit(true) else col("doc_id") > maxId * e / n
      df.filter(aboveLo && col("doc_id") <= hi)
    }
  }

  private def manifestSet(m: DataFrame): Set[(String, Long, Long, Long, Long, Long)] =
    m.select(col("stratum"), col("bin").cast("long"), col("n_docs"),
        col("n_tokens"), col("first_doc"), col("last_doc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet

  private def batchManifest: DataFrame =
    Curation.shardManifest(docs, col("lang"), col("doc_id"),
      col("n_chars"), budget = 2000L)

  private def listFiles(path: String): Map[String, (Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toString.stripPrefix(root.toString)
      if (!rel.contains("/_") && !rel.endsWith("_SUCCESS"))
        out(rel) = (s.getLen, s.getModificationTime)
    }
    out.toMap
  }

  test("in-order epochs == one-shot batch pack (manifest AND row bins)") {
    val path = freshPath()
    val eps = epochsOf(docs, 3)
    eps.zipWithIndex.foreach { case (e, i) =>
      Curation.appendShards(e, "lang", "doc_id", "n_chars",
        budget = 2000L, path = path, epoch = i.toLong)
    }
    val inc = manifestSet(Curation.readShardManifest(spark, path))
    val batch = manifestSet(batchManifest)
    assert(inc == batch, s"manifest diverged: ${(inc -- batch).take(3)} vs ${(batch -- inc).take(3)}")
    // row-level: every document's bin equals the global-cumsum bin
    val treeBins = spark.read.parquet(path)
      .select(col("doc_id"), col("bin").cast("long").as("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchBins = TextFunctions.packSequences(docs, col("lang"),
        col("doc_id"), col("n_chars"), 2000L)
      .select(col("doc_id"), col("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(treeBins == batchBins, "per-document bin assignment diverged")
  }

  test("epoch N's files are untouched by epoch N+1; replay is a no-op") {
    val path = freshPath()
    val eps = epochsOf(docs, 3)
    Curation.appendShards(eps(0), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 0L)
    val after0 = listFiles(path)
    assert(after0.nonEmpty && after0.keySet.forall(_.contains("/epoch=0/")))
    Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 1L)
    val after1 = listFiles(path)
    // every epoch-0 file still present, same length, same mtime
    assert(after0.forall { case (f, meta) => after1.get(f).contains(meta) },
      "epoch 0 files were rewritten by epoch 1")
    // redelivered batchId (the foreachBatch at-least-once case): no-op
    // that hands back the delta committed the first time
    val before = spark.read.parquet(path).count()
    val m = Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 1L)
    assert(spark.read.parquet(path).count() == before, "replay duplicated rows")
    assert(manifestSet(m) == manifestSet(
      spark.read.parquet(s"$path/_manifest_delta/epoch=1")))
  }

  test("crash mid-epoch self-heals: partial data cleaned, rerun exact") {
    val path = freshPath()
    val eps = epochsOf(docs, 2)
    Curation.appendShards(eps(0), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 0L)
    Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 1L)
    // simulate a crash after epoch 1's data/manifest writes but BEFORE
    // its commit marker: un-commit it and restore the inflight marker
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_commits/1"), false)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_inflight/1"), true).close()
    // replay of the "failed" epoch must clean and re-run to the same tree
    Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 1L)
    assert(manifestSet(Curation.readShardManifest(spark, path)) ==
      manifestSet(batchManifest), "post-recovery manifest diverged")
    val n = spark.read.parquet(path).count()
    assert(n == eps(0).count() + eps(1).count(), s"row count off: $n")
  }

  test("empty and out-of-order epochs: rows pack exactly once, totals " +
      "conserved, state advances") {
    val path = freshPath()
    val eps = epochsOf(docs, 2)
    // arrival REVERSED (late first half) plus an EMPTY micro-batch in
    // the middle — the two streaming realities the in-order contract
    // doesn't cover: batch parity is out the window (by contract), but
    // every row must still pack exactly once and the manifest must add
    // up
    Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 0L)
    Curation.appendShards(eps(0).filter(lit(false)), "lang", "doc_id",
      "n_chars", 2000L, path, epoch = 1L)
    Curation.appendShards(eps(0), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 2L)
    val rows = spark.read.parquet(path)
    assert(rows.count() == docs.count(), "rows lost or duplicated")
    assert(rows.select(col("doc_id")).distinct().count() == docs.count())
    val m = Curation.readShardManifest(spark, path)
    val (nDocs, nToks) = m.agg(sum(col("n_docs")), sum(col("n_tokens")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val expectToks = docs.agg(sum(col("n_chars").cast("long")))
      .head.getLong(0)
    assert(nDocs == docs.count() && nToks == expectToks,
      s"manifest totals off: $nDocs docs / $nToks tokens")
    // a further in-order epoch still appends cleanly on top
    val more = docs.limit(10)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    Curation.appendShards(more, "lang", "doc_id", "n_chars",
      2000L, path, epoch = 3L)
    assert(spark.read.parquet(path).count() == docs.count() + 10)
  }

  test("a compaction swap interrupted at EVERY crash point recovers to " +
      "a complete tree (never an empty path, never a fresh carry)") {
    val conf = spark.sparkContext.hadoopConfiguration
    def fsOf(p: String) =
      new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
    def build(): String = {
      val path = freshPath()
      val eps = epochsOf(docs, 2)
      Curation.appendShards(eps(0), "lang", "doc_id", "n_chars",
        2000L, path, epoch = 0L)
      Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
        2000L, path, epoch = 1L)
      path
    }
    val batch = manifestSet(batchManifest)

    // crash point A: between the aside-rename and the swap — dest is
    // MISSING, the fully-staged tree and the old tree both exist. The
    // old silent-failure mode: appendShards on the empty path saw no
    // commit log and restarted the carry at 0. Now every entry point
    // finishes the swap first.
    val a = build()
    Curation.compactShards(spark, a, "doc_id", "n_chars", 2000L)
    val fs = fsOf(a)
    // simulate: the compacted tree becomes the staged one, the
    // pre-compaction tree the aside — exactly the on-disk state at A
    fs.rename(new org.apache.hadoop.fs.Path(a),
      new org.apache.hadoop.fs.Path(s"$a-compacting"))
    assert(manifestSet(Curation.readShardManifest(spark, a)) == batch,
      "crash point A: readShardManifest did not finish the swap")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$a-compacting")))

    // crash point B: after the swap, before the old-tree delete — dest
    // is the new tree, `-old` is debris that must be dropped, not
    // resurrected.
    val b = build()
    Curation.compactShards(spark, b, "doc_id", "n_chars", 2000L)
    fsOf(b).mkdirs(new org.apache.hadoop.fs.Path(s"$b-old/garbage"))
    assert(manifestSet(Curation.readShardManifest(spark, b)) == batch)
    assert(!fsOf(b).exists(new org.apache.hadoop.fs.Path(s"$b-old")),
      "crash point B: post-swap debris survived recovery")

    // crash point C: aside done, staging tree somehow gone (an operator
    // deleted it) — the aside must roll BACK so the tree is reachable.
    val c = build()
    fsOf(c).rename(new org.apache.hadoop.fs.Path(c),
      new org.apache.hadoop.fs.Path(s"$c-old"))
    assert(manifestSet(Curation.readShardManifest(spark, c)) == batch,
      "crash point C: aside tree was not rolled back")

    // and appendShards itself recovers BEFORE consulting the commit
    // log: an epoch appended right after crash point A lands on the
    // swapped-in tree with the carry intact, not on a fresh one
    val d = build()
    Curation.compactShards(spark, d, "doc_id", "n_chars", 2000L)
    fsOf(d).rename(new org.apache.hadoop.fs.Path(d),
      new org.apache.hadoop.fs.Path(s"$d-compacting"))
    val more = docs.limit(10)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    Curation.appendShards(more, "lang", "doc_id", "n_chars",
      2000L, d, epoch = 7L)
    val m = Curation.readShardManifest(spark, d)
    val nDocs = m.agg(sum(col("n_docs"))).head.getLong(0)
    assert(nDocs == docs.count() + 10,
      s"crash point A + append: carry restarted or rows lost ($nDocs)")
  }

  test("manifest checkpoint bounds the delta listing to O(ckptEvery); " +
      "merged view, rollback, and carry pruning all hold") {
    val path = freshPath()
    val eps = epochsOf(docs, 6)
    eps.zipWithIndex.foreach { case (e, i) =>
      Curation.appendShards(e, "lang", "doc_id", "n_chars",
        budget = 2000L, path = path, epoch = i.toLong, ckptEvery = 3)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    def epochDirs(sub: String): Set[Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("epoch=")).map(_.stripPrefix("epoch=").toLong)
        .toSet
    }
    def markers(sub: String): Set[Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName.toLong).toSet
    }
    // ckpts fired at epoch 2 (deltas 0..2 pending) and epoch 5
    // (deltas 3..5 newer than ckpt 2); the second prunes the deltas
    // checkpoint 2 covers, so the live delta listing is 3 dirs, not 6
    assert(markers("_ckpts") == Set(2L, 5L), s"ckpt markers: ${markers("_ckpts")}")
    assert(epochDirs("_manifest_delta") == Set(3L, 4L, 5L),
      s"delta dirs not pruned to the post-ckpt window: ${epochDirs("_manifest_delta")}")
    assert(epochDirs("_manifest_ckpt") == Set(2L, 5L))
    // carry snapshots pruned to the last two epochs (rollback lag)
    assert(epochDirs("_carry") == Set(4L, 5L),
      s"carry dirs not pruned: ${epochDirs("_carry")}")
    // the checkpointed merged view equals the batch pack exactly
    assert(manifestSet(Curation.readShardManifest(spark, path)) ==
      manifestSet(batchManifest), "checkpointed manifest diverged")
    // ROLLBACK: lose the newest commit marker — the newest checkpoint
    // (epoch 5) is now ahead of the committed frontier (4), so the read
    // falls back to checkpoint 2 plus deltas 3..4, all still on disk
    // thanks to the one-checkpoint prune lag
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_commits/5"), false)
    val expect4 = manifestSet(Curation.shardManifest(
      eps.take(5).reduce(_ unionByName _), col("lang"), col("doc_id"),
      col("n_chars"), 2000L))
    assert(manifestSet(Curation.readShardManifest(spark, path)) == expect4,
      "rollback view diverged from the first-five-epochs batch pack")
  }

  test("empty-epoch checkpoint windows: roll up while any delta has " +
      "schema, SKIP once all live deltas are empty, read falls back to " +
      "the checkpoint alone — never a schema crash") {
    val path = freshPath()
    val eps = epochsOf(docs, 6)
    eps.zipWithIndex.foreach { case (e, i) =>
      Curation.appendShards(e, "lang", "doc_id", "n_chars",
        budget = 2000L, path = path, epoch = i.toLong, ckptEvery = 3)
    } // ckpts fire at 2 and 5; live deltas now {3,4,5}, all data-bearing
    val empty = eps(0).filter(lit(false))
    def ckpts(fs: org.apache.hadoop.fs.FileSystem): Set[Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/_ckpts"))
        .map(_.getPath.getName.toLong).toSet
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    // window 6..8 is all-empty: this Spark writes schema-bearing empty
    // part files, so the checkpoint at 8 rolls up normally (content ==
    // checkpoint 5) and prunes the data-bearing deltas 3..5 away
    (6 to 8).foreach(e => Curation.appendShards(empty, "lang", "doc_id",
      "n_chars", budget = 2000L, path = path, epoch = e.toLong,
      ckptEvery = 3))
    assert(ckpts(fs) == Set(5L, 8L), s"ckpts after empty window: ${ckpts(fs)}")
    assert(manifestSet(Curation.readShardManifest(spark, path)) ==
      manifestSet(batchManifest), "empty epochs changed the manifest")
    // SCHEMA-LESS live deltas (what an older Spark's empty write, or a
    // manual sweep of empty part files, leaves behind): strip the part
    // files from the post-checkpoint window — the read must fall back
    // to the checkpoint ALONE, never crash on schema inference
    (6 to 8).foreach { e =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/_manifest_delta/epoch=$e")
      fs.listStatus(dir).filter(st => st.isFile &&
          !st.getPath.getName.startsWith("_"))
        .foreach(st => fs.delete(st.getPath, false))
    }
    assert(manifestSet(Curation.readShardManifest(spark, path)) ==
      manifestSet(batchManifest),
      "schema-less delta window broke the checkpoint fallback")
  }

  test("readShards on a commit-logged tree hides uncommitted epochs") {
    val path = freshPath()
    val eps = epochsOf(docs, 2)
    Curation.appendShards(eps(0), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 0L)
    Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 1L)
    // un-commit epoch 1 (crash-mid-epoch state: data files on disk,
    // inflight marker set, commit marker absent)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_commits/1"), false)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_inflight/1"), true).close()
    val lang = docs.select(col("lang")).distinct().head.getString(0)
    val visible = Curation.readShards(spark, path, lang, 0L, Long.MaxValue)
    val committedOnly = eps(0).filter(col("lang") === lang).count()
    assert(visible.count() == committedOnly,
      "readShards exposed uncommitted (crash-partial) epoch rows")
    // the full tree really does hold more (the filter did the hiding)
    assert(spark.read.parquet(path)
      .filter(col("stratum") === lang).count() > committedOnly)
  }

  test("compactShardEpochs: per-epoch file debris collapses to whole-" +
      "bin files; bins, manifest, replay contract, and appends all " +
      "survive verbatim") {
    val path = freshPath()
    val eps = epochsOf(docs, 4)
    eps.zipWithIndex.foreach { case (e, i) =>
      Curation.appendShards(e, "lang", "doc_id", "n_chars",
        budget = 2000L, path = path, epoch = i.toLong)
    }
    val binsBefore = spark.read.parquet(path)
      .select(col("doc_id"), col("bin").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val deltaBefore = spark.read
      .parquet(s"$path/_manifest_delta/epoch=3").collect()
      .map(_.toString).sorted.toSeq
    // files per stratum=/bin= dir, counted recursively through the
    // epoch subdirs — growth debris means >1 for straddled bins
    def filesPerBin(): Map[String, Int] = {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(conf)
      val out = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val s = it.next()
        val rel = s.getPath.toString.stripPrefix(root.toString)
        if (!rel.contains("/_") && rel.endsWith(".parquet"))
          out(rel.split("/epoch=").head) += 1
      }
      out.toMap
    }
    val before = filesPerBin()
    assert(before.values.exists(_ > 1),
      s"expected multi-epoch file debris before compaction: $before")
    Curation.compactShardEpochs(spark, path)
    val after = filesPerBin()
    assert(after.keySet == before.keySet,
      "epoch compaction changed the bin directory set")
    assert(after.values.forall(_ == 1),
      s"epoch compaction must leave whole-bin files: $after")
    // row-level bins untouched; merged manifest still == the batch pack
    val binsAfter = spark.read.parquet(path)
      .select(col("doc_id"), col("bin").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(binsAfter == binsBefore, "epoch compaction moved a bin assignment")
    assert(manifestSet(Curation.readShardManifest(spark, path)) ==
      manifestSet(batchManifest))
    // replay no-op contract preserved verbatim: a redelivered last
    // epoch still hands back the delta it committed the first time
    val replay = Curation.appendShards(eps(3), "lang", "doc_id",
      "n_chars", 2000L, path, epoch = 3L)
    assert(replay.collect().map(_.toString).sorted.toSeq == deltaBefore,
      "post-compaction replay lost the committed delta")
    assert(spark.read.parquet(path).count() == docs.count(),
      "post-compaction replay duplicated rows")
    // growth resumes on the compacted tree with the carry intact
    val more = docs.limit(10)
      .withColumn("doc_id", col("doc_id") + lit(10000000L))
    Curation.appendShards(more, "lang", "doc_id", "n_chars",
      2000L, path, epoch = 4L)
    assert(Curation.readShardManifest(spark, path)
      .agg(sum(col("n_docs"))).head.getLong(0) == docs.count() + 10)
  }

  test("compactShards re-flows to one epoch and appends resume on top") {
    val path = freshPath()
    val eps = epochsOf(docs, 3)
    Curation.appendShards(eps(0), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 0L)
    Curation.appendShards(eps(1), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 1L)
    val compacted = Curation.compactShards(spark, path, "doc_id",
      "n_chars", budget = 2000L)
    // one epoch dir per (stratum, bin) after the re-flow
    val files = listFiles(path)
    assert(files.keySet.forall(_.contains("/epoch=0/")),
      "compaction left multi-epoch dirs behind")
    assert(manifestSet(compacted) == manifestSet(
      Curation.shardManifest(eps(0).unionByName(eps(1)),
        col("lang"), col("doc_id"), col("n_chars"), 2000L)))
    // growth resumes: the next epoch appends against the compacted carry
    Curation.appendShards(eps(2), "lang", "doc_id", "n_chars",
      2000L, path, epoch = 5L)
    assert(manifestSet(Curation.readShardManifest(spark, path)) ==
      manifestSet(batchManifest), "post-compaction append diverged")
  }
}
