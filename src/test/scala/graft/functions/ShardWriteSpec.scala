package graft.functions

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Packed-shard output stage (`Curation.writeShards` /
  * `shardManifest`). The p04 gate pins the manifest arithmetic against
  * DuckDB; here we pin the on-disk layout, the files==manifest
  * round-trip, rerun stability, and partition pruning on a
  * shard-targeted read.
  */
class ShardWriteSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("en", 1L, 800L), ("en", 2L, 900L), ("en", 3L, 700L),
    ("en", 4L, 600L), ("de", 10L, 1500L), ("de", 11L, 900L),
    ("fr", 20L, 100L)
  ).toDF("lang", "doc_id", "n_toks")

  test("layout, manifest parity, and rerun stability") {
    val path = Files.createTempDirectory("graft_shards").toString
    val m1 = Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path).orderBy("stratum", "bin").collect()
    // en: cum 800,1700,2400,3000 -> bins 0,0,0(1700-700?)... bin uses
    // (cum - toks)/budget: 0,800,1700,2400 -> 0,0,0,1
    assert(m1.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("de", 0L, 2L), ("en", 0L, 3L), ("en", 1L, 1L), ("fr", 0L, 1L)))
    // Hive directory layout
    assert(Files.isDirectory(Paths.get(path, "stratum=en", "bin=0")))
    assert(Files.isDirectory(Paths.get(path, "stratum=en", "bin=1")))
    // files round-trip: every (stratum, bin) group matches its
    // manifest row
    val back = spark.read.parquet(path)
      .groupBy(col("stratum"), col("bin").cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy("stratum", "bin").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
      == m1.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
    // rerun overwrites to the identical state
    val m2 = Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path).orderBy("stratum", "bin").collect()
    assert(m1.toSeq == m2.toSeq)
  }

  test("writeShards shuffleSeed: same rows, bins follow the (hash, id) " +
      "pack order, rerun-stable, manifest ranges stay id min/max") {
    val path = Files.createTempDirectory("graft_shards_shuf").toString
    val m1 = Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
        budget = 2000L, path = path, shuffleSeed = Some(7L))
      .orderBy("stratum", "bin").collect()
    val back = spark.read.parquet(path)
    // row set is the corpus exactly (a shuffle permutes, never drops)
    assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      === corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // bin assignment replays the per-stratum cumsum over the
    // deterministic (hash, id) order — computed independently here
    val expected = TextFunctions.packSequences(
        corpus.withColumn("k", Curation.shuffleKey(col("doc_id"), 7L)),
        col("lang"), struct(col("k"), col("doc_id")), col("n_toks"),
        budget = 2000L)
      .select(col("doc_id"), col("bin")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    back.select(col("doc_id"), col("bin").cast("long")).collect()
      .foreach(r => assert(r.getLong(1) === expected(r.getLong(0)),
        s"doc ${r.getLong(0)} in bin ${r.getLong(1)}"))
    // the permutation differs from the id order (the seed actually
    // shuffles — guards a silent fall-through to the id pack; the
    // 7-row fixture's BINS can coincide, the hash ORDER cannot)
    val perm = corpus
      .select(col("doc_id"), Curation.shuffleKey(col("doc_id"), 7L).as("k"))
      .orderBy(col("k"), col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(perm !== perm.sorted, "seeded order equals the id order")
    // manifest ranges remain min/max of the ORDER key per bin
    m1.foreach { r =>
      val docs = back.filter(col("stratum") === r.getString(0) &&
          col("bin") === r.getLong(1))
        .select("doc_id").collect().map(_.getLong(0))
      assert(r.getLong(4) === docs.min && r.getLong(5) === docs.max)
    }
    // rerun with the same seed overwrites to the identical state
    val m2 = Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
        budget = 2000L, path = path, shuffleSeed = Some(7L))
      .orderBy("stratum", "bin").collect()
    assert(m1.toSeq === m2.toSeq)
  }

  test("shard-targeted read prunes partitions") {
    val path = Files.createTempDirectory("graft_shards_prune").toString
    Curation.writeShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path).collect()
    val one = spark.read.parquet(path)
      .filter(col("stratum") === "en" && col("bin") === 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("stratum") || plan.contains("isnotnull")),
      s"no partition pruning in:\n$plan")
    assert(one.select("doc_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("readShards: bin-range load reads ONLY the requested directories " +
      "(metric-level, on the epoch layout)") {
    val path = Files.createTempDirectory("graft_shards_read").toString + "/t"
    // appendShards layout (stratum/bin/epoch) — the harder case; the
    // reader must also drop the epoch column
    Curation.appendShards(corpus, "lang", "doc_id", "n_toks",
      budget = 2000L, path = path, epoch = 0L)
    val out = Curation.readShards(spark, path, "en", binFrom = 0L, binTo = 0L)
    val rows = out.collect()
    assert(!out.columns.contains("epoch"))
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 3L),
      "bin-0 content mismatch")
    // metric-level pruning (the e12 discipline): partitions read ==
    // exactly the en/bin-0 dirs on disk, never the other strata/bins
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    val scan = allScans(out.queryExecution.executedPlan).head
    val wanted = new java.io.File(s"$path/stratum=en/bin=0").listFiles()
      .count(_.getName.startsWith("epoch="))
    val total = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("stratum=")).flatMap(_.listFiles()).length
    assert(scan.metrics("numPartitions").value == wanted.toLong,
      s"read ${scan.metrics("numPartitions").value} partitions, wanted $wanted")
    assert(wanted < total, "pruning demonstrated nothing")
  }

  // ---- takedown (p12, deleteFromShards) --------------------------------

  private def appendTree(path: String): Unit = {
    Curation.appendShards(corpus.filter(col("doc_id") <= 4),
      "lang", "doc_id", "n_toks", budget = 2000L, path, epoch = 0L)
    Curation.appendShards(corpus.filter(col("doc_id") > 4),
      "lang", "doc_id", "n_toks", budget = 2000L, path, epoch = 1L)
    ()
  }

  private def treeRows(path: String): Set[(String, Long, Long)] =
    spark.read.parquet(path)
      .select(col("stratum"), col("bin").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("deleteFromShards: holes not re-flow; manifest reset; " +
      "untouched bins' files untouched; idempotent") {
    val path = Files.createTempDirectory("graft_del").toString + "/t"
    appendTree(path)
    val before = treeRows(path)
    // fr's only bin is untouched by the deletion — its file mtimes
    // must not move (the manifest-range pruning claim, observed)
    val frFile = new java.io.File(s"$path/stratum=fr/bin=0")
    def mtimes(d: java.io.File): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(d).map(f => f.getPath -> f.lastModified()).toMap
    }
    val frBefore = mtimes(frFile)
    val del = Seq(2L, 10L).toDF("doc_id")
    val m = Curation.deleteFromShards(spark, path, del, "doc_id", "n_toks")
      .orderBy("stratum", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // rows: deleted ids gone, every other row in its ORIGINAL bin
    assert(treeRows(path) ===
      before.filterNot(t => t._3 == 2L || t._3 == 10L))
    // manifest reset: en bin 0 lost doc 2 (count 3->2, tokens -900,
    // range min/max recomputed); de bin 0 lost doc 10 (2->1, id range
    // collapses to 11); fr untouched
    assert(m.toSeq === Seq(
      ("de", 0L, 1L, 900L, 11L, 11L),
      ("en", 0L, 2L, 1500L, 1L, 3L),
      ("en", 1L, 1L, 600L, 4L, 4L),
      ("fr", 0L, 1L, 100L, 20L, 20L)))
    assert(mtimes(frFile) === frBefore, "untouched bin was rewritten")
    // idempotent: deleting the same ids again changes nothing
    val m2 = Curation.deleteFromShards(spark, path, del, "doc_id", "n_toks")
      .orderBy("stratum", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(m2.toSeq === m.toSeq)
    // readShards never serves a deleted id
    val served = Curation.readShards(spark, path, "en", 0L, 9L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served === Set(1L, 3L, 4L))
  }

  test("deleteFromShards: deleting a whole bin empties it out of the " +
      "manifest; absent ids are a no-op") {
    val path = Files.createTempDirectory("graft_del2").toString + "/t"
    appendTree(path)
    // en bin 1 holds exactly doc 4
    val m = Curation.deleteFromShards(spark, path, Seq(4L).toDF("doc_id"),
        "doc_id", "n_toks")
      .select("stratum", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!m.contains(("en", 1L)), "emptied bin must leave the manifest")
    // absent id (inside no bin's range): nothing changes
    val before = treeRows(path)
    val m2 = Curation.deleteFromShards(spark, path,
      Seq(999999L).toDF("doc_id"), "doc_id", "n_toks")
    assert(treeRows(path) === before)
    assert(m2.count() === 3)
  }

  test("deleteFromShards: an interrupted per-bin swap recovers on the " +
      "next read (aside present, live bin missing)") {
    val path = Files.createTempDirectory("graft_del3").toString + "/t"
    appendTree(path)
    val before = treeRows(path)
    // simulate the crash window between the aside rename and the
    // swap-in, with NO staged copy: recovery must roll the aside back
    val live = new java.io.File(s"$path/stratum=fr/bin=0")
    val aside = new java.io.File(s"$path/_delete_old/stratum=fr/bin=0")
    aside.getParentFile.mkdirs()
    assert(live.renameTo(aside))
    val served = Curation.readShards(spark, path, "fr", 0L, 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served === Set(20L), "aside not rolled back")
    assert(treeRows(path) === before)
    assert(!new java.io.File(s"$path/_delete_old").exists())
  }

  test("recoverBinSwaps: a FRESH writer lease blocks read-path recovery " +
      "(no resurrection race); a stale one lets it run") {
    val path = Files.createTempDirectory("graft_del4").toString + "/t"
    appendTree(path)
    // simulate an ACTIVE deleteFromShards mid-swap on a fully-deleted
    // bin: live renamed aside, no staged copy, lease fresh — exactly
    // the window where the pre-r16 reader would roll the bin back and
    // resurrect the deleted rows
    val live = new java.io.File(s"$path/stratum=fr/bin=0")
    val aside = new java.io.File(s"$path/_delete_old/stratum=fr/bin=0")
    aside.getParentFile.mkdirs()
    assert(live.renameTo(aside))
    val lease = new java.io.File(s"$path/_delete_lease")
    assert(lease.createNewFile())
    val served = Curation.readShards(spark, path, "fr", 0L, 0L)
      .select("doc_id").collect()
    assert(served.isEmpty,
      "reader must see the in-progress delete, not resurrect the bin")
    assert(aside.exists(), "recovery ran under a fresh lease")
    // writer crashed: lease goes stale -> the next read recovers
    assert(lease.setLastModified(
      System.currentTimeMillis() - Curation.DeleteLeaseTtlMs - 1000))
    val after = Curation.readShards(spark, path, "fr", 0L, 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after === Set(20L), "stale lease must not block recovery")
    assert(!lease.exists(), "stale lease must be cleared by recovery")
  }

  test("deleteFromShards: a fresh lease from a live takedown makes a " +
      "second one fail loudly; a stale one is taken over") {
    val path = Files.createTempDirectory("graft_del6").toString + "/t"
    appendTree(path)
    val lease = new java.io.File(s"$path/_delete_lease")
    assert(lease.createNewFile())
    val e = intercept[IllegalStateException] {
      Curation.deleteFromShards(spark, path, Seq(2L).toDF("doc_id"),
        "doc_id", "n_toks")
    }
    assert(e.getMessage.contains("SINGLE-WRITER"),
      s"wrong error: ${e.getMessage}")
    assert(treeRows(path).exists(_._3 == 2L),
      "refused takedown must not delete anything")
    // crashed predecessor: stale lease is taken over and the delete
    // runs to completion, clearing the lease
    assert(lease.setLastModified(
      System.currentTimeMillis() - Curation.DeleteLeaseTtlMs - 1000))
    Curation.deleteFromShards(spark, path, Seq(2L).toDF("doc_id"),
      "doc_id", "n_toks").collect()
    assert(!treeRows(path).exists(_._3 == 2L))
    assert(!lease.exists(), "completed takedown must clear its lease")
  }

  test("shardUtilization: the hand-derived per-stratum card (p18) — " +
      "overshooting bins are visible, utilization is one IEEE division") {
    val got = Curation.shardUtilization(corpus, col("lang"),
        col("doc_id"), col("n_toks"), budget = 2000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // en: bins {0: 3 docs/2400 toks, 1: 1 doc/600} -> util 0.75
    assert(got("en") === ((2L, 4L, 3000L, 2400L, 0.75)))
    // de: ONE bin holding 2400 tokens against a 2000 budget — the
    // documented straddle overshoot, utilization past 1
    assert(got("de") === ((1L, 2L, 2400L, 2400L, 1.2)))
    assert(got("fr") === ((1L, 1L, 100L, 100L, 0.05)))
  }

  test("claimStaleLease: atomic takeover — a FRESH lease is never " +
      "removed (the r16 check-then-delete TOCTOU), a stale one is " +
      "claimed exactly once") {
    val dir = Files.createTempDirectory("graft_lease").toString
    val lease = new org.apache.hadoop.fs.Path(s"$dir/_delete_lease")
    val fs = lease.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // fresh lease: the claim must re-verify after the arbitrating
    // rename and put it BACK — the racing-winner's lock survives
    fs.create(lease, false).close()
    assert(!Curation.claimStaleLease(fs, lease),
      "a fresh lease must not be claimable")
    assert(fs.exists(lease), "a stolen fresh lease must be restored")
    assert(!Curation.acquireDeleteLease(fs, lease, failIfHeld = false),
      "acquire must yield to a fresh lease")
    assert(fs.exists(lease))
    // stale lease: claimed (removed) and re-acquirable
    val f = new java.io.File(s"$dir/_delete_lease")
    assert(f.setLastModified(
      System.currentTimeMillis() - Curation.DeleteLeaseTtlMs - 1000))
    assert(Curation.claimStaleLease(fs, lease),
      "a stale lease must be claimable")
    assert(!fs.exists(lease), "a claimed stale lease is removed")
    // absent: claim is a no-op loss, acquire creates exclusively
    assert(!Curation.claimStaleLease(fs, lease))
    assert(Curation.acquireDeleteLease(fs, lease, failIfHeld = false))
    assert(fs.exists(lease))
    // no claim debris left behind
    assert(new java.io.File(dir).listFiles()
      .forall(!_.getName.contains("-claim-")), "claim files must be swept")
  }

  test("recoverTakedown: a stale beacon with no debris is claimed " +
      "atomically (a concurrently re-created fresh lease survives)") {
    val path = Files.createTempDirectory("graft_del7").toString + "/t"
    appendTree(path)
    val lease = new java.io.File(s"$path/_delete_lease")
    assert(lease.createNewFile())
    assert(lease.setLastModified(
      System.currentTimeMillis() - Curation.DeleteLeaseTtlMs - 1000))
    // no _delete_old/_delete_staged/_manifest_ckpt_staged debris: the
    // read path's recovery should just clear the stale beacon
    Curation.readShards(spark, path, "fr", 0L, 0L).collect()
    assert(!lease.exists(), "stale no-debris beacon must be cleared")
  }

  test("manifest checkpoint swap: a crash between the aside and the " +
      "swap-in recovers to the STAGED manifest on the next read") {
    val path = Files.createTempDirectory("graft_del5").toString + "/t"
    appendTree(path)
    // first takedown writes the checkpoint at the committed epoch (1)
    // and prunes every delta — the exact precondition ADVICE r15 warned
    // about: before r16 a second takedown overwrote this marked
    // checkpoint in place
    Curation.deleteFromShards(spark, path, Seq(2L).toDF("doc_id"),
      "doc_id", "n_toks").collect()
    val ckptDir = new java.io.File(s"$path/_manifest_ckpt/epoch=1")
    assert(ckptDir.exists(), "first takedown must checkpoint at committed")
    assert(!new java.io.File(s"$path/_manifest_delta").exists() ||
      new java.io.File(s"$path/_manifest_delta").listFiles()
        .forall(!_.getName.startsWith("epoch=")),
      "takedown must prune all covered deltas")
    // simulate the second takedown's crash window: staged manifest
    // fully written, live checkpoint renamed aside, swap-in not yet run
    val expected = spark.read.parquet(ckptDir.getPath)
      .collect().map(_.toString).sorted.toSeq
    val staged = new java.io.File(s"$path/_manifest_ckpt_staged/epoch=1")
    staged.getParentFile.mkdirs()
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(path).getFileSystem(conf)
    FileUtil.copy(fs, new HPath(ckptDir.getPath), fs,
      new HPath(staged.getPath), false, conf)
    assert(ckptDir.renameTo(
      new java.io.File(s"$path/_manifest_ckpt/epoch=1-old")))
    // the next read must finish the swap and serve a complete manifest
    val m = Curation.readShardManifest(spark, path)
      .collect().map(_.toString).sorted.toSeq
    assert(m === expected, "recovered manifest differs from the staged one")
    assert(new java.io.File(s"$path/_manifest_ckpt/epoch=1").exists())
    assert(!new java.io.File(s"$path/_manifest_ckpt/epoch=1-old").exists())
    assert(!new java.io.File(s"$path/_manifest_ckpt_staged").exists())
    // and a crash BEFORE the aside (partial staged debris, live intact)
    // is swept without touching the live checkpoint
    staged.getParentFile.mkdirs()
    staged.mkdirs()
    Files.write(Paths.get(staged.getPath, "part-partial.parquet"),
      Array[Byte](1, 2, 3))
    val m2 = Curation.readShardManifest(spark, path)
      .collect().map(_.toString).sorted.toSeq
    assert(m2 === expected)
    assert(!new java.io.File(s"$path/_manifest_ckpt_staged").exists(),
      "staging debris must be swept")
  }
}
